"""Pure-stdlib GIF codec: LZW decode/encode, first-frame raster decode,
palette re-encode — closing the last common web image format that
previously passed through the multimodal tier as opaque bytes.

Same engineering contract as ``jpeg_codec.py``: decoders never raise on
untrusted bytes (a malformed image is one None row, not a dead executor
task), everything is deterministic, and the envelope limits are honest —
outside it the caller's passthrough/fake gate stays in force.

Envelope: GIF87a/GIF89a, global or local color table, interlaced or
sequential, first image frame only (later frames of an animation are a
frame-sampling concern, not a still-image one; the first frame is what a
browser shows before playback and what near-dup hashing should key on).
Transparent pixels (GCE flag) composite onto the background color, which
is what a white/colored-page render does to a logo GIF.

Reference has no image pipeline — this module is part of the builder's
multimodal brief (SURVEY.md LLM-pipeline tier), validated against the
real-world GIFs shipped in this container (/usr/share/doc/libxslt1-dev).
"""

from __future__ import annotations

import struct

MAX_GIF_PIXELS = 64_000_000  # 64 MP decode ceiling: untrusted headers
# can claim 65535x65535 (4.3 G pixels); a list-of-rows raster for that
# would OOM the Python worker before any per-image timeout fires.


def gif_lzw_decode(
    min_code_size: int, data: bytes, max_codes: int
) -> bytes | None:
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/END codes,
    12-bit cap with deferred clear). Returns the index stream, or None on
    a corrupt code sequence. ``max_codes`` bounds output (frame w*h) so a
    malicious stream cannot balloon memory."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= clear:  # first code after clear must be literal
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            # width grows when the NEXT code could address the new entry;
            # at 4096 the table freezes (deferred clear) per GIF89a App. F
            if len(table) == (1 << width) and width < 12:
                width += 1
            out += entry
            if len(out) >= max_codes:
                return bytes(out[:max_codes])
            prev = entry
    # missing END code: tolerate (common in the wild) if we got pixels
    return bytes(out) if out else None


def gif_lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF-variant LZW encode — the exact inverse of ``gif_lzw_decode``
    ('late' code-width change: the width bumps when the DECODER's table
    reaches 2^width, which trails this encoder's next_code by one)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    cur = b""
    for i in indices:
        nxt = cur + bytes([i])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        # decoder table size right after reading that code equals
        # next_code here (it trails this encoder's add by one emission);
        # it bumps width when that size hits 2^width
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        else:  # table full: clear and restart (simple, always conforming)
            emit(clear, width)
            table = {bytes([j]): j for j in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([i])
    if cur:
        emit(table[cur], width)
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_rows(height: int) -> list[int]:
    """GIF Adam-style 4-pass row order: rows 0,8,16.. then 4,12.. then
    2,6,10.. then 1,3,5.. — position k of the decoded stream lands on
    returned[k]."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


def decode_gif_rgb24(
    data: bytes | None,
) -> tuple[int, int, list[list[tuple[int, int, int]]]] | None:
    """REAL GIF pixel decode, pure stdlib: first image frame, global or
    local palette, interlaced or not, composited onto the logical screen
    at the frame's (left, top) over the background color; transparent
    pixels (GIF89a GCE) show the background. Returns (width, height,
    rgb_rows) at LOGICAL SCREEN size, or None outside the envelope /
    for corrupt bytes."""
    if (not data or len(data) < 13
            or data[:6] not in (b"GIF87a", b"GIF89a")):
        return None
    try:
        w, h = struct.unpack("<HH", data[6:10])
        if not w or not h or w * h > MAX_GIF_PIXELS:
            return None
        packed, bg_index = data[10], data[11]
        i = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = data[i : i + 3 * n]
            if len(gct) < 3 * n:
                return None
            i += 3 * n
        transparent: int | None = None
        while i < len(data):
            b0 = data[i]
            if b0 == 0x3B:  # trailer before any image frame
                return None
            if b0 == 0x21:  # extension: GCE feeds the next frame
                if i + 2 > len(data):
                    return None
                label = data[i + 1]
                i += 2
                if label == 0xF9 and i < len(data) and data[i] >= 4:
                    if data[i + 1] & 1:
                        transparent = data[i + 4]
                while i < len(data) and data[i] != 0:
                    i += data[i] + 1
                i += 1
                continue
            if b0 != 0x2C:  # unknown block type: corrupt
                return None
            left, top, fw, fh = struct.unpack("<HHHH", data[i + 1 : i + 9])
            fpacked = data[i + 9]
            i += 10
            pal = gct
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                pal = data[i : i + 3 * n]
                if len(pal) < 3 * n:
                    return None
                i += 3 * n
            if pal is None or not fw or not fh or fw * fh > MAX_GIF_PIXELS:
                return None
            mcs = data[i]
            i += 1
            blocks = bytearray()
            while i < len(data) and data[i] != 0:
                sz = data[i]
                blocks += data[i + 1 : i + 1 + sz]
                i += sz + 1
            idx = gif_lzw_decode(mcs, bytes(blocks), fw * fh)
            if idx is None or len(idx) < fw * fh:
                return None
            n_colors = len(pal) // 3

            def color(ci: int) -> tuple[int, int, int]:
                if ci >= n_colors:
                    return (0, 0, 0)
                return (pal[3 * ci], pal[3 * ci + 1], pal[3 * ci + 2])

            bg = (
                color(bg_index)
                if gct is not None and bg_index < len(gct) // 3
                else (255, 255, 255)
            )
            rows = [[bg] * w for _ in range(h)]
            row_order = (
                _interlace_rows(fh) if fpacked & 0x40 else range(fh)
            )
            for k, fy in enumerate(row_order):
                y = top + fy
                if y >= h:
                    continue
                base = k * fw
                row = rows[y]
                for fx in range(fw):
                    x = left + fx
                    if x >= w:
                        break
                    ci = idx[base + fx]
                    if ci == transparent:
                        continue
                    row[x] = color(ci)
            return (w, h, rows)
    except (IndexError, struct.error):
        return None
    return None


def decode_gif_frames(
    data: bytes | None, max_frames: int = 1000
) -> tuple[int, int, list[tuple[int, int, list]]] | None:
    """FULL animation decode: every frame composited at logical-screen
    size, honoring per-frame GCE delays and disposal methods 0/1 (leave
    in place) and 2 (restore background). Returns
    (width, height, [(ts_ms, duration_ms, rgb_rows), ...]) or None.

    Disposal 3 (restore previous) is honestly gated (None — it needs a
    frame-history stack and is vanishingly rare in web GIFs). A 0 or 1
    centisecond delay renders as 100 ms, the documented convention every
    browser applies. ``max_frames`` bounds memory against adversarial
    frame counts; a single-frame still is a 1-element animation.

    Memory contract (round 12, ADVICE fix): every composited frame is a
    full w*h canvas snapshot, so TOTAL retained pixels are additionally
    budgeted — decoding stops (returning the frames composited so far)
    once ``w*h*(n_frames+1)`` would exceed ``MAX_GIF_PIXELS``. Without
    this a crafted ~100 KB GIF (huge logical screen x many one-pixel
    frames) could allocate hundreds of GB and OOM the Python worker,
    violating the module's one-None-row-not-a-dead-executor contract."""
    if (not data or len(data) < 13
            or data[:6] not in (b"GIF87a", b"GIF89a")):
        return None
    try:
        w, h = struct.unpack("<HH", data[6:10])
        if not w or not h or w * h > MAX_GIF_PIXELS:
            return None
        packed, bg_index = data[10], data[11]
        i = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = data[i : i + 3 * n]
            if len(gct) < 3 * n:
                return None
            i += 3 * n
        bg = (255, 255, 255)
        if gct is not None and bg_index < len(gct) // 3:
            bg = (gct[3 * bg_index], gct[3 * bg_index + 1],
                  gct[3 * bg_index + 2])
        canvas = [[bg] * w for _ in range(h)]
        frames: list[tuple[int, int, list]] = []
        ts = 0
        transparent: int | None = None
        delay_cs = 0
        disposal = 0
        # cumulative snapshot budget: frames retained so far + the next
        # one may not exceed MAX_GIF_PIXELS total composited pixels
        frame_budget = max(1, MAX_GIF_PIXELS // (w * h))
        while i < len(data) and len(frames) < min(max_frames, frame_budget):
            b0 = data[i]
            if b0 == 0x3B:
                break
            if b0 == 0x21:
                if i + 2 > len(data):
                    return None
                label = data[i + 1]
                i += 2
                if label == 0xF9 and i < len(data) and data[i] >= 4:
                    flags = data[i + 1]
                    disposal = (flags >> 2) & 0x07
                    delay_cs = struct.unpack(
                        "<H", data[i + 2 : i + 4]
                    )[0]
                    transparent = data[i + 4] if flags & 1 else None
                while i < len(data) and data[i] != 0:
                    i += data[i] + 1
                i += 1
                continue
            if b0 != 0x2C:
                return None
            if disposal == 3:
                return None  # restore-previous: out of envelope
            left, top, fw, fh = struct.unpack("<HHHH", data[i + 1 : i + 9])
            fpacked = data[i + 9]
            i += 10
            pal = gct
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                pal = data[i : i + 3 * n]
                if len(pal) < 3 * n:
                    return None
                i += 3 * n
            if pal is None or not fw or not fh or fw * fh > MAX_GIF_PIXELS:
                return None
            mcs = data[i]
            i += 1
            blocks = bytearray()
            while i < len(data) and data[i] != 0:
                sz = data[i]
                blocks += data[i + 1 : i + 1 + sz]
                i += sz + 1
            i += 1
            idx = gif_lzw_decode(mcs, bytes(blocks), fw * fh)
            if idx is None or len(idx) < fw * fh:
                return None if not frames else _finish(w, h, frames)
            n_colors = len(pal) // 3
            row_order = (
                _interlace_rows(fh) if fpacked & 0x40 else range(fh)
            )
            for k, fy in enumerate(row_order):
                y = top + fy
                if y >= h:
                    continue
                base = k * fw
                row = canvas[y]
                for fx in range(fw):
                    x = left + fx
                    if x >= w:
                        break
                    ci = idx[base + fx]
                    if ci == transparent or ci >= n_colors:
                        continue
                    row[x] = (pal[3 * ci], pal[3 * ci + 1], pal[3 * ci + 2])
            dur_ms = (delay_cs if delay_cs >= 2 else 10) * 10
            frames.append((ts, dur_ms, [list(r) for r in canvas]))
            ts += dur_ms
            if disposal == 2:  # restore frame rect to background
                for y in range(top, min(top + fh, h)):
                    row = canvas[y]
                    for x in range(left, min(left + fw, w)):
                        row[x] = bg
            transparent = None
            delay_cs = 0
            disposal = 0
        return _finish(w, h, frames) if frames else None
    except (IndexError, struct.error):
        return None


def _finish(w, h, frames):
    return (w, h, frames)


def encode_gif_rgb24(
    width: int, height: int, rgb_rows: list[list[tuple[int, int, int]]]
) -> bytes | None:
    """Serialize RGB rows as a single-frame GIF89a with a global palette
    built from the distinct colors. Returns None above 256 distinct
    colors — GIF is palette-bound, and quantization would make this a
    lossy step pretending otherwise (the resize path never hits this:
    nearest-neighbor output colors are a subset of the decoded input's
    palette)."""
    palette: dict[tuple[int, int, int], int] = {}
    for row in rgb_rows:
        for px in row:
            if px not in palette:
                if len(palette) == 256:
                    return None
                palette[px] = len(palette)
    n = max(len(palette), 2)
    # palette size field is a power of two >= 2
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    pal = bytearray()
    colors = list(palette)
    for px in colors:
        pal += bytes(px)
    pal += b"\x00" * (3 * (size - len(colors)))
    mcs = max(2, bits)
    indices = bytes(
        palette[px] for row in rgb_rows for px in row
    )
    lzw = gif_lzw_encode(mcs, indices)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg=0, aspect
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += bytes([mcs])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animation(
    width: int,
    height: int,
    frames: list[tuple[list[list[tuple[int, int, int]]], int]],
) -> bytes | None:
    """Serialize (rgb_rows, delay_cs) frames as an animated GIF89a —
    each frame full-size with its own LOCAL palette and a GCE carrying
    its delay (disposal 0). The fixture writer that makes the animation
    decode path testable with zero external dependencies. Returns None
    if any frame exceeds 256 distinct colors."""
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", width, height)
    out += bytes([0x00, 0, 0])  # no global color table
    # Netscape 2.0 looping extension, as real encoders emit
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for rgb_rows, delay_cs in frames:
        palette: dict[tuple[int, int, int], int] = {}
        for row in rgb_rows:
            for px in row:
                if px not in palette:
                    if len(palette) == 256:
                        return None
                    palette[px] = len(palette)
        bits = max(1, (max(len(palette), 2) - 1).bit_length())
        size = 1 << bits
        pal = bytearray()
        for px in palette:
            pal += bytes(px)
        pal += b"\x00" * (3 * size - len(pal))
        mcs = max(2, bits)
        out += bytes([0x21, 0xF9, 4, 0x00]) + struct.pack(
            "<H", delay_cs
        ) + bytes([0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x80 | (bits - 1)])  # local color table flag+size
        out += pal
        out += bytes([mcs])
        lzw = gif_lzw_encode(
            mcs, bytes(palette[px] for row in rgb_rows for px in row)
        )
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def resize_gif_nearest(data: bytes | None, max_side: int) -> bytes | None:
    """REAL GIF thumbnail: LZW decode, nearest-neighbor downscale,
    re-encode with the surviving palette subset. Returns the input
    unchanged when it already fits, None outside the decode envelope."""
    decoded = decode_gif_rgb24(data)
    if decoded is None:
        return None
    w, h, rows = decoded
    if max(w, h) <= max_side:
        return data
    scale = max_side / max(w, h)
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    out = [
        [rows[min(h - 1, int(y / scale))][min(w - 1, int(x / scale))]
         for x in range(nw)]
        for y in range(nh)
    ]
    return encode_gif_rgb24(nw, nh, out)
