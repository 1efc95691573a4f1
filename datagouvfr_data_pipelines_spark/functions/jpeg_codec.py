"""Baseline JPEG codec — stdlib byte-walking + numpy 8x8 transforms.

Closes the "dominant web image format" gap in the multimodal tier
(udfs.py decodes BMP and PNG for real; JPEG was header-only
passthrough): ``decode_jpeg_rgb24`` handles baseline sequential DCT
JPEG/JFIF — Huffman entropy decode (custom or Annex-K tables), 8- bit
samples, 1 (grayscale) or 3 (YCbCr) components, any h/v subsampling in
{1,2} (4:4:4, 4:2:2, 4:2:0, 4:4:0), restart markers, byte stuffing.
Progressive (SOF2) files decode at DC-SCAN GRADE (round 10): the first
scans of a progressive stream carry every block's DC coefficient = its
8x8 mean, exactly what dHash and thumbnailing consume — both the
interleaved (libjpeg default) and per-component DC scan scripts are
handled, refinement and AC scans are skipped. Arithmetic-coded, 12-bit,
and CMYK payloads return ``None`` — the same honest-gate policy as
``parse_image_dimensions`` (callers report ``passthrough``/
``unsupported``, never a wrong pixel).

``encode_jpeg_baseline`` is the matching writer (4:4:4, Annex-K tables
scaled by the libjpeg quality formula) so round-trip tests need no
external fixture: test-pattern BMP pixels -> encode -> decode recovers
pixels within quantization error, and dHash twin-pair recovery survives
the lossy cycle (tests/test_image_dedup.py).

Scale shape: this module is driver-free pure functions invoked inside
Arrow-batched ``mapInPandas`` workers (udfs.py image_dhash /
resize_images / extract_media_metadata) — per-image work, no Spark
state. The 2-D DCT/IDCT is two 8x8 numpy matmuls per block; the entropy
loop is pure Python, which bounds single-image throughput — the
documented trade for a zero-dependency container (swap PIL/libjpeg-turbo
in via the same decoder seam when the environment has it).

Format reference: ITU-T T.81 (public spec); tables are Annex K's
published example tables, not copied from any implementation.
"""

from __future__ import annotations

import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# untrusted-input ceiling: decode refuses images over this many pixels
# (64 MP ~ any real photo; a crafted huge SOF header returns None instead
# of allocating gigabytes executor-side)
MAX_DECODE_PIXELS = 64_000_000

# ITU-T T.81 Annex K.1 example quantization tables (spec-published)
STD_LUMA_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
STD_CHROMA_QUANT = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 example Huffman tables: (BITS count per code length 1..16, HUFFVAL)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix():
    import numpy as np

    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = (0.5 / (2.0 ** 0.5)) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_DCT_A = None


def _dct_a():
    global _DCT_A
    if _DCT_A is None:
        _DCT_A = _dct_matrix()
    return _DCT_A


def _build_huffman_decoder(bits: list[int], vals: list[int]):
    """Canonical Huffman: {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman_encoder(bits: list[int], vals: list[int]):
    """Canonical Huffman: {symbol -> (code, length)}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment.

    ``exhausted`` flips the first time a bit is requested past the end
    of the data. A conforming stream never needs that — encoders flush
    the final partial byte with 1-pad bits INSIDE the data — so any
    read past the end means the segment was truncated; ``_decode_scan``
    checks the flag and returns None instead of letting the 1-pad
    (spec fill value, which also makes ``decode_symbol`` miss the
    canonical tables fastest) masquerade as valid garbage MCUs."""

    __slots__ = ("data", "pos", "buf", "nbits", "exhausted")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0
        self.exhausted = False

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                self.exhausted = True
                return 1  # pad past end with 1s per T.81 F.1.2.3
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int | None:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        return None


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map ``size``-bit magnitude to signed amplitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _split_entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """De-stuff the scan data from ``start``; split at RSTn markers.
    Returns (segments, index of the terminating marker's 0xFF)."""
    segs = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker (EOI, next SOS, ...)
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg_rgb24(data: bytes | None):
    """Decode a baseline sequential JPEG to (width, height, rows) with
    ``rows[y][x] == (r, g, b)`` — the same contract as
    ``udfs.decode_png_rgb24``.

    Progressive (SOF2) files decode at DC-SCAN GRADE: the first scan of
    a progressive JPEG carries every 8x8 block's DC coefficient (the
    block mean), which is exactly the information dHash and thumbnail
    resampling consume — the returned pixels are the 8x-block-mean
    image at full declared dimensions. Supported progressive layout is
    the libjpeg/mozjpeg default (first scan = interleaved DC of all
    components, Ah=0); successive-approximation low bits (Al>0) are
    truncated, which costs < one quant step of precision. Anything else
    (arithmetic coding, 12-bit, CMYK, lossless/hierarchical, exotic
    scan scripts whose first scan is not a full DC scan, truncated
    streams) returns None — never a wrong pixel."""
    import numpy as np

    if not data or len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    quant: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    prog_grids: dict[int, "np.ndarray"] = {}
    restart_interval = 0
    i = 2
    n = len(data)
    try:
        while i < n - 1:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:  # legal fill byte before a marker
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:  # EOI before SOS
                return None
            if i + 4 > n:
                return None
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            seg = data[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 0x0F
                    j += 1
                    if pq == 0:
                        tbl = list(seg[j : j + 64])
                        j += 64
                    else:
                        tbl = [
                            struct.unpack(">H", seg[j + 2 * k : j + 2 * k + 2])[0]
                            for k in range(64)
                        ]
                        j += 128
                    q = np.zeros(64, dtype=np.float64)
                    for k in range(64):
                        q[ZIGZAG[k]] = tbl[k]
                    quant[tq] = q.reshape(8, 8)
            elif marker == 0xC4:  # DHT
                j = 0
                while j < len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0x0F
                    bits = list(seg[j + 1 : j + 17])
                    nv = sum(bits)
                    vals = list(seg[j + 17 : j + 17 + nv])
                    tbl = _build_huffman_decoder(bits, vals)
                    (huff_dc if tc == 0 else huff_ac)[th] = tbl
                    j += 17 + nv
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
                progressive = marker == 0xC2
                precision = seg[0]
                if precision != 8:
                    return None
                h_img = struct.unpack(">H", seg[1:3])[0]
                w_img = struct.unpack(">H", seg[3:5])[0]
                nc = seg[5]
                if nc not in (1, 3) or w_img == 0 or h_img == 0:
                    return None
                if w_img * h_img > MAX_DECODE_PIXELS:
                    # untrusted-input guard: a crafted 65535x65535 header
                    # must not become a 30+ GB plane allocation on an
                    # executor — honest None, caller reports unsupported
                    return None
                comps = []
                for c in range(nc):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                         "tq": seg[8 + 3 * c]}
                    )
                for c in comps:
                    if c["h"] not in (1, 2) or c["v"] not in (1, 2):
                        return None
                frame = (w_img, h_img, comps)
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # arithmetic / lossless / hierarchical: honest gate
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack(">H", seg[0:2])[0]
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    return None
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs = seg[1 + 2 * c]
                    td_ta = seg[2 + 2 * c]
                    scan.append((cs, td_ta >> 4, td_ta & 0x0F))
                segs, term = _split_entropy_segments(
                    data, i + 2 + seg_len
                )
                if progressive:
                    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
                    # a DC scan has Ss=Se=0 (T.81 G.1.1.1.1); requiring
                    # Se=0 also rejects a baseline entropy stream behind
                    # a mislabeled SOF2 header instead of misreading its
                    # DC+AC bits as DC-only garbage
                    if ss == 0 and se == 0 and ah == 0:
                        # first DC scan for these components — either
                        # interleaved (all components, libjpeg default)
                        # or non-interleaved single-component (the other
                        # common scan script); AC and refinement scans
                        # are skipped (DC-grade decode)
                        if not _decode_dc_scan_into(
                            frame, scan, huff_dc, restart_interval,
                            segs, al, prog_grids,
                        ):
                            return None
                        if all(
                            c["id"] in prog_grids for c in frame[2]
                        ):
                            return _finish_progressive_dc(
                                frame, prog_grids, quant
                            )
                    i = term
                    continue
                return _decode_scan(
                    frame, scan, quant, huff_dc, huff_ac,
                    restart_interval, segs,
                )
            i += 2 + seg_len
    except (IndexError, struct.error, KeyError, ValueError,
            ZeroDivisionError):
        # malformed untrusted bytes must never raise out of the decoder —
        # at scale an exception here kills the executor task, not one image
        return None
    return None


def _decode_scan(frame, scan, quant, huff_dc, huff_ac, restart_interval, segs):
    import numpy as np

    w_img, h_img, comps = frame
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None or td not in huff_dc or ta not in huff_ac:
            return None
        if c["tq"] not in quant:
            return None
        order.append((c, huff_dc[td], huff_ac[ta], quant[c["tq"]]))
    if len(order) != len(comps):
        return None  # multi-scan non-interleaved: outside the envelope

    if len(comps) == 1:
        # Per T.81 a one-component scan is NON-interleaved: the MCU is
        # one data unit walking the component's own ceil(w/8)*ceil(h/8)
        # block raster, and the declared sampling factors (some
        # transcoders keep 2x2 from a 4:2:0 source) do not apply to the
        # scan layout. Force h=v=1 so the MCU grid below degenerates to
        # that raster instead of decoding with phantom interleave.
        c0 = dict(comps[0], h=1, v=1)
        comps = [c0]
        by_id = {c0["id"]: c0}
        order = [(c0,) + o[1:] for o in order]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w_img + mcu_w - 1) // mcu_w
    mcus_y = (h_img + mcu_h - 1) // mcu_h
    planes = {
        c["id"]: np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        for c in comps
    }
    a = _dct_a()
    n_mcus = mcus_x * mcus_y
    per_seg = restart_interval if restart_interval else n_mcus
    mcu = 0
    for seg in segs:
        if mcu >= n_mcus:
            break
        rd = _BitReader(seg)
        pred = {c["id"]: 0 for c in comps}
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for c, dct, act, q in order:
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        s = rd.decode_symbol(dct)
                        if s is None:
                            return None
                        diff = _extend(rd.read_bits(s), s)
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = rd.decode_symbol(act)
                            if rs is None:
                                return None
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            coef[ZIGZAG[k]] = _extend(
                                rd.read_bits(size), size
                            )
                            k += 1
                        block = coef.reshape(8, 8) * q
                        spatial = a.T @ block @ a + 128.0
                        py = (my * c["v"] + bv) * 8
                        px = (mx * c["h"] + bh) * 8
                        planes[c["id"]][py : py + 8, px : px + 8] = spatial
            mcu += 1
        if rd.exhausted:
            # some bit beyond the segment's end was consumed while the
            # MCUs above "decoded" — truncated mid-segment; the 1-pad
            # produced garbage blocks, not pixels
            return None
    if mcu < n_mcus:
        return None  # truncated stream
    return _planes_to_rgb(w_img, h_img, comps, planes, hmax, vmax, np)


def _planes_to_rgb(w_img, h_img, comps, planes, hmax, vmax, np):
    """Upsample component planes to full resolution (sample replication)
    and color-convert to (w, h, rows) — shared by the sequential and
    progressive-DC decode paths."""
    full = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h_img, :w_img])

    if len(comps) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.int64)
        r = g = b = y
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = np.clip(np.rint(y + 1.402 * cr), 0, 255).astype(np.int64)
        g = np.clip(
            np.rint(y - 0.344136 * cb - 0.714136 * cr), 0, 255
        ).astype(np.int64)
        b = np.clip(np.rint(y + 1.772 * cb), 0, 255).astype(np.int64)
    rows = [
        [(int(r[yy, xx]), int(g[yy, xx]), int(b[yy, xx])) for xx in range(w_img)]
        for yy in range(h_img)
    ]
    return (w_img, h_img, rows)


def _decode_dc_scan_into(frame, scan, huff_dc, restart_interval, segs,
                         al, grids):
    """Decode one progressive first-DC scan (Ss=0, Ah=0) into ``grids``
    (comp_id -> int64 block grid of DC << al). Handles the interleaved
    all-components layout (MCU walk, h x v blocks per component per MCU)
    and the non-interleaved single-component layout (the component's own
    ceil(cw/8) x ceil(ch/8) block raster, T.81 A.2). Returns False on
    any malformed/truncated input. The DC coefficient of a block is its
    mean, so these grids are the whole DC-grade decode state."""
    import numpy as np

    w_img, h_img, comps = frame
    by_id = {c["id"]: c for c in comps}
    if len(comps) == 1:
        # sampling factors are meaningless for a single-component frame
        c0 = dict(comps[0], h=1, v=1)
        comps = [c0]
        by_id = {c0["id"]: c0}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h_img + 8 * vmax - 1) // (8 * vmax)

    order = []
    for cs, td, _ta in scan:
        c = by_id.get(cs)
        if c is None or td not in huff_dc or c["id"] in grids:
            return False
        order.append((c, huff_dc[td]))

    if len(order) == len(comps) and len(comps) > 1:
        # interleaved: MCU walk
        for c, _tbl in order:
            grids[c["id"]] = np.zeros(
                (mcus_y * c["v"], mcus_x * c["h"]), dtype=np.int64
            )
        n_mcus = mcus_x * mcus_y
        per_seg = restart_interval if restart_interval else n_mcus
        mcu = 0
        for seg in segs:
            if mcu >= n_mcus:
                break
            rd = _BitReader(seg)
            pred = {c["id"]: 0 for c, _t in order}
            for _ in range(min(per_seg, n_mcus - mcu)):
                my, mx = divmod(mcu, mcus_x)
                for c, tbl in order:
                    for bv in range(c["v"]):
                        for bh in range(c["h"]):
                            s = rd.decode_symbol(tbl)
                            if s is None:
                                return False
                            pred[c["id"]] += _extend(rd.read_bits(s), s)
                            grids[c["id"]][my * c["v"] + bv,
                                           mx * c["h"] + bh] = (
                                pred[c["id"]] << al
                            )
                mcu += 1
            if rd.exhausted:
                return False
        return mcu == n_mcus

    if len(order) != 1:
        return False  # partial multi-component scan: outside envelope
    # non-interleaved: the component's own block raster (which can be
    # narrower than the MCU-padded grid when dimensions are not MCU
    # multiples — T.81 A.2.2)
    c, tbl = order[0]
    grid = np.zeros((mcus_y * c["v"], mcus_x * c["h"]), dtype=np.int64)
    bx_n = ((w_img * c["h"] + hmax - 1) // hmax + 7) // 8
    by_n = ((h_img * c["v"] + vmax - 1) // vmax + 7) // 8
    n_units = bx_n * by_n
    per_seg = restart_interval if restart_interval else n_units
    unit = 0
    pred = 0
    for seg in segs:
        if unit >= n_units:
            break
        rd = _BitReader(seg)
        pred = 0
        for _ in range(min(per_seg, n_units - unit)):
            by, bx = divmod(unit, bx_n)
            s = rd.decode_symbol(tbl)
            if s is None:
                return False
            pred += _extend(rd.read_bits(s), s)
            grid[by, bx] = pred << al
            unit += 1
        if rd.exhausted:
            return False
    if unit < n_units:
        return False
    grids[c["id"]] = grid
    return True


def _finish_progressive_dc(frame, grids, quant):
    """Expand accumulated DC grids into 8x-block-mean planes and color
    convert: the orthonormal IDCT of a DC-only block is the constant
    dc*q00/8 + 128, so each block paints as its mean."""
    import numpy as np

    w_img, h_img, comps = frame
    if len(comps) == 1:
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = {}
    for c in comps:
        if c["tq"] not in quant:
            return None
        q00 = quant[c["tq"]][0, 0]
        planes[c["id"]] = np.repeat(
            np.repeat(grids[c["id"]] * (q00 / 8.0) + 128.0, 8, axis=0),
            8, axis=1,
        )
    return _planes_to_rgb(w_img, h_img, comps, planes, hmax, vmax, np)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.buf <<= 8 - self.nbits
            self.buf |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.nbits = 0


def _quality_scaled(base: list[int], quality: int) -> list[int]:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (v * scale + 50) // 100)) for v in base]


def _size_cat(v: int) -> int:
    a = abs(v)
    s = 0
    while a:
        a >>= 1
        s += 1
    return s


def _block_zz(block, qm, a, np):
    """FDCT + quantize one 8x8 block to its zigzag coefficient list."""
    coef = a @ block @ a.T
    qz = np.rint(coef / qm).astype(np.int64)
    return [int(qz.flat[ZIGZAG[k]]) for k in range(64)]


def _encode_block(bw, block, qm, a, enc_dc, enc_ac, pred, ci, np):
    """FDCT + quantize + Huffman-encode one 8x8 block; returns new DC."""
    zz = _block_zz(block, qm, a, np)
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    s = _size_cat(diff)
    code, ln = enc_dc[s]
    bw.write(code, ln)
    if s:
        amp = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(amp, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _size_cat(v)
        code, ln = enc_ac[(run << 4) | s]
        bw.write(code, ln)
        amp = v if v >= 0 else v + (1 << s) - 1
        bw.write(amp, s)
        run = 0
    if last_nz < 63:
        code, ln = enc_ac[0x00]  # EOB
        bw.write(code, ln)


def encode_jpeg_baseline(
    width: int,
    height: int,
    rows: list[list[tuple[int, int, int]]],
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode RGB rows as baseline sequential JFIF with Annex-K Huffman
    tables and quality-scaled Annex-K quant tables. The test-side twin of
    ``decode_jpeg_rgb24``: ``subsampling`` '444' (one 8x8 MCU per
    component) or '420' (16x16 MCU: 4 luma blocks + 2x2 box-averaged
    chroma — what libjpeg emits by default), and ``restart_interval`` > 0
    inserts DRI/RSTn markers every N MCUs — together they make the
    decoder's subsampled and restart paths testable without external
    fixtures."""
    import numpy as np

    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    rgb = np.array(rows, dtype=np.float64)  # (h, w, 3)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    qy = _quality_scaled(STD_LUMA_QUANT, quality)
    qc = _quality_scaled(STD_CHROMA_QUANT, quality)

    def qmat(zz):
        m = np.zeros(64, dtype=np.float64)
        for k in range(64):
            m[ZIGZAG[k]] = zz[k]
        return m.reshape(8, 8)

    qmy, qmc = qmat(qy), qmat(qc)
    hv = 2 if subsampling == "420" else 1
    mcu_px = 8 * hv
    pad_h = (height + mcu_px - 1) // mcu_px * mcu_px
    pad_w = (width + mcu_px - 1) // mcu_px * mcu_px

    def pad(p):
        return np.pad(
            p, ((0, pad_h - height), (0, pad_w - width)), mode="edge"
        )

    y, cb, cr = pad(y), pad(cb), pad(cr)
    if hv == 2:  # 2x2 box-average chroma downsample
        cb = (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2]
              + cb[1::2, 1::2]) / 4.0
        cr = (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2]
              + cr[1::2, 1::2]) / 4.0
    a = _dct_a()

    enc_dc = [
        _build_huffman_encoder(*STD_DC_LUMA),
        _build_huffman_encoder(*STD_DC_CHROMA),
    ]
    enc_ac = [
        _build_huffman_encoder(*STD_AC_LUMA),
        _build_huffman_encoder(*STD_AC_CHROMA),
    ]

    bw = _BitWriter()
    entropy = bytearray()
    pred = [0, 0, 0]
    mcus_y, mcus_x = pad_h // mcu_px, pad_w // mcu_px
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                entropy += bw.out
                bw = _BitWriter()
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            # luma blocks, bv-major then bh (the interleave order the
            # decoder reassembles)
            for bv in range(hv):
                for bh in range(hv):
                    py, px = (my * hv + bv) * 8, (mx * hv + bh) * 8
                    _encode_block(
                        bw, y[py : py + 8, px : px + 8], qmy, a,
                        enc_dc[0], enc_ac[0], pred, 0, np,
                    )
            for ci, plane in ((1, cb), (2, cr)):
                py, px = my * 8, mx * 8
                _encode_block(
                    bw, plane[py : py + 8, px : px + 8], qmc, a,
                    enc_dc[1], enc_ac[1], pred, ci, np,
                )
            mcu += 1
    bw.flush()
    entropy += bw.out

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, zz in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(zz)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
    out += struct.pack(">HH", height, width) + b"\x03"
    samp = (hv << 4) | hv
    out += bytes([1, samp, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc_th, (bits, vals) in (
        (0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA),
        (0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 12) + b"\x03"
    out += bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
    out += b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    width: int,
    height: int,
    rows: list[list[tuple[int, int, int]]],
    quality: int = 90,
    dc_al: int = 1,
) -> bytes:
    """Encode RGB rows as a PROGRESSIVE (SOF2) JFIF at 4:4:4 — the
    test-side twin for the decoder's DC-grade progressive path, shaped
    like the libjpeg default scan script: scan 1 = interleaved DC of all
    components with successive approximation (Ah=0, Al=``dc_al``), then
    ``dc_al`` DC refinement scans — T.81 G.1.2.1 refines exactly ONE bit
    per scan, so each carries Ah=Al+1 and one raw bit per block, highest
    bit first (the DC-grade decoder must SKIP these) — then per-component
    spectral-selection AC scans (Ss=1, Se=63) with real coefficients
    under T.81 G.1.2.2 EOBRUN coding. A full progressive decoder would
    reconstruct the image exactly as ``encode_jpeg_baseline`` quality
    would; our DC-grade decoder reads only scan 1."""
    import numpy as np

    if dc_al < 0 or dc_al > 13:
        raise ValueError("dc_al out of range")
    rgb = np.array(rows, dtype=np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b - 128.0,
        -0.168736 * r - 0.331264 * g + 0.5 * b,
        0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    qy = _quality_scaled(STD_LUMA_QUANT, quality)
    qc = _quality_scaled(STD_CHROMA_QUANT, quality)

    def qmat(zz):
        m = np.zeros(64, dtype=np.float64)
        for k in range(64):
            m[ZIGZAG[k]] = zz[k]
        return m.reshape(8, 8)

    qms = [qmat(qy), qmat(qc), qmat(qc)]
    pad_h = (height + 7) // 8 * 8
    pad_w = (width + 7) // 8 * 8
    a = _dct_a()
    bx_n, by_n = pad_w // 8, pad_h // 8
    # per-component zigzag coefficient rasters
    zz_all = []
    for ci, plane in enumerate(planes):
        p = np.pad(
            plane, ((0, pad_h - height), (0, pad_w - width)), mode="edge"
        )
        zz_all.append([
            _block_zz(
                p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                qms[ci], a, np,
            )
            for by in range(by_n) for bx in range(bx_n)
        ])

    enc_dc = [
        _build_huffman_encoder(*STD_DC_LUMA),
        _build_huffman_encoder(*STD_DC_CHROMA),
    ]
    # Progressive AC scans need EOBn symbols (r<<4|0 for r in 0..14),
    # which Annex K's SEQUENTIAL example tables do not contain — use a
    # custom uniform table: all 176 possible progressive-AC symbols
    # (EOB0..EOB14, ZRL, and r/s for s in 1..10) at code length 8
    # (canonical, 176 <= 2^8). Emitted in this file's DHT, so any
    # conforming decoder reads it; our DC-grade decoder skips AC scans.
    prog_ac_vals = (
        [r << 4 for r in range(15)] + [0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    prog_ac_bits = [0] * 16
    prog_ac_bits[7] = len(prog_ac_vals)
    enc_ac_prog = _build_huffman_encoder(prog_ac_bits, prog_ac_vals)

    # scan 1: interleaved first DC scan, values coded as DC >> dc_al
    bw = _BitWriter()
    pred = [0, 0, 0]
    for blk in range(bx_n * by_n):
        for ci in range(3):
            v = zz_all[ci][blk][0] >> dc_al
            diff = v - pred[ci]
            pred[ci] = v
            s = _size_cat(diff)
            code, ln = enc_dc[0 if ci == 0 else 1][s]
            bw.write(code, ln)
            if s:
                amp = diff if diff >= 0 else diff + (1 << s) - 1
                bw.write(amp, s)
    bw.flush()
    dc_first = bytes(bw.out)

    # DC refinement scans: T.81 G.1.2.1 successive approximation refines
    # exactly ONE bit per scan (Ah = Al + 1), so dc_al low bits take
    # dc_al separate scans, highest bit first. A single all-bits scan
    # would be non-conforming for dc_al > 1 and misparse in third-party
    # decoders (round-11 advice fix).
    dc_refines = []  # (ah, al, entropy) — ah = al + 1
    for al in range(dc_al - 1, -1, -1):
        bw = _BitWriter()
        for blk in range(bx_n * by_n):
            for ci in range(3):
                bw.write((zz_all[ci][blk][0] >> al) & 1, 1)
        bw.flush()
        dc_refines.append((al + 1, al, bytes(bw.out)))

    # scans 3-5: per-component AC first scans with EOBRUN coding
    def ac_scan(ci):
        enc = enc_ac_prog
        bw = _BitWriter()
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            while eobrun > 0:
                chunk = min(eobrun, 32767)
                rr = chunk.bit_length() - 1
                code, ln = enc[rr << 4]
                bw.write(code, ln)
                if rr:
                    bw.write(chunk - (1 << rr), rr)
                eobrun -= chunk

        for blk in range(bx_n * by_n):
            zz = zz_all[ci][blk]
            last_nz = 0
            for k in range(63, 0, -1):
                if zz[k]:
                    last_nz = k
                    break
            if last_nz == 0:
                eobrun += 1
                continue
            flush_eobrun()
            run = 0
            for k in range(1, last_nz + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s = _size_cat(v)
                code, ln = enc[(run << 4) | s]
                bw.write(code, ln)
                amp = v if v >= 0 else v + (1 << s) - 1
                bw.write(amp, s)
                run = 0
            if last_nz < 63:
                eobrun += 1
        flush_eobrun()
        bw.flush()
        return bytes(bw.out)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, zz in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(zz)
    out += b"\xff\xc2" + struct.pack(">H", 17) + b"\x08"
    out += struct.pack(">HH", height, width) + b"\x03"
    out += bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc_th, (bits, vals) in (
        (0x00, STD_DC_LUMA), (0x01, STD_DC_CHROMA),
        (0x10, (prog_ac_bits, prog_ac_vals)),
        (0x11, (prog_ac_bits, prog_ac_vals)),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)

    def sos(comps_spec, ss, se, ah, al, entropy):
        nonlocal out
        out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(comps_spec))
        out += bytes([len(comps_spec)])
        for cid, tdta in comps_spec:
            out += bytes([cid, tdta])
        out += bytes([ss, se, (ah << 4) | al])
        out += entropy

    sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, dc_al, dc_first)
    for ah, al, entropy in dc_refines:
        sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, ah, al, entropy)
    sos([(1, 0x00)], 1, 63, 0, 0, ac_scan(0))
    sos([(2, 0x01)], 1, 63, 0, 0, ac_scan(1))
    sos([(3, 0x01)], 1, 63, 0, 0, ac_scan(2))
    out += b"\xff\xd9"
    return bytes(out)
