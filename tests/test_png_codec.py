"""Pure-stdlib PNG codec: roundtrip, full filter-type inversion, resize,
and the Spark resize_images path."""

from __future__ import annotations

import struct
import zlib

from datagouvfr_data_pipelines_spark.functions.udfs import (
    decode_png_rgb24,
    encode_png_rgb24,
    parse_image_dimensions,
    resize_images,
    resize_png_nearest,
)


def _rows(w, h):
    return [
        [((x * 7 + y * 13) % 256, (x * 3) % 256, (y * 5) % 256)
         for x in range(w)]
        for y in range(h)
    ]


def test_png_roundtrip():
    rows = _rows(9, 5)
    blob = encode_png_rgb24(9, 5, rows)
    assert parse_image_dimensions(blob)[0] == "png"
    w, h, back = decode_png_rgb24(blob)
    assert (w, h) == (9, 5)
    assert back == rows


def _encode_with_filters(w, h, rows, bpp, filters):
    """Hand-build a PNG whose scanlines use explicit filter types — the
    encoder only emits filter 0, so decoder inversion of Sub/Up/Average/
    Paeth needs spec-side forward filtering here."""
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    stride = w * bpp
    flat = []
    for row in rows:
        line = []
        for px in row:
            line.extend(px[:bpp] if bpp == 3 else (*px, 255))
        flat.append(line)
    raw = b""
    prev = [0] * stride
    for y, line in enumerate(flat):
        ft = filters[y % len(filters)]
        out = []
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                out.append(line[i])
            elif ft == 1:
                out.append((line[i] - a) & 0xFF)
            elif ft == 2:
                out.append((line[i] - b) & 0xFF)
            elif ft == 3:
                out.append((line[i] - ((a + b) >> 1)) & 0xFF)
            else:
                out.append((line[i] - paeth(a, b, c)) & 0xFF)
        raw += bytes([ft]) + bytes(out)
        prev = line

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    color_type = 2 if bpp == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_inverts_all_filter_types():
    rows = _rows(8, 10)
    for bpp in (3, 4):
        blob = _encode_with_filters(8, 10, rows, bpp, [0, 1, 2, 3, 4])
        w, h, back = decode_png_rgb24(blob)
        assert (w, h) == (8, 10)
        assert back == rows, f"bpp={bpp}"


def test_png_decoder_rejects_unsupported():
    rows = _rows(4, 4)
    blob = encode_png_rgb24(4, 4, rows)
    assert decode_png_rgb24(b"notapng") is None
    # palette color type (3) is outside the stdlib envelope
    mangled = bytearray(blob)
    mangled[8 + 4 + 4 + 9] = 3  # IHDR color_type byte
    assert decode_png_rgb24(bytes(mangled)) is None


def test_resize_png_nearest_shrinks_and_keeps():
    rows = _rows(16, 8)
    blob = encode_png_rgb24(16, 8, rows)
    small = resize_png_nearest(blob, 4)
    w, h, px = decode_png_rgb24(small)
    assert (w, h) == (4, 2)
    # nearest-neighbor: each output pixel is an exact input pixel
    assert all(p in {t for row in rows for t in row} for row in px for p in row)
    assert resize_png_nearest(blob, 64) == blob  # already fits
    assert resize_png_nearest(b"\xff\xd8\xff\xe0jpeg", 4) is None


def test_resize_images_handles_png(spark):
    rows = _rows(12, 6)
    blob = encode_png_rgb24(12, 6, rows)
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, content binary")
    out = resize_images(df, "media_id", "content", max_side=3).collect()[0]
    assert out.resize_status == "resized:png"
    assert (out.width, out.height) == (3, 1)
    assert decode_png_rgb24(bytes(out.content)) is not None
