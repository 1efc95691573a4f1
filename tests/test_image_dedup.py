"""Perceptual image hashing (dHash) + banded-Hamming image near-dup:
codec-format invariance (BMP vs PNG of the same pixels), perturbation
robustness, discrimination, and the end-to-end pairing query."""

from __future__ import annotations

from datagouvfr_data_pipelines_spark.functions.udfs import (
    dhash64_py,
    decode_png_rgb24,
    encode_png_rgb24,
    make_bmp,
    make_test_pattern_bmp,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _rows_of(bmp: bytes):
    """Decode the BMP fixture back to rgb rows via the resize identity
    path is overkill — regenerate through the PNG codec round trip."""
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        _bmp_rgb_sampler,
    )

    w, h, get = _bmp_rgb_sampler(bmp)
    return [[get(x, y) for x in range(w)] for y in range(h)]


def test_dhash_format_invariant_bmp_vs_png():
    bmp = make_test_pattern_bmp(7)
    rows = _rows_of(bmp)
    png = encode_png_rgb24(16, 16, rows)
    assert decode_png_rgb24(png)[2] == rows
    ha, hb = dhash64_py(bmp), dhash64_py(png)
    assert ha is not None and ha == hb


def test_dhash_robust_to_small_edit_but_discriminative():
    for seed in range(20):
        a = dhash64_py(make_test_pattern_bmp(seed))
        twin = dhash64_py(make_test_pattern_bmp(seed, perturb=True))
        other = dhash64_py(make_test_pattern_bmp(seed + 1))
        assert _hamming(a, twin) <= 6, seed
        assert _hamming(a, other) > 6, seed


def test_dhash_robust_to_rescale():
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        resize_bmp_nearest,
    )

    big = make_test_pattern_bmp(11, 64, 64)
    small = resize_bmp_nearest(big, 32)
    # nearest-neighbor halving preserves most sampled gradients
    assert _hamming(dhash64_py(big), dhash64_py(small)) <= 16


def test_dhash_unsupported_payload_returns_none():
    assert dhash64_py(None) is None
    assert dhash64_py(b"\xff\xd8\xff\xe0 not decodable jpeg") is None


def test_dhash_solid_image_is_zero():
    solid = make_bmp(16, 16, [[(9, 9, 9)] * 16 for _ in range(16)])
    assert dhash64_py(solid) == 0


def test_image_neardup_query_pairs_twins(spark, sf_dir):
    from datagouvfr_data_pipelines_spark import plans

    pairs = plans.queries()["mm_image_neardups"](spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # exactly the (2k, 2k+1) twin pairs — pseudo-random patterns keep
    # distinct seeds far apart (cross distance >= ~20 bits)
    assert got == {(2 * k, 2 * k + 1) for k in range(50)}, sorted(got)[:10]


# --------------------------------------------------------------------------
# Baseline JPEG codec (round 9): roundtrip, honest gates, dHash survival
# --------------------------------------------------------------------------

def _jpeg_of(bmp: bytes, quality: int = 95) -> bytes:
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        encode_jpeg_baseline,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        _bmp_rgb_sampler,
    )

    w, h, get = _bmp_rgb_sampler(bmp)
    rows = [[get(x, y) for x in range(w)] for y in range(h)]
    return encode_jpeg_baseline(w, h, rows, quality=quality)


def test_jpeg_roundtrip_error_bounded_and_dims_exact():
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24, encode_jpeg_baseline,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        _bmp_rgb_sampler, make_test_pattern_bmp, parse_image_dimensions,
    )

    bmp = make_test_pattern_bmp(7)
    w, h, get = _bmp_rgb_sampler(bmp)
    rows = [[get(x, y) for x in range(w)] for y in range(h)]
    # non-multiple-of-8 size exercises edge padding on encode + crop on decode
    rows_odd = [[rows[y % h][x % w] for x in range(17)] for y in range(13)]
    for (ww, hh, rr) in ((w, h, rows), (17, 13, rows_odd)):
        jpg = encode_jpeg_baseline(ww, hh, rr, quality=95)
        assert parse_image_dimensions(jpg) == ("jpeg", ww, hh)
        dec = decode_jpeg_rgb24(jpg)
        assert dec is not None and dec[0] == ww and dec[1] == hh
        errs = [
            abs(rr[y][x][c] - dec[2][y][x][c])
            for y in range(hh) for x in range(ww) for c in range(3)
        ]
        assert sum(errs) / len(errs) < 8.0  # q95 on worst-case noise
        assert max(errs) < 48


def test_jpeg_solid_color_decodes_exactly():
    """DC-only block: a flat image must survive the cycle bit-exactly
    (catches zigzag/quant/IDCT scaling bugs that roundtrip noise hides)."""
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24, encode_jpeg_baseline,
    )

    rows = [[(120, 64, 200)] * 16 for _ in range(16)]
    dec = decode_jpeg_rgb24(encode_jpeg_baseline(16, 16, rows, quality=95))
    assert dec is not None
    flat = {px for row in dec[2] for px in row}
    assert len(flat) == 1
    (r, g, b) = flat.pop()
    assert abs(r - 120) <= 2 and abs(g - 64) <= 2 and abs(b - 200) <= 2


def test_jpeg_progressive_is_honestly_gated():
    """The progressive envelope's remaining honest gates: a BASELINE
    entropy stream behind a mislabeled SOF2 header is rejected (its scan
    has Se=63, not a DC scan — misreading its DC+AC bits as DC-only
    would paint garbage), and malformed/truncated inputs return None."""
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24, encode_jpeg_baseline,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        parse_image_dimensions, resize_jpeg_nearest,
    )

    rows = [[(10, 20, 30)] * 16 for _ in range(16)]
    jpg = bytearray(encode_jpeg_baseline(16, 16, rows))
    i = jpg.find(b"\xff\xc0")
    jpg[i + 1] = 0xC2  # SOF0 -> SOF2, entropy still sequential
    prog = bytes(jpg)
    assert parse_image_dimensions(prog) == ("jpeg", 16, 16)  # header real
    assert decode_jpeg_rgb24(prog) is None
    assert resize_jpeg_nearest(prog, 8) is None
    assert decode_jpeg_rgb24(b"\xff\xd8\xff") is None  # truncated
    assert decode_jpeg_rgb24(None) is None
    # legal 0xFF fill bytes between markers must be skipped, not parsed
    jpg[i + 1] = 0xC0  # restore SOF0
    good = bytes(jpg)
    dec = decode_jpeg_rgb24(good[:2] + b"\xff\xff\xff" + good[2:])
    assert dec is not None and dec[0] == 16 and dec[1] == 16


def test_jpeg_dhash_margins_survive_lossy_cycle():
    """The property the near-dup tier relies on: JPEG q95 jitter moves a
    hash <= 6 bits from its BMP source and from its perturbed twin, while
    unrelated patterns stay far (>6) — so threshold 6 recovers exactly
    the twin pairs."""
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        dhash64_py, make_test_pattern_bmp,
    )

    for seed in range(20):
        a_bmp = make_test_pattern_bmp(seed)
        ha_bmp = dhash64_py(a_bmp)
        ha_jpg = dhash64_py(_jpeg_of(a_bmp))
        ht_jpg = dhash64_py(_jpeg_of(make_test_pattern_bmp(seed, perturb=True)))
        ho_jpg = dhash64_py(_jpeg_of(make_test_pattern_bmp(seed + 1)))
        assert ha_jpg is not None
        assert _hamming(ha_bmp, ha_jpg) <= 6, seed   # format-robust
        assert _hamming(ha_jpg, ht_jpg) <= 6, seed   # twin found
        assert _hamming(ha_jpg, ho_jpg) > 6, seed    # discriminative


def test_jpeg_resize_real_downscale():
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        make_test_pattern_bmp, parse_image_dimensions, resize_jpeg_nearest,
    )

    jpg = _jpeg_of(make_test_pattern_bmp(3))
    small = resize_jpeg_nearest(jpg, 8)
    assert small is not None and small != jpg
    assert parse_image_dimensions(small) == ("jpeg", 8, 8)
    assert decode_jpeg_rgb24(small) is not None
    # already-fits: returned unchanged
    assert resize_jpeg_nearest(jpg, 16) == jpg


def test_jpeg_subsampled_grayscale_and_restart_paths():
    """Decoder envelope beyond what our encoder emits: 4:2:0 subsampling,
    grayscale, and restart markers — exercised via hand-built streams from
    the SAME entropy primitives (tables are Annex-K), checking shape and
    plausibility rather than exact pixels."""
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24,
    )

    # real-world fixtures when the environment has any (python.org logo
    # ships with CPython's test suite in some images of this container)
    import glob
    candidates = glob.glob(
        "/usr/lib/python3*/test/imghdrdata/python.jpg"
    ) + glob.glob(
        "/root/.pyenv/versions/*/lib/python3*/test/imghdrdata/python.jpg"
    )
    for p in candidates:
        with open(p, "rb") as fh:
            dec = decode_jpeg_rgb24(fh.read())
        assert dec is not None and dec[0] == 16 and dec[1] == 16


def test_jpeg_420_and_restart_decode_paths_hermetic():
    """The decoder's subsampled-MCU and restart-marker paths, pinned with
    OUR OWN encoder (no external fixtures): 4:2:0 round-trips a smooth
    in-gamut image within chroma-subsampling error, and inserting RSTn
    markers must not change a single decoded pixel."""
    import statistics

    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24, encode_jpeg_baseline,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        parse_image_dimensions,
    )

    smooth = [
        [(min(255, x * 6), min(255, y * 8), 128) for x in range(32)]
        for y in range(24)
    ]
    for sub, bound in (("444", 1.5), ("420", 4.0)):
        jpg = encode_jpeg_baseline(32, 24, smooth, quality=90,
                                   subsampling=sub)
        assert parse_image_dimensions(jpg) == ("jpeg", 32, 24)
        dec = decode_jpeg_rgb24(jpg)
        assert dec is not None and (dec[0], dec[1]) == (32, 24)
        err = statistics.mean(
            abs(smooth[y][x][c] - dec[2][y][x][c])
            for y in range(24) for x in range(32) for c in range(3)
        )
        assert err < bound, (sub, err)
        # restart markers every 1 and 3 MCUs: bit-identical pixels
        for ri in (1, 3):
            with_rst = decode_jpeg_rgb24(
                encode_jpeg_baseline(32, 24, smooth, quality=90,
                                     subsampling=sub, restart_interval=ri)
            )
            assert with_rst is not None and with_rst[2] == dec[2], (sub, ri)
    # 4:2:0 with a non-multiple-of-16 size exercises MCU edge padding
    odd = [[smooth[y][x] for x in range(17)] for y in range(13)]
    dec = decode_jpeg_rgb24(
        encode_jpeg_baseline(17, 13, odd, subsampling="420")
    )
    assert dec is not None and (dec[0], dec[1]) == (17, 13)


def test_jpeg_decoder_never_raises_on_malformed_bytes():
    """The decoder faces untrusted web bytes inside executor tasks: any
    exception kills the whole task, not one image. 2000 adversarial
    inputs — random bytes, SOI + garbage, truncations, bit-flipped valid
    files — must all return None or a shape-consistent decode, never
    raise. A crafted 65535x65535 SOF header must hit the pixel ceiling
    (MAX_DECODE_PIXELS), not a 30 GB allocation."""
    import random
    import struct

    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24, encode_jpeg_baseline,
    )

    rng = random.Random(42)
    base = encode_jpeg_baseline(
        16, 16,
        [[(rng.randrange(256),) * 3 for _ in range(16)] for _ in range(16)],
    )
    for trial in range(2000):
        kind = trial % 4
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(200)))
        elif kind == 1:
            data = b"\xff\xd8" + bytes(
                rng.randrange(256) for _ in range(rng.randrange(300))
            )
        elif kind == 2:
            data = base[: rng.randrange(len(base))]
        else:
            mut = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            data = bytes(mut)
        r = decode_jpeg_rgb24(data)  # must not raise
        if r is not None:
            w, h, rows = r
            assert len(rows) == h and all(len(x) == w for x in rows)

    huge = bytearray(base)
    i = huge.find(b"\xff\xc0")
    huge[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    assert decode_jpeg_rgb24(bytes(huge)) is None


def _encode_jpeg_grayscale(width, height, plane, quality=90, samp=0x11):
    """Hermetic single-component baseline JPEG from the codec's own
    entropy primitives; ``samp`` is the DECLARED SOF sampling byte —
    per T.81 it is meaningless for a one-component scan (the scan walks
    the plain ceil(w/8) x ceil(h/8) block raster), so any value must
    decode to the same pixels."""
    import struct

    import numpy as np

    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        STD_AC_LUMA, STD_DC_LUMA, STD_LUMA_QUANT, ZIGZAG, _BitWriter,
        _build_huffman_encoder, _dct_a, _encode_block, _quality_scaled,
    )

    y = np.array(plane, dtype=np.float64) - 128.0
    qzz = _quality_scaled(STD_LUMA_QUANT, quality)
    qm = np.zeros(64, dtype=np.float64)
    for k in range(64):
        qm[ZIGZAG[k]] = qzz[k]
    qm = qm.reshape(8, 8)
    pad_h = (height + 7) // 8 * 8
    pad_w = (width + 7) // 8 * 8
    y = np.pad(y, ((0, pad_h - height), (0, pad_w - width)), mode="edge")
    a = _dct_a()
    enc_dc = _build_huffman_encoder(*STD_DC_LUMA)
    enc_ac = _build_huffman_encoder(*STD_AC_LUMA)
    bw = _BitWriter()
    pred = [0]
    for by in range(pad_h // 8):
        for bx in range(pad_w // 8):
            _encode_block(
                bw, y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qm, a,
                enc_dc, enc_ac, pred, 0, np,
            )
    bw.flush()
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qzz)
    out += b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
    out += struct.pack(">HH", height, width) + b"\x01"
    out += bytes([1, samp, 0])
    for tc_th, (bits, vals) in ((0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01"
    out += bytes([1, 0x00]) + b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_grayscale_scan_is_noninterleaved():
    """T.81: a one-component scan is non-interleaved regardless of the
    declared sampling factors. Grayscale files carrying 2x2 factors
    (transcoders keep them from a 4:2:0 source) must decode to the SAME
    pixels as the 1x1 twin — not scrambled MCU-interleave garbage."""
    import random

    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24,
    )

    rng = random.Random(11)
    w, h = 37, 21  # non-multiple-of-16 exercises edge blocks too
    plane = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    ref = decode_jpeg_rgb24(_encode_jpeg_grayscale(w, h, plane, samp=0x11))
    assert ref is not None and (ref[0], ref[1]) == (w, h)
    # grayscale decodes replicate luma into r=g=b
    assert all(px[0] == px[1] == px[2] for row in ref[2] for px in row)
    for samp in (0x22, 0x21, 0x12):
        got = decode_jpeg_rgb24(
            _encode_jpeg_grayscale(w, h, plane, samp=samp)
        )
        assert got is not None, hex(samp)
        assert got[2] == ref[2], hex(samp)


def test_jpeg_truncated_mid_segment_returns_none():
    """A stream cut mid-entropy must return None, not 'succeed' by
    Huffman-decoding the pad bits into garbage MCUs — with and without
    restart markers (truncation INSIDE the final segment is the case
    the old mcu-count check could not see)."""
    import random

    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24, encode_jpeg_baseline,
    )

    rng = random.Random(13)
    rows = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
         for _ in range(32)]
        for _ in range(32)
    ]
    for ri in (0, 2):
        jpg = encode_jpeg_baseline(32, 32, rows, quality=85,
                                   restart_interval=ri)
        assert decode_jpeg_rgb24(jpg) is not None
        sos = jpg.index(b"\xff\xda")
        scan_start = sos + 2 + 12  # marker + SOS segment (len 12)
        entropy_len = len(jpg) - 2 - scan_start  # minus EOI
        for frac in (0.3, 0.5, 0.7, 0.85, 0.95):
            cut = scan_start + int(entropy_len * frac)
            assert decode_jpeg_rgb24(jpg[:cut]) is None, (ri, frac)
        # cutting ONLY the EOI loses no entropy data: still decodes
        assert decode_jpeg_rgb24(jpg[:-2]) is not None, ri


def test_jpeg_progressive_dc_roundtrip():
    """Progressive (SOF2) decode at DC grade: exact dims, every 8x8
    block constant at (approximately) the source block mean, refinement
    and AC scans skipped; truncation INSIDE the DC scan returns None,
    while truncation after the DC scans still decodes — rendering an
    incomplete progressive stream at DC grade is the format's point."""
    import statistics

    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24, encode_jpeg_progressive,
    )

    w, h = 37, 21
    rows = [
        [(min(255, x * 6), min(255, y * 8), (x * y) % 256)
         for x in range(w)]
        for y in range(h)
    ]
    prog = encode_jpeg_progressive(w, h, rows, quality=90, dc_al=1)
    dec = decode_jpeg_rgb24(prog)
    assert dec is not None and (dec[0], dec[1]) == (w, h)
    errs = []
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            px = dec[2][by * 8][bx * 8]
            for y in range(by * 8, min(by * 8 + 8, h)):
                for x in range(bx * 8, min(bx * 8 + 8, w)):
                    assert dec[2][y][x] == px  # block-constant
            for c in range(3):
                mean = statistics.mean(
                    rows[min(y, h - 1)][min(x, w - 1)][c]
                    for y in range(by * 8, by * 8 + 8)
                    for x in range(bx * 8, bx * 8 + 8)
                )
                errs.append(abs(mean - px[c]))
    assert max(errs) < 4.0, max(errs)

    # the DC scan sits at the front: cuts inside it must fail honestly
    sos = prog.index(b"\xff\xda")
    for cut in (sos + 20, sos + 40):
        assert decode_jpeg_rgb24(prog[:cut]) is None
    # a cut that only loses AC scans still decodes at DC grade
    last_sos = prog.rindex(b"\xff\xda")
    late = decode_jpeg_rgb24(prog[:last_sos])
    assert late is not None and late[2] == dec[2]


def test_jpeg_progressive_dc_refinement_scans_conform():
    """T.81 G.1.2.1: successive-approximation refinement scans refine
    exactly ONE bit each (Ah = Al + 1). For dc_al=3 the encoder must
    emit three separate DC refinement scans (Ah/Al = 3/2, 2/1, 1/0),
    highest bit first — a single all-bits scan is non-conforming and
    misparses in third-party decoders. The DC-grade decoder still
    decodes scan 1 and skips every refinement."""
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24, encode_jpeg_progressive,
    )

    w, h = 24, 16
    rows = [
        [((x * 11) % 256, (y * 17) % 256, (x + y) % 256) for x in range(w)]
        for y in range(h)
    ]
    data = encode_jpeg_progressive(w, h, rows, quality=85, dc_al=3)

    # walk SOS headers, collect (Ss, Se, Ah, Al) per scan
    scans = []
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF or data[i + 1] in (0x00, 0xD8, 0xD9):
            i += 1
            continue
        marker = data[i + 1]
        seg_len = (data[i + 2] << 8) | data[i + 3]
        if marker == 0xDA:
            ns = data[i + 4]
            b = data[i + 4 + 2 * ns + 3]
            scans.append(
                (data[i + 4 + 2 * ns + 1], data[i + 4 + 2 * ns + 2],
                 b >> 4, b & 0x0F)
            )
        i += 2 + seg_len

    dc_scans = [s for s in scans if s[0] == 0 and s[1] == 0]
    first = [s for s in dc_scans if s[2] == 0]
    refines = [s for s in dc_scans if s[2] != 0]
    assert first == [(0, 0, 0, 3)]
    assert refines == [(0, 0, 3, 2), (0, 0, 2, 1), (0, 0, 1, 0)]

    dec = decode_jpeg_rgb24(data)
    assert dec is not None and (dec[0], dec[1]) == (w, h)


def test_jpeg_progressive_real_world_fixture():
    """Independent validation: progressive JPEGs shipped in this
    container (nodejs docs — libjpeg-style per-component DC scan
    script, verified SOF2) must decode with exact header dimensions."""
    import glob

    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        decode_jpeg_rgb24,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        parse_image_dimensions,
    )

    found = 0
    for p in glob.glob("/usr/share/doc/nodejs/*.jpg"):
        with open(p, "rb") as fh:
            data = fh.read()
        if b"\xff\xc2" not in data:
            continue
        parsed = parse_image_dimensions(data)
        dec = decode_jpeg_rgb24(data)
        assert dec is not None, p
        assert (dec[0], dec[1]) == (parsed[1], parsed[2]), p
        found += 1
    if not found:
        import pytest

        pytest.skip("no progressive JPEG fixture in this container")


def test_jpeg_progressive_cross_codec_dhash_margins():
    """The near-dup guarantee behind mm_image_neardups_progressive: on
    the block-aligned banded codeword fixture, a BASELINE original and
    the PROGRESSIVE encode of its perturbed twin hash 0 bits apart
    (full decode and DC-grade decode see the same band means), while
    different patterns stay >= 2x the banded-search radius."""
    from datagouvfr_data_pipelines_spark.functions.jpeg_codec import (
        encode_jpeg_baseline, encode_jpeg_progressive,
    )
    from datagouvfr_data_pipelines_spark.functions.udfs import (
        dhash64_py, make_banded_test_rows,
    )

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    hashes = {}
    for seed in range(20):
        hb = dhash64_py(
            encode_jpeg_baseline(72, 64, make_banded_test_rows(seed),
                                 quality=95)
        )
        hp = dhash64_py(
            encode_jpeg_progressive(
                72, 64, make_banded_test_rows(seed, perturb=True),
                quality=95,
            )
        )
        assert hb is not None and hp is not None
        assert hamming(hb, hp) <= 2, seed
        hashes[seed] = hb
    ks = list(hashes)
    worst = min(
        hamming(hashes[ks[i]], hashes[ks[j]])
        for i in range(len(ks)) for j in range(i + 1, len(ks))
    )
    assert worst > 12, worst
