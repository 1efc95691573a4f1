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
