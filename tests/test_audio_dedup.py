"""Audio envelope hashing (chromaprint-lite) + banded-Hamming near-dup:
PCM decode round trip, stereo downmix, edit robustness vs discrimination,
and the end-to-end pairing query."""

from __future__ import annotations

from datagouvfr_data_pipelines_spark.functions.udfs import (
    audio_envelope_hash_py,
    make_test_wav,
    make_wav,
    wav_pcm_samples,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_wav_pcm_round_trip_mono_and_stereo_downmix():
    mono = make_wav(8000, 1, [0, 100, -100, 32767, -32768])
    rate, ch, samples = wav_pcm_samples(mono)
    assert (rate, ch) == (8000, 1)
    assert samples == [0, 100, -100, 32767, -32768]
    stereo = make_wav(44100, 2, [10, 20, -10, -20, 0, 5])
    rate, ch, samples = wav_pcm_samples(stereo)
    assert (rate, ch) == (44100, 2)
    assert samples == [15, -15, 2]  # integer frame average


def test_ahash_robust_to_small_edit_but_discriminative():
    for seed in range(10):
        a = audio_envelope_hash_py(make_test_wav(seed))
        twin = audio_envelope_hash_py(make_test_wav(seed, perturb=True))
        other = audio_envelope_hash_py(make_test_wav(seed + 1))
        assert a is not None
        assert _hamming(a, twin) <= 6, seed
        assert _hamming(a, other) > 6, seed


def test_ahash_unsupported_payload_returns_none():
    assert audio_envelope_hash_py(None) is None
    assert audio_envelope_hash_py(b"ID3 not a wav") is None
    # too short for 65 windows
    assert audio_envelope_hash_py(make_wav(8000, 1, [1, 2, 3])) is None


def test_audio_neardup_query_pairs_twins(spark, sf_dir):
    from datagouvfr_data_pipelines_spark import plans

    pairs = plans.queries()["mm_audio_neardups"](spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(2 * k, 2 * k + 1) for k in range(30)}, sorted(got)[:10]
