"""Skew diagnostics: report correctness and salt recommendation."""

from __future__ import annotations

from datagouvfr_data_pipelines_spark.diagnostics import key_skew_report


def test_key_skew_report_skewed(spark):
    # one hot key with 80 rows, 20 cold keys with 1 row each
    rows = [("hot", i) for i in range(80)] + [(f"k{i}", i) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, v int")
    r = key_skew_report(df, ["k"], top_n=3)
    assert r.n_rows == 100 and r.n_keys == 21
    assert r.max_key_rows == 80
    assert r.top_keys[0] == ("hot", 80)
    assert len(r.top_keys) == 3
    # avg = 100/21 ~ 4.76; ratio ~ 16.8 -> salt = ceil(ratio) = 17
    assert r.recommended_salt == 17
    # ties among 1-row keys break deterministically by key value
    assert [t[0] for t in r.top_keys[1:]] == ["k0", "k1"]


def test_key_skew_report_uniform_and_empty(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    r = key_skew_report(df, ["k"])
    assert r.skew_ratio == 1.0 and r.recommended_salt == 1
    empty = spark.createDataFrame([], "k string")
    r0 = key_skew_report(empty, ["k"])
    assert r0.n_rows == 0 and r0.recommended_salt == 1 and r0.top_keys == []
