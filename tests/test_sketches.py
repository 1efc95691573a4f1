"""Sketch-operator guarantees (operators/sketches.py): error bounds,
merge-vs-direct equivalence, partition invariance, and theta set algebra
on known overlaps. These stand in for SQL oracles — the estimates are
deterministic but not bit-portable to DuckDB."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_states,
    theta_overlap,
)


def _ids(spark, start, end, group="g1"):
    return spark.range(start, end).select(
        F.lit(group).alias("g"), F.col("id").alias("v")
    )


def test_hll_estimate_within_error_bound(spark):
    n = 100_000
    df = _ids(spark, 0, n)
    est = hll_estimate(hll_states(df, ["g"], "v")).collect()[0]["n_distinct_est"]
    assert abs(est - n) / n < 0.03, est


def test_hll_merge_equals_direct_and_partition_invariant(spark):
    df = _ids(spark, 0, 50_000).withColumn("batch", F.col("v") % 7)
    direct = hll_estimate(hll_states(df, ["g"], "v")).collect()[0][
        "n_distinct_est"
    ]
    # 7 per-batch states merged
    batches = hll_states(df, ["g", "batch"], "v").drop("batch")
    merged = hll_estimate(hll_merge([batches], ["g"])).collect()[0][
        "n_distinct_est"
    ]
    assert merged == direct
    # physical partitioning must not change the sketch estimate
    re = hll_estimate(hll_states(df.repartition(13), ["g"], "v")).collect()[0][
        "n_distinct_est"
    ]
    assert re == direct


def test_theta_overlap_known_sets(spark):
    a = _ids(spark, 0, 1000)
    b = _ids(spark, 500, 1500)
    row = theta_overlap(a, b, ["g"], "v").collect()[0]
    assert abs(row["n_a"] - 1000) / 1000 < 0.05
    assert abs(row["n_b"] - 1000) / 1000 < 0.05
    assert abs(row["n_union"] - 1500) / 1500 < 0.05
    assert abs(row["n_intersect"] - 500) / 500 < 0.08
    assert abs(row["n_only_a"] - 500) / 500 < 0.08


def test_theta_overlap_one_sided_group(spark):
    a = _ids(spark, 0, 100, group="both").unionByName(
        _ids(spark, 0, 200, group="a_only")
    )
    b = _ids(spark, 0, 100, group="both")
    rows = {r["g"]: r for r in theta_overlap(a, b, ["g"], "v").collect()}
    assert rows["a_only"]["n_b"] == 0
    assert rows["a_only"]["n_intersect"] == 0
    assert rows["a_only"]["n_union"] == rows["a_only"]["n_a"]
    assert rows["both"]["n_intersect"] == rows["both"]["n_a"]


def test_sketch_queries_run(spark, sf_dir):
    from datagouvfr_data_pipelines_spark import plans

    qs = plans.queries()
    reach = qs["sk_user_reach_rollup"](spark, sf_dir)
    assert reach.count() > 0
    assert reach.schema["n_users_est"].dataType.simpleString() == "bigint"
    ov = qs["sk_customer_cohort_overlap"](spark, sf_dir)
    rows = ov.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_union"] >= max(r["n_1996"], r["n_1999"]) - 1
