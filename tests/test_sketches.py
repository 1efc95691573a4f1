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
    # round 5: portable-register estimate (double), oracle-checked
    assert reach.schema["n_users_est"].dataType.simpleString() == "double"
    ov = qs["sk_customer_cohort_overlap"](spark, sf_dir)
    rows = ov.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_union_est"] >= max(r["n_1996_est"], r["n_1998_est"]) - 1e-9
        assert r["n_inter_est"] <= min(r["n_1996_est"], r["n_1998_est"]) + 1e-9


def test_quantile_sample_merge_equals_direct_and_bounds(spark):
    from datagouvfr_data_pipelines_spark.operators.sketches import (
        quantile_estimate,
        quantile_sample_merge,
        quantile_sample_states,
    )

    import pyspark.sql.functions as F

    # 3 batches x 4000 rows, value = a skewed deterministic function
    rows = spark.range(12000).select(
        (F.col("id") % 3).alias("batch"),
        (F.col("id") % 2).alias("g"),
        F.col("id").alias("rid"),
        (F.pmod(F.col("id") * 2654435761, F.lit(97)) ** 2).cast("double").alias("v"),
    )
    rows.cache()
    direct = quantile_sample_states(rows, ["g"], "v", "rid", k=512)
    batches = [
        quantile_sample_states(rows.where(F.col("batch") == b), ["g"], "v", "rid", k=512)
        for b in range(3)
    ]
    merged = quantile_sample_merge(batches, ["g"], k=512)

    d = {r["g"]: r["st_qsample"] for r in direct.collect()}
    m = {r["g"]: r["st_qsample"] for r in merged.collect()}
    assert d.keys() == m.keys()
    for g in d:
        assert [tuple(x) for x in d[g]] == [tuple(x) for x in m[g]]  # EXACT merge

    # partition invariance of the state build
    rep = quantile_sample_states(rows.repartition(13), ["g"], "v", "rid", k=512)
    r2 = {r["g"]: r["st_qsample"] for r in rep.collect()}
    for g in d:
        assert [tuple(x) for x in d[g]] == [tuple(x) for x in r2[g]]

    # estimates land within sample-rank error of the exact quantiles
    est = {
        r["g"]: (r["q0_5"], r["q0_95"])
        for r in quantile_estimate(direct, [0.5, 0.95], ["g"]).collect()
    }
    exact = {
        r["g"]: (r["e50"], r["e95"])
        for r in rows.groupBy("g")
        .agg(
            F.expr("percentile(v, 0.5)").alias("e50"),
            F.expr("percentile(v, 0.95)").alias("e95"),
        )
        .collect()
    }
    # rank error ~1/sqrt(512) ≈ 0.044 -> compare via the exact CDF: the
    # estimate's true rank must be within ~3x that of the target rank
    for g in d:
        for (e, x, p) in [(est[g][0], exact[g][0], 0.5), (est[g][1], exact[g][1], 0.95)]:
            rank = (
                rows.where(F.col("g") == g)
                .agg(F.avg((F.col("v") <= e).cast("double")))
                .collect()[0][0]
            )
            assert abs(rank - p) < 0.13, (g, p, e, x, rank)
    rows.unpersist()


def test_bitmap_rollup_exact_under_overlap(spark):
    """bitmap_or_agg merge is EXACT even when the same key appears in many
    child groups (where summing child distinct counts double-counts) —
    the property sk_bitmap_distinct_rollup relies on. Key 100 is in both
    nations: summed distincts say 4, the bitmap rollup must say 3."""
    import pyspark.sql.functions as F

    rows = [("r1", "n1", 100), ("r1", "n1", 101), ("r1", "n2", 100),
            ("r1", "n2", 102), ("r1", "n1", 101)]
    df = spark.createDataFrame(rows, "reg string, nat string, k long")
    per_nat = df.groupBy(
        "reg", "nat", F.bitmap_bucket_number("k").alias("bkt")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("k")).alias("bm"))
    rolled = (
        per_nat.groupBy("reg", "bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("reg")
        .agg(F.sum(F.bitmap_count("bm")).alias("nb"))
        .collect()
    )
    assert rolled[0]["nb"] == 3
    naive = (
        df.groupBy("reg", "nat").agg(F.countDistinct("k").alias("d"))
        .groupBy("reg").agg(F.sum("d").alias("nb")).collect()
    )
    assert naive[0]["nb"] == 4  # the trap the bitmap rollup avoids


def test_topk_state_merge_equals_direct(spark):
    """Merged per-batch top-k states == direct top-k over the union —
    the mergeability that makes incremental search sessions O(batches*k)
    instead of a rescan per refinement."""
    from datagouvfr_data_pipelines_spark.operators.sketches import (
        topk_merge,
        topk_state,
    )

    rows = [("g", i, float((i * 37) % 101)) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    batches = [
        df.where(F.col("id") % 3 == i) for i in range(3)
    ]
    states = [topk_state(b, ["g"], "score", "id", 5) for b in batches]
    merged = sorted(
        (r.id, r.score)
        for r in topk_merge(states, ["g"], "score", "id", 5).collect()
    )
    direct = sorted(
        (r.id, r.score) for r in topk_state(df, ["g"], "score", "id", 5).collect()
    )
    assert merged == direct and len(merged) == 5
