"""Time-series operators: rolling event-time sums and gap-fill
interpolation edge cases."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.operators.timeseries import (
    gap_fill_interpolate,
    rolling_time_sum,
)


def _ts(day):
    return datetime.datetime(2024, 1, day)


def test_rolling_time_sum_window_bounds(spark):
    rows = [
        (1, _ts(1), 10.0),
        (1, _ts(5), 20.0),
        (1, _ts(12), 40.0),   # day-5 row is 7 days back -> still inside
        (1, _ts(20), 80.0),   # everything else has aged out
        (2, _ts(5), 5.0),     # other key never mixes in
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = {
        (r.k, r.ts.day): r.rolling
        for r in rolling_time_sum(
            df, ["k"], "ts", "v", window_seconds=7 * 86400, alias="rolling"
        ).collect()
    }
    assert out[(1, 1)] == 10.0
    assert out[(1, 5)] == 30.0     # day 1 within 7 days of day 5
    assert out[(1, 12)] == 60.0    # day 5 inside (exactly 7d), day 1 aged out
    assert out[(1, 20)] == 80.0
    assert out[(2, 5)] == 5.0


def test_rolling_time_sum_same_instant_peers_aggregate_together(spark):
    rows = [(1, _ts(3), 1.0), (1, _ts(3), 2.0), (1, _ts(3), 4.0)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = rolling_time_sum(df, ["k"], "ts", "v", 86400).collect()
    # RANGE frame: all same-instant rows see the full peer sum — no
    # row-order dependence
    assert [r.rolling_sum for r in out] == [7.0, 7.0, 7.0]


def test_gap_fill_interpolates_and_extrapolates_edges(spark):
    rows = [(1, 2, 10.0), (1, 5, 40.0), (1, 7, None), (2, 3, 9.0)]
    df = spark.createDataFrame(rows, "k int, slot long, v double")
    out = {
        (r.k, r.slot): (r.filled, r.is_observed)
        for r in gap_fill_interpolate(df, ["k"], "slot", "v").collect()
    }
    assert out[(1, 2)] == (10.0, True)
    assert out[(1, 3)] == (20.0, False)   # linear between 10 and 40
    assert out[(1, 4)] == (30.0, False)
    assert out[(1, 5)] == (40.0, True)
    # slots 6-7: no later observation -> constant extrapolation from 40
    assert out[(1, 6)] == (40.0, False)
    # slot 7 exists in input with NULL value: grid row is "not observed"
    assert out[(1, 7)][0] == 40.0
    assert out[(2, 3)] == (9.0, True)
    assert len(out) == 7  # key 1 densified 2..7, key 2 single slot


def test_weighted_sample_deterministic_and_weight_biased(spark):
    import math

    from datagouvfr_data_pipelines_spark.operators.assembly import (
        weighted_sample,
    )

    rows = [("s", i, 1000.0 if i < 10 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id long, w double")
    out = weighted_sample(df, "id", "w", k=10, strata_cols=["g"])
    got = sorted(r.id for r in out.collect())
    # heavy rows (w=1000, ids 0-9) dominate a PPS draw of k=10 vs 190
    # feather-weight rows
    assert len(got) == 10
    assert len([i for i in got if i < 10]) >= 8
    # repartitioning never changes the sample (hash keys, not rand)
    again = sorted(
        r.id
        for r in weighted_sample(
            df.repartition(17), "id", "w", k=10, strata_cols=["g"]
        ).collect()
    )
    assert again == got
    # keys match the A-Res formula on a spot row
    row = out.where(F.col("id") == got[0]).collect()[0]
    assert row.sample_key <= 0.0 and not math.isnan(row.sample_key)


def test_point_in_polygon_concave(spark):
    from datagouvfr_data_pipelines_spark.functions.geo import point_in_polygon

    # concave "arrow": notch at the right side
    poly = [(0.0, 0.0), (4.0, 0.0), (2.0, 2.0), (4.0, 4.0), (0.0, 4.0)]
    pts = [
        (1.0, 2.0, True),    # deep inside
        (3.5, 2.0, False),   # inside the notch -> outside
        (2.0, 1.0, True),
        (5.0, 2.0, False),   # right of everything
        (-1.0, 2.0, False),
        (1.0, 3.9, True),
    ]
    df = spark.createDataFrame(
        [(x, y) for x, y, _ in pts], "x double, y double"
    )
    got = [
        r.inside
        for r in df.select(
            point_in_polygon("x", "y", poly).alias("inside")
        ).collect()
    ]
    assert got == [e for _, _, e in pts]


def test_pagerank_matches_power_iteration_and_conserves_mass(spark):
    from datagouvfr_data_pipelines_spark.operators.graph import pagerank

    # 4-node graph with a dangling node (3 has no out-edges)
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iterations=12).collect()}

    # reference: dense power iteration with the same update rule
    import numpy as np

    n, d = 4, 0.85
    out = {0: [1, 2], 1: [2, 3], 2: [0]}
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[v] for v in range(n) if v not in out)
        nxt += d * dangling / n
        for s, ds in out.items():
            for t in ds:
                nxt[t] += d * r[s] / len(ds)
        r = nxt
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-9, (v, got[v], r[v])
    # rank mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # structure sanity: the argmax agrees with the dense reference (node 0
    # ends highest — it receives ALL of node 2's mass through the 2->0 edge)
    assert max(got, key=got.get) == int(np.argmax(r)) == 0


def test_tfidf_and_sparse_cosine_known_values(spark):
    import math

    from datagouvfr_data_pipelines_spark.functions.text import (
        tfidf_cosine_pairs,
        tfidf_weights,
    )

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple banana"), (3, "cherry date")],
        "doc_id int, text string",
    )
    w = tfidf_weights(docs, "doc_id", "text", n_docs=3)
    got = {(r.doc_id, r.tok): (r.tf, r.df, r.tfidf) for r in w.collect()}
    idf = lambda df: math.log(4) - math.log(df + 1) + 1
    # ~1e-16 tolerance: JVM log and Python libm log differ in the last ulp
    assert got[(1, "apple")][:2] == (2, 2)
    assert abs(got[(1, "apple")][2] - 2 * idf(2)) < 1e-12
    assert got[(3, "cherry")][:2] == (1, 1)
    assert abs(got[(3, "cherry")][2] - 1 * idf(1)) < 1e-12
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(w, "doc_id", min_cosine=0.0).collect()
    }
    # docs 1 and 2 share their whole vocabulary -> high cosine; 3 shares
    # nothing -> pair never materializes (inverted index, not cartesian)
    assert pairs[(1, 2)] > 0.9
    assert all(3 not in p for p in pairs)


def test_fuzzy_join_blocks_and_verifies(spark):
    from datagouvfr_data_pipelines_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [(1, "chartreuse"), (2, "charcoal"), (3, "violet")], "id int, name string"
    )
    right = spark.createDataFrame(
        [(10, "chartreuze"), (11, "charcola"), (12, "magenta"),
         (13, "chartres")], "id int, name string"
    )
    got = {
        (r.id, r.id_r)
        for r in fuzzy_join(
            left, right, "name", "name", max_edit=1, block_chars=4
        ).collect()
    }
    # chartreuse~chartreuze (1 edit) kept; charcoal~charcola (2 edits) and
    # chartreuse~chartres (2 edits) share the block but fail the verify;
    # violet~magenta (different block) is never even a candidate
    assert got == {(1, 10)}
    wider = {
        (r.id, r.id_r)
        for r in fuzzy_join(
            left, right, "name", "name", max_edit=2, block_chars=4
        ).collect()
    }
    assert wider == {(1, 10), (1, 13), (2, 11)}


def test_profile_columns_counts_nulls_and_distinct(spark):
    from datagouvfr_data_pipelines_spark.operators.profiling import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x int, s string"
    )
    out = {r.column: r for r in profile_columns(df, ["x", "s"]).collect()}
    assert (out["x"].n_rows, out["x"].n_null, out["x"].n_distinct) == (4, 1, 3)
    assert (out["x"].min_value, out["x"].max_value) == ("1", "3")
    assert (out["s"].n_null, out["s"].n_distinct) == (1, 2)
    assert (out["s"].min_value, out["s"].max_value) == ("a", "b")


def test_psi_drift_zero_for_identical_and_positive_for_shifted(spark):
    from datagouvfr_data_pipelines_spark.operators.profiling import psi_drift

    base = spark.createDataFrame(
        [(float(i),) for i in range(1000)], "v double"
    )
    same = psi_drift(base, base, "v", n_bins=5).collect()[0]
    assert abs(same.psi) < 1e-6
    shifted = spark.createDataFrame(
        [(float(i) + 700.0,) for i in range(1000)], "v double"
    )
    drift = psi_drift(base, shifted, "v", n_bins=5).collect()[0]
    assert drift.psi > 0.25  # conventional "action required" threshold


def test_grouped_top_k_matches_window_form_any_fan(spark):
    import random

    from datagouvfr_data_pipelines_spark.operators.aggregates import (
        grouped_top_k,
    )
    from pyspark.sql import Window

    rng = random.Random(11)
    # one hot group (g=0 carries 80% of rows) — the case the salt exists for
    rows = [
        (0 if rng.random() < 0.8 else rng.randrange(1, 5), i, rng.random())
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g int, id long, v double")
    order = [F.col("v").desc(), F.col("id").asc()]
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(
        (r.g, r.id, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 7)
        .collect()
    )
    for fan in (1, 3, 16):
        got = sorted(
            (r.g, r.id, r.rank)
            for r in grouped_top_k(
                df, ["g"], order, k=7, fan_buckets=fan, tiebreak_col="id"
            ).collect()
        )
        assert got == want, f"fan={fan}"


def test_pagerank_exact_tracks_float_and_is_partition_invariant(spark):
    from datagouvfr_data_pipelines_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank,
        pagerank_exact,
    )

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3), (3, 4), (4, 0), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    flt = {r.node: r.rank for r in pagerank(df, iterations=6).collect()}
    exact = {r.node: r.rank for r in pagerank_exact(df, iterations=6).collect()}
    assert set(flt) == set(exact)
    for node, rank in exact.items():
        # pico-unit integer path agrees with the float path to ~1e-9
        assert abs(rank / PAGERANK_SCALE - flt[node]) < 1e-8

    # identical bits under a different partitioning
    re = {
        r.node: r.rank
        for r in pagerank_exact(df.repartition(7), iterations=6).collect()
    }
    assert re == exact


def test_pagerank_quantized_tracks_float_and_is_partition_invariant(spark):
    """Round-5: the oracle-checkable float-division face (g_pagerank) must
    agree with the pure-float pagerank to quantization precision and be
    bit-stable under repartitioning."""
    from datagouvfr_data_pipelines_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank,
        pagerank_quantized,
    )

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3), (3, 4), (4, 0), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    flt = {r.node: r.rank for r in pagerank(df, iterations=6).collect()}
    q = {r.node: r.rank for r in pagerank_quantized(df, iterations=6).collect()}
    assert set(flt) == set(q)
    for node, rank in q.items():
        assert abs(rank / PAGERANK_SCALE - flt[node]) < 1e-8

    rq = {
        r.node: r.rank
        for r in pagerank_quantized(df.repartition(7), iterations=6).collect()
    }
    assert rq == q
