"""Round-3 operators: SCD2 history, mergeable agg states, interval-overlap
join, corpus line dedup, bigram-LM scoring."""

from __future__ import annotations

import pyspark.sql.functions as F

from datagouvfr_data_pipelines_spark.operators.aggregates import (
    merge_agg_states,
    partial_agg_states,
)
from datagouvfr_data_pipelines_spark.operators.history import scd2_history
from datagouvfr_data_pipelines_spark.operators.joins import interval_overlap_join
from datagouvfr_data_pipelines_spark.functions.text import (
    bigram_lm_scores,
    line_dedup,
)


def test_scd2_collapses_runs_and_orders_intervals(spark):
    rows = [
        # key 1: A,A,B,A -> 3 intervals (run-aware, value can recur)
        (1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A"),
        # key 2: single observation -> one open interval
        (2, 10, "X"),
    ]
    df = spark.createDataFrame(rows, "k int, ts int, attr string")
    out = scd2_history(df, ["k"], "ts", ["attr"], tiebreak_cols=[]).collect()
    k1 = sorted([r for r in out if r.k == 1], key=lambda r: r.valid_from)
    assert [(r.attr, r.valid_from, r.valid_to, r.n_observations) for r in k1] == [
        ("A", 10, 30, 2), ("B", 30, 40, 1), ("A", 40, None, 1),
    ]
    assert [r.is_current for r in k1] == [False, False, True]
    (k2,) = [r for r in out if r.k == 2]
    assert (k2.attr, k2.valid_from, k2.valid_to, k2.is_current) == (
        "X", 10, None, True,
    )


def test_scd2_same_instant_runs_stay_ordered(spark):
    # two runs starting at the SAME ts: tiebreak column decides run order,
    # and valid_to must chain through the runs, not self-reference
    rows = [(1, 10, 1, "A"), (1, 10, 2, "B"), (1, 20, 3, "C")]
    df = spark.createDataFrame(rows, "k int, ts int, tb int, attr string")
    out = sorted(
        scd2_history(df, ["k"], "ts", ["attr"], tiebreak_cols=["tb"]).collect(),
        key=lambda r: (r.valid_from, not r.is_current, r.attr),
    )
    assert [(r.attr, r.valid_from, r.valid_to) for r in out] == [
        ("A", 10, 10), ("B", 10, 20), ("C", 20, None),
    ]


def test_agg_state_merge_matches_direct(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(100)], "g int, v double"
    )
    parts = [
        partial_agg_states(df.where(F.col("v") < 40), ["g"], "v"),
        partial_agg_states(
            df.where((F.col("v") >= 40) & (F.col("v") < 70)), ["g"], "v"
        ),
        partial_agg_states(df.where(F.col("v") >= 70), ["g"], "v"),
    ]
    merged = {
        r.g: r for r in merge_agg_states(parts, ["g"]).collect()
    }
    direct = {r.g: r for r in partial_agg_states(df, ["g"], "v").collect()}
    assert set(merged) == set(direct)
    for g in direct:
        for f in ("st_count", "st_sum", "st_min", "st_max"):
            assert merged[g][f] == direct[g][f], (g, f)


def test_interval_overlap_matches_bruteforce(spark):
    import itertools
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.randrange(3), rng.randrange(0, 1000))
        for i in range(120)
    ]
    ivals = [(i, k, s, s + rng.randrange(1, 300)) for (i, k, s) in rows]
    df = spark.createDataFrame(ivals, "id long, k int, s long, e long")
    got = (
        interval_overlap_join(
            df, df, ["k"], "s", "e", "s", "e", bin_width=128
        )
        .where(F.col("id") < F.col("id_r"))
        .select("id", "id_r")
        .collect()
    )
    got_pairs = {(r.id, r.id_r) for r in got}
    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(ivals, 2)
        if a[1] == b[1] and a[2] <= b[3] and b[2] <= a[3] and a[0] < b[0]
    }
    # operator emits each pair exactly once (anchor-bin dedup)
    assert len(got) == len(got_pairs)
    assert got_pairs == want


def test_line_dedup_keeps_first_occurrence_and_reassembles(spark):
    docs = [
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta"),      # beta already seen in doc 1
        (3, "alpha\nbeta"),      # fully duplicated -> empty text
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r.doc_id: r for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[1].text_clean == "alpha\nbeta\ngamma"
    assert (out[1].n_lines, out[1].n_kept) == (3, 3)
    assert out[2].text_clean == "delta"
    assert (out[2].n_lines, out[2].n_kept) == (2, 1)
    assert out[3].text_clean == ""
    assert (out[3].n_lines, out[3].n_kept) == (2, 0)


def test_bigram_lm_scores_known_values(spark):
    import math

    # corpus: "a b" x2 and "a c": bigrams ab(2), ac(1); context a(3); V=3
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in
           bigram_lm_scores(df, "doc_id", "text", vocab_size=3).collect()}
    assert 4 not in out  # <2 tokens -> excluded
    def q(x):
        return math.floor(x * 1e9) / 1e9
    exp_ab = q(math.log2(2 + 1) - math.log2(3 + 3))
    exp_ac = q(math.log2(1 + 1) - math.log2(3 + 3))
    assert out[1].n_bigrams == 1
    assert abs(out[1].avg_log2_prob - round(exp_ab, 6)) < 1e-9
    assert abs(out[3].avg_log2_prob - round(exp_ac, 6)) < 1e-9


def test_bigram_lm_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    a = bigram_lm_scores(docs.repartition(1), "doc_id", "text", 500)
    b = bigram_lm_scores(docs.repartition(13), "doc_id", "text", 500)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bloom_prune_no_false_negatives_and_prunes(spark):
    from datagouvfr_data_pipelines_spark.operators.joins import bloom_prune

    fact = spark.range(0, 20000).withColumnRenamed("id", "k")
    dim = spark.range(0, 20000, 100).withColumnRenamed("id", "k")  # 200 keys
    pruned = bloom_prune(fact, dim, "k", num_buckets=1 << 16)
    kept = {r.k for r in pruned.collect()}
    want = {r.k for r in dim.collect()}
    # the bucket filter never drops a true match...
    assert want <= kept
    # ...and at 200 keys vs 64k buckets must prune almost every miss
    assert len(kept) < 400
    # exact join result is identical with and without the pre-prune
    direct = fact.join(dim, on="k").count()
    via_bloom = pruned.join(dim, on="k").count()
    assert direct == via_bloom == 200
    # the prune itself must be a broadcast semi-join (map-side, no shuffle
    # of the fact table)
    plan = pruned._jdf.queryExecution().explainString(
        pruned.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_not_in_null_semantics_vs_left_anti(spark):
    """One NULL in a NOT IN subquery must empty the result (three-valued
    logic: x <> NULL is UNKNOWN, so no row can prove membership-absence),
    while a plain left-anti join — which ignores nulls — keeps rows.
    Pins the corner j21_null_aware_anti is built around."""
    left = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    right_nonull = spark.createDataFrame([(2,)], "v long")
    right_null = spark.createDataFrame([(2,), (None,)], "v long")
    left.createOrReplaceTempView("nn_left")
    right_nonull.createOrReplaceTempView("nn_right_clean")
    right_null.createOrReplaceTempView("nn_right_null")

    clean = spark.sql(
        "SELECT k FROM nn_left WHERE k NOT IN (SELECT v FROM nn_right_clean)"
    )
    assert sorted(r.k for r in clean.collect()) == [1, 3]
    poisoned = spark.sql(
        "SELECT k FROM nn_left WHERE k NOT IN (SELECT v FROM nn_right_null)"
    )
    assert poisoned.collect() == []
    # the anti join deliberately has the OTHER semantics
    anti = left.join(right_null, left.k == right_null.v, "left_anti")
    assert sorted(r.k for r in anti.collect()) == [1, 3]


def test_except_all_keeps_multiplicity(spark):
    a = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k long")
    b = spark.createDataFrame([(1,), (3,)], "k long")
    out = sorted(r.k for r in a.exceptAll(b).collect())
    assert out == [1, 1, 2]  # one copy of 1 subtracted, 2 untouched
    # distinct EXCEPT would have dropped ALL the 1s
    assert sorted(r.k for r in a.subtract(b).collect()) == [2]


def test_salted_join_matches_plain_join(spark):
    from datagouvfr_data_pipelines_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0)], "key long, v double"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "key long, tag string")
    salted = salted_join(fact, dim, "key", salt_buckets=4)
    plain = fact.join(dim, on="key")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_sampled_revenue_estimator_within_error_bars(spark):
    """The 2% hash-sample estimate must land within ~4 standard errors of
    the true total — sanity that the AQP estimator and its SE formula
    describe the same sampling design."""
    from datagouvfr_data_pipelines_spark import plans

    sf = "/root/testdata/sf0.01"
    est = plans.queries()["a39_sampled_revenue"](spark, sf).collect()[0]
    truth = (
        spark.read.parquet(sf + "/lineitem.parquet")
        .selectExpr(
            "sum(cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)) t"
        )
        .collect()[0]["t"]
    )
    assert est["n_sample"] > 500  # ~2% of 60k rows
    assert abs(est["est_total_cents"] - truth) < 4 * est["se_total_cents"]
