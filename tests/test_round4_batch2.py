"""Round-4 batch-2 semantics: containment verify, strict funnel order,
temperature mixture invariants, fertility ratios, hard-negative filter."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: the shingle inverted
    index surfaces the pair and containment scores ~1.0, while the
    MinHash-LSH path is structurally blind to it (band collision prob =
    Jaccard^rows, and the pair's Jaccard is low by construction)."""
    from datagouvfr_data_pipelines_spark.operators.dedup import (
        near_duplicate_pairs,
        shingle_containment_pairs,
    )

    short = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"filler{i} pad{i} word{i}" for i in range(40))
    rows = [(1, short), (2, short + " " + filler)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cont = shingle_containment_pairs(
        df, "doc_id", "text", shingle_n=3, threshold=0.6
    ).collect()
    assert [(r.id_a, r.id_b) for r in cont] == [(1, 2)]
    assert cont[0].containment >= 0.9
    # the LSH path finds NO candidate for the same pair — documents why
    # containment search needs its own index, not a verify-metric swap
    lsh = near_duplicate_pairs(
        df, "doc_id", "text", k=64, bands=8, shingle_n=3, threshold=0.0,
        broadcast_candidates=True, portable=True, metric="containment",
    ).collect()
    assert lsh == []


def test_funnel_requires_step_order(spark, sf_dir):
    """purchase BEFORE the first view must not count as a conversion —
    the state machine only advances on in-order steps."""
    from datagouvfr_data_pipelines_spark.plans.relational10 import (
        e_funnel_conversion,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, uid, typ, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), uid, typ, 0.0, "{}")

    rows = [
        # user 1: clean view -> click -> purchase
        ev(1, 1, "view", 0),
        ev(2, 1, "click", 1),
        ev(3, 1, "purchase", 2),
        # user 2: purchase first, then view+click — reaches stage 2 only
        ev(4, 2, "purchase", 0),
        ev(5, 2, "view", 1),
        ev(6, 2, "click", 2),
        # user 3: view only
        ev(7, 3, "view", 0),
        # user 4: never views — stage 0 even with click+purchase
        ev(8, 4, "click", 0),
        ev(9, 4, "purchase", 1),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = e_funnel_conversion(spark, d).collect()[0]
    assert (out.n_users, out.n_view, out.n_click, out.n_purchase) == (4, 3, 2, 1)
    assert out.view_to_click == 2 / 3
    assert out.click_to_purchase == 1 / 2


def test_temperature_mixture_invariants(spark, sf_dir):
    """Weights sum to ~1, every lang keeps a positive share, and the
    sqrt temperature compresses the head/tail ratio vs raw proportions."""
    from datagouvfr_data_pipelines_spark.plans.text_pipeline2 import (
        asm_temperature_mixture,
    )

    rows = asm_temperature_mixture(spark, sf_dir).collect()
    assert len(rows) >= 2
    total = sum(r.weight for r in rows)
    assert abs(total - 1.0) < 1e-9
    toks = {r.lang: r.n_tokens for r in rows}
    w = {r.lang: r.weight for r in rows}
    hi = max(toks, key=toks.get)
    lo = min(toks, key=toks.get)
    raw_ratio = toks[hi] / max(toks[lo], 1)
    temp_ratio = w[hi] / w[lo]
    assert temp_ratio < raw_ratio or raw_ratio == 1
    assert sum(r.budget_tokens for r in rows) <= 1_000_000


def test_fertility_ratios_consistent(spark, sf_dir):
    from datagouvfr_data_pipelines_spark.plans.text_pipeline2 import (
        t_fertility_stats,
    )

    for r in t_fertility_stats(spark, sf_dir).collect():
        assert r.chars_per_token == r.n_chars / max(r.tok_ws, 1)
        assert r.fertility == r.tok_bpe / max(r.tok_ws, 1)
        assert r.chars_per_token > 1  # tokens are shorter than the text


def test_hard_negatives_exclude_anchor_label(spark, sf_dir):
    from datagouvfr_data_pipelines_spark.plans.catalog import table
    from datagouvfr_data_pipelines_spark.plans.text_pipeline2 import (
        sim_hard_negatives,
    )

    anchor_label = (
        table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .head()["label"]
    )
    rows = sim_hard_negatives(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.label != anchor_label for r in rows)
    sims = [r.sim for r in rows]
    assert sims == sorted(sims, reverse=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_batch3_plan_shapes(spark, sf_dir):
    """Pin the scale-critical shapes of the batch-3 additions: the
    provenance matrix never shuffles the corpus (both enrichments are
    broadcast joins of the tiny verified-pair set), and the containment
    search has no cartesian anywhere."""
    from datagouvfr_data_pipelines_spark.plans.text_pipeline2 import (
        d_containment_pairs,
        d_dup_source_matrix,
    )

    p1 = _plan(d_containment_pairs(spark, sf_dir))
    assert "CartesianProduct" not in p1
    assert "BroadcastHashJoin" in p1  # candidate pairs broadcast into verify

    p2 = _plan(d_dup_source_matrix(spark, sf_dir))
    assert "CartesianProduct" not in p2
    assert p2.count("BroadcastHashJoin") >= 2  # both enrichment joins
    assert "SortMergeJoin" not in p2  # the corpus is never shuffled for a join


def test_last_touch_skips_consecutive_purchases(spark):
    """Two back-to-back purchases both credit the same earlier click —
    the IGNORE NULLS look-through lag(1) can't express."""
    import datetime as dt

    from datagouvfr_data_pipelines_spark.plans.relational10 import (
        e_last_touch_attribution,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "purchase", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase", 0.0, "{}"),
        (4, t0, 2, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r.touch: r.n_purchases for r in e_last_touch_attribution(spark, d).collect()}
    assert out == {"click": 2, "none": 1}


def test_portable_hll_accuracy(spark, sf_dir):
    """The hand-rolled 64-register HLL lands within the expected error
    band (~13% rel. stderr at m=64; assert a generous 3-sigma 40%)."""
    import __spark_entry__ as entry

    rows = entry.queries()["sk_hll_portable_reach"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_exact > 0
        rel = abs(r.n_users_est - r.n_exact) / r.n_exact
        assert rel < 0.4, (r.event_type, r.n_users_est, r.n_exact)


def test_kmv_overlap_accuracy(spark, sf_dir):
    """KMV union/intersection estimates track the exact counts within the
    sketch's error band (~1/sqrt(k) ≈ 9% stderr at k=128; assert 3-sigma)."""
    import __spark_entry__ as entry

    r = entry.queries()["sk_kmv_portable_overlap"](spark, sf_dir).collect()[0]
    n_union_exact = r.n_a + r.n_b - r.n_inter_exact
    assert abs(r.n_union_est - n_union_exact) / n_union_exact < 0.3
    if r.n_inter_exact > 0:
        assert abs(r.n_inter_est - r.n_inter_exact) / r.n_inter_exact < 0.5


def test_portable_hll_states_merge_equals_direct(spark, sf_dir):
    """Register-max mergeability: building daily states and max-merging
    them equals one direct pass — the property that makes incremental
    reach rollups exact (no history rescans)."""
    from datagouvfr_data_pipelines_spark.operators.sketches import (
        hll_portable_states,
    )
    from datagouvfr_data_pipelines_spark.plans.catalog import table

    ev = table(spark, sf_dir, "events")
    half_a = ev.where(F.col("event_id") % 2 == 0)
    half_b = ev.where(F.col("event_id") % 2 == 1)
    sa = hll_portable_states(half_a, ["event_type"], "user_id")
    sb = hll_portable_states(half_b, ["event_type"], "user_id")
    merged = (
        sa.unionByName(sb)
        .groupBy("event_type", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    direct = hll_portable_states(ev, ["event_type"], "user_id")
    sym = merged.exceptAll(direct).union(direct.exceptAll(merged))
    assert sym.count() == 0


def test_kmv_merge_equals_direct(spark, sf_dir):
    """Bottom-k-by-hash associativity: merging per-batch KMV states and
    re-taking the bottom k equals one direct pass over the union."""
    from datagouvfr_data_pipelines_spark.operators.sketches import (
        kmv_bottom_k,
    )
    from datagouvfr_data_pipelines_spark.plans.catalog import table

    orders = table(spark, sf_dir, "orders").select("o_custkey")
    half_a = orders.where(F.col("o_custkey") % 2 == 0)
    half_b = orders.where(F.col("o_custkey") % 2 == 1)
    k = 64
    merged = (
        kmv_bottom_k(half_a, "o_custkey", k)
        .union(kmv_bottom_k(half_b, "o_custkey", k))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    direct = kmv_bottom_k(orders, "o_custkey", k)
    assert [r.h for r in merged.collect()] == [r.h for r in direct.collect()]
