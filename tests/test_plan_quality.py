"""Physical-plan assertions: the properties the 100 TB design depends on.

These tests pin the *plan shape*, not results: broadcast joins on dims,
parquet filter pushdown + column pruning, map-side partial aggregation,
TakeOrdered for top-k. A regression here is a scale bug even when results
stay correct.
"""

from __future__ import annotations

import pytest

from datagouvfr_data_pipelines_spark import plans

QUERIES = plans.queries()


def plan_of(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)


def test_dim_join_broadcasts(spark, sf_dir):
    plan = plan_of(QUERIES["j1_brand_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(QUERIES["p3_filter_derive"](spark, sf_dir))
    # predicates reach the parquet scan
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # only needed columns are read: lineitem has 11 cols, the query needs 6
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_partial_aggregation(spark, sf_dir):
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, sf_dir))
    # map-side partial agg + final agg = two HashAggregate nodes
    assert plan.count("HashAggregate") >= 2, plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(QUERIES["a9_top_customers"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_semi_anti_joins_stay_joins(spark, sf_dir):
    semi = plan_of(QUERIES["j8_parts_with_sales"](spark, sf_dir))
    anti = plan_of(QUERIES["j7_customers_without_orders"](spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_no_cartesian_in_catalog_except_intended(spark, sf_dir):
    """Only queries that intentionally cross-join tiny frames may contain a
    cartesian/BNL join."""
    intended = {
        "j10_region_months", "a8_histogram",
        "d_ngram_jaccard_pairs", "a12_zero_fill",
    }
    for name in ["q1_pricing_summary", "j5_customer_totals", "w2_latest_order_per_customer",
                 "j14_asof_last_order", "a13_rollup_totals"]:
        plan = plan_of(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_exact_median_policy(spark, sf_dir):
    """A2 uses exact percentile (oracle parity, SURVEY §4 rule 1); the plan
    must show the exact `percentile` aggregate, not approx."""
    plan = plan_of(QUERIES["a2_median_by_flag"](spark, sf_dir))
    assert "percentile" in plan
    assert "approx_percentile" not in plan


def test_cdc_diff_counted_single_shuffle(spark, sf_dir):
    """U2's counted form must shuffle the unioned snapshots ONCE (one
    Exchange below the aggregate) — the whole point over exceptAll-twice,
    which plans 4 table-shuffles."""
    plan = plan_of(QUERIES["u2_cdc_diff"](spark, sf_dir), mode="simple")
    assert plan.count("Exchange") == 1, plan
    assert "Except" not in plan


def test_lang_id_ngram_marker_join_broadcasts(spark, sf_dir):
    """The 150-row trigram marker table must broadcast; the doc-side explode
    must NOT shuffle before the join."""
    plan = plan_of(QUERIES["t_lang_id_ngram"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_emb_neardup_no_cartesian_single_cell_shuffle(spark, sf_dir):
    """IVF-bucketed pair generation joins on the cell key — a real equi-join,
    never a cartesian."""
    plan = plan_of(QUERIES["emb_neardup_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pii_redact_is_shuffle_free(spark, sf_dir):
    """PII scrub is a pure projection: no Exchange anywhere in the plan —
    at 100 TB this stage must stream through the scan stage untouched."""
    plan = plan_of(QUERIES["t_pii_redact"](spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_repetition_partial_aggregation(spark, sf_dir):
    """Both explode+groupBy chains partial-aggregate map-side (4+ HashAggregate
    nodes: partial+final per chain) and nothing falls back to a sort-based
    aggregate over raw grams."""
    plan = plan_of(QUERIES["t_repetition_scores"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 4, plan
    assert "CartesianProduct" not in plan


def test_lint_plan_flags_antipatterns_and_passes_clean(spark, sf_dir):
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from pyspark.sql.functions import udf

    from datagouvfr_data_pipelines_spark.plans.lint import (
        assert_plan_clean,
        lint_plan,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ords = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # cartesian
    warns = lint_plan(li.crossJoin(ords.select("o_orderkey")))
    assert any(w.startswith("cartesian") for w in warns)

    # row-at-a-time python udf
    plus1 = udf(lambda x: x + 1, "double")
    warns = lint_plan(li.select(plus1("l_quantity")))
    assert any(w.startswith("python-udf") for w in warns)

    # global window without partitioning
    w = Window.orderBy("l_orderkey").rowsBetween(Window.unboundedPreceding, 0)
    warns = lint_plan(li.select("l_orderkey", F.sum("l_quantity").over(w)))
    assert any(w_.startswith("global-sort-window") for w_ in warns)

    # pushdown expectation: met on a plain filter, violated through a cast
    clean = li.where(F.col("l_shipdate") >= "1995-01-01").select("l_orderkey")
    assert lint_plan(clean, expect_pushdown_on=["l_shipdate"]) == []
    wrapped = li.where(
        F.col("l_shipdate").cast("string").startswith("1995")
    ).select("l_orderkey")
    warns = lint_plan(wrapped, expect_pushdown_on=["l_shipdate"])
    assert any(w_.startswith("missing-pushdown") for w_ in warns)

    # catalog headline queries lint clean; deploy-gate form passes through
    for q in ("q1_pricing_summary", "j1_brand_revenue", "w2_latest_order_per_customer"):
        assert lint_plan(QUERIES[q](spark, sf_dir)) == [], q
    assert_plan_clean(clean, expect_pushdown_on=["l_shipdate"])


def test_tpch_flagship_plan_shapes(spark, sf_dir):
    """Pin the scale-critical shapes of the relational12 flagship batch:
    q6 never shuffles a row (scan -> partial -> single-row final agg);
    q19's part side broadcasts; q13's left join survives as a real join;
    q21 runs entirely on key-bounded hash joins/aggs (no cartesian);
    q18's survivor side broadcasts back onto orders."""
    q6 = plan_of(QUERIES["q6_forecast_revenue"](spark, sf_dir), mode="simple")
    assert "Exchange" not in q6.split("HashAggregate")[0], q6  # final agg only
    assert "Join" not in q6

    q19 = plan_of(QUERIES["q19_disjunctive_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in q19
    assert "SortMergeJoin" not in q19

    q13 = plan_of(QUERIES["q13_order_count_distribution"](spark, sf_dir))
    assert "LeftOuter" in q13, q13

    q21 = plan_of(QUERIES["q21_waiting_supplier"](spark, sf_dir))
    assert "CartesianProduct" not in q21
    assert "BroadcastNestedLoopJoin" not in q21

    q18 = plan_of(QUERIES["q18_large_volume_customers"](spark, sf_dir))
    assert "BroadcastHashJoin" in q18, q18


def test_catalog_lints_clean_except_intended_cartesians(spark, sf_dir):
    """Every catalog plan passes the linter, except the known broadcast-tiny
    cartesians (dim grids, single-row bound broadcasts, probe batches) —
    pinned exactly so a NEW anti-pattern anywhere in the catalog fails here."""
    from datagouvfr_data_pipelines_spark.plans.lint import lint_plan

    INTENDED_CARTESIAN = {
        "a12_zero_fill",          # dim-combination grid (tiny x tiny)
        "j10_region_months",      # 5 regions x 12 months
        "a8_histogram",           # single-row min/max bounds broadcast
        "d_ngram_jaccard_pairs",  # id-bounded exact-verify kernel
        "sim_knn_join",           # 5-probe batch broadcast
        "q22_idle_rich_customers",  # single-row avg-balance cutoff broadcast
        "q_benford_check",        # single-row digit-total broadcast
        "sk_customer_cohort_overlap",  # single-row empty-sketch broadcast
        "a28_revenue_trend",      # single-row min-month rebase broadcast
        "asm_dsir_weights",       # single-row corpus-total broadcast
        "x1_cuped_adjusted_lift", # 1-row global-moments frame onto 2 variants
        "w24_hourly_seasonality", # 1-row grand-total broadcast
        "rfm_segments",           # 1-row quartile-boundary broadcast
        "asm_temperature_mixture",  # 1-row sqrt-sum denominator broadcast
        "sk_kmv_portable_overlap",  # 1-row sketch scalars (theta/rho/exacts)
        "t_charlm_nll",           # 1-row vocab-size (V) broadcast
    }
    # Queries whose ntile/rank windows run over an ALREADY-AGGREGATED table
    # (|groups| rows, never fact volume) — the global-order window is the
    # operator's semantics (positional quartiles), not a missing partition key.
    INTENDED_GLOBAL_WINDOW = {
        "w12_survival_curve",     # KM cumsums over the |durations| table
        "w15_new_vs_returning",   # cumulative acquisitions over |days|
        "p13_global_row_ids",     # offset window over the K-partition counts
        "a37_pareto_front",       # final pass over front-sized survivors
        "w21_rolling_median_7d",  # range frame over the |days| aggregate
        "a39_gini_revenue",       # K-row offsets frame inside global_dense_ids
        "asm_interleave_stream",  # |sources|-row offsets + K-row dense-id frame
    }
    flagged = {}
    for name, fn in QUERIES.items():
        warns = lint_plan(fn(spark, sf_dir))
        kinds = {w.split(":")[0] for w in warns}
        if name in INTENDED_CARTESIAN:
            kinds.discard("cartesian")
        if name in INTENDED_GLOBAL_WINDOW:
            kinds.discard("global-sort-window")
        if kinds:
            flagged[name] = sorted(kinds)
    assert flagged == {}, flagged


def test_round3_batch15_plan_shapes(spark, sf_dir):
    """Pin the scale-critical shapes of the batch-15 additions: the fuzzy
    match and brand affinity run on hash shuffles only (bucket-local pair
    expansion — no join at all in j19, no cartesian anywhere); the
    incremental-dedup corpus band join is pruned by a BROADCAST semi-join
    on the batch's band keys; the OLS trend broadcasts only the nation dim
    (customer must shuffle at scale)."""
    j19 = plan_of(QUERIES["j19_fuzzy_part_match"](spark, sf_dir))
    assert "CartesianProduct" not in j19
    assert "SortMergeJoin" not in j19 and "ShuffledHashJoin" not in j19

    j18 = plan_of(QUERIES["j18_brand_affinity"](spark, sf_dir))
    assert "CartesianProduct" not in j18
    # single-scan shape: one aggregate pair per shuffle, no self-join
    assert "SortMergeJoin" not in j18

    inc = plan_of(QUERIES["d_incremental_dedup"](spark, sf_dir))
    assert "CartesianProduct" not in inc
    assert "BroadcastHashJoin" in inc  # band-key prune + small-side joins

    a28 = plan_of(QUERIES["a28_revenue_trend"](spark, sf_dir))
    assert "CartesianProduct" not in a28
    assert "BroadcastHashJoin" in a28  # nation (and the 1-row min_ym)


def test_round3_batch16_plan_shapes(spark, sf_dir):
    """Batch-16 pins: Q4's EXISTS compiles to ONE semi-join (no distinct
    pre-aggregate, no second shuffle); the NOT-IN query plans a NULL-AWARE
    anti join (plain LeftAnti would be a wrong-answer plan under
    three-valued logic); the salted join spreads (key, salt) without any
    cartesian; grouping sets stay a single Expand + partial aggregate."""
    # q4's monotone EXISTS is rewritten to max-per-order: the lineitem
    # side must show a PARTIAL aggregate before its exchange (map-side
    # collapse), and there is no semi join left in the plan
    q4 = plan_of(QUERIES["q4_delayed_order_priority"](spark, sf_dir), "simple")
    assert "LeftSemi" not in q4, q4
    assert "partial_max" in q4, q4  # lineitem collapses map-side pre-shuffle
    assert q4.count("Exchange") <= 4, q4  # agg shuffles + join distribution

    # simple mode prints BHJ args; the trailing `true` is the
    # isNullAwareAntiJoin flag (a plain LeftAnti would print without it)
    j21 = plan_of(QUERIES["j21_null_aware_anti"](spark, sf_dir), "simple")
    assert "LeftAnti, BuildRight, true" in j21, j21

    j22 = plan_of(QUERIES["j22_salted_skew_join"](spark, sf_dir))
    assert "CartesianProduct" not in j22
    assert "Generate" in j22 and "explode" in j22  # dim replicated by salt

    a35 = plan_of(QUERIES["a35_grouping_sets"](spark, sf_dir))
    assert "Expand" in a35
    assert "partial" in a35.lower()  # map-side combine before the shuffle
