"""Snapshot-history operators: SCD2 interval build over observed snapshots.

The reference applies CDC diffs forward (setops.cdc_diff / ordered_cdc_apply,
after meteo/pg_processing/task_functions.py:538-670) but never materializes a
queryable history. SCD2 is the missing read-side: collapse per-key runs of
identical attribute values into [valid_from, valid_to) validity intervals.

Scale shape: two single-key shuffles (the run-id window and the interval
window share the key partitioning; Catalyst reuses the exchange) plus one
partial-aggregated groupBy — no global windows, no driver state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build SCD2 validity intervals from snapshot observations.

    Input: one row per observation ``(keys, ts, attrs...)``. Output: one row
    per run of consecutive identical ``attr_cols`` values in ``ts`` order,
    with ``valid_from`` (first observation of the run), ``valid_to`` (start
    of the next run, NULL while current) and ``is_current``.

    ``tiebreak_cols`` extend the ordering so equal timestamps still produce
    a total order (the engine's determinism policy — same reason
    ``keep_best_row`` demands explicit ordering).
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    is_new = F.when(F.row_number().over(w) == 1, 1).otherwise(
        F.when(changed, 1).otherwise(0)
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = df.withColumn("__run", F.sum(is_new).over(w_cum))
    # attrs are constant within a run, so grouping by them is free and
    # carries them through without first()-style nondeterminism
    grouped = runs.groupBy(*key_cols, "__run", *attr_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_observations"),
    )
    # order by (valid_from, run): with coarse-resolution timestamps two runs
    # can START at the same instant, and run order (= observation order) is
    # the only deterministic tiebreak shared with the oracle
    w_iv = Window.partitionBy(*key_cols).orderBy(
        F.col("valid_from").asc(), F.col("__run").asc()
    )
    return (
        grouped.withColumn("valid_to", F.lead("valid_from").over(w_iv))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )


def effective_dated_join(
    fact: "DataFrame",
    history: "DataFrame",
    key_col: str,
    fact_ts_col: str,
    valid_from_col: str = "valid_from",
    attr_cols: list[str] | None = None,
) -> "DataFrame":
    """Join each fact row to the SCD2 version in effect at its timestamp:
    the history row with the latest ``valid_from <= fact_ts`` per key —
    exactly backward as-of semantics, so this is a thin composition over
    ``joins.asof_join_backward`` (one key-partitioned window shuffle, no
    per-interval explode and no range-predicate join).
    """
    from datagouvfr_data_pipelines_spark.operators.joins import (
        asof_join_backward,
    )

    attrs = attr_cols or [
        c
        for c in history.columns
        if c not in {key_col, valid_from_col}
    ]
    return asof_join_backward(
        fact,
        history,
        partition_key=key_col,
        left_ts=fact_ts_col,
        right_ts=valid_from_col,
        right_cols=attrs,
    )
