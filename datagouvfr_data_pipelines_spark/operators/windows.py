"""Window operators (SURVEY §2.5) — the reference's "windows in disguise".

All are single-shuffle window computations; partitioning by the session /
dedup key means they scale horizontally (each key's rows are processed on one
executor — keys are assumed small relative to partitions; skewed keys fall to
AQE).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def session_ids(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    gap_seconds: int,
    session_alias: str = "session_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W1: sessionization — new session when the gap to the previous event
    exceeds ``gap_seconds`` within a partition key.

    Ref: mutation-id assignment via sorted change-detection cumsum
    (dvf/geoloc/task_functions.py:257-268) — same lag/cumsum shape. Gap math
    runs on integer microseconds (``unix_micros``) so results are exact and
    reproducible; ``tiebreak_cols`` make the ordering total when timestamps
    can collide.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w_order = Window.partitionBy(partition_col).orderBy(*order)
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # unix_micros only accepts TIMESTAMP; the NTZ->TZ cast interprets
        # wall time in the session tz, and gap DIFFERENCES are offset-free.
        ts = ts.cast("timestamp")
    us = F.unix_micros(ts)
    gap = us - F.lag(us).over(w_order)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_alias, F.sum(is_new).over(w_cum))


def change_detection_ids(
    df: DataFrame,
    order_cols: list[Column],
    change_cols: list[str],
    alias: str = "group_id",
) -> DataFrame:
    """W1 variant: new id whenever any of ``change_cols`` changes after sort.

    Global ordering implies a single-partition window — correct for the
    reference's per-file scope; for 100 TB add a partition key.
    """
    w = Window.orderBy(*order_cols)
    changed = F.lit(False)
    for c in change_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    is_new = F.when(F.row_number().over(w) == 1, 1).otherwise(
        F.when(changed, 1).otherwise(0)
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias, F.sum(is_new).over(w_cum))


def keep_best_row(
    df: DataFrame, partition_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """W2/O5: deterministic keyed dedup — keep the first row per key under an
    explicit ordering.

    This is the ONLY sanctioned keyed-dedup form in the engine:
    ``dropDuplicates`` after ``orderBy`` is nondeterministic in Spark
    (SURVEY §4 custom-rule #4). Ref: resource catalog dedup
    (dgv/metrics/task_functions.py:198-201), consolidation primaryKey dedup
    (schema/utils/consolidation.py:1028-1041).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def section_ids(
    df: DataFrame, order_col: str, prefix_col: str, alias: str = "section_id"
) -> DataFrame:
    """W4: multi-section file split — section increments when ``prefix_col``
    changes across consecutive lines (sante/finess/task_functions.py:62-83).
    """
    w = Window.orderBy(F.col(order_col).asc())
    changed = ~F.col(prefix_col).eqNullSafe(F.lag(F.col(prefix_col)).over(w))
    is_new = F.when(F.row_number().over(w) == 1, 1).otherwise(
        F.when(changed, 1).otherwise(0)
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias, F.sum(is_new).over(w_cum))


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: for each user, how far the event sequence
    ``steps[0] -> steps[1] -> ...`` progresses, where step k must occur
    STRICTLY AFTER the completion of step k-1.

    Earliest-completion greedy: each step's anchor is the minimum
    qualifying timestamp; by the standard exchange argument this finds an
    ordered subsequence whenever one exists, so ``stage`` is exact. One
    filtered partial-agg + one key join per step (len(steps) is small);
    users who never perform the first step are absent (stage 0).

    Returns (user, t_1..t_k timestamps — NULL once the funnel breaks,
    stage = number of completed steps).
    """
    result = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        cand = df.where(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        nxt = (
            cand.join(
                result.select(user_col, f"t_{i - 1}"), on=user_col
            )
            .where(F.col("__ts") > F.col(f"t_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t_{i}"))
        )
        result = result.join(nxt, on=user_col, how="left")
    stage = sum(
        F.col(f"t_{i}").isNotNull().cast("int")
        for i in range(1, len(steps) + 1)
    )
    return result.withColumn("stage", stage)
