"""Time-series operators: event-time rolling aggregates and regular-grid
gap filling with linear interpolation.

The reference resamples in pandas per file (monthly rollups, meteo period
tables); these are the distributed equivalents: range-frame windows and a
grid-join + ignore-nulls carry, one key-partitioned shuffle each.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

MONEY = "decimal(18,2)"


def rolling_time_sum(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    alias: str = "rolling_sum",
) -> DataFrame:
    """Rolling event-time sum over the trailing ``window_seconds`` (frame
    inclusive of the current row's instant): a RANGE window on epoch
    micros — peers at the same instant always aggregate together, so the
    result is total-order independent. Decimal-exact sum (engine float
    policy), output double.
    """
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    us = F.unix_micros(ts)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return df.withColumn(
        alias, F.sum(F.col(value_col).cast(MONEY)).over(w).cast("double")
    )


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: list[str],
    slot_col: str,
    value_col: str,
    filled_alias: str = "filled",
) -> DataFrame:
    """Regular-grid gap fill: densify integer ``slot_col`` to every value
    in [min, max] per key, then fill missing ``value_col`` by linear
    interpolation between the nearest observed neighbors (edge gaps take
    the nearest observation — constant extrapolation).

    Scale shape: per-key min/max aggregate -> sequence explode (grid fan-out
    is bounded by the slot range, not the data), one left join back on
    (key, slot), and two ignore-nulls window carries over the same key
    partitioning. Emits (keys, slot, filled, is_observed).
    """
    bounds = df.groupBy(*key_cols).agg(
        F.min(slot_col).alias("__mn"), F.max(slot_col).alias("__mx")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias(slot_col),
    )
    joined = grid.join(
        df.select(*key_cols, slot_col, value_col),
        on=[*key_cols, slot_col],
        how="left",
    )
    v = F.col(value_col)
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(slot_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(slot_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_s = F.last(
        F.when(v.isNotNull(), F.col(slot_col)), ignorenulls=True
    ).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_s = F.first(
        F.when(v.isNotNull(), F.col(slot_col)), ignorenulls=True
    ).over(w_fwd)
    interp = prev_v + (next_v - prev_v) * (
        (F.col(slot_col) - prev_s) / (next_s - prev_s)
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(interp)
    )
    return joined.select(
        *key_cols,
        slot_col,
        F.round(filled, 6).alias(filled_alias),
        v.isNotNull().alias("is_observed"),
    )
