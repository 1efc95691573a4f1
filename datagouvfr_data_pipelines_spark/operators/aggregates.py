"""Aggregation operators (SURVEY §2.4).

Design for oracle parity AND 100 TB scale:

- Money/measure sums are computed over ``DECIMAL(18,2)`` casts: decimal
  addition is exact and associative, so the result is identical regardless of
  partial-aggregation order across 1000 executors — and identical to the
  DuckDB oracle. Final outputs are cast back to DOUBLE so schemas stay stable.
  (Float sums are order-dependent; at 100 TB the shuffle-combine order is
  nondeterministic, so decimal aggregation is the only way to get
  reproducible results. Ref behavior: DECIMAL columns in
  dvf/explore/sql/create_dvf_table.sql:14,30-44.)
- Averages are ``exact_decimal_sum / count`` — one double division on two
  deterministic inputs, so deterministic.
- Medians use exact ``percentile`` (ref computes pandas exact interpolated
  medians, dvf/explore/task_functions.py:562-588). At 100 TB swap to
  ``percentile_approx(col, 0.5, 10000)`` — see module note in plans/catalog.
- Conditional-count aggregation (A4, dgv/metrics/task_functions.py:226-262)
  is one pass of N ``sum(when(...))`` columns — a single shuffle with map-side
  partial aggregation, never N separate filtered counts.
"""

from __future__ import annotations

from collections.abc import Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

MONEY = "decimal(18,2)"


def dsum(col: Column | str, alias: str) -> Column:
    """Deterministic (decimal-exact) sum of a double measure, output DOUBLE.

    Only RAW stored columns should be cast to decimal here: casting a
    double-computed product to decimal is engine-dependent at rounding
    boundaries (DuckDB rounds in scaled-double space, Spark converts the
    exact binary value). For derived measures use ``dsum_product``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double").alias(alias)


def dsum_product(a: Column | str, b: Column | str, alias: str) -> Column:
    """Deterministic sum of a product: cast FACTORS to decimal, multiply in
    decimal (exact), sum, output DOUBLE. Oracle equivalent:
    ``SUM(CAST(a AS DECIMAL(18,2)) * CAST(b AS DECIMAL(18,2)))``."""
    ca = (F.col(a) if isinstance(a, str) else a).cast(MONEY)
    cb = (F.col(b) if isinstance(b, str) else b).cast(MONEY)
    return F.sum(ca * cb).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum / count, output DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(MONEY)).cast("double") / F.count(c)).alias(alias)


def dmedian(col: Column | str, alias: str) -> Column:
    """Exact interpolated median (pandas/DuckDB-compatible)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile(c, F.lit(0.5)).alias(alias)


def conditional_count_agg(
    df: DataFrame,
    group_cols: list[str],
    conditions: Mapping[str, Column],
    total_alias: str | None = "nb_total",
) -> DataFrame:
    """A4: one-pass named multi-agg with conditional counts.

    ``conditions`` maps output column name -> boolean Column; each becomes
    ``sum(when(cond, 1).otherwise(0))``. Mirrors the per-(date, object)
    segment counting of dgv/metrics/task_functions.py:226-262 in a single
    shuffle.
    """
    aggs = [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(name)
        for name, cond in conditions.items()
    ]
    if total_alias:
        aggs.append(F.count(F.lit(1)).alias(total_alias))
    return df.groupBy(*group_cols).agg(*aggs)


def zero_fill_combinations(
    aggregated: DataFrame,
    dims: DataFrame,
    keys: list[str],
    fill: Mapping[str, float],
) -> DataFrame:
    """A12: ensure every dim combination exists, filling absent measures.

    ``dims`` is the (small) universe of key combinations — typically built by
    cross-joining distinct dimension values. The AGGREGATED side is broadcast:
    it is post-aggregation (small by construction) and, being the right side
    of the left join, is actually broadcastable — broadcasting the left/dims
    side of a left-outer join is impossible and silently degrades to a
    sort-merge join. Mirrors carburants/scripts/generate_kpis_rupture.py:137-159.
    """
    out = dims.join(F.broadcast(aggregated), on=keys, how="left")
    return out.na.fill(dict(fill))


def grouped_with_total(
    df: DataFrame,
    group_cols: list[str],
    aggs: list[Column],
    grouping_id_alias: str = "grouping_level",
) -> DataFrame:
    """A13/A14: grouped aggregates plus higher-level totals in ONE pass.

    Uses ROLLUP instead of the reference's manual compute-then-union of a
    "nation" row (dvf/explore/task_functions.py:632-676,
    carburants/scripts/generate_kpis_rupture.py:163-177). One shuffle instead
    of two jobs; partial aggregation handles the total rows map-side.
    """
    return (
        df.rollup(*group_cols)
        .agg(*aggs, F.grouping_id().cast("int").alias(grouping_id_alias))
    )


def monthly_rollup(df: DataFrame, ts_col: str, group_cols: list[str], aggs: list[Column],
                   month_alias: str = "month") -> DataFrame:
    """A16: month-grain time rollup (create_tables.sql:209-263)."""
    month = F.date_format(F.date_trunc("month", F.col(ts_col)), "yyyy-MM").alias(month_alias)
    return df.groupBy(month, *group_cols).agg(*aggs)


def quantile_bins(df: DataFrame, col: str, probs: list[float], group_cols: list[str] | None = None,
                  alias: str = "bins") -> DataFrame:
    """A8: exact quantile bin edges per group (dvf/explore:839-896).

    Returns one row per group with an array of exact interpolated quantiles.
    The reference's rounding-collision fixups operate on this tiny array
    driver-side; at 100 TB switch the inner call to percentile_approx.
    """
    pb = F.array(*[F.lit(p) for p in probs])
    agg = F.percentile(F.col(col), pb).alias(alias)
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def winsorize(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Per-group percentile clipping (winsorization) — the outlier gate in
    front of means/variances that a heavy-tailed metric column needs
    (the reference clips DVF price outliers the same way before its
    monthly stats). Adds ``<col>_w`` clipped to the group's exact
    [``lower``, ``upper``] quantiles.

    Shape: one grouped exact-percentile aggregate (tiny — one row per
    group) joined back; AQE broadcasts it when groups are few (the normal
    case), so the data pass itself is a map. At 100 TB swap the inner
    ``percentile`` for ``percentile_approx`` like every other quantile
    site (module note above).
    """
    if not 0 <= lower < upper <= 1:
        raise ValueError(f"need 0 <= lower < upper <= 1, got ({lower}, {upper})")
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(F.col(col), F.lit(lower)).alias("__lo"),
        F.percentile(F.col(col), F.lit(upper)).alias("__hi"),
    )
    return (
        df.join(bounds, group_cols)
        .withColumn(
            f"{col}_w",
            F.least(F.greatest(F.col(col).cast("double"), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def top_k_by(df: DataFrame, order_col: str, k: int, ascending: bool = False) -> DataFrame:
    """A9: top-K by metric — global sort-limit (Spark runs TakeOrdered, no full sort)."""
    key = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    return df.orderBy(key).limit(k)


def partial_agg_states(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Mergeable partial-aggregate state for incremental rollup maintenance:
    per group, (count, exact decimal sum, min, max) — the algebraic-agg
    state quartet that re-aggregates losslessly.

    This is the read-side of incremental materialization: compute states
    per ingest batch / partition / snapshot, persist them, and combine with
    ``merge_agg_states`` instead of rescanning history. At 100 TB this
    turns a full-history rescan into an O(groups) merge.
    """
    return df.groupBy(*group_cols).agg(
        F.count(value_col).alias("st_count"),
        F.sum(F.col(value_col).cast(MONEY)).alias("st_sum"),
        F.min(value_col).alias("st_min"),
        F.max(value_col).alias("st_max"),
    )


def merge_agg_states(
    states: list[DataFrame], group_cols: list[str]
) -> DataFrame:
    """Combine per-batch states from ``partial_agg_states`` into the same
    state shape (associative + commutative, so any merge tree is exact).
    Finalize with e.g. ``st_sum / st_count`` for the mean."""
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*group_cols).agg(
        F.sum("st_count").alias("st_count"),
        F.sum("st_sum").alias("st_sum"),
        F.min("st_min").alias("st_min"),
        F.max("st_max").alias("st_max"),
    )


def distinct_count_two_phase(
    df: DataFrame, group_cols: list[str], value_col: str, alias: str = "n_distinct"
) -> DataFrame:
    """Skew-safe distinct count per group: phase 1 dedups on
    (group, value) — the shuffle key carries the VALUE, so a hot group's
    rows spread over many reducers — phase 2 counts the deduped rows per
    group with ordinary partial aggregation.

    ``countDistinct`` plans a distinct-aggregate whose final stage gathers
    each group's full value set onto ONE reducer; on a skewed group that
    reducer is the job. The two-phase form is the standard rewrite (it is
    what optimizers do for count(distinct) under skew) and returns exactly
    the same numbers — pinned by test.
    """
    deduped = df.select(*group_cols, value_col).distinct()
    return deduped.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(alias)
    )


def grouped_top_k(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    fan_buckets: int = 8,
    tiebreak_col: str | None = None,
    rank_alias: str = "rank",
) -> DataFrame:
    """Skew-safe top-k per group: the plain window form funnels every row
    of a group through ONE reducer — a wall when one group dominates. Here
    a deterministic salt (hash of the tiebreak column) splits each group
    across ``fan_buckets`` reducers for a partial top-k; only the
    group x fan x k survivors reach the final exact top-k. Both stages use
    the same total order, so the result equals the single-window form for
    ANY bucket count (the knn_join two-stage recipe, generalized).

    ``order_cols`` must define a total order within each group (append the
    tiebreak column). ``tiebreak_col`` defaults to the first group-external
    column and feeds only the salt.
    """
    from pyspark.sql import Window

    tb = tiebreak_col or next(
        c for c in df.columns if c not in set(group_cols)
    )
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(tb)), F.lit(fan_buckets))
    )
    w_partial = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("__rn", F.row_number().over(w_partial))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w_final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_alias, F.row_number().over(w_final))
        .where(F.col(rank_alias) <= k)
    )


def standardize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    alias: str = "zscore",
) -> DataFrame:
    """Per-group z-score standardization with DECIMAL-EXACT moments (the
    a15 variance policy): mean and sample variance come from exact decimal
    sum/sum-of-squares, so the group statistics — and therefore every
    z-score — are shuffle-order independent and oracle-reproducible.
    Single-value groups (stddev undefined) yield NULL. One groupBy + one
    AQE-broadcast join back; the fact table is never shuffled twice.
    """
    stats = df.groupBy(*group_cols).agg(
        F.count(value_col).alias("__n"),
        F.sum(F.col(value_col).cast(MONEY)).alias("__s"),
        F.sum(
            F.col(value_col).cast(MONEY) * F.col(value_col).cast(MONEY)
        ).alias("__s2"),
    )
    mean = F.col("__s").cast("double") / F.col("__n")
    var = (
        F.col("__s2").cast("double") - F.col("__n") * mean * mean
    ) / (F.col("__n") - 1)
    enriched = df.join(stats, on=group_cols)
    z = (F.col(value_col) - mean) / F.sqrt(var)
    return enriched.withColumn(
        alias,
        F.when(F.col("__n") > 1, F.round(z, 6)).otherwise(F.lit(None)),
    ).drop("__n", "__s", "__s2")
