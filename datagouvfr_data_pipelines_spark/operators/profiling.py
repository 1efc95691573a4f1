"""Dataset profiling and drift detection.

The reference eyeballs its outputs through ad-hoc report notebooks and
hand-rolled count checks (consolidation report synthesis); these operators
are the engine-native form: a one-pass column profile and a PSI
(population stability index) drift score between two snapshots — the gate
a scheduled pipeline runs before publishing a refreshed dataset.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) per column, values stringified for a uniform
    schema. Single aggregate job — every per-column statistic is computed
    in the same partial-aggregated pass, then unpivoted via a stack.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_rows, n_null, n_distinct, min_value, max_value)"
    )


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    col: str,
    n_bins: int = 10,
    edges: list[float] | None = None,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column: bins are the BASE snapshot's quantile edges (approxQuantile,
    driver k-state), both snapshots are histogrammed against them, and
    PSI = sum((pa - pb) * ln(pa / pb)) with add-one-smoothed counts.

    Determinism: with counts as integers, each ln stays in the integer
    domain — ln(pa/pb) = ln(ca*nb) - ln(cb*na) — and terms are
    nano-quantized before the final sum, so the score is bit-stable and
    DuckDB-oracle-reproducible given the same edges. PSI < 0.1 is the
    conventional 'no drift' gate; >= 0.25 is a publish blocker.

    Returns one row: (n_base, n_current, psi).
    """
    if edges is None:
        probs = [i / n_bins for i in range(1, n_bins)]
        edges = base.select(
            F.col(col).cast("double").alias(col)
        ).approxQuantile(col, probs, 0.001)
    earr = F.array(*[F.lit(float(e)) for e in edges])
    v = F.col(col).cast("double")
    bin_of = F.aggregate(
        earr,
        F.lit(0).cast("long"),
        lambda acc, e: acc + F.when(v >= e, 1).otherwise(0).cast("long"),
    )

    def binned_counts(df: DataFrame, alias: str) -> DataFrame:
        return df.select(bin_of.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(alias)
        )

    a = binned_counts(base, "ca")
    b = binned_counts(current, "cb")
    bins = (
        a.join(b, on="bin", how="full")
        .select(
            "bin",
            (F.coalesce("ca", F.lit(0)) + 1).alias("ca"),
            (F.coalesce("cb", F.lit(0)) + 1).alias("cb"),
        )
    )
    na = F.sum("ca")
    nb = F.sum("cb")
    totals = bins.agg(na.alias("na"), nb.alias("nb")).collect()[0]
    na_v, nb_v = totals["na"], totals["nb"]
    term = (
        F.col("ca") / F.lit(float(na_v)) - F.col("cb") / F.lit(float(nb_v))
    ) * (
        F.log(F.col("ca") * F.lit(nb_v)) - F.log(F.col("cb") * F.lit(na_v))
    )
    return bins.agg(
        F.lit(na_v).alias("n_base_smoothed"),
        F.lit(nb_v).alias("n_current_smoothed"),
        F.round(
            F.sum(F.floor(term * F.lit(1e9)).cast("long")) / F.lit(1e9), 6
        ).alias("psi"),
    )


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Pre-flight join-cardinality diagnostic: per key, the exact output
    contribution of an inner join (rows_left x rows_right) — the keys that
    would explode the join surface to the top. Two per-side key counts
    (partial-agg) + one tiny count-to-count join; the FACT tables are never
    joined. Run this before a new fact-fact join at scale: a single key
    contributing 10^10 pairs is a modeling bug, not a tuning problem
    (pairs with diagnostics.key_skew_report, which profiles one side).
    """
    lc = left.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_right"))
    contrib = lc.join(rc, on=key_cols).select(
        *key_cols,
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("est_pairs"),
    )
    order = [F.col("est_pairs").desc()] + [F.col(c).asc() for c in key_cols]
    return contrib.orderBy(*order).limit(top_n)
