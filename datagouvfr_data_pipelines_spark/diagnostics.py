"""Skew and partition diagnostics — measure before you salt.

Every shuffle keyed on a skewed column concentrates its hottest keys in a
handful of tasks; the fix (AQE skew split, ``operators/joins.py:salted_join``,
pre-aggregation) depends on HOW skewed the keys actually are. This module
answers that with one aggregation pass, returning a driver-small report —
the number the reference's growing prefix-batch loop
(meteo/pg_processing/task_functions.py:538-556) was hand-tuning blind.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class SkewReport:
    n_rows: int
    n_keys: int
    max_key_rows: int
    avg_key_rows: float
    skew_ratio: float          # max / avg
    top_keys: list[tuple]      # [(key values..., count), ...] heaviest first
    recommended_salt: int      # 1 = no salting needed


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
    skew_threshold: float = 4.0,
    max_salt: int = 64,
) -> SkewReport:
    """Profile the key distribution a shuffle on ``key_cols`` would see.

    One shuffle (the per-key count — the same exchange the real job will
    pay), then two driver-small actions: a 1-row moments aggregate and a
    TakeOrdered of the ``top_n`` heaviest keys. ``recommended_salt`` is 1
    when ``skew_ratio`` (hottest key vs average key) is under
    ``skew_threshold``; above it, the ratio rounded up and capped at
    ``max_salt`` — enough buckets to spread the hottest key down to roughly
    the average task size. Deterministic: ties in the top-keys ranking are
    broken by the key values themselves.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    moments = counts.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).alias("total_rows"),
        F.count(F.lit(1)).alias("total_keys"),
        F.coalesce(F.max("__n"), F.lit(0)).alias("mx"),
    ).first()
    if moments.total_keys == 0:
        return SkewReport(0, 0, 0, 0.0, 0.0, [], 1)
    top = (
        counts.orderBy(
            F.col("__n").desc(), *[F.col(c).asc() for c in key_cols]
        )
        .limit(top_n)
        .collect()
    )
    avg = moments.total_rows / moments.total_keys
    ratio = moments.mx / avg
    salt = 1
    if ratio >= skew_threshold:
        salt = min(int(-(-ratio // 1)), max_salt)
    return SkewReport(
        n_rows=moments.total_rows,
        n_keys=moments.total_keys,
        max_key_rows=moments.mx,
        avg_key_rows=avg,
        skew_ratio=ratio,
        top_keys=[tuple(r[c] for c in key_cols) + (r["__n"],) for r in top],
        recommended_salt=salt,
    )
