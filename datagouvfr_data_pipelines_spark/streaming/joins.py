"""Watermarked stream-stream joins (event-time interval correlation).

The reference correlates log streams against slowly-arriving enrichment
feeds with scheduled batch joins; Spark-first this is a stream-stream join
with watermarks on BOTH sides plus an event-time range condition — the two
ingredients Structured Streaming needs to bound its join state (each side
buffers only rows whose event time is still inside watermark + interval,
so state is arrival-rate-bounded, never corpus-bounded).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames on equality keys where the right row's
    event time falls in ``[left_ts - lower, left_ts + upper]``.

    Both sides get the same watermark delay; the range condition is what
    lets Spark evict join state (an equality-only stream-stream join would
    buffer forever). ``how`` may be inner / leftOuter / rightOuter /
    fullOuter — outer results for unmatched rows emit only once the
    watermark passes their interval, so an AvailableNow drain returns inner
    matches immediately and outer remainders on the NEXT drain after the
    watermark advances (test-pinned).

    Output carries the left columns plus the right side's non-key columns
    (right key/ts duplicates dropped).
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = F.lit(True)
    for c in on:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    cond = (
        cond
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    joined = lw.join(rw, cond, how)
    keep_right = [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in keep_right],
    )
