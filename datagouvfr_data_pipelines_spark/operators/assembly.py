"""Dataset-assembly operators: chunking, deterministic splits, stratified
sampling — the step between a curated corpus and a training run.

All three are engine-portable by construction (plain arithmetic / window
ranks, no engine-specific hash), so each has a DuckDB oracle in
``plans/dataset_assembly.py``. At the 100 TB tier swap the rolling-hash
ordering key for ``xxhash64`` (same shapes, stronger mixing) — the rolling
hash is kept as the default because it is reproducible in ANSI SQL, which
is what makes the split/sample AUDITABLE: an external system can recompute
membership without running Spark.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datagouvfr_data_pipelines_spark.functions.text import (
    fingerprint_rolling,
    tokens,
)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into whitespace-token chunks of ``chunk_size``
    tokens advancing by ``chunk_size - overlap`` (context-window packing
    prep). Pure per-row explode — no shuffle, scales with executors; chunk
    ids are derived from the start offset so they are stable under any
    partitioning. Zero-token docs produce no chunks. The final chunk may be
    short (it is never silently dropped: truncation loses tail tokens,
    which at corpus scale is a measurable data loss).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap ({overlap}) < chunk_size ({chunk_size})")
    step = chunk_size - overlap
    toks = df.select(
        F.col(id_col).alias(id_col), tokens(text_col).alias("__t")
    ).where(F.size("__t") >= 1)
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("__t") - overlap, F.lit(1)), F.lit(step)
    )
    return toks.select(id_col, "__t", F.explode(starts).alias("__s")).select(
        id_col,
        ((F.col("__s") - 1) / step).cast("int").alias("chunk_id"),
        F.concat_ws(" ", F.slice("__t", F.col("__s"), chunk_size)).alias("chunk_text"),
        F.least(F.lit(chunk_size), F.size("__t") - F.col("__s") + 1)
        .cast("int")
        .alias("n_chunk_tokens"),
    )


def hash_split(
    df: DataFrame,
    text_col: str,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment from a content-hash bucket in
    [0, 100). Content-keyed (not id-keyed) so re-ingested duplicates land in
    the SAME split — the property that prevents train/test contamination when
    the corpus is rebuilt. Adds ``bucket`` and ``split`` columns; stateless
    and shuffle-free."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != 100:
        raise ValueError(f"weights must sum to 100, got {weights}")
    bucket = F.pmod(fingerprint_rolling(text_col), F.lit(100))
    expr = None
    acc = 0
    # build CASE bucket < cum1 THEN s1 WHEN bucket < cum2 ... in dict order
    for name, w in weights.items():
        acc += w
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("bucket", bucket.cast("int")).withColumn(
        "split", expr
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank documents inside each
    stratum by (rolling content hash, id) — a total order, so the sample is
    identical across runs and engines — and keep the first ``k``. One shuffle
    on the stratum key; with heavy skew pre-aggregate candidates per
    partition first (TakeOrdered-per-stratum) before the global window."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        fingerprint_rolling(text_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
