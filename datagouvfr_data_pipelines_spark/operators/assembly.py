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


def pack_sequences(
    df: DataFrame,
    order_key: str,
    order_cols: list[str],
    token_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign chunks to fixed-token-budget packs: concatenate the token
    stream in (``order_cols``) order and cut every ``budget`` tokens WITHOUT
    splitting chunks — a chunk straddling a boundary belongs to the pack
    where it starts, so a pack holds at most ``budget + max_chunk - 1``
    tokens. Adds ``pack_id`` and ``pack_offset``.

    The global running offset is a distributed prefix-sum, NOT one global
    window (``Window.orderBy`` with no partition key funnels the whole
    dataset through a single task — the classic 100 TB killer):

    1. rows are fixed-width range-bucketed on numeric ``order_key``
       (deterministic, no sampling — unlike ``repartitionByRange``, whose
       sampled boundaries can shift between runs);
    2. each bucket computes its local exclusive cumsum (bounded window);
    3. per-bucket totals (``n_buckets`` rows) collect to the driver and
       fold into prefix offsets, broadcast back as a literal map.

    Skewed ``order_key`` distributions unbalance buckets but never break
    correctness or determinism; raise ``n_buckets`` to re-spread.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bounds = df.agg(
        F.min(order_key).alias("mn"), F.max(order_key).alias("mx")
    ).first()
    if bounds.mn is None:
        return df.withColumn("pack_id", F.lit(None).cast("long")).withColumn(
            "pack_offset", F.lit(None).cast("long")
        )
    mn, mx = int(bounds.mn), int(bounds.mx)
    width = max((mx - mn + n_buckets) // n_buckets, 1)
    bucket = ((F.col(order_key) - mn) / width).cast("long")

    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = df.withColumn("__bucket", bucket).withColumn(
        "__local_off", F.coalesce(F.sum(token_col).over(w_local), F.lit(0)).cast("long")
    )

    totals = {
        r["__bucket"]: r["t"]
        for r in local.groupBy("__bucket")
        .agg(F.sum(token_col).cast("long").alias("t"))
        .collect()
    }
    prefix, acc = {}, 0
    for b in sorted(totals):
        prefix[b] = acc
        acc += totals[b]
    prefix_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(prefix.items()) for x in kv]
        ),
        F.col("__bucket"),
    )
    return (
        local.withColumn("__goff", prefix_expr + F.col("__local_off"))
        .withColumn("pack_id", (F.col("__goff") / budget).cast("long"))
        .withColumn("pack_offset", F.pmod(F.col("__goff"), F.lit(budget)).cast("long"))
        .drop("__bucket", "__local_off", "__goff")
    )
