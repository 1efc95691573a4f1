"""Data-layout maintenance: small-file compaction and multi-column Z-order
clustering for scan-time data skipping.

These are table-maintenance operators a 100 TB lakehouse needs around the
query engine: streaming/micro-batch sinks accumulate small files (the
reference's per-run appends, dgv/metrics flush every 20k rows), and parquet
min/max row-group skipping only pays off when rows with nearby filter-column
values are physically co-located.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FS API (works for
    file:// hdfs:// s3a:// alike — same one-path posture as
    connectors.publish_to_object_store)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.getContentSummary(p).getLength()


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    compression: str = "zstd",
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    Small-file compaction: N tiny files -> ceil(bytes / target) files via a
    coalesce (no shuffle — partitions are concatenated, never split; a
    too-few-files input simply stays at its partition count). Returns the
    output file count. Run this OUT of band (the reference's nightly-DAG
    slot); readers see the old layout until the atomic swap by the caller.
    """
    n = max(1, math.ceil(dir_bytes(spark, src) / target_file_bytes))
    df = spark.read.parquet(src)
    df.coalesce(n).write.mode("overwrite").option(
        "compression", compression
    ).parquet(dst)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(dst)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, False)
    count = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            count += 1
    return count


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Multi-column Z-order key: per-column QUANTILE cell (2^bits cells) and
    bit-interleaved round-robin (generalizes functions/geo.py:morton_key
    from lon/lat to any numeric column mix — quantile-based, so skewed
    distributions still spread across cells).

    Scale shape: cell edges come from ``approxQuantile`` (a sampled sketch,
    driver gets 2^bits doubles per column — k-sized state, same policy as
    k-means centroids); cell assignment is a JVM fold over the literal edge
    array — no window, no shuffle, no single-task rank. The key is a LONG,
    so bits * len(cols) must be <= 63.
    """
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    n_cells = 1 << bits
    probs = [i / n_cells for i in range(1, n_cells)]
    qcols = []
    for c in cols:
        edges = df.select(F.col(c).cast("double").alias(c)).approxQuantile(
            c, probs, 0.001
        )
        earr = F.array(*[F.lit(float(e)) for e in edges])
        # cell = number of edges <= value, in [0, n_cells-1]
        v = F.col(c).cast("double")
        cell = F.aggregate(
            earr,
            F.lit(0).cast("long"),
            lambda acc, e: acc + F.when(v >= e, 1).otherwise(0).cast("long"),
        )
        qcols.append(cell)
    key = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for q in qcols:
            key = key * 2 + F.shiftright(q, b).bitwiseAND(F.lit(1))
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
    compression: str = "zstd",
) -> None:
    """Cluster-and-write: range-partition + sort by the Z-order key so every
    output file (and row group) covers a tight hyper-rectangle of the
    clustered columns — parquet min/max skipping then prunes files for
    predicates on ANY subset of ``cols``, not just the first sort column
    (the advantage over a plain ORDER BY layout). One range shuffle total.
    """
    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits))
    out = (
        keyed.repartitionByRange(*([n_files] if n_files else []), "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    out.write.mode("overwrite").option("compression", compression).parquet(path)
