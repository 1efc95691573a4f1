"""File-arrival micro-batch processing (SURVEY §2.9 ST1/ST2/ST5).

The reference's streaming story is scheduled micro-batch: new log archives
land under ``new/``, get moved to ``ongoing/``, processed, then ``processed/``
(dgv/metrics/task.py:59-72,242-251), with a processed-file ledger preventing
reprocessing (tabular_metrics:177-203). Spark-first this is a file-source
stream with ``Trigger.AvailableNow``: the checkpoint IS the ledger, each
run drains whatever arrived since the last one, and ``foreachBatch`` applies
the batch transformation with idempotent partition overwrite (ST2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def process_available_files(
    spark: SparkSession,
    source_dir: str,
    schema: StructType | str,
    transform: Callable[[DataFrame], DataFrame],
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    fmt: str = "parquet",
    path_glob: str | None = None,
) -> None:
    """Drain all currently-available files through ``transform`` into
    ``sink_fn(batch_df, batch_id)`` exactly once per file.

    - ST1: file-source triggering — new files only, tracked in the
      checkpoint's file log (no manual new/ongoing/processed moves).
    - ST5: the checkpoint is the processed-file ledger; a second run with the
      same checkpoint sees zero new files.
    - ST2: sink_fn should be idempotent per batch (partition overwrite /
      merge) so retried batches are safe.
    """
    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.format(fmt).load(source_dir)

    # transform runs INSIDE foreachBatch on the bounded batch — the
    # reference's model (aggregate each arrival batch, then idempotent
    # date overwrite). Keeping the stream itself transformation-free avoids
    # cross-run aggregation state (which would need watermarks and would
    # accumulate across reprocessing, breaking ST2 semantics).
    def apply_and_sink(batch_df: DataFrame, batch_id: int) -> None:
        sink_fn(transform(batch_df), batch_id)

    q = (
        stream.writeStream.foreachBatch(apply_and_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def tumbling_window_counts(
    df: DataFrame, ts_col: str, window: str = "1 day"
) -> DataFrame:
    """ST4: tumbling event-time windows (daily grain from log timestamps,
    create_tables.sql:209-263). Works on both batch and streaming frames;
    add ``withWatermark`` upstream for late-data bounds on true streams."""
    import pyspark.sql.functions as F

    return df.groupBy(F.window(F.col(ts_col), window).alias("w")).agg(
        F.count(F.lit(1)).alias("nb")
    ).select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "nb")


def session_window_counts(
    df: DataFrame, ts_col: str, key_cols: list[str], gap: str = "30 minutes"
) -> DataFrame:
    """Per-key session windows from the BUILT-IN ``session_window`` — events
    within ``gap`` of each other merge into one variable-length window.

    Same sessionization semantics as ``operators/windows.py:session_ids``
    (batch window form) and ``streaming/stateful.py:sessionize_stream``
    (applyInPandasWithState form), but expressed as a native aggregation:
    state management, window merging, and watermark eviction run entirely
    in the JVM — the preferred form whenever per-session logic is just an
    aggregate. Works on batch frames as-is; on streams add
    ``withWatermark(ts_col, ...)`` upstream so closed sessions finalize and
    state stays bounded.
    """
    import pyspark.sql.functions as F

    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), *key_cols
        )
        .agg(F.count(F.lit(1)).alias("nb"))
        .select(
            *key_cols,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "nb",
        )
    )


def sliding_window_counts(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    window/slide overlapping windows (built-in ``window`` with a slide —
    the JVM expands events to their window assignments before the partial
    aggregate, so the shuffle carries pre-combined (window, key) partials,
    never the raw fan-out).

    Complements ``tumbling_window_counts`` (slide == window) and
    ``session_window_counts`` (variable length). Works on batch frames
    as-is; on streams add ``withWatermark(ts_col, ...)`` so closed windows
    finalize and state stays bounded.
    """
    import pyspark.sql.functions as F

    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias("nb"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *key_cols,
            "nb",
        )
    )


def dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: StructType | str,
    key_cols: list[str],
    ts_col: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    fmt: str = "parquet",
    path_glob: str | None = None,
) -> None:
    """Streaming ingest dedup: emit each key's FIRST arrival, drop repeats
    seen within the watermark horizon — the standard exactly-once-ish gate
    in front of a training-data landing zone where upstream feeds redeliver.

    ``dropDuplicatesWithinWatermark`` keys state by ``key_cols`` and evicts
    each entry once the event-time watermark passes its observed timestamp
    plus the delay, so state is bounded by (arrival rate x watermark) rather
    than corpus size — the property that makes this run forever at 100 TB/day
    where a batch ``dropDuplicates`` over history cannot. The checkpoint
    carries both the file ledger (ST5) and the dedup state across
    ``Trigger.AvailableNow`` drains.

    At-least-once boundary (documented, test-pinned): a duplicate arriving
    AFTER its key's state was evicted is re-emitted; downstream exact dedup
    (``operators/dedup.py:exact_dedup``) remains the end-of-pipeline
    backstop.
    """
    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.format(fmt).load(source_dir)
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
