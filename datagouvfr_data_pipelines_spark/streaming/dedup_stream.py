"""Streaming corpus ingestion with incremental dedup.

Newly-arrived document files are drained (Trigger.AvailableNow, checkpoint
= the processed-file ledger) and each batch is deduped against the
fingerprint index accumulated from EVERY previous batch — exact and
near-dup tiers — before its survivors are appended to the curated corpus.
The corpus text is never re-read: between batches the only state is the
compact ``build_dedup_index`` fingerprint table (operators/
incremental_dedup.py), so ingest cost stays proportional to the BATCH,
not the corpus — the shape that keeps a 100 TB corpus ingestable.

Retry safety mirrors streaming/incremental.py: foreachBatch can replay a
batch whose sink ran but whose checkpoint commit didn't, so the index
directory carries a ``_last_batch`` watermark INSIDE it. Since round 9 the
index commit is APPEND-ONLY and O(batch), the same layout as the semantic
tier (streaming/index_commit.py, ATOMICITY.md Pattern C): each batch's
fingerprints land in ``batch=<id>/`` (stage sibling tmp -> rename ->
``os.replace`` watermark), readers take only dirs <= watermark, and once
``compact_after`` batch dirs accumulate they are folded into one
``seg=<gen>`` segment behind the atomic ``_base_seg`` pointer. The
round-7/8 single-dir layout — the whole merged index rewritten and
two-rename swapped per ingest, O(corpus) per batch — remains readable as
legacy root files until the first compaction absorbs it, and a torn
legacy swap (index only under ``__old``) is still rolled forward by
``_recover_swap_state`` at sink entry, so a restart never reads
watermark -1, rebuilds an EMPTY index, and rmtree's the only copy of the
fingerprint history (the round-4 advice bug). A replayed batch id either
sees watermark < id (full re-run, overwriting its own survivor and batch
dirs with identical content) or watermark >= id (no-op) — never a torn
state where its fingerprints are indexed but its survivors were dropped.
Because the watermark lives inside ``index_dir``, two streams with
sibling index directories never share one watermark file. The full
crash-window tables live in semantic_stream.py's module docstring and
ATOMICITY.md.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from datagouvfr_data_pipelines_spark.io.writers import (
    _recover_swap_state,
    write_parquet,
)
from datagouvfr_data_pipelines_spark.operators.incremental_dedup import (
    incremental_dedup,
)
from datagouvfr_data_pipelines_spark.streaming.availablenow import (
    process_available_files,
)

_WATERMARK = "_last_batch"


def _read_watermark(index_path: str) -> int:
    # Inside the index dir: swapped atomically together with the index
    # contents, and never shared between sibling index directories.
    p = os.path.join(index_path.rstrip("/"), _WATERMARK)
    if os.path.exists(p):
        with open(p) as fh:
            return int(fh.read().strip())
    return -1


def _write_watermark_into(dir_path: str, batch_id: int) -> None:
    p = os.path.join(dir_path.rstrip("/"), _WATERMARK)
    with open(p, "w") as fh:
        fh.write(str(batch_id))


def dedup_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType | str,
    id_col: str,
    text_col: str,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    k: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    fmt: str = "parquet",
    compact_after: int = 64,
) -> None:
    """Drain available files; per batch: dedup vs index, append survivors
    to ``corpus_dir/batch=<id>/``, commit the batch's fingerprints
    append-only to ``index_dir/batch=<id>/`` (O(batch), never a rewrite
    of the accumulated index), compacting into one ``seg=<gen>`` segment
    once more than ``compact_after`` batch dirs accumulate — see the
    module docstring and streaming/index_commit.py.
    """
    from datagouvfr_data_pipelines_spark.streaming.index_commit import (
        STAGING_SUFFIX,
        cleanup_index_dir,
        commit_watermark,
        committed_index_paths,
        maybe_compact_index,
    )

    index_cols = ["doc", "content_sha", "sig", "band_hashes"]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # repair a torn LEGACY swap before reading the watermark: a crash
        # between the old layout's two renames leaves the index only under
        # __old, and reading a missing index_dir as watermark -1 would
        # rebuild from empty and lose the fingerprint history
        _recover_swap_state(index_dir)
        staging = index_dir.rstrip("/") + STAGING_SUFFIX
        if os.path.exists(staging):
            shutil.rmtree(staging)  # torn staging write from a crashed run
        if os.path.isdir(index_dir):
            # sweep anything a torn compaction left unreferenced
            cleanup_index_dir(index_dir)
        watermark = _read_watermark(index_dir)
        if watermark >= batch_id:
            return  # replayed batch: already fully applied
        paths = committed_index_paths(index_dir, watermark)
        if paths:
            index = spark.read.parquet(*paths).select(*index_cols)
        else:
            from datagouvfr_data_pipelines_spark.operators.incremental_dedup import (
                build_dedup_index,
            )

            index = build_dedup_index(
                batch_df.limit(0), id_col, text_col, k, bands, shingle_n
            )
        res = incremental_dedup(
            batch_df,
            index,
            id_col,
            text_col,
            k=k,
            bands=bands,
            shingle_n=shingle_n,
            threshold=threshold,
        )
        try:
            # survivors: idempotent per-batch subdirectory overwrite
            write_parquet(
                res.survivors, os.path.join(corpus_dir, f"batch={batch_id}")
            )
            # index rows: stage (O(batch) bytes), rename into place,
            # advance the watermark — the accumulated index is never
            # rewritten on the ingest path. ONE file per batch append
            # (same policy and reason as semantic_stream: the fanned
            # index build otherwise scatters each tiny batch append over
            # defaultParallelism part files).
            write_parquet(res.index_rows.select(*index_cols).repartition(1), staging)
        finally:
            spark.catalog.clearCache()  # drop the batch fingerprint persist
        os.makedirs(index_dir, exist_ok=True)
        final = os.path.join(index_dir, f"batch={batch_id}")
        if os.path.exists(final):
            shutil.rmtree(final)  # orphan from a run that died pre-watermark
        os.rename(staging, final)
        commit_watermark(index_dir, batch_id)
        maybe_compact_index(
            spark, index_dir, batch_id, compact_after, index_cols
        )

    process_available_files(
        spark,
        source_dir,
        schema,
        transform=lambda df: df,
        sink_fn=sink,
        checkpoint_dir=checkpoint_dir,
        fmt=fmt,
    )


def watermarked_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType | str,
    key_cols: list[str],
    ts_col: str,
    delay: str,
    out_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Event-stream exact dedup with BOUNDED state: the built-in
    ``dropDuplicatesWithinWatermark`` keeps one state entry per key only
    until the event-time watermark passes ``delay`` beyond it, then
    evicts — so state is O(keys per delay window), not O(keys ever seen).

    This is the right tool for at-least-once transport dedup (the same
    event re-delivered within minutes); cross-batch CORPUS dedup, where a
    duplicate may arrive months later, is ``dedup_ingest_stream`` (index
    state that never evicts but holds fingerprints, not keys). JVM state
    store end to end — no Python in the loop. Drains with AvailableNow;
    the checkpoint carries both the file ledger and the dedup state, so a
    later drain still drops duplicates of keys remembered from prior runs
    (within the watermark) — test-pinned.
    """
    stream = spark.readStream.schema(schema).format(fmt).load(source_dir)
    deduped = stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
