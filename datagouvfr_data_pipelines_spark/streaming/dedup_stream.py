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
directory carries a ``_last_batch`` watermark INSIDE it, written into the
tmp directory BEFORE the atomic ``os.rename`` swap — index contents and
watermark commit as one unit and can never disagree. The swap itself is
TWO renames, so every failure point is enumerated and repaired by
``_recover_swap_state`` at sink entry:

=====================================  ==========================  =========
crash point                            on-disk layout              recovery
=====================================  ==========================  =========
during tmp parquet write               index + stale ``__tmp``     drop tmp; replay re-runs (watermark < id), overwriting its own survivor dir
after tmp write, before rename #1      index + complete ``__tmp``  same — tmp is DISCARDED, never adopted (its watermark never became current)
between rename #1 and rename #2        ``__old`` only, no index    roll ``__old`` back to ``index_dir`` (the accumulated fingerprint history is NOT lost); replay re-runs
after rename #2, before rmtree(old)    new index + ``__old``       drop ``__old``; replay no-ops (watermark >= id)
after rmtree, before checkpoint        new index only              replay no-ops (watermark >= id)
=====================================  ==========================  =========

Without the between-renames recovery a restart would read watermark -1,
rebuild an EMPTY index, and ``rmtree`` the only surviving copy of the
fingerprint history — the round-4 advice bug this table closes. A replayed
batch id therefore either sees watermark < id (old pair: full re-run,
overwriting its own partial survivor dir) or watermark >= id (new pair:
no-op) — never the torn state where its fingerprints are in the index but
its survivors were dropped. Spark's parquet scan ignores ``_``-prefixed
files, so the watermark rides inside the index directory for free. Because
the watermark lives inside ``index_dir``, two streams with sibling index
directories never share one watermark file.
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
) -> None:
    """Drain available files; per batch: dedup vs index, append survivors
    to ``corpus_dir/batch=<id>/``, swap the grown index into ``index_dir``.
    """
    import glob as _glob

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # repair a torn swap BEFORE reading the watermark: a crash between
        # the two renames leaves the index only under __old, and reading a
        # missing index_dir as watermark -1 would rebuild from empty and
        # rmtree the only copy of the fingerprint history (module docstring
        # crash-window table, row 3)
        _recover_swap_state(index_dir)
        if _read_watermark(index_dir) >= batch_id:
            return  # replayed batch: already fully applied
        have_index = bool(
            _glob.glob(os.path.join(index_dir, "**", "*.parquet"), recursive=True)
        )
        if have_index:
            index = spark.read.parquet(index_dir)
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
        # survivors: idempotent per-batch subdirectory overwrite
        write_parquet(res.survivors, os.path.join(corpus_dir, f"batch={batch_id}"))
        # index: atomic swap of old + new rows. The watermark is written
        # into the tmp directory BEFORE the rename, so index contents and
        # watermark commit as one unit — a replay can never see a state
        # where its fingerprints are indexed but its batch looks unapplied.
        merged = index.unionByName(res.index_rows)
        tmp = index_dir.rstrip("/") + "__tmp_swap"
        write_parquet(merged, tmp)
        _write_watermark_into(tmp, batch_id)
        old = index_dir.rstrip("/") + "__old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(index_dir):
            os.rename(index_dir, old)
        os.rename(tmp, index_dir)
        if os.path.exists(old):
            shutil.rmtree(old)
        spark.catalog.clearCache()  # drop the batch fingerprint persist

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
