"""Streaming embedding ingestion with incremental SemDeDup.

The embedding twin of ``streaming/dedup_stream.py:dedup_ingest_stream``:
newly-arrived embedding files are drained (Trigger.AvailableNow,
checkpoint = the processed-file ledger), each batch is deduped against the
semantic index accumulated from every previous batch
(operators/incremental_semantic.py), survivors are appended to the curated
store, and the grown index is swapped into place atomically.

Retry safety is IDENTICAL to the text tier and reuses its primitives: the
``_last_batch`` watermark is written INTO the tmp index directory BEFORE
the two-rename swap (index contents and watermark commit as one unit),
``_recover_swap_state`` repairs a torn swap at sink entry, and a replayed
batch id either sees watermark < id (full re-run, overwriting its own
survivor dir) or watermark >= id (no-op) — the crash-window table in
dedup_stream.py's module docstring applies row for row.

Centroids are frozen for the stream's lifetime (the SemDeDup recipe:
train on a sample once) — see incremental_semantic.py's contract note.
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
from datagouvfr_data_pipelines_spark.operators.incremental_semantic import (
    build_semantic_index,
    incremental_semantic_dedup,
)
from datagouvfr_data_pipelines_spark.streaming.availablenow import (
    process_available_files,
)
from datagouvfr_data_pipelines_spark.streaming.dedup_stream import (
    _read_watermark,
    _write_watermark_into,
)


def semantic_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType | str,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_cell_size: int = 10_000,
    fmt: str = "parquet",
    scaled: bool = False,
) -> None:
    """Drain available embedding files; per batch: SemDeDup vs the index,
    append survivors to ``corpus_dir/batch=<id>/``, swap the grown index
    into ``index_dir`` atomically (watermark inside the swap unit).

    ``scaled=True`` routes assignment and both cosine tiers through the
    numpy GEMM path (``incremental_semantic_dedup_scaled``) — required
    once k grows past ~16, i.e. any production-sized stream. The two
    paths write indexes with different vector types (float32 expression
    vs float64 GEMM) — pick one per stream lifetime, like the
    portable-vs-xxhash MinHash contract."""
    import glob as _glob

    from datagouvfr_data_pipelines_spark.operators.incremental_semantic import (
        build_semantic_index_scaled,
        incremental_semantic_dedup_scaled,
    )

    build_fn = build_semantic_index_scaled if scaled else build_semantic_index
    dedup_fn = (
        incremental_semantic_dedup_scaled if scaled else incremental_semantic_dedup
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # repair a torn swap BEFORE reading the watermark (crash between
        # the two renames leaves the index only under __old; reading a
        # missing index_dir as watermark -1 would rebuild from empty and
        # rmtree the only copy of the index history)
        _recover_swap_state(index_dir)
        if _read_watermark(index_dir) >= batch_id:
            return  # replayed batch: already fully applied
        have_index = bool(
            _glob.glob(os.path.join(index_dir, "**", "*.parquet"), recursive=True)
        )
        if have_index:
            index = spark.read.parquet(index_dir)
        else:
            index = build_fn(batch_df.limit(0), id_col, vec_col, centroids)
        res = dedup_fn(
            batch_df,
            index,
            id_col,
            vec_col,
            centroids,
            threshold=threshold,
            max_cell_size=max_cell_size,
        )
        # survivors: idempotent per-batch subdirectory overwrite
        write_parquet(res.survivors, os.path.join(corpus_dir, f"batch={batch_id}"))
        # index: atomic swap of old + new rows, watermark inside the unit
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
        spark.catalog.clearCache()  # drop the batch index persist

    process_available_files(
        spark,
        source_dir,
        schema,
        transform=lambda df: df,
        sink_fn=sink,
        checkpoint_dir=checkpoint_dir,
        fmt=fmt,
    )
