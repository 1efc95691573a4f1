"""Streaming embedding ingestion with incremental SemDeDup.

The embedding twin of ``streaming/dedup_stream.py:dedup_ingest_stream``:
newly-arrived embedding files are drained (Trigger.AvailableNow,
checkpoint = the processed-file ledger), each batch is deduped against the
semantic index accumulated from every previous batch
(operators/incremental_semantic.py), survivors are appended to the curated
store, and the batch's index rows are committed append-only.

Index layout — append-only, O(batch) commit: the index directory holds one
``batch=<id>/`` parquet subdirectory per committed batch plus the
``_last_batch`` watermark file, mirroring the survivors dir. A batch
commit stages its (bounded) index rows in a sibling tmp dir, renames the
dir into place, then atomically replaces the watermark — the ENTIRE
corpus-sized index is never rewritten (the round-7 layout unioned and
rewrote it per ingest, making the state commit O(corpus) while compute was
batch-bounded). Readers take only ``batch=<id>`` dirs with id <= the
watermark, so a torn commit is invisible.

Crash-window table (restart always repairs at sink entry):

crash window                         on-disk state                     recovery
----------------------------------- --------------------------------- -----------------------------------------
during staging write                 orphan ``__batch_tmp``            rmtree the orphan; replay re-runs
between rename and watermark         ``batch=<id>`` dir, watermark<id  dir invisible to readers (id>watermark);
                                                                       replay re-runs, rmtree+rename over it
during watermark replace             ``_last_batch.tmp`` orphan        os.replace is atomic — watermark is either
                                                                       old (replay re-runs) or new (no-op)
after watermark                      fully committed                   replay sees watermark >= id: no-op

A replayed batch id therefore either sees watermark < id (full re-run,
overwriting its own survivor dir and index batch dir with identical
content) or watermark >= id (no-op). Legacy round-7 single-dir indexes are
still readable (root-level parquet files are included) and a torn legacy
two-rename swap is still rolled forward at entry via
``_recover_swap_state`` — upgrades need no migration step.

Centroids are frozen for the stream's lifetime (the SemDeDup recipe:
train on a sample once) — see incremental_semantic.py's contract note.
"""

from __future__ import annotations

import glob as _glob
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
    _WATERMARK,
    _read_watermark,
)

_STAGING_SUFFIX = "__batch_tmp"


def _committed_index_paths(index_dir: str, watermark: int) -> list[str]:
    """Parquet paths of the committed index: ``batch=<id>`` dirs with
    id <= watermark (torn, not-yet-watermarked dirs are invisible), plus
    any legacy root-level parquet files (round-7 single-dir layout)."""
    paths = []
    for d in sorted(_glob.glob(os.path.join(index_dir, "batch=*"))):
        name = os.path.basename(d).split("=", 1)[1]
        if not name.lstrip("-").isdigit():
            continue
        if int(name) <= watermark and _glob.glob(os.path.join(d, "*.parquet")):
            paths.append(d)
    # Legacy layout: bare part files at the index root. Append the FILES,
    # never index_dir itself — a root path makes Spark recursively discover
    # batch=<id> subdirs (including torn ones with id > watermark) at
    # partition depth 1 while the root files sit at depth 0, and the read
    # fails with CONFLICTING_DIRECTORY_STRUCTURES before recovery can run.
    paths.extend(sorted(_glob.glob(os.path.join(index_dir, "*.parquet"))))
    return paths


def _commit_watermark(index_dir: str, batch_id: int) -> None:
    """Atomically advance the watermark (tmp write + os.replace)."""
    p = os.path.join(index_dir.rstrip("/"), _WATERMARK)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, p)


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
    append survivors to ``corpus_dir/batch=<id>/``, commit the batch's
    index rows append-only to ``index_dir/batch=<id>/`` (watermark advanced
    atomically after the rename — see the module crash table).

    ``scaled=True`` routes assignment and both cosine tiers through the
    numpy GEMM path (``incremental_semantic_dedup_scaled``) — required
    once k grows past ~16, i.e. any production-sized stream. The two
    paths write indexes with different vector types (float32 expression
    vs float64 GEMM) — pick one per stream lifetime, like the
    portable-vs-xxhash MinHash contract."""
    from datagouvfr_data_pipelines_spark.operators.incremental_semantic import (
        build_semantic_index_scaled,
        incremental_semantic_dedup_scaled,
    )

    build_fn = build_semantic_index_scaled if scaled else build_semantic_index
    dedup_fn = (
        incremental_semantic_dedup_scaled if scaled else incremental_semantic_dedup
    )
    index_cols = ["doc", "cell", "vec", "nrm", "c_sim"]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # legacy repair first: a torn round-7 two-rename swap leaves the
        # index only under __old; roll it forward BEFORE reading the
        # watermark (a missing index_dir would read as watermark -1 and
        # rebuild from empty)
        _recover_swap_state(index_dir)
        staging = index_dir.rstrip("/") + _STAGING_SUFFIX
        if os.path.exists(staging):
            shutil.rmtree(staging)  # torn staging write from a crashed run
        watermark = _read_watermark(index_dir)
        if watermark >= batch_id:
            return  # replayed batch: already fully applied
        paths = _committed_index_paths(index_dir, watermark)
        if paths:
            index = spark.read.parquet(*paths).select(*index_cols)
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
        try:
            # survivors: idempotent per-batch subdirectory overwrite
            write_parquet(
                res.survivors, os.path.join(corpus_dir, f"batch={batch_id}")
            )
            # index rows: stage (O(batch) bytes), rename into place, advance
            # the watermark — never rewrite the accumulated index
            write_parquet(res.index_rows, staging)
        finally:
            # a failed write must not leak one persisted frame per batch
            # across a long-lived stream
            res.unpersist()
        os.makedirs(index_dir, exist_ok=True)
        final = os.path.join(index_dir, f"batch={batch_id}")
        if os.path.exists(final):
            shutil.rmtree(final)  # orphan from a run that died pre-watermark
        os.rename(staging, final)
        _commit_watermark(index_dir, batch_id)

    process_available_files(
        spark,
        source_dir,
        schema,
        transform=lambda df: df,
        sink_fn=sink,
        checkpoint_dir=checkpoint_dir,
        fmt=fmt,
    )
