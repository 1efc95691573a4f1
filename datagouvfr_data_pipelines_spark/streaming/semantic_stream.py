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

Compaction (round 9) — append-only must not mean list-forever: after 10k
ingests the read side would touch 10k parquet directories per batch (the
classic small-file wall). When the number of committed ``batch=<id>``
dirs exceeds ``compact_after``, the sink folds everything committed —
current ``seg=<gen>`` segment, batch dirs, legacy root files — into ONE
consolidated ``seg=<gen+1>`` segment (~128 MB files), then atomically
cuts readers over via the ``_base_seg`` pointer file (``"<gen> <upto>"``:
segment generation + the highest batch id it absorbs). Readers take the
pointed segment plus only ``batch=<id>`` dirs with upto < id <= watermark;
legacy root files are read only while no segment exists (the first
compaction absorbs them). Decisions are bit-identical: the segment holds
the union of exactly the rows the replaced paths held (parity-pinned).

Compaction crash windows (all repaired at next sink entry):

crash window                         on-disk state                     recovery
----------------------------------- --------------------------------- -----------------------------------------
during segment staging write         orphan ``seg=<g+1>.tmp``          rmtree at entry; readers never saw it
between seg rename and pointer       unreferenced ``seg=<g+1>``        invisible (pointer still says g); rmtree
                                                                       at entry, compaction retries later
during pointer replace               ``_base_seg.tmp`` orphan          os.replace is atomic — pointer is either
                                                                       old (stale seg cleaned) or new (live)
after pointer, during cleanup        stale seg / batch<=upto / legacy  invisible to readers (excluded by pointer
                                     files linger                      rules above); removed at next entry

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
)

# Commit/compaction machinery is shared with the text tier
# (streaming/dedup_stream.py) — see streaming/index_commit.py. The
# aliases keep this module's historical import surface stable.
from datagouvfr_data_pipelines_spark.streaming.index_commit import (  # noqa: E402
    STAGING_SUFFIX as _STAGING_SUFFIX,
    cleanup_index_dir as _cleanup_index_dir,
    commit_watermark as _commit_watermark,
    committed_index_paths as _committed_index_paths,
    maybe_compact_index as _maybe_compact_index,
    read_base_seg as _read_base_seg,
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
    compact_after: int = 64,
) -> None:
    """Drain available embedding files; per batch: SemDeDup vs the index,
    append survivors to ``corpus_dir/batch=<id>/``, commit the batch's
    index rows append-only to ``index_dir/batch=<id>/`` (watermark advanced
    atomically after the rename — see the module crash table). Once more
    than ``compact_after`` committed batch dirs accumulate, they are folded
    into one consolidated ``seg=<gen>`` segment behind the atomic
    ``_base_seg`` pointer (module compaction crash table) so the per-batch
    read side stays O(segment + recent batches), not O(batches ever).
    Survivor ``corpus_dir/batch=<id>`` dirs are write-only for the stream;
    compact them out of band with ``io.layout.compact_parquet_dir`` in the
    nightly slot.

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
        if os.path.isdir(index_dir):
            # sweep anything a torn compaction left unreferenced (orphan
            # seg staging/rename, absorbed batch dirs, stale legacy files)
            _cleanup_index_dir(index_dir)
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
            # the watermark — never rewrite the accumulated index. ONE file
            # per batch append: the rows are batch-bounded and tiny, and the
            # fanned index build otherwise writes core-count ~KB part files
            # per batch (round-12 wave 1 regressed this to defaultParallelism
            # parts — the small-file wall compaction exists to prevent).
            # repartition, not coalesce: the dedup compute stays parallel,
            # only the write collapses.
            write_parquet(res.index_rows.repartition(1), staging)
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
        _maybe_compact_index(
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
