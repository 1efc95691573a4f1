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
_BASE_SEG = "_base_seg"
_SEG_TMP_SUFFIX = ".tmp"


def _read_base_seg(index_dir: str) -> tuple[int | None, int]:
    """(segment generation, highest batch id the segment absorbs), or
    (None, -1) when no consolidated segment exists yet."""
    p = os.path.join(index_dir.rstrip("/"), _BASE_SEG)
    if os.path.exists(p):
        with open(p) as fh:
            gen_s, upto_s = fh.read().split()
        return int(gen_s), int(upto_s)
    return None, -1


def _commit_base_seg(index_dir: str, gen: int, upto: int) -> None:
    """Atomically cut readers over to ``seg=<gen>`` (tmp + os.replace)."""
    p = os.path.join(index_dir.rstrip("/"), _BASE_SEG)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"{gen} {upto}")
    os.replace(tmp, p)


def _batch_dirs(index_dir: str) -> list[tuple[int, str]]:
    out = []
    for d in _glob.glob(os.path.join(index_dir, "batch=*")):
        name = os.path.basename(d).split("=", 1)[1]
        if name.lstrip("-").isdigit():
            out.append((int(name), d))
    return sorted(out)


def _committed_index_paths(index_dir: str, watermark: int) -> list[str]:
    """Parquet paths of the committed index: the consolidated ``seg=<gen>``
    segment named by the ``_base_seg`` pointer (if any), plus ``batch=<id>``
    dirs with seg_upto < id <= watermark (torn, not-yet-watermarked dirs
    are invisible; dirs the segment absorbed are excluded even if their
    post-compaction cleanup was interrupted)."""
    gen, upto = _read_base_seg(index_dir)
    paths = []
    if gen is not None:
        seg = os.path.join(index_dir, f"seg={gen}")
        if _glob.glob(os.path.join(seg, "*.parquet")):
            paths.append(seg)
    for bid, d in _batch_dirs(index_dir):
        if upto < bid <= watermark and _glob.glob(os.path.join(d, "*.parquet")):
            paths.append(d)
    # Legacy layout: bare part files at the index root — read only until
    # the first compaction absorbs them (a lingering legacy file after an
    # interrupted cleanup must not double-count). Append the FILES, never
    # index_dir itself — a root path makes Spark recursively discover
    # batch=<id> subdirs (including torn ones with id > watermark) at
    # partition depth 1 while the root files sit at depth 0, and the read
    # fails with CONFLICTING_DIRECTORY_STRUCTURES before recovery can run.
    if gen is None:
        paths.extend(sorted(_glob.glob(os.path.join(index_dir, "*.parquet"))))
    return paths


def _cleanup_index_dir(index_dir: str) -> None:
    """Remove everything the ``_base_seg`` pointer makes invisible: orphan
    ``seg=*.tmp`` staging dirs, ``seg=*`` dirs other than the pointed
    generation, ``batch=<id>`` dirs with id <= the segment's upto, and —
    once a segment exists — legacy root-level parquet files. Safe at any
    time: none of these are reachable through ``_committed_index_paths``."""
    gen, upto = _read_base_seg(index_dir)
    for d in _glob.glob(os.path.join(index_dir, "seg=*")):
        name = os.path.basename(d).split("=", 1)[1]
        if name.endswith(_SEG_TMP_SUFFIX) or gen is None or name != str(gen):
            shutil.rmtree(d, ignore_errors=True)
    for bid, d in _batch_dirs(index_dir):
        if bid <= upto:
            shutil.rmtree(d, ignore_errors=True)
    if gen is not None:
        for f in _glob.glob(os.path.join(index_dir, "*.parquet")):
            os.unlink(f)


def _maybe_compact_index(
    spark: SparkSession,
    index_dir: str,
    watermark: int,
    compact_after: int,
    index_cols: list[str],
    target_file_bytes: int = 128 << 20,
) -> None:
    """Fold the committed index into one ``seg=<gen+1>`` segment when more
    than ``compact_after`` committed ``batch=<id>`` dirs have accumulated.
    Stage -> rename -> atomic pointer replace -> cleanup (module crash
    table). Row-preserving by construction: the segment is the union of
    exactly the paths readers currently take, so dedup decisions are
    bit-identical before and after."""
    gen, upto = _read_base_seg(index_dir)
    live = [
        (bid, d) for bid, d in _batch_dirs(index_dir)
        if upto < bid <= watermark
    ]
    if len(live) <= compact_after:
        return
    paths = _committed_index_paths(index_dir, watermark)
    if not paths:
        return
    new_gen = 0 if gen is None else gen + 1
    df = spark.read.parquet(*paths).select(*index_cols)
    total_bytes = 0
    for p in paths:
        if os.path.isdir(p):
            for f in _glob.glob(os.path.join(p, "*.parquet")):
                total_bytes += os.path.getsize(f)
        else:
            total_bytes += os.path.getsize(p)
    n_files = max(1, -(-total_bytes // target_file_bytes))
    staging = os.path.join(index_dir, f"seg={new_gen}{_SEG_TMP_SUFFIX}")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    write_parquet(df.coalesce(n_files), staging)
    final = os.path.join(index_dir, f"seg={new_gen}")
    if os.path.exists(final):
        shutil.rmtree(final)  # unreferenced orphan from a torn compaction
    os.rename(staging, final)
    _commit_base_seg(index_dir, new_gen, watermark)
    _cleanup_index_dir(index_dir)


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
