"""Append-only index commit + compaction — shared by the streaming dedup
tiers (text fingerprints in ``dedup_stream.py``, embedding index in
``semantic_stream.py``).

Layout inside an index directory:

- ``batch=<id>/``   one immutable parquet dir per committed ingest batch
- ``_last_batch``   watermark: highest committed batch id (os.replace'd)
- ``seg=<gen>/``    optional consolidated segment (compaction output)
- ``_base_seg``     pointer file ``"<gen> <upto>"`` naming the live
                    segment and the highest batch id it absorbs
- bare ``*.parquet`` files at the root: legacy single-dir layout
  (pre-append-only streams) — readable until the first compaction
  absorbs them

Batch commit: stage a sibling tmp dir -> rename into ``batch=<id>`` ->
``os.replace`` the watermark. Compaction: stage ``seg=<g+1>.tmp`` ->
rename ``seg=<g+1>`` -> ``os.replace`` the pointer -> cleanup. Readers
(``committed_index_paths``) take the pointed segment plus only batch
dirs with upto < id <= watermark, so every intermediate crash state is
invisible and ``cleanup_index_dir`` can sweep the leftovers at any sink
entry. The full crash-window tables live in ATOMICITY.md (Pattern C)
and in ``semantic_stream.py``'s module docstring.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession  # noqa: F401

from datagouvfr_data_pipelines_spark.io.writers import write_parquet

# same file name dedup_stream._WATERMARK names — defined here too so the
# commit layer has no import cycle with the streams that use it
WATERMARK = "_last_batch"
STAGING_SUFFIX = "__batch_tmp"
BASE_SEG = "_base_seg"
SEG_TMP_SUFFIX = ".tmp"


def commit_watermark(index_dir: str, batch_id: int) -> None:
    """Atomically advance the watermark (tmp write + os.replace)."""
    p = os.path.join(index_dir.rstrip("/"), WATERMARK)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, p)


def read_base_seg(index_dir: str) -> tuple[int | None, int]:
    """(segment generation, highest batch id the segment absorbs), or
    (None, -1) when no consolidated segment exists yet."""
    p = os.path.join(index_dir.rstrip("/"), BASE_SEG)
    if os.path.exists(p):
        with open(p) as fh:
            gen_s, upto_s = fh.read().split()
        return int(gen_s), int(upto_s)
    return None, -1


def commit_base_seg(index_dir: str, gen: int, upto: int) -> None:
    """Atomically cut readers over to ``seg=<gen>`` (tmp + os.replace)."""
    p = os.path.join(index_dir.rstrip("/"), BASE_SEG)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"{gen} {upto}")
    os.replace(tmp, p)


def batch_dirs(index_dir: str) -> list[tuple[int, str]]:
    out = []
    for d in _glob.glob(os.path.join(index_dir, "batch=*")):
        name = os.path.basename(d).split("=", 1)[1]
        if name.lstrip("-").isdigit():
            out.append((int(name), d))
    return sorted(out)


def committed_index_paths(index_dir: str, watermark: int) -> list[str]:
    """Parquet paths of the committed index: the consolidated ``seg=<gen>``
    segment named by the ``_base_seg`` pointer (if any), plus ``batch=<id>``
    dirs with seg_upto < id <= watermark (torn, not-yet-watermarked dirs
    are invisible; dirs the segment absorbed are excluded even if their
    post-compaction cleanup was interrupted)."""
    gen, upto = read_base_seg(index_dir)
    paths = []
    if gen is not None:
        seg = os.path.join(index_dir, f"seg={gen}")
        if _glob.glob(os.path.join(seg, "*.parquet")):
            paths.append(seg)
    for bid, d in batch_dirs(index_dir):
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


def cleanup_index_dir(index_dir: str) -> None:
    """Remove everything the ``_base_seg`` pointer makes invisible: orphan
    ``seg=*.tmp`` staging dirs, ``seg=*`` dirs other than the pointed
    generation, ``batch=<id>`` dirs with id <= the segment's upto, and —
    once a segment exists — legacy root-level parquet files. Safe at any
    time: none of these are reachable through ``committed_index_paths``."""
    gen, upto = read_base_seg(index_dir)
    for d in _glob.glob(os.path.join(index_dir, "seg=*")):
        name = os.path.basename(d).split("=", 1)[1]
        if name.endswith(SEG_TMP_SUFFIX) or gen is None or name != str(gen):
            shutil.rmtree(d, ignore_errors=True)
    for bid, d in batch_dirs(index_dir):
        if bid <= upto:
            shutil.rmtree(d, ignore_errors=True)
    if gen is not None:
        for f in _glob.glob(os.path.join(index_dir, "*.parquet")):
            os.unlink(f)


def maybe_compact_index(
    spark: "SparkSession",
    index_dir: str,
    watermark: int,
    compact_after: int,
    index_cols: list[str],
    target_file_bytes: int = 128 << 20,
) -> None:
    """Fold the committed index into one ``seg=<gen+1>`` segment when more
    than ``compact_after`` committed ``batch=<id>`` dirs have accumulated.
    Stage -> rename -> atomic pointer replace -> cleanup (ATOMICITY.md
    Pattern C). Row-preserving by construction: the segment is the union
    of exactly the paths readers currently take, so dedup decisions are
    bit-identical before and after."""
    gen, upto = read_base_seg(index_dir)
    live = [
        (bid, d) for bid, d in batch_dirs(index_dir)
        if upto < bid <= watermark
    ]
    if len(live) <= compact_after:
        return
    paths = committed_index_paths(index_dir, watermark)
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
    staging = os.path.join(index_dir, f"seg={new_gen}{SEG_TMP_SUFFIX}")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    write_parquet(df.coalesce(n_files), staging)
    final = os.path.join(index_dir, f"seg={new_gen}")
    if os.path.exists(final):
        shutil.rmtree(final)  # unreferenced orphan from a torn compaction
    os.rename(staging, final)
    commit_base_seg(index_dir, new_gen, watermark)
    cleanup_index_dir(index_dir)
