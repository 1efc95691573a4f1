"""Snapshot-versioned parquet tables with time travel — table-format-lite.

The reference's tables live in Postgres and are replaced in place
(DROP/CREATE + repopulate, e.g. dvf create_dvf_table.sql); consumers see
half-written state during the swap and history is gone. The lakehouse
answer is a table format (Delta/Iceberg); this module provides the same
three guarantees with nothing but parquet + atomic filesystem renames,
for deployments that don't carry a format dependency:

- **Atomic publish**: a write lands in a new ``v=N`` directory; readers
  resolve the current version through a tiny ``_CURRENT`` pointer file
  that is swapped with an atomic rename. A torn write can never be read.
- **Time travel**: ``read_version(..., version=K)`` reads any retained
  snapshot; ``history()`` lists them with row counts and timestamps.
- **Rollback**: repointing ``_CURRENT`` at an older snapshot is O(1) and
  atomic — no data rewrite.

Scale notes: the pointer file is one rename regardless of table size;
snapshots share nothing (no manifest compaction problem) and retention
is an explicit ``vacuum_versions`` so storage cost is visible. At 100 TB
per snapshot you'd move to Delta/Iceberg for shared file reuse — the API
here is deliberately shaped so ``write_version/read_version`` swap 1:1
for ``saveAsTable``/``VERSION AS OF``.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, _POINTER)


def current_version(table_dir: str) -> int | None:
    """The published version number, or None for an empty table dir."""
    p = _pointer_path(table_dir)
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return int(json.load(f)["version"])


def write_version(df: DataFrame, table_dir: str, compression: str = "zstd") -> int:
    """Write ``df`` as the next snapshot and atomically publish it.

    Returns the new version number. The data lands fully in
    ``v=<n>/`` BEFORE the pointer swap, so concurrent readers see either
    the old or the new snapshot, never a mix.
    """
    os.makedirs(table_dir, exist_ok=True)
    # next = max RETAINED version + 1 (not current + 1: after a rollback
    # the newer snapshot directories still exist and must not be reused)
    existing = [
        int(name.split("=", 1)[1])
        for name in os.listdir(table_dir)
        if name.startswith("v=")
    ]
    n = (max(existing) if existing else 0) + 1
    target = os.path.join(table_dir, f"v={n}")
    df.write.mode("errorifexists").option("compression", compression).parquet(target)
    _publish(table_dir, n)
    return n


def _publish(table_dir: str, version: int) -> None:
    tmp = _pointer_path(table_dir) + ".__tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"version": version, "published_at": time.time()}, f)
    os.replace(tmp, _pointer_path(table_dir))  # atomic on POSIX


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or time-travel to ``version``."""
    v = version if version is not None else current_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no published version in {table_dir}")
    path = os.path.join(table_dir, f"v={v}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"version {v} not found in {table_dir}")
    return spark.read.parquet(path)


def rollback(table_dir: str, version: int) -> None:
    """Atomically repoint the table at an older snapshot (O(1))."""
    if not os.path.isdir(os.path.join(table_dir, f"v={version}")):
        raise FileNotFoundError(f"version {version} not found in {table_dir}")
    _publish(table_dir, version)


def history(table_dir: str) -> list[dict]:
    """Retained snapshots, oldest first: version + size in bytes."""
    out = []
    cur = current_version(table_dir)
    for name in sorted(os.listdir(table_dir)):
        if not name.startswith("v="):
            continue
        v = int(name.split("=", 1)[1])
        vdir = os.path.join(table_dir, name)
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(vdir)
            for f in fs
        )
        out.append({"version": v, "bytes": size, "is_current": v == cur})
    return sorted(out, key=lambda d: d["version"])


def vacuum_versions(table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest ``keep_last`` snapshots (never the
    current one). Returns the removed version numbers — explicit
    retention, so storage cost stays visible."""
    import shutil

    cur = current_version(table_dir)
    versions = [h["version"] for h in history(table_dir)]
    keep = set(versions[-keep_last:]) | ({cur} if cur is not None else set())
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(os.path.join(table_dir, f"v={v}"))
            removed.append(v)
    return removed


def delete_keys(
    spark: SparkSession,
    table_dir: str,
    keys_df: DataFrame,
    key_cols: list[str],
    compression: str = "zstd",
) -> int:
    """Right-to-erasure delete: publish a new snapshot without the rows
    matching ``keys_df`` (LEFT ANTI join on ``key_cols``), then it is the
    caller's ``vacuum_versions`` policy that physically destroys the old
    snapshots still holding the data — the same two-step (logical delete,
    physical vacuum) contract as Delta/Iceberg DELETE + VACUUM.

    Returns the new version number. The anti join broadcasts the key set
    when small (the common GDPR case: a bounded subject list against a
    100 TB table — one scan, no fact shuffle).
    """
    import pyspark.sql.functions as F

    current = read_version(spark, table_dir)
    keys = keys_df.select(*key_cols).distinct()
    remaining = current.join(F.broadcast(keys), on=key_cols, how="left_anti")
    return write_version(remaining, table_dir, compression=compression)


class PublishConflict(RuntimeError):
    """Another writer published between read and publish (lost update)."""


def write_version_if(
    df: DataFrame,
    table_dir: str,
    expected_version: int | None,
    compression: str = "zstd",
) -> int:
    """Optimistic-concurrency publish: write the snapshot, then publish it
    ONLY IF the table is still at ``expected_version`` (the version the
    writer read its inputs from). Two concurrent read-modify-write jobs
    can both land their ``v=<n>/`` data directories, but the second
    pointer swap detects the moved version and raises
    :class:`PublishConflict` instead of silently overwriting the first
    writer's result — the caller re-reads and retries. This is the same
    compare-and-swap contract table formats like Delta/Iceberg implement
    on their log; here the pointer file is the log head.

    The guard runs AFTER the (slow) snapshot write, immediately before the
    pointer swap — checking before the write would leave the whole write
    duration as a race window. What remains is the re-check + rename gap:
    ~microseconds on a single POSIX host and benign for job-grained
    writers; an object-store deployment would use a conditional PUT for
    the same semantics. A conflict leaves the orphan ``v=<n>/`` directory
    behind (never published, invisible to readers) — vacuum_versions
    collects it.
    """
    import os as _os

    _os.makedirs(table_dir, exist_ok=True)
    existing = [
        int(name.split("=", 1)[1])
        for name in _os.listdir(table_dir)
        if name.startswith("v=")
    ]
    n = (max(existing) if existing else 0) + 1
    target = _os.path.join(table_dir, f"v={n}")
    df.write.mode("errorifexists").option("compression", compression).parquet(target)
    found = current_version(table_dir)
    if found != expected_version:
        raise PublishConflict(
            f"{table_dir}: expected v{expected_version}, found v{found}"
        )
    _publish(table_dir, n)
    return n
