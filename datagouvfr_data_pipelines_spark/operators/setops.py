"""Set operators & CDC diff (SURVEY §2.7, §4 incremental-CDC row).

Ref: the meteo pipeline computes whole-row set diffs between the new and old
CSV snapshots to derive additions/deletions, then applies them transactionally
(meteo/pg_processing/task_functions.py:448-535,559-576). Spark-first this is
``exceptAll`` both ways — a single hash-aggregate shuffle each; at 100 TB
prefer snapshot tables partitioned on the diff scope so only changed
partitions are diffed.
"""

from __future__ import annotations

from typing import NamedTuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class CdcDiff(NamedTuple):
    additions: DataFrame
    deletions: DataFrame


def cdc_diff(new: DataFrame, old: DataFrame) -> CdcDiff:
    """U2: whole-row CDC diff (multiset semantics, both directions)."""
    return CdcDiff(additions=new.exceptAll(old), deletions=old.exceptAll(new))


def union_align(frames: list[DataFrame]) -> DataFrame:
    """U1: union-all with schema alignment by column name, missing -> NULL.

    Ref: concat of per-year DVF files / per-source resource lists
    (dvf/explore/task_functions.py:676,753; consolidation.py:672-673).
    """
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def membership_split(
    candidates: DataFrame, processed: DataFrame, on
) -> tuple[DataFrame, DataFrame]:
    """U4: split candidates into (to_process, already_processed) by ledger
    membership (dgv/tabular_metrics/task_functions.py:195-200)."""
    todo = candidates.join(processed, on=on, how="left_anti")
    done = candidates.join(processed, on=on, how="left_semi")
    return todo, done


def apply_cdc_full_replace_heuristic(
    diff: CdcDiff, full_replace_threshold: int = 20_000
) -> str:
    """ST6/§4: decide apply strategy — merge deltas vs partition full-replace.

    Mirrors meteo/pg_processing/task_functions.py:563-568 (>20k deletions →
    truncate period + bulk reload). Returns "merge" or "full_replace"; the
    count on the deletions side is a cheap aggregate.
    """
    n_del = diff.deletions.count()
    return "full_replace" if n_del > full_replace_threshold else "merge"
