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


def cdc_diff_counted(new: DataFrame, old: DataFrame) -> DataFrame:
    """U2 scale path: both CDC directions in ONE shuffle.

    ``exceptAll`` twice shuffles both inputs twice (4 table-shuffles).
    Instead: union the inputs weighted +1/-1, groupBy the full row, and
    re-expand the count difference — additions are rows with positive net
    multiplicity, deletions negative, each emitted |diff| times
    (exceptAll's multiset semantics exactly). Returns rows with an ``op``
    column ('add'/'del') prepended.
    """
    cols = new.columns
    tagged = new.select(*cols, F.lit(1).alias("__w")).unionByName(
        old.select(*cols, F.lit(-1).alias("__w"))
    )
    counted = tagged.groupBy(*cols).agg(F.sum("__w").alias("__d"))
    return (
        counted.where(F.col("__d") != 0)
        .select(
            F.when(F.col("__d") > 0, "add").otherwise("del").alias("op"),
            *cols,
            F.explode(F.sequence(F.lit(1), F.abs(F.col("__d")))).alias("__i"),
        )
        .drop("__i")
    )


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


def ordered_cdc_apply(
    spark,
    snapshots: list[tuple[str, DataFrame]],
    sink_path: str,
    full_replace_threshold: int = 20_000,
) -> list[str]:
    """ST6: apply a series of snapshot diffs in deterministic order.

    The reference processes meteo snapshot files latest -> previous -> rest
    so renamed files neither duplicate nor lose rows
    (meteo/pg_processing/task_functions.py:237-260), applying each diff
    delete+insert transactionally with a full-replace fallback above 20k
    deletions (:563-576).

    Spark-side: snapshots are applied strictly in the given order and each
    apply converges the sink to THAT snapshot's content (diff -> merge or
    full-replace via the deletion-count heuristic, atomic write-new + swap).
    Because the last-applied snapshot wins, callers pass snapshots in the
    order they should take effect — oldest first for full-state snapshots;
    the reference's latest->previous->rest order applies to its
    period-scoped files where each snapshot covers a disjoint period.
    Returns the per-snapshot strategy decisions for observability.
    """
    import os
    import shutil

    from datagouvfr_data_pipelines_spark.io.writers import _recover_swap_state

    decisions: list[str] = []
    for name, snap in snapshots:
        # repair any leftover __tmp/__old from a crashed previous apply
        # before reading sink state (see writers._recover_swap_state)
        _recover_swap_state(sink_path, tmp_suffix="__tmp")
        if not os.path.exists(sink_path):
            snap.write.mode("overwrite").option("compression", "zstd").parquet(sink_path)
            decisions.append(f"{name}:initial_load")
            continue
        current = spark.read.parquet(sink_path)
        diff = cdc_diff(snap, current)
        strategy = apply_cdc_full_replace_heuristic(diff, full_replace_threshold)
        if strategy == "full_replace":
            result = snap
        else:
            result = current.exceptAll(diff.deletions).unionByName(diff.additions)
        tmp = sink_path.rstrip("/") + "__tmp"
        result.write.mode("overwrite").option("compression", "zstd").parquet(tmp)
        old = sink_path.rstrip("/") + "__old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(sink_path, old)
        os.rename(tmp, sink_path)
        shutil.rmtree(old)
        decisions.append(f"{name}:{strategy}")
    return decisions


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


def record_field_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    ignore_cols: list[str] | None = None,
) -> DataFrame:
    """Per-record field-level diff — the engine form of the reference's
    ``DiffManager.get_diff`` (verticales/simplifions/diff_manager.py, used
    to decide which Grist records actually changed): for keys present in
    BOTH snapshots, one row per CHANGED field with its old and new value,
    where ``ignore_cols`` (the reference's volatile metadata keys —
    Modifie_le, Modifie_par, anchor_link, technical_title) never count as
    changes. A record whose only differences are ignored columns produces
    no rows at all (the reference returns ``diff is None``).

    Values are surfaced as strings so heterogeneous columns share one
    (key..., column, old_value, new_value) output — the exploded,
    SQL-expressible twin of a map<col, {old,new}>. NULL-safe comparison;
    NULL values stringify to NULL. One key join, the change scan is a
    per-row array filter + explode — no extra shuffle beyond the join.
    The aggregate companion is :func:`field_change_stats` (how MANY
    changed per column); this answers WHAT changed per record.
    """
    ignore = set(ignore_cols or [])
    compare = [
        c for c in new.columns if c not in key_cols and c not in ignore
    ]
    missing = [c for c in compare if c not in old.columns]
    if missing:
        raise ValueError(f"record_field_diff: columns absent in old: {missing}")
    o = old.select(
        *key_cols, *[F.col(c).alias(f"__o_{c}") for c in compare]
    )
    n = new.select(
        *key_cols, *[F.col(c).alias(f"__n_{c}") for c in compare]
    )
    changes = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__o_{c}").cast("string").alias("old_value"),
                        F.col(f"__n_{c}").cast("string").alias("new_value"),
                    ),
                )
                for c in compare
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        o.join(n, on=key_cols)
        .select(*key_cols, F.explode(changes).alias("__chg"))
        .select(
            *key_cols, "__chg.column", "__chg.old_value", "__chg.new_value"
        )
    )


def field_change_stats(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Column-level CDC diagnostics: for keys present in BOTH snapshots,
    how many values changed per column (null-safe comparison). One key
    join; every column's change flag is summed in the same
    partial-aggregated pass, then unpivoted with stack. The row-level
    companion is ``cdc_diff`` — this answers 'WHICH fields drive the
    churn' before deciding between targeted updates and full replace.
    """
    o = old.select(*key_cols, *[F.col(c).alias(f"__o_{c}") for c in compare_cols])
    n = new.select(*key_cols, *[F.col(c).alias(f"__n_{c}") for c in compare_cols])
    joined = o.join(n, on=key_cols)
    aggs = [F.count(F.lit(1)).alias("__n_compared")]
    for c in compare_cols:
        aggs.append(
            F.sum(
                (~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))).cast("long")
            ).alias(f"__chg_{c}")
        )
    wide = joined.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __chg_{c}, __n_compared" for c in compare_cols
    )
    return wide.selectExpr(
        f"stack({len(compare_cols)}, {stack_args}) AS "
        "(column, n_changed, n_compared)"
    )
