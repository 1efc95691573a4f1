"""Incrementally-maintained rollup: streaming file drain -> mergeable
partial-aggregate states -> idempotent state-table merge.

This closes the loop between the streaming veneer (checkpoint-as-ledger
file drain, availablenow.py) and incremental materialization
(operators/aggregates.py:partial_agg_states): each drained batch is reduced
to per-group algebraic states and merged into a persisted state table, so
the rollup over ALL history is maintained without ever rescanning it —
the 100 TB answer to the reference's rebuild-the-table-nightly habit.

Retry safety (same contract as streaming/dedup_stream.py): foreachBatch can
replay a batch whose sink ran but whose checkpoint commit didn't, so the
state directory carries a ``_last_batch`` watermark INSIDE it, written into
the tmp directory BEFORE the atomic ``os.rename`` swap — state contents and
watermark commit as one unit and can never disagree. Crash-window table
(every failure point, what survives, how the replay recovers):

=====================================  ==========================  =========
crash point                            on-disk layout              recovery
=====================================  ==========================  =========
during tmp parquet write               state + stale ``__tmp``     ``_recover_swap_state`` drops tmp; replay re-merges (watermark < id)
after tmp write, before rename #1      state + complete ``__tmp``  same — tmp is DISCARDED, never adopted (its watermark never became current)
between rename #1 and rename #2        ``__old`` only, no state    ``_recover_swap_state`` rolls ``__old`` back to state; replay re-merges
after rename #2, before rmtree(old)    new state + ``__old``       ``_recover_swap_state`` drops ``__old``; replay no-ops (watermark >= id)
after rmtree, before checkpoint        new state only              replay no-ops (watermark >= id)
=====================================  ==========================  =========

Spark's parquet scan ignores ``_``-prefixed files, so the watermark rides
inside the state directory for free and sibling state dirs never share one.
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
from datagouvfr_data_pipelines_spark.operators.aggregates import (
    merge_agg_states,
    partial_agg_states,
)
from datagouvfr_data_pipelines_spark.streaming.availablenow import (
    process_available_files,
)

_WATERMARK = "_last_batch"


def _read_watermark(state_path: str) -> int:
    p = os.path.join(state_path.rstrip("/"), _WATERMARK)
    if os.path.exists(p):
        with open(p) as fh:
            return int(fh.read().strip() or "-1")
    return -1


def _write_watermark_into(dir_path: str, batch_id: int) -> None:
    p = os.path.join(dir_path.rstrip("/"), _WATERMARK)
    with open(p, "w") as fh:
        fh.write(str(batch_id))


def merge_states_into(
    spark: SparkSession,
    states: DataFrame,
    state_path: str,
    group_cols: list[str],
    batch_id: int | None = None,
) -> None:
    """Merge a batch's agg states into the persisted state table with an
    atomic directory swap (write tmp -> rename). Associativity of the
    state quartet makes any merge order exact. When ``batch_id`` is given,
    the ``_last_batch`` watermark is stamped into the tmp directory BEFORE
    the swap, so state and watermark commit as one atomic unit (the module
    docstring's crash-window table relies on this ordering). When
    ``batch_id`` is None (an out-of-band merge, e.g. a backfill folded in
    outside the stream), the EXISTING watermark is carried into the tmp
    directory unchanged — an out-of-band merge must not reset replay
    protection to -1, or a later foreachBatch replay would double-merge."""
    import glob as _glob

    _recover_swap_state(state_path)
    exists = bool(
        _glob.glob(os.path.join(state_path, "**", "*.parquet"), recursive=True)
    )
    tmp = state_path.rstrip("/") + "__tmp_swap"
    if not exists:
        # first write goes through the same tmp-then-rename door so even the
        # initial state + watermark land atomically
        write_parquet(states, tmp)
        if batch_id is not None:
            _write_watermark_into(tmp, batch_id)
        if os.path.exists(state_path):
            shutil.rmtree(state_path)  # parquet-less husk from a dead run
        os.rename(tmp, state_path)
        return
    current = spark.read.parquet(state_path)
    merged = merge_agg_states([current, states], group_cols)
    write_parquet(merged, tmp)
    if batch_id is not None:
        _write_watermark_into(tmp, batch_id)
    else:
        # out-of-band merge: preserve the stream's replay watermark
        prev = _read_watermark(state_path)
        if prev >= 0:
            _write_watermark_into(tmp, prev)
    old = state_path.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(state_path, old)
    os.rename(tmp, state_path)
    shutil.rmtree(old)


def incremental_rollup_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType | str,
    group_cols: list[str],
    value_col: str,
    state_path: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    path_glob: str | None = None,
) -> None:
    """Drain newly-arrived files (Trigger.AvailableNow, checkpoint = the
    processed-file ledger) and fold each batch into the rollup state table.

    Exactly-once across RETRIES, not just re-runs: the ``_last_batch``
    watermark inside the state directory commits atomically WITH the swap
    (written into the tmp dir before the rename), so a replayed batch id
    merges zero times, not twice — and a crash at any point of the swap is
    repaired by ``_recover_swap_state`` at sink entry (see the module
    docstring's crash-window table). Query the result by finalizing the
    states (mean = st_sum / st_count, etc.).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _recover_swap_state(state_path)  # roll a torn swap forward/back first
        if _read_watermark(state_path) >= batch_id:
            return  # replayed batch: already merged
        states = partial_agg_states(batch_df, group_cols, value_col)
        merge_states_into(spark, states, state_path, group_cols, batch_id=batch_id)

    process_available_files(
        spark,
        source_dir,
        schema,
        transform=lambda df: df,
        sink_fn=sink,
        checkpoint_dir=checkpoint_dir,
        fmt=fmt,
        path_glob=path_glob,
    )
