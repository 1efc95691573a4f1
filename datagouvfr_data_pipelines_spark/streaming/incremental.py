"""Incrementally-maintained rollup: streaming file drain -> mergeable
partial-aggregate states -> idempotent state-table merge.

This closes the loop between the streaming veneer (checkpoint-as-ledger
file drain, availablenow.py) and incremental materialization
(operators/aggregates.py:partial_agg_states): each drained batch is reduced
to per-group algebraic states and merged into a persisted state table, so
the rollup over ALL history is maintained without ever rescanning it —
the 100 TB answer to the reference's rebuild-the-table-nightly habit.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from datagouvfr_data_pipelines_spark.io.writers import write_parquet
from datagouvfr_data_pipelines_spark.operators.aggregates import (
    merge_agg_states,
    partial_agg_states,
)
from datagouvfr_data_pipelines_spark.streaming.availablenow import (
    process_available_files,
)


def merge_states_into(
    spark: SparkSession,
    states: DataFrame,
    state_path: str,
    group_cols: list[str],
) -> None:
    """Merge a batch's agg states into the persisted state table with an
    atomic directory swap (write tmp -> rename). Associativity of the
    state quartet makes any merge order exact."""
    import glob as _glob

    exists = bool(
        _glob.glob(os.path.join(state_path, "**", "*.parquet"), recursive=True)
    )
    if not exists:
        write_parquet(states, state_path)
        return
    current = spark.read.parquet(state_path)
    merged = merge_agg_states([current, states], group_cols)
    tmp = state_path.rstrip("/") + "__tmp_swap"
    write_parquet(merged, tmp)
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

    Exactly-once across RETRIES, not just re-runs: foreachBatch can replay
    a batch whose sink ran but whose checkpoint commit didn't, so the state
    directory carries a ``_last_batch`` watermark written AFTER the atomic
    swap — a replayed batch id merges zero times, not twice. Query the
    result by finalizing the states (mean = st_sum / st_count, etc.).
    """
    # the watermark lives BESIDE the state dir, not inside it — the atomic
    # swap replaces the directory wholesale and must never take the
    # watermark with it
    marker = state_path.rstrip("/") + "__last_batch"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip() or "-1") >= batch_id:
                    return  # replayed batch: already merged
        states = partial_agg_states(batch_df, group_cols, value_col)
        merge_states_into(spark, states, state_path, group_cols)
        with open(marker, "w") as fh:
            fh.write(str(batch_id))

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
