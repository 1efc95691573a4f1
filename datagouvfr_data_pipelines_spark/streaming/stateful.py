"""Custom stateful streaming operator (SURVEY §2.9 note: Spark's
``applyInPandasWithState`` is the engine's tool for operators the built-in
windowed aggregations can't express).

The reference has no true stateful streaming (everything is daily
micro-batch), but its session-id computation (W1) becomes genuinely stateful
once run continuously: a session must stay open across micro-batches. This
module implements that: per-key session tracking whose state (last event
time, session counter) survives between batches, with a GroupStateTimeout to
close idle sessions.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = "user_id long, session_id long, n_events long, last_ts timestamp"
SESSION_STATE_SCHEMA = "session_id long, last_us long, n_events long"


def make_session_updater(gap_seconds: int = 1800):
    """Build the per-key state-update function used by ``sessionize_stream``.

    Exposed at module level so the timeout path (state.hasTimedOut — an
    invocation with NO data rows) is unit-testable against a fake
    GroupState without driving a real streaming query.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # timeout invocation: no data rows (pdfs is empty — concatenating
            # would raise), the session is closed by removing its state so an
            # idle key stops accumulating store entries. Nothing to emit: the
            # final per-session row already went out with its last batch.
            state.remove()
            return
        if state.exists:
            session_id, last_us, n_events = state.get
        else:
            session_id, last_us, n_events = 0, None, 0
        rows = []
        batch = pd.concat(list(pdfs)).sort_values("ts")
        for ts in batch["ts"]:
            us = int(ts.value // 1000)  # pandas ns -> µs
            if last_us is None or us - last_us > gap_seconds * 1_000_000:
                session_id += 1
                n_events = 0
            n_events += 1
            last_us = us
            rows.append((user_id, session_id, n_events, ts))
        state.update((session_id, last_us, n_events))
        state.setTimeoutDuration(gap_seconds * 1000)
        # emit the final per-session row for this batch
        out = (
            pd.DataFrame(rows, columns=["user_id", "session_id", "n_events", "last_ts"])
            .groupby(["user_id", "session_id"], as_index=False)
            .agg(n_events=("n_events", "max"), last_ts=("last_ts", "max"))
        )
        yield out[["user_id", "session_id", "n_events", "last_ts"]]

    return update


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Continuous sessionization over a streaming frame keyed by user_id.

    State per user: (current session id, last event micros, event count).
    A batch's events extend the current session or open a new one when the
    gap exceeds ``gap_seconds``; output is one row per (user, session seen
    in this batch) with updated counts. Idle keys are reaped: on a
    ProcessingTimeTimeout firing, the state is removed. Use on a stream:

        events.readStream... -> sessionize_stream(df) -> writeStream
    """
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_updater(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
