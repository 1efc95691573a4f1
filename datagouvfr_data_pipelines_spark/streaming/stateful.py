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


EWMA_OUTPUT_SCHEMA = (
    "key string, ts timestamp, value double, baseline double, z double"
)
EWMA_STATE_SCHEMA = "ewma double, ewvar double, n long"


def make_ewma_alerter(
    alpha: float = 0.1, z_threshold: float = 3.0, warmup: int = 10
):
    """Per-key EWMA drift detector update function (module-level so both
    the data and timeout paths unit-test against a fake GroupState).

    State per key is three scalars — (ewma, ew-variance, n) — so the store
    stays O(keys) regardless of stream length; this is the streaming twin
    of the batch w18_anomaly_days monitor. Each value is scored against
    the PRE-update baseline (an outlier must not first drag the baseline
    toward itself), then folded in with exponential decay:
    ``ewma += a*d; ewvar = (1-a)*(ewvar + a*d^2)`` (Welford-style EW
    update, public method — Roberts 1959 EWMA control charts). Alerts emit
    only after ``warmup`` observations. Idle keys are reaped on timeout.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ewma, ewvar, n = state.get
        else:
            ewma, ewvar, n = 0.0, 0.0, 0
        rows = []
        batch = pd.concat(list(pdfs)).sort_values("ts")
        for ts, v in zip(batch["ts"], batch["value"]):
            v = float(v)
            if n >= warmup and ewvar > 0.0:
                z = (v - ewma) / (ewvar**0.5)
                if abs(z) > z_threshold:
                    rows.append((k, ts, v, ewma, z))
            if n == 0:
                ewma = v
            else:
                delta = v - ewma
                ewma += alpha * delta
                ewvar = (1.0 - alpha) * (ewvar + alpha * delta * delta)
            n += 1
        state.update((ewma, ewvar, n))
        state.setTimeoutDuration(3600 * 1000)
        if rows:
            yield pd.DataFrame(
                rows, columns=["key", "ts", "value", "baseline", "z"]
            )

    return update


def ewma_alert_stream(
    values: DataFrame,
    alpha: float = 0.1,
    z_threshold: float = 3.0,
    warmup: int = 10,
) -> DataFrame:
    """Continuous per-key drift alerts over a stream with columns
    (key string, ts timestamp, value double) — emits only the anomalous
    observations, scored against the exponentially-decayed baseline held
    in the state store. Rename upstream columns to this contract (same
    convention as sessionize_stream)."""
    return values.groupBy("key").applyInPandasWithState(
        make_ewma_alerter(alpha, z_threshold, warmup),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


RUNNING_TOTALS_OUTPUT = "key string, n_events long, total double"


def make_running_totals_processor(ttl_ms: int | None = None):
    """StatefulProcessor class for ``running_totals_stream`` (Spark 4's
    transformWithState API — typed per-key state variables with optional
    TTL, the successor to applyInPandasWithState's single state tuple).

    State per key is (n_events, total): two scalars, O(keys) store. TTL
    (when set) lets the state store expire idle keys without an explicit
    timeout handler — eviction is a store policy, not operator code.
    Built lazily inside a factory so importing this module never requires
    the streaming-state runtime.

    Dependency gate: transformWithState's state protocol speaks protobuf
    (``google.protobuf``), which pyspark does not bundle — environments
    without it should use ``sessionize_stream`` / ``ewma_alert_stream``
    (applyInPandasWithState needs only Arrow). The unit test skips
    accordingly.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "totals", "n_events long, total double", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (self._st.get() or (0, 0.0)) if self._st.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._st.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def running_totals_stream(
    values: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Continuous per-key (count, sum) over a stream with columns
    (key string, value double) via transformWithStateInPandas — emits an
    updated snapshot row per key per micro-batch. The Update output mode
    pairs with an upsert sink (ST3).

    Runtime requirements: ``google.protobuf`` (the real package, or the
    vendored fallback via ``vendor.ensure_protobuf()`` activated before
    the session starts) for the worker-side state protocol, and the
    RocksDB state store —
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
    — because transformWithState keeps multiple column families, which
    the default HDFS-backed store does not support (rocksdbjni ships in
    pyspark's jars; this is also the store you want at 100 TB state)."""
    return values.groupBy("key").transformWithStateInPandas(
        make_running_totals_processor(ttl_ms),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
