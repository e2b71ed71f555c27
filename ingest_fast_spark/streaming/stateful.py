"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState`` (SURVEY.md §2.7 — the reference's per-file
in-heap accumulator maps, reference lib/ingest.js:102-103, generalized to
unbounded keyed state with Spark-managed checkpointing).

Pattern notes for 100 TB streams:
  * state is partitioned by the groupBy key — one state row per user,
    stored in the executor state store (RocksDB in production configs);
  * each micro-batch delivers only that batch's rows per key; the handler
    folds them into state and emits the updated aggregate (update-mode
    semantics);
  * Arrow-batched: the handler sees pandas DataFrames, never Python rows.
"""

# NOTE: no `from __future__ import annotations` — pandas type hints are
# resolved at runtime by the Arrow serializer.

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update_user_state(key, pdf_iter, state: GroupState):
    """Fold this batch's rows for one user into running (count, sum)."""
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running (n_events, sum_value) with keyed state.

    Emits one updated row per user per micro-batch; with a single
    AvailableNow batch the output equals the batch
    ``GROUP BY user_id`` aggregate exactly (that equivalence is the
    oracle check).
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithState (the arbitrary-state API successor) -----------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class UserStatsProcessor(StatefulProcessor):
    """Per-user running (n_events, sum_value, max_value) via
    ``transformWithStateInPandas`` — the arbitrary-state API that succeeds
    applyInPandasWithState: named state variables (value/list/map), state
    TTL, and timers, instead of one opaque state tuple. This processor
    keeps one ValueState row per user; the shape mirrors
    ``user_running_stats`` so both APIs are covered side by side."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState(
            "stats", "n_events long, sum_value double, max_value double"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        if self._stats.exists():
            n, s, mx = self._stats.get()
        else:
            n, s, mx = 0, 0.0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
            mx = max(mx, float(pdf["value"].max()))
        self._stats.update((n, s, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(s, 2)],
                "max_value": [round(mx, 2)],
            }
        )

    def close(self) -> None:
        pass


def user_running_stats_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of ``user_running_stats`` (same
    single-batch == batch-GROUP-BY equivalence).

    NOT registered in queries(): the transformWithState Python state
    server requires a working ``google.protobuf`` at STREAM RUNTIME,
    which this container lacks — the operator is import-clean and covered
    by a skip-gated test (tests/test_streaming.py) so environments with
    protobuf exercise it."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStatsProcessor(),
            outputStructType="user_id long, n_events long, sum_value double, max_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


# --- Event-time timers: session close-out on expiry --------------------------

_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap, microseconds

SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _close_user_sessions(key, pdf_iter, state: GroupState):
    """Emit a (user, session) row when 30 minutes of event-time pass with
    no activity — EITHER because a later in-batch event exceeded the gap,
    OR because the EVENT-TIME TIMER fired (watermark passed last+gap with
    no new data). State holds only the one open session per user."""
    import pandas as pd

    closed = []
    if state.hasTimedOut:
        start, last, n = state.get
        closed.append((key[0], start, last, n))
        state.remove()
    else:
        pdfs = [p for p in pdf_iter if len(p)]
        ts_us = (
            pd.concat(pdfs, ignore_index=True)["ts"].astype("int64").sort_values()
            // 1000
        )
        start, last, n = state.get if state.exists else (None, None, 0)
        for t in ts_us:
            t = int(t)
            if last is None:
                start, last, n = t, t, 1
            elif t - last > _GAP_US:
                closed.append((key[0], start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        state.setTimeoutTimestamp((last + _GAP_US) // 1000)  # ms epoch
    yield pd.DataFrame(
        closed, columns=["user_id", "start_us", "end_us", "n_events"]
    )


def session_close_stream(events: DataFrame) -> DataFrame:
    """Timer-driven sessionization: closed sessions stream out as soon as
    the watermark passes last_event + gap — the push-based twin of the
    batch gaps-and-islands ``sessionize``. The final no-data micro-batch
    fires the remaining timers, so under AvailableNow every session whose
    timeout precedes max(ts) is emitted; still-open sessions stay in
    state (the batch oracle applies the same cutoff)."""
    from pyspark.sql import functions as F

    closed = (
        events.select("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _close_user_sessions,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return closed.select(
        "user_id",
        F.timestamp_micros(F.col("start_us")).cast("timestamp_ntz").alias("session_start"),
        F.timestamp_micros(F.col("end_us")).cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )
