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
    StringType,
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


# --- Rolling z-score anomaly detection (streaming twin) ---------------------

_Z_WINDOW = 20
_Z_MIN_PRIOR = 8
_Z_THR = 3.0

from pyspark.sql.types import ArrayType, TimestampNTZType  # noqa: E402

ANOMALY_STATE = StructType(
    [StructField("buf", ArrayType(DoubleType()))]
)

ANOMALY_RAW_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)


def _anomaly_scan(buf, vals):
    """Vectorized rolling z-score over one user's ordered values: returns
    ``(flagged_indices, rounded_z_per_flag, new_buf)``.

    BIT-IDENTICAL to the sequential reference loop (pinned by
    tests/test_anomaly_vectorized.py) for all finite-variance inputs;
    the one divergence is |value − mean| > ~1.3e154, where the old
    loop's ``(x - m) ** 2`` raised OverflowError (killing the stream)
    and this scan carries inf through without flagging (see the
    errstate note below). The per-row Python loop was
    ~5 µs/row of pure interpreter cost, the guide-§4 boundary tax at
    billions of events. Exactness is by construction, not accident:

    * window sums accumulate COLUMN BY COLUMN, j = 0..W-1 — the same
      left-to-right float-addition order as Python's ``sum()`` over the
      prior list, with 0.0 padding standing in for the missing leading
      elements (0.0 + x == x exactly, and the padded variance terms are
      masked to 0.0 before they join the accumulation);
    * the final 6-dp rounding of candidate rows uses Python ``round()``,
      not ``np.round`` (they differ at ULP boundaries); candidates are
      pre-filtered at |z| > thr − 1e-6, a margin wider than any rounding
      movement, so no flagged row can be missed.
    """
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    W = _Z_WINDOW
    nb = len(buf)
    series = np.concatenate([np.asarray(buf, dtype=np.float64), vals])
    n = series.size
    new_buf = [float(x) for x in series[-W:]]
    if n == nb:
        return [], [], new_buf
    padded = np.concatenate([np.zeros(W), series])
    win = sliding_window_view(padded, W)[nb:n]  # row i: prior of vals[i]
    pos = np.arange(nb, n)
    c = np.minimum(pos, W)  # prior count per row
    acc = np.zeros(n - nb)
    for j in range(W):
        acc = acc + win[:, j]
    # over="ignore": for |value - mean| > ~1.3e154 the t*t below overflows
    # to inf — without the flag every such micro-batch logs a
    # RuntimeWarning on the executor. This is also the one documented
    # divergence from the replaced per-row loop: (x - m) ** 2 in pure
    # Python RAISED OverflowError (killing the stream), the vectorized
    # scan carries inf through (s = inf ⇒ z = 0-ish/never flagged) and
    # keeps running — more robust, not bit-identical at that extreme.
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        m = acc / c
        var = np.zeros(n - nb)
        for j in range(W):
            t = win[:, j] - m
            t = t * t
            t[pos < W - j] = 0.0  # padded slot: contributes nothing
            var = var + t
        s = np.sqrt(var / (c - 1))
        z = (vals - m) / s
    cand = (c >= _Z_MIN_PRIOR) & (s > 0) & (np.abs(z) > _Z_THR - 1e-6)
    idx, zr = [], []
    for i in np.nonzero(cand)[0]:
        r = round(float(z[i]), 6)
        if abs(r) > _Z_THR:
            idx.append(int(i))
            zr.append(r)
    return idx, zr, new_buf


def _update_anomaly_state(key, pdf_iter, state: GroupState):
    """Walk this batch's events for one user in (ts, event_id) order,
    z-scoring each value against the trailing ring buffer (carried in
    state across micro-batches), and emit only the flagged rows."""
    import pandas as pd

    buf = list(state.get[0]) if state.exists else []
    out = []
    pdfs = [p for p in pdf_iter if len(p)]
    if pdfs:
        pdf = pd.concat(pdfs, ignore_index=True)
        pdf = pdf[pdf["value"].notna() & pdf["ts"].notna()]
        pdf = pdf.assign(ts_us=pdf["ts"].astype("int64") // 1000).sort_values(
            ["ts_us", "event_id"], kind="mergesort"
        )
        vals = pdf["value"].to_numpy(dtype="float64")
        idx, zs, buf = _anomaly_scan(buf, vals)
        if idx:
            uids = pdf["user_id"].to_numpy()
            eids = pdf["event_id"].to_numpy()
            tss = pdf["ts_us"].to_numpy()
            for i, z in zip(idx, zs):
                # A NULL event_id arrives as NaN; int(NaN) raises and
                # would kill the stream. The batch twin emits such rows
                # with NULL event_id — do the same here.
                eid = None if pd.isna(eids[i]) else int(eids[i])
                out.append(
                    (int(uids[i]), eid, int(tss[i]), float(vals[i]), z)
                )
    state.update((buf,))
    yield pd.DataFrame(
        out, columns=["user_id", "event_id", "ts_us", "value", "zscore"]
    )


def anomaly_zscore_stream(events: DataFrame) -> DataFrame:
    """Streaming rolling z-score anomaly detection — the push-based twin
    of the batch ``events_anomaly_zscore`` window query: per-user state is
    the trailing 20-value ring buffer (O(20) doubles per key in the state
    store), each event is scored against its own user's history the
    moment it arrives, and only ±3σ rows (≥8 prior observations) are
    emitted downstream. Under AvailableNow over a static directory the
    single micro-batch sees each user's full history in event order, so
    the emitted set equals the batch window query exactly — which is the
    registered oracle."""
    from pyspark.sql import functions as F

    flagged = (
        events.filter(F.col("user_id").isNotNull())
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_anomaly_state,
            outputStructType=ANOMALY_RAW_OUTPUT,
            stateStructType=ANOMALY_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.col("ts_us")).cast("timestamp_ntz").alias("ts"),
        "value",
        "zscore",
    )


# --- Streaming Misra-Gries heavy hitters -------------------------------------

_MG_K = 8

MG_STATE = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)

MG_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("est_count", LongType()),
        StructField("n_processed", LongType()),
    ]
)


def _update_mg_state(key, pdf_iter, state: GroupState):
    """Fold one micro-batch of user_ids (in deterministic (ts, event_id)
    order) into the k-counter Misra-Gries summary carried in state, then
    emit the full tracked set with the rows-processed total. The classic
    guarantee holds at every prefix: est <= true and
    true - est <= n/(k+1) (Misra & Gries 1982, "Finding repeated
    elements")."""
    import pandas as pd

    if state.exists:
        items, counts, n = state.get
        mg = dict(zip(items, counts))
    else:
        mg, n = {}, 0
    pdfs = [p for p in pdf_iter if len(p)]
    if pdfs:
        pdf = pd.concat(pdfs, ignore_index=True)
        pdf = pdf.assign(ts_us=pdf["ts"].astype("int64") // 1000).sort_values(
            ["ts_us", "event_id"], kind="mergesort"
        )
        for u in pdf["user_id"].astype("int64"):
            u = int(u)
            n += 1
            if u in mg:
                mg[u] += 1
            elif len(mg) < _MG_K:
                mg[u] = 1
            else:
                for it in list(mg):
                    mg[it] -= 1
                    if mg[it] == 0:
                        del mg[it]
    state.update((list(mg.keys()), list(mg.values()), n))
    yield pd.DataFrame(
        {
            "event_type": key[0],
            "user_id": list(mg.keys()),
            "est_count": list(mg.values()),
            "n_processed": n,
        }
    )


def mg_heavy_hitters_stream(events: DataFrame, k: int = _MG_K) -> DataFrame:
    """Streaming Misra-Gries top-k per event_type: state is exactly k
    (item, count) counters per key — CONSTANT memory forever, the whole
    point of the sketch (contrast stream_cms_windowed's d×w counters).
    Emits the tracked set after each micro-batch (update mode)."""
    assert k == _MG_K, "state layout is pinned at module scope"
    from pyspark.sql import functions as F

    return (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("event_type", "user_id", "ts", "event_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_mg_state,
            outputStructType=MG_OUTPUT,
            stateStructType=MG_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
