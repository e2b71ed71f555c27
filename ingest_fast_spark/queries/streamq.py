"""Structured Streaming queries, registered in the driver's correctness
gate. Each runs a real streaming query (file-source readStream →
watermarked stateful aggregation → memory sink, Trigger.AvailableNow) and
returns the finished result table; since AvailableNow over a static
directory processes all input, the result must equal the equivalent batch
SQL — which is exactly what the DuckDB oracle states.

This is the strongest correctness check a streaming operator can get:
not "it ran", but "the streaming state machine converged to the batch
answer".
"""

from __future__ import annotations

import itertools

from ..streaming import events as SE
from ..streaming import stateful as ST
from . import register

_SEQ = itertools.count()


def _run(df, base_name: str, output_mode: str = "complete", width: int | None = None):
    # Unique sink name per invocation: queries may run several times in one
    # session (selfcheck, driver, tests) and memory-sink names are global.
    # ``width`` sizes the state-store count to the input (JVM-side
    # stateful operators only — see SE.stream_state_width); Python
    # stateful handlers keep full parallelism.
    return SE.run_available_now(
        df, f"{base_name}_{next(_SEQ)}", output_mode, state_partitions=width
    )


@register(
    "stream_windowed_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
           event_type,
           COUNT(*)              AS n_events,
           ROUND(SUM(value), 2)  AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_windowed_counts(spark, sf_dir):
    """Watermarked tumbling-window streaming agg == batch time_bucket."""
    return _run(
        SE.windowed_counts(SE.stream_events(spark, sf_dir)),
        "q_win",
        width=SE.stream_state_width(spark, sf_dir),
    )


@register(
    "stream_sliding_counts",
    oracle="""
    WITH cand AS (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
             AS win_start
      FROM events
    )
    SELECT win_start, win_start + INTERVAL '1 hour' AS win_end,
           COUNT(*) AS n_events
    FROM cand GROUP BY 1
    """,
)
def stream_sliding_counts(spark, sf_dir):
    """1h/30m sliding windows: every event lands in exactly two windows
    (the two 30-min-aligned starts covering its timestamp)."""
    return _run(
        SE.sliding_window_counts(SE.stream_events(spark, sf_dir)),
        "q_slide",
        width=SE.stream_state_width(spark, sf_dir),
    )


@register(
    "stream_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts)                          AS session_start,
           MAX(ts) + INTERVAL '30 minutes'  AS session_end,
           COUNT(*)                         AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark, sf_dir):
    """Streaming session_window (30-min gap). Session semantics: windows
    are [first_ts, last_ts + gap) and merge only on OVERLAP, so a gap of
    exactly 30min starts a NEW session (hence `>=` in the oracle; the
    batch gaps-and-islands `sessionize` uses `>` — documented divergence
    of the two operators' gap-boundary conventions)."""
    return _run(
        SE.session_window_counts(SE.stream_events(spark, sf_dir), gap="30 minutes"),
        "q_sess",
        # width=bytes-adaptive measured SLOWER here (1.45 vs 1.25 s): the
        # session-merge operator's per-key sort work outweighs the
        # store-count overhead — keep full parallelism.
    )


@register(
    "stream_user_state",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def stream_user_state(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user running
    aggregates. AvailableNow over a static dir = one micro-batch, so each
    user's final emitted state equals the batch GROUP BY."""
    return _run(
        ST.user_running_stats(SE.stream_events(spark, sf_dir)),
        "q_state",
        output_mode="update",
    )


@register(
    "stream_interval_join",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS click_id, user_id, ts AS c_ts
               FROM events WHERE event_type = 'click')
    SELECT p.purchase_id, c.click_id, p.user_id, p.p_ts, c.c_ts
    FROM p JOIN c ON p.user_id = c.user_id
               AND c.c_ts BETWEEN p.p_ts - INTERVAL 1 HOUR AND p.p_ts
    """,
)
def stream_interval_join(spark, sf_dir):
    """Stream-stream inner join (purchase × preceding-hour clicks) with
    watermarks on both sides; AvailableNow result equals the batch
    interval join."""
    return _run(
        SE.stream_stream_interval_join(SE.stream_events(spark, sf_dir)),
        "q_ssjoin",
        output_mode="append",
        width=SE.stream_state_width(spark, sf_dir),
    )


@register(
    "stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup(spark, sf_dir):
    """Streaming deduplication: dropDuplicates on the keyed state — the
    exactly-once ingest guard (state bounded by watermark in production
    via dropDuplicatesWithinWatermark; unbounded here because AvailableNow
    input is finite)."""
    stream = SE.stream_events(spark, sf_dir).select("user_id", "event_type")
    return _run(stream.dropDuplicates(["user_id", "event_type"]), "q_dedup",
                output_mode="append",
                width=SE.stream_state_width(spark, sf_dir))


@register(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def stream_static_join(spark, sf_dir):
    """Stream–static enrichment join: the unbounded event stream joins a
    static dimension (broadcast per micro-batch — stateless, no watermark
    needed on the static side), then a running aggregate. The standard
    'enrich events with reference data' shape; converges to the batch
    join+agg."""
    from pyspark.sql import functions as F

    from ..catalog import load_table

    stream = SE.stream_events(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    joined = stream.join(
        F.broadcast(dim), stream.user_id == dim.c_custkey
    )
    agg = joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return _run(agg, "q_static_join", output_mode="complete",
                width=SE.stream_state_width(spark, sf_dir))


@register(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_within_watermark(spark, sf_dir):
    """Watermark-bounded streaming dedup: dropDuplicatesWithinWatermark
    expires each key's state once the watermark passes it — the
    production form of stream_dedup whose state stays O(keys inside the
    watermark window) instead of growing forever. The watermark here
    spans the whole (time-shuffled) test input so every duplicate is
    still caught and the converged result equals batch DISTINCT."""
    stream = SE.stream_events(spark, sf_dir).select("ts", "user_id", "event_type")
    deduped = (
        stream.withWatermark("ts", "3650 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run(deduped, "q_dedup_wm", output_mode="append",
                width=SE.stream_state_width(spark, sf_dir))


@register(
    "stream_hourly_rollup",
    oracle="""
    WITH q AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS qb, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    cutoff AS (SELECT max(ts) AS mx FROM events)
    SELECT time_bucket(INTERVAL '1 hour', qb) AS bucket,
           CAST(MAX(n) AS BIGINT) AS peak_quarter,
           CAST(SUM(n) AS BIGINT) AS n_events
    FROM q, cutoff
    GROUP BY 1, mx
    HAVING bucket + INTERVAL '1 hour' <= mx
    """,
)
def stream_hourly_rollup(spark, sf_dir):
    """CHAINED stateful streaming aggregation (two groupBys in one query,
    Spark 3.4+ multiple-stateful-operator support): 15-min tumbling counts
    rolled up to hourly totals + peak quarter. Append mode — an hour emits
    only once the watermark passes its end, so the batch oracle applies
    the same end-of-input cutoff (hours closing after max(ts) stay in
    state)."""
    return _run(
        SE.hourly_rollup_of_quarters(SE.stream_events(spark, sf_dir)),
        "q_chain",
        output_mode="append",
        width=SE.stream_state_width(spark, sf_dir),
    )


@register(
    "stream_session_timeout",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    mx AS (SELECT max(ts) AS m FROM events)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sess, mx
    GROUP BY user_id, sid, m
    HAVING MAX(ts) + INTERVAL 30 MINUTE < m
    """,
)
def stream_session_timeout(spark, sf_dir):
    """EVENT-TIME TIMERS (GroupStateTimeout.EventTimeTimeout): per-user
    sessions close and stream out when the watermark passes
    last_event + 30min — state expires by timer, not by a later event.
    Converges to the batch gaps-and-islands sessionize under the same
    cutoff (open sessions at end-of-input stay in state); the oracle
    states exactly that."""
    return _run(
        ST.session_close_stream(SE.stream_events(spark, sf_dir)),
        "q_timer",
        output_mode="append",
    )


def _anomaly_oracle() -> str:
    # The streaming twin must converge to the BATCH window query —
    # literally the same oracle SQL events_anomaly_zscore registered
    # (queries/pipelineq.py), fetched from the registry so the two can
    # never drift apart.
    from . import ORACLES

    return ORACLES["events_anomaly_zscore"]


@register("stream_anomaly_zscore", oracle=_anomaly_oracle())
def stream_anomaly_zscore(spark, sf_dir):
    """Streaming per-user rolling z-score anomaly detection
    (applyInPandasWithState ring-buffer state) == the batch window query."""
    return _run(
        ST.anomaly_zscore_stream(SE.stream_events(spark, sf_dir)),
        "q_anomaly",
        output_mode="append",
    )


@register(
    "stream_quality_gate",
    oracle=None,  # replaced below — reuses the batch gate's oracle verbatim
)
def stream_quality_gate(spark, sf_dir):
    """Streaming quarantine gate — the batch gate's Column expressions
    applied unchanged to a document readStream (stateless map-only
    operator: no watermark, no state store; every micro-batch is gated
    independently, which is exactly how a crawl-ingest pipeline runs the
    gate in practice). AvailableNow over the static table must therefore
    equal the batch `quality_quarantine` output — the registered oracle
    IS the batch gate's, fetched from the registry so the two can never
    drift."""
    import os as _os

    from pyspark.sql import functions as F

    from ..session import apply_runtime_confs
    from .pipelineq import quarantine_reasons

    apply_runtime_confs(spark)
    from ..catalog import parquet_schema

    schema = parquet_schema(spark, _os.path.join(sf_dir, "documents.parquet"))
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents*.parquet")
        .load(sf_dir)
    )
    # The file-source stream is ONE task per file, and this query is all
    # map-side expression work — spread it when the watched file set is
    # narrower than the cluster (no-op at production file counts; the
    # stateful stream queries measured WORSE with this extra exchange and
    # keep their state-store shuffle as the only one — A/B in
    # OPTIMIZATION_r09.md).
    raw = SE.ensure_stream_parallelism(raw, sf_dir, "documents*.parquet")
    reasons = quarantine_reasons(F.col("text"), F.col("n_chars"))
    gated = raw.filter(F.col("doc_id").isNotNull()).select(
        "doc_id",
        (F.size(reasons) == 0).alias("passed"),
        # Same scalar-only projection as the batch gate (the shared oracle
        # emits the '|'-joined sorted string; array cells break the
        # driver's canonicalizer).
        F.array_join(F.array_sort(reasons), "|").alias("reasons"),
    )
    return _run(gated, "q_gate", output_mode="append")


def _stream_hll_oracle() -> str:
    from ..operators.sketches import hll_sql

    return f"""
    WITH ev AS (
      SELECT CAST(event_id AS VARCHAR) AS item FROM events
      WHERE event_id IS NOT NULL
    ),
    {hll_sql('item', 'FROM ev')}
    SELECT r.register, r.rho, e.est_micro
    FROM hll_regs r CROSS JOIN hll_est e
    """


@register("stream_hll_registers", oracle=_stream_hll_oracle())
def stream_hll_registers(spark, sf_dir):
    """Streaming HyperLogLog: the streaming aggregation state IS the
    register file — route each event id to its register map-side, then
    ``groupBy(register).max(rho)`` in complete mode maintains the HLL
    incrementally across micro-batches (register union = MAX is exactly
    Spark's streaming-agg state merge, so no custom stateful processor is
    needed and the state is bounded at m=256 rows FOREVER, whatever the
    stream's volume). The running distinct-count over an unbounded
    ingest, in one declarative line.

    AvailableNow over the static dir converges to the batch register
    file, so the oracle is the SAME DuckDB sketch rebuild as the batch
    sketch_hll_report; the dense fill + estimate run batch-side on the
    256-row finished table."""
    from pyspark.sql import functions as F

    from ..operators import sketches as K
    from ..operators.dedup import portable_hash60

    ev = SE.stream_events(spark, sf_dir).filter(F.col("event_id").isNotNull())
    h = portable_hash60(F.col("event_id").cast("string"))
    routed = ev.select(
        (h % K.HLL_M).alias("register"), F.shiftright(h, K.HLL_P).alias("rest")
    )
    regs = (
        routed.select("register", K.hll_rho(F.col("rest")).alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )
    done = _run(regs, "q_hll", output_mode="complete",
                width=SE.stream_state_width(spark, sf_dir))
    spine = spark.range(K.HLL_M).select(F.col("id").alias("register"))
    dense = spine.join(done, "register", "left").select(
        "register", F.coalesce("rho", F.lit(0)).cast("int").alias("rho")
    )
    est = K.hll_estimate_micro(dense)
    return dense.crossJoin(F.broadcast(est))


def _stream_hll_windowed_oracle() -> str:
    from ..operators.dedup import portable_hash60_sql
    from ..operators.sketches import HLL_EST_NUM, HLL_M, HLL_MAXRHO, HLL_P

    h60 = portable_hash60_sql("item")
    return f"""
    WITH ev AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             CAST(user_id AS VARCHAR) AS item, user_id
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    rr AS (
      SELECT window_start, h % {HLL_M} AS register, h >> {HLL_P} AS rest
      FROM (SELECT window_start, ({h60}) AS h FROM ev)
    ),
    mx AS (
      SELECT window_start, register,
             MAX(CASE WHEN rest = 0 THEN {HLL_MAXRHO}
                      ELSE bit_count((rest & (-rest)) - 1) + 1 END) AS rho
      FROM rr GROUP BY window_start, register
    ),
    per AS (
      SELECT window_start,
             CAST(COUNT(*) AS BIGINT) AS n_set,
             CAST(SUM(1::BIGINT << ({HLL_MAXRHO} - rho))
                  + ({HLL_M} - COUNT(*)) * (1::BIGINT << {HLL_MAXRHO})
                  AS BIGINT) AS s,
             CAST({HLL_M} - COUNT(*) AS BIGINT) AS v
      FROM mx GROUP BY window_start
    ),
    ex AS (
      SELECT window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM ev GROUP BY window_start
    )
    SELECT per.window_start, per.n_set, per.s, per.v,
           CAST(floor(
             CASE WHEN ({HLL_EST_NUM!r} / s) <= {2.5 * HLL_M!r} AND v > 0
                  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
                  ELSE {HLL_EST_NUM!r} / s END * 1000000.0 + 0.5) AS BIGINT)
             AS est_micro,
           ex.n_exact
    FROM per JOIN ex USING (window_start)
    """


@register("stream_hll_windowed", oracle=_stream_hll_windowed_oracle())
def stream_hll_windowed(spark, sf_dir):
    """Windowed streaming HyperLogLog — distinct users per hour ("DAU" at
    unbounded scale): the streaming aggregation keys on (window,
    register) and MAX-merges ranks, so per-window distinct-count state
    is bounded at m=256 rows per window FOREVER, and windows roll up
    independently (the sketch composes with time bucketing the way raw
    COUNT(DISTINCT) cannot — you can also union register files across
    windows for a rolling-period distinct count). Emits each window's
    sufficient statistics (n_set, scaled sum s, zero-register count v)
    plus the estimate in micro-units next to the exact per-window
    distinct count; AvailableNow converges to the batch register files,
    which the DuckDB oracle rebuilds identically. This corpus's per-hour
    user cardinality sits in the linear-counting regime — the correction
    branch runs in production-like conditions here."""
    from pyspark.sql import functions as F

    from ..operators import sketches as K
    from ..operators.dedup import portable_hash60

    ev = SE.stream_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    h = portable_hash60(F.col("user_id").cast("string"))
    routed = ev.select(
        F.col("ts"),
        (h % K.HLL_M).alias("register"),
        F.shiftright(h, K.HLL_P).alias("rest"),
    ).select(
        "ts", "register", K.hll_rho(F.col("rest")).alias("rho")
    )
    regs = routed.groupBy(F.window("ts", "1 hour").alias("w"), "register").agg(
        F.max("rho").alias("rho")
    )
    done = _run(regs, "q_hll_win", output_mode="complete",
                width=SE.stream_state_width(spark, sf_dir)).select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "register",
        "rho",
    )
    per = done.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n_set"),
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {K.HLL_MAXRHO} - rho)"))
            + (F.lit(K.HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << K.HLL_MAXRHO).cast("long")
        ).alias("s"),
        (F.lit(K.HLL_M) - F.count(F.lit(1))).cast("long").alias("v"),
    )
    raw = F.lit(K.HLL_EST_NUM) / F.col("s").cast("double")
    lc = F.lit(float(K.HLL_M)) * F.log(
        F.lit(float(K.HLL_M)) / F.col("v").cast("double")
    )
    est = F.when((raw <= F.lit(2.5 * K.HLL_M)) & (F.col("v") > 0), lc).otherwise(raw)
    from ..catalog import load_table

    ex = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            F.window("ts", "1 hour")["start"]
            .cast("timestamp_ntz")
            .alias("window_start")
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    )
    return per.join(ex, "window_start").select(
        "window_start",
        "n_set",
        "s",
        "v",
        F.floor(est * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("est_micro"),
        "n_exact",
    )


# Reuse the batch gate's oracle for the streaming twin (registered after
# the function so the registry key exists either way).
from . import ORACLES as _ORACLES  # noqa: E402

_ORACLES["stream_quality_gate"] = _ORACLES["quality_quarantine"]


def _stream_cms_windowed_oracle() -> str:
    from ..operators.dedup import _MINHASH_P, portable_hash60_sql
    from ..operators.sketches import CMS_W, _cms_fams

    fams = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_cms_fams()))
    h60 = portable_hash60_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH ev AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, user_id,
             (({h60}) % {_MINHASH_P}) AS h
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    fam(i, a, b) AS (VALUES {fams}),
    cells AS (
      SELECT window_start, fam.i,
             ((fam.a * ev.h + fam.b) % {_MINHASH_P}) % {CMS_W} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ev CROSS JOIN fam GROUP BY 1, 2, 3
    ),
    top AS (
      SELECT window_start, user_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
             MIN(h) AS h
      FROM ev GROUP BY window_start, user_id
      QUALIFY row_number() OVER (PARTITION BY window_start
                                 ORDER BY n_exact DESC, user_id) <= 3
    ),
    est AS (
      SELECT top.window_start, top.user_id, top.n_exact,
             MIN(cells.cnt) AS n_est
      FROM top CROSS JOIN fam
      JOIN cells ON cells.window_start = top.window_start AND cells.i = fam.i
       AND cells.bucket = ((fam.a * top.h + fam.b) % {_MINHASH_P}) % {CMS_W}
      GROUP BY top.window_start, top.user_id, top.n_exact
    )
    SELECT window_start, user_id, n_exact, n_est, n_est - n_exact AS overcount
    FROM est
    """


@register("stream_cms_windowed", oracle=_stream_cms_windowed_oracle())
def stream_cms_windowed(spark, sf_dir):
    """Windowed streaming Count-Min — per-hour hot-user frequency at
    bounded state: the streaming aggregation keys on (window, hash row,
    bucket), so per-window frequency state is capped at d×w = 4×256
    counters FOREVER however many users appear, and counters are
    SUM-mergeable across micro-batches because CMS is a linear sketch
    (the same mergeable-state argument as the HLL twin, for frequencies
    instead of cardinalities). AvailableNow converges the streaming
    counter table to the batch sketch, which the DuckDB oracle rebuilds
    identically; each window's 3 hottest users (by exact count) are then
    probed — est = min over the d rows — so the report shows the
    overcount the sketch actually incurs next to ground truth.

    Scale shape: map-side partial aggregation collapses the event stream
    to ≤ d×w cells per task before the exchange; the top-3 probe leg is
    a bounded row_number window per hour bucket; the probe join is on
    (window, row, bucket) — all bounded keys."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..catalog import load_table
    from ..operators.dedup import _MINHASH_P, portable_hash60
    from ..operators.sketches import CMS_D, cms_bucket

    ev = SE.stream_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    h = (portable_hash60(F.col("user_id").cast("string")) % _MINHASH_P).alias("h")
    cells_in = ev.select(F.col("ts"), h).select(
        "ts",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        cms_bucket(F.col("h"), i).alias("bucket"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("c"),
    )
    cells_stream = cells_in.groupBy(
        F.window("ts", "1 hour").alias("w"), "c.row_i", "c.bucket"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # NO bytes-adaptive width here: CMS state is windows × d × w cells
    # (~737k rows at sf0.1) — DECOUPLED from input bytes, and one store
    # serializing that snapshot measured 5.95 s vs 3.60 s at full
    # parallelism. State-heavy sketches keep one store per core.
    cells = _run(cells_stream, "q_cms_win", output_mode="complete").select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        F.col("row_i"),
        F.col("bucket"),
        "cnt",
    )
    ex = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.window("ts", "1 hour")["start"]
            .cast("timestamp_ntz")
            .alias("window_start"),
            "user_id",
        )
        .groupBy("window_start", "user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    wtop = Window.partitionBy("window_start").orderBy(
        F.desc("n_exact"), F.asc("user_id")
    )
    top = (
        ex.withColumn("_rn", F.row_number().over(wtop))
        .filter(F.col("_rn") <= 3)
        .drop("_rn")
        .withColumn(
            "h", portable_hash60(F.col("user_id").cast("string")) % _MINHASH_P
        )
    )
    probes = top.select(
        "window_start",
        "user_id",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        cms_bucket(F.col("h"), i).alias("bucket"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("p"),
    )
    est = (
        probes.join(
            cells,
            (probes["window_start"] == cells["window_start"])
            & (probes["p.row_i"] == cells["row_i"])
            & (probes["p.bucket"] == cells["bucket"]),
        )
        .groupBy(probes["window_start"], "user_id", "n_exact")
        .agg(F.min("cnt").alias("n_est"))
    )
    return est.select(
        "window_start",
        "user_id",
        "n_exact",
        "n_est",
        (F.col("n_est") - F.col("n_exact")).alias("overcount"),
    )


@register(
    "stream_topk_mg",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS stream_saw_all, TRUE AS n_tracked_ok,
           TRUE AS bounds_ok, TRUE AS frequent_covered
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def stream_topk_mg(spark, sf_dir):
    """Streaming Misra-Gries heavy hitters (k=8 counters per event_type,
    streaming/stateful.mg_heavy_hitters_stream), attested the
    ann_recall_floors way: the MG tracked set itself is a deterministic
    function of the arrival order (pinned by a unit test against a Python
    reference), so the REGISTERED output states what SQL can check —
    per event_type, the stream processed exactly COUNT(*) rows
    (stream_saw_all), tracked at most k items (n_tracked_ok), every
    estimate obeys the Misra-Gries guarantee 0 <= true - est <= n/(k+1)
    (bounds_ok), and every item with true count > n/(k+1) is tracked
    (frequent_covered). A green row proves the constant-memory sketch
    state machine ran over the whole stream and its output satisfies the
    published error bounds — any dropped batch, double count, or broken
    decrement flips a boolean.

    Scale shape: state is exactly k (item, count) pairs per key — bounded
    FOREVER, independent of stream length; the verification legs are
    batch aggregates on (event_type, user_id)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..catalog import load_table

    K = 8
    tracked_all = _run(
        ST.mg_heavy_hitters_stream(SE.stream_events(spark, sf_dir)),
        "q_mg",
        output_mode="update",
        # Unlike the other applyInPandasWithState rows, MG's group count is
        # the EVENT-TYPE domain (~5 keys, bounded forever), so per-store
        # fixed costs dominate at any input size and the bytes-adaptive
        # width applies (r10 probe, warm min-of-3: 1.34 s at 32 stores,
        # 1.17 at 8, 1.00 at 2). The per-USER handlers measured the
        # opposite (anomaly 1.60@32 -> 4.75@2, timer 3.18@32 -> 6.39@2:
        # ~10k serial Python group calls per task) and keep full width.
        width=SE.stream_state_width(spark, sf_dir),
    )
    # Under AvailableNow a static dir is one micro-batch; if the source
    # ever split it, keep each key's LAST emission (largest n_processed).
    w = Window.partitionBy("event_type")
    tracked = tracked_all.withColumn(
        "n_max", F.max("n_processed").over(w)
    ).filter(F.col("n_processed") == F.col("n_max"))

    ev = (
        SE.normalize_ts(load_table(spark, sf_dir, "events"))
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
    )
    truth = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))

    # per-item bound check on the tracked set
    checked = (
        tracked.join(truth, ["event_type", "user_id"], "left")
        .join(totals, "event_type")
        .select(
            "event_type",
            "n_events",
            "n_processed",
            (
                F.col("true_cnt").isNotNull()
                & (F.col("est_count") <= F.col("true_cnt"))
                & ((F.col("true_cnt") - F.col("est_count")) * (K + 1) <= F.col("n_events"))
            ).alias("item_ok"),
        )
        .groupBy("event_type", "n_events")
        .agg(
            F.max("n_processed").alias("n_processed"),
            (F.count(F.lit(1)) <= K).alias("n_tracked_ok"),
            F.min("item_ok").alias("bounds_ok"),
        )
    )
    # every frequent item (true_cnt > n/(k+1)) must be tracked
    frequent = truth.join(totals, "event_type").filter(
        F.col("true_cnt") * (K + 1) > F.col("n_events")
    )
    missed = (
        frequent.join(tracked, ["event_type", "user_id"], "left_anti")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_missed"))
    )
    return (
        checked.join(missed, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            (F.col("n_processed") == F.col("n_events")).alias("stream_saw_all"),
            "n_tracked_ok",
            "bounds_ok",
            (F.coalesce("n_missed", F.lit(0)) == 0).alias("frequent_covered"),
        )
    )


@register(
    "stream_percentile_windowed",
    oracle="""
    WITH e AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    g AS (
      SELECT bucket, event_type, list_sort(list(cents)) AS vs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY bucket, event_type
    )
    SELECT bucket, event_type, n,
           CAST(floor(1e6 * (CAST(vs[CAST(floor((n - 1) * 0.5) AS INT) + 1]
                                  AS DOUBLE)
                 + ((n - 1) * 0.5 - floor((n - 1) * 0.5))
                   * (CAST(vs[least(CAST(floor((n - 1) * 0.5) AS INT) + 2, n)]
                           AS DOUBLE)
                      - CAST(vs[CAST(floor((n - 1) * 0.5) AS INT) + 1]
                             AS DOUBLE))) + 0.5) AS BIGINT) AS p50_micro,
           CAST(floor(1e6 * (CAST(vs[CAST(floor((n - 1) * 0.95) AS INT) + 1]
                                  AS DOUBLE)
                 + ((n - 1) * 0.95 - floor((n - 1) * 0.95))
                   * (CAST(vs[least(CAST(floor((n - 1) * 0.95) AS INT) + 2, n)]
                           AS DOUBLE)
                      - CAST(vs[CAST(floor((n - 1) * 0.95) AS INT) + 1]
                             AS DOUBLE))) + 0.5) AS BIGINT) AS p95_micro
    FROM g
    """,
)
def stream_percentile_windowed(spark, sf_dir):
    """EXACT streaming percentiles (p50/p95 of integer cents) per hourly
    window and event type — the latency/SLA rollup, converged to the
    batch answer. State per group is the sorted value list (the honest
    cost of exact quantiles; the mergeable-sketch alternative is
    ``sketch_quantile_report``), and the (n−1)p interpolation is written
    out explicitly over the sorted array so the oracle states the
    identical IEEE arithmetic on both engines."""
    return _run(
        SE.windowed_percentiles(SE.stream_events(spark, sf_dir)),
        "q_pct",
        width=SE.stream_state_width(spark, sf_dir),
    )
