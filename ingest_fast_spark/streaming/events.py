"""Structured Streaming variants over the events table (SURVEY.md §2.7).

The reference streams its input file but is batch at heart — aggregation
completes only at end-of-file (reference lib/ingest.js:8,194-198,264).
These are the genuinely-streaming shapes a 100 TB event pipeline needs:
file-source readStream, watermarked tumbling/sliding windows,
session windows, and a foreachBatch upsert sink.

Tests drive them with Trigger.AvailableNow against the same parquet the
batch queries read, and assert batch/stream agreement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import apply_runtime_confs

# events.parquet physical schema under nanosAsLong (ts is INT64 nanos) —
# the legacy testdata vintage; newer testdata writes a real timestamp[us].
# Use raw_events_schema()/normalize_ts to handle either.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def raw_events_schema(spark: SparkSession, path: str) -> StructType:
    """The physical schema of an events parquet file/dir, as Spark reads it
    (ts may be INT64 nanos → long under the legacy flag, or timestamp)."""
    from ..catalog import parquet_schema

    apply_runtime_confs(spark)
    return parquet_schema(spark, path)


def normalize_ts(df: DataFrame) -> DataFrame:
    """ts → zoned TIMESTAMP (micros), whatever the physical vintage:
    INT64-nanos long (integer DIV — floor(a/b) via doubles drifts ±1 µs at
    1e18 ns) or a real timestamp/timestamp_ntz column. Watermarks require
    a zoned TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on ntz); the
    session runs in UTC so the cast is a zone-flavor change only."""
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def ensure_stream_parallelism(df: DataFrame, sf_dir: str, pattern: str) -> DataFrame:
    """Round-robin repartition a file-source stream IFF the watched file
    set is narrower than the cluster parallelism.

    Structured Streaming's file source assigns ONE task per FILE (no
    byte-range splitting, unlike the batch parquet scan), so a
    single-file bench table serializes every map-side expression of every
    micro-batch onto one core (measured: the stateless quality gate ran
    2.35 s streaming vs 0.60 s batch — pure map parallelism). At
    production file counts the guard is false and this is a no-op — the
    batch-side ``ensure_parallelism`` contract, ported to streams (the
    stream cannot be probed via df.rdd, so the file count is the
    deterministic equivalent)."""
    import glob as _glob

    par = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    n = len(_glob.glob(os.path.join(sf_dir, pattern)))
    if 0 < n < par:
        return df.repartition(par)
    return df


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source readStream over events.parquet with the same ts
    normalization as the batch loader.

    Window bounds are cast back to timestamp_ntz in each output so
    streaming results are schema- and value-identical to the batch twins."""
    apply_runtime_confs(spark)
    # The file-source stream monitors a DIRECTORY for files (a bare file is
    # rejected: "Option 'basePath' must be a directory"), so watch sf_dir
    # filtered down to the events file(s).
    import os as _os

    schema = raw_events_schema(spark, _os.path.join(sf_dir, "events.parquet"))
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events*.parquet")
        .load(sf_dir)
    )
    return normalize_ts(raw)


def windowed_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts — the streaming twin of the batch
    ``time_bucket_tumbling`` query (same output schema)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """1-hour windows sliding every 30 minutes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            F.col("w.end").cast("timestamp_ntz").alias("win_end"),
            "n_events",
        )
    )


def hourly_rollup_of_quarters(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """CHAINED stateful aggregation (Spark 3.4+ multiple-stateful-operator
    support): 15-minute tumbling counts re-aggregated into hourly totals +
    the hour's peak quarter, in ONE streaming query. The second groupBy
    windows over ``window_time()`` of the first — the engine tracks both
    operators' state and finalizes an hour only when the watermark passes
    its end, so this must run in append mode (complete mode rejects
    chained aggs). Hours still open at end-of-input stay in state; the
    batch oracle applies the same cutoff.

    The 0-second watermark assumes in-order arrival BETWEEN micro-batches
    (within a batch order is irrelevant). The driver's single events file
    is one batch, so nothing is late; a production multi-batch source
    needs a watermark sized to its real disorder — and every closed hour
    then emits that much later (the append-mode state/latency trade)."""
    q = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        q.groupBy(F.window(F.window_time("w"), "1 hour").alias("h"))
        .agg(
            F.max("n").alias("peak_quarter"),
            F.sum("n").alias("n_events"),
        )
        .select(
            F.col("h.start").cast("timestamp_ntz").alias("bucket"),
            "peak_quarter",
            "n_events",
        )
    )


def session_window_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (inactivity gap) — the streaming-native
    twin of the batch gaps-and-islands ``sessionize`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


def stream_state_width(spark: SparkSession, sf_dir: str) -> int:
    """Scale-adaptive state-store count for a JVM-side streaming
    aggregation over the events source: ~one state partition per 64 MB of
    input, clamped to [1, defaultParallelism]. Stateful streaming
    disables AQE, so the shuffle-partition count is taken literally as
    the state-store count — each store pays per-micro-batch fixed costs
    (delta-file commit, maintenance), which dominate when the input is
    small (measured: a warm tumbling-count stream at sf0.1 runs 1.33 s
    with 32 stores, 0.83 s with 2 — guide §2.2's fewer-larger-partitions
    rule applied to state). At real scale bytes/64 MB exceeds the clamp
    and this returns full parallelism. NOT applied to
    applyInPandasWithState operators, whose per-row Python handlers are
    compute-bound and need every core."""
    import glob

    total = 0
    root = os.path.join(sf_dir, "events.parquet")
    paths = [root] if os.path.isfile(root) else glob.glob(
        os.path.join(root, "*.parquet")
    ) + glob.glob(os.path.join(sf_dir, "events*.parquet"))
    for p in paths:
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    par = max(spark.sparkContext.defaultParallelism, 1)
    return max(1, min(par, total // (64 << 20) + 1))


def run_available_now(
    df: DataFrame,
    name: str,
    output_mode: str = "complete",
    state_partitions: int | None = None,
):
    """Execute a streaming aggregation over all currently-available input
    (Trigger.AvailableNow) into an in-memory sink; returns the result
    table. This is the test/dev harness — production sinks are
    foreachBatch/parquet.

    Stateful streaming disables AQE, so the shuffle-partition count is
    taken literally as the state-store count — on an untuned session
    (default 200) that is 200 state stores of fixed overhead per
    micro-batch. ``state_partitions`` (see ``stream_state_width``) sizes
    it to the input; otherwise right-size to the cluster's parallelism
    for the duration of query planning, then restore."""
    spark = df.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    right = str(spark.sparkContext.defaultParallelism)
    try:
        if state_partitions is not None:
            spark.conf.set(conf_key, str(state_partitions))
        elif int(prev) > 4 * int(right):
            spark.conf.set(conf_key, right)
        query = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set(conf_key, prev)
    query.awaitTermination()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def upsert_foreach_batch(df: DataFrame, target_dir: str, key_cols: list[str]):
    """foreachBatch upsert: each micro-batch is merged into the parquet
    target by key (read-modify-overwrite; on Delta this would be
    MERGE INTO). The reference's per-document Mongo upsert
    (reference lib/ingest.js:118,156) becomes this set-oriented merge."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(target_dir)
        except Exception:
            existing = None
        if existing is not None:
            merged = (
                existing.join(batch_df.select(key_cols), key_cols, "left_anti")
                .unionByName(batch_df)
            )
        else:
            merged = batch_df
        # Write to a side dir then swap would be production practice; for
        # the harness a direct overwrite (after full materialization via
        # localCheckpoint) is enough.
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_dir)

    return (
        df.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def stream_stream_interval_join(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream INNER join with an event-time interval condition:
    each purchase joined to the same user's clicks in the preceding hour.

    Both sides carry watermarks and the join predicate bounds event time
    on both, so Spark can size the join state and evict expired rows —
    the requirement for unbounded stream-stream joins. Output columns are
    cast to timestamp_ntz to match the batch twin exactly."""
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.col("p_ts").cast("timestamp_ntz").alias("p_ts"),
        F.col("c_ts").cast("timestamp_ntz").alias("c_ts"),
    )


def windowed_percentiles(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact per-window p50/p95 of integer-cent values per event type —
    the latency/SLA rollup every monitoring pipeline keeps. EXACT
    percentiles need each window's full value multiset, so the streaming
    state per (window, type) group is its sorted value list — bounded by
    window span × event rate, the honest cost of exactness (at firehose
    rates swap in the mergeable quantile sketch of
    ``sketch_quantile_report``; the algebra here is the attestation
    target). The interpolation is written out explicitly over the sorted
    array — k = ⌊(n−1)p⌋, lo + frac·(hi−lo), micro-floored — so the
    DuckDB oracle states the identical arithmetic instead of trusting
    two engines' percentile() internals to match."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")

    def pct(p):
        n = F.size("vs")
        idx = (n - 1).cast("double") * F.lit(p)
        k = F.floor(idx).cast("int")
        frac = idx - k.cast("double")
        lo = F.element_at("vs", k + 1).cast("double")
        hi = F.element_at("vs", F.least(k + 2, n)).cast("double")
        return (
            F.floor(F.lit(1e6) * (lo + frac * (hi - lo)) + F.lit(0.5))
            .cast("long")
        )

    return (
        events.filter(F.col("value").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.sort_array(F.collect_list(cents)).alias("vs"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("bucket"),
            "event_type",
            F.size("vs").cast("long").alias("n"),
            pct(0.5).alias("p50_micro"),
            pct(0.95).alias("p95_micro"),
        )
    )
