"""Structured Streaming tests: stream results (Trigger.AvailableNow) must
agree with the equivalent batch queries over the same parquet input."""

import pytest
import shutil
import tempfile

from pyspark.sql import functions as F

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.queries.relational import time_bucket_tumbling
from ingest_fast_spark.streaming import events as SE


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_windowed_counts_match_batch(spark, sf_dir):
    stream = SE.stream_events(spark, sf_dir)
    assert stream.isStreaming
    result = SE.run_available_now(SE.windowed_counts(stream), "t_win_counts")
    batch = time_bucket_tumbling(spark, sf_dir)
    assert _rows(result, "bucket", "event_type", "n_events", "sum_value") == _rows(
        batch, "bucket", "event_type", "n_events", "sum_value"
    )


def test_sliding_windows(spark, sf_dir):
    stream = SE.stream_events(spark, sf_dir)
    result = SE.run_available_now(SE.sliding_window_counts(stream), "t_slide")
    rows = result.collect()
    assert rows
    # every event lands in exactly 2 sliding windows (1h window, 30m slide)
    total_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == 2 * total_events


def test_session_windows(spark, sf_dir):
    stream = SE.stream_events(spark, sf_dir)
    result = SE.run_available_now(
        SE.session_window_counts(stream, gap="30 minutes"), "t_sess"
    )
    rows = result.collect()
    assert rows
    # conservation: every event belongs to exactly one session
    total_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == total_events
    # sessions per user must match the batch gaps-and-islands count
    from ingest_fast_spark.queries.relational import sessionize

    batch_sessions = sessionize(spark, sf_dir)
    batch_per_user = {
        r["user_id"]: r["n"]
        for r in batch_sessions.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    stream_per_user: dict = {}
    for r in rows:
        stream_per_user[r["user_id"]] = stream_per_user.get(r["user_id"], 0) + 1
    assert stream_per_user == batch_per_user


def test_foreach_batch_upsert(spark, sf_dir):
    target = tempfile.mkdtemp(prefix="upsert_test_")
    shutil.rmtree(target, ignore_errors=True)
    try:
        stream = SE.stream_events(spark, sf_dir)
        counts = SE.windowed_counts(stream)
        q = SE.upsert_foreach_batch(counts, target, ["bucket", "event_type"]).start()
        q.awaitTermination()
        written = spark.read.parquet(target)
        batch = time_bucket_tumbling(spark, sf_dir)
        assert _rows(written, "bucket", "event_type", "n_events") == _rows(
            batch, "bucket", "event_type", "n_events"
        )
        # run again: same keys upserted, row count unchanged (idempotent)
        q2 = SE.upsert_foreach_batch(counts, target, ["bucket", "event_type"]).start()
        q2.awaitTermination()
        assert spark.read.parquet(target).count() == batch.count()
    finally:
        shutil.rmtree(target, ignore_errors=True)


def test_stateful_user_running_stats(spark, sf_dir):
    """applyInPandasWithState final state == batch GROUP BY user_id."""
    from ingest_fast_spark.streaming.stateful import user_running_stats

    stream = SE.stream_events(spark, sf_dir)
    result = SE.run_available_now(
        user_running_stats(stream), "t_user_state", output_mode="update"
    )
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"]) for r in result.collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    )
    expected = {r["user_id"]: (r["n"], r["s"]) for r in batch}
    assert got == expected


def _protobuf_ok():
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(not _protobuf_ok(), reason="transformWithState needs google.protobuf")
def test_user_running_stats_tws_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.streaming import events as SE
    from ingest_fast_spark.streaming.stateful import user_running_stats_tws

    out = SE.run_available_now(
        user_running_stats_tws(SE.stream_events(spark, sf_dir)), "t_tws", "update"
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"]) for r in out.collect()}
    exp = {
        r["user_id"]: (r["n"], round(r["s"], 2), round(r["m"], 2))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"), F.max("value").alias("m"))
        .collect()
    }
    assert got == exp


def test_mg_stream_matches_python_reference(spark, sf_dir):
    """The streamed Misra-Gries tracked set is a deterministic function of
    the (ts, event_id)-ordered stream; pin it against a straight Python MG
    over the identically-ordered batch rows."""
    from ingest_fast_spark.streaming.stateful import mg_heavy_hitters_stream

    out = SE.run_available_now(
        mg_heavy_hitters_stream(SE.stream_events(spark, sf_dir)), "t_mg_ref", "update"
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["event_type"], {})[r["user_id"]] = r["est_count"]

    ev = (
        SE.normalize_ts(load_table(spark, sf_dir, "events"))
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("event_type", "user_id", "ts", "event_id")
        .collect()
    )
    streams = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        streams.setdefault(r["event_type"], []).append(r["user_id"])
    for etype, users in streams.items():
        mg = {}
        for u in users:
            if u in mg:
                mg[u] += 1
            elif len(mg) < 8:
                mg[u] = 1
            else:
                for it in list(mg):
                    mg[it] -= 1
                    if mg[it] == 0:
                        del mg[it]
        assert got[etype] == mg, etype
