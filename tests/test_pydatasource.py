"""Custom Python DataSource: partition parallelism, determinism, and
filter pushdown semantics."""

import pytest
from pyspark.sql import functions as F

from ingest_fast_spark.sources import pydatasource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pydatasource.register(spark)
    yield
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_row_count_and_schema(spark):
    df = _read(spark, partitions=3, rows_per_partition=100)
    assert df.count() == 300
    assert [f.name for f in df.schema.fields] == [
        "event_id",
        "user_id",
        "event_type",
        "value",
    ]


def test_partition_parallelism(spark):
    df = _read(spark, partitions=5, rows_per_partition=10)
    assert df.rdd.getNumPartitions() == 5


def test_deterministic_across_reads(spark):
    a = sorted(map(tuple, _read(spark, partitions=4, rows_per_partition=50).collect()))
    b = sorted(map(tuple, _read(spark, partitions=4, rows_per_partition=50).collect()))
    assert a == b


def test_equality_filter_pushed_and_correct(spark):
    full = _read(spark, partitions=2, rows_per_partition=200)
    expected = sorted(
        map(tuple, full.filter(F.col("event_type") == "click").collect())
    )
    pushed = _read(spark, partitions=2, rows_per_partition=200).filter(
        F.col("event_type") == "click"
    )
    assert sorted(map(tuple, pushed.collect())) == expected
    assert len(expected) > 0


def test_residual_filter_still_applied(spark):
    # value-range filter is NOT absorbed by the source; Spark must apply it
    df = _read(spark, partitions=2, rows_per_partition=200).filter(
        (F.col("event_type") == "view") & (F.col("value") > 50.0)
    )
    rows = df.collect()
    assert rows and all(r["value"] > 50.0 and r["event_type"] == "view" for r in rows)


def test_stream_reader_micro_batches(spark, tmp_path):
    """readStream over the Python data source: bounded at 30 rows, the
    stream drains in 10-row micro-batches and the sink holds exactly
    rows [0, 30)."""
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 10)
        .option("max_rows", 30)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT event_id FROM synth_stream_sink ORDER BY event_id"
        ).collect()
        assert [r["event_id"] for r in rows] == list(range(30))
    finally:
        q.stop()
