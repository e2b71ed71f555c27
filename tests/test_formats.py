"""Format round-trip tests (JSONL/CSV) and multi-batch incremental
streaming upsert."""

import os

from pyspark.sql import functions as F

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.sources import formats


def _doc_rows(df):
    return sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in df.collect()
    )


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents").limit(100)
    path = str(tmp_path / "docs_jsonl")
    formats.write_jsonl(d, path)
    back = formats.read_jsonl(
        spark, path, "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert _doc_rows(back) == _doc_rows(d)


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents").limit(100).drop("text")  # csv + newlines don't mix
    path = str(tmp_path / "docs_csv")
    formats.write_csv(d, path)
    back = formats.read_csv(
        spark, path, "doc_id long, lang string, source string, n_chars long"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_incremental_multibatch_upsert(spark, sf_dir, tmp_path):
    """Split events into 4 files, stream them one file per micro-batch
    (maxFilesPerTrigger=1), foreachBatch-upsert windowed counts — the final
    table must equal the one-shot batch aggregate. This is the real
    incremental path: state evolves across 4 batches and the upsert must
    converge."""
    from ingest_fast_spark.session import apply_runtime_confs
    from ingest_fast_spark.streaming import events as SE

    apply_runtime_confs(spark)
    src = str(tmp_path / "events_split")
    target = str(tmp_path / "upsert_target")
    # Re-write raw events (ts still INT64 nanos) as 4 files.
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    raw.repartition(4).write.parquet(src)

    stream = SE.normalize_ts(
        spark.readStream.schema(SE.raw_events_schema(spark, src))
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    # The 4 split files are NOT time-ordered (round-robin repartition), so
    # each micro-batch spans the whole month; a 1-hour watermark would
    # correctly drop most rows of batches 2-4 as late data. Use a watermark
    # wider than the full time range to test pure upsert convergence.
    counts = SE.windowed_counts(stream, watermark="60 days")
    q = SE.upsert_foreach_batch(counts, target, ["bucket", "event_type"]).start()
    q.awaitTermination()
    assert len(q.recentProgress) >= 4  # really ran multiple micro-batches

    from ingest_fast_spark.queries.relational import time_bucket_tumbling

    got = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(target).collect()
    }
    expected = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in time_bucket_tumbling(spark, sf_dir).collect()
    }
    assert got == expected


def test_orc_round_trip(spark, sf_dir, tmp_path):
    from ingest_fast_spark.sources.formats import read_orc, write_orc

    o = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(o, path)
    back = read_orc(spark, path)
    assert back.schema == o.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, o.collect()))


def test_permissive_jsonl_quarantines_bad_lines(spark, tmp_path):
    from pyspark.sql import functions as F

    from ingest_fast_spark.sources.formats import read_jsonl_permissive

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good row"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "another good row"}\n'
        '{"doc_id": "not-a-number", "text": 3}\n'
    )
    df = read_jsonl_permissive(spark, str(p), "doc_id long, text string")
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    # count() would prune to only _corrupt_record, which Spark disallows
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize full rows instead.
    assert len(bad.collect()) == 2  # the non-JSON line and the type-mismatched one
