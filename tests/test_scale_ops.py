"""Scale-oriented operator tests: salted aggregation equivalence,
bucketed co-located joins (no shuffle), stream-stream interval join."""

import tempfile

from pyspark.sql import functions as F

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.operators.skew import salted_agg, salted_collect_set
from ingest_fast_spark.sources.bucketed import bucketed_join, write_bucketed


def test_salted_agg_equals_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = {
        r["event_type"]: (r["n"], round(r["s"], 2), r["mn"], r["mx"])
        for r in e.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], round(r["s"], 2), r["mn"], r["mx"])
        for r in salted_agg(
            e,
            ["event_type"],
            [
                ("value", "count", "n"),
                ("value", "sum", "s"),
                ("value", "min", "mn"),
                ("value", "max", "mx"),
            ],
        ).collect()
    }
    assert plain == salted


def test_salted_collect_set_equals_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    plain = {
        r["event_type"]: tuple(r["vals"])
        for r in e.groupBy("event_type")
        .agg(F.array_sort(F.collect_set("user_id")).alias("vals"))
        .collect()
    }
    salted = {
        r["event_type"]: tuple(r["vals"])
        for r in salted_collect_set(e, ["event_type"], "user_id", alias="vals").collect()
    }
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    d = tempfile.mkdtemp(prefix="buckets_")
    write_bucketed(
        o.withColumnRenamed("o_custkey", "custkey"), "t_orders_b", ["custkey"],
        num_buckets=8, path=f"{d}/orders",
    )
    write_bucketed(
        c.withColumnRenamed("c_custkey", "custkey"), "t_customer_b", ["custkey"],
        num_buckets=8, path=f"{d}/customer",
    )
    # Force the non-broadcast path: at real scale neither fact side fits a
    # broadcast, which is exactly when bucketing pays.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_orders_b", "t_customer_b", ["custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # co-located: zero shuffle
        # and it is still correct
        expected = o.join(c, o.o_custkey == c.c_custkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_stream_interval_join_matches_batch(spark, sf_dir):
    from ingest_fast_spark.streaming import events as SE

    stream = SE.stream_events(spark, sf_dir)
    result = SE.run_available_now(
        SE.stream_stream_interval_join(stream), "t_ssjoin", output_mode="append"
    )
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    batch = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    got = sorted(
        (r["purchase_id"], r["click_id"]) for r in result.collect()
    )
    expected = sorted(
        (r["purchase_id"], r["click_id"]) for r in batch.collect()
    )
    assert got == expected and len(got) > 0


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Writing partitioned-by-key and filtering on the key must prune
    partitions at the scan (PartitionFilters), not read-then-filter."""
    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    d.write.partitionBy("lang").mode("overwrite").parquet(path)
    q = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "PartitionFilters: [" in plan
    assert "(lang" in plan.split("PartitionFilters:")[1].split("]")[0]
    # and values survive the round trip
    assert q.count() == d.filter(F.col("lang") == "en").count()


def test_salted_join_equals_plain(spark, sf_dir):
    from ingest_fast_spark.operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in o.join(c, "o_custkey").select("o_orderkey", "c_name").collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in salted_join(o, c, "o_custkey", salt_buckets=8)
        .select("o_orderkey", "c_name")
        .collect()
    )
    assert salted == plain and len(plain) > 0


def test_hll_sketches_merge_exactly(spark, sf_dir):
    """The 100 TB distinct-count pattern: build HLL sketches per shard,
    union the BINARY sketches, and get byte-identical state to a single
    global sketch — so per-partition/per-day sketches can be stored and
    rolled up later without rescanning. Also sanity-check the estimate
    against the exact distinct count."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    global_est = e.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    # Shard by event_type (arbitrary partitioning), merge the sketches.
    merged_est = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged_est == global_est  # merge is lossless, not just "close"
    exact = e.select("user_id").distinct().count()
    assert abs(merged_est - exact) / exact < 0.05


def test_bootstrap_ci_fast_twin_parity(spark, sf_dir):
    """The xxhash64 bootstrap twin reports the IDENTICAL deterministic
    totals per group as the md5-portable headliner, and both variants'
    replicate CIs bracket those totals (the Poisson(1) weighting algebra
    is shared; only the uniform source differs — same twin contract as
    the MinHash fast/portable split)."""
    from ingest_fast_spark.queries import QUERIES

    got = {}
    for name in ("agg_bootstrap_ci", "agg_bootstrap_ci_fast"):
        rows = {r["o_orderpriority"]: r for r in QUERIES[name](spark, sf_dir).collect()}
        assert rows
        for r in rows.values():
            assert r["ci_low_cents"] <= r["total_cents"] <= r["ci_high_cents"]
            assert r["ci_low_cents"] < r["ci_high_cents"]
        got[name] = {k: r["total_cents"] for k, r in rows.items()}
    assert got["agg_bootstrap_ci"] == got["agg_bootstrap_ci_fast"]
