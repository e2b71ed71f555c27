#!/usr/bin/env python
"""One-JVM interleaved A/B for the graph_assortativity rewrite:
old = raw.distinct -> und.distinct + adj(union+distinct) -> deg;
new = ONE distinct (und) -> deg via explode of endpoints.
Times both min-of-N through the noop sink and asserts row equality.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sums_to_out(sums):
    num = F.lit(4) * F.col("m") * F.col("s_jk") - F.col("s_sum") * F.col("s_sum")
    den = F.lit(2) * F.col("m") * F.col("s_sq") - F.col("s_sum") * F.col("s_sum")
    return sums.select(
        F.col("m").alias("m_edges"),
        "s_jk",
        "s_sum",
        "s_sq",
        F.when(
            den != 0,
            F.floor(F.lit(1e6) * num / den + F.lit(0.5)).cast("long"),
        ).alias("assortativity_micro"),
    )


def old_frame(spark):
    o = load_table(spark, SF_DIR, "orders")
    raw = (
        o.filter(F.col("o_custkey").isNotNull() & F.col("o_orderkey").isNotNull())
        .select(
            (F.col("o_custkey") % 3000).alias("s"),
            (F.col("o_orderkey") % 3000).alias("d"),
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    und = raw.select(
        F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v")
    ).distinct()
    adj = (
        raw.select("s", "d")
        .unionAll(raw.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
    )
    deg = adj.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("s").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("s").alias("v"), F.col("deg").alias("dv"))
    sums = (
        und.join(du, "u")
        .join(dv, "v")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("du") * F.col("dv")).alias("s_jk"),
            F.sum(F.col("du") + F.col("dv")).alias("s_sum"),
            F.sum(F.col("du") * F.col("du") + F.col("dv") * F.col("dv")).alias("s_sq"),
        )
    )
    return _sums_to_out(sums)


def new_frame(spark):
    o = load_table(spark, SF_DIR, "orders")
    und = (
        o.filter(F.col("o_custkey").isNotNull() & F.col("o_orderkey").isNotNull())
        .select(
            (F.col("o_custkey") % 3000).alias("s"),
            (F.col("o_orderkey") % 3000).alias("d"),
        )
        .filter(F.col("s") != F.col("d"))
        .select(F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    sums = (
        und.join(du, "u")
        .join(dv, "v")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("du") * F.col("dv")).alias("s_jk"),
            F.sum(F.col("du") + F.col("dv")).alias("s_sum"),
            F.sum(F.col("du") * F.col("du") + F.col("dv") * F.col("dv")).alias("s_sq"),
        )
    )
    return _sums_to_out(sums)


def new_ckpt_frame(spark):
    o = load_table(spark, SF_DIR, "orders")
    und = (
        o.filter(F.col("o_custkey").isNotNull() & F.col("o_orderkey").isNotNull())
        .select(
            (F.col("o_custkey") % 3000).alias("s"),
            (F.col("o_orderkey") % 3000).alias("d"),
        )
        .filter(F.col("s") != F.col("d"))
        .select(F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    sums = (
        und.join(du, "u")
        .join(dv, "v")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("du") * F.col("dv")).alias("s_jk"),
            F.sum(F.col("du") + F.col("dv")).alias("s_sum"),
            F.sum(F.col("du") * F.col("du") + F.col("dv") * F.col("dv")).alias("s_sq"),
        )
    )
    return _sums_to_out(sums)


def time_noop(make, spark, n=4):
    # Construct INSIDE the timed region — bench.py calls fn(spark, dir)
    # per repeat, so eager localCheckpoint jobs are part of the cost.
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        make(spark).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main():
    spark = get_spark("ab-assortativity")
    spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).count()  # warm

    rows_old = sorted(map(tuple, old_frame(spark).collect()))
    rows_new = sorted(map(tuple, new_frame(spark).collect()))
    rows_ck = sorted(map(tuple, new_ckpt_frame(spark).collect()))
    assert rows_old == rows_new == rows_ck, (rows_old, rows_new, rows_ck)

    # interleave to defeat slow drift
    t_old = t_new = t_ck = float("inf")
    for _ in range(3):
        t_old = min(t_old, time_noop(old_frame, spark, 2))
        t_new = min(t_new, time_noop(new_frame, spark, 2))
        t_ck = min(t_ck, time_noop(new_ckpt_frame, spark, 2))
    print(json.dumps({"old": round(t_old, 3), "new": round(t_new, 3),
                      "new_ckpt": round(t_ck, 3), "rows_equal": True}))


if __name__ == "__main__":
    main()
