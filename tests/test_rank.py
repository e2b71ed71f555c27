"""Distributed ranking idioms (operators/rank.py): exact parity with the
single-reducer window functions they replace, across partition counts,
tie-heavy keys, and the N < buckets edge."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ingest_fast_spark.operators.rank import (
    global_ntile,
    global_row_number,
    topk_ranked,
)


def _frame(spark, n, mod):
    # mod controls tie density on the primary key; doc_id is the tiebreak.
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") * 37 % mod).alias("k")
    )


@pytest.mark.parametrize("n,mod,parts", [(500, 97, None), (1000, 7, 4), (64, 64, 16)])
def test_global_row_number_matches_window(spark, n, mod, parts):
    df = _frame(spark, n, mod)
    got = global_row_number(df, ["k", "doc_id"], out="g", num_partitions=parts)
    want = df.withColumn("t", F.row_number().over(Window.orderBy("k", "doc_id")))
    diff = got.join(want, ["doc_id", "k"]).filter(F.col("g") != F.col("t"))
    assert diff.count() == 0


def test_global_row_number_stable_across_reuse(spark):
    """The ranked frame is read twice downstream (offsets + join); the
    range partitioner's sampled boundaries must not be re-drawn between
    those reads. Self-join the result and demand one rank per row."""
    df = _frame(spark, 800, 13)
    g = global_row_number(df, ["k", "doc_id"], out="g")
    ranks = (
        g.join(g.withColumnRenamed("g", "g2"), ["doc_id", "k"])
        .filter(F.col("g") != F.col("g2"))
        .count()
    )
    assert ranks == 0
    # and the ranks are a permutation of 1..n
    assert g.agg(F.sum("g")).first()[0] == 800 * 801 // 2


@pytest.mark.parametrize("n,buckets", [(500, 10), (503, 10), (7, 10), (100, 7)])
def test_global_ntile_matches_window(spark, n, buckets):
    df = _frame(spark, n, 29)
    got = global_ntile(df, ["k", "doc_id"], buckets, out="b")
    want = df.withColumn(
        "b2", F.ntile(buckets).over(Window.orderBy("k", "doc_id"))
    )
    diff = got.join(want, ["doc_id", "k"]).filter(F.col("b") != F.col("b2"))
    assert diff.count() == 0


def test_topk_ranked_matches_window_topk(spark):
    df = _frame(spark, 1000, 41)
    got = topk_ranked(df, [F.desc("k"), F.asc("doc_id")], 25)
    want = (
        df.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("k"), F.asc("doc_id"))),
        )
        .filter(F.col("rank") <= 25)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_topk_ranked_plan_is_take_ordered(spark):
    df = _frame(spark, 1000, 41)
    plan = (
        topk_ranked(df, [F.desc("k"), F.asc("doc_id")], 25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_global_ntile_empty_input(spark):
    df = _frame(spark, 10, 3).filter(F.lit(False))
    assert global_ntile(df, ["k", "doc_id"], 10, out="b").count() == 0
