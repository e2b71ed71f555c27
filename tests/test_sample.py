"""Deterministic sampling: partitioning-invariance, split disjointness,
fraction accuracy, seed independence."""

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.operators.sample import (
    deterministic_sample,
    stratified_sample,
    train_holdout_split,
)


def test_sample_is_partitioning_invariant(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = {r["o_orderkey"] for r in deterministic_sample(o, "o_orderkey", 0.2).collect()}
    b = {
        r["o_orderkey"]
        for r in deterministic_sample(o.repartition(17), "o_orderkey", 0.2).collect()
    }
    assert a == b and a  # df.sample() would fail this under repartition


def test_sample_fraction_accuracy(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    got = deterministic_sample(o, "o_orderkey", 0.2).count()
    assert abs(got / n - 0.2) < 0.05


def test_split_disjoint_and_exhaustive(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    train, hold = train_holdout_split(o, "o_orderkey", holdout_fraction=0.1)
    nt, nh, n = train.count(), hold.count(), o.count()
    assert nt + nh == n
    assert train.join(hold, "o_orderkey", "inner").count() == 0


def test_seeds_give_different_samples(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = {r["o_orderkey"] for r in deterministic_sample(o, "o_orderkey", 0.2, seed=1).collect()}
    b = {r["o_orderkey"] for r in deterministic_sample(o, "o_orderkey", 0.2, seed=2).collect()}
    assert a != b


def test_stratified_fractions(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    out = stratified_sample(
        c, "c_custkey", "c_mktsegment", {"BUILDING": 1.0, "MACHINERY": 0.0}
    )
    segs = {r["c_mktsegment"] for r in out.select("c_mktsegment").distinct().collect()}
    assert segs == {"BUILDING"}  # 100% of BUILDING, 0% + unlisted dropped
