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


def test_temperature_mix_rebalances_skewed_domains(spark):
    """alpha=0.5 mixing: a mega-domain's output share shrinks vs its input
    share; a small domain's grows; total lands on the target (+/- rounding)."""
    from ingest_fast_spark.operators.curation import temperature_mix

    rows = (
        [(i, "mega") for i in range(900)]
        + [(1000 + i, "mid") for i in range(90)]
        + [(2000 + i, "tiny") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, schema="doc_id bigint, source string")
    out = temperature_mix(docs, target_rows=100).collect()
    by_source = {}
    for r in out:
        by_source[r["source"]] = by_source.get(r["source"], 0) + 1
    total = sum(by_source.values())
    assert abs(total - 100) <= 3  # half-up rounding per domain
    # Input shares: mega .9, mid .09, tiny .01. sqrt-weights: 30/9.49/3.16.
    assert by_source["mega"] / total < 0.9
    assert by_source["tiny"] / total > 0.01
    # Deterministic: same input -> same quota split.
    again = temperature_mix(docs, target_rows=100).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)


def test_split_cluster_safe_no_cross_split_pairs(spark, sf_dir):
    """The leakage guarantee itself: no near-dup pair straddles a split
    boundary, and the three splits partition the corpus exactly."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.operators import dedup as D
    from ingest_fast_spark.queries import QUERIES

    out = QUERIES["split_cluster_safe"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert out.count() == docs.count()  # exhaustive, one row per doc
    pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.05)
    sa = out.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = out.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    straddlers = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddlers == 0
