"""Unit tests for sequence packing and benchmark decontamination.

Both operators' corpus-level behavior is oracle-checked by the driver
(`pack_training_sequences`, `decontaminate_benchmark`); these tests pin
the semantics on hand-built fixtures where the expected output is
computable by eye, plus the partitioning-invariance guarantee.
"""

from pyspark.sql import functions as F

from ingest_fast_spark.operators.dedup import ngram_contamination
from ingest_fast_spark.operators.pack import pack_sequences


def test_pack_sequential_fill(spark):
    # target=10: doc1 (6 tok) fills [0,6); doc2 (6 tok) starts at 6 in
    # seq 0 (straddles into seq 1); doc3 starts at 12 -> seq 1, offset 2.
    df = spark.createDataFrame(
        [(1, 6), (2, 6), (3, 4)], ["doc_id", "n_tokens"]
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, "n_tokens", "doc_id", target=10).collect()
    }
    assert out == {1: (0, 0), 2: (0, 6), 3: (1, 2)}


def test_pack_partitioned_and_invariant(spark):
    rows = [(i, "s%d" % (i % 3), 7) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    a = pack_sequences(df, "n_tokens", "doc_id", target=16, part_col="source")
    b = pack_sequences(
        df.repartition(7, "doc_id"), "n_tokens", "doc_id", target=16, part_col="source"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # per-source numbering restarts at 0
    firsts = (
        a.groupBy("source").agg(F.min("seq_id").alias("m")).collect()
    )
    assert all(r["m"] == 0 for r in firsts)


def test_pack_matches_naive_window(spark):
    """The distributed prefix-sum assignment equals the single-reducer
    running-sum window row for row — grouped and global."""
    from pyspark.sql import Window

    rows = [(i, "s%d" % (i % 4), (i * 13) % 29 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    for part_col in ("source", None):
        got = pack_sequences(df, "n_tokens", "doc_id", target=32, part_col=part_col)
        w = (
            (Window.partitionBy(part_col) if part_col else Window.partitionBy())
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        start = F.sum("n_tokens").over(w) - F.col("n_tokens")
        want = df.withColumn("seq_id", F.floor(start / F.lit(32))).withColumn(
            "seq_offset", start - F.col("seq_id") * 32
        )
        assert sorted(map(tuple, got.select(*want.columns).collect())) == sorted(
            map(tuple, want.collect())
        )


def test_pack_null_group_not_dropped(spark):
    """A NULL part_col value is a legitimate group: the offset join-back
    must be null-safe or those rows silently vanish."""
    rows = [(1, None, 6), (2, None, 6), (3, "s1", 4)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens int")
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(
            df, "n_tokens", "doc_id", target=10, part_col="source"
        ).collect()
    }
    assert out == {1: (0, 0), 2: (0, 6), 3: (0, 0)}


def test_contamination_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            # contains "quick brown fox jumps" (one shared 4-gram) and
            # "brown fox jumps over" (another)
            (1, "a quick brown fox jumps over fences daily"),
            (2, "completely unrelated text with no overlap at all"),
            # exact copy: shares every 4-gram (9 tokens -> 6 shingles)
            (3, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n_hit_grams"]
        for r in ngram_contamination(train, bench, k=4).collect()
    }
    assert out == {1: 2, 3: 6}


def test_contamination_clean_corpus_empty(spark):
    bench = spark.createDataFrame([(9, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    train = spark.createDataFrame([(1, "one two three four five six")], ["doc_id", "text"])
    assert ngram_contamination(train, bench, k=4).count() == 0


def test_span_corruption_operating_point_and_pure_codegen(spark):
    """Corpus-level corruption must sit near the T5 operating point
    (1 - (19/20)^3 ~ 14.3%), sentinels can never exceed masked tokens or
    seeds, lengths must reconcile, and the plan must contain no Python
    node (pure Column HOFs)."""
    from ingest_fast_spark.queries.llm import pack_span_corruption

    out = pack_span_corruption(spark, "/root/testdata/sf0.01")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    rows = out.collect()
    tot_tokens = sum(r["n_tokens"] for r in rows)
    tot_masked = sum(r["n_masked"] for r in rows)
    rate = tot_masked / tot_tokens
    assert 0.11 < rate < 0.18, rate
    for r in rows:
        assert 0 <= r["n_sentinels"] <= r["n_masked"]
        assert r["input_len"] == r["n_tokens"] - r["n_masked"] + r["n_sentinels"]
        assert r["target_len"] == r["n_masked"] + r["n_sentinels"] + 1
        # A sentinel consumes >= 1 masked token and spans merge, so
        # sentinels <= ceil(masked / 1) trivially and masked <= 3*seeds
        # implies sentinels <= masked.
