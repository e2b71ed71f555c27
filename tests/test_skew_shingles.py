"""Hot-shingle skew: the pathological corpus for shingle-blocked joins.

A shingle present in >50% of documents turns the shingle self-join into a
near-cartesian on that key (the classic boilerplate/license-header skew at
web scale). These tests build exactly that corpus and assert the
``max_doc_freq`` stop-shingle guard bounds the pair explosion, while the
prefix-filter path needs no guard at all (hot shingles are the most
frequent, so they never enter a rarest-first prefix)."""

import pytest

from ingest_fast_spark.operators import dedup as D

N = 200
BOILER = "all rights reserved by company"  # 5 tokens -> 3 hot 3-shingles


@pytest.fixture(scope="module")
def hot_corpus(spark):
    # Every doc: identical 5-token boilerplate + a unique 7-token tail.
    # Any two docs share the 3 boilerplate shingles: J = 3/17 ~ 0.18, so at
    # threshold 0.05 EVERY pair qualifies -> N*(N-1)/2 pairs unguarded.
    # Docs 9000/9001 are genuine near-dups (shared unique tail).
    rows = [
        (i, f"{BOILER} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g")
        for i in range(N)
    ]
    rows.append((9000, f"{BOILER} real dup tail shared tokens here alpha"))
    rows.append((9001, f"{BOILER} real dup tail shared tokens here beta"))
    return spark.createDataFrame(rows, "doc_id long, text string").coalesce(4)


def test_unguarded_join_explodes(spark, hot_corpus):
    """Baseline documenting the skew: with no guard, the hot shingles pair
    every doc with every other doc."""
    n_pairs = D.ngram_jaccard_pairs(hot_corpus, k=3, threshold=0.05).count()
    assert n_pairs >= (N * (N - 1)) // 2  # ~20k pairs from 202 docs


def test_max_doc_freq_guard_bounds_explosion(spark, hot_corpus):
    """With the stop-shingle guard on (df cap well below the hot
    shingles' 202), boilerplate-only pairs vanish; only the genuine
    near-dup pair (which shares UNIQUE shingles) survives. Row volume
    drops from O(n^2) on the hot key to O(real matches)."""
    guarded = D.ngram_jaccard_pairs(
        hot_corpus, k=3, threshold=0.05, max_doc_freq=50
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in guarded}
    assert (9000, 9001) in pairs
    # bounded: no boilerplate-only pair slips through
    assert len(pairs) <= 5, f"guard leaked {len(pairs)} pairs"


def test_substring_spans_exact_lengths(spark):
    """Hand-built docs pin the diagonal-run arithmetic: a shared run of m
    consecutive matching k-grams is a span of m + k - 1 tokens."""
    shared = " ".join(f"s{i}" for i in range(20))  # 20-token verbatim block
    rows = [
        (1, f"intro one two three {shared} outro alpha beta"),
        (2, f"different prefix here {shared} and a different tail"),
        (3, "no overlap with anyone at all in this document text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r["max_span_tokens"]
        for r in D.substring_span_pairs(df, k=8, min_span=15).collect()
    }
    # Docs 1 and 2 share exactly the 20-token block: 13 matching 8-grams
    # in a single diagonal run -> 13 + 7 = 20.
    assert out == {(1, 2): 20}


def test_substring_spans_split_runs(spark):
    """Two separate shared blocks must NOT merge into one span."""
    a = " ".join(f"a{i}" for i in range(16))
    b = " ".join(f"b{i}" for i in range(10))
    rows = [
        (1, f"{a} xx yy {b}"),
        (2, f"{b} qq rr {a}"),  # same blocks, different order/diagonals
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.substring_span_pairs(df, k=8, min_span=15).collect()
    # Only the 16-token block clears min_span=15; the 10-token block is a
    # separate diagonal and must not extend it.
    assert [(r["doc_a"], r["doc_b"], r["max_span_tokens"]) for r in out] == [
        (1, 2, 16)
    ]


def test_cdc_boundaries_realign_after_edit(spark):
    """THE content-defined-chunking property: prepending one token shifts
    every byte offset, yet after the first content-defined cut all
    downstream chunk boundaries realign — so nearly every chunk is
    shared between the original and the edited copy (fixed-size blocks
    would share none)."""
    from ingest_fast_spark.operators.dedup import cdc_chunks

    base = " ".join(f"w{i}" for i in range(300))
    edited = "inserted " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    by_doc = {1: [], 2: []}
    for r in cdc_chunks(df).collect():
        by_doc[r["doc_id"]].append(r["chunk"])
    c1, c2 = set(by_doc[1]), set(by_doc[2])
    assert len(by_doc[1]) >= 5, "corpus too small to chunk"
    # all but the first (pre-first-cut) chunk must survive the edit
    assert len(c1 & c2) >= len(c1) - 1, (len(c1), len(c2), len(c1 & c2))
    # reassembly sanity: chunks concatenate back to the doc
    assert " ".join(by_doc[1]) == base


def test_cdc_stats_on_duplicated_corpus(spark):
    """A corpus of two identical docs dedups to ~half at chunk level."""
    from ingest_fast_spark.operators.dedup import cdc_chunk_stats

    text = " ".join(f"t{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    row = cdc_chunk_stats(df).collect()[0]
    assert row["n_chunks"] == 2 * row["n_distinct_chunks"]
    assert row["total_chunk_tokens"] == 400
    assert row["dedup_ratio"] == 0.5


def test_prefix_filter_immune_to_hot_shingles(spark, hot_corpus):
    """The high-threshold prefix-filter path self-mitigates: prefixes are
    rarest-first, so a shingle in >50% of docs is never a join key. At
    t=0.5 the only emitted pair is the genuine near-dup (J=9/11~0.82;
    boilerplate-only pairs sit at ~0.18)."""
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.jaccard_prefix_filter_pairs(
            hot_corpus, k=3, threshold=0.5
        ).collect()
    }
    assert pairs == {(9000, 9001)}
