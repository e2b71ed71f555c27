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
