"""ann_recall_report: the registered approximation-quality invariant.

The report query itself is rows-only in the driver gate (its exact
baselines ARE the oracle); these assertions pin the recall floors so a
regression in any approximate operator (banding bug, bucket-key change,
probe mis-rank) fails CI even though the driver check is weak."""

import pytest

from ingest_fast_spark.queries import QUERIES


@pytest.fixture(scope="module")
def report(spark, sf_dir):
    rows = QUERIES["ann_recall_report"](spark, sf_dir).collect()
    return {r["method"]: r.asDict() for r in rows}


def test_report_shape(report):
    assert set(report) == {
        "ivf_topk@10",
        "ivf_adc_topk@10",
        "cosine_lsh_pairs",
        "minhash_xxhash64_pairs",
    }
    for row in report.values():
        assert row["n_hit"] <= row["n_exact"]
        assert row["n_approx"] >= row["n_hit"]
        assert 0.0 <= row["recall"] <= 1.0


def test_ivf_recall_floor(report):
    # nprobe=2 of 8 k-means buckets: recall@10 well above random probing.
    assert report["ivf_topk@10"]["recall"] >= 0.4, report["ivf_topk@10"]


def test_ivf_adc_recall_floor(report):
    # The IVF×PQ fusion compounds the 2-of-8 probe miss rate with 4×8
    # quantization error: measured 0.24-0.36 across sf0.001-sf0.1, so the
    # pinned floor is 0.2 (same floor ann_recall_floors attests).
    assert report["ivf_adc_topk@10"]["recall"] >= 0.2, report["ivf_adc_topk@10"]


def test_cosine_lsh_recall_floor(report):
    # 4 bands x 4 bits at cos >= 0.4 (same floor as test_similarity.py).
    assert report["cosine_lsh_pairs"]["recall"] >= 0.3, report["cosine_lsh_pairs"]


def test_minhash_fast_recall_floor(report):
    # 16 hashes / 4 bands at J >= 0.05: the exact self-join finds weak
    # pairs LSH legitimately skips, but strong-pair recovery keeps overall
    # recall above this floor on the synthetic corpus.
    assert report["minhash_xxhash64_pairs"]["recall"] >= 0.3, report[
        "minhash_xxhash64_pairs"
    ]


def test_approx_outputs_are_precise(spark, sf_dir):
    """Precision is 1 by construction: every pair the approximate
    operators emit passed an exact verification. Spot-check: the fast
    MinHash pairs are a subset of the exact Jaccard self-join pairs."""
    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, k=3, threshold=0.05).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_near_dups(
            docs, num_hashes=16, bands=4, threshold=0.05
        ).collect()
    }
    assert approx <= exact
