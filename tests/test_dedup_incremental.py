"""Incremental near-dup dedup: greedy first-seen-wins semantics across
micro-batches, index growth bounded by kept docs, rerun absorbs new files."""

import json
import os
import shutil
import tempfile

import pytest

from ingest_fast_spark.streaming.dedup_incremental import run_incremental_near_dedup

BASE = "machine learning models train on large curated text corpora every day"
NEAR = "machine learning models train on large curated text corpora every night"
OTHER = "completely unrelated content about cooking pasta with fresh tomatoes basil"
OTHER_NEAR = "completely unrelated content about cooking pasta with fresh tomatoes oregano"


def write_jsonl(path, rows):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


@pytest.fixture()
def dirs():
    docs = tempfile.mkdtemp(prefix="docs_in_")
    out = tempfile.mkdtemp(prefix="dedup_out_")
    yield docs, out
    shutil.rmtree(docs, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


def decisions(spark, out):
    return {
        r["doc_id"]: (r["kept"], r["dup_of"])
        for r in spark.read.parquet(os.path.join(out, "decisions")).collect()
    }


def test_incremental_dedup_two_batches(spark, dirs):
    docs, out = dirs
    # Batch 1: 1 kept, 2 dups 1 (exact), 3 distinct.
    # bands=8 (2 rows/band): near-dup recall at J≈0.75 is ~0.999; the
    # default 4×4 banding misses ~16% of such pairs — fine for corpus
    # stats, not for an exact-expectation test.
    write_jsonl(os.path.join(docs, "b1.jsonl"), [(1, BASE), (2, BASE), (3, OTHER)])
    run_incremental_near_dedup(spark, docs, out, threshold=0.5, bands=8).awaitTermination()
    got = decisions(spark, out)
    assert got == {1: (True, None), 2: (False, 1), 3: (True, None)}

    # Batch 2 (rerun absorbs only the new file): 4 near-dups 1 (cross-batch,
    # against the persisted index), 5 near-dups 3, 6 distinct.
    write_jsonl(os.path.join(docs, "b2.jsonl"), [(4, NEAR), (5, OTHER_NEAR), (6, "x y z " * 10)])
    run_incremental_near_dedup(spark, docs, out, threshold=0.5, bands=8).awaitTermination()
    got = decisions(spark, out)
    assert got[4] == (False, 1)
    assert got[5] == (False, 3)
    assert got[6][0] is True

    # Index contains exactly the kept docs — growth bounded by uniques.
    index_ids = {
        r["doc_id"] for r in spark.read.parquet(os.path.join(out, "index")).collect()
    }
    assert index_ids == {1, 3, 6}


def test_driver_traffic_is_o_delta_not_o_history(spark, dirs):
    """The greedy resolution must never pull the persisted index to the
    driver: after seeding a LARGE kept-index, a small batch's driver-side
    collect volume must be bounded by the batch (matches + batch ids),
    independent of index size."""
    from ingest_fast_spark.streaming import dedup_incremental as di

    docs, out = dirs
    # Seed: 120 mutually-distinct docs -> all kept -> index of 120 rows.
    seed = [
        (i, f"seed document number {i} with unique words w{i}a w{i}b w{i}c w{i}d w{i}e")
        for i in range(120)
    ]
    write_jsonl(os.path.join(docs, "seed.jsonl"), seed)
    run_incremental_near_dedup(spark, docs, out, threshold=0.5, bands=8).awaitTermination()
    index_rows = spark.read.parquet(os.path.join(out, "index")).count()
    assert index_rows == 120

    # Delta: 3 docs (one near-dups a seed doc). Driver rows for this batch
    # must be O(3 + matches), nowhere near the 120-row index.
    write_jsonl(
        os.path.join(docs, "delta.jsonl"),
        [(1000, seed[7][1] + " extra"), (1001, BASE), (1002, OTHER)],
    )
    run_incremental_near_dedup(spark, docs, out, threshold=0.5, bands=8).awaitTermination()
    got = decisions(spark, out)
    assert got[1000] == (False, 7)
    assert got[1001][0] is True and got[1002][0] is True
    assert di.last_batch_driver_rows <= 10, (
        f"driver pulled {di.last_batch_driver_rows} rows for a 3-doc batch "
        f"against a {index_rows}-row index — O(history) leak"
    )


def test_registered_query_decisions_are_consistent(spark, sf_dir):
    """The registered stream_incremental_dedup query's decisions must be
    internally consistent on real data: every duplicate's dup_of target
    is itself kept, was seen earlier (lower doc_id), and truly matches at
    the threshold (exact 3-shingle Jaccard >= 0.5); every doc appears
    exactly once."""
    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.queries import QUERIES

    decisions = QUERIES["stream_incremental_dedup"](spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in decisions}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
        if r["doc_id"] is not None and r["text"] is not None
    }
    assert set(by_id) == set(docs)  # one decision per doc

    def shingle_set(text):
        toks = text.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for r in decisions:
        if r["kept"]:
            assert r["dup_of"] is None
            continue
        target = r["dup_of"]
        assert target is not None and target < r["doc_id"]
        assert by_id[target]["kept"], f"{r['doc_id']} dups a non-kept {target}"
        a, b = shingle_set(docs[r["doc_id"]]), shingle_set(docs[target])
        j = len(a & b) / len(a | b) if a | b else 0.0
        assert j >= 0.5, f"{r['doc_id']}->{target} jaccard {j}"


def test_index_compaction_preserves_decisions_and_bounds_files(spark, dirs):
    """VERDICT r3 item 5: the index must not accumulate one parquet file
    set per micro-batch forever. With compaction forced every batch
    (threshold=1) the index stays a handful of files across many batches,
    stays readable, and every decision — including cross-batch dups
    resolved AGAINST A COMPACTED INDEX — matches a parallel run with
    compaction disabled."""
    from ingest_fast_spark.streaming.dedup_incremental import (
        _index_file_count,
        compact_index,
    )

    docs_a = tempfile.mkdtemp(prefix="docs_a_")
    out_a = tempfile.mkdtemp(prefix="out_a_")
    docs_b = tempfile.mkdtemp(prefix="docs_b_")
    out_b = tempfile.mkdtemp(prefix="out_b_")
    try:
        batches = [
            [(1, BASE), (2, BASE), (3, OTHER)],
            [(4, NEAR), (5, OTHER_NEAR), (6, "x y z " * 10)],
            [(7, BASE + " altered"), (8, "q r s t u v w " * 5)],
            [(9, NEAR + " again"), (10, OTHER + " too")],
        ]
        for i, rows in enumerate(batches):
            for docs, out, thr in ((docs_a, out_a, 1), (docs_b, out_b, 0)):
                write_jsonl(os.path.join(docs, f"b{i}.jsonl"), rows)
                run_incremental_near_dedup(
                    spark, docs, out, threshold=0.5, bands=8, compact_threshold=thr
                ).awaitTermination()
        got_a, got_b = decisions(spark, out_a), decisions(spark, out_b)
        assert got_a == got_b, "compaction changed dedup decisions"
        # compacted run: file count bounded (default target_files=4), not
        # one file set per batch
        n_a = _index_file_count(spark, os.path.join(out_a, "index"))
        n_b = _index_file_count(spark, os.path.join(out_b, "index"))
        assert n_a <= 4, f"compacted index has {n_a} files"
        assert n_b > n_a  # the un-compacted twin really does accumulate
        # index content identical (rows, not files)
        ids_a = sorted(
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(out_a, "index")).collect()
        )
        ids_b = sorted(
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(out_b, "index")).collect()
        )
        assert ids_a == ids_b
        # the standalone maintenance entry point also preserves content
        assert compact_index(spark, out_b, target_files=2)
        ids_b2 = sorted(
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(out_b, "index")).collect()
        )
        assert ids_b2 == ids_b
        assert _index_file_count(spark, os.path.join(out_b, "index")) <= 2
    finally:
        for d in (docs_a, out_a, docs_b, out_b):
            shutil.rmtree(d, ignore_errors=True)


def test_greedy_chain_semantics(spark, dirs):
    docs, out = dirs
    # 10 ~ 11 ~ 12 transitively but 10 !~ 12 at thr=0.5 (3-shingle
    # Jaccard: J(10,11)=7/11≈.64, J(11,12)=8/12≈.67, J(10,12)=5/13≈.38):
    # greedy keeps 10, drops 11 (matches kept 10), KEEPS 12 (its only
    # ≥thr match, 11, was itself rejected). Batch CC would merge all 3.
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon zeta eta theta iota lambda mu nu"
    c = "gamma delta epsilon zeta eta theta iota lambda mu nu xi omicron"
    write_jsonl(os.path.join(docs, "chain.jsonl"), [(10, a), (11, b), (12, c)])
    run_incremental_near_dedup(spark, docs, out, threshold=0.5, bands=8).awaitTermination()
    got = decisions(spark, out)
    assert got[10] == (True, None)
    assert got[11] == (False, 10)
    assert got[12][0] is True, got
