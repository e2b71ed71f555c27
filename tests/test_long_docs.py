"""Megatoken-document sweep: every positional text operator must process
long documents IN FULL — no silent positional cap, no quadratic re-derive
of the token/gram stream per element (the CollapseProject in-lambda trap;
see dedup.let_col). These run on a single ~100k-char document: with the
let-bindings in place each completes in seconds; without them the same
calls take minutes (measured 79 s for one 20k-token positional_kgrams
before the fix), so a regression fails the suite by timeout rather than
silently shipping an O(n²) scan."""

import pytest
from pyspark.sql import functions as F

import ingest_fast_spark.operators.dedup as D

N_TOK = 30_000


@pytest.fixture(scope="module")
def long_doc(spark):
    body = " ".join(f"tok{i % 977}" for i in range(N_TOK))
    return spark.createDataFrame([(1, body)], "doc_id long, text string")


def test_positional_kgrams_full_coverage(long_doc):
    out = D.positional_kgrams(long_doc, k=8)
    n = out.count()
    assert n == N_TOK - 7  # every position, to the end
    assert out.agg(F.max("pos")).collect()[0][0] == N_TOK - 8  # 0-based


def test_shingles_full_coverage(long_doc):
    # distinct-set semantics: the 977-period token cycle yields exactly
    # 977 distinct 3-grams — and only a full traversal finds all of them
    assert D.shingles_df(long_doc, k=3).count() == 977


def test_shingle_sets_cover_tail(long_doc):
    row = D.doc_shingle_sets(long_doc, k=3).collect()[0]
    # distinct set over the periodic token stream: every 3-gram phase of
    # the 977-period cycle appears — and the LAST window's shingle too
    last = f"tok{(N_TOK - 3) % 977} tok{(N_TOK - 2) % 977} tok{(N_TOK - 1) % 977}"
    assert last in set(row["shingles"])


def test_winnow_reaches_document_end(long_doc):
    # character stream ~ 8 chars/token -> force multiple chunks
    fp = D.winnow_fingerprints(long_doc, k=8, w=4, chunk=1 << 14)
    mx = fp.agg(F.max("pos")).collect()[0][0]
    n_chars = len(long_doc.collect()[0]["text"])
    # selection density 2/(w+1): a fingerprint lands within the last few
    # windows, so max pos must sit near the final gram, never at a cap
    assert mx > n_chars - 8 * (4 + 1)


def test_weighted_minhash_samples_long_doc(long_doc):
    # one doc -> no pairs, but the sampler itself must traverse all
    # shingles without quadratic re-tokenization; smoke via the pair API
    out = D.weighted_minhash_pairs(long_doc.union(long_doc.select(F.lit(2), "text")))
    assert out.count() == 1  # the two copies collide on every seed


def test_span_corruption_covers_megatoken_doc(spark, long_doc):
    """pack_span_corruption's position sequence() must cover ALL tokens of
    a 30k-token document (no silent cap) in linear time, and the mask
    algebra must reconcile: masked ≈ 1 − (19/20)³ of tokens within a
    loose band, sentinels ≤ masked, lengths consistent."""
    import time

    from ingest_fast_spark.queries import llm as L
    from pyspark.sql import functions as F

    d = long_doc.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    # Reuse the registered query's expression path via a temp view of the
    # fixture: simplest is to call the query fn against a parquet dir, so
    # instead rebuild the core expressions here through the public query
    # on a 1-doc frame written to a temp location.
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="spanlong")
    for t in ("documents",):
        long_doc.withColumn("n_chars", F.length("text")).withColumn(
            "source", F.lit("s")
        ).withColumn("lang", F.lit("en")).write.mode("overwrite").parquet(
            os.path.join(tmp, f"{t}.parquet")
        )
    # satisfy load_table for the other tables it never touches
    t0 = time.time()
    out = L.pack_span_corruption(spark, tmp).collect()
    dt = time.time() - t0
    assert len(out) == 1
    r = out[0]
    assert r["n_tokens"] == N_TOK
    rate = r["n_masked"] / r["n_tokens"]
    assert 0.12 < rate < 0.17, rate
    assert r["n_sentinels"] <= r["n_masked"]
    assert r["input_len"] + r["target_len"] == r["n_tokens"] + 2 * r["n_sentinels"] + 1
    assert dt < 60, f"megatoken span corruption took {dt:.1f}s"
