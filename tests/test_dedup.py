"""Dedup operator tests: exact-dedup semantics on constructed duplicates,
MinHash-LSH recall against exact Jaccard, SimHash determinism."""

import pytest
from pyspark.sql import functions as F

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.operators import dedup as D


def docs_with_dupes(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dupe
        (3, "the quick brown fox jumps over the lazy dog and walks away fast"),  # near dupe of 1
        (4, "completely different content about spark query engines at scale"),
        (5, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dupe
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    out = {r["canonical_id"]: r["n_copies"] for r in D.exact_dedup(docs_with_dupes(spark)).collect()}
    assert out[1] == 3  # docs 1,2,5 collapse, min id kept
    assert out[3] == 1
    assert out[4] == 1


def test_jaccard_finds_near_dupe(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs_with_dupes(spark), threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact dupes -> jaccard 1
    assert 0.5 < pairs[(1, 3)] < 1.0  # one-word edit -> high but < 1
    assert not any(4 in p for p in pairs)  # unrelated doc pairs with nothing


def test_minhash_lsh_recall_on_real_docs(spark, sf_dir):
    """LSH candidates must recover most high-Jaccard pairs (recall), and
    every reported pair must carry the exact (verified) Jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.05).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.minhash_near_dups(docs, threshold=0.05).collect()
    }
    # verified scores must be the exact scores
    for pair, j in lsh.items():
        assert abs(exact[pair] - j) < 1e-9
    # recall over the strongest pairs (jaccard >= 0.2) should be high
    strong = {p for p, j in exact.items() if j >= 0.2}
    if strong:
        recall = len(strong & set(lsh)) / len(strong)
        assert recall >= 0.8, f"LSH recall {recall} over {len(strong)} strong pairs"


def test_simhash_deterministic_and_finds_exact_dupes(spark):
    sigs1 = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(docs_with_dupes(spark)).collect()}
    sigs2 = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(docs_with_dupes(spark)).collect()}
    assert sigs1 == sigs2  # deterministic across runs
    assert sigs1[1] == sigs1[2] == sigs1[5]  # identical docs -> identical signature

    # Tiny docs: one changed token flips many signature bits, so probe with
    # a wide radius here (the production default is the standard d<=3,
    # which presumes realistic document lengths).
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in D.simhash_near_dups(docs_with_dupes(spark), max_hamming=16).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs  # near dupe within hamming radius


def test_containment_catches_subset_jaccard_misses(spark):
    from ingest_fast_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i}" for i in range(300))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally unrelated words here of course")],
        "doc_id long, text string",
    )
    cont = containment_pairs(docs, threshold=0.9).collect()
    got = {(r["doc_id"], r["ref_id"]): r for r in cont}
    assert (1, 2) in got  # small fully contained in big
    r = got[(1, 2)]
    assert r["containment"] == 1.0 and r["jaccard"] < 0.05
    # symmetric Jaccard at the same strictness finds nothing
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0
    # big is NOT contained in small
    assert (2, 1) not in got


def test_soft_weights_sum_to_one_per_cluster(spark):
    """SoftDeDup invariant: each near-dup cluster contributes exactly one
    document's worth of expected sampling mass (sum of 1/size over the
    cluster == 1), and singletons keep full weight 1.0."""
    from ingest_fast_spark.queries.llm import dedup_soft_weights

    rows = dedup_soft_weights(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 500
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_size"], []).append(r["soft_weight"])
        # round-6 of 1/size
        assert abs(r["soft_weight"] - round(1.0 / r["cluster_size"], 6)) < 1e-9
    for size, ws in by_cluster.items():
        # every member of an n-cluster reports the same weight
        assert len(set(ws)) == 1


def test_keep_best_exactly_one_longest_survivor(spark):
    """Keep-best invariant: exactly one keeper per cluster, and no
    non-keeper in the cluster is strictly longer than the keeper."""
    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.queries.llm import dedup_cluster_keep_best

    sf = "/root/testdata/sf0.01"
    rows = dedup_cluster_keep_best(spark, sf).collect()
    assert len(rows) == 500
    n_chars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf, "documents").select("doc_id", "n_chars").collect()
    }
    clusters = {}
    for r in rows:
        clusters.setdefault(r["cluster_id"], []).append(r)
    for cid, members in clusters.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1, f"cluster {cid}: {len(keepers)} keepers"
        kq = n_chars.get(keepers[0]["doc_id"]) or -1
        for m in members:
            assert (n_chars.get(m["doc_id"]) or -1) <= kq


def test_bpe_fertility_bounds(spark):
    """Fertility sanity: every word is at least one BPE token and at most
    its character count, so 1 <= fertility and chars_per_token >= 1
    (merges only ever shrink the symbol count from chars)."""
    from ingest_fast_spark.queries.llm import bpe_fertility_by_source

    rows = bpe_fertility_by_source(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] >= 1.0
        assert r["n_bpe_tokens"] >= r["n_words"]


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Pure-Python winnowing twin (Schleimer et al. 2003, Fig. 5 semantics:
    window min, rightmost occurrence on ties) for selection-rule parity."""
    import hashlib
    import re

    s = re.sub(r"\s+", " ", text.strip().lower())
    if len(s) < k:
        return set()
    hs = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:15], 16) % (1 << 40)
        for i in range(len(s) - k + 1)
    ]
    out = set()
    for i in range(w - 1, len(hs)):
        window = hs[i - w + 1 : i + 1]
        m = min(window)
        # rightmost occurrence of the min in this window
        j = max(idx for idx, h in enumerate(window) if h == m)
        out.add((m, i - w + 1 + j + 1))  # 1-based gram position
    return out


@pytest.mark.parametrize("w", [2, 3, 4, 5])
def test_winnow_matches_python_twin(spark, w):
    """Selection-rule parity across window widths — w=3 and w=5 exercise
    the sparse-table sliding minimum's non-power-of-two overlapping
    combine, w=2 its single-pass degenerate case."""
    docs = docs_with_dupes(spark)
    got = {
        (r["doc_id"], r["fp"], r["pos"])
        for r in D.winnow_fingerprints(docs, k=8, w=w).collect()
    }
    want = set()
    for row in docs.collect():
        for fp, pos in _py_winnow(row["text"], k=8, w=w):
            want.add((row["doc_id"], fp, pos))
    assert got == want


def test_winnow_guarantee_detects_long_shared_substring(spark):
    """Any verbatim match of length >= w + k - 1 must share a fingerprint
    (the winnowing coverage guarantee) — planted as a k+w-1-char overlap
    inside otherwise-disjoint documents."""
    shared = "zqxjvkwpyfbgmhdn"  # 16 chars of rare letters, no spaces
    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaaaaaaaaaa " + shared + " bbbbbbbbbbbbbbbbbbbb"),
            (2, "cccccccccccccccccccc " + shared + " dddddddddddddddddddd"),
        ],
        "doc_id long, text string",
    )
    # k=8, w=4: guarantee floor is 11 chars; the 16-char planted run qualifies
    fp = D.winnow_fingerprints(docs, k=8, w=4)
    a = {r["fp"] for r in fp.filter(F.col("doc_id") == 1).collect()}
    b = {r["fp"] for r in fp.filter(F.col("doc_id") == 2).collect()}
    assert a & b, "winnowing guarantee violated: 16-char shared run, no shared fingerprint"


def test_winnow_pairs_density_and_hot_fp_guard(spark):
    """Selection density ~2/(w+1); the df guard drops boilerplate
    fingerprints before the self-join."""
    rows = [(i, f"unique text number {i} with some shared boilerplate suffix attached here") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = D.winnow_fingerprints(docs, k=8, w=4)
    n_grams = sum(len(r["text"].strip()) - 7 for r in rows_df(docs))
    n_sel = fp.count()
    assert n_sel < 0.6 * n_grams  # well under full shingling
    # Without the guard the shared suffix pairs everything with everything
    # (30 choose 2); with it, interior-boilerplate fingerprints (selected
    # identically in all 30 docs, df=30) are dropped before the self-join
    # and only low-df boundary selections can still pair.
    unguarded = D.winnow_pairs(docs, k=8, w=4, min_shared=1, max_doc_freq=None)
    assert unguarded.count() == 435
    guarded = D.winnow_pairs(docs, k=8, w=4, min_shared=1, max_doc_freq=10)
    assert guarded.count() < 30


def test_winnow_chunk_boundary_parity(spark):
    """Explicit chunking must be invisible: a pathological chunk size
    (17 grams, forcing dozens of boundaries per doc) selects the exact
    same (fp, pos) set as single-chunk processing — windows spanning a
    boundary are recomputed by the owning chunk with global positions."""
    import random

    random.seed(7)
    rows = [
        (i, " ".join(random.choice("abcdefg hij klmno") for _ in range(200)))
        for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    one = {
        (r["doc_id"], r["fp"], r["pos"])
        for r in D.winnow_fingerprints(docs, k=8, w=4, chunk=1 << 18).collect()
    }
    sm = {
        (r["doc_id"], r["fp"], r["pos"])
        for r in D.winnow_fingerprints(docs, k=8, w=4, chunk=17).collect()
    }
    assert one == sm and one


def test_winnow_long_doc_not_truncated(spark):
    """No silent positional cap: a document longer than the per-chunk
    gram budget is fingerprinted to its END (the old implementation
    stopped at 2^20 grams; chunked selection has no ceiling). The planted
    tail run must be selected with its true GLOBAL position."""
    n_chars = 3 * (1 << 12)  # 3 chunks at the test chunk size below
    body = "".join("abcdefghij"[i % 10] for i in range(n_chars))
    tail = "zqxjvkwpyfbgmhdn"  # rare-letter run, planted at the very end
    docs = spark.createDataFrame([(1, body + tail)], "doc_id long, text string")
    fp = D.winnow_fingerprints(docs, k=8, w=4, chunk=1 << 12)
    max_pos = fp.agg(F.max("pos")).collect()[0][0]
    # the last gram starts at len(text) - k + 1; selection density ~2/(w+1)
    # means SOME selection lands within the final w-gram window
    assert max_pos >= n_chars, f"tail not fingerprinted: max pos {max_pos}"
    # and the planted tail shares a fingerprint with a doc that quotes it
    quoter = spark.createDataFrame(
        [(2, "completely different text " + tail + " around the quote")],
        "doc_id long, text string",
    )
    a = {r["fp"] for r in fp.collect()}
    b = {r["fp"] for r in D.winnow_fingerprints(quoter, k=8, w=4).collect()}
    assert a & b


def test_winnow_fast_twin_recovers_planted_pairs(spark):
    """The xxhash64 production default and the md5-portable twin recover
    the identical planted near-dup pairs (the hash family changes WHICH
    grams are selected, not whether heavily-overlapping docs collide)."""
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long and unmistakably repeated passage of shared text here"
    )
    import random

    rng = random.Random(11)
    letters = "abcdefghijklmnopqrstuvwxyz"
    rows = [(1, base), (2, base + " with a tiny suffix edit")] + [
        (i, " ".join("".join(rng.choice(letters) for _ in range(7)) for _ in range(25)))
        for i in range(3, 9)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {(1, 2)}
    got_p = {
        (r["doc_a"], r["doc_b"])
        for r in D.winnow_pairs(docs, k=8, w=4, min_shared=4, portable=True).collect()
    }
    got_f = {
        (r["doc_a"], r["doc_b"])
        for r in D.winnow_pairs(docs, k=8, w=4, min_shared=4, portable=False).collect()
    }
    assert got_p == want and got_f == want


def rows_df(docs):
    return [{"text": r["text"]} for r in docs.collect()]


def test_substring_scrub_removes_planted_quote_keep_first(spark):
    """A 20-token verbatim quote copied from an earlier doc is cut from
    the LATER doc only; overlapping spans from two earlier partners merge
    into one removal; a full copy empties; unrelated docs pass through."""
    words = [f"w{i}" for i in range(40)]
    quote = words[5:25]  # 20 tokens
    docs = [
        (1, " ".join(words)),                                # source: intact
        (2, " ".join(["x1", "x2", "x3"] + quote + ["y1", "y2"])),  # quote inside
        (3, " ".join(words)),                                # full copy of 1
        (4, "completely unrelated tokens only here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from ingest_fast_spark.operators.dedup import substring_scrub

    out = {r["doc_id"]: r for r in substring_scrub(df).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["clean_text"] == " ".join(words)
    assert out[2]["n_removed"] == 20
    assert out[2]["clean_text"] == "x1 x2 x3 y1 y2"
    assert out[3]["n_removed"] == 40 and out[3]["clean_text"] == ""
    assert out[4]["n_removed"] == 0
    # overlap merge: doc 5 shares [0..25) with doc 1 and [15..40) with
    # doc 3's copy -- one merged removal of all 40 tokens, not 50
    df2 = spark.createDataFrame(
        docs[:3] + [(5, " ".join(words))], "doc_id long, text string"
    )
    out2 = {r["doc_id"]: r for r in substring_scrub(df2).collect()}
    assert out2[5]["n_removed"] == 40 and out2[5]["clean_text"] == ""


def test_weighted_minhash_identical_docs_collide_fully(spark):
    from ingest_fast_spark.operators.dedup import weighted_minhash_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta " * 3
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words here now then")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_collisions"]
        for r in weighted_minhash_pairs(docs, num_seeds=16, min_collisions=4).collect()
    }
    assert got == {(1, 2): 16}  # identical docs agree on every seed


def test_weighted_minhash_repetition_changes_samples(spark):
    """The weighted sampler must distinguish repetition — the case where
    set-MinHash is blind: doc B repeats one shingle of A many times, so
    its samples concentrate there and collisions drop below identity."""
    from ingest_fast_spark.operators.dedup import weighted_minhash_pairs

    base = "one two three four five six seven eight nine ten"
    spam = base + " spam ham jam" * 40
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, spam)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_collisions"]
        for r in weighted_minhash_pairs(
            docs, num_seeds=16, min_collisions=1, max_bucket=100
        ).collect()
    }
    assert got[(1, 2)] == 16
    assert got.get((1, 3), 0) < 16 and got.get((2, 3), 0) < 16


def test_weighted_minhash_fast_recovers_planted_pairs(spark):
    """The xxhash64 scale default must find the same planted near-dups as
    the portable variant (different hash family -> different per-seed
    samples, same detection behavior on identical docs)."""
    from ingest_fast_spark.operators.dedup import weighted_minhash_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta " * 3
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words here now then")],
        "doc_id long, text string",
    )
    for portable in (True, False):
        got = {
            (r["doc_a"], r["doc_b"]): r["n_collisions"]
            for r in weighted_minhash_pairs(
                docs, num_seeds=16, min_collisions=4, portable=portable
            ).collect()
        }
        assert got == {(1, 2): 16}, (portable, got)


def test_boilerplate_line_scrub_drops_frequent_keeps_rare(spark):
    """Lines in >= min_df distinct docs vanish from EVERY doc; rarer lines
    survive in original order; an all-boilerplate doc survives empty."""
    footer = "subscribe to our newsletter"
    rows = [
        (1, f"alpha unique one\n{footer}\nbody line one"),
        (2, f"beta unique two\n{footer}"),
        (3, f"{footer}\ngamma unique three"),
        (4, footer),  # nothing but boilerplate
        (5, "delta unique five\nshared twice"),
        (6, "shared twice\nepsilon unique six"),
    ]
    out = {
        r["doc_id"]: r
        for r in D.boilerplate_line_scrub(
            spark.createDataFrame(rows, "doc_id long, text string"), min_df=3
        ).collect()
    }
    assert len(out) == 6
    assert out[1]["text_clean"] == "alpha unique one\nbody line one"
    assert out[1]["n_lines_kept"] == 2 and out[1]["n_lines_dropped"] == 1
    assert out[4]["text_clean"] == "" and out[4]["n_lines_kept"] == 0
    assert out[4]["n_lines_dropped"] == 1
    # df=2 stays under min_df=3 -> kept everywhere
    assert out[5]["text_clean"] == "delta unique five\nshared twice"
    assert out[6]["text_clean"] == "shared twice\nepsilon unique six"


def test_bbit_minhash_identical_docs_estimate_one(spark):
    """Identical documents agree on EVERY b-bit slot; after the collision
    correction the estimate is exactly 1.0, matching the exact Jaccard.
    The corrected estimator must also never go negative on unrelated
    pairs (greatest(agree - c_slots, 0) clamp)."""
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in D.bbit_minhash_pairs(docs_with_dupes(spark), threshold=0.0).collect()
    }
    exact = out[(1, 2)]
    assert exact["jaccard"] == 1.0
    assert exact["est_full"] == 1.0
    assert exact["est_bbit"] == 1.0
    for r in out.values():
        assert 0.0 <= r["est_bbit"] <= 1.0
        assert r["err_bbit"] >= 0.0


def test_bbit_minhash_correction_tracks_full_width(spark, sf_dir):
    """On the real corpus the corrected b-bit estimate stays close to the
    full-width estimate: collisions add noise bounded by the correction,
    so mean |est_bbit - est_full| must be small (< 0.15 over verified
    pairs at b=4, 16 slots) and the b-bit error must not blow past the
    full-width error by more than the theoretical variance inflation."""
    docs = load_table(spark, sf_dir, "documents")
    rows = D.bbit_minhash_pairs(docs, threshold=0.05).collect()
    assert rows, "no verified pairs at sf0.001"
    diffs = [abs(r["est_bbit"] - r["est_full"]) for r in rows]
    assert sum(diffs) / len(diffs) < 0.15
