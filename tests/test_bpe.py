"""BPE trainer (operators/bpe.py): distributed merges == pure-Python
greedy reference, including the overlapping-run and unicode cases."""

import random

from ingest_fast_spark.operators.bpe import bpe_train, bpe_train_py, word_freq_table


def _run_both(spark, texts, n_merges):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left_sym"], r["right_sym"], r["freq"])
        for r in bpe_train(docs, n_merges=n_merges).orderBy("rank").collect()
    ]
    wf = {
        r["word"]: r["freq"] for r in word_freq_table(docs).collect()
    }
    want = bpe_train_py(wf, n_merges=n_merges)
    return got, want


def test_bpe_matches_python_reference_random_corpus(spark):
    rng = random.Random(99)
    alphabet = "abcdefg"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 8)))
            for _ in range(rng.randrange(3, 15))
        )
        for _ in range(40)
    ]
    got, want = _run_both(spark, texts, n_merges=6)
    assert got == want and len(got) == 6


def test_bpe_overlapping_runs(spark):
    # 'aaaa' exercises greedy left-to-right: merge (a,a) must yield
    # (aa, aa), not (aa, a, a) or a rescan artifact.
    got, want = _run_both(spark, ["aaaa aaaa aab", "aaaa baa"], n_merges=3)
    assert got == want
    assert (got[0][1], got[0][2]) == ("a", "a")


def test_bpe_unicode_corpus(spark):
    got, want = _run_both(
        spark, ["数据 数据 处理 数据处理", "café café naïve"], n_merges=4
    )
    assert got == want


def test_bpe_encode_matches_python_reference(spark):
    from ingest_fast_spark.operators.bpe import bpe_encode_lengths

    rng = random.Random(7)
    texts = [
        " ".join(
            "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 6)))
            for _ in range(rng.randrange(2, 10))
        )
        for _ in range(20)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_df = bpe_train(docs, n_merges=5)
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in bpe_encode_lengths(docs, merges_df, n_merges=5).collect()
    }

    # Python reference: learn merges, then greedy-encode each word.
    wf = {r["word"]: r["freq"] for r in word_freq_table(docs).collect()}
    merges = [(a, b) for _, a, b, _ in bpe_train_py(wf, n_merges=5)]

    def enc(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for i, t in enumerate(texts):
        words = t.split()
        want = (len(words), sum(enc(w) for w in words))
        assert got[i] == want, (i, got[i], want)
