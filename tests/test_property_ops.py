"""Property-based tests: pack_sequences and merge_upsert vs pure-Python
reference implementations on random inputs (SURVEY.md §5 item 4 applied
to the curation operators)."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ingest_fast_spark.operators.merge import merge_upsert
from ingest_fast_spark.operators.pack import pack_sequences

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

doc_lens = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=25
)


def py_pack(lens, target):
    out, cum = {}, 0
    for doc_id, n in enumerate(lens):  # doc_id order == list order
        out[doc_id] = (cum // target, cum % target)
        cum += n
    return out


@given(doc_lens, st.integers(min_value=1, max_value=64))
@_settings
def test_pack_matches_reference(spark, lens, target):
    df = spark.createDataFrame(
        [(i, lens[i]) for i in range(len(lens))], ["doc_id", "n_tokens"]
    )
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, "n_tokens", "doc_id", target).collect()
    }
    assert got == py_pack(lens, target)


# --- substring spans vs brute-force token LCS --------------------------------

# Small alphabet forces shared runs; docs of 0-30 tokens cover the
# shorter-than-k edge and multi-island diagonals.
token = st.integers(min_value=0, max_value=5).map(lambda i: f"t{i}")
doc_tokens = st.lists(token, min_size=0, max_size=30)


def py_longest_token_lcs(a: list, b: list) -> int:
    """O(|a||b|) DP longest common (contiguous) token substring."""
    best = 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            if x == y:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


@given(st.lists(doc_tokens, min_size=2, max_size=5), st.integers(2, 4))
@_settings
def test_substring_spans_match_token_lcs(spark, docs, k):
    """substring_span_pairs must equal the brute-force longest-common-
    token-substring for every pair (for LCS >= k; shorter spans have no
    matching k-gram and are invisible by design)."""
    from ingest_fast_spark.operators.dedup import substring_span_pairs

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["max_span_tokens"]
        for r in substring_span_pairs(df, k=k, min_span=k).collect()
    }
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            lcs = py_longest_token_lcs(docs[i], docs[j])
            if lcs >= k:
                want[(i, j)] = lcs
    assert got == want


kv = st.dictionaries(
    st.integers(min_value=0, max_value=8),
    st.integers(min_value=-100, max_value=100),
    max_size=8,
)


def py_merge(target, updates):
    out = dict(target)
    out.update(updates)
    return out


@given(kv, kv)
@_settings
def test_merge_matches_reference(spark, target, updates):
    schema = "id bigint, v bigint"
    t = spark.createDataFrame(list(target.items()) or [], schema=schema)
    u = spark.createDataFrame(list(updates.items()) or [], schema=schema)
    got = {r["id"]: r["v"] for r in merge_upsert(t, u, ["id"]).collect()}
    assert got == py_merge(target, updates)


texts = st.lists(
    st.text(alphabet="ab c", min_size=1, max_size=120), min_size=1, max_size=8
)


def py_chunks(text, size=40, stride=30):
    # Mirrors Spark: split(trim(lower(text)), '\s+') — empty string -> [""]
    toks = re.split(r"\s+", text.strip().lower())
    return [
        (s + 1, toks[s : s + size]) for s in range(0, len(toks), stride)
    ]


@given(texts)
@_settings
def test_chunk_overlap_matches_reference(spark, docs):
    """text_chunk_overlap == a pure-Python sliding window: same start
    positions, same chunk contents, and stride-prefixes reconstruct the
    original token stream."""
    import os
    import tempfile

    from ingest_fast_spark.queries.llm import text_chunk_overlap

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id bigint, text string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = text_chunk_overlap(spark, d).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["start_pos"], r["chunk_text"].split(" ") if r["chunk_text"] else [""])
        )
    for doc_id, text in enumerate(docs):
        expect = py_chunks(text)
        chunks = sorted(got[doc_id])
        assert [(s, c) for s, c in chunks] == expect
        # Reconstruction: first `stride` tokens of each chunk + the full
        # final chunk == the original token stream.
        toks = []
        for i, (_, c) in enumerate(chunks):
            toks.extend(c if i == len(chunks) - 1 else c[:30])
        assert toks == re.split(r"\s+", text.strip().lower())


# --- prefix-filter Jaccard: exactness vs a pure-Python all-pairs oracle -----

_words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
)
_docs = st.lists(
    st.lists(_words, min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=12,
)


def _py_shingles(text, k=3):
    toks = text.strip().lower().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _py_jaccard_pairs(texts, k, threshold):
    sh = {i: _py_shingles(t, k) for i, t in enumerate(texts)}
    out = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 6)
            if j >= threshold:
                out[(a, b)] = j
    return out


@given(_docs, st.sampled_from([0.3, 0.5, 0.8]))
@_settings
def test_prefix_filter_jaccard_is_exact(spark, texts, threshold):
    """The AllPairs/PPJoin prefix filter must lose NO recall: its output
    equals the brute-force all-pairs join at the same threshold, for any
    corpus and threshold (whitespace-only and sub-k docs included)."""
    from ingest_fast_spark.operators.dedup import jaccard_prefix_filter_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_filter_pairs(df, k=3, threshold=threshold).collect()
    }
    assert got == _py_jaccard_pairs(texts, 3, threshold)


# Overlapping windows of one shared token sequence: docs = base[i:j].
# This creates strong document-frequency variation (middle tokens appear
# in many windows, edge tokens in few) plus long shared runs — exactly
# the df-skew + prefix-boundary regime where an unsound overlap-bound
# prune loses true pairs. The uniform-_words corpora above rarely reach
# that regime (round-5 advisor finding).
_window_docs = st.builds(
    lambda starts_lens: [
        " ".join(f"w{i}" for i in range(s, s + ln)) for s, ln in starts_lens
    ],
    st.lists(
        st.tuples(st.integers(0, 10), st.integers(3, 14)),
        min_size=2,
        max_size=10,
    ),
)


@given(_window_docs, st.sampled_from([0.3, 0.5, 0.7, 0.9]))
@_settings
def test_prefix_filter_jaccard_exact_on_window_corpora(spark, texts, threshold):
    """Prefix filter exactness under df skew: sliding-window corpora where
    boundary shingles of different documents have very different global
    frequencies. Regression guard for the round-4 overlap-bound prune bug
    (boundary compared by raw hash instead of (df, hash) order, silently
    dropping pairs with J >= threshold)."""
    from ingest_fast_spark.operators.dedup import jaccard_prefix_filter_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_filter_pairs(df, k=3, threshold=threshold).collect()
    }
    assert got == _py_jaccard_pairs(texts, 3, threshold)


def test_prefix_filter_prune_boundary_regression(spark):
    """Pinned reproduction of the round-4 prune bug (advisor finding):
    at t=0.5 this 4-doc corpus must include pair (2,3) with J=0.5 — the
    hash-ordered boundary picked the wrong suffix bound and pruned it."""
    from ingest_fast_spark.operators.dedup import jaccard_prefix_filter_pairs

    texts = [
        "tok1 tok2 tok3 tok4",
        "tok5 tok6 tok7 tok8 tok9 tok10 tok11 tok12 tok13",
        "tok2 tok3 tok4 tok5 tok6 tok7 tok8",
        "tok4 tok5 tok6 tok7 tok8 tok9",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_filter_pairs(df, k=3, threshold=0.5).collect()
    }
    assert got == _py_jaccard_pairs(texts, 3, 0.5)
    assert (2, 3) in got and got[(2, 3)] == 0.5


def _py_containment_pairs(texts, k, threshold):
    sh = {i: _py_shingles(t, k) for i, t in enumerate(texts)}
    out = {}
    for a in range(len(texts)):
        for b in range(len(texts)):
            if a == b or not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            c = round(inter / len(sh[a]), 6)
            if c >= threshold:
                out[(a, b)] = c
    return out


@given(_docs, st.sampled_from([0.5, 0.8, 0.9, 1.0]))
@_settings
def test_containment_prefix_filter_is_exact(spark, texts, threshold):
    """The asymmetric prefix filter (contained side's rarest shingles vs
    the full reference stream + the t·|A| ≤ |B| size prune) must lose NO
    recall: ordered-pair output equals brute-force containment for any
    corpus and threshold, including exact-duplicate docs (containment 1.0
    both directions) and sub-k/empty docs."""
    from ingest_fast_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["ref_id"]): r["containment"]
        for r in containment_pairs(df, k=3, threshold=threshold).collect()
    }
    assert got == _py_containment_pairs(texts, 3, threshold)


@given(_window_docs, st.sampled_from([0.5, 0.8, 1.0]))
@_settings
def test_containment_prefix_filter_exact_on_window_corpora(
    spark, texts, threshold
):
    """Containment exactness under the same df-skew regime that exposed
    the Jaccard prune bug: sliding-window corpora where sub-documents are
    literally contained in longer windows and boundary shingles have very
    different global frequencies."""
    from ingest_fast_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["ref_id"]): r["containment"]
        for r in containment_pairs(df, k=3, threshold=threshold).collect()
    }
    assert got == _py_containment_pairs(texts, 3, threshold)


# --- int8 quantization: bounded reconstruction error ------------------------

_vecs = st.lists(
    st.lists(
        st.floats(
            min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
        ),
        min_size=4,
        max_size=8,
    ),
    min_size=1,
    max_size=6,
)


@given(_vecs)
@_settings
def test_int8_quantization_error_bound(spark, vecs):
    """Symmetric int8 codes must reconstruct within the quantization-step
    bound: per-element error <= scale/2, so L2 error <= scale/2 * sqrt(d);
    and every code must fit in [-127, 127]."""
    import math

    from pyspark.sql import functions as F

    from ingest_fast_spark.queries.llm import embedding_quantize_int8

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    df.createOrReplaceTempView("_quant_in")

    # Drive the same expressions as the registered query via the operator
    # body (load_table is bypassed by calling the expression chain directly).
    v = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    codes = F.when(
        scale == 0, F.transform(v, lambda x: F.lit(0).cast("long"))
    ).otherwise(F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("long")))
    err = F.sqrt(
        F.aggregate(
            F.zip_with(v, codes, lambda x, c: (x - c * scale) * (x - c * scale)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
    )
    rows = df.select(
        "vec_id", scale.alias("scale"), codes.alias("codes"), err.alias("l2_err")
    ).collect()
    for r in rows:
        d = len(vecs[r["vec_id"]])
        assert all(-127 <= c <= 127 for c in r["codes"]), r["codes"]
        bound = (r["scale"] / 2) * math.sqrt(d) + 1e-9
        assert r["l2_err"] <= bound, (r["l2_err"], bound)


# --- substring scrub vs brute-force span removal ------------------------------


def py_scrub(docs: dict, k: int, min_span: int) -> dict:
    """Reference scrub: per (a < b), every maximal run of >= min_span
    consecutive shared k-grams in matching diagonals marks its tokens for
    removal in b; merged per doc; cleaned = surviving tokens."""
    grams = {
        d: {i: tuple(t[i : i + k]) for i in range(len(t) - k + 1)}
        for d, t in docs.items()
    }
    remove: dict = {d: set() for d in docs}
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            # matches on each diagonal pa - pb
            diags: dict = {}
            for pa, ga in grams[a].items():
                for pb, gb in grams[b].items():
                    if ga == gb:
                        diags.setdefault(pa - pb, set()).add(pa)
            for diag, pas in diags.items():
                pas = sorted(pas)
                run = [pas[0]]
                for p in pas[1:] + [None]:
                    if p is not None and p == run[-1] + 1:
                        run.append(p)
                        continue
                    span = len(run) + k - 1
                    if span >= min_span:
                        s = run[0] - diag
                        remove[b].update(range(s, s + span))
                    run = [p] if p is not None else []
    out = {}
    for d, t in docs.items():
        kept = [tok for i, tok in enumerate(t) if i not in remove[d]]
        out[d] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


@given(st.lists(doc_tokens, min_size=1, max_size=6))
@_settings
def test_substring_scrub_matches_reference(spark, corpora):
    from ingest_fast_spark.operators.dedup import substring_scrub

    k, min_span = 3, 4
    docs = {i: toks for i, toks in enumerate(corpora)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in substring_scrub(df, k=k, min_span=min_span).collect()
    }
    # tokens_col of '' yields [''] (one empty token) — mirror that edge
    ref = py_scrub(
        {i: (t if t else [""]) for i, t in docs.items()}, k, min_span
    )
    assert got == ref


# --- DBSCAN vs brute-force reference ------------------------------------------


def py_dbscan(vecs: dict, eps: float, min_pts: int):
    """Reference DBSCAN with the operator's deterministic conventions:
    rounded cosine >= eps, neighborhood includes self, clusters = CC of
    core-core edges labeled by min member id, border -> min core-neighbor
    cluster."""
    import numpy as np

    ids = sorted(vecs)
    m = np.array([vecs[i] for i in ids], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    nbr = {
        a: {b for j, b in enumerate(ids) if b != a and sims[i, j] >= eps}
        for i, a in enumerate(ids)
    }
    core = {a for a in ids if len(nbr[a]) + 1 >= min_pts}
    parent = {a: a for a in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in core:
        for b in nbr[a] & core:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for a in core:
        comp.setdefault(find(a), []).append(a)
    cluster = {a: min(comp[find(a)]) for a in core}
    out = {}
    for a in ids:
        if a in core:
            out[a] = ("core", cluster[a])
        else:
            cn = [cluster[b] for b in nbr[a] if b in core]
            out[a] = ("border", min(cn)) if cn else ("noise", None)
    return out


@given(
    st.lists(
        st.lists(
            st.integers(min_value=-3, max_value=3), min_size=4, max_size=4
        ).filter(lambda v: any(x != 0 for x in v)),
        min_size=2,
        max_size=18,
    ),
    st.sampled_from([0.5, 0.7, 0.9]),
    st.integers(min_value=2, max_value=5),
)
@_settings
def test_dbscan_matches_reference(spark, raw, eps, min_pts):
    from ingest_fast_spark.operators.similarity import dbscan_cosine

    vecs = {i: [float(x) for x in v] for i, v in enumerate(raw)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in dbscan_cosine(df, eps_sim=eps, min_pts=min_pts).collect()
    }
    assert got == py_dbscan(vecs, eps, min_pts)
