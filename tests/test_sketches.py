"""Sketch pre-filters (operators/sketches.py): Bloom membership and
Misra-Gries heavy hitters — the structural guarantees the registered
queries rest on, exercised on adversarial synthetic corpora the sf
testdata can't produce (its vocabulary is ~31 tokens)."""

import random

from pyspark.sql import functions as F

from ingest_fast_spark.operators import sketches as K
from ingest_fast_spark.operators.dedup import shingles_df


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_no_false_negatives(spark):
    # 60 ref docs, 40 probe docs; 15 probes are verbatim copies of refs,
    # so every copied shingle is an exact member and MUST pass the filter.
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(300)]
    ref = [(i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(60)]
    probe = [(1000 + i, ref[i][1]) for i in range(15)] + [
        (2000 + i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(25)
    ]
    ref_sh = shingles_df(_docs(spark, ref))
    probe_sh = shingles_df(_docs(spark, probe))
    rep = K.bloom_probe_report(probe_sh, ref_sh).collect()
    by_id = {r["doc_id"]: r for r in rep}
    for i in range(15):
        r = by_id[1000 + i]
        # a verbatim copy: all shingles are exact members → all must pass
        assert r["n_exact_hits"] == r["n_shingles"]
        assert r["n_bloom_pass"] == r["n_shingles"], "bloom false negative"
    # globally: pass-set ⊇ exact-set, i.e. n_false_pos ≥ 0 everywhere
    assert all(r["n_false_pos"] >= 0 for r in rep)


def test_bloom_bits_bounded(spark):
    ref_sh = shingles_df(
        _docs(spark, [(i, f"a b c d e f g h token{i} x y z") for i in range(50)])
    )
    bits = K.bloom_build_bits(ref_sh)
    n = bits.count()
    assert 0 < n <= K.BLOOM_M
    # distinct positions: the filter content is a set
    assert bits.dropDuplicates(["pos"]).count() == n


def test_heavy_hitters_equal_exact_on_adversarial_corpus(spark):
    # Vocabulary (5000) far above MG capacity (64) so the decrement path
    # runs constantly; a few planted heavy tokens plus a long random tail.
    rng = random.Random(13)
    tokens = ["hot_a"] * 400 + ["hot_b"] * 250 + ["hot_c"] * 120
    tokens += [f"tail{rng.randrange(5000)}" for _ in range(4000)]
    rng.shuffle(tokens)
    # many small docs so tokens spread over partitions
    docs = [
        (i, " ".join(tokens[i * 20 : (i + 1) * 20]))
        for i in range(len(tokens) // 20)
    ]
    d = _docs(spark, docs).repartition(8)
    tk = d.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"))
    inv_phi, capacity = 50, 64  # threshold n/50; capacity+1 > inv_phi holds
    got = {
        r["tok"]: r["cnt"]
        for r in K.heavy_hitters_exact(tk, inv_phi=inv_phi, capacity=capacity).collect()
    }
    exact = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = tk.count()
    want = {
        r["tok"]: r["cnt"]
        for r in exact.filter(F.col("cnt") * inv_phi >= F.lit(total)).collect()
    }
    assert got == want and "hot_a" in got


def test_heavy_hitters_candidate_set_is_bounded(spark):
    rng = random.Random(5)
    tk = spark.createDataFrame(
        [(f"t{rng.randrange(10000)}",) for _ in range(20000)], "tok string"
    ).repartition(8)
    capacity = 32
    n_cand = K.mg_candidates(tk, capacity).count()
    assert n_cand <= capacity * 8


def test_heavy_hitters_rejects_unsound_capacity(spark):
    import pytest

    tk = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError):
        K.heavy_hitters_exact(tk, inv_phi=500, capacity=100)


def test_cms_never_underestimates_and_is_exact_for_isolated_tokens(spark):
    """CMS point estimates are >= true counts for EVERY token (one-sided
    error by construction), and equal them when no other token collides
    in all d rows — checked against a skewed corpus with one dominant
    token (the adversarial case for a counter sketch: the hot token
    inflates whatever shares its buckets, never the reverse)."""
    rng = random.Random(7)
    toks = ["hot"] * 5000 + [f"t{rng.randrange(400)}" for _ in range(5000)]
    tk = spark.createDataFrame([(t,) for t in toks], "tok string")
    cells = {(r["row_i"], r["bucket"]): r["cnt"] for r in K.cms_cells(tk).collect()}
    assert sum(cells.values()) == len(toks) * K.CMS_D  # every occurrence in every row
    import hashlib

    from ingest_fast_spark.operators.dedup import _MINHASH_P

    fams = K._cms_fams()
    exact: dict[str, int] = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    n_exact_within = 0
    for t, n in exact.items():
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _MINHASH_P
        est = min(cells[(i, ((a * h + b) % _MINHASH_P) % K.CMS_W)] for i, (a, b) in enumerate(fams))
        assert est >= n, f"CMS underestimated {t}: {est} < {n}"
        if est * K.CMS_W <= 2.7182819 * len(toks) + n * K.CMS_W:
            n_exact_within += 1
    assert n_exact_within == len(exact)  # e/w bound holds for every token here


def test_hll_registers_match_python_twin_and_merge(spark):
    """The Spark register file equals a brute-force Python HLL over the
    same md5-derived hashes, and MERGING two shards' register files with
    elementwise MAX equals the register file of the union — the property
    that makes HLL the shippable 100 TB distinct counter."""
    import hashlib

    def py_regs(items):
        regs = [0] * K.HLL_M
        for t in items:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            idx, rest = h % K.HLL_M, h >> K.HLL_P
            rho = K.HLL_MAXRHO if rest == 0 else (rest & -rest).bit_length()
            regs[idx] = max(regs[idx], rho)
        return regs

    rng = random.Random(11)
    a = [f"item-{rng.randrange(10_000)}" for _ in range(4000)]
    b = [f"other-{rng.randrange(10_000)}" for _ in range(4000)]

    def spark_regs(items):
        df = spark.createDataFrame([(t,) for t in items], "shingle string")
        got = {r["register"]: r["rho"] for r in K.hll_registers(df, "shingle").collect()}
        assert len(got) == K.HLL_M  # dense: zero registers materialized
        return [got[i] for i in range(K.HLL_M)]

    ra, rb, rab = spark_regs(a), spark_regs(b), spark_regs(a + b)
    assert ra == py_regs(a)
    assert [max(x, y) for x, y in zip(ra, rb)] == rab


def test_hll_estimate_accuracy_and_small_range_correction(spark):
    """Estimate lands within 3 sigma of truth on a 10k-cardinality corpus,
    and the linear-counting branch activates (and is accurate) in the
    tiny-cardinality regime where raw HLL is biased."""
    rng = random.Random(13)
    big = list({f"v{rng.randrange(100_000)}" for _ in range(15_000)})
    df = spark.createDataFrame([(t,) for t in big], "shingle string")
    regs = K.hll_registers(df, "shingle")
    est = K.hll_estimate_micro(regs).collect()[0]["est_micro"] / 1e6
    assert abs(est - len(big)) <= 3 * 1.04 / (K.HLL_M ** 0.5) * len(big)

    small = [f"s{i}" for i in range(40)]  # n << m: linear-counting regime
    regs2 = K.hll_registers(
        spark.createDataFrame([(t,) for t in small], "shingle string"), "shingle"
    )
    est2 = K.hll_estimate_micro(regs2).collect()[0]["est_micro"] / 1e6
    assert abs(est2 - 40) <= 8  # LC is near-exact here; raw HLL would not be


def test_kmv_sketch_matches_python_twin_and_merges(spark):
    """The KMV sketch equals the k smallest distinct md5-hashes computed
    directly, the sketch of a union equals the re-trimmed merge of the
    two sides' sketches (mergeability), and a set smaller than k is
    captured exactly."""
    import hashlib

    def py_kmv(items, k=K.KMV_K):
        hs = {int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in items}
        return sorted(hs)[:k]

    rng = random.Random(17)
    a = [f"a-{rng.randrange(5000)}" for _ in range(3000)]
    b = [f"b-{rng.randrange(5000)}" for _ in range(3000)]

    def spark_kmv(items):
        df = spark.createDataFrame([(t,) for t in items], "s string")
        return [r["h"] for r in K.kmv_sketch(df, "s").collect()]

    ska, skb, skab = spark_kmv(a), spark_kmv(b), spark_kmv(a + b)
    assert ska == py_kmv(a)
    assert sorted(set(ska) | set(skb))[: K.KMV_K] == skab  # mergeable
    small = [f"s{i}" for i in range(40)]
    assert spark_kmv(small) == py_kmv(small)  # |S| < k: sketch IS the set


def test_kmv_sketch_sides_equals_per_side_sketch(spark):
    """The one-pass dual-heap variant (r9-opt) yields EXACTLY the same
    per-side k-min sets as running kmv_sketch per side, on pre-hashed
    input, across multi-partition layouts and a side smaller than k."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.operators.dedup import portable_hash60

    rng = random.Random(23)
    rows = [(i % 2, f"t-{rng.randrange(4000)}") for i in range(6000)]
    rows += [(0, f"rare-{i}") for i in range(30)]  # skewed side content
    df = spark.createDataFrame(rows, "side int, s string").repartition(5)
    hashed = df.select("side", portable_hash60(F.col("s")).alias("h"))
    got = {
        s: sorted(r["h"] for r in grp)
        for s, grp in __import__("itertools").groupby(
            sorted(K.kmv_sketch_sides(hashed).collect(), key=lambda r: r["side"]),
            key=lambda r: r["side"],
        )
    }
    for s in (0, 1):
        want = [
            r["h"]
            for r in K.kmv_sketch(
                df.filter(F.col("side") == s), "s"
            ).collect()
        ]
        assert got[s] == want, f"side {s} diverged"
