"""Deduplication operators for LLM-training-data pipelines (SURVEY.md §2.9).

All of these are shuffle-on-key set operations designed for 100 TB:
  * exact dedup         — hash-groupBy on a content digest; one shuffle.
  * n-gram Jaccard      — shingle → explode → self-join on shingle →
                          overlap count; the join key (shingle) is the
                          blocking key, so only docs sharing a shingle meet.
  * MinHash + LSH       — per-doc signature via xxhash64 (JVM-side, no UDF),
                          banded into buckets; candidate pairs only within a
                          bucket (classic LSH banding), then exact-Jaccard
                          verification of candidates.
  * SimHash             — vectorized (Arrow/pandas) 64-bit signature;
                          near-dups = signatures within a Hamming radius,
                          blocked by 16-bit bands.

Everything degrades gracefully at scale: shingle/band buckets are the
shuffle keys, so skew = popular shingles; the standard mitigation (drop
top-frequency shingles as stop-shingles) is exposed via ``max_doc_freq``.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf resolves
# the UDF's type hints at runtime and PEP-563 string annotations break it.

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import ensure_parallelism


def tokens_col(text, lowercase: bool = True):
    t = F.lower(text) if lowercase else text
    return F.split(F.trim(t), r"\s+")


def let_col(expr, body):
    """Let-binding for Column expressions: evaluate ``expr`` ONCE per row
    and pass the result to ``body`` as a lambda variable.

    Load-bearing wherever a higher-order-function lambda references an
    expensive outer expression (a tokenization, a hash array): Catalyst's
    CollapseProject inlines the expression into every reference and
    codegen does not hoist subexpressions out of lambda bodies, so a
    direct reference inside the lambda re-evaluates the expression once
    PER ARRAY ELEMENT — turning an O(n) per-row array builder into
    O(n^2) (measured: a 20k-token document's positional k-grams took
    79 s; let-bound, milliseconds). The 1-element transform stays fully
    inside whole-stage codegen."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content digest: one hash-aggregate, keeps min id as
    the canonical representative."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """One row per (doc, distinct k-token shingle). JVM-side only:
    split → transform(sequence) → explode."""
    df = ensure_parallelism(df)  # shingling must not serialize onto one scan task
    # Docs shorter than k tokens have NO shingles. The branch is required:
    # Spark's sequence(1, 0) DESCENDS to [1, 0] (it doesn't return empty
    # like DuckDB's generate_series), and slice(toks, 0, k) then throws.
    # Token array let-bound: the per-position slice must not re-tokenize
    # (CollapseProject + in-lambda reference = O(n²), see let_col).
    shingles = let_col(
        tokens_col(F.col(text_col)),
        lambda t: F.when(
            F.size(t) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (k - 1)),
                lambda i: F.array_join(F.slice(t, i, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles)).alias("shingle"),
    )


def shingle_hashes_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """``shingles_df`` carrying each shingle's xxhash64 instead of its
    string — for consumers that only key on shingle IDENTITY (df counts,
    equi-joins): the exploded row that feeds the shuffle is a 16-byte
    (long, long) instead of (long, k-token string), cutting the heaviest
    exchange's bytes ~4-7x (guide §2.3 narrower types). Results are
    identical modulo the documented ~2^-64 hash-collision trade the
    MinHash/prefix-filter family already makes; the hash itself is
    map-side codegen, never shuffled as a string."""
    df = ensure_parallelism(df)
    shingles = let_col(
        tokens_col(F.col(text_col)),
        lambda t: F.when(
            F.size(t) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (k - 1)),
                lambda i: F.xxhash64(F.array_join(F.slice(t, i, k), " ")),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.05,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All (doc_a < doc_b) pairs with k-shingle Jaccard ≥ threshold.

    The shingle self-join only pairs docs that share ≥1 shingle — the
    blocking that keeps this sub-quadratic. ``max_doc_freq`` drops
    ultra-common shingles (skew keys) before the join.
    """
    # Join on the 64-bit shingle hash, not the string: ~2.5× less shuffle
    # and long-vs-long compares. A hash collision would need two distinct
    # shingles in the same corpus to share an xxhash64 (p ≈ n²/2⁶⁵ —
    # ~1e-10 even at a billion distinct shingles).
    if max_doc_freq is None:
        # The per-doc set size is known BEFORE the explode (the shingle
        # array is already distinct), so carry it through as a third
        # column: the sizes aggregate and both size join-backs disappear —
        # the pair groupBy picks n_a/n_b up with max() for free (r9-opt:
        # one corpus-keyed aggregate + two joins removed; the exploded
        # exchange widens by one long).
        sets = doc_shingle_sets(df, text_col, id_col, k)
        sh = sets.select(
            "doc_id",
            F.size("shingles").alias("n_shingles"),
            F.explode(
                F.transform("shingles", lambda s: F.xxhash64(s))
            ).alias("shingle"),
        ).localCheckpoint(eager=True)
        a = sh.select(
            F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"), "shingle"
        )
        b = sh.select(
            F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"), "shingle"
        )
        overlap = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).alias("n_common"),
                F.max("n_a").alias("n_a"),
                F.max("n_b").alias("n_b"),
            )
        )
        return overlap.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        ).filter(F.col("jaccard") >= threshold)

    sh = shingles_df(df, text_col, id_col, k)
    sh = sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    # The shingle list feeds THREE consumers (sizes, join-left, join-right);
    # without materialization each branch re-runs the scan+explode (4
    # FileScans / 4 Generates in the static plan — measured 2.9s → 1.9s at
    # sf0.1). At scale this intermediate is O(corpus tokens): spillable
    # (MEMORY_AND_DISK) and still far cheaper than recomputing the explode
    # per branch.
    sh = sh.localCheckpoint(eager=True)
    # No broadcast hint: distinct k-shingles grow ~linearly with the
    # corpus (unlike unigram vocab), so a forced broadcast is a driver
    # OOM at scale. AQE converts to broadcast when actually small.
    # n_shingles must be the POST-guard count here (the Jaccard
    # denominator uses the df-filtered sets), so the size cannot ride the
    # explode in this branch.
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    sh = sh.join(freq.filter(F.col("df_") <= max_doc_freq), "shingle").drop("df_")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    overlap = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    # sa/sb are one row PER DOC — linear in the corpus, so no broadcast
    # hint (AQE demotes to broadcast at small scale on its own); the
    # overlap side is already pair-sized, far smaller than the corpus.
    return (
        overlap.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_prefix_filter_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard near-dup pairs via prefix filtering (AllPairs,
    Bayardo et al. WWW'07; PPJoin, Xiao et al. WWW'08).

    Order every doc's shingle set by ascending global document frequency
    (rarest first, shingle text as tiebreak — one GLOBAL total order).
    A pair with J ≥ t must share at least one shingle inside each side's
    first ``|S| - ceil(t·|S|) + 1`` shingles (if the prefixes were
    disjoint, the overlap would be < t·|S| ≤ t·max sizes — contradiction).
    So only prefix-shingle collisions become candidates, and exact-Jaccard
    verification of those candidates loses NO recall: the output EQUALS
    the full all-pairs join at the same threshold (the oracle checks
    exactly that, making this algorithm-independently verified).

    Why this is the scale path for high thresholds: the plain
    shingle-blocked join fans out quadratically on FREQUENT shingles (the
    skew keys); prefix filtering joins only on each doc's RAREST shingles,
    so the frequent tail never enters the candidate join at all. At
    t=0.5 the prefix is ~half the set; at t=0.8 ~20%.
    """
    from pyspark.sql import Window

    # Work on the 64-bit shingle hash throughout (same rationale as
    # ngram_jaccard_pairs: ~2.5× smaller shuffles, long-vs-long compares).
    # Collision caveat: Jaccard is computed over HASHES, so a collision
    # perturbs not just a pair's overlap count but also the per-doc set
    # size sz (two distinct shingles within one doc collapsing to one
    # hash) — the "EXACT" guarantee in the docstring holds modulo that
    # ~n²/2⁶⁵ event. Feeds the df-window, the prefix, and both
    # verification sides — materialize once.
    sh = (
        shingles_df(df, text_col, id_col, k)
        .select("doc_id", F.xxhash64("shingle").alias("h"))
        .localCheckpoint(eager=True)
    )
    # Document frequency as an aggregate + equi-join: the df table is one
    # row per DISTINCT shingle (8-byte key + count), so AQE broadcasts it
    # at small scale (no shuffle of sh) and falls back to a shuffle join
    # when the vocabulary outgrows the threshold — strictly better than a
    # window over the shingle partition, which always pays a full sort.
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df_"))
    # ONE doc_id shuffle builds the df-sorted shingle array per doc; the
    # prefix is an array slice and the SAME array feeds verification.
    # (Previous formulation: a row_number window — per-doc sort within a
    # doc_id shuffle — PLUS a second doc_id shuffle to collect_list the
    # verification sets. sort_array over ~doc-sized structs replaces the
    # window sort, and the second shuffle disappears entirely.)
    byd = (
        sh.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df_", "h"))).alias("ranked"))
        .withColumn("sz", F.size("ranked"))
        .withColumn(
            "pre_ranked",
            F.slice(
                "ranked",
                F.lit(1),
                (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int"),
            ),
        )
        .select(
            "doc_id",
            F.transform("ranked", lambda x: x["h"]).alias("hs"),
            "sz",
            F.transform("pre_ranked", lambda x: x["h"]).alias("prefix"),
            # suffix size + last prefix POSITION feed the PPJoin-style
            # overlap-bound prune below. The boundary is carried as the
            # FULL (df_, h) struct: the prune compares positions in the
            # global (df, hash) total order, and the raw hash alone
            # inverts that order whenever the two boundary shingles have
            # different document frequencies — which silently dropped
            # true pairs (the prune would pick the wrong, smaller suffix
            # bound). Struct comparison is lexicographic (df_, then h),
            # i.e. exactly the array_sort order above.
            F.element_at("pre_ranked", -1).alias("bnd"),
        )
        .withColumn("suf", F.col("sz") - F.size("prefix"))
        .localCheckpoint(eager=True)  # feeds candidate explode + both verify sides
    )
    pre = byd.select("doc_id", "sz", "suf", "bnd", F.explode("prefix").alias("h"))
    a = pre.select(
        F.col("doc_id").alias("doc_a"), "h",
        F.col("sz").alias("sz_a"), F.col("suf").alias("suf_a"),
        F.col("bnd").alias("bnd_a"),
    )
    b = pre.select(
        F.col("doc_id").alias("doc_b"), "h",
        F.col("sz").alias("sz_b"), F.col("suf").alias("suf_b"),
        F.col("bnd").alias("bnd_b"),
    )
    # Size-ratio pruning (necessary condition of J ≥ t: t·|A| ≤ |B| ≤ |A|/t)
    # discards most spurious prefix collisions before the dedup shuffle.
    # Then the PPJoin-family overlap-bound prune: the per-pair aggregate
    # (the SAME shuffle a dropDuplicates would pay) counts the common
    # prefix elements o_pre, and the total overlap is bounded by
    # o_pre + suffix of the side whose prefix ends EARLIER in the global
    # (df, hash) order — every common element outside both prefixes
    # consumes a distinct suffix slot of that side (if bnd_a ≤ bnd_b, any
    # common x ≤ bnd_b that B holds is in B's prefix, so each remaining
    # common element lies in A's suffix). Sound, so the exact-verify
    # output is unchanged; at sf5 it cuts verified candidates ~50×.
    ub = F.col("o_pre") + F.when(
        F.col("bnd_a") <= F.col("bnd_b"), F.col("suf_a")
    ).otherwise(F.col("suf_b"))
    cands = (
        a.join(b, "h")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("sz_b") * F.lit(threshold) <= F.col("sz_a"))
            & (F.col("sz_a") * F.lit(threshold) <= F.col("sz_b"))
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("o_pre"),
            F.first("sz_a").alias("sz_a"),
            F.first("sz_b").alias("sz_b"),
            F.first("suf_a").alias("suf_a"),
            F.first("suf_b").alias("suf_b"),
            F.first("bnd_a").alias("bnd_a"),
            F.first("bnd_b").alias("bnd_b"),
        )
        # J ≤ ub/(|A|+|B|−ub) (monotone in overlap); the 1e-9 slack keeps
        # float-boundary pairs for exact verification instead of trusting
        # a floating ceil at the decision edge.
        .filter(
            ub / (F.col("sz_a") + F.col("sz_b") - ub) >= F.lit(threshold) - F.lit(1e-9)
        )
        .select("doc_a", "doc_b")
    )
    sets_a = byd.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("sh_a"))
    sets_b = byd.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def doc_shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct k-shingle set per doc,
    computed once and shared by signature + verification stages."""
    df = ensure_parallelism(df)
    # Same short-doc branch as shingles_df: sequence(1, 0) descends.
    # Token array let-bound (see let_col): slices never re-tokenize.
    shingles = F.array_distinct(
        let_col(
            tokens_col(F.col(text_col)),
            lambda t: F.when(
                F.size(t) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (k - 1)),
                    lambda i: F.array_join(F.slice(t, i, k), " "),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    return df.select(F.col(id_col).alias("doc_id"), shingles.alias("shingles"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """MinHash signature per doc: min over shingles of xxhash64(seedᵢ, s).

    xxhash64 is a deterministic JVM builtin that takes the seed as a
    leading column, so all ``num_hashes`` hash families run inside codegen
    over one shared shingle array — no Python, no ML-library state."""
    sets = doc_shingle_sets(df, text_col, id_col, k)
    # One SQL parse for all num_hashes family mins (the lit_doubles
    # convention) instead of ~7 py4j round-trips per family; identical
    # Catalyst tree, so signatures/buckets/pairs are unchanged.
    sig = F.expr(
        "array("
        + ",".join(
            f"array_min(transform(shingles, s -> xxhash64({i}, s)))"
            for i in range(num_hashes)
        )
        + ")"
    )
    return sets.select("doc_id", "shingles", sig.alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 4
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands; docs sharing
    any full band land in the same bucket → candidate pair. The bucket id
    is the shuffle key."""
    sig_len = F.size("signature")
    rows_per_band = (sig_len / bands).cast("int")
    # Bucket key = polynomial fold of the band's hashes into ONE long (vs
    # a to_json string: ~10× smaller shuffle key; a fold collision merely
    # adds a candidate pair that exact-Jaccard verification discards, so
    # correctness is unaffected).
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.aggregate(
                        F.slice("signature", (b * rows_per_band + 1).cast("int"), rows_per_band),
                        F.lit(1125899906842597).cast("long"),
                        # rotate-left-5 XOR fold: pure bitwise, cannot
                        # overflow under ANSI (a * / + fold would throw)
                        lambda acc, x: F.shiftleft(acc, 5)
                        .bitwiseXOR(F.shiftrightunsigned(acc, 59))
                        .bitwiseXOR(x),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: signatures → banded candidates →
    exact-Jaccard verification of ONLY the candidate pairs.

    Verification joins each candidate pair back to its two (distinct)
    shingle sets and intersects them — O(candidates), never the full
    shingle self-join. At scale the shingle sets ride along the signature
    DataFrame, so this is two broadcast-able joins on doc_id. The carried
    set is the xxhash64 of each shingle (8-byte longs, ~2.5× smaller
    shuffle + cheaper intersects than strings; a collision perturbs one
    pair's Jaccard with probability ~n²/2⁶⁵)."""
    # sigs feeds candidates + both verification sides — materialize once
    # (same 3-consumer recompute pattern as ngram_jaccard_pairs).
    sigs = (
        minhash_signatures(df, text_col, id_col, num_hashes, k)
        .select(
            "doc_id",
            F.transform("shingles", lambda s: F.xxhash64(s)).alias("hv"),
            "signature",
        )
        .localCheckpoint(eager=True)
    )
    cands = minhash_lsh_candidates(sigs.select("doc_id", "signature"), bands)
    sets_a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("hv").alias("sh_a"))
    sets_b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("hv").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- Engine-portable hashing (md5-derived) ----------------------------------
#
# xxhash64 is the fast JVM path, but it exists only in Spark — queries that
# should be oracle-checked against DuckDB need a hash BOTH engines compute
# bit-identically. md5 is that hash: fold the first 15 hex chars (60 bits)
# into a BIGINT. Spark: conv(substr(md5(x),1,15),16,10). DuckDB: digit fold
# via list_reduce (see PORTABLE_HASH60_SQL). Verified identical.

_MINHASH_P = 2147483647  # 2^31-1 (Mersenne prime): keeps a*h+b < 2^62
_FOLD_K = 1000003
_FOLD_M = 1000000007


def portable_hash60(col):
    """60-bit engine-portable hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB twin of ``portable_hash60`` (identical value)."""
    return (
        f"list_reduce(list_transform(string_split(substr(md5({expr}),1,15), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a,b) -> a*16+b)"
    )


def minhash_families(num_hashes: int = 16, seed: int = 20240813) -> list[tuple[int, int]]:
    """Deterministic (a, b) affine-family constants shared by the Spark
    operator and the generated oracle SQL."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MINHASH_P), rng.randrange(0, _MINHASH_P))
        for _ in range(num_hashes)
    ]


def _band_fold(sig, start: int, rows: int):
    """Bucket key for one band: nested modular fold of ``rows`` signature
    slots — an explicit expression (not aggregate/reduce) so the identical
    arithmetic is trivially written in SQL."""
    acc = F.element_at(sig, start + 1).cast("long")
    for j in range(1, rows):
        acc = (acc % _FOLD_M * _FOLD_K + F.element_at(sig, start + 1 + j)) % _FOLD_M
    return acc


def _band_fold_sql(sig_expr: str, start: int, rows: int) -> str:
    acc = f"CAST({sig_expr}[{start + 1}] AS BIGINT)"
    for j in range(1, rows):
        acc = f"((({acc}) % {_FOLD_M}) * {_FOLD_K} + {sig_expr}[{start + 1 + j}]) % {_FOLD_M}"
    return acc


def _portable_sig_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """(doc_id, hv, signature) with engine-portable MinHash values,
    materialized (it always feeds several consumers). ``hv`` is the
    per-shingle UN-modded 60-bit hash array — downstream exact-Jaccard
    verification intersects THESE 8-byte longs, not shingle strings
    (~2.5× smaller verify shuffle, identical result modulo the
    documented ~2⁻⁶⁰ collision trade shared with the prefix filter; the
    mod-P reduction happens only inside the signature arithmetic, so
    sketch collisions never leak into the exact side).

    Two materialization barriers keep the md5 work exactly once per
    shingle: hv is computed in its own checkpointed projection (inside
    one plan Catalyst CollapseProject's the md5 chain into every family:
    measured 16× the hash work, ~3.8s → ~0.9s at sf0.1), then the
    signature is pure modular arithmetic over the materialized hv.

    NEGATIVE RESULT recorded: a vocab-level-hashing pandas UDF (the trick
    that wins 4× for SimHash) measured 4.4s → 5.4s for the full query at
    sf0.1 — k-token SHINGLES are mostly unique per document (unlike
    single-token vocabularies), so batch-level dedup saves almost no md5
    calls and the Arrow string-array transfer is pure overhead. The JVM
    chain stays the default."""
    fams = minhash_families(num_hashes)
    sets = doc_shingle_sets(df, text_col, id_col, k)
    # Filter empty-shingle docs AFTER materialization, not before: a
    # pre-exchange filter on size(shingles) inlines the WHOLE shingling
    # expression and Catalyst pushes it below ensure_parallelism's
    # round-robin exchange, re-computing the full tokenize+shingle chain
    # serially on the single scan task (plan-verified; the md5 Project
    # itself stays above the exchange). Post-checkpoint the test is a
    # cheap size() over the materialized array.
    hv_frame = (
        sets.select(
            "doc_id",
            F.transform("shingles", lambda s: portable_hash60(s)).alias("hv"),
        )
        .localCheckpoint(eager=True)
        .filter(F.size("hv") > 0)
    )
    # hv keeps the FULL 60-bit hash (collision ~2^-60 for the exact-Jaccard
    # intersections downstream); the mod-P reduction happens only here inside
    # the signature arithmetic, where a*h must stay under 2^62.
    # Rendered as ONE SQL parse instead of ~6 py4j round-trips per family
    # (the lit_doubles convention; ~0.2 s of driver latency per plan build
    # across the 8+ queries that ride this frame). Identical Catalyst tree:
    # int literals, Remainder, zip_with/least — integer ops, same order.
    fam_terms = ",".join(
        f"(({a} * (h % {_MINHASH_P}) + {b}) % {_MINHASH_P})" for a, b in fams
    )
    init_sql = "array(" + ",".join(f"CAST({_MINHASH_P} AS BIGINT)" for _ in fams) + ")"
    sig = F.expr(
        f"aggregate(hv, {init_sql}, "
        f"(acc, h) -> zip_with(acc, array({fam_terms}), (x, y) -> least(x, y)))"
    )
    return hv_frame.select("doc_id", "hv", sig.alias("signature")).localCheckpoint(
        eager=True
    )




def _portable_candidates(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """LSH banding over a portable signature frame → distinct (doc_a, doc_b)."""
    rows_per_band = num_hashes // bands
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_fold(F.col("signature"), b * rows_per_band, rows_per_band).alias(
                            "bucket"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_near_dups_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """MinHash-LSH near-dups with ENGINE-PORTABLE hashing, so the full
    pipeline (signature → banded candidates → exact-Jaccard verify) is
    oracle-checkable in DuckDB; see ``minhash_oracle_sql``. Same plan
    shape as ``minhash_near_dups`` (the xxhash64 scale default).
    Verification intersects the per-shingle hash arrays (``hv``), not
    strings — the oracle intersects strings; equal modulo ~2⁻⁶⁰
    collisions (same documented trade as the prefix filter)."""
    sigs = _portable_sig_frame(df, text_col, id_col, num_hashes, k)
    cands = _portable_candidates(sigs, num_hashes, bands)
    sets_a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("hv").alias("sh_a"))
    sets_b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("hv").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_estimate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Sketch-accuracy report: for every verified near-dup pair, the
    MinHash ESTIMATE of Jaccard (fraction of agreeing signature slots —
    the unbiased estimator LSH decisions rest on) next to the exact
    value and the absolute error. This is the query you run before
    picking num_hashes/bands for a 100 TB dedup pass: it turns the
    sketch-size trade-off into measured error on your own corpus."""
    sigs = _portable_sig_frame(df, text_col, id_col, num_hashes, k)
    cands = _portable_candidates(sigs, num_hashes, bands)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hv").alias("sh_a"),
        F.col("signature").alias("sig_a"),
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hv").alias("sh_b"),
        F.col("signature").alias("sig_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    est = F.round(agree / F.lit(float(num_hashes)), 6)
    exact = F.round(inter / union, 6)
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            est.alias("est_jaccard"),
            exact.alias("jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_sql_prefix(num_hashes: int, bands: int) -> str:
    """Shared CTE chain (toks→sets→hs→sigs→banded→cands) for the MinHash
    oracles — identical to the Spark operators by construction."""
    fams = minhash_families(num_hashes)
    rows_per_band = num_hashes // bands
    sig_elems = ", ".join(
        f"list_min(list_transform(hv, h -> ({a} * (h % {_MINHASH_P}) + {b}) % {_MINHASH_P}))"
        for a, b in fams
    )
    band_union = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"{_band_fold_sql('sig', b * rows_per_band, rows_per_band)} AS bucket FROM sigs"
        for b in range(bands)
    )
    return rf"""toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    sets AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> array_to_string(t[i:i+2], ' '))) AS shingles
      FROM toks
    ),
    hs AS (
      SELECT doc_id, shingles,
             list_transform(shingles, s -> {portable_hash60_sql('s')}) AS hv
      FROM sets WHERE len(shingles) > 0
    ),
    sigs AS (SELECT doc_id, shingles, [{sig_elems}] AS sig FROM hs),
    banded AS (
      {band_union}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )"""


def minhash_estimate_oracle_sql(
    num_hashes: int = 16, bands: int = 4, threshold: float = 0.05
) -> str:
    """DuckDB SQL computing EXACTLY ``minhash_estimate_pairs``."""
    agree = (
        f"list_sum(list_transform(generate_series(1, {num_hashes}), "
        f"i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))"
    )
    return f"""
    WITH {_minhash_sql_prefix(num_hashes, bands)},
    scored AS (
      SELECT doc_a, doc_b,
             ROUND({agree} / {float(num_hashes)}, 6) AS est_jaccard,
             ROUND(len(list_intersect(sa.shingles, sb.shingles))
                   / (len(sa.shingles) + len(sb.shingles)
                      - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
      FROM cands
      JOIN sigs sa ON sa.doc_id = doc_a
      JOIN sigs sb ON sb.doc_id = doc_b
    )
    SELECT doc_a, doc_b, est_jaccard, jaccard,
           ROUND(abs(est_jaccard - jaccard), 6) AS abs_err
    FROM scored WHERE jaccard >= {threshold}
    """


def minhash_oracle_sql(
    num_hashes: int = 16, bands: int = 4, threshold: float = 0.05
) -> str:
    """DuckDB SQL computing EXACTLY ``minhash_near_dups_portable`` over the
    ``documents`` view (3-token shingles)."""
    return rf"""
    WITH {_minhash_sql_prefix(num_hashes, bands)},
    verified AS (
      SELECT doc_a, doc_b,
             ROUND(len(list_intersect(sa.shingles, sb.shingles))
                   / (len(sa.shingles) + len(sb.shingles)
                      - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
      FROM cands
      JOIN sigs sa ON sa.doc_id = doc_a
      JOIN sigs sb ON sb.doc_id = doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {threshold}
    """


def bbit_minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    b: int = 4,
    threshold: float = 0.05,
) -> DataFrame:
    """b-bit MinHash (Li & König, WWW 2010): keep only the lowest ``b``
    bits of each signature slot and correct the estimator for random
    collisions. At 100 TB this is THE signature-storage lever — a 16-slot
    b=4 sketch is 8 BYTES per document (vs 128 for the full 64-bit
    signature), so a trillion-document signature table drops from 128 TB
    to 8 TB and the verify-side shuffle shrinks 16×, at a quantified
    accuracy cost this query measures on the corpus itself.

    For every LSH-verified candidate pair it emits the exact Jaccard, the
    full-width estimate (fraction of agreeing slots), the b-bit estimate
    after the collision correction Ĵ_b = (A_b − C)/(1 − C) with
    C = 2^−b (the Li-König r→0 form; exact arithmetic: (agree − 1)/15
    for 16 slots, b = 4), and both absolute errors — the report you read
    before committing a corpus-wide sketch width.

    Engine-portable end to end (md5-derived families, integer masks,
    single final division) — oracle-exact via ``bbit_minhash_oracle_sql``.
    Plan shape identical to ``minhash_estimate_pairs``: one signature
    frame, banded candidates, pair join; the b-bit truncation is free
    column arithmetic."""
    mod = 1 << b
    sigs = _portable_sig_frame(df, text_col, id_col, num_hashes, k)
    cands = _portable_candidates(sigs, num_hashes, bands)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hv").alias("sh_a"),
        F.col("signature").alias("sig_a"),
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hv").alias("sh_b"),
        F.col("signature").alias("sig_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    agree_full = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e)
    )
    agree_b = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x % mod == y % mod),
            lambda e: e,
        )
    )
    est_full = F.round(agree_full / F.lit(float(num_hashes)), 6)
    # (A_b - C) / (1 - C) with C = 1/mod over num_hashes slots reduces to
    # integer (agree_b - num_hashes/mod) / (num_hashes - num_hashes/mod).
    c_slots = num_hashes // mod  # expected colliding slots under J=0
    est_b = F.round(
        F.greatest(agree_b - F.lit(c_slots), F.lit(0))
        / F.lit(float(num_hashes - c_slots)),
        6,
    )
    exact = F.round(inter / union, 6)
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            exact.alias("jaccard"),
            est_full.alias("est_full"),
            est_b.alias("est_bbit"),
            F.round(F.abs(est_full - exact), 6).alias("err_full"),
            F.round(F.abs(est_b - exact), 6).alias("err_bbit"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def bbit_minhash_oracle_sql(
    num_hashes: int = 16, bands: int = 4, b: int = 4, threshold: float = 0.05
) -> str:
    """DuckDB SQL computing EXACTLY ``bbit_minhash_pairs``."""
    mod = 1 << b
    c_slots = num_hashes // mod
    agree_full = (
        f"list_sum(list_transform(generate_series(1, {num_hashes}), "
        f"i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))"
    )
    agree_b = (
        f"list_sum(list_transform(generate_series(1, {num_hashes}), "
        f"i -> CASE WHEN sa.sig[i] % {mod} = sb.sig[i] % {mod} THEN 1 ELSE 0 END))"
    )
    return f"""
    WITH {_minhash_sql_prefix(num_hashes, bands)},
    scored AS (
      SELECT doc_a, doc_b,
             ROUND(len(list_intersect(sa.shingles, sb.shingles))
                   / (len(sa.shingles) + len(sb.shingles)
                      - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard,
             ROUND({agree_full} / {float(num_hashes)}, 6) AS est_full,
             ROUND(greatest({agree_b} - {c_slots}, 0)
                   / {float(num_hashes - c_slots)}, 6) AS est_bbit
      FROM cands
      JOIN sigs sa ON sa.doc_id = doc_a
      JOIN sigs sb ON sb.doc_id = doc_b
    )
    SELECT doc_a, doc_b, jaccard, est_full, est_bbit,
           ROUND(abs(est_full - jaccard), 6) AS err_full,
           ROUND(abs(est_bbit - jaccard), 6) AS err_bbit
    FROM scored WHERE jaccard >= {threshold}
    """


# --- SimHash ----------------------------------------------------------------

def simhash_signatures_exploded(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash fully JVM-side: explode distinct tokens, xxhash64,
    and 64 conditional-sum aggregate expressions for the per-bit majority
    vote.

    MEASURED SLOWER than the Arrow/pandas path at sf0.1 (2.2s vs 0.5s
    warm): the explode materializes |doc|×|tokens| rows and each feeds 64
    aggregate expressions (~160M ops), while the pandas path hashes each
    distinct vocabulary token once (~30k md5 calls) and gathers. Kept as
    the all-JVM alternative for Python-less deployments.
    """
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    exploded = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"v{i}")
        for i in range(64)
    ]
    voted = exploded.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return voted.select("doc_id", sig.alias("simhash"))


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc — DEFAULT implementation: Arrow-batched
    pandas UDF with vocabulary-level hashing (each distinct token hashed
    once per batch, md5-derived so signatures are stable across engines
    and runs). Beats the all-JVM exploded formulation ~4× at sf0.1; see
    ``simhash_signatures_exploded`` for the measurement notes."""
    import pandas as pd
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def simhash64(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        shifts = np.arange(64, dtype=np.uint64)
        powers = (np.uint64(1) << shifts).astype(np.uint64)
        # Hash each DISTINCT token once per Arrow batch (documents share
        # most of their vocabulary, so this cuts md5 calls ~100×), then a
        # doc's vote vector is one row-gather + sum over the ±1 matrix.
        token_sets = [set((t or "").lower().split()) for t in texts]
        vocab = sorted(set().union(*token_sets)) if token_sets else []
        index = {tok: i for i, tok in enumerate(vocab)}
        hashes = np.array(
            [
                int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
                for t in vocab
            ],
            dtype=np.uint64,
        )
        signs = (
            ((hashes[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int8) * 2 - 1
        ) if len(vocab) else np.zeros((0, 64), dtype=np.int8)

        out = np.zeros(len(texts), dtype=np.int64)
        for i, tokens in enumerate(token_sets):
            if not tokens:
                continue
            votes = signs[[index[t] for t in tokens]].sum(axis=0, dtype=np.int64)
            out[i] = (powers[votes > 0]).sum(dtype=np.uint64).astype(np.int64)
        return pd.Series(out)

    return ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("simhash")
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dups = SimHash pairs within a Hamming radius, blocked on 16-bit
    bands (a pair within distance d ≤ 3 must agree on ≥1 of 4 bands; for
    larger d this is a recall-tuned heuristic, the standard trade-off)."""
    # Both join sides read the signatures — materialize so the pandas-UDF
    # signature computation runs once, not per branch.
    sigs = simhash_signatures(df, text_col, id_col).localCheckpoint(eager=True)
    band = lambda c, i: F.shiftrightunsigned(c, i * 16).bitwiseAND(F.lit(0xFFFF))  # noqa: E731
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("band"), band(F.col("simhash"), i).alias("key")) for i in range(4)])
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = banded.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "key")
    b = banded.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "key")
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_dups_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    nbits: int = 60,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dups with ENGINE-PORTABLE hashing (60-bit signature
    from the md5-derived token hash), oracle-checkable in DuckDB via
    ``simhash_oracle_sql``. At hamming ≤ 3 the 4-band blocking is EXACT
    (pigeonhole: some band must be untouched), same as the 64-bit variant.

    The signature is carried as ``bands`` per-band integers (15 bits each)
    rather than one assembled 60-bit word — banding needs the pieces
    anyway and hamming is the sum of per-band ``bit_count(xor)``.

    Signature stage: Arrow-batched pandas UDF with VOCAB-LEVEL hashing —
    each distinct token in a batch is md5'd once (documents share most of
    their vocabulary, ~100× fewer hashes than per-(doc,token) work), then a
    doc's vote vector is a row-gather + sum over the ±1 matrix. The hash
    is ``int(md5hex[:15], 16)`` — bit-identical to ``portable_hash60`` /
    the DuckDB digit fold, so the oracle still re-derives exact bands.
    Tokenization stays JVM-side (same split as the oracle); an all-JVM
    explode + 60-conditional-sum formulation measured ~2× slower at sf0.1
    (60M aggregate updates vs ~50k md5 calls + numpy gathers).

    Null-text docs are dropped (both the oracle's ``unnest(NULL)`` and the
    explode formulation drop them; the UDF path filters to match)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    bits_per_band = nbits // bands
    sig_schema = StructType([StructField(f"b{i}", LongType()) for i in range(bands)])

    @F.pandas_udf(sig_schema)
    def bandsig(toks: pd.Series) -> pd.DataFrame:
        import hashlib

        import numpy as np

        shifts = np.arange(nbits, dtype=np.uint64)
        token_sets = [set(t) if t is not None else set() for t in toks]
        vocab = sorted(set().union(*token_sets)) if token_sets else []
        index = {tok: i for i, tok in enumerate(vocab)}
        hashes = np.array(
            [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16) for t in vocab],
            dtype=np.uint64,
        )
        signs = (
            (((hashes[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int8) * 2 - 1)
            if len(vocab)
            else np.zeros((0, nbits), dtype=np.int8)
        )
        powers = np.uint64(1) << np.arange(bits_per_band, dtype=np.uint64)
        out = np.zeros((len(token_sets), bands), dtype=np.int64)
        for i, tokens in enumerate(token_sets):
            if not tokens:
                continue
            votes = signs[[index[t] for t in tokens]].sum(axis=0, dtype=np.int64)
            bits = votes > 0
            for bnd in range(bands):
                seg = bits[bnd * bits_per_band : (bnd + 1) * bits_per_band]
                out[i, bnd] = int(powers[seg].sum(dtype=np.uint64))
        return pd.DataFrame(out, columns=[f"b{i}" for i in range(bands)])

    toks = F.array_distinct(tokens_col(F.col(text_col)))
    sigs = (
        ensure_parallelism(df.filter(F.col(text_col).isNotNull()))
        .select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .select("doc_id", bandsig("toks").alias("sig"))
        .select("doc_id", *[F.col(f"sig.b{i}").alias(f"b{i}") for i in range(bands)])
        .localCheckpoint(eager=True)
    )
    bnames = [f"b{i}" for i in range(bands)]
    banded = sigs.select(
        "doc_id",
        *bnames,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("key"))
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", *bnames, F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(b).alias(f"a_{b}") for b in bnames],
        "band",
        "key",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(bn).alias(f"b_{bn}") for bn in bnames],
        "band",
        "key",
    )
    hamming = None
    for bn in bnames:
        term = F.bit_count(F.col(f"a_{bn}").bitwiseXOR(F.col(f"b_{bn}")))
        hamming = term if hamming is None else hamming + term
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_oracle_sql(max_hamming: int = 3, nbits: int = 60, bands: int = 4) -> str:
    """DuckDB SQL computing EXACTLY ``simhash_near_dups_portable`` over the
    ``documents`` view."""
    bits_per_band = nbits // bands
    vote_cols = ",\n             ".join(
        f"SUM(((hv >> {i}) & 1) * 2 - 1) AS v{i}" for i in range(nbits)
    )
    band_exprs = []
    for bnd in range(bands):
        terms = " + ".join(
            f"(CASE WHEN v{bnd * bits_per_band + j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(bits_per_band)
        )
        band_exprs.append(f"CAST({terms} AS BIGINT) AS b{bnd}")
    bnames = [f"b{i}" for i in range(bands)]
    ham = " + ".join(f"bit_count(xor(a.{b}, b.{b}))" for b in bnames)
    any_band = " OR ".join(f"a.{b} = b.{b}" for b in bnames)
    return rf"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS tok
      FROM documents
    ),
    h AS (SELECT doc_id, {portable_hash60_sql('tok')} AS hv FROM toks),
    votes AS (
      SELECT doc_id,
             {vote_cols}
      FROM h GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, {', '.join(band_exprs)} FROM votes),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST({ham} AS BIGINT) AS hamming
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({any_band})
    )
    SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {max_hamming}
    """


# --- Exact-substring dedup (suffix-array-family signal) ---------------------

def positional_kgrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """One row per (doc, position, k-token gram) — positions preserved
    (unlike ``shingles_df``, which is distinct-set semantics). The token
    array is let-bound (``let_col``) so the per-position slice never
    re-tokenizes the document — megatoken docs stay O(n·k), not O(n²)."""
    df = ensure_parallelism(df)
    grams = let_col(
        tokens_col(F.col(text_col)),
        lambda t: F.when(
            F.size(t) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (k - 1)),
                lambda i: F.array_join(F.slice(t, i, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(grams).alias("pos", "gram")
    )


def substring_span_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_span: int = 15,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact-substring dedup signal (the suffix-array method of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    re-expressed relationally): for every doc pair, the length in tokens
    of the LONGEST exactly-shared token span, for spans >= ``min_span``.

    A shared span of s tokens is a maximal DIAGONAL RUN of s-k+1 matching
    k-grams: matching grams at positions (pa, pb) with constant pa-pb and
    consecutive pa chain into one span. So: positional k-grams → equi-join
    on the gram (the blocking key — only docs sharing an 8-gram ever
    meet, same shape as ``ngram_contamination``) → per (pair, diagonal)
    gaps-and-islands over pa → max island + k - 1.

    Scale: the join shuffles on 8-byte xxhash64 gram keys; 8-grams are
    near-unique outside true duplication, so fan-out tracks actual shared
    text. Boilerplate-heavy corpora use ``max_doc_freq`` to drop grams in
    more than that many POSTINGS before the join (the stop-gram guard,
    same trade as ``ngram_jaccard_pairs``). A maximal run cut by a
    dropped gram under-reports its span — guarded runs are a lower bound,
    exactly like dropped stop-shingles under-report Jaccard.
    """
    from pyspark.sql import Window

    g = positional_kgrams(df, text_col, id_col, k).select(
        "doc_id", "pos", F.xxhash64("gram").alias("g")
    )
    if max_doc_freq is not None:
        # Hint-free: distinct positional k-grams grow ~linearly with the
        # corpus; AQE broadcasts when the filtered side is actually small.
        freq = g.groupBy("g").agg(F.count(F.lit(1)).alias("df_"))
        g = g.join(freq.filter(F.col("df_") <= max_doc_freq), "g").drop("df_")
    g = g.localCheckpoint(eager=True)  # feeds both join sides
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g")
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g")
    m = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = m.withColumn("grp", F.col("pa") - F.row_number().over(w))
    islands = runs.groupBy("doc_a", "doc_b", "diag", "grp").agg(
        F.count(F.lit(1)).alias("run")
    )
    return (
        islands.groupBy("doc_a", "doc_b")
        .agg((F.max("run") + F.lit(k - 1)).cast("long").alias("max_span_tokens"))
        .filter(F.col("max_span_tokens") >= min_span)
    )


def substring_span_oracle_sql(k: int = 8, min_span: int = 15) -> str:
    """DuckDB SQL computing EXACTLY ``substring_span_pairs`` over the
    ``documents`` view (join on gram strings; the Spark side joins on
    xxhash64 of the gram — identical pairs modulo 64-bit collisions)."""
    return rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(generate_series(1, greatest(len(t) - {k - 1}, 0))) AS pos,
             unnest(list_transform(generate_series(1, greatest(len(t) - {k - 1}, 0)),
                                   i -> array_to_string(t[i:i+{k - 1}], ' '))) AS g
      FROM toks
    ),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
             a.pos - b.pos AS diag
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT doc_a, doc_b, diag, pa,
             pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
      FROM m
    ),
    islands AS (
      SELECT doc_a, doc_b, COUNT(*) AS run
      FROM runs GROUP BY doc_a, doc_b, diag, grp
    )
    SELECT doc_a, doc_b, CAST(MAX(run) + {k - 1} AS BIGINT) AS max_span_tokens
    FROM islands GROUP BY doc_a, doc_b
    HAVING MAX(run) + {k - 1} >= {min_span}
    """


# --- Content-defined chunking (rsync/LBFS-family) ---------------------------

_CDC_K = 1000003          # rolling-hash base
_CDC_M = 1000000007       # rolling-hash modulus
_CDC_W = 4                # rolling window (tokens)
_CDC_D = 16               # boundary divisor → expected chunk ≈ D tokens


def cdc_chunks(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per (doc, chunk): CONTENT-DEFINED chunk boundaries via a
    rolling hash over the last ``_CDC_W`` token hashes — a boundary falls
    after token i when the window hash ≡ 0 (mod ``_CDC_D``), so
    boundaries move WITH the content (insert one token and only the
    chunks around the edit change — the rsync/LBFS/storage-dedup
    property that fixed-size blocks lack; cf. Muthitacharoen et al.
    SOSP'01). Engine-portable arithmetic (md5-derived token hash, modular
    polynomial), so DuckDB re-derives identical boundaries.

    All map-side: tokens → hashes → boundary positions → chunk slices,
    one explode. Shuffle only happens in whatever aggregates downstream.

    The token-hash array is materialized behind a localCheckpoint BEFORE
    the boundary filter touches it: ``element_at(<transform expr>, i)``
    inside the filter lambda gets CollapseProject'd by Catalyst into
    every window access, re-running the md5 chain O(n·W) times per doc —
    the same 16×-hash-work trap measured for the portable MinHash
    signatures (here: 14s → 1.3s warm at sf0.1).
    """
    df = ensure_parallelism(df)
    toks = tokens_col(F.col(text_col))
    kpow = [pow(_CDC_K, j, _CDC_M) for j in range(_CDC_W)]

    hashed = (
        df.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("t"),
            F.transform(toks, lambda s: portable_hash60(s) % _MINHASH_P).alias("th"),
        )
        .filter(F.size("t") > 0)
        .localCheckpoint(eager=True)
    )
    n = F.size("t")
    th = F.col("th")

    def rolling(i):
        # window hash of tokens (i-W+1 .. i), 1-based index i ≥ W
        acc = None
        for j in range(_CDC_W):
            term = (F.element_at(th, i - F.lit(j)) * F.lit(kpow[j])) % F.lit(_CDC_M)
            acc = term if acc is None else acc + term
        return acc % F.lit(_CDC_M)

    cuts = F.when(
        n >= _CDC_W,
        F.filter(
            F.sequence(F.lit(_CDC_W), n),
            lambda i: rolling(i) % _CDC_D == F.lit(0),
        ),
    ).otherwise(F.array().cast("array<int>"))

    with_cuts = hashed.select(
        "doc_id", "t", n.alias("n"), cuts.alias("cuts")
    )
    nc = F.size("cuts")
    starts = F.concat(F.array(F.lit(1)), F.transform("cuts", lambda c: c + 1))
    ends = F.concat("cuts", F.array(F.col("n")))
    chunk_at = lambda ci: F.array_join(  # noqa: E731
        F.slice(
            "t",
            F.element_at(starts, ci),
            F.element_at(ends, ci) - F.element_at(starts, ci) + 1,
        ),
        " ",
    )
    chunks = F.filter(
        F.transform(F.sequence(F.lit(1), nc + 1), chunk_at),
        lambda c: F.length(c) > 0,
    )
    return with_cuts.select("doc_id", F.explode(chunks).alias("chunk"))


def cdc_chunk_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level chunk-dedup report: how much of the corpus is
    REDUNDANT at content-defined-chunk granularity — total vs distinct
    chunks, token-weighted, and the dedup ratio (fraction of chunk
    tokens that a chunk-store would NOT store again). One digest
    hash-aggregate; the standard sizing measurement before building a
    chunk-level store or delta-encoding a crawl."""
    ch = cdc_chunks(df, text_col, id_col).select(
        F.md5("chunk").alias("dg"),
        F.size(F.split("chunk", " ")).alias("sz"),
    )
    per_digest = ch.groupBy("dg").agg(
        F.count(F.lit(1)).alias("copies"), F.first("sz").alias("sz")
    )
    return per_digest.agg(
        F.sum("copies").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.sum(F.col("copies") * F.col("sz")).cast("long").alias("total_chunk_tokens"),
        F.sum("sz").cast("long").alias("distinct_chunk_tokens"),
    ).select(
        "n_chunks",
        "n_distinct_chunks",
        "total_chunk_tokens",
        "distinct_chunk_tokens",
        F.round(
            1 - F.col("distinct_chunk_tokens") / F.col("total_chunk_tokens"), 6
        ).alias("dedup_ratio"),
    )


def cdc_oracle_sql() -> str:
    """DuckDB SQL computing EXACTLY ``cdc_chunk_stats`` over ``documents``."""
    kpow = [pow(_CDC_K, j, _CDC_M) for j in range(_CDC_W)]
    rh = " + ".join(
        f"(h[i - {j}] * {kpow[j]}) % {_CDC_M}" for j in range(_CDC_W)
    )
    return rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents WHERE text IS NOT NULL
    ),
    th AS (
      SELECT doc_id, t, len(t) AS n,
             list_transform(t, s -> {portable_hash60_sql('s')} % {_MINHASH_P}) AS h
      FROM toks WHERE len(t) > 0
    ),
    b AS (
      SELECT doc_id, t, n,
             CASE WHEN n >= {_CDC_W} THEN
               list_filter(generate_series({_CDC_W}, n),
                           i -> (({rh}) % {_CDC_M}) % {_CDC_D} = 0)
             ELSE [] END AS cuts
      FROM th
    ),
    chunks AS (
      SELECT doc_id, unnest(list_filter(
        list_transform(generate_series(1, len(cuts) + 1),
          ci -> array_to_string(
            t[CASE WHEN ci = 1 THEN 1 ELSE cuts[ci - 1] + 1 END :
              CASE WHEN ci = len(cuts) + 1 THEN n ELSE cuts[ci] END], ' ')),
        c -> length(c) > 0)) AS chunk
      FROM b
    ),
    sized AS (
      SELECT md5(chunk) AS dg, len(string_split(chunk, ' ')) AS sz FROM chunks
    ),
    per AS (SELECT dg, COUNT(*) AS copies, MIN(sz) AS sz FROM sized GROUP BY dg)
    SELECT CAST(SUM(copies) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
           CAST(SUM(copies * sz) AS BIGINT) AS total_chunk_tokens,
           CAST(SUM(sz) AS BIGINT) AS distinct_chunk_tokens,
           ROUND(1 - SUM(sz) / CAST(SUM(copies * sz) AS DOUBLE), 6) AS dedup_ratio
    FROM per
    """


# --- Paragraph-level dedup (C4/RefinedWeb-style) ----------------------------

def paragraph_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", sep: str = "\n"
) -> DataFrame:
    """Corpus-wide paragraph dedup: split each doc on ``sep``, keep only the
    FIRST occurrence of every distinct paragraph (ordered by doc_id, then
    position — the deterministic stand-in for crawl order), and reassemble
    each doc from its surviving paragraphs in original order.

    This is the boilerplate-removal pass of C4-style pipelines: repeated
    nav/footer/license paragraphs collapse to their first sighting. Docs
    whose every paragraph was seen earlier vanish entirely.

    Scale shape: one shuffle keyed by paragraph content (the window
    partition), one shuffle back on doc_id for reassembly. Paragraph keys
    are naturally high-cardinality; the pathological key (the empty
    paragraph) is dropped up front.
    """
    from pyspark.sql import Window

    paras = (
        ensure_parallelism(df)
        .select(id_col, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"))
        .filter(F.length("para") > 0)
    )
    w = Window.partitionBy("para").orderBy(id_col, "pos")
    kept = paras.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_paras_kept"),
        )
    )


def boilerplate_line_scrub(
    df: DataFrame,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """CCNet/RefinedWeb-style line-frequency boilerplate removal: a line
    that occurs in ``min_df`` or more DISTINCT documents is boilerplate
    and is dropped from EVERY document (unlike ``paragraph_dedup``, which
    keeps the first sighting). Documents are reassembled from surviving
    lines in original order; a document whose every line was boilerplate
    survives with ``text_clean = ''`` (it is the caller's policy whether
    to drop empties).

    Returns (doc_id, text_clean, n_lines_kept, n_lines_dropped), one row
    per input document.

    Scale shape: the line document-frequency table is a two-phase
    count-distinct hash aggregate keyed by the line (at 100 TB you would
    key on ``xxhash64(line)``; kept textual here so the DuckDB oracle can
    re-derive it byte-for-byte), then an inner join back to the exploded
    lines on the same key, then a reassembly groupBy on doc_id. The join
    key is skew-prone BY CONSTRUCTION — boilerplate is the hot key — but
    the build side is pre-aggregated to one row per distinct line, so the
    hot key is hot only on the probe side and AQE's skew-join split
    (session default) keeps tasks bounded.
    """
    docs = ensure_parallelism(df)
    lines = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    ).filter(F.length("line") > 0)
    line_df = lines.groupBy("line").agg(
        F.count_distinct(F.col(id_col)).alias("line_df")
    )
    flagged = lines.join(line_df, "line").select(
        id_col, "pos", "line", (F.col("line_df") < F.lit(min_df)).alias("keep")
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "line", "keep"))),
                    lambda s: s["keep"],
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text_clean"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_lines_kept"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).cast("long").alias("n_lines_dropped"),
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
            F.coalesce("n_lines_dropped", F.lit(0)).cast("long").alias("n_lines_dropped"),
        )
    )


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Benchmark decontamination: find training docs sharing any k-token
    shingle with a held-out benchmark/eval corpus (the standard n-gram
    overlap check run before LLM training; cf. GPT-3 appendix C /
    PaLM-style 8-gram decontamination).

    Returns (doc_id, n_hit_grams) for contaminated training docs —
    n_hit_grams = number of DISTINCT shared shingles (shingles_df emits
    per-doc distinct shingles, so a plain count suffices).

    Scale shape: the benchmark side is tiny relative to the corpus
    (eval suites are MBs; the corpus is TBs), so its distinct shingle
    hashes BROADCAST — the training side is a map-only probe with no
    shuffle of the big side before the per-doc count. Joining on
    xxhash64(shingle) keeps the broadcast table and the probe keys at 8
    bytes per shingle instead of full strings.
    """
    tr = shingles_df(train, text_col, id_col, k).select(
        "doc_id", F.xxhash64("shingle").alias("g")
    )
    be = (
        shingles_df(bench, text_col, id_col, k)
        .select(F.xxhash64("shingle").alias("bench_g"))
        .distinct()
    )
    return (
        tr.join(F.broadcast(be), tr.g == be.bench_g)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.9,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: ordered pairs (doc_id, ref_id)
    where doc_id's k-shingle set is ≥ ``threshold`` CONTAINED in
    ref_id's (overlap / |shingles(doc)|). This is the quote/boilerplate/
    subset case symmetric Jaccard systematically misses: a 100-word doc
    fully embedded in a 10,000-word doc has containment 1.0 but Jaccard
    ≈ 0.01.

    Candidates come from an ASYMMETRIC prefix filter (the containment
    analogue of ``jaccard_prefix_filter_pairs``): if |A∩B| ≥ ⌈t·|A|⌉
    then A's ``|A| − ⌈t·|A|⌉ + 1`` globally-rarest shingles must hit B
    (pigeonhole — A has fewer non-common elements than the prefix is
    long), so the candidate join is A's ~(1−t) prefix against the full
    reference stream instead of full×full: the frequent-shingle fan-out
    only ever pays on the short prefix side. Candidates verify exactly
    from the df-sorted arrays, so the output equals the plain blocked
    join (the oracle checks against brute force)."""
    sh = shingles_df(df, text_col, id_col, k)
    sh = sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    sh = sh.localCheckpoint(eager=True)  # feeds df + the per-doc arrays
    if max_doc_freq is not None:
        # Hint-free joins: the distinct-shingle df table is ~linear in the
        # corpus; AQE broadcasts it while it is small.
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        freq = freq.filter(F.col("df_") <= max_doc_freq)
        sh = sh.join(freq, "shingle").drop("df_")
        ranked_src = sh.join(freq, "shingle")
    else:
        # One aggregate carries BOTH the doc frequency and the doc list —
        # (shingle, df_, docs) exploded back to (doc_id, df_, shingle) —
        # so the corpus-sized shingle stream crosses exactly TWO
        # exchanges (by shingle, then by doc below) instead of three
        # (freq agg + the freq join's re-shuffle + the doc group): r10,
        # guide §2.4; x10 phase-split had this stage at 3.5 s of the
        # 4.9 s total. (doc_id, shingle) is unique by construction
        # (array_distinct upstream), so count(*) == doc frequency.
        ranked_src = (
            sh.groupBy("shingle")
            .agg(
                F.count(F.lit(1)).alias("df_"),
                F.collect_list("doc_id").alias("ds"),
            )
            .select("df_", "shingle", F.explode("ds").alias("doc_id"))
        )
    byd = (
        ranked_src
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df_", "shingle"))).alias("ranked"))
        .select(
            "doc_id",
            F.transform("ranked", lambda x: x["shingle"]).alias("hs"),
            F.size("ranked").alias("sz"),
        )
        .withColumn(
            "prefix",
            F.slice(
                "hs",
                1,
                (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int"),
            ),
        )
        .localCheckpoint(eager=True)  # feeds candidates + both verify sides
    )
    pre = byd.select("doc_id", F.col("sz").alias("n_doc"), F.explode("prefix").alias("shingle"))
    full = byd.select(
        F.col("doc_id").alias("ref_id"),
        F.col("sz").alias("n_ref"),
        F.explode("hs").alias("shingle"),
    )
    cands = (
        pre.join(full, "shingle")
        .filter(
            (F.col("doc_id") != F.col("ref_id"))
            # |A∩B| ≤ |B|, so t·|A| ≤ |B| is necessary — prunes the
            # big-doc-contained-in-small-doc direction before the dedup.
            & (F.col("n_ref") >= F.lit(threshold) * F.col("n_doc"))
        )
        .select("doc_id", "ref_id")
        .dropDuplicates(["doc_id", "ref_id"])
    )
    sa = byd.select("doc_id", F.col("hs").alias("hs_a"), F.col("sz").alias("n_doc"))
    sb = byd.select(
        F.col("doc_id").alias("ref_id"),
        F.col("hs").alias("hs_b"),
        F.col("sz").alias("n_ref"),
    )
    n_common = F.size(F.array_intersect("hs_a", "hs_b"))
    return (
        cands.join(sa, "doc_id")
        .join(sb, "ref_id")
        .select(
            "doc_id",
            "ref_id",
            F.round(n_common / F.col("n_doc"), 6).alias("containment"),
            F.round(
                n_common / (F.col("n_doc") + F.col("n_ref") - n_common), 6
            ).alias("jaccard"),
            n_common.alias("n_common"),
        )
        .filter(F.col("containment") >= threshold)
    )


def minhash_candidate_pairs_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Banded LSH candidate pairs WITHOUT verification — the raw recall
    surface of the sketch, exposed so evaluation queries (the S-curve
    report) can measure which true pairs the banding does/doesn't
    surface."""
    sigs = _portable_sig_frame(df, text_col, id_col, num_hashes, k)
    return _portable_candidates(sigs, num_hashes, bands)


# --- Winnowing fingerprints (Schleimer, Wilkinson & Aiken, SIGMOD 2003) -----

WINNOW_HASH_MOD = 1 << 40  # fingerprint hash space (portable md5 fold)
# In-row composite radix: h * 2^23 + (2^23-1 - local_j) stays a PRIMITIVE
# long ((2^40-1)*2^23 + 2^23-1 = 2^63-1 exactly fills int64), so window
# minima and dedup run on primitive arrays — no struct allocation.
_WINNOW_LOCAL_MOD = 1 << 23
# Oracle-side composite radix: h * 2^63 + (2^63-1 - pos) in HUGEINT gives
# integer order (h asc, pos desc) for ANY position — no positional cap.
_WINNOW_POS_BIG = 1 << 63
# Grams per chunk row: a chunk carries ~256 KiB of text, so the in-row
# hash/window arrays stay a few MB per task regardless of document size.
WINNOW_CHUNK_GRAMS = 1 << 18


# Memoized winnowing selection trees keyed (k, w, chunk, portable) — see
# the note at the bottom of _winnow_chunk_selects.
_WINNOW_SELS_CACHE: dict = {}


def _winnow_chunk_selects(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    w: int,
    chunk: int,
    portable: bool,
):
    """Map-only winnowing core: one output row per (document, chunk) with
    ``g0`` (the chunk's first hashed gram position, 1-based global) and
    the chunk's selected fingerprints as ``sels: array<long>`` of
    composites ``h * 2^23 + (2^23 - 1 - j)`` over LOCAL gram index j —
    integer order = (hash asc, position desc) = the MOSS rightmost-tie
    rule, decoded downstream as ``h = sel div 2^23``,
    ``pos = g0 + (2^23 - 1 - sel mod 2^23) - 1``.

    The selection is computed IN-ROW with array HOFs over PRIMITIVE
    longs — hash every k-char gram, take each w-window's minimum
    composite, drop adjacent duplicates in O(m) (a dethroned window
    minimum can never return within its span, so equal selections are
    always consecutive) — the per-character gram stream never leaves the
    map task, and no struct allocation or O(s²) struct-array_distinct
    touches the hot loop (the struct formulation measured 70 s at sf5;
    primitive composites cut the selection cost itself to hashing).
    Long documents are chunked explicitly: chunk ``c`` re-hashes the
    ``w - 1`` grams before its first owned window end (substr is cheap;
    g0 keeps positions GLOBAL), so every window of the document is
    computed exactly once by exactly one chunk and arbitrarily long
    texts are fingerprinted in full — no silent positional cap.
    """
    if w < 2 or k < 2:
        raise ValueError("winnowing needs k >= 2 and w >= 2")
    if chunk < w:
        raise ValueError("chunk must be >= w grams")
    if chunk + w >= _WINNOW_LOCAL_MOD:
        raise ValueError("chunk must fit the 2^23 local-position radix")
    s = df.filter(F.col(text_col).isNotNull() & F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").alias("s"),
    )
    n = (F.length("s") - F.lit(k - 1)).cast("long")  # gram count
    chunks = (
        # a doc needs >= w grams to have any window at all
        s.filter(F.length("s") >= k + w - 1)
        .select(
            "doc_id",
            "s",
            n.alias("n"),
            F.explode(
                F.sequence(F.lit(0), F.ceil(n / F.lit(chunk)).cast("long") - 1)
            ).alias("c"),
        )
        .select(
            "doc_id",
            # first gram this chunk must HASH (w-1 before its first owned
            # window end, so boundary windows see their full history)
            F.greatest(F.lit(1).cast("long"), F.col("c") * chunk - (w - 2)).alias(
                "g0"
            ),
            F.least((F.col("c") + 1) * chunk, F.col("n")).alias("g1"),
            "s",
        )
        # chunk substring: grams g0..g1 need chars g0 .. g1+k-1
        .select(
            "doc_id",
            "g0",
            F.col("s").substr(
                F.col("g0").cast("int"), (F.col("g1") - F.col("g0") + k).cast("int")
            ).alias("sub"),
        )
    )
    if portable:
        def gram_hash(g):
            return portable_hash60(g) % WINNOW_HASH_MOD
    else:
        # xxhash64 folded into the same 40-bit space so the composite
        # radix holds; identical selection algebra, different hash family
        def gram_hash(g):
            return F.pmod(F.xxhash64(g), F.lit(WINNOW_HASH_MOD))

    # local window ends: j = w .. m maps exactly onto this chunk's owned
    # global ends (see g0 above: the first owned end is always the w-th
    # local gram), so no window is computed twice across chunks.
    #
    # DOUBLE LET-BINDING, load-bearing (see let_col): (a) the chunk
    # substring is bound once — otherwise CollapseProject inlines the
    # substr into the per-gram hash lambda and every gram re-slices the
    # whole chunk (O(chunk²) byte copies at the 2^18-gram default);
    # (b) the hash array is bound once — otherwise every window
    # re-hashes the whole chunk (measured: minutes instead of ms on a
    # 4k-gram chunk, O(m²) md5 calls).
    # largest power of two <= w, for the sparse-table sliding minimum
    p_max = 1 << ((w).bit_length() - 1)

    def dedup_adjacent(s_col):
        # O(m) adjacent-dedup — a dethroned window minimum can never
        # return within its span, so equal selections are consecutive
        return F.filter(
            s_col,
            lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
                x != F.get(s_col, i - 1)
            ),
        )

    def select_windows(h):
        # Sliding w-window minimum as a SPARSE TABLE (log2 w doubling
        # passes of zip_with(least) over whole primitive arrays, then one
        # overlapping combine) instead of a per-window slice+array_min —
        # no per-window array allocation; measured 23 -> 9 s for the sf5
        # selection stage. g_s[i] = min(h[i .. i+s-1]); doubling:
        # g_2s[i] = min(g_s[i], g_s[i+s]); window min ending anywhere =
        # min(g_p[j-w+1], g_p[j-p+1]) (overlap is harmless for min).
        def doubled(g, span):
            if span == p_max:
                n_out = F.size(g) - (w - p_max)
                mins = F.zip_with(
                    F.slice(g, 1, n_out),
                    F.slice(g, w - p_max + 1, n_out),
                    lambda a, b: F.least(a, b),
                )
                return let_col(mins, dedup_adjacent)
            nxt = F.zip_with(
                F.slice(g, 1, F.size(g) - span),
                F.slice(g, span + 1, F.size(g) - span),
                lambda a, b: F.least(a, b),
            )
            return let_col(nxt, lambda g2: doubled(g2, span * 2))

        return doubled(h, 1)

    def hs_of(sub):
        m = (F.length(sub) - F.lit(k - 1)).cast("int")  # m >= w by slicing
        return F.transform(
            F.sequence(F.lit(1), m),
            lambda j: gram_hash(sub.substr(j, F.lit(k))) * _WINNOW_LOCAL_MOD
            + (F.lit(_WINNOW_LOCAL_MOD - 1) - j.cast("long")),
        )

    # The selection tree is a pure function of (k, w, chunk, portable) over
    # the unresolved column `sub` — an immutable Column expression, so it
    # is memoized across constructions (r10; building it costs ~0.3 s of
    # py4j round-trips: log2(w) doubling passes, each a let-bound
    # zip_with/filter HOF chain).
    key = (k, w, chunk, portable)
    sels = _WINNOW_SELS_CACHE.get(key)
    if sels is None:
        sels = let_col(F.col("sub"), lambda sub: let_col(hs_of(sub), select_windows))
        _WINNOW_SELS_CACHE[key] = sels
    return chunks.select("doc_id", "g0", sels.alias("sels"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    chunk: int = WINNOW_CHUNK_GRAMS,
    portable: bool = True,
) -> DataFrame:
    """Per-document winnowing fingerprints: ``(doc_id, fp, pos)``.

    The MOSS algorithm: hash every k-char gram of the normalized text,
    slide a w-hash window over the sequence, and keep each window's
    minimum (rightmost occurrence on ties). Guarantees: any substring
    match of length >= w + k - 1 shares at least one fingerprint, and at
    most 2/(w+1) of the gram positions are kept — the inverted index is
    ~w/2 x smaller than full shingling WITH a detection floor, which full
    MinHash sampling does not give.

    Scale shape: the selection is computed ENTIRELY in the map task
    (array HOFs over chunk substrings — see ``_winnow_chunk_selects``);
    only the selected ~2/(w+1) fingerprints are exploded, and the single
    exchange is the cross-chunk DISTINCT riding that reduced stream.
    Documents of any length are fingerprinted in full via explicit
    chunking with global positions.

    ``portable=True`` (default) uses the md5-fold gram hash so the whole
    selection — including the rightmost-tie rule — is reproducible in
    ANSI SQL (``winnow_fingerprints_sql``). ``portable=False`` swaps in
    JVM-codegen ``xxhash64``: identical selection algebra, no oracle —
    the production default when engine-portability is not needed.
    """
    sel = _winnow_chunk_selects(df, text_col, id_col, k, w, chunk, portable)
    return (
        sel.select("doc_id", "g0", F.explode("sels").alias("sel"))
        .select(
            "doc_id",
            F.expr(f"sel div {_WINNOW_LOCAL_MOD}").alias("fp"),
            # local j = 2^23-1 - (sel % 2^23); global pos = g0 + j - 1
            (
                F.col("g0")
                + (F.lit(_WINNOW_LOCAL_MOD - 1) - F.col("sel") % _WINNOW_LOCAL_MOD)
                - 1
            ).alias("pos"),
        )
        # same fingerprint can be re-selected by windows on both sides of
        # a chunk boundary — one distinct over the reduced stream
        .distinct()
    )


def winnow_fingerprints_sql(k: int = 8, w: int = 4, table: str = "documents") -> str:
    """DuckDB twin of ``winnow_fingerprints`` (bit-identical selection,
    uncapped positions via a HUGEINT composite)."""
    h_expr = portable_hash60_sql(f"substr(s, CAST(p AS INTEGER), {k})")
    return f"""
    winnow_src AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
      FROM {table} WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    winnow_pos AS (
      SELECT doc_id, s,
             CAST(unnest(generate_series(
               1, greatest(len(s) - {k - 1}, 0))) AS BIGINT) AS p
      FROM winnow_src
    ),
    winnow_grams AS (
      SELECT doc_id, p, (({h_expr}) % {WINNOW_HASH_MOD}) AS h
      FROM winnow_pos
    ),
    winnow_win AS (
      SELECT doc_id,
             min(CAST(h AS HUGEINT) * {_WINNOW_POS_BIG}
                 + ({_WINNOW_POS_BIG - 1} - p)) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS sel,
             row_number() OVER (PARTITION BY doc_id ORDER BY p) AS rn
      FROM winnow_grams
    ),
    winnow_fp AS (
      SELECT DISTINCT doc_id, CAST(sel // {_WINNOW_POS_BIG} AS BIGINT) AS fp,
             CAST({_WINNOW_POS_BIG - 1} - (sel % {_WINNOW_POS_BIG}) AS BIGINT) AS pos
      FROM winnow_win WHERE rn >= {w}
    )"""


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int | None = 20,
    portable: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs sharing >= min_shared winnowing fingerprints.

    The fingerprint inverted index replaces the full-shingle index of
    ``ngram_jaccard_pairs`` at ~2/(w+1) the size, with the winnowing
    guarantee bounding what the sampling can miss (only matches shorter
    than w + k - 1 chars). ``max_doc_freq`` drops boilerplate fingerprints
    (hot keys) before pairing, same skew guard as the shingle path.

    Two-exchange, single-lineage plan: the map-only selection emits
    in-row-distinct fingerprint hashes; ONE repartition("fp") then
    serves the (doc, fp) distinct (HashPartitioning(fp) satisfies the
    (doc_id, fp) clustering), the df-guard COUNT window (spill-safe —
    each reducer counts one bucket, the weighted-MinHash guard shape),
    and the bucket collect — which is BOUNDED at max_doc_freq docs
    because it aggregates the already-guarded stream, so no hot-key
    buffer can form. Pairs explode in-row from the <= max_doc_freq-sized
    buckets (<= C(max_doc_freq, 2) rows each); the pair rollup is the
    second exchange. No self-join, no double-computed lineage.
    """
    from pyspark.sql import Window

    sel = _winnow_chunk_selects(df, text_col, id_col, k, w, WINNOW_CHUNK_GRAMS, portable)
    fp = (
        sel.select(
            "doc_id",
            F.explode(
                # composite >> 23 = the 40-bit hash; primitive-long
                # distinct takes the hash-set path, O(s)
                F.array_distinct(
                    F.transform("sels", lambda x: F.shiftrightunsigned(x, 23))
                )
            ).alias("fp"),
        )
        .repartition("fp")
        .dropDuplicates(["doc_id", "fp"])
    )
    if max_doc_freq is not None:
        fp = (
            fp.withColumn("df_", F.count(F.lit(1)).over(Window.partitionBy("fp")))
            .filter(F.col("df_") <= max_doc_freq)
            .drop("df_")
        )
    bucket = (
        fp.groupBy("fp")
        .agg(F.collect_list("doc_id").alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    n = F.size("docs")
    pairs = bucket.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.transform(
                        F.slice(F.col("docs"), i + 1, n - i),
                        lambda d: F.struct(
                            F.least(F.element_at(F.col("docs"), i), d).alias("doc_a"),
                            F.greatest(F.element_at(F.col("docs"), i), d).alias("doc_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return (
        pairs.filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= min_shared)
    )


def substring_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_span: int = 15,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact-substring SCRUB — the step Lee et al. 2022 actually ship:
    not just finding shared spans (``substring_span_pairs``) but REMOVING
    them from the corpus. Keep-first rule: every maximal shared token
    span of >= min_span tokens is cut from the LATER document
    (doc_a < doc_b keeps the lower id intact); overlapping spans from
    different earlier partners merge into one removal interval. Returns
    ``(doc_id, n_tokens, n_removed, clean_text)`` for EVERY input doc —
    the cleaned corpus, with clean_text rebuilt from the surviving
    normalized tokens (the dedup operates on the lowercased token
    stream, like the rest of the family).

    Same blocking as the span finder (positional k-gram equi-join,
    diagonal gaps-and-islands), plus: per-island start positions map the
    span into doc_b coordinates (pb = pa - diag), a per-doc interval
    merge (classic running-max-end gaps-and-islands — the window rides
    the sparse span list, never the corpus), and a map-only HOF rebuild
    of the token array. Docs with no shared spans pass through untouched
    via the left join."""
    from pyspark.sql import Window

    g = positional_kgrams(df, text_col, id_col, k).select(
        "doc_id", "pos", F.xxhash64("gram").alias("g")
    )
    if max_doc_freq is not None:
        freq = g.groupBy("g").agg(F.count(F.lit(1)).alias("df_"))
        g = g.join(freq.filter(F.col("df_") <= max_doc_freq), "g").drop("df_")
    g = g.localCheckpoint(eager=True)  # feeds both join sides
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g")
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g")
    m = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = m.withColumn("grp", F.col("pa") - F.row_number().over(w))
    islands = runs.groupBy("doc_a", "doc_b", "diag", "grp").agg(
        F.count(F.lit(1)).alias("run"), F.min("pa").alias("pa_start")
    )
    # Half-open removal intervals in doc_b token coordinates, converted
    # to 1-based (posexplode positions are 0-based; the HOF rebuild and
    # the oracle both index tokens 1-based).
    spans = (
        islands.filter(F.col("run") + F.lit(k - 1) >= min_span)
        .select(
            F.col("doc_b").alias("doc_id"),
            (F.col("pa_start") - F.col("diag") + F.lit(1)).alias("s"),
            (
                F.col("pa_start") - F.col("diag") + F.lit(1) + F.col("run")
                + F.lit(k - 1)
            ).alias("e"),
        )
        .distinct()
    )
    w2 = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w2.rowsBetween(Window.unboundedPreceding, -1))
    flagged = spans.withColumn(
        "new_grp", (F.col("s") > F.coalesce(prev_max, F.lit(-1))).cast("int")
    )
    merged = (
        flagged.withColumn(
            "g2", F.sum("new_grp").over(w2.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "g2")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    ints = merged.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("ivs")
    )
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    keep_pos = F.when(
        F.col("ivs").isNull(), F.sequence(F.lit(1), F.size("t"))
    ).otherwise(
        F.filter(
            F.sequence(F.lit(1), F.size("t")),
            lambda j: ~F.exists(
                F.col("ivs"), lambda iv: (j >= iv["s"]) & (j < iv["e"])
            ),
        )
    )
    return (
        base.join(ints, "doc_id", "left")
        .select("doc_id", "t", keep_pos.alias("kp"))
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            (F.size("t") - F.size("kp")).cast("long").alias("n_removed"),
            F.array_join(
                F.transform(F.col("kp"), lambda j: F.element_at(F.col("t"), j)), " "
            ).alias("clean_text"),
        )
    )


def substring_scrub_oracle_sql(k: int = 8, min_span: int = 15) -> str:
    """DuckDB SQL computing EXACTLY ``substring_scrub``."""
    return rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(generate_series(1, greatest(len(t) - {k - 1}, 0))) AS pos,
             unnest(list_transform(generate_series(1, greatest(len(t) - {k - 1}, 0)),
                                   i -> array_to_string(t[i:i+{k - 1}], ' '))) AS g
      FROM toks
    ),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
             a.pos - b.pos AS diag
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT doc_a, doc_b, diag, pa,
             pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa)
               AS grp
      FROM m
    ),
    islands AS (
      SELECT doc_a, doc_b, diag, COUNT(*) AS run, MIN(pa) AS pa_start
      FROM runs GROUP BY doc_a, doc_b, diag, grp
    ),
    spans AS (
      SELECT DISTINCT doc_b AS doc_id, pa_start - diag AS s,
             pa_start - diag + run + {k - 1} AS e
      FROM islands WHERE run + {k - 1} >= {min_span}
    ),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS new_grp
      FROM spans
    ),
    grouped AS (
      SELECT doc_id, s, e,
             SUM(new_grp) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g2
      FROM flagged
    ),
    merged AS (
      SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM grouped GROUP BY doc_id, g2
    ),
    ints AS (
      SELECT doc_id, list(struct_pack(s := s, e := e)) AS ivs
      FROM merged GROUP BY doc_id
    ),
    cleaned AS (
      SELECT b.doc_id, len(b.t) AS n_tokens,
             CASE WHEN i.ivs IS NULL
                  THEN list_transform(generate_series(1, len(b.t)), j -> b.t[j])
                  ELSE list_transform(
                         list_filter(generate_series(1, len(b.t)),
                           j -> len(list_filter(i.ivs,
                                  iv -> j >= iv.s AND j < iv.e)) = 0),
                         j -> b.t[j]) END AS ct
      FROM toks b LEFT JOIN ints i USING (doc_id)
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens - len(ct) AS BIGINT) AS n_removed,
           -- DuckDB's array_to_string([]) is NULL; Spark's array_join is ''
           COALESCE(array_to_string(ct, ' '), '') AS clean_text
    FROM cleaned
    """


# --- Weighted MinHash: consistent weighted sampling over term frequencies ---

_CWS_M = 2147483648  # 2^31: uniform-draw modulus for the Gumbel keys


def weighted_minhash_pairs(
    docs: DataFrame,
    num_seeds: int = 16,
    min_collisions: int = 4,
    max_bucket: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = True,
) -> DataFrame:
    """Near-dup candidates under WEIGHTED similarity: per (doc, seed),
    sample one token with probability proportional to its term frequency
    via consistent sampling — key(t) = -ln(u(t, seed)) / tf(t), take the
    argmin (the Efraimidis–Spirakis A-ES reduction; because u depends
    only on (token, seed), two documents sharing a token draw the SAME
    key numerator, which is what makes collisions meaningful — the
    'consistent' in consistent weighted sampling, cf. Ioffe 2010 /
    Moulton & Jiang 2018). Documents that collide on >= min_collisions
    of the seeds are near-dup candidates; the collision fraction
    estimates probability-Jaccard, which — unlike set MinHash over
    shingles — distinguishes 'spam spam spam spam' from one 'spam'.

    Engine-portable by construction: u comes from the md5-derived 60-bit
    hash (portable_hash60), so the oracle re-derives the identical
    samples and the driver checks the sampling rule itself, not just
    pair counts. Scale shape: tf is one (doc, token) map-side-combinable
    count; the seed explode multiplies by a CONSTANT; the per-(doc,
    seed) argmin is a partial-aggregable min_by (never a window over the
    corpus); candidate generation is an equi-join on the (seed, token)
    bucket with a ``max_bucket`` hot-bucket guard mirrored in the oracle
    — a stopword that wins the argmin for thousands of docs would
    otherwise create a quadratic bucket.
    """
    d = ensure_parallelism(
        docs.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    )
    # 3-token shingles WITH multiplicity (no array_distinct): the weight
    # is the shingle's repeat count — the thing set-MinHash throws away.
    # Token array let-bound (see let_col): slices never re-tokenize.
    sh = let_col(
        tokens_col(F.col(text_col)),
        lambda t: F.when(
            F.size(t) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 2),
                lambda i: F.array_join(F.slice(t, i, 3), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    tok = d.select(
        F.col(id_col).alias("doc_id"), F.explode(sh).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # The per-seed key numerator -ln(u(token, seed)) depends ONLY on the
    # token, never the doc — and tokens repeat heavily across documents
    # (measured 260k (doc, token) rows vs 27k distinct tokens at sf0.1,
    # a 9.6x dedup factor; Heaps' law keeps the ratio favorable as the
    # corpus grows). On the PORTABLE path, hash each DISTINCT token once
    # into all num_seeds numerators and join them back, instead of
    # re-deriving the md5 chain per (doc, token) row inside every
    # min_by: 16 md5s x 260k rows -> 16 x 27k (guide §1.2 — don't
    # recompute what a cheap lookup provides; one-JVM A/B min-of-3 at
    # sf0.1: 5.01 -> 3.65 s). AQE broadcasts the token-dim table while
    # it fits; at scale it degrades to one extra equi-join shuffle of
    # narrow rows, still cheaper than 16 md5 chains per occurrence. The
    # xxhash64 fast path keeps the inlined form: the hash is cheaper
    # than the join (same A/B: 2.33 inlined vs 2.40 joined).
    # The per-seed expression trees below are rendered as SQL strings and
    # parsed ONCE each (the lit_doubles convention): building num_seeds
    # md5-chain/min_by/struct trees through the Column API costs one py4j
    # round-trip per node (~0.5 s of pure driver latency per plan build
    # for 16 seeds — the measured construction hotspot of this operator).
    # The parsed trees are the identical Catalyst expressions: `%` is
    # Remainder, `0.5D`/repr-suffixed doubles round-trip exactly, and
    # CAST(conv(substr(md5(..)..)) AS BIGINT) is portable_hash60 verbatim,
    # so every sampled argmin — and oracle parity — is unchanged.
    from ..functions.scalars import _double_sql

    m_l = f"{_CWS_M}L"
    m_d = _double_sql(float(_CWS_M))

    def u_sql(seed: int) -> str:
        if portable:
            h = (
                f"(CAST(conv(substr(md5(concat_ws('|', token, '{seed}')),1,15),16,10)"
                f" AS BIGINT) % {m_l})"
            )
        else:
            # xxhash64 scale default (same swap as minhash_near_dups vs
            # the portable twin): signed -> non-negative via pmod; the
            # sampling algebra is identical, only the hash family moves
            # off the md5 chain the oracle needs.
            h = f"pmod(xxhash64(token, {seed}), {m_l})"
        return f"(({h} + 0.5D) / {m_d})"

    if portable:
        nlu_cols = [
            F.expr(f"-ln({u_sql(seed)})").alias(f"_nlu{seed}")
            for seed in range(1, num_seeds + 1)
        ]
        tok_dim = tf.select("token").distinct().select("token", *nlu_cols)
        tf = tf.join(tok_dim, "token")

        # nlu/tf is numerically IDENTICAL to the inlined -log(u)/tf (same
        # double ops in the same order), so every argmin — and the oracle
        # parity — is unchanged.
        def k_sql(seed: int) -> str:
            return f"(_nlu{seed} / tf)"

    else:

        def k_sql(seed: int) -> str:
            return f"(-ln({u_sql(seed)}) / tf)"

    # All num_seeds argmins in ONE groupBy(doc) pass as separate min_by
    # aggregate expressions — no x16 corpus-row explode (the first-cut
    # exploded formulation paid 16x rows into the aggregate; measured
    # 68 -> 23 s at sf5 for the portable variant when rewritten this
    # way). The exchange carries num_seeds small structs per doc per map
    # task; each min_by is map-side partial-aggregable.
    aggs = [
        F.expr(f"min_by(token, struct({k_sql(seed)} AS k, token))").alias(f"_s{seed}")
        for seed in range(1, num_seeds + 1)
    ]
    wide = tf.groupBy("doc_id").agg(*aggs)
    samp = wide.select(
        "doc_id",
        F.expr(
            "explode(array("
            + ",".join(
                f"struct({seed} AS seed, _s{seed} AS token)"
                for seed in range(1, num_seeds + 1)
            )
            + "))"
        ).alias("c"),
    ).select("doc_id", "c.seed", "c.token")
    # Hot-bucket guard: per-(seed, token) membership cap, windowed BY
    # BUCKET (each reducer counts one bucket, no global sort).
    from pyspark.sql import Window

    wb = Window.partitionBy("seed", "token")
    ok = (
        samp.withColumn("_bn", F.count(F.lit(1)).over(wb))
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )
    a, b = ok.alias("a"), ok.alias("b")
    return (
        a.join(
            b,
            (F.col("a.seed") == F.col("b.seed"))
            & (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_collisions"))
        .filter(F.col("n_collisions") >= min_collisions)
        .withColumn("est_similarity", F.col("n_collisions") / F.lit(float(num_seeds)))
    )


def weighted_minhash_oracle_sql(
    num_seeds: int = 16, min_collisions: int = 4, max_bucket: int = 20
) -> str:
    """DuckDB twin of ``weighted_minhash_pairs`` (identical samples)."""
    h = portable_hash60_sql("token || '|' || CAST(seed AS VARCHAR)")
    return rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    tok AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> array_to_string(t[i:i+2], ' '))) AS token
      FROM toks
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    ks AS (
      SELECT doc_id, token, seed,
             -ln((({h}) % {_CWS_M} + 0.5) / {_CWS_M}.0) / tf AS k
      FROM tf CROSS JOIN (SELECT unnest(range(1, {num_seeds + 1})) AS seed) s
    ),
    samp AS (
      SELECT doc_id, seed, token FROM ks
      QUALIFY row_number() OVER (PARTITION BY doc_id, seed
                                 ORDER BY k, token) = 1
    ),
    ok AS (
      SELECT * FROM samp
      QUALIFY COUNT(*) OVER (PARTITION BY seed, token) <= {max_bucket}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_collisions,
           COUNT(*) / {float(num_seeds)} AS est_similarity
    FROM ok a JOIN ok b ON a.seed = b.seed AND a.token = b.token
                       AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {min_collisions}
    """
