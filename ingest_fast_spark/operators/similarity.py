"""Embedding similarity search (SURVEY.md §2.9): brute-force cosine top-k
as the exact baseline, and an IVF-style (coarse-quantization) ANN variant
as the 100 TB scale path.

Design for scale:
  * the query set is always the (small) broadcast side; the corpus never
    shuffles for brute force — it's one scan + per-partition top-k via
    window/rank with partial aggregation;
  * all vector math is JVM-side (`zip_with`/`aggregate` over
    ``array<double>``) — no Python in the scoring loop;
  * IVF: corpus vectors are assigned once to the nearest of K centroids
    (a partition/bucket key); a query probes only ``nprobe`` buckets, so
    the scan is partition-pruned. Centroids come from a distributed
    Lloyd's k-means (deterministically seeded), itself pure DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import ensure_parallelism
from ..functions.scalars import lit_doubles


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def as_double(a: Column) -> Column:
    return a.cast("array<double>")


# The exact-GEMM baselines collect a vector set to the driver and
# broadcast it — the right call while it fits (~0.5 GB per million 64-dim
# float64 vectors) and a driver OOM beyond. Same size-gated logic class
# as connected_components' 1M-edge union-find gate (operators/graph.py).
EXACT_GEMM_MAX_ROWS = 1_000_000
# dense |src|x|tgt| materialization bound for the bitext exact baseline
BITEXT_EXACT_MAX_PAIRS = 200_000_000


def _gated_collect(df: DataFrame, what: str, scale_twin: str, max_rows: int | None = None):
    """Driver-side collect with a size gate: a single LIMIT gate+1 probe
    (NOT a separate count() — that re-evaluates the whole upstream plan;
    the r9 bench caught embedding_dbscan_lsh paying its pair pipeline
    twice). Memory stays bounded at the gate either way, and the error
    points at the bucketed scale twin instead of dying in an
    un-diagnosable driver OOM mid-collect at 100x data."""
    limit = EXACT_GEMM_MAX_ROWS if max_rows is None else max_rows
    rows = df.limit(limit + 1).collect()
    if len(rows) > limit:
        raise ValueError(
            f"{what}: more than {limit} vectors exceed the exact-GEMM "
            f"driver-collect gate; use the bucketed scale path "
            f"({scale_twin}) instead, or raise EXACT_GEMM_MAX_ROWS "
            "deliberately"
        )
    return rows


def brute_force_topk_expr(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query, all-JVM formulation: broadcast queries
    × corpus scan → HOF cosine → window rank. MEASURED at sf0.1/|Q|=5:
    0.55s vs 0.82s for the GEMM path (tiny inputs are Python-worker-
    startup dominated). NOT the scale default anyway: every corpus row
    reaches the window, and the window has only |Q| partitions — at 10⁹
    corpus rows each reducer sorts the entire corpus. Use for small
    corpora or Python-less deployments."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query — DEFAULT implementation: the query
    matrix is broadcast once (normalized numpy), each corpus partition
    scores its block with one GEMM and emits only its LOCAL top-k per
    query; the global window then ranks ≤ (partitions × k) candidate rows
    per query instead of the full corpus. Returns (query_id, vec_id,
    cos_sim, rank). Verified row-identical to ``brute_force_topk_expr``.

    Scale shape: corpus never shuffles; the only shuffled data is the
    per-partition candidate set. With 1000 executors × k=10 × |Q| queries
    the final rank input is ~10⁴·|Q| rows regardless of corpus size —
    the expr variant instead funnels ALL corpus rows into |Q| window
    partitions. At sf0.1 both are sub-second (GEMM 0.82s vs 0.55s,
    Python-worker startup); the asymptotics, not the small-input constant,
    pick the default."""
    import numpy as np

    from ..catalog import ensure_parallelism

    qrows = _gated_collect(
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), as_double(F.col(vec_col)).alias("v")),
        "brute_force_topk query set",
        "ivf_topk",
    )
    if not qrows:  # empty query set: nothing to rank (np would see a 1-D matrix)
        return corpus.sparkSession.createDataFrame(
            [], f"query_id long, {id_col} long, cos_sim double, rank int"
        )
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.array([r["v"] for r in qrows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, qmat))

    def score(batches):
        import pandas as pd

        ids_q, mat_q = bc.value
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block @ mat_q.T, 6)  # |block| × |Q|
            sims[block_ids[:, None] == ids_q[None, :]] = -np.inf  # exclude self
            take = min(k, len(block_ids))
            frames = []
            for j, qid in enumerate(ids_q):
                col = sims[:, j]
                # Local top-k with the SAME tie rule as the final window
                # (cos desc, id asc): lexsort's LAST key is primary.
                order = np.lexsort((block_ids, -col))[:take]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, id_col: block_ids[order], "cos_sim": col[order]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    candidates = ensure_parallelism(corpus.select(id_col, vec_col)).mapInPandas(
        score, f"query_id long, {id_col} long, cos_sim double"
    ).filter(F.col("cos_sim") != float("-inf"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def assign_ivf_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (bucket). At scale
    the output is written partitioned by ``bucket`` so probes prune files."""
    # The per-vector cosine-vs-every-centroid lambdas are interpreted;
    # a single-split bench file would serialize them onto one scan task.
    corpus = ensure_parallelism(corpus)
    c = corpus.select(id_col, as_double(F.col(vec_col)).alias("cvec"))
    cent = centroids.select(
        F.col("centroid_id"), as_double(F.col(vec_col)).alias("centvec")
    )
    scored = c.crossJoin(F.broadcast(cent)).select(
        id_col,
        "cvec",
        "centroid_id",
        cosine(F.col("cvec"), F.col("centvec")).alias("sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cvec", F.col("centroid_id").alias("bucket"))
    )


def sample_centroids(
    corpus: DataFrame, n: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid seed: the n lowest ids (k-means++ would
    sample by distance; lowest-id keeps the whole pipeline reproducible
    without an RNG)."""
    return (
        corpus.orderBy(id_col)
        .limit(n)
        .select(F.col(id_col).alias("centroid_id"), vec_col)
    )


def kmeans_centroids(
    corpus: DataFrame,
    n: int = 8,
    iterations: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> DataFrame:
    """Lloyd's k-means over array<double>, pure DataFrame ops: assign each
    vector to its nearest centroid (broadcast), recompute centroids as the
    element-wise mean of their members, repeat. Deterministic lowest-id
    seeding; empty clusters keep their previous centroid.

    Scale shape per iteration: the n×dim centroid table (bounded — the
    only iteration state) folds into the plan as a LITERAL ARRAY, so
    assignment is a map-side argmax expression with zero shuffle; the new
    means are a posexplode → groupBy(centroid, dim_index) SUM, fully
    map-side combinable — each partition emits at most n × dim partial
    sums, so the per-round shuffle never carries vectors or corpus rows
    (a collect_list-of-arrays formulation would materialize every member
    vector per group; the crossJoin + window-argmin formulation shuffled
    corpus×n rows per round).

    ``round_decimals`` enables CROSS-ENGINE DETERMINISM (the registered
    ``embedding_kmeans`` query's oracle replays the identical recurrence
    in DuckDB): assignment similarities AND the recomputed centroid
    components are rounded to that many decimals each iteration. Without
    it, Spark's aggregation-order nondeterminism in the per-cluster mean
    leaves ULP-level differences that can flip a later argmin and cascade
    into discretely different clusterings. Rounding both the decision
    input (sim) and the iteration state (centroid) pins every engine to
    the same trajectory — the same convention ``cosine_near_dup_lsh``
    uses for its sign bits.
    """
    cent = sample_centroids(corpus, n, id_col, vec_col).select(
        "centroid_id", as_double(F.col(vec_col)).alias("centvec")
    )
    # Interpreted per-(vector, centroid) cosine lambdas every Lloyd round:
    # widen a single-split scan or the whole iteration serializes.
    corpus = ensure_parallelism(corpus)
    # Materialize the narrow (id, vec-as-double) frame ONCE: every Lloyd
    # round's collect re-executes its lineage, which without the
    # checkpoint is iterations x (parquet scan + the widening exchange)
    # — r9-opt one-JVM A/B min-of-3 at sf0.1: 1.94 -> 1.43 s. At scale
    # the materialization is the same narrow projection the rounds would
    # otherwise re-scan, written once and read `iterations` times.
    c = corpus.select(id_col, as_double(F.col(vec_col)).alias("cvec")).localCheckpoint(
        eager=True
    )
    # Half-up via floor(10^d*x + 0.5)/10^d, NOT F.round: the expression is
    # definable identically in any engine (the oracle replays it in
    # DuckDB), where each engine's native round() differs in half-tie
    # direction — the same convention embedding_label_centroids uses.
    scale = None if round_decimals is None else float(10**round_decimals)
    rnd = (lambda x: F.floor(scale * x + F.lit(0.5)) / scale) if scale else None
    for _ in range(iterations):
        # Assignment is SHUFFLE-FREE: the centroid table is bounded (k
        # rows × dim doubles), so it folds into the plan as a literal
        # array and each vector picks its argmax-cosine centroid inside a
        # single map-side expression — corpus rows never shuffle for
        # assignment. (The previous crossJoin + window formulation
        # shuffled corpus×k rows by vec_id every Lloyd round — the
        # dominant cost at scale.) Python-float round-trip of IEEE
        # doubles is exact, so sims are bit-identical to the join
        # formulation; array_sort of (sim, -cid) structs keeps the same
        # tie-break (max sim, then min centroid_id) and the same
        # NaN-sorts-greatest semantics the window's DESC order had.
        rows = sorted(
            (r for r in cent.collect() if r["centvec"] is not None),
            key=lambda r: r["centroid_id"],
        )
        if not rows:  # empty corpus (or all-null vectors): nothing to iterate
            break
        # One SQL parse for the whole k x dim fold instead of a py4j
        # round-trip per element (repr round-trips doubles exactly, so
        # the folded values — and every cosine — are bit-identical).
        from ..functions.scalars import _double_sql

        cent_lit = F.expr(
            "array("
            + ",".join(
                "named_struct('cid',{}L,'cv',array({}))".format(
                    int(r["centroid_id"]),
                    ",".join(_double_sql(x) for x in r["centvec"]),
                )
                for r in rows
            )
            + ")"
        )

        def _scored(cc):
            s = cosine(F.col("cvec"), cc["cv"])
            if rnd is not None:
                s = rnd(s)
            return F.struct(
                s.alias("sim"),
                (-cc["cid"]).alias("neg_cid"),
                cc["cid"].alias("cid"),
            )

        best = F.element_at(F.array_sort(F.transform(cent_lit, _scored)), -1)
        assigned = c.select(id_col, "cvec", best["cid"].alias("centroid_id"))
        elems = assigned.select(
            "centroid_id", F.posexplode("cvec").alias("pos", "x")
        )
        dim_sums = elems.groupBy("centroid_id", "pos").agg(
            F.sum("x").alias("s"), F.count(F.lit(1)).alias("n_members")
        )
        mean = (
            (lambda t: rnd(t["s"] / t["n_members"]))
            if rnd is not None
            else (lambda t: t["s"] / t["n_members"])
        )
        new_cent = dim_sums.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s", "n_members"))),
                mean,
            ).alias("centvec")
        )
        # Empty clusters: keep the previous centroid (left join fallback).
        cent = (
            cent.select("centroid_id", F.col("centvec").alias("prev"))
            .join(new_cent, "centroid_id", "left")
            .select("centroid_id", F.coalesce("centvec", "prev").alias("centvec"))
            .localCheckpoint(eager=True)  # cut the iteration's lineage
        )
    return cent.select("centroid_id", F.col("centvec").alias(vec_col))


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup: all (a < b) pairs with cosine >= threshold.

    Executed as a BLOCKED MATRIX PRODUCT: the (normalized) corpus matrix is
    broadcast once; each partition scores its block of rows against the
    whole corpus with one numpy GEMM — Arrow batches in, (vec_a, vec_b,
    cos_sim) rows out. This replaces a 2M-row expression-tree join (HOF
    cosine per pair re-allocates arrays and re-computes norms; ~35× slower
    measured at sf0.1).

    All-pairs is O(n²) by definition — right as the oracle baseline and
    for verifying LSH candidates while the broadcast matrix fits executor
    memory (64-dim float64: ~0.5 GB per million vectors). Beyond that use
    ``cosine_near_dup_lsh`` (bucketed candidates, sub-quadratic).
    """
    import numpy as np

    from ..catalog import ensure_parallelism

    rows = _gated_collect(
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), as_double(F.col(vec_col)).alias("v")),
        "cosine_near_dup_pairs corpus",
        "cosine_near_dup_lsh",
    )
    if not rows:  # empty corpus: no pairs (np would see a 1-D matrix)
        return emb.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, cos_sim double"
        )
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat))

    def score(batches):
        import pandas as pd

        all_ids, corpus = bc.value
        # Bound the sims matrix at ~32 MB per sub-block: an unbounded
        # block x corpus product is O(|block| * n) doubles PER TASK — at
        # 100k corpus vectors with 32 concurrent tasks that OOM-killed
        # the x50 study JVM. Sub-blocking keeps peak memory flat at any
        # corpus size; the GEMM itself is unchanged arithmetic.
        rows_per_sub = max(1, (1 << 22) // max(1, len(all_ids)))
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            for s in range(0, len(block), rows_per_sub):
                sub_ids = block_ids[s : s + rows_per_sub]
                sims = np.round(block[s : s + rows_per_sub] @ corpus.T, 6)
                a_idx, b_idx = np.nonzero(
                    (sims >= threshold) & (sub_ids[:, None] < all_ids[None, :])
                )
                yield pd.DataFrame(
                    {
                        "vec_a": sub_ids[a_idx],
                        "vec_b": all_ids[b_idx],
                        "cos_sim": sims[a_idx, b_idx],
                    }
                )

    return ensure_parallelism(emb.select(id_col, vec_col)).mapInPandas(
        score, "vec_a long, vec_b long, cos_sim double"
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, tiny: nbits × dim)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((nbits, dim)).tolist()


def cosine_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    nbits: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate embedding near-dup via random-hyperplane (SimHash-style)
    LSH: sign bits of <v, plane_i> → ``nbits``-bit sketch → banded into
    ``bands`` buckets; only pairs sharing a band bucket are scored with
    exact cosine.

    The bucket id is the shuffle key, so candidate generation is an
    equi-join — sub-quadratic and shuffle-bounded. Recall vs the exact
    operator is asserted in tests/test_similarity.py. All sketch math is
    JVM-side (the planes are literal arrays folded into codegen).

    The sign bit compares the dot product ROUNDED to 6 decimals against 0
    (the oracle does the same): without rounding, an FP summation-order
    difference between engines can flip a sign bit when <v, plane> ≈ 0 and
    silently diverge the candidate sets — the same convention
    ``ivf_topk_deterministic`` uses for its assignment ties.
    """
    planes = _hyperplanes(dim, nbits)
    # nbits interpreted dot-product lambdas per row: widen a single-split
    # scan before sketching (no-op at scale).
    emb = ensure_parallelism(emb)
    v = as_double(F.col(vec_col))
    bits_per_band = nbits // bands
    band_keys = []
    for bnd in range(bands):
        key = F.lit(0)
        for j in range(bits_per_band):
            # One SQL parse per plane instead of one py4j call per element
            # (repr round-trips doubles exactly, so bits are unchanged).
            plane = lit_doubles(planes[bnd * bits_per_band + j])
            bit = (F.round(dot(v, plane), 6) > 0).cast("int")
            key = key + F.shiftleft(bit, j)
        band_keys.append(F.struct(F.lit(bnd).alias("band"), key.alias("key")))
    # r10 restructure (VERDICT item 4; guide §1.2 + §8):
    #   * the 16 interpreted dot products per row are computed ONCE into a
    #     checkpointed sketch frame — the un-barriered plan evaluated the
    #     whole sketch projection twice, once per join side;
    #   * the (band, key) candidate join shuffles only (id, band, key) —
    #     the pre-r10 plan carried the 64-double vector and its norm
    #     through BOTH sides of the band shuffle AND the pair-dedup
    #     shuffle (§8: decide with small rows, attach payloads once);
    #   * vectors re-attach from the same checkpointed frame after the
    #     dedup, so only surviving pairs ever see them (AQE broadcasts
    #     the frame while it is small; at scale they are id-keyed hash
    #     joins against the sparse candidate list).
    # The l2 norm stays a per-VECTOR fact computed at sketch time, the
    # candidates dedup BEFORE the cosine, and dot/(na*nb) is the identical
    # FP expression cosine() builds, so every rounded value is unchanged.
    sk = emb.select(
        F.col(id_col).alias("doc_id"),
        v.alias("vec"),
        l2_norm(v).alias("nrm"),
        F.array(*band_keys).alias("bbs"),
    ).localCheckpoint(eager=True)
    ids = sk.select("doc_id", F.explode("bbs").alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.key").alias("key")
    )
    a = ids.select(F.col("doc_id").alias("vec_a"), "band", "key")
    b = ids.select(F.col("doc_id").alias("vec_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = sk.select(
        F.col("doc_id").alias("vec_a"), F.col("vec").alias("va"), F.col("nrm").alias("na")
    )
    vb = sk.select(
        F.col("doc_id").alias("vec_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe only the ``nprobe`` nearest buckets per query.
    Approximate — recall depends on nprobe/centroids; compare against
    ``brute_force_topk`` for recall measurement (see tests)."""
    centroids = kmeans_centroids(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    bucketed = assign_ivf_buckets(corpus, centroids, id_col, vec_col)

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    cent = centroids.select("centroid_id", as_double(F.col(vec_col)).alias("centvec"))
    qprobe = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qvec",
            "centroid_id",
            cosine(F.col("qvec"), F.col("centvec")).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qvec", F.col("centroid_id").alias("bucket"))
    )
    scored = (
        bucketed.join(F.broadcast(qprobe), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk_deterministic(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k, ORACLE-EXACT variant: centroids are the ``n_centroids``
    lowest-id vectors (no RNG, no k-means float accumulation-order drift),
    and every cosine comparison (assignment, probe ranking, scoring) is
    rounded to 6 decimals BEFORE comparison so engine-level FP ordering
    can't flip an argmax. Same plan shape as ``ivf_topk`` (the k-means
    scale variant): broadcast centroids → map-side max_by assignment →
    broadcast probe set → bucket equi-join → window top-k."""
    e = corpus.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    cent = (
        e.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col("v").alias("cv"))
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("cos_c", F.round(cosine(F.col("v"), F.col("cv")), 6))
        .groupBy(id_col)
        .agg(
            F.max_by(
                F.col("cid"), F.struct(F.col("cos_c").alias("s"), (-F.col("cid")).alias("t"))
            ).alias("bucket"),
            F.first("v").alias("v"),
        )
    )
    q = queries.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    qprobe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cos_q", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cos_q"), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("cid").alias("bucket"))
    )
    scored = (
        assigned.join(F.broadcast(qprobe), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup_pairs(
    emb: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup: cluster the corpus, then score
    cosine pairs only *within* each cluster.

    The point at 100 TB: exact all-pairs is O(n²); clustering first
    bounds the candidate set to sum of per-cluster n_i² — with k ≈ √n
    clusters that is ~n^1.5 comparisons, and each cluster's pair join is
    an equi-join on cluster_id (shuffle co-partitions members; no
    cross-cluster traffic at all).

    Assignment is one broadcast of the k centroids + a map-side-combinable
    ``max_by(cid, struct(cos, -cid))`` hash aggregate — no window/sort.

    PRECONDITION (round-1 advice): default centroids are the vectors whose
    id is < ``n_clusters`` — the input MUST contain ids in [0, n_clusters),
    or the operator raises (an empty centroid set would otherwise silently
    return zero pairs). Offset/string-id corpora pass ``centroids=``
    (schema: centroid_id, <vec_col>) — e.g. ``kmeans_centroids`` output
    (same assignment/join shape). The id<k default keeps the operator
    oracle-exact in SQL.

    Zero-norm vectors are filtered up front: cosine is undefined there and
    engines disagree (Spark NULL vs DuckDB inf/NaN under its IEEE default).

    Within-cluster scoring is a per-cluster GEMM via ``applyInPandas``:
    the cluster equi-shuffle co-locates members, then each cluster scores
    its n_i × n_i block in one numpy matmul instead of n_i² HOF-cosine
    expression evals (measured ~10s → ~1s at sf0.1). Task memory is
    O(n_i·dim + n_i²) — with k ≈ √n clusters that is O(n), the same
    bound as the candidate pair set itself; clusters too large for that
    should be re-clustered (k up), not GEMM'd.
    """
    import numpy as np
    import pandas as pd

    v = (
        emb.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("vec"))
        .filter(dot(F.col("vec"), F.col("vec")) > 0)
    )
    if centroids is not None:
        cent = centroids.select(
            F.col("centroid_id").alias("cid"), as_double(F.col(vec_col)).alias("cvec")
        )
    else:
        cent = v.filter(F.col("vid") < n_clusters).select(
            F.col("vid").alias("cid"), F.col("vec").alias("cvec")
        )
        if cent.limit(1).count() == 0 and v.limit(1).count() > 0:
            raise ValueError(
                f"semantic_dedup_pairs: no ids < n_clusters={n_clusters} in "
                f"'{id_col}' — pass centroids= for offset/string-id corpora"
            )
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .withColumn("cos_c", F.round(cosine(F.col("vec"), F.col("cvec")), 6))
        .groupBy("vid")
        .agg(
            F.max_by(
                F.col("cid"), F.struct(F.col("cos_c").alias("s"), (-F.col("cid")).alias("t"))
            ).alias("cluster_id")
        )
    )
    m = assigned.join(v, "vid").select("cluster_id", "vid", "vec")

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vid")
        ids = pdf["vid"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"cluster_id": [], "vec_a": [], "vec_b": [], "cos_sim": []}
            ).astype(
                {"cluster_id": "int64", "vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
            )
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = np.round(mat @ mat.T, 6)
        ai, bi = np.triu_indices(len(ids), k=1)
        s = sims[ai, bi]
        keep = s >= threshold
        return pd.DataFrame(
            {
                "cluster_id": np.full(int(keep.sum()), pdf["cluster_id"].iloc[0], dtype=np.int64),
                "vec_a": ids[ai[keep]],
                "vec_b": ids[bi[keep]],
                "cos_sim": s[keep],
            }
        )

    return m.groupBy("cluster_id").applyInPandas(
        score, "cluster_id long, vec_a long, vec_b long, cos_sim double"
    )


def hard_negatives_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """FILTERED exact top-k: for every query vector, the k most cosine-
    similar corpus vectors with a DIFFERENT label — contrastive
    hard-negative mining (high-similarity, wrong-class examples are the
    pairs a contrastive/reranker trainer learns most from).

    Same scale shape as ``brute_force_topk`` (queries broadcast, one GEMM
    per corpus partition, local top-k, corpus never shuffles); the label
    predicate is applied INSIDE the GEMM as a mask, not as a post-rank
    filter — post-filtering a plain top-k would under-fill k whenever
    same-label vectors crowd the head of the ranking."""
    import numpy as np

    from ..catalog import ensure_parallelism

    qrows = _gated_collect(
        queries.filter(F.col(vec_col).isNotNull() & F.col(label_col).isNotNull())
        .select(F.col(id_col), as_double(F.col(vec_col)).alias("v"), F.col(label_col)),
        "hard_negatives_topk query set",
        "ivf_topk with a label mask",
    )
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], f"query_id long, {id_col} long, cos_sim double, rank int"
        )
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    q_labels = np.array([r[label_col] for r in qrows], dtype=np.int64)
    qmat = np.array([r["v"] for r in qrows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_labels, qmat))

    def score(batches):
        import pandas as pd

        ids_q, labels_q, mat_q = bc.value
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna() & pdf[label_col].notna()]
            if len(pdf) == 0:
                continue
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block_labels = pdf[label_col].to_numpy(dtype=np.int64)
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block @ mat_q.T, 6)
            # the filter: same-label (and self) pairs never rank
            sims[block_labels[:, None] == labels_q[None, :]] = -np.inf
            sims[block_ids[:, None] == ids_q[None, :]] = -np.inf
            take = min(k, len(block_ids))
            frames = []
            for j, qid in enumerate(ids_q):
                col = sims[:, j]
                order = np.lexsort((block_ids, -col))[:take]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, id_col: block_ids[order], "cos_sim": col[order]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    candidates = ensure_parallelism(corpus.select(id_col, vec_col, label_col)).mapInPandas(
        score, f"query_id long, {id_col} long, cos_sim double"
    ).filter(F.col("cos_sim") != float("-inf"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_encode(
    corpus: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector into
    ``m`` subspaces, assign each subvector to its nearest of ``k``
    per-subspace centroids, and emit the code word plus the measured
    reconstruction error — the memory/recall trade a 100 TB vector store
    actually deploys (64 dims × 4 bytes → m bytes per vector here).

    Codebook: deterministic lowest-id seeding (the same convention as
    ``sample_centroids``/``ivf_topk_deterministic`` — production would run
    ``kmeans_centroids`` per subspace; determinism is what makes the
    whole encode ORACLE-CHECKABLE). Scale shape: the codebook (m × k
    subvectors) broadcasts; assignment is a per-row argmin over m×k
    rounded L2 distances — map-only except the final per-vector window,
    which is keyed by (vec_id, sub) and never carries full vectors.
    Returns (vec_id, codes array<int> ordered by subspace, recon_mse)."""
    # Construction is SQL-rendered (the lit_doubles one-parse convention,
    # r10): the subspace explode/slice trees, the per-pair L2 aggregate,
    # and the final code/mse aggregates each parse as ONE expression
    # string instead of one py4j round-trip per node — profiled at ~510
    # trips -> ~60 per build (~0.39 -> ~0.1 s of driver latency, shared by
    # the pq_codes/pq_adc/ivf_adc builders). Expression semantics are
    # unchanged: 0.0D/1000000.0D keep the DOUBLE literals the Column form
    # built (bare 0.0 parses as DECIMAL in Spark SQL).
    e = corpus.filter(
        F.col(vec_col).isNotNull() & F.col(id_col).isNotNull()
    ).selectExpr(
        f"`{id_col}` AS vec_id", f"CAST(`{vec_col}` AS array<double>) AS v"
    )
    cent = (
        e.orderBy("vec_id")
        .limit(k)
        .selectExpr("vec_id AS centroid_id", "v AS cv")
    )

    def _sub_explode(col: str, field: str) -> str:
        width = f"CAST(size({col})/{m} AS int)"
        return (
            f"explode(transform(sequence(0, {m - 1}), s -> struct("
            f"CAST(s AS int) AS sub, slice({col}, s*{width}+1, {width}) AS {field}))) AS p"
        )

    sub_rows = e.selectExpr("vec_id", _sub_explode("v", "sv")).selectExpr(
        "vec_id", "p.sub AS sub", "p.sv AS sv"
    )
    cent_sub = cent.selectExpr("centroid_id", _sub_explode("cv", "csv")).selectExpr(
        "centroid_id", "p.sub AS sub", "p.csv AS csv"
    )
    dist_sql = (
        "round(aggregate(zip_with(sv, csv, (x, y) -> (x-y)*(x-y)), 0.0D, "
        "(acc, x) -> acc + x), 6)"
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("dist"), F.asc("centroid_id"))
    best = (
        sub_rows.join(F.broadcast(cent_sub), "sub")
        .selectExpr(
            "vec_id", "sub", "centroid_id", f"{dist_sql} AS dist", "size(sv) AS n_el"
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    # Sum EXACT integer micro-units, not rounded doubles: FP addition
    # order varies with partitioning, and a last-ULP difference flips
    # ROUND at a .xxxxx5 boundary (observed: 0.020279 vs 0.020278
    # between two runs of the same query). dist is already rounded to 6
    # decimals, so dist·10⁶ is integral up to FP error that round()
    # removes; the long sum is then order-independent.
    return best.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(sub, centroid_id))), "
            "t -> CAST(t.centroid_id AS int))"
        ).alias("codes"),
        F.expr(
            "round(sum(CAST(round(dist * 1000000.0D) AS bigint)) / "
            "(sum(n_el) * 1000000.0D), 6)"
        ).alias("recon_mse"),
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    n_cent: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric distance computation (ADC) top-k: score every corpus
    vector through its PQ CODES only — per query, a distance table of
    m × n_cent entries (query subvector ↔ every codebook centroid) is
    built once and each corpus vector costs m table lookups + a sum,
    never a full d-dim distance. This is how a PQ-compressed 100 TB
    store answers queries: the codes relation (m small ints per vector)
    is the only corpus-sized input; the distance tables broadcast.

    Approximate by construction (quantization error); deterministic, so
    oracle-checkable — compare with ``brute_force_topk`` for recall.
    Distances are L2 (the PQ-native metric). Returns (query_id, vec_id,
    approx_dist, rank)."""
    codes = pq_encode(corpus, m=m, k=n_cent, id_col=id_col, vec_col=vec_col)
    e = corpus.filter(
        F.col(vec_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v"))
    cent = (
        e.orderBy("vec_id")
        .limit(n_cent)
        .select(F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv"))
    )
    sub_of = lambda col, width: F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.struct(
                s.cast("int").alias("sub"),
                F.slice(col, s * width + 1, width).alias("sv"),
            ),
        )
    )
    q = queries.filter(
        F.col(vec_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    qsub = q.select(
        "query_id", sub_of(F.col("qv"), (F.size("qv") / m).cast("int")).alias("p")
    ).select("query_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("qsv"))
    csub = cent.select(
        "centroid_id", sub_of(F.col("cv"), (F.size("cv") / m).cast("int")).alias("p")
    ).select("centroid_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("csv"))
    d = F.round(
        F.aggregate(
            F.zip_with("qsv", "csv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    dtab = qsub.join(csub, "sub").select(
        "query_id", "sub", F.col("centroid_id").alias("code"), d.alias("d")
    )
    corpus_codes = codes.select(
        "vec_id",
        F.posexplode("codes").alias("sub", "code"),
    ).select("vec_id", F.col("sub").cast("int").alias("sub"), "code")
    # Rank on the EXACT long micro-unit sum (same determinism rationale
    # as pq_encode's recon_mse: FP addition order varies per run).
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_micro"), F.asc("vec_id"))
    micro = F.round(F.col("d") * 1e6).cast("long")
    return (
        corpus_codes.join(F.broadcast(dtab), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum(micro).alias("approx_micro"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("approx_micro") / 1e6, 6).alias("approx_dist"),
            "rank",
        )
    )


def ivf_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    n_cent: int = 8,
    n_coarse: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF×ADC fusion — the two halves of a production web-scale ANN stack
    composed (FAISS's IVFPQ shape, minus residual encoding): a coarse IVF
    probe picks ``nprobe`` of ``n_coarse`` buckets per query, then
    asymmetric distance computation scores ONLY the probed buckets'
    vectors through their PQ CODES — per query one m×n_cent distance
    table, per candidate m lookups + a sum. Neither half ever runs a
    full-corpus GEMM, and after bucket assignment the full-dim corpus
    vectors are DROPPED: the candidate join carries (bucket, sub, code)
    small ints only.

    Deterministic (lowest-id coarse centroids + codebook, round-6 before
    every comparison, exact long micro-unit ranking) so the whole fusion
    is oracle-checkable; recall floors vs the exact GEMM leg are attested
    in ``ann_recall_floors``. Scale shape: codebook + coarse centroids +
    probe set + distance tables all broadcast (bounded by m·n_cent·|Q|);
    the only corpus-sized relations are the codes and the bucket
    assignment, both O(1) ints per vector."""
    e = corpus.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v"))
    coarse = (
        e.orderBy("vec_id")
        .limit(n_coarse)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    # Coarse assignment: map-side max_by over the broadcast centroid table;
    # the vector itself is NOT carried past this point.
    assigned = (
        e.crossJoin(F.broadcast(coarse))
        .withColumn("cos_c", F.round(cosine(F.col("v"), F.col("cv")), 6))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("cid"),
                F.struct(F.col("cos_c").alias("s"), (-F.col("cid")).alias("t")),
            ).alias("bucket")
        )
    )
    codes = pq_encode(corpus, m=m, k=n_cent, id_col=id_col, vec_col=vec_col)
    corpus_codes = (
        codes.join(assigned, "vec_id")
        .select("vec_id", "bucket", F.posexplode("codes").alias("sub", "code"))
        .select("vec_id", "bucket", F.col("sub").cast("int").alias("sub"), "code")
    )
    q = queries.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    qprobe = (
        q.crossJoin(F.broadcast(coarse))
        .withColumn("cos_q", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cos_q"), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("cid").alias("bucket"))
    )
    # Per-query ADC distance tables: query subvector vs every codebook
    # centroid subvector (m × n_cent rows per query — broadcast-bounded).
    cent = (
        e.orderBy("vec_id")
        .limit(n_cent)
        .select(F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv2"))
    )
    sub_of = lambda col, width: F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.struct(
                s.cast("int").alias("sub"),
                F.slice(col, s * width + 1, width).alias("sv"),
            ),
        )
    )
    qsub = q.select(
        "query_id", sub_of(F.col("qv"), (F.size("qv") / m).cast("int")).alias("p")
    ).select("query_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("qsv"))
    csub = cent.select(
        "centroid_id", sub_of(F.col("cv2"), (F.size("cv2") / m).cast("int")).alias("p")
    ).select("centroid_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("csv"))
    d = F.round(
        F.aggregate(
            F.zip_with("qsv", "csv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    dtab = qsub.join(csub, "sub").select(
        "query_id", "sub", F.col("centroid_id").alias("code"), d.alias("d")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_micro"), F.asc("vec_id"))
    micro = F.round(F.col("d") * 1e6).cast("long")
    return (
        corpus_codes.join(F.broadcast(qprobe), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(dtab), ["query_id", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum(micro).alias("approx_micro"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("approx_micro") / 1e6, 6).alias("approx_dist"),
            "rank",
        )
    )


def ivf_pq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    n_cent: int = 8,
    n_coarse: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FULL IVFPQ (Jégou et al. 2011 §III, the FAISS IVFPQ layout): the
    product quantizer encodes RESIDUALS v − c(v) against the assigned
    coarse centroid, not raw vectors — residuals concentrate near the
    origin so the same m×n_cent codebook spends its codes where the
    within-bucket variance actually is, and the query side rebuilds a
    distance table PER PROBED BUCKET from its own residual q − c_b.
    In FAISS this upgrades raw-vector ADC because real embedding corpora
    cluster tightly around their coarse centroids, so residuals shrink
    and the codebook's resolution concentrates where the variance is.
    MEASURED NEGATIVE RESULT on the synthetic corpus (recorded in
    BENCHNOTES.md round 7): these embeddings are near-uniform on the
    unit sphere (max cos(v, centroid) ≈ 0.3), so residuals keep ~full
    magnitude and are HARDER to cover than the raw sphere — recall@10 vs
    exact is 0.24/0.02 (sf0.01/sf0.1) against ``ivf_adc_topk``'s
    0.28/0.24, and finer configs (m=8..16, k=16..32) or 1-2 Lloyd
    refinement rounds narrow but never close the gap. ``ivf_adc_topk``
    stays the registered default for this data regime; this operator is
    the faithful IVFPQ layout for corpora with real cluster structure.

    Deterministic end to end (lowest-id coarse centroids; the codebook is
    the residuals of the n_cent lowest-id vectors; round-6 L2 before
    every argmin, lowest-id tie-breaks; exact long micro-unit ranking) so
    the whole pipeline is oracle-checkable in DuckDB. Scale shape: coarse
    table, residual codebook, probe set and per-(query, bucket) distance
    tables all broadcast (|Q|·nprobe·m·n_cent rows); the corpus-sized
    relations are the (bucket, codes) ints — full-dim vectors die at
    encode time. Assignment/encode are max_by/min_by hash aggregates,
    never windows."""
    l2 = lambda a, b: F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    sub_of = lambda col, width: F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.struct(
                s.cast("int").alias("sub"),
                F.slice(col, s * width + 1, width).alias("sv"),
            ),
        )
    )
    e = corpus.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v"))
    coarse = (
        e.orderBy("vec_id")
        .limit(n_coarse)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    # L2 coarse assignment + residual, one map-side min_by aggregate
    assigned = (
        e.crossJoin(F.broadcast(coarse))
        .withColumn("d_c", l2(F.col("v"), F.col("cv")))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct(F.col("cid"), F.col("cv")),
                F.struct(F.col("d_c"), F.col("cid")),
            ).alias("cc"),
            F.first("v").alias("v"),
        )
        .select(
            "vec_id",
            F.col("cc.cid").alias("bucket"),
            F.zip_with("v", F.col("cc.cv"), lambda x, y: x - y).alias("r"),
        )
        .localCheckpoint(eager=True)  # feeds codebook + encode
    )
    # Codebook seeds EXCLUDE the coarse seeds: the lowest-id vectors are
    # the coarse centroids themselves, so their residuals are exactly
    # zero — seeding from them collapses the codebook to the origin and
    # quantizes nothing (measured: recall 0.02-0.16 vs 0.36-0.62 with
    # the exclusion). Deterministic: lowest-id NON-centroid residuals.
    cb = (
        assigned.join(
            F.broadcast(coarse.select(F.col("cid").alias("vec_id"))),
            "vec_id",
            "left_anti",
        )
        .orderBy("vec_id")
        .limit(n_cent)
        .select(F.col("vec_id").alias("code"), F.col("r").alias("cbv"))
    )
    width = (F.size("r") / m).cast("int")
    sub_rows = assigned.select(
        "vec_id", "bucket", sub_of(F.col("r"), width).alias("p")
    ).select("vec_id", "bucket", F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv"))
    cb_sub = cb.select(
        "code", sub_of(F.col("cbv"), (F.size("cbv") / m).cast("int")).alias("p")
    ).select("code", F.col("p.sub").alias("sub"), F.col("p.sv").alias("csv"))
    codes = (
        sub_rows.join(F.broadcast(cb_sub), "sub")
        .withColumn("dist", l2(F.col("sv"), F.col("csv")))
        .groupBy("vec_id", "bucket", "sub")
        .agg(
            F.min_by(F.col("code"), F.struct(F.col("dist"), F.col("code"))).alias(
                "code"
            )
        )
    )
    q = queries.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    qprobe = (
        q.crossJoin(F.broadcast(coarse))
        .withColumn("d_q", l2(F.col("qv"), F.col("cv")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("d_q"), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select(
            "query_id",
            F.col("cid").alias("bucket"),
            F.zip_with("qv", "cv", lambda x, y: x - y).alias("qr"),
        )
    )
    dtab = (
        qprobe.select(
            "query_id",
            "bucket",
            sub_of(F.col("qr"), (F.size("qr") / m).cast("int")).alias("p"),
        )
        .select(
            "query_id", "bucket", F.col("p.sub").alias("sub"), F.col("p.sv").alias("qsv")
        )
        .join(F.broadcast(cb_sub), "sub")
        .select(
            "query_id", "bucket", "sub", "code", l2(F.col("qsv"), F.col("csv")).alias("d")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_micro"), F.asc("vec_id"))
    micro = F.round(F.col("d") * 1e6).cast("long")
    return (
        codes.join(F.broadcast(dtab), ["bucket", "sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum(micro).alias("approx_micro"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("approx_micro") / 1e6, 6).alias("approx_dist"),
            "rank",
        )
    )


def knn_label_agreement(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-noise audit (confident-learning family): for every vector,
    the fraction of its k nearest neighbors (cosine) sharing its label.
    Low agreement flags probable mislabels / out-of-class embeddings —
    the report you run on labeled training data before trusting it.

    Execution is MAP-ONLY: the normalized corpus matrix + labels
    broadcast once (same documented ~0.5 GB/M-vector bound as
    ``cosine_near_dup_pairs``, the exact-baseline regime); each partition
    GEMMs its block against the broadcast and emits one row per vector —
    no shuffle at all, not even a window. Beyond broadcast reach, run the
    same per-bucket via the IVF assignment. Ties break (cos desc, id
    asc), matching the oracle's ROW_NUMBER order."""
    import numpy as np

    from ..catalog import ensure_parallelism

    rows = _gated_collect(
        emb.filter(
            F.col(vec_col).isNotNull()
            & F.col(id_col).isNotNull()
            & F.col(label_col).isNotNull()
        )
        .select(F.col(id_col), as_double(F.col(vec_col)).alias("v"), F.col(label_col)),
        "knn_label_agreement corpus",
        "knn_label_agreement_ivf",
    )
    sess = emb.sparkSession
    out_schema = (
        f"{id_col} long, {label_col} int, n_neighbors int, "
        "n_same_label int, knn_agreement double"
    )
    if len(rows) < 2:
        return sess.createDataFrame([], out_schema)
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    labels = np.array([r[label_col] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = sess.sparkContext.broadcast((ids, labels, mat))

    def score(batches):
        import pandas as pd

        all_ids, all_labels, corpus = bc.value
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna() & pdf[label_col].notna()]
            if len(pdf) == 0:
                continue
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block_labels = pdf[label_col].to_numpy(dtype=np.int64)
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block @ corpus.T, 6)
            recs = []
            for i in range(len(block_ids)):
                row = sims[i].copy()
                row[all_ids == block_ids[i]] = -np.inf  # exclude self
                order = np.lexsort((all_ids, -row))
                n_nb = min(k, len(all_ids) - 1)
                nb = order[:n_nb]
                n_same = int((all_labels[nb] == block_labels[i]).sum())
                recs.append(
                    (
                        block_ids[i],
                        block_labels[i],
                        n_nb,
                        n_same,
                        round(n_same / n_nb, 6),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[id_col, label_col, "n_neighbors", "n_same_label", "knn_agreement"],
            )

    return ensure_parallelism(
        emb.select(id_col, vec_col, label_col)
    ).mapInPandas(score, out_schema)


def knn_label_agreement_ivf(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-noise audit, IVF-BUCKETED scale path: same report as
    ``knn_label_agreement`` but the corpus NEVER reaches the driver — no
    ``collect()``, no whole-corpus broadcast, so it survives corpora far
    beyond the broadcast path's ~0.5 GB/M-vector bound.

    Plan: (1) deterministic coarse centroids (the ``n_centroids``
    lowest-id vectors — same convention as ``ivf_topk_deterministic``, so
    the whole pipeline is oracle-exact in SQL); (2) one broadcast
    cross-join assigns every vector its ranked centroid list (rounded
    cosine, cid tiebreak): rank 1 is its HOME bucket (where it lives as a
    candidate), ranks ≤ nprobe are the buckets it PROBES as a query;
    (3) per bucket, one Arrow-batched GEMM (``applyInPandas``) scores the
    bucket's probers against its home members and emits each prober's
    local top-k; (4) a global window merges the ≤ nprobe·k survivors per
    vector. Each candidate has exactly ONE home bucket, so a (query,
    candidate) pair is scored at most once and the per-bucket local top-k
    provably contains every global top-k member.

    With ``nprobe == n_centroids`` every bucket is probed and the output
    is IDENTICAL to the broadcast path (pinned in
    tests/test_similarity.py); smaller nprobe trades recall for scan
    fraction exactly like ``ivf_topk``. Shuffle cost: one hash exchange
    on bucket (bounded by the centroid assignment's balance) plus the
    per-vector merge window."""
    e = emb.filter(
        F.col(id_col).isNotNull()
        & F.col(vec_col).isNotNull()
        & F.col(label_col).isNotNull()
    ).select(F.col(id_col), as_double(F.col(vec_col)).alias("v"), F.col(label_col))
    cent = (
        e.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col("v").alias("cv"))
    )
    probed = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("cos_c", F.round(cosine(F.col("v"), F.col("cv")), 6))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("cos_c"), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= max(nprobe, 1))
        .select(
            F.col(id_col),
            "v",
            F.col(label_col),
            F.col("cid").alias("bucket"),
            (F.col("rn") == 1).alias("is_home"),
        )
    )

    cand_schema = (
        f"{id_col} long, {label_col} int, cand_id long, cand_label int, "
        "cos_sim double"
    )

    def gemm(pdf):
        import numpy as np
        import pandas as pd

        cols = [id_col, label_col, "cand_id", "cand_label", "cos_sim"]
        home = pdf[pdf["is_home"]]
        if len(home) == 0 or len(pdf) == 0:
            return pd.DataFrame(columns=cols)
        cand_ids = home[id_col].to_numpy(dtype=np.int64)
        cand_labels = home[label_col].to_numpy(dtype=np.int64)
        cmat = np.array(list(home["v"]), dtype=np.float64)
        cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
        q_ids = pdf[id_col].to_numpy(dtype=np.int64)
        q_labels = pdf[label_col].to_numpy(dtype=np.int64)
        qmat = np.array(list(pdf["v"]), dtype=np.float64)
        qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        sims = np.round(qmat @ cmat.T, 6)
        recs = []
        for i in range(len(q_ids)):
            row = sims[i].copy()
            row[cand_ids == q_ids[i]] = -np.inf  # exclude self
            order = np.lexsort((cand_ids, -row))
            for j in order[: min(k, len(cand_ids))]:
                if row[j] == -np.inf:
                    break
                recs.append(
                    (q_ids[i], q_labels[i], cand_ids[j], cand_labels[j], float(row[j]))
                )
        return pd.DataFrame(recs, columns=cols)

    local = probed.groupBy("bucket").applyInPandas(gemm, cand_schema)
    w = Window.partitionBy(id_col).orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    topk = local.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
    return topk.groupBy(id_col, label_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_neighbors"),
        F.sum((F.col("cand_label") == F.col(label_col)).cast("int"))
        .cast("int")
        .alias("n_same_label"),
        F.round(
            F.sum((F.col("cand_label") == F.col(label_col)).cast("int"))
            / F.count(F.lit(1)),
            6,
        ).alias("knn_agreement"),
    )


def dbscan_cosine(
    emb: DataFrame,
    eps_sim: float = 0.3,
    min_pts: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. KDD'96) over an
    embedding column with cosine similarity as the neighborhood relation:
    a point is CORE when its eps-neighborhood (cosine >= eps_sim,
    including itself) holds >= min_pts points; clusters are the connected
    components of the core-core eps-graph; a non-core point within eps of
    a core point is BORDER (assigned the MIN cluster id among its core
    neighbors — the deterministic version of the paper's arrival-order
    rule); everything else is NOISE. Returns (vec_id, role, cluster_id)
    with cluster_id = min member id, NULL for noise.

    ``pairs`` parameterizes the eps-pair source (the same pair-source
    injection the dedup cluster layers use): default is the exact blocked
    GEMM ``cosine_near_dup_pairs`` — right while the normalized corpus
    broadcast fits executor memory; at 100 TB feed it
    ``cosine_near_dup_lsh`` pairs (sub-quadratic bucketed candidates,
    exact verify) and the layers are unchanged. Scale shape: degree
    count and component rounds shuffle only the eps-EDGE list (near-dup
    edges are sparse by construction), never the corpus vectors."""
    from .graph import connected_components

    if pairs is None:
        pairs = cosine_near_dup_pairs(
            emb, threshold=eps_sim, id_col=id_col, vec_col=vec_col
        )
    # The pair list feeds degree, the core-core subgraph, and the border
    # join; materialize once (it is the sparse edge list, not the corpus).
    p = pairs.select("vec_a", "vec_b").localCheckpoint(eager=True)
    nodes = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).cast("long").alias("vec_id"))
    )
    sym = p.union(p.select("vec_b", "vec_a")).toDF("vec_id", "nbr")
    deg = sym.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n_nbrs"))
    core = (
        nodes.join(deg, "vec_id", "left")
        .filter(F.coalesce("n_nbrs", F.lit(0)) + 1 >= min_pts)
        .select("vec_id")
        .localCheckpoint(eager=True)
    )
    core_edges = p.join(
        core.select(F.col("vec_id").alias("vec_a")), "vec_a", "left_semi"
    ).join(core.select(F.col("vec_id").alias("vec_b")), "vec_b", "left_semi")
    comp = connected_components(core_edges, src="vec_a", dst="vec_b", nodes=core)
    core_out = comp.select(
        F.col("id").alias("vec_id"),
        F.lit("core").alias("role"),
        F.col("component").alias("cluster_id"),
    )
    border = (
        sym.join(core.select(F.col("vec_id").alias("nbr")), "nbr")
        .join(core, "vec_id", "left_anti")
        .join(comp.select(F.col("id").alias("nbr"), "component"), "nbr")
        .groupBy("vec_id")
        .agg(F.min("component").alias("cluster_id"))
        .select("vec_id", F.lit("border").alias("role"), "cluster_id")
    )
    noise = (
        nodes.join(core, "vec_id", "left_anti")
        .join(border.select("vec_id"), "vec_id", "left_anti")
        .select(
            "vec_id",
            F.lit("noise").alias("role"),
            F.lit(None).cast("long").alias("cluster_id"),
        )
    )
    return core_out.unionByName(border).unionByName(noise)


def bitext_mining_margin(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bitext mining by the MARGIN criterion (Artetxe & Schwenk, ACL 2019
    "Margin-based Parallel Corpus Mining"): for every source vector, the
    best target candidate scored by cos(x,y) normalized by the average
    similarity of each side's k nearest neighbors — raw cosine ranks
    "hub" vectors (close to everything) above true translations; the
    margin ratio cancels the hubness term. The standard miner behind
    CCMatrix/LASER-scale parallel-corpus construction — here the general
    cross-corpus alignment operator (captions to images, queries to
    passages, any two embedding spaces).

    Returns (src_id, tgt_id, cos_m, margin_micro): one row per source —
    its argmax-margin target. Integer micro-units end to end (cos floored
    to 1e-6, margin = 2k·cos_m/(ka_sum+kb_sum) floored to 1e-6), so the
    DuckDB oracle re-derives identical values (queries/llm.py).

    Scale shape: THIS is the exact baseline — cross-score with the
    smaller side broadcast, two ranking windows (per-src and per-tgt
    top-k sums), one join back. At web scale, generate candidates with
    ``ivf_topk``/``cosine_near_dup_lsh`` per side and feed the SAME
    margin algebra over the candidate set (the windows then ride the
    reduced candidate stream); the margin layer itself is
    pair-source-agnostic, the injectable-pairs convention
    ``dbscan_cosine`` uses."""
    from pyspark.sql import Window

    import numpy as np

    from ..catalog import ensure_parallelism

    a = src.filter(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("src_id"), as_double(F.col(vec_col)).alias("va")
    )
    b = tgt.filter(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("tgt_id"), as_double(F.col(vec_col)).alias("vb")
    )
    # Cross-score as the broadcast-GEMM pattern (cosine_near_dup_pairs):
    # a per-pair HOF cosine over the cross join re-allocates arrays and
    # re-computes norms per pair — measured 19 s for a 1025×975 cross at
    # sf0.1 vs ~1 s as a blocked matrix product.
    trows = _gated_collect(
        b, "bitext_mining_margin target set",
        "candidate-pair margin (feed ivf_topk/cosine_near_dup_lsh pairs)",
    )
    if not trows:
        return src.sparkSession.createDataFrame(
            [], "src_id long, tgt_id long, cos_m long, margin_micro long"
        )
    t_ids = np.array([r["tgt_id"] for r in trows], dtype=np.int64)
    t_mat = np.array([r["vb"] for r in trows], dtype=np.float64)
    t_mat = t_mat / np.linalg.norm(t_mat, axis=1, keepdims=True)
    # dense-pair gate: the exact baseline MATERIALIZES |src|x|tgt| scored
    # rows (3 consumers -> checkpoint); past ~2e8 pairs that is the
    # scale-killer (it OOMed the sf5 study JVM), and the candidate-pair
    # margin path is the answer — same gate family as _gated_collect
    n_src = a.count()
    if n_src * len(trows) > BITEXT_EXACT_MAX_PAIRS:
        raise ValueError(
            f"bitext_mining_margin: {n_src} x {len(trows)} dense pairs "
            f"exceed the exact-baseline gate ({BITEXT_EXACT_MAX_PAIRS}); "
            "feed candidate pairs (ivf_topk / cosine_near_dup_lsh) into "
            "the margin algebra instead, or raise BITEXT_EXACT_MAX_PAIRS "
            "deliberately"
        )
    bc = src.sparkSession.sparkContext.broadcast((t_ids, t_mat))

    def score(batches):
        import pandas as pd

        all_ids, corpus = bc.value
        rows_per_sub = max(1, (1 << 22) // max(1, len(all_ids)))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block_ids = pdf["src_id"].to_numpy(dtype=np.int64)
            block = np.array(list(pdf["va"]), dtype=np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            for s in range(0, len(block), rows_per_sub):
                sub_ids = block_ids[s : s + rows_per_sub]
                sims = block[s : s + rows_per_sub] @ corpus.T
                cos_m = np.floor(sims * 1e6 + 0.5).astype(np.int64)
                n_sub, n_t = cos_m.shape
                yield pd.DataFrame(
                    {
                        "src_id": np.repeat(sub_ids, n_t),
                        "tgt_id": np.tile(all_ids, n_sub),
                        "cos_m": cos_m.reshape(-1),
                    }
                )

    scored = ensure_parallelism(a).mapInPandas(
        score, "src_id long, tgt_id long, cos_m long"
    )
    # the cross-score feeds THREE consumers (both k-NN windows + the join
    # back); materialize it once
    scored = scored.localCheckpoint(eager=True)
    wa = Window.partitionBy("src_id").orderBy(F.desc("cos_m"), F.asc("tgt_id"))
    wb = Window.partitionBy("tgt_id").orderBy(F.desc("cos_m"), F.asc("src_id"))
    ka = (
        scored.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= k)
        .groupBy("src_id")
        .agg(F.sum("cos_m").alias("ka_sum"))
    )
    kb = (
        scored.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= k)
        .groupBy("tgt_id")
        .agg(F.sum("cos_m").alias("kb_sum"))
    )
    m = (
        scored.join(ka, "src_id")
        .join(kb, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cos_m",
            F.floor(
                F.lit(float(2 * k * 1_000_000))
                * F.col("cos_m")
                / (F.col("ka_sum") + F.col("kb_sum"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("margin_micro"),
        )
    )
    wbest = Window.partitionBy("src_id").orderBy(
        F.desc("margin_micro"), F.asc("tgt_id")
    )
    return (
        m.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- MMR (Maximal Marginal Relevance, Carbonell & Goldstein SIGIR'98) --------

def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversified top-k: greedily select ``k`` of each query's ``pool``
    nearest candidates maximizing λ·relevance − (1−λ)·max-similarity-to-
    already-selected — the selection rule for few-shot example pools and
    eval panels where the plain top-k is k near-duplicates of the same
    document. λ = lam_num/lam_den (default 0.7).

    Engine-exact by integer arithmetic: relevance and candidate-pair
    cosines are floored to int64 micro-units once, and every greedy
    comparison is ``lam_num·rel − (lam_den−lam_num)·max_sim`` over ints
    (ties → lowest id) — no FP drift can reorder a selection, so a
    5-step unrolled SQL oracle reproduces the selection exactly.

    Scale shape: candidate generation is the standard broadcast-queries ×
    corpus scan + per-query window (pool rows per query survive); the
    pair-similarity join and the greedy both touch ONLY the pool —
    O(pool²) rows per query — inside ``applyInPandas`` groups keyed by
    query, so the quadratic part is bounded by a constant and fully
    distributed across queries."""
    import pandas as pd

    mu = 1_000_000.0
    div = lam_den - lam_num
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            "cvec",
            F.floor(cosine(F.col("qvec"), F.col("cvec")) * mu + F.lit(0.5))
            .cast("long")
            .alias("rel_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel_micro"), F.asc(id_col))
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= pool)
        .localCheckpoint(eager=True)
    )
    a = cand.select(
        F.col("query_id").alias("qa"), F.col(id_col).alias("a"),
        F.col("cvec").alias("av"),
    )
    b = cand.select(
        F.col("query_id").alias("qb"), F.col(id_col).alias("b"),
        F.col("cvec").alias("bv"),
    )
    pairs = (
        a.join(b, F.col("qa") == F.col("qb"))
        .filter(F.col("a") < F.col("b"))
        .select(
            F.col("qa").alias("query_id"), "a", "b",
            F.floor(cosine(F.col("av"), F.col("bv")) * mu + F.lit(0.5))
            .cast("long")
            .alias("sim_micro"),
        )
    )
    rels = cand.select("query_id", F.col(id_col), "rel_micro")

    def greedy(key, rel_pdf, pair_pdf):
        qid = key[0]
        rel = dict(zip(rel_pdf[id_col], rel_pdf["rel_micro"]))
        sim = {}
        for aa, bb, ss in zip(pair_pdf["a"], pair_pdf["b"], pair_pdf["sim_micro"]):
            sim[(aa, bb)] = ss
            sim[(bb, aa)] = ss
        selected, out = [], []
        for pos in range(1, min(k, len(rel)) + 1):
            best = None
            for cid, r in rel.items():
                if cid in selected:
                    continue
                if not selected:
                    score = lam_num * int(r)
                else:
                    score = lam_num * int(r) - div * max(
                        int(sim[(cid, s)]) for s in selected
                    )
                if best is None or score > best[1] or (
                    score == best[1] and cid < best[0]
                ):
                    best = (cid, score)
            selected.append(best[0])
            out.append((best[0], best[1], pos))
        return pd.DataFrame(
            {
                "query_id": [qid] * len(out),
                id_col: [o[0] for o in out],
                "position": [o[2] for o in out],
                "rel_micro": [int(rel[o[0]]) for o in out],
                "mmr_micro": [o[1] for o in out],
            }
        )

    return rels.groupBy("query_id").cogroup(pairs.groupBy("query_id")).applyInPandas(
        greedy,
        f"query_id long, {id_col} long, position int, rel_micro long, "
        "mmr_micro long",
    )
