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
    the scan is partition-pruned. Centroids here are taken as a
    deterministic sample of the corpus (k-means would be the production
    refinement; assignment/probing plumbing is identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries × corpus scan →
    window rank. Returns (query_id, vec_id, cos_sim, rank)."""
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


def assign_ivf_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (bucket). At scale
    the output is written partitioned by ``bucket`` so probes prune files."""
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
    """Deterministic centroid pick: the n lowest ids. (Production: k-means;
    the bucketing/probing machinery is independent of centroid quality.)"""
    return (
        corpus.orderBy(id_col)
        .limit(n)
        .select(F.col(id_col).alias("centroid_id"), vec_col)
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
    centroids = sample_centroids(corpus, n_centroids, id_col, vec_col)
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
