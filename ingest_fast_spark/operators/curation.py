"""Corpus curation — the composed training-data pass as one plan.

annotate (quality, language, tokens) → filter → near-dup cluster the
survivors (Jaccard pairs → connected components) → canonical selection.
Declared here as an operator so the registered query (queries/llm.py,
full SQL oracle incl. recursive-CTE clustering) and the batch job
(jobs.run_curation) share one implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from ..functions import text as T
from .dedup import ngram_jaccard_pairs
from .graph import near_dup_clusters


def temperature_mix(docs: DataFrame, target_rows: int = 200) -> DataFrame:
    """Temperature-scaled domain mixing (alpha = 0.5): each source's quota
    of the ``target_rows`` output is proportional to sqrt(its count), the
    standard rebalancing that up-weights small domains relative to raw
    counts without letting any mega-domain keep its full share.

    Quotas use pure integer arithmetic — fixed-point sqrt weights, one
    exact integer SUM, half-up rounding via ``(2*w*T + S) div (2*S)`` —
    so the result is engine-exact (a float SUM's partition order could
    flip a floor() at the quota boundary; an integer sum cannot).

    Scale shape: quotas live on a per-domain table (broadcast, one row
    per source); doc ranking is a row_number window whose static
    pre-filter ``rank <= target_rows`` compiles to a map-side
    WindowGroupLimit, with the data-dependent ``rank <= quota`` applied
    after the join.
    """
    w_int = F.floor(F.sqrt(F.col("n_s")) * F.lit(1_000_000)).cast("bigint")
    weights = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_s"))
        .select("source", "n_s", w_int.alias("w"))
    )
    w_sum = weights.agg(F.sum("w").alias("w_sum"))
    quotas = weights.crossJoin(F.broadcast(w_sum)).select(
        "source",
        "n_s",
        F.least(
            F.col("n_s"),
            F.expr(f"(2 * w * {target_rows} + w_sum) div (2 * w_sum)"),
        ).alias("quota"),
    )
    rk = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    ranked = docs.select("doc_id", "source", rk.alias("rank_in_source")).filter(
        F.col("rank_in_source") <= target_rows
    )
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("rank_in_source") <= F.col("quota"))
        .select("doc_id", "source", "rank_in_source", "quota", "n_s")
    )


def cap_per_source(docs: DataFrame, cap: int = 10) -> DataFrame:
    """Domain rebalancing: keep at most ``cap`` documents per source so no
    single domain dominates the training mix (the C4/RefinedWeb-style
    per-domain quota). Priority is deterministic — longest document
    first, ``doc_id`` tiebreak — so reruns and the oracle agree.

    Scale shape: the ``row_number() <= cap`` predicate compiles to a
    map-side partial ``WindowGroupLimit`` (pinned in
    tests/test_plan_audit.py), so each input partition ships only its
    local top-``cap`` per source into the shuffle — a mega-domain costs
    O(partitions * cap) shuffle rows, not its full document count.
    """
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    capped = (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(w).alias("rank_in_source"),
        )
        .filter(F.col("rank_in_source") <= cap)
    )
    # Per-source totals come from a map-side-partial aggregate joined back,
    # NOT a count() over an unordered window: a full-partition frame would
    # force every row through the shuffle and disable the group-limit.
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("source_total"))
    return capped.join(F.broadcast(totals), "source").select(
        "doc_id", "source", "n_chars", "rank_in_source", "source_total"
    )


def curate_documents(
    docs: DataFrame,
    quality_min: float = 0.75,
    min_tokens: int = 20,
    lang: str = "en",
    shingle_k: int = 3,
    jaccard_threshold: float = 0.05,
) -> DataFrame:
    """(doc_id, quality, n_tokens, cluster_id) for every KEPT canonical
    doc. Survivor-only dedup: the O(pairs) stage runs on the post-filter
    corpus."""
    from ..catalog import ensure_parallelism

    # quality/token/langid scoring is regex-heavy and the kept-filter
    # inlines it; widen a single-split scan so it doesn't run one-task.
    docs = ensure_parallelism(docs)
    t = F.col("text")
    annotated = docs.select(
        "doc_id",
        "text",
        T.quality_score(t).alias("quality"),
        T.token_count(t).alias("n_tokens"),
        T.predicted_lang(t).alias("_lang"),
    )
    kept = annotated.filter(
        (F.col("quality") >= quality_min)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("_lang") == lang)
    )
    pairs = ngram_jaccard_pairs(kept, k=shingle_k, threshold=jaccard_threshold)
    clusters = near_dup_clusters(kept, pairs)
    return (
        kept.join(clusters, "doc_id")
        .filter(F.col("is_canonical"))
        .select("doc_id", "quality", "n_tokens", "cluster_id")
    )


def sinkhorn_domain_distance(
    docs: DataFrame,
    vocab_size: int = 16,
    eps: float = 0.1,
    n_iter: int = 15,
) -> DataFrame:
    """Entropy-regularized optimal-transport distance (Sinkhorn; Cuturi
    2013, "Sinkhorn Distances: Lightspeed Computation of Optimal
    Transport") between each domain's token distribution and the corpus
    distribution — a curation diagnostic that, unlike KL
    (``domain_kl_divergence``), respects CLOSENESS in token-rank space:
    a domain whose mass sits on near-ranked tokens scores closer than one
    whose mass sits far away, even at identical KL.

    Construction (deterministic end-to-end):
      * support = the ``vocab_size`` globally most frequent tokens
        (ties broken lexically), indexed 0..V-1 by global rank;
      * a_s = each source's count vector over that support, b = the global
        count vector — INTEGER counts normalized by exact integer sums, so
        both engines start from bit-identical doubles;
      * ground cost c(i,j) = |i-j|/(V-1) in rank space;
        Gibbs kernel K = exp(-c/eps);
      * ``n_iter`` full Sinkhorn pairs u = a/(Kv), v = b/(K'u), then
        cost = <diag(u) K diag(v), c>, rounded to 6 dp (the only
        engine-visible float divergence is summation order, ~1e-15).

    Scale shape: token counting is a two-phase hash agg; the support is a
    V-row broadcast; per-source vectors ride a (source, idx) agg. The
    V×V×n_iter solve runs inside ONE Arrow batch per source via
    applyInPandas — a million domains are a million independent tiny
    solves, embarrassingly parallel, with no driver traffic. Returns
    (source, sinkhorn_cost).
    """
    from ..catalog import ensure_parallelism

    docs = ensure_parallelism(docs).filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    )
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    ).filter(F.length("token") > 0)

    tok_counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), "token")
    # rank window over a V-row LIMIT — single-partition but vocab-sized
    top = (
        tok_counts.orderBy(F.desc("cnt"), "token")
        .limit(vocab_size)
        .withColumn("idx", F.row_number().over(w) - 1)
    )

    src_counts = (
        toks.join(F.broadcast(top.select("token", "idx")), "token")
        .groupBy("source", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # sources = those with >= 1 token on the support (engine-portable: a
    # source with NO support mass has no defined distribution — 0/0)
    grid = (
        src_counts.select("source")
        .distinct()
        .crossJoin(F.broadcast(top.select("idx", F.col("cnt").alias("b_cnt"))))
    )
    dense = grid.join(src_counts, ["source", "idx"], "left").select(
        "source", "idx", F.coalesce("c", F.lit(0)).alias("c"), "b_cnt"
    )

    import numpy as np
    import pandas as pd

    V, EPS, T_ITER = vocab_size, float(eps), int(n_iter)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx")
        a = pdf["c"].to_numpy(dtype="float64")
        b = pdf["b_cnt"].to_numpy(dtype="float64")
        a = a / a.sum()
        b = b / b.sum()
        idx = np.arange(V, dtype="float64")
        C = np.abs(idx[:, None] - idx[None, :]) / (V - 1)
        K = np.exp(-C / EPS)
        v = np.ones(V)
        for _ in range(T_ITER):
            u = a / (K @ v)
            v = b / (K.T @ u)
        cost = float((u[:, None] * K * v[None, :] * C).sum())
        return pd.DataFrame(
            {"source": [pdf["source"].iloc[0]], "sinkhorn_cost": [round(cost, 6)]}
        )

    return dense.groupBy("source").applyInPandas(
        solve, "source string, sinkhorn_cost double"
    )
