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

from ..functions import text as T
from .dedup import ngram_jaccard_pairs
from .graph import near_dup_clusters


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
