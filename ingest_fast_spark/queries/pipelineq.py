"""Training-pipeline evaluation & audit queries (SURVEY.md §2.9 [EXT]).

The curation surface (dedup, quality, mixing) answers "what goes into the
corpus"; this module answers "how good is what came out": retrieval-quality
evaluation (NDCG/MRR/P@k), LM-based document scoring (interpolated bigram
perplexity), train/eval split leakage auditing, quarantine gating with
reason codes, DSIR importance weights (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"), ZCA embedding whitening,
and per-user event anomaly detection.

Every query follows the registry parity conventions (queries/__init__.py):
identical aliases on both engines, doubles rounded to 6, arrays sorted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import ensure_parallelism, load_table
from ..functions import text as T
from ..operators import dedup as D
from ..operators import similarity as S
from . import register

# Shared DuckDB fragments mirroring functions/text.py exactly (same
# definitions as queries/llm.py — kept local so each module's oracles are
# self-contained strings).
_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"
_NON_ALNUM = r"round(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) / greatest(length(text), 1), 6)"


def _sw(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
    return f"round(len(list_filter({_TOKS}, t -> t IN ({words}))) / len({_TOKS}), 6)"


_SW_EN, _SW_DE, _SW_ES, _SW_FR = (_sw(lang) for lang in ("en", "de", "es", "fr"))

# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: NDCG@10 / MRR / P@10 for dense retrieval
# ---------------------------------------------------------------------------

_EVAL_QUERY_IDS = (0, 1, 2, 3, 4)
_EVAL_K = 10

_COS = (
    "list_dot_product(qv, v) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)))"
)


@register(
    "search_ndcg_eval",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv, label AS qlabel FROM e
      WHERE vec_id IN {_EVAL_QUERY_IDS}
    ),
    ranked AS (
      SELECT query_id, qlabel, e.vec_id, e.label,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY ROUND({_COS}, 6) DESC, e.vec_id) AS INT) AS rank
      FROM e CROSS JOIN q WHERE e.vec_id <> query_id
      QUALIFY rank <= {_EVAL_K}
    ),
    rel AS (
      SELECT query_id, rank,
             CASE WHEN label IS NOT NULL AND label = qlabel THEN 1 ELSE 0 END AS r
      FROM ranked
    ),
    tot AS (
      SELECT q.query_id, COUNT(*) AS n_rel
      FROM q JOIN e ON e.label = q.qlabel AND e.vec_id <> q.query_id
      GROUP BY q.query_id
    ),
    idcg AS (
      SELECT i AS n, SUM(1.0 / log2(i + 1.0)) OVER (ORDER BY i) AS v
      FROM generate_series(1, {_EVAL_K}) t(i)
    ),
    m AS (
      SELECT query_id,
             CAST(SUM(r) AS BIGINT) AS n_rel_topk,
             MAX(CASE WHEN r = 1 THEN 1.0 / rank ELSE 0 END) AS mrr_raw,
             SUM(r / log2(rank + 1.0)) AS dcg
      FROM rel GROUP BY query_id
    )
    SELECT m.query_id,
           m.n_rel_topk,
           CAST(COALESCE(tot.n_rel, 0) AS BIGINT) AS n_rel_total,
           ROUND(m.n_rel_topk / {_EVAL_K}.0, 6) AS p_at_k,
           ROUND(m.mrr_raw, 6) AS mrr,
           CASE WHEN COALESCE(tot.n_rel, 0) = 0 THEN 0.0
                ELSE ROUND(m.dcg / idcg.v, 6) END AS ndcg_at_k
    FROM m
    LEFT JOIN tot ON tot.query_id = m.query_id
    LEFT JOIN idcg ON idcg.n = LEAST({_EVAL_K}, COALESCE(tot.n_rel, 1))
    """,
)
def search_ndcg_eval(spark, sf_dir):
    """Dense-retrieval quality evaluation — the feedback loop every
    embedding-based dedup/retrieval stage needs: for 5 held-out query
    vectors, rank the corpus by exact cosine (top-10, the GEMM local-top-k
    operator), treat same-`label` as binary relevance, and report
    P@10 / MRR / NDCG@10 per query plus the corpus-wide relevant count.

    Scale shape: rides ``brute_force_topk`` (corpus never shuffles; only
    partitions×k×|Q| candidate rows reach the final rank); the label
    lookup joins the tiny top-k table back to the corpus scan, and the
    per-query relevant totals are one conditional aggregate over a
    broadcast 5-row query table. Metrics math is pure Column arithmetic
    on ≤ k rows per query."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("vec_id").isNotNull()
    )
    q = e.filter(F.col("vec_id").isin(*_EVAL_QUERY_IDS))
    qlab = q.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    top = S.brute_force_topk(e, q, k=_EVAL_K)
    labels = e.select("vec_id", "label")
    rel = (
        labels.join(F.broadcast(top), "vec_id")
        .join(F.broadcast(qlab), "query_id")
        .select(
            "query_id",
            "rank",
            F.when(
                F.col("label").isNotNull() & (F.col("label") == F.col("qlabel")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("r"),
        )
    )
    tot = (
        labels.join(
            F.broadcast(qlab), labels["label"] == qlab["qlabel"], "inner"
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    m = rel.groupBy("query_id").agg(
        F.sum("r").cast("long").alias("n_rel_topk"),
        F.round(
            F.max(F.when(F.col("r") == 1, F.lit(1.0) / F.col("rank")).otherwise(0.0)),
            6,
        ).alias("mrr"),
        F.sum(F.col("r") / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg"),
    )
    # IDCG(n) = sum_{i=1..min(k,n)} 1/log2(i+1), folded left-to-right in
    # ascending i on BOTH engines (DuckDB uses a cumulative window).
    n_rel = F.coalesce(F.col("n_rel"), F.lit(0))
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(_EVAL_K), F.greatest(n_rel, F.lit(1)))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
    )
    return (
        m.join(tot, "query_id", "left")
        .select(
            "query_id",
            "n_rel_topk",
            n_rel.cast("long").alias("n_rel_total"),
            F.round(F.col("n_rel_topk") / F.lit(float(_EVAL_K)), 6).alias("p_at_k"),
            "mrr",
            F.when(n_rel == 0, F.lit(0.0))
            .otherwise(F.round(F.col("dcg") / idcg, 6))
            .alias("ndcg_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# Interpolated bigram LM perplexity (CCNet-style scoring, one order up)
# ---------------------------------------------------------------------------

_LAMBDA = 0.75  # bigram weight; (1-λ) backs off to the unigram MLE


@register(
    "doc_bigram_logppl",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    tt AS (SELECT doc_id, t FROM t WHERE len(t) >= 2),
    b AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
        SELECT doc_id, unnest(list_transform(
                 generate_series(2, len(t)),
                 i -> {{'w1': t[i-1], 'w2': t[i]}})) AS p
        FROM tt)
    ),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM b GROUP BY w1, w2),
    cp AS (SELECT w1, COUNT(*) AS cp FROM b GROUP BY w1),
    uni AS (SELECT unnest(t) AS w FROM t),
    cw AS (SELECT w, COUNT(*) AS cw FROM uni GROUP BY w),
    tot AS (SELECT COUNT(*) AS n FROM uni),
    sc AS (
      SELECT b.doc_id,
             ln({_LAMBDA} * cb.cb / cp.cp + {1 - _LAMBDA} * cw.cw / tot.n) AS lp
      FROM b
      JOIN cb USING (w1, w2)
      JOIN cp USING (w1)
      JOIN cw ON cw.w = b.w2
      CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
           ROUND(-AVG(lp), 6) AS logppl
    FROM sc GROUP BY doc_id
    """,
)
def doc_bigram_logppl(spark, sf_dir):
    """Interpolated bigram language-model scoring — the next rung above
    ``doc_unigram_logppl`` on the CCNet quality ladder: train bigram +
    unigram MLEs on the corpus itself, score every document's tokens 2..n
    with p(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/N, and report mean
    negative log-prob per document (lower = more fluent under the corpus
    LM). Pairs are built map-only from the token array (no window
    shuffle); the bigram count table shuffles on (w₁,w₂) — vocabulary²-
    bounded, far below corpus size; the unigram table broadcasts.

    Docs with <2 tokens are unscored (no bigrams), matching DuckDB where
    ``generate_series(2, 1)`` would error rather than return empty."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    toks = T.tokens(F.col("text"))
    tt = d.select("doc_id", toks.alias("t")).filter(F.size("t") >= 2)
    b = (
        tt.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(2), F.size("t")),
                    lambda i: F.struct(
                        F.element_at("t", i - 1).alias("w1"),
                        F.element_at("t", i).alias("w2"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    cb = b.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cp = b.groupBy("w1").agg(F.count(F.lit(1)).alias("cp"))
    uni = d.select(F.explode(toks).alias("w"))
    cw = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    tot = uni.agg(F.count(F.lit(1)).alias("n"))
    lp = F.log(
        F.lit(_LAMBDA) * F.col("cb") / F.col("cp")
        + F.lit(1 - _LAMBDA) * F.col("cw") / F.col("n")
    )
    return (
        b.join(cb, ["w1", "w2"])
        .join(cp, "w1")
        .join(F.broadcast(cw), b["w2"] == cw["w"])
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.round(-F.avg(lp), 6).alias("logppl"),
        )
    )


# ---------------------------------------------------------------------------
# Train/eval split leakage audit
# ---------------------------------------------------------------------------

# Engine-portable pseudorandom split (same Knuth-multiply hash as
# sample_weighted / shard_training_data): ~10% of docs land in eval.
_SPLIT_KEY = "((doc_id % 1000000007) * 2654435761) % 10"
_LEAK_THR = 0.5


@register(
    "split_leakage_report",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, text, source, {_SPLIT_KEY} = 7 AS is_eval
      FROM documents WHERE doc_id IS NOT NULL
    ),
    she AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> array_to_string(t[i:i+2], ' ')))) AS shingle
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
            FROM d WHERE is_eval)
    ),
    sht AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> array_to_string(t[i:i+2], ' ')))) AS shingle
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
            FROM d WHERE NOT is_eval)
    ),
    sze AS (SELECT doc_id, COUNT(*) AS n FROM she GROUP BY doc_id),
    szt AS (SELECT doc_id, COUNT(*) AS n FROM sht GROUP BY doc_id),
    leaked AS (
      SELECT DISTINCT ov.doc_id FROM (
        SELECT a.doc_id AS doc_id, b.doc_id AS train_id, COUNT(*) AS n_common
        FROM she a JOIN sht b ON a.shingle = b.shingle
        GROUP BY a.doc_id, b.doc_id
      ) ov
      JOIN sze ON sze.doc_id = ov.doc_id
      JOIN szt ON szt.doc_id = ov.train_id
      WHERE ROUND(n_common / (sze.n + szt.n - n_common), 6) >= {_LEAK_THR}
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(COUNT(leaked.doc_id) AS BIGINT) AS n_leaked,
           ROUND(COUNT(leaked.doc_id) / COUNT(*), 6) AS leak_rate
    FROM d LEFT JOIN leaked ON leaked.doc_id = d.doc_id
    WHERE d.is_eval
    GROUP BY d.source
    """,
)
def split_leakage_report(spark, sf_dir):
    """Train/eval contamination audit — decontamination's sibling for the
    splits you MAKE rather than the benchmarks you import: form the
    standard deterministic 90/10 hash split, find eval docs whose 3-token-
    shingle Jaccard against ANY train doc reaches 0.5, and report the
    per-source leak rate (an eval set that near-duplicates its own train
    split inflates every metric measured on it; cf. Lee et al. 2022).

    Scale shape is ``dedup_cross_corpus``'s: asymmetric shingle-blocked
    join (eval shingles probe the train side — no train×train pairs ever
    form), exact Jaccard on candidates only, then a tiny distinct + a
    per-source aggregate over the ~10% eval slice."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    key = ((F.col("doc_id") % F.lit(1000000007)) * F.lit(2654435761)) % F.lit(10)
    d = d.withColumn("is_eval", key == 7)
    ev = d.filter(F.col("is_eval"))
    tr = d.filter(~F.col("is_eval"))
    she = D.shingles_df(ev)
    sht = D.shingles_df(tr).select(F.col("doc_id").alias("train_id"), "shingle")
    sze = she.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_e"))
    szt = sht.groupBy("train_id").agg(F.count(F.lit(1)).alias("n_t"))
    ov = (
        she.join(sht, "shingle")
        .groupBy("doc_id", "train_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # No broadcast hints: sze is one row per EVAL doc (~10% of the corpus)
    # and leaked up to one row per eval doc — both grow with the data, so a
    # forced broadcast is an unbounded driver-memory bet at 100 TB. Left as
    # shuffle joins; AQE still converts them to broadcast when small enough.
    leaked = (
        ov.join(sze, "doc_id")
        .join(szt, "train_id")
        .filter(
            F.round(
                F.col("n_common")
                / (F.col("n_e") + F.col("n_t") - F.col("n_common")),
                6,
            )
            >= _LEAK_THR
        )
        .select("doc_id")
        .distinct()
        .withColumn("leak", F.lit(1))
    )
    return (
        ev.join(leaked, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.count("leak").cast("long").alias("n_leaked"),
            F.round(F.count("leak") / F.count(F.lit(1)), 6).alias("leak_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Quarantine gate: route failing docs with machine-readable reason codes
# ---------------------------------------------------------------------------

_MIN_CHARS = 100
_MAX_NON_ALNUM = 0.25
_MIN_STOPWORD = 0.03
_MAX_AVG_TOKLEN = 12.0


def quarantine_reasons(text, n_chars):
    """Sorted array of failed gate-rule codes for one document — shared by
    the standalone gate query and the curation decision ledger so the two
    can never disagree about what 'failing the gate' means."""
    no_text = F.coalesce(
        text.isNull() | (F.length(F.trim(text)) == 0), F.lit(True)
    )
    too_short = F.coalesce(n_chars < _MIN_CHARS, F.lit(False))
    low_alpha = F.coalesce(
        T.non_alnum_ratio(text) > _MAX_NON_ALNUM, F.lit(False)
    )
    no_stopwords = F.coalesce(
        F.greatest(*[T.stopword_ratio(text, lang) for lang in T.STOPWORDS])
        < _MIN_STOPWORD,
        F.lit(False),
    )
    long_words = F.coalesce(
        T.avg_token_len(text) > _MAX_AVG_TOKLEN, F.lit(False)
    )
    return F.array_sort(
        F.array_compact(
            F.array(
                F.when(no_text, F.lit("no_text")),
                F.when(too_short, F.lit("too_short")),
                F.when(~no_text & low_alpha, F.lit("low_alpha")),
                F.when(~no_text & no_stopwords, F.lit("no_stopwords")),
                F.when(~no_text & long_words, F.lit("long_words")),
            )
        )
    )


# DuckDB twin of ``quarantine_reasons`` (identical rule set + ordering).
_QUARANTINE_REASONS_SQL = rf"""list_sort(list_filter([
  CASE WHEN COALESCE(text IS NULL OR length(trim(text)) = 0, TRUE)
    THEN 'no_text' END,
  CASE WHEN COALESCE(n_chars < {_MIN_CHARS}, FALSE) THEN 'too_short' END,
  CASE WHEN NOT COALESCE(text IS NULL OR length(trim(text)) = 0, TRUE)
        AND COALESCE({{na}} > {_MAX_NON_ALNUM}, FALSE) THEN 'low_alpha' END,
  CASE WHEN NOT COALESCE(text IS NULL OR length(trim(text)) = 0, TRUE)
        AND COALESCE(greatest({{swe}}, {{swd}}, {{sws}}, {{swf}})
                     < {_MIN_STOPWORD}, FALSE) THEN 'no_stopwords' END,
  CASE WHEN NOT COALESCE(text IS NULL OR length(trim(text)) = 0, TRUE)
        AND COALESCE(round(length(regexp_replace(trim(text), '\s+', '', 'g'))
                     / len({{toks}}), 6) > {_MAX_AVG_TOKLEN}, FALSE)
    THEN 'long_words' END
], x -> x IS NOT NULL))"""


def quarantine_reasons_sql() -> str:
    return _QUARANTINE_REASONS_SQL.format(
        na=_NON_ALNUM, swe=_SW_EN, swd=_SW_DE, sws=_SW_ES, swf=_SW_FR, toks=_TOKS
    )


@register(
    "quality_quarantine",
    oracle=rf"""
    WITH checks AS (
      SELECT doc_id,
             COALESCE(text IS NULL OR length(trim(text)) = 0, TRUE) AS no_text,
             COALESCE(n_chars < {_MIN_CHARS}, FALSE) AS too_short,
             COALESCE({_NON_ALNUM} > {_MAX_NON_ALNUM}, FALSE) AS low_alpha,
             COALESCE(greatest({_SW_EN}, {_SW_DE}, {_SW_ES}, {_SW_FR})
                      < {_MIN_STOPWORD}, FALSE) AS no_stopwords,
             COALESCE(round(length(regexp_replace(trim(text), '\s+', '', 'g'))
                      / len({_TOKS}), 6) > {_MAX_AVG_TOKLEN}, FALSE) AS long_words
      FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT doc_id,
           len(reasons) = 0 AS passed,
           COALESCE(array_to_string(reasons, '|'), '') AS reasons
    FROM (
      SELECT doc_id, list_sort(list_filter([
               CASE WHEN no_text THEN 'no_text' END,
               CASE WHEN too_short THEN 'too_short' END,
               CASE WHEN NOT no_text AND low_alpha THEN 'low_alpha' END,
               CASE WHEN NOT no_text AND no_stopwords THEN 'no_stopwords' END,
               CASE WHEN NOT no_text AND long_words THEN 'long_words' END
             ], x -> x IS NOT NULL)) AS reasons
      FROM checks
    )
    """,
)

def quality_quarantine(spark, sf_dir):
    """Quarantine gate — the production shape of quality filtering: every
    document gets a pass/fail verdict PLUS the sorted '|'-joined list of
    machine-readable reason codes that failed (so the quarantine table is
    auditable and rules can be re-litigated without re-running the gate).
    Rules reuse the engine's quality signals: empty text, sub-100
    chars, punctuation ratio, stopword floor across the four language
    profiles, and average token length (gibberish/URL farms). Map-only —
    a single scan, no shuffle; at 100 TB this is the cheapest stage of
    the pipeline and the reason string costs nothing extra. (Scalar
    columns only: the driver's canonicalizer cannot hash array cells, so
    registered outputs flatten lists to deterministic strings.
    ensure_parallelism is the local-mode guard only — at 100 TB the scan
    itself is thousands of splits and the guard is a no-op.)"""
    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    )
    reasons = quarantine_reasons(F.col("text"), F.col("n_chars"))
    return d.select(
        "doc_id",
        (F.size(reasons) == 0).alias("passed"),
        F.array_join(F.array_sort(reasons), "|").alias("reasons"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed-ngram importance resampling)
# ---------------------------------------------------------------------------

_DSIR_TARGET = ("src0", "src1")
_DSIR_BUCKETS = 1024


@register(
    "curation_dsir_weights",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id,
             COALESCE(source IN {_DSIR_TARGET}, FALSE) AS is_target,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    vocab AS (
      SELECT w,
             CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr,
             {D.portable_hash60_sql("w")} % {_DSIR_BUCKETS} AS b
      FROM toks GROUP BY w
    ),
    buckets AS (
      SELECT b, SUM(ct) AS ct, SUM(cr) AS cr FROM vocab GROUP BY b
    ),
    totals AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM vocab),
    ratio AS (
      SELECT b, ln((ct + 1.0) / (tt + {_DSIR_BUCKETS}))
                - ln((cr + 1.0) / (tr + {_DSIR_BUCKETS})) AS lr
      FROM buckets CROSS JOIN totals
    ),
    wmap AS (SELECT w, lr FROM vocab JOIN ratio USING (b))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           ROUND(SUM(lr), 6) AS log_weight
    FROM toks JOIN wmap USING (w)
    WHERE NOT is_target
    GROUP BY doc_id
    """,
)
def curation_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): score every raw-pool
    document by how target-like its hashed-unigram profile is, so the
    corpus can be importance-resampled toward a high-quality target
    domain (here sources ('src0', 'src1') stand in for the target set).
    Feature space = 1024 hash buckets of the engine-portable
    60-bit md5 fold; bucket LMs are Laplace-smoothed; a document's
    log-weight is Σ_tokens ln(p_target(b)/p_raw(b)).

    Scale shape: token hashing happens ONCE per distinct vocabulary word
    (the md5 cost is vocab-sized, not corpus-sized — the BPE-encode
    pattern); the bucket tables are 1024 rows and broadcast. The
    word→log-ratio map is vocabulary-sized — SUBLINEAR in the corpus but
    unbounded (billions of distinct tokens at 100 TB of web text), so it
    carries NO broadcast hint: AQE broadcasts it while it fits and falls
    back to a shuffle join when the vocabulary outgrows the threshold
    (the repo-wide rule: hints only on provably bounded sides)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    is_target = F.coalesce(F.col("source").isin(*_DSIR_TARGET), F.lit(False))
    toks = d.select(
        "doc_id",
        is_target.alias("is_target"),
        F.explode(T.tokens(F.col("text"))).alias("w"),
    )
    vocab = toks.groupBy("w").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).cast("long").alias("cr"),
    ).withColumn("b", D.portable_hash60(F.col("w")) % _DSIR_BUCKETS)
    buckets = vocab.groupBy("b").agg(
        F.sum("ct").alias("bct"), F.sum("cr").alias("bcr")
    )
    totals = vocab.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    ratio = buckets.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("bct") + 1.0) / (F.col("tt") + F.lit(float(_DSIR_BUCKETS))))
            - F.log((F.col("bcr") + 1.0) / (F.col("tr") + F.lit(float(_DSIR_BUCKETS))))
        ).alias("lr"),
    )
    wmap = vocab.select("w", "b").join(F.broadcast(ratio), "b").select("w", "lr")
    return (
        toks.filter(~F.col("is_target"))
        .join(wmap, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.round(F.sum("lr"), 6).alias("log_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user event anomaly detection (rolling z-score)
# ---------------------------------------------------------------------------

_Z_WINDOW = 20
_Z_MIN_PRIOR = 8
_Z_THR = 3.0


@register(
    "events_anomaly_zscore",
    oracle=f"""
    SELECT user_id, event_id, ts, value, zscore FROM (
      SELECT user_id, event_id, ts, value,
             COUNT(value) OVER w AS c,
             STDDEV_SAMP(value) OVER w AS s,
             ROUND((value - AVG(value) OVER w)
                   / STDDEV_SAMP(value) OVER w, 6) AS zscore
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_Z_WINDOW} PRECEDING AND 1 PRECEDING)
    ) WHERE c >= {_Z_MIN_PRIOR} AND s > 0 AND ABS(zscore) > {_Z_THR}
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    """Streaming-telemetry outlier detection, batch form: each event's
    value is z-scored against that user's OWN trailing window (previous
    20 events, self excluded — no leakage of the candidate into
    its own baseline), and events beyond ±3σ with at least
    8 prior observations are flagged. One shuffle on
    user_id; the frame is rows-based so state per key is O(20).
    The filter compares the ROUNDED z on both engines so an ULP-level
    stddev difference can't flip a boundary row in or out."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_WINDOW, -1)
    )
    z = F.round(
        (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w), 6
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.count("value").over(w).alias("c"),
            F.stddev_samp("value").over(w).alias("s"),
            z.alias("zscore"),
        )
        .filter(
            (F.col("c") >= _Z_MIN_PRIOR)
            & (F.col("s") > 0)
            & (F.abs(F.col("zscore")) > _Z_THR)
        )
        .drop("c", "s")
    )


# ---------------------------------------------------------------------------
# ZCA embedding whitening (rows-only: eigendecomposition is not SQL)
# ---------------------------------------------------------------------------


@register("embedding_whiten_zca")
def embedding_whiten_zca(spark, sf_dir):
    """ZCA whitening of the embedding table — decorrelate dimensions and
    equalize variance before cosine/euclidean work (whitening measurably
    improves retrieval on anisotropic embedding spaces; cf. Su et al.
    2021, "Whitening Sentence Representations"). ZCA's W = U·Λ^{-1/2}·Uᵀ
    is symmetric and UNIQUE, so the output is deterministic — no
    eigenvector sign/order ambiguity (the reason this registers rows-only:
    eigendecomposition itself is not SQL-expressible; the covariance≈I
    invariant is asserted in tests/test_pipelineq.py). Output is the
    EXPLODED (vec_id, dim, value) long form — scalar columns only, per
    the driver-canonicalizer contract (array cells are unhashable there).

    Scale shape: one pass computes per-partition moment blocks (count,
    Σx, XᵀX — d×d doubles each, d=64 ⇒ 32 KB/partition) via mapInPandas;
    the driver reduces ≤ n_partitions tiny blocks, runs the d×d eigh, and
    broadcasts W; the transform itself is a second map-only pass. The
    corpus never shuffles."""
    import numpy as np

    from ..catalog import ensure_parallelism

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("vec_id").isNotNull()
    )
    spark_ = e.sparkSession

    def moments(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf["embedding"].notna()]
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "xtx": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = (
        ensure_parallelism(e.select("embedding"))
        .mapInPandas(moments, "n long, s array<double>, xtx array<double>")
        .collect()
    )
    out_schema = "vec_id long, dim int, value double"
    if not rows:
        return spark_.createDataFrame([], out_schema)
    n = sum(r["n"] for r in rows)
    s = np.sum([r["s"] for r in rows], axis=0)
    d_dim = s.shape[0]
    xtx = np.sum([np.array(r["xtx"]).reshape(d_dim, d_dim) for r in rows], axis=0)
    mu = s / n
    cov = xtx / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    w_mat = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, 0.0) + 1e-6)) @ evecs.T
    bc = spark_.sparkContext.broadcast((mu, w_mat))

    def transform(batches):
        import pandas as pd

        mu_b, w_b = bc.value
        for pdf in batches:
            pdf = pdf[pdf["embedding"].notna()]
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            out = np.round((x - mu_b) @ w_b, 6)
            n_rows, d = out.shape
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), d),
                    "dim": np.tile(np.arange(d, dtype=np.int32), n_rows),
                    "value": out.ravel(),
                }
            )

    return e.select("vec_id", "embedding").mapInPandas(transform, out_schema)


@register(
    "embedding_whiten_invariants",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(max(len(embedding)) AS INT) AS dims,
           count(*) > 0 AS mean_zero_ok,
           count(*) > 0 AS cov_identity_ok
    FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    """,
)
def embedding_whiten_invariants(spark, sf_dir):
    """Driver-attestable companion to the rows-only ``embedding_whiten_zca``:
    runs the SAME whitening pipeline, then EMPIRICALLY re-measures the
    covariance of the transformed vectors with a second distributed moment
    pass and emits the defining invariants as bounded booleans — mean ≈ 0
    (|μ|∞ ≤ 1e-6; exact up to float error) and covariance ≈ I (off-diagonal
    and diagonal deviation ≤ 0.05, the slack the 1e-6 eigenvalue
    regularizer costs). The oracle states the invariants MUST hold, so a
    green row proves the eigendecomposition-backed transform — which SQL
    cannot express — actually decorrelates, not merely that it runs.
    This is the bounded-boolean pattern sketch_quantile_report uses.

    Scale shape: two map-only moment passes (d×d doubles per partition,
    d=64 ⇒ 32 KB blocks) + one bounded driver-side d×d eigh; the corpus
    never shuffles and never reaches the driver."""
    import numpy as np

    from ..catalog import ensure_parallelism

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("vec_id").isNotNull()
    )
    spark_ = e.sparkSession
    out_schema = (
        "n_vectors long, dims int, mean_zero_ok boolean, cov_identity_ok boolean"
    )

    def moments(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf["embedding"].notna()]
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "xtx": [(x.T @ x).ravel().tolist()],
                }
            )

    moment_schema = "n long, s array<double>, xtx array<double>"

    def reduce_moments(rows):
        n = sum(r["n"] for r in rows)
        s = np.sum([r["s"] for r in rows], axis=0)
        d = s.shape[0]
        xtx = np.sum([np.array(r["xtx"]).reshape(d, d) for r in rows], axis=0)
        mu = s / n
        return n, mu, xtx / n - np.outer(mu, mu)

    rows = (
        ensure_parallelism(e.select("embedding"))
        .mapInPandas(moments, moment_schema)
        .collect()
    )
    if not rows:
        return spark_.createDataFrame([(0, None, None, None)], out_schema)
    n, mu, cov = reduce_moments(rows)
    evals, evecs = np.linalg.eigh(cov)
    w_mat = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, 0.0) + 1e-6)) @ evecs.T
    bc = spark_.sparkContext.broadcast((mu, w_mat))

    def whitened_moments(batches):
        import pandas as pd

        mu_b, w_b = bc.value
        for pdf in batches:
            pdf = pdf[pdf["embedding"].notna()]
            if len(pdf) == 0:
                continue
            x = (np.array(list(pdf["embedding"]), dtype=np.float64) - mu_b) @ w_b
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "xtx": [(x.T @ x).ravel().tolist()],
                }
            )

    wrows = (
        ensure_parallelism(e.select("embedding"))
        .mapInPandas(whitened_moments, moment_schema)
        .collect()
    )
    _, wmu, wcov = reduce_moments(wrows)
    d_dim = int(wmu.shape[0])
    off = wcov - np.diag(np.diag(wcov))
    mean_ok = bool(np.abs(wmu).max() <= 1e-6)
    cov_ok = bool(
        np.abs(off).max() <= 0.05
        and np.abs(np.diag(wcov) - 1.0).max() <= 0.05
    )
    return spark_.createDataFrame(
        [(int(n), d_dim, mean_ok, cov_ok)], out_schema
    )


# ---------------------------------------------------------------------------
# Character-entropy quality signal
# ---------------------------------------------------------------------------


@register(
    "text_char_entropy",
    oracle=r"""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c, length(text) AS n
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL AND length(text) > 0
    ),
    counts AS (SELECT doc_id, c, n, COUNT(*) AS k FROM ch GROUP BY doc_id, c, n)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_unique_chars,
           ROUND(-SUM((k / n) * log2(k / n)), 6) AS char_entropy
    FROM counts GROUP BY doc_id
    """,
)
def text_char_entropy(spark, sf_dir):
    """Shannon entropy of the per-document character distribution, in
    bits/char — the zero-dependency stand-in for the gzip-compression-
    ratio quality signal (Gopher's repetition heuristics catch token
    loops; LOW char entropy catches sub-token degeneration — aaaaa…,
    base64 walls score HIGH — both tails are quarantine candidates).
    One explode + a combinable (doc, char) count: the shuffle key space
    is |docs|×|alphabet|, and partial aggregation collapses each
    partition's counts before the exchange."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
        & (F.length("text") > 0)
    )
    ch = d.select(
        "doc_id",
        F.length("text").alias("n"),
        F.explode(F.split(F.col("text"), "")).alias("c"),
    )
    counts = ch.groupBy("doc_id", "c", "n").agg(F.count(F.lit(1)).alias("k"))
    p = F.col("k") / F.col("n")
    return counts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique_chars"),
        F.round(-F.sum(p * F.log2(p)), 6).alias("char_entropy"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty (per-document dedup-health score)
# ---------------------------------------------------------------------------

_NOVELTY_K = 5


@register(
    "text_ngram_novelty",
    oracle=rf"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - {_NOVELTY_K - 1}, 0)),
               i -> array_to_string(t[i:i+{_NOVELTY_K - 1}], ' ')))) AS shingle
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
            FROM documents WHERE doc_id IS NOT NULL)
    ),
    df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           ROUND(1.0 - SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS novelty
    FROM sh JOIN df USING (shingle)
    GROUP BY sh.doc_id
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty — the document-granular dedup-health
    metric: the share of a doc's distinct 5-token shingles that appear in
    NO other document (df = 1; a doc's own repeats don't count against it
    since shingles are per-doc distinct). Low novelty ⇒ boilerplate /
    template / near-dup content even when no single pair crosses a
    Jaccard threshold. Two combinable aggregates + one join keyed on the
    shingle — the same shuffle the Jaccard family already pays, with no
    pair enumeration at all."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    # Shingle IDENTITY is all this query keys on — ship the 8-byte
    # xxhash64, not the 5-token string, into the df-count exchange and the
    # join (guide §2.3; same ~2^-64 collision trade as the MinHash family;
    # the oracle's string-keyed df counts are identical absent a collision).
    sh = D.shingle_hashes_df(d, k=_NOVELTY_K)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    shared = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            shared.cast("long").alias("n_shared"),
            F.round(F.lit(1.0) - shared / F.count(F.lit(1)), 6).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding outliers vs own-label centroid
# ---------------------------------------------------------------------------

_OUTLIER_Z = 2.0


@register(
    "embedding_outlier_report",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id IS NOT NULL AND label IS NOT NULL AND embedding IS NOT NULL
    ),
    ex AS (
      SELECT vec_id, label, p.pos AS pos, p.val AS val FROM (
        SELECT vec_id, label, unnest(list_transform(
                 generate_series(1, len(v)),
                 i -> {{'pos': i, 'val': v[i]}})) AS p
        FROM e)
    ),
    cen AS (SELECT label, pos, AVG(val) AS c FROM ex GROUP BY label, pos),
    dist AS (
      SELECT vec_id, ex.label AS label,
             sqrt(SUM((val - c) * (val - c))) AS dist
      FROM ex JOIN cen ON cen.label = ex.label AND cen.pos = ex.pos
      GROUP BY vec_id, ex.label
    ),
    stats AS (
      SELECT label, AVG(dist) AS m, STDDEV_SAMP(dist) AS s
      FROM dist GROUP BY label
    )
    SELECT vec_id, dist.label AS label,
           ROUND(dist, 6) AS dist,
           ROUND((dist - m) / s, 6) AS zscore
    FROM dist JOIN stats ON stats.label = dist.label
    WHERE s > 0 AND ROUND((dist - m) / s, 6) >= {_OUTLIER_Z}
    """,
)
def embedding_outlier_report(spark, sf_dir):
    """Embedding outlier audit — vectors far from their OWN label's
    centroid (≥ +2σ of that label's distance distribution) are mislabel /
    corrupted-encode / out-of-distribution candidates; the geometric
    complement of the kNN label-noise audit (which asks who your
    neighbors are, not how far your center is). Three combinable
    aggregates: per-(label,dim) centroid, per-vector distance (shuffle
    keyed on vec_id), per-label moments broadcast back onto the tiny
    distance table. The filter compares the ROUNDED z so an ULP-level
    stddev difference can't flip a boundary row."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("label").isNotNull()
        & F.col("embedding").isNotNull()
    )
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode(S.as_double(F.col("embedding"))).alias("pos0", "val"),
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "val")
    cen = ex.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    dist = (
        ex.join(cen, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum((F.col("val") - F.col("c")) * (F.col("val") - F.col("c")))).alias("dist"))
    )
    stats = dist.groupBy("label").agg(
        F.avg("dist").alias("m"), F.stddev_samp("dist").alias("s")
    )
    z = F.round((F.col("dist") - F.col("m")) / F.col("s"), 6)
    return (
        dist.join(F.broadcast(stats), "label")
        .filter((F.col("s") > 0) & (z >= _OUTLIER_Z))
        .select("vec_id", "label", F.round("dist", 6).alias("dist"), z.alias("zscore"))
    )


# ---------------------------------------------------------------------------
# Quantile-sketch accuracy report (rows-only: the sketch is engine-specific)
# ---------------------------------------------------------------------------

_SKETCH_QS = (0.25, 0.5, 0.75, 0.9, 0.99)
_SKETCH_ACCURACY = 10000


@register(
    "sketch_quantile_report",
    oracle=f"""
    WITH v AS (
      SELECT o_totalprice AS x FROM orders WHERE o_totalprice IS NOT NULL
    ),
    e AS (
      SELECT quantile_cont(x, {list(_SKETCH_QS)}) AS ex FROM v
    )
    SELECT {list(_SKETCH_QS)}[i] AS quantile,
           ROUND(ex[i], 6) AS exact_value,
           TRUE AS approx_within_bound
    FROM e, generate_series(1, {len(_SKETCH_QS)}) t(i)
    """,
)
def sketch_quantile_report(spark, sf_dir):
    """Approximate-quantile accuracy report: ``percentile_approx`` (the
    mergeable KLL/GK-family sketch every 100 TB job would actually use —
    exact percentiles require a full sort per group) checked against the
    exact percentile. The sketch's raw VALUES are engine-specific (DuckDB
    has no twin) and partitioning-dependent, so the registered row
    carries the deterministic pieces only: the exact percentile plus a
    boolean attesting the sketch met its published rank-error guarantee
    (≤ 1/accuracy, +1-row slack for rank-range/rounding edges) — TRUE by
    the algorithm's contract on any input, hence oracle-exact.

    Scale shape: both estimators are partial-aggregable (one pass, no row
    shuffle — only per-partition sketches merge); the rank check joins
    the 5-row quantile frame back to the scan as a broadcast, a second
    map-only pass."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    qs = list(_SKETCH_QS)
    eps = 1.0 / _SKETCH_ACCURACY
    agg = o.agg(
        F.percentile_approx("o_totalprice", qs, _SKETCH_ACCURACY).alias("approx"),
        F.percentile("o_totalprice", F.array(*[F.lit(q) for q in qs])).alias("exact"),
        F.count("o_totalprice").alias("n"),
    )
    z = agg.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("quantile"),
                F.col("approx"),
                F.col("exact"),
            )
        ).alias("r"),
        "n",
    ).select(
        F.col("r.quantile").alias("quantile"),
        F.col("r.approx").alias("approx"),
        F.col("r.exact").alias("exact"),
        "n",
    )
    # Rank positions of the sketch's value: rows strictly below and
    # rows ≤ — the value's true rank is anywhere in (lt, le], and the
    # guarantee is that SOME rank in that range is within eps*n of q*n.
    ranks = (
        o.crossJoin(F.broadcast(z))
        .groupBy("quantile", "approx", "exact", "n")
        .agg(
            F.sum((F.col("o_totalprice") <= F.col("approx")).cast("long")).alias("le"),
            F.sum((F.col("o_totalprice") < F.col("approx")).cast("long")).alias("lt"),
        )
    )
    within = (
        F.col("le") >= F.col("quantile") * F.col("n") - F.lit(eps) * F.col("n") - 1
    ) & (F.col("lt") <= F.col("quantile") * F.col("n") + F.lit(eps) * F.col("n") + 1)
    return ranks.select(
        "quantile",
        F.round("exact", 6).alias("exact_value"),
        within.alias("approx_within_bound"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch accuracy report (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

_CMS_TOP = 20
# e scaled to micro-units, rounded UP (2.7182818… → 2.718282): keeps the
# published err ≤ (e/w)·N bound checkable in exact integer arithmetic on
# both engines (no float rounding at the comparison boundary).
_CMS_E_MICRO = 2718282


def _cms_oracle() -> str:
    from ..operators.dedup import _MINHASH_P
    from ..operators.sketches import CMS_W, _cms_fams

    fams = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_cms_fams()))
    h60 = D.portable_hash60_sql("tok")
    return f"""
    WITH tk AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents WHERE text IS NOT NULL
    ),
    fam(i, a, b) AS (VALUES {fams}),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tk),
    occ AS (SELECT (({h60}) % {_MINHASH_P}) AS h FROM tk),
    cells AS (
      SELECT fam.i, ((fam.a * occ.h + fam.b) % {_MINHASH_P}) % {CMS_W} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM occ CROSS JOIN fam GROUP BY 1, 2
    ),
    top AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact,
             (({h60}) % {_MINHASH_P}) AS h
      FROM tk GROUP BY tok ORDER BY n_exact DESC, tok LIMIT {_CMS_TOP}
    ),
    est AS (
      SELECT top.tok, top.n_exact, MIN(cells.cnt) AS n_est
      FROM top CROSS JOIN fam
      JOIN cells ON cells.i = fam.i
       AND cells.bucket = ((fam.a * top.h + fam.b) % {_MINHASH_P}) % {CMS_W}
      GROUP BY top.tok, top.n_exact
    )
    SELECT tok, n_exact, n_est, n_est - n_exact AS overcount,
           (n_est - n_exact) * {CMS_W} * 1000000 <= {_CMS_E_MICRO} * n_total
             AS within_bound
    FROM est CROSS JOIN tot
    """


@register("sketch_cms_report", oracle=_cms_oracle())
def sketch_cms_report(spark, sf_dir):
    """Count-Min sketch accuracy report (Cormode & Muthukrishnan 2005):
    build the d×w counter table over the corpus token stream, then check
    the sketch's estimates for the top-20 exact-frequency tokens
    against their true counts and the published error bound
    err ≤ (e/w)·N — the bound compare runs in exact integer micro-units
    so the boolean is parity-stable. Hashing is the engine-portable
    md5-derived token hash through the MinHash affine-family machinery,
    so DuckDB rebuilds the IDENTICAL sketch: the driver attests the
    sketch construction itself, not just the report arithmetic.

    Why CMS earns a slot next to the exact Misra-Gries path
    (text_heavy_hitters): MG answers "which tokens are frequent", CMS
    answers point queries for ANY token from d·w = 4×256 counters —
    the running corpus-frequency summary a 100 TB streaming ingest keeps
    when the vocabulary itself no longer fits. Scale shape: the cell
    build partial-aggregates map-side (≤ d·w cells leave each task); the
    exact side exists only because this is an accuracy report; the cells
    and top-token tables both broadcast for the estimate join."""
    from ..operators.dedup import _MINHASH_P
    from ..operators.sketches import CMS_D, CMS_W, cms_bucket, cms_cells

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tk = d.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    # Reused by the cell build, the total, and the exact counts — one
    # materialization keeps the scan+explode from running three times.
    tk = tk.localCheckpoint(eager=True)
    cells = cms_cells(tk)  # (row_i, bucket, cnt): at most d*w = 1024 rows
    total = tk.agg(F.count(F.lit(1)).alias("n_total"))  # 1 row
    top = (
        tk.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("tok"))
        .limit(_CMS_TOP)
        .withColumn("h", D.portable_hash60(F.col("tok")) % _MINHASH_P)
    )
    probes = top.select(
        "tok",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"), cms_bucket(F.col("h"), i).alias("bucket")
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("tok", "n_exact", "p.row_i", "p.bucket")
    est = (
        probes.join(F.broadcast(cells), ["row_i", "bucket"])
        .groupBy("tok", "n_exact")
        .agg(F.min("cnt").alias("n_est"))
    )
    return est.crossJoin(F.broadcast(total)).select(
        "tok",
        "n_exact",
        "n_est",
        (F.col("n_est") - F.col("n_exact")).alias("overcount"),
        (
            (F.col("n_est") - F.col("n_exact")) * CMS_W * 1000000
            <= F.lit(_CMS_E_MICRO) * F.col("n_total")
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Distribution-drift monitoring (PSI) over the event stream
# ---------------------------------------------------------------------------

_PSI_CUTOFF = "2024-01-16 00:00:00"
_PSI_BINS = 10


@register(
    "events_drift_psi",
    oracle=f"""
    WITH e AS (
      SELECT event_type, value, ts < TIMESTAMP '{_PSI_CUTOFF}' AS is_ref
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
    ),
    cuts AS (
      SELECT event_type,
             list_transform(
               quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
               c -> round(c, 6)) AS cuts
      FROM e WHERE is_ref GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type, is_ref,
             len(list_filter(cuts, c -> value > c)) AS b
      FROM e JOIN cuts ON cuts.event_type = e.event_type
    ),
    spine AS (
      SELECT event_type, i AS b FROM cuts, generate_series(0, {_PSI_BINS - 1}) t(i)
    ),
    counts AS (
      SELECT spine.event_type, spine.b,
             COALESCE(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END), 0) AS n_ref,
             COALESCE(SUM(CASE WHEN is_ref IS FALSE THEN 1 ELSE 0 END), 0) AS n_cur
      FROM spine
      LEFT JOIN binned ON binned.event_type = spine.event_type AND binned.b = spine.b
      GROUP BY spine.event_type, spine.b
    ),
    tot AS (
      SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts
      GROUP BY event_type
    )
    SELECT counts.event_type,
           CAST(tot.t_ref AS BIGINT) AS n_ref,
           CAST(tot.t_cur AS BIGINT) AS n_cur,
           ROUND(SUM(
             ((n_cur + 0.5) / (t_cur + {_PSI_BINS * 0.5})
              - (n_ref + 0.5) / (t_ref + {_PSI_BINS * 0.5}))
             * ln(((n_cur + 0.5) / (t_cur + {_PSI_BINS * 0.5}))
                  / ((n_ref + 0.5) / (t_ref + {_PSI_BINS * 0.5})))
           ), 6) AS psi
    FROM counts JOIN tot ON tot.event_type = counts.event_type
    GROUP BY counts.event_type, tot.t_ref, tot.t_cur
    """,
)
def events_drift_psi(spark, sf_dir):
    """Population-stability-index drift monitor — the standard production
    check that a feature's distribution has not shifted between a
    reference window and the current one (PSI < 0.1 stable, > 0.25
    actionable): per event type, decile bins are fit on the REFERENCE
    slice (exact percentiles, cut points rounded to 6 on both engines so
    binning is parity-stable), both slices are binned against those same
    cuts, and PSI is summed over Laplace-smoothed bin shares (smoothing
    makes empty bins finite — the spine join materializes them).

    Scale shape: the cut table is |event_types|×9 doubles — broadcast;
    binning is a map-only higher-order filter; the only corpus shuffle is
    the (type, bin, slice) count, which partial-aggregates."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    )
    e = e.select(
        "event_type", "value", (F.col("ts") < F.lit(_PSI_CUTOFF).cast("timestamp_ntz")).alias("is_ref")
    )
    qs = [i / 10 for i in range(1, 10)]
    cuts = (
        e.filter(F.col("is_ref"))
        .groupBy("event_type")
        .agg(
            F.transform(
                F.percentile("value", F.array(*[F.lit(q) for q in qs])),
                lambda c: F.round(c, 6),
            ).alias("cuts")
        )
    )
    binned = e.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "is_ref",
        F.size(F.filter(F.col("cuts"), lambda c: F.col("value") > c)).alias("b"),
    )
    spine = cuts.select(
        "event_type", F.explode(F.sequence(F.lit(0), F.lit(_PSI_BINS - 1))).alias("b")
    )
    counts = (
        spine.join(binned, ["event_type", "b"], "left")
        .groupBy("event_type", "b")
        .agg(
            F.coalesce(F.sum(F.when(F.col("is_ref"), 1).otherwise(0)), F.lit(0)).alias("n_ref"),
            # `is_ref == False` (not `otherwise(1)`): a spine bin with no
            # matched rows carries a NULL is_ref from the left join, and the
            # old otherwise-branch counted that phantom row into n_cur,
            # inflating every fully-empty bin's current count by 1.
            F.coalesce(
                F.sum(F.when(F.col("is_ref") == F.lit(False), 1).otherwise(0)), F.lit(0)
            ).alias("n_cur"),
        )
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    sm = _PSI_BINS * 0.5
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + sm)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + sm)
    return (
        counts.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "t_ref", "t_cur")
        .agg(F.round(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 6).alias("psi"))
        .select(
            "event_type",
            F.col("t_ref").cast("long").alias("n_ref"),
            F.col("t_cur").cast("long").alias("n_cur"),
            "psi",
        )
    )


# KS alpha=0.05 coefficient c(alpha)^2 = 1.358^2, scaled to micro-units so
# the drift boolean compares exact integers (no float at the boundary).
_KS_C2_MICRO = 1844164


@register(
    "events_drift_ks",
    oracle=f"""
    WITH e AS (
      SELECT event_type, value, ts < TIMESTAMP '{_PSI_CUTOFF}' AS is_ref
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
    ),
    g AS (
      SELECT event_type, value,
             CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS d_ref,
             CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS d_cur
      FROM e GROUP BY event_type, value
    ),
    c AS (
      SELECT event_type,
             SUM(d_ref) OVER w AS cum_ref,
             SUM(d_cur) OVER w AS cum_cur,
             CAST(SUM(d_ref) OVER (PARTITION BY event_type) AS BIGINT) AS t_ref,
             CAST(SUM(d_cur) OVER (PARTITION BY event_type) AS BIGINT) AS t_cur
      FROM g
      WINDOW w AS (PARTITION BY event_type ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    d AS (
      SELECT event_type, t_ref, t_cur,
             MAX(abs(cum_ref * t_cur - cum_cur * t_ref)) AS d_num
      FROM c WHERE t_ref > 0 AND t_cur > 0
      GROUP BY event_type, t_ref, t_cur
    )
    SELECT event_type, t_ref AS n_ref, t_cur AS n_cur,
           ROUND(CAST(d_num AS DOUBLE) / (t_ref * t_cur), 6) AS ks,
           CAST(d_num AS DOUBLE) * d_num * 1000000
             > {_KS_C2_MICRO}.0 * (t_ref + t_cur) * t_ref * t_cur AS drifted
    FROM d
    """,
)
def events_drift_ks(spark, sf_dir):
    """Exact two-sample Kolmogorov–Smirnov drift test per event type —
    the distribution-free companion to the binned PSI monitor
    (``events_drift_psi``): D = sup_x |F_ref(x) − F_cur(x)| evaluated at
    every distinct value, no binning approximation, plus the alpha=0.05
    rejection boolean D > 1.358·sqrt((n+m)/(nm)). The supremum is taken
    over the INTEGER numerators |cum_ref·t_cur − cum_cur·t_ref| (division
    deferred to the final row), and the rejection compare is cross-
    multiplied into integers too — both parity-exact by construction.
    Numerator magnitude is ~n·m: int64-safe to ~3e9 rows per type, at
    which point the distinct-VALUE grid (not row count) is the real
    bound — quantize values upstream past that.

    Scale shape: one (type, value) count aggregate collapses the event
    stream to its distinct-value grid before any ordering; the cumsum
    window then sorts only the grid, partitioned by type. Ties across
    slices are handled by stepping both CDFs at once — the textbook
    evaluation at jump points, exact."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    )
    g = (
        e.select(
            "event_type",
            "value",
            (F.col("ts") < F.lit(_PSI_CUTOFF).cast("timestamp_ntz")).alias("is_ref"),
        )
        .groupBy("event_type", "value")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("d_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("d_cur"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        F.sum("d_ref").over(wcum).alias("cum_ref"),
        F.sum("d_cur").over(wcum).alias("cum_cur"),
        F.sum("d_ref").over(wall).alias("t_ref"),
        F.sum("d_cur").over(wall).alias("t_cur"),
    )
    d = (
        c.filter((F.col("t_ref") > 0) & (F.col("t_cur") > 0))
        .groupBy("event_type", "t_ref", "t_cur")
        .agg(
            F.max(
                F.abs(F.col("cum_ref") * F.col("t_cur") - F.col("cum_cur") * F.col("t_ref"))
            ).alias("d_num")
        )
    )
    return d.select(
        "event_type",
        F.col("t_ref").alias("n_ref"),
        F.col("t_cur").alias("n_cur"),
        F.round(F.col("d_num").cast("double") / (F.col("t_ref") * F.col("t_cur")), 6).alias("ks"),
        (
            F.col("d_num").cast("double") * F.col("d_num") * 1000000
            > F.lit(float(_KS_C2_MICRO))
            * (F.col("t_ref") + F.col("t_cur"))
            * F.col("t_ref")
            * F.col("t_cur")
        ).alias("drifted"),
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (classifier evaluation)
# ---------------------------------------------------------------------------


@register(
    "langid_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT lang AS actual,
             CASE WHEN greatest({_SW_DE}, {_SW_EN}, {_SW_ES}, {_SW_FR}) <= 0
                    THEN 'und'
                  WHEN {_SW_DE} = greatest({_SW_DE}, {_SW_EN}, {_SW_ES}, {_SW_FR})
                    THEN 'de'
                  WHEN {_SW_EN} = greatest({_SW_DE}, {_SW_EN}, {_SW_ES}, {_SW_FR})
                    THEN 'en'
                  WHEN {_SW_ES} = greatest({_SW_DE}, {_SW_EN}, {_SW_ES}, {_SW_FR})
                    THEN 'es'
                  ELSE 'fr' END AS predicted
      FROM documents WHERE text IS NOT NULL
    )
    SELECT actual, predicted,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY actual), 6)
             AS share_of_actual
    FROM scored GROUP BY actual, predicted
    """,
)
def langid_confusion(spark, sf_dir):
    """Confusion matrix for the stopword-profile language classifier
    against the labeled `lang` column — the evaluation loop for the
    heuristic `text_langid` exposes per-row: each (actual, predicted)
    cell with its count and its share within the actual language (row-
    normalized recall; the diagonal is per-language accuracy). One
    combinable aggregate + one tiny window over ≤ |langs|² rows."""
    from pyspark.sql import Window

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    scored = d.select(
        F.col("lang").alias("actual"),
        T.predicted_lang(F.col("text")).alias("predicted"),
    )
    cells = scored.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("actual")
    return cells.select(
        "actual",
        "predicted",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share_of_actual"),
    )


# ---------------------------------------------------------------------------
# MinHash S-curve: measured LSH detection rate vs theory, per Jaccard bin
# ---------------------------------------------------------------------------

_SC_HASHES = 16
_SC_BANDS = 4
_SC_ROWS = _SC_HASHES // _SC_BANDS


def _scurve_oracle() -> str:
    from ..operators.dedup import _minhash_sql_prefix

    return f"""
    WITH {_minhash_sql_prefix(_SC_HASHES, _SC_BANDS)},
    sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM sets),
    sz AS (SELECT doc_id, len(shingles) AS n FROM sets),
    ov AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS nc
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    ex AS (
      SELECT doc_a, doc_b, ROUND(nc / (sa.n + sb.n - nc), 6) AS j
      FROM ov JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
      WHERE ROUND(nc / (sa.n + sb.n - nc), 6) >= 0.05
    ),
    tagged AS (
      SELECT ex.doc_a, ex.doc_b, ex.j,
             CASE WHEN cands.doc_a IS NOT NULL THEN 1 ELSE 0 END AS det
      FROM ex LEFT JOIN cands
        ON cands.doc_a = ex.doc_a AND cands.doc_b = ex.doc_b
    ),
    binned AS (
      SELECT LEAST(CAST(floor(j * 10 + 1e-9) AS INT), 9) AS b, det FROM tagged
    )
    SELECT b / 10.0 AS j_lo,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(det) AS BIGINT) AS n_detected,
           ROUND(SUM(det) / COUNT(*), 6) AS measured_recall,
           ROUND(1 - power(1 - power(b / 10.0 + 0.05, {_SC_ROWS}), {_SC_BANDS}), 6)
             AS theoretical_recall
    FROM binned GROUP BY b
    """


@register("minhash_scurve_report", oracle=_scurve_oracle())
def minhash_scurve_report(spark, sf_dir):
    """LSH S-curve validation — the tuning artifact you consult before
    committing num_hashes/bands for a 100 TB dedup pass: ground-truth
    near-dup pairs (exact shingle Jaccard ≥ 0.05, shingle-blocked — no
    sketch involved) are bucketed by Jaccard decile, and each bucket
    reports the MEASURED fraction the banded candidates surfaced next to
    the THEORETICAL detection probability 1−(1−j^r)^b at the bucket
    midpoint. Divergence between the two columns means the sketch's
    independence assumptions don't hold on this corpus (e.g. skewed
    shingle frequencies) and the band split needs revisiting.

    Scale shape: rides the same shingle-blocked exact-pair join and
    banded candidate join the dedup operators already pay; the report
    itself aggregates over candidate pairs only."""
    d = load_table(spark, sf_dir, "documents")
    # ONE shingle-hash pass feeds both sides: the checkpointed portable
    # signature frame supplies the banded candidates AND (via its hv
    # arrays) the ground-truth all-pairs Jaccard — measured 8.2s -> ~4s
    # at sf0.1 vs recomputing shingles separately per side. Exact pairs
    # intersect the 60-bit hashes, the oracle intersects strings: equal
    # modulo the documented ~2^-60 collision trade shared with
    # minhash_near_dups_portable.
    sigs = D._portable_sig_frame(d, num_hashes=_SC_HASHES)
    cands = D._portable_candidates(sigs, _SC_HASHES, _SC_BANDS).withColumn(
        "det", F.lit(1)
    )
    # Per-doc set size rides the explode (hv is already the distinct set),
    # so the two size join-backs disappear: the pair groupBy recovers
    # na/nb with max() for free (r9-opt, same shape as ngram_jaccard_pairs).
    sh = sigs.select("doc_id", F.size("hv").alias("n"), F.explode("hv").alias("h"))
    ov = (
        sh.join(
            sh.select(
                F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "h"
            ),
            "h",
        )
        .filter(F.col("doc_id") < F.col("doc_b"))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(
            F.count(F.lit(1)).alias("nc"),
            F.max("n").alias("na"),
            F.max("nb").alias("nb"),
        )
    )
    exact = ov.select(
        "doc_a",
        "doc_b",
        F.round(F.col("nc") / (F.col("na") + F.col("nb") - F.col("nc")), 6).alias(
            "jaccard"
        ),
    ).filter(F.col("jaccard") >= 0.05)
    tagged = exact.join(cands, ["doc_a", "doc_b"], "left").select(
        F.col("jaccard").alias("j"), F.coalesce(F.col("det"), F.lit(0)).alias("det")
    )
    b = F.least(F.floor(F.col("j") * 10 + 1e-9).cast("int"), F.lit(9))
    mid = F.col("b") / 10.0 + 0.05
    return (
        tagged.select(b.alias("b"), "det")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("det").cast("long").alias("n_detected"),
            F.round(F.sum("det") / F.count(F.lit(1)), 6).alias("measured_recall"),
        )
        .select(
            (F.col("b") / 10.0).alias("j_lo"),
            "n_pairs",
            "n_detected",
            "measured_recall",
            F.round(
                1 - F.pow(1 - F.pow(mid, F.lit(_SC_ROWS)), F.lit(_SC_BANDS)), 6
            ).alias("theoretical_recall"),
        )
    )


# ---------------------------------------------------------------------------
# Curation decision ledger: WHY each document was kept or dropped
# ---------------------------------------------------------------------------

_LEDGER_QUOTA = 15  # survivors kept per source


def _ledger_oracle() -> str:
    return f"""
    WITH gated AS (
      SELECT doc_id, source, text, n_chars,
             {quarantine_reasons_sql()} AS gate_reasons
      FROM documents WHERE doc_id IS NOT NULL
    ),
    staged AS (
      SELECT doc_id, source, n_chars, gate_reasons,
             len(gate_reasons) > 0 AS gate_failed,
             CASE WHEN len(gate_reasons) = 0 THEN
               doc_id <> MIN(doc_id) OVER (
                 PARTITION BY CASE WHEN len(gate_reasons) = 0
                                   THEN md5(text)
                                   ELSE 'F' || CAST(doc_id AS VARCHAR) END)
             ELSE FALSE END AS is_dup
      FROM gated
    ),
    ranked AS (
      SELECT *,
             CASE WHEN NOT gate_failed AND NOT is_dup THEN
               ROW_NUMBER() OVER (
                 PARTITION BY source, gate_failed, is_dup
                 ORDER BY n_chars DESC NULLS LAST, doc_id)
             END AS rk
      FROM staged
    )
    SELECT doc_id, source,
           CASE WHEN gate_failed THEN 'gate'
                WHEN is_dup THEN 'duplicate'
                WHEN rk > {_LEDGER_QUOTA} THEN 'quota'
           END AS dropped_at,
           (NOT gate_failed AND NOT is_dup AND rk <= {_LEDGER_QUOTA}) AS kept,
           COALESCE(array_to_string(list_sort(gate_reasons), '|'), '') AS gate_reasons
    FROM ranked
    """


@register("curation_decision_ledger", oracle=_ledger_oracle())
def curation_decision_ledger(spark, sf_dir):
    """Explainable curation — the audit ledger a production corpus
    pipeline owes its users: every document gets its fate (kept, or the
    FIRST stage that dropped it: quality gate → exact dedup → per-source
    quota) plus the gate's machine-readable reason codes. Drop decisions
    are otherwise silent row-filters; materializing them makes curation
    rates monitorable per source and individual drops contestable.

    Stage semantics: dedup runs among gate-passers (canonical = min
    doc_id per md5(text)); the per-source quota (top {quota} by n_chars
    desc, doc_id tiebreak) ranks only gate+dedup survivors. Scale shape:
    one scan + two keyed windows (digest, source) — the same exchanges
    the standalone dedup/quota operators pay, fused into one plan."""
    from pyspark.sql import Window

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    )
    gated = d.select(
        "doc_id",
        "source",
        "text",
        "n_chars",
        quarantine_reasons(F.col("text"), F.col("n_chars")).alias("gate_reasons"),
    )
    gate_failed = F.size("gate_reasons") > 0
    # Gate-failures get a singleton partition key ('F'+doc_id, unique) instead
    # of a shared NULL key: their windowed MIN is unused (guarded below), and a
    # single partition holding every failed doc would be one straggler reducer
    # at scale. Mirrors the oracle's CASE partition.
    dig = F.when(~gate_failed, F.md5("text")).otherwise(
        F.concat(F.lit("F"), F.col("doc_id").cast("string"))
    )
    staged = gated.select(
        "doc_id",
        "source",
        "gate_reasons",
        gate_failed.alias("gate_failed"),
        F.when(
            ~gate_failed,
            F.col("doc_id") != F.min("doc_id").over(Window.partitionBy(dig)),
        )
        .otherwise(F.lit(False))
        .alias("is_dup"),
        "n_chars",
    )
    survivor = ~F.col("gate_failed") & ~F.col("is_dup")
    # The rank is only ever COMPARED to the static quota, so rank the
    # survivor frame alone with a rank <= quota prefilter — that compiles
    # to a map-side WindowGroupLimit (each input partition ships at most
    # `quota` rows per source into the window shuffle) instead of one
    # reducer fully sorting every survivor of a mega-source — and join the
    # within-quota ids back on the unique doc_id (a balanced shuffle; the
    # digest-window exchange feeding both branches is reused, not re-run).
    wq = Window.partitionBy("source").orderBy(
        F.desc_nulls_last("n_chars"), F.asc("doc_id")
    )
    in_quota = (
        staged.filter(survivor)
        .select("doc_id", F.row_number().over(wq).alias("rk"))
        .filter(F.col("rk") <= _LEDGER_QUOTA)
    )
    return staged.join(in_quota, "doc_id", "left").select(
        "doc_id",
        "source",
        F.when(F.col("gate_failed"), F.lit("gate"))
        .when(F.col("is_dup"), F.lit("duplicate"))
        .when(F.col("rk").isNull(), F.lit("quota"))
        .alias("dropped_at"),
        (survivor & F.col("rk").isNotNull()).alias("kept"),
        # Scalar-only output contract: '|'-joined sorted reason codes, not
        # an array (the driver's canonicalizer cannot hash array cells).
        F.array_join(F.array_sort("gate_reasons"), "|").alias("gate_reasons"),
    )


# ---------------------------------------------------------------------------
# Shuffle-key skew diagnosis
# ---------------------------------------------------------------------------

_SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
    ("documents", "source"),
)


def _skew_oracle() -> str:
    legs = "\n      UNION ALL ".join(
        f"SELECT '{t}.{c}' AS key_col, CAST({c} AS VARCHAR) AS k "
        f"FROM {t} WHERE {c} IS NOT NULL"
        for t, c in _SKEW_KEYS
    )
    return f"""
    WITH k AS (
      {legs}
    ),
    c AS (SELECT key_col, k, COUNT(*) AS n FROM k GROUP BY key_col, k),
    agg AS (
      SELECT key_col, SUM(n) AS n_rows, COUNT(*) AS n_distinct, MAX(n) AS top1
      FROM c GROUP BY key_col
    )
    SELECT key_col,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(top1 AS BIGINT) AS top1_count,
           ROUND(top1 / n_rows, 6) AS top1_share,
           ROUND(top1 * n_distinct / n_rows, 6) AS skew_factor
    FROM agg
    """


@register("table_skew_report", oracle=_skew_oracle())
def table_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnosis — the measurement that decides WHEN the
    engine's skew machinery (operators/skew.py salting, AQE skew-join
    splits) is worth its overhead: for each join/aggregation key the
    standing queries shuffle on, the hottest key's share of rows and its
    skew factor (top-key count ÷ mean per-key count). skew_factor ≈ 1 ⇒
    uniform, safe; ≫ 1 ⇒ the hottest reducer partition is that many
    times the average and salting/AQE pays for itself. Per key this is
    one combinable (key → count) aggregate plus a 1-row rollup — the
    cheapest possible probe of a question usually answered by watching a
    straggler task time out."""
    frames = []
    for t, c in _SKEW_KEYS:
        frames.append(
            load_table(spark, sf_dir, t)
            .filter(F.col(c).isNotNull())
            .select(
                F.lit(f"{t}.{c}").alias("key_col"),
                # Count by the key's xxhash64, not the key string: the
                # report only needs key IDENTITY (counts per distinct key),
                # so the count exchange carries (key_col, long) instead of
                # (key_col, string) — guide §2.3 narrower shuffle bytes;
                # identical output modulo the family's documented ~2⁻⁶⁴
                # collision trade (r9-opt: 1.18 → 1.03 s interleaved).
                F.xxhash64(F.col(c).cast("string")).alias("k"),
            )
        )
    k = frames[0]
    for f_ in frames[1:]:
        k = k.unionByName(f_)
    cnt = k.groupBy("key_col", "k").agg(F.count(F.lit(1)).alias("n"))
    agg = cnt.groupBy("key_col").agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("top1"),
    )
    return agg.select(
        "key_col",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("top1").cast("long").alias("top1_count"),
        F.round(F.col("top1") / F.col("n_rows"), 6).alias("top1_share"),
        F.round(F.col("top1") * F.col("n_distinct") / F.col("n_rows"), 6).alias(
            "skew_factor"
        ),
    )


# ---------------------------------------------------------------------------
# Entity resolution: fuzzy blocking -> verify -> connected components
# ---------------------------------------------------------------------------


@register(
    "customer_entity_resolution",
    oracle="""
    WITH RECURSIVE c AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey IS NOT NULL
    ),
    p AS (
      SELECT a.c_custkey AS ka, b.c_custkey AS kb
      FROM c a JOIN c b
        ON a.c_custkey < b.c_custkey
       AND levenshtein(a.c_name, b.c_name) <= 1
    ),
    edges AS (SELECT ka AS s, kb AS d FROM p UNION ALL SELECT kb, ka FROM p),
    walk(id, comp) AS (
      SELECT c_custkey, c_custkey FROM c
      UNION
      SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.id
    ),
    comp AS (SELECT id AS c_custkey, MIN(comp) AS entity_id FROM walk GROUP BY id)
    SELECT c_custkey, entity_id,
           (entity_id = c_custkey) AS is_canonical,
           CAST(COUNT(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_members
    FROM comp
    """,
)
def customer_entity_resolution(spark, sf_dir):
    """End-to-end entity resolution — the composite every master-data /
    training-metadata pipeline runs: SymSpell deletion-neighborhood
    blocking generates candidate name pairs (sub-quadratic; equality with
    the brute-force edit-distance-1 scan is exactly what the
    ``fuzzy_name_pairs`` oracle proves), levenshtein verifies candidates
    only, and distributed connected components (large-star/small-star)
    fuses transitive matches into entities with a deterministic canonical
    (min key). One row per customer: its entity, whether it is the
    canonical record, and the entity's size. The oracle recomputes the
    same closure sequentially (brute-force pairs + recursive CTE), so the
    whole composite — blocking, verification, clustering — is checked
    end-to-end, not per stage."""
    from pyspark.sql import Window

    from ..operators.graph import connected_components
    from .llm import fuzzy_name_pairs

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey").isNotNull())
    pairs = fuzzy_name_pairs(spark, sf_dir).select("key_a", "key_b")
    cc = connected_components(
        pairs, "key_a", "key_b", nodes=c.select("c_custkey")
    )
    w = Window.partitionBy("entity_id")
    return (
        cc.select(
            F.col("id").alias("c_custkey"),
            F.col("component").alias("entity_id"),
            (F.col("id") == F.col("component")).alias("is_canonical"),
        )
        .withColumn("n_members", F.count(F.lit(1)).over(w).cast("long"))
    )


@register(
    "linkage_fellegi_sunter",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey IS NOT NULL
    ),
    p AS (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
             levenshtein(a.c_name, b.c_name) AS d,
             a.c_nationkey = b.c_nationkey AS nat_eq,
             a.c_mktsegment = b.c_mktsegment AS seg_eq,
             abs(a.c_acctbal - b.c_acctbal) <= 100.0 AS bal_close
      FROM c a JOIN c b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ),
    s AS (
      SELECT key_a, key_b,
             CAST((CASE WHEN d = 0 THEN 10228819 ELSE 7451211 END)
                + (CASE WHEN nat_eq THEN 4569856 ELSE -4263034 END)
                + (CASE WHEN seg_eq THEN 2169925 ELSE -3000000 END)
                + (CASE WHEN bal_close THEN 5321928 ELSE -2292782 END)
               AS BIGINT) AS score_micro
      FROM p
    )
    SELECT key_a, key_b, score_micro,
           CASE WHEN score_micro >= 18000000 THEN 'match'
                WHEN score_micro >= 8000000 THEN 'possible'
                ELSE 'non_match' END AS decision
    FROM s
    """,
)
def linkage_fellegi_sunter(spark, sf_dir):
    """Probabilistic record linkage scoring (Fellegi & Sunter, JASA 1969
    — the decision layer every serious entity-resolution system runs on
    top of blocking): each candidate pair is scored by the sum of per-
    field log2(m/u) agreement weights (m = P(agree | match), u =
    P(agree | non-match)) and classified match / possible / non_match by
    the two-threshold rule. Fields here: name edit distance (exact vs
    close — the SymSpell d=1 blocking guarantees lev <= 1, so the name
    field contributes a level weight, never a disagreement), nation
    equality (m=.95/u=.04 → +4.57/-4.26 bits), market segment
    (m=.9/u=.2 → +2.17/-3.00), and account-balance proximity within 100
    (m=.8/u=.02 → +5.32/-2.29). Weights are FIXED integer micro-bits on
    both engines, so the driver hash-checks the exact scores and
    decisions — the complement of ``customer_entity_resolution``'s
    transitive fusion (that answers "which records merge"; this answers
    "how sure are we, field by field").

    Scale shape: the pair stream comes from the sub-quadratic SymSpell
    deletion-neighborhood blocking (never all-pairs); scoring is one
    broadcast-joined projection per side + pure-codegen arithmetic."""
    from .llm import fuzzy_name_pairs

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey").isNotNull()
    )
    pairs = fuzzy_name_pairs(spark, sf_dir).select("key_a", "key_b", "dist")
    a = c.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_nationkey").alias("nat_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("c_acctbal").alias("bal_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("c_acctbal").alias("bal_b"),
    )
    j = pairs.join(a, "key_a").join(b, "key_b")
    score = (
        F.when(F.col("dist") == 0, F.lit(10228819)).otherwise(F.lit(7451211))
        + F.when(F.col("nat_a") == F.col("nat_b"), F.lit(4569856)).otherwise(
            F.lit(-4263034)
        )
        + F.when(F.col("seg_a") == F.col("seg_b"), F.lit(2169925)).otherwise(
            F.lit(-3000000)
        )
        + F.when(
            F.abs(F.col("bal_a") - F.col("bal_b")) <= 100.0, F.lit(5321928)
        ).otherwise(F.lit(-2292782))
    ).cast("long")
    return j.select(
        "key_a",
        "key_b",
        score.alias("score_micro"),
        F.when(score >= 18000000, F.lit("match"))
        .when(score >= 8000000, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("decision"),
    )


@register(
    "customer_entity_resolution_d2",
    oracle="""
    WITH RECURSIVE c AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey IS NOT NULL
    ),
    p AS (
      SELECT a.c_custkey AS ka, b.c_custkey AS kb
      FROM c a JOIN c b
        ON a.c_custkey < b.c_custkey
       AND levenshtein(a.c_name, b.c_name) <= 2
    ),
    edges AS (SELECT ka AS s, kb AS d FROM p UNION ALL SELECT kb, ka FROM p),
    walk(id, comp) AS (
      SELECT c_custkey, c_custkey FROM c
      UNION
      SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.id
    ),
    comp AS (SELECT id AS c_custkey, MIN(comp) AS entity_id FROM walk GROUP BY id)
    SELECT c_custkey, entity_id,
           (entity_id = c_custkey) AS is_canonical,
           CAST(COUNT(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_members
    FROM comp
    """,
)
def customer_entity_resolution_d2(spark, sf_dir):
    """Entity resolution at edit distance <= 2 — the same composite as
    ``customer_entity_resolution`` (SymSpell blocking → levenshtein verify
    → distributed connected components) with the wider d=2 deletion
    neighborhood (``fuzzy_name_pairs_d2``): two stacked typos now fuse,
    so entities are coarser and transitive chains longer — exactly the
    regime where the CC stage earns its keep. End-to-end checked against
    the brute-force + recursive-CTE oracle."""
    from pyspark.sql import Window

    from ..operators.graph import connected_components
    from .llm import fuzzy_name_pairs_d2

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey").isNotNull())
    pairs = fuzzy_name_pairs_d2(spark, sf_dir).select("key_a", "key_b")
    cc = connected_components(pairs, "key_a", "key_b", nodes=c.select("c_custkey"))
    w = Window.partitionBy("entity_id")
    return (
        cc.select(
            F.col("id").alias("c_custkey"),
            F.col("component").alias("entity_id"),
            (F.col("id") == F.col("component")).alias("is_canonical"),
        )
        .withColumn("n_members", F.count(F.lit(1)).over(w).cast("long"))
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, appendix A1.1)
# ---------------------------------------------------------------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_oracle() -> str:
    stops = ", ".join(f"'{s}'" for s in _GOPHER_STOPS)
    return rf"""
    WITH stats AS (
      SELECT doc_id,
             len(list_filter({_TOKS}, w -> length(w) > 0)) AS n_words,
             COALESCE(list_sum(list_transform(
               list_filter({_TOKS}, w -> length(w) > 0),
               w -> length(w))), 0) AS sum_wlen,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell,
             len(list_filter(string_split(text, chr(10)),
                 l -> length(trim(l)) > 0)) AS n_lines,
             len(list_filter(string_split(text, chr(10)),
                 l -> length(trim(l)) > 0 AND (starts_with(trim(l), '-')
                      OR starts_with(trim(l), '*')))) AS n_bullet,
             len(list_filter(string_split(text, chr(10)),
                 l -> length(trim(l)) > 0 AND ends_with(trim(l), '...'))) AS n_ellend,
             len(list_filter({_TOKS},
                 w -> length(w) > 0 AND regexp_matches(w, '[a-z]'))) AS n_alpha,
             len(list_filter([{stops}],
                 s -> list_contains({_TOKS}, s))) AS n_stop
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
           (n_words > 0 AND round(sum_wlen / CAST(n_words AS DOUBLE), 6)
              BETWEEN 3 AND 10) AS pass_mean_word_len,
           (n_words > 0 AND round((n_hash + n_ell) / CAST(n_words AS DOUBLE), 6)
              <= 0.1) AS pass_symbol_ratio,
           (n_lines = 0 OR round(n_bullet / CAST(n_lines AS DOUBLE), 6)
              <= 0.9) AS pass_bullet_lines,
           (n_lines = 0 OR round(n_ellend / CAST(n_lines AS DOUBLE), 6)
              <= 0.3) AS pass_ellipsis_lines,
           (n_words > 0 AND round(n_alpha / CAST(n_words AS DOUBLE), 6)
              >= 0.8) AS pass_alpha_words,
           (n_stop >= 2) AS pass_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
            AND (n_words > 0 AND round(sum_wlen / CAST(n_words AS DOUBLE), 6)
                   BETWEEN 3 AND 10)
            AND (n_words > 0 AND round((n_hash + n_ell) / CAST(n_words AS DOUBLE), 6)
                   <= 0.1)
            AND (n_lines = 0 OR round(n_bullet / CAST(n_lines AS DOUBLE), 6) <= 0.9)
            AND (n_lines = 0 OR round(n_ellend / CAST(n_lines AS DOUBLE), 6) <= 0.3)
            AND (n_words > 0 AND round(n_alpha / CAST(n_words AS DOUBLE), 6) >= 0.8)
            AND (n_stop >= 2)) AS pass_all
    FROM stats
    """


@register("quality_gopher_rules", oracle=_gopher_oracle())
def quality_gopher_rules(spark, sf_dir):
    """Gopher quality rules (Rae et al. 2021, appendix A1.1): the widely
    reused heuristic bundle for web-text filtering, each rule a separate
    auditable boolean — word count in [50, 100k], mean word length in
    [3, 10], '#'/'...'-to-word ratio <= 0.1, bullet-started lines <= 90%,
    ellipsis-ended lines <= 30%, >= 80% of words containing a letter, and
    >= 2 of the 8 canonical English stop words present. Complements the
    engine's own gate (``quality_quarantine``): these are the published
    thresholds pipelines cite, so drops are defensible by reference.

    Scale shape: map-only — one scan, all Column expressions (split /
    higher-order filters / length arithmetic), no shuffle, no UDFs;
    ratio comparisons are made on ROUND(x, 6) so an ULP difference
    between engines cannot flip a boundary rule."""
    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id").isNotNull() & F.col("text").isNotNull()
        )
    )
    t = F.col("text")
    words = F.filter(
        F.split(F.trim(F.lower(t)), r"\s+"), lambda w: F.length(w) > 0
    )
    lines = F.filter(F.split(t, "\n"), lambda l: F.length(F.trim(l)) > 0)
    stats = d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.coalesce(
            F.aggregate(words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)),
            F.lit(0).cast("long"),
        ).alias("sum_wlen"),
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).alias("n_hash"),
        F.floor(
            (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        ).alias("n_ell"),
        F.size(lines).alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda l: F.startswith(F.trim(l), F.lit("-"))
                | F.startswith(F.trim(l), F.lit("*")),
            )
        ).alias("n_bullet"),
        F.size(
            F.filter(lines, lambda l: F.endswith(F.trim(l), F.lit("...")))
        ).alias("n_ellend"),
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).alias("n_alpha"),
        F.size(
            F.array_intersect(
                F.array_distinct(words),
                F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
            )
        ).alias("n_stop"),
    )
    nw = F.col("n_words")
    nl = F.col("n_lines")
    # try_divide, not `/`: the boolean guards (`&`, `|`) do NOT
    # short-circuit expression evaluation, so on an empty document a plain
    # division raises ANSI DIVIDE_BY_ZERO even though the guard is false.
    # try_divide yields NULL there, and false & NULL = false / true | NULL
    # = true — exactly the guarded semantics.
    pass_word_count = (nw >= 50) & (nw <= 100000)
    pass_mean_wl = (nw > 0) & F.round(
        F.try_divide(F.col("sum_wlen"), nw.cast("double")), 6
    ).between(3, 10)
    pass_symbol = (nw > 0) & (
        F.round(
            F.try_divide(F.col("n_hash") + F.col("n_ell"), nw.cast("double")), 6
        )
        <= 0.1
    )
    pass_bullet = (nl == 0) | (
        F.round(F.try_divide(F.col("n_bullet"), nl.cast("double")), 6) <= 0.9
    )
    pass_ellipsis = (nl == 0) | (
        F.round(F.try_divide(F.col("n_ellend"), nl.cast("double")), 6) <= 0.3
    )
    pass_alpha = (nw > 0) & (
        F.round(F.try_divide(F.col("n_alpha"), nw.cast("double")), 6) >= 0.8
    )
    pass_stop = F.col("n_stop") >= 2
    return stats.select(
        "doc_id",
        "n_words",
        pass_word_count.alias("pass_word_count"),
        pass_mean_wl.alias("pass_mean_word_len"),
        pass_symbol.alias("pass_symbol_ratio"),
        pass_bullet.alias("pass_bullet_lines"),
        pass_ellipsis.alias("pass_ellipsis_lines"),
        pass_alpha.alias("pass_alpha_words"),
        pass_stop.alias("pass_stopwords"),
        (
            pass_word_count
            & pass_mean_wl
            & pass_symbol
            & pass_bullet
            & pass_ellipsis
            & pass_alpha
            & pass_stop
        ).alias("pass_all"),
    )


# ---------------------------------------------------------------------------
# C4 quality rules (Raffel et al. 2020, section 2.2)
# ---------------------------------------------------------------------------

_C4_POLICY = ("terms of use", "privacy policy", "cookie policy", "uses cookies")


def _c4_oracle() -> str:
    policy = " OR ".join(f"contains(lower(l), '{p}')" for p in _C4_POLICY)
    keep = (
        "l -> (ends_with(trim(l), '.') OR ends_with(trim(l), '!')"
        " OR ends_with(trim(l), '?') OR ends_with(trim(l), '\"'))"
        r" AND len(list_filter(string_split_regex(trim(l), '\s+'),"
        " w -> length(w) > 0)) >= 5"
        " AND NOT contains(lower(l), 'javascript')"
        f" AND NOT ({policy})"
    )
    return rf"""
    WITH lines AS (
      SELECT doc_id, text,
             list_filter(string_split(text, chr(10)),
                         l -> length(trim(l)) > 0) AS ls
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    stats AS (
      SELECT doc_id,
             len(ls) AS n_lines,
             len(list_filter(ls, {keep})) AS n_kept_lines,
             length(text)
               - length(replace(replace(replace(text, '.', ''), '!', ''), '?', ''))
               AS n_sentences,
             contains(lower(text), 'lorem ipsum') AS has_lorem,
             contains(text, '{{') AS has_brace
      FROM lines
    )
    SELECT doc_id,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_kept_lines AS BIGINT) AS n_kept_lines,
           CASE WHEN n_lines = 0 THEN CAST(0 AS DOUBLE)
                ELSE floor(1e6 * (n_kept_lines / CAST(n_lines AS DOUBLE)) + 0.5) / 1e6
           END AS kept_line_ratio,
           (n_sentences >= 3) AS pass_min_sentences,
           NOT has_lorem AS pass_no_lorem,
           NOT has_brace AS pass_no_braces,
           (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
            AND n_kept_lines >= 1) AS pass_all
    FROM stats
    """


@register("quality_c4_rules", oracle=_c4_oracle())
def quality_c4_rules(spark, sf_dir):
    """C4 cleaning heuristics (Raffel et al. 2020, section 2.2) as
    auditable per-document booleans, complementing the Gopher bundle
    (``quality_gopher_rules``): line-level retention — a line survives if
    it ends in terminal punctuation ('.', '!', '?', '\"'), has >= 5
    words, and contains neither 'javascript' nor a cookie/policy
    boilerplate phrase — plus page-level drops for < 3 sentences, 'lorem
    ipsum', and '{' (code). The paper's three-sentence-span dedup is the
    separate ``dedup_paragraphs`` / ``text_dedup_sentences_within_doc``
    family; its bad-words list is licensing-encumbered so it is not
    reproduced here.

    Scale shape: map-only — one scan, all higher-order Column
    expressions over the split lines, no shuffle, no UDFs; the ratio is
    rounded half-up at 6 so an engine ULP can't flip a cell."""
    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id").isNotNull() & F.col("text").isNotNull()
        )
    )
    t = F.col("text")
    lines = F.filter(F.split(t, "\n"), lambda l: F.length(F.trim(l)) > 0)

    def line_kept(l):
        tl = F.trim(l)
        low = F.lower(l)
        terminal = (
            F.endswith(tl, F.lit("."))
            | F.endswith(tl, F.lit("!"))
            | F.endswith(tl, F.lit("?"))
            | F.endswith(tl, F.lit('"'))
        )
        words = F.filter(F.split(tl, r"\s+"), lambda w: F.length(w) > 0)
        policy = F.lit(False)
        for p in _C4_POLICY:
            policy = policy | F.contains(low, F.lit(p))
        return (
            terminal
            & (F.size(words) >= 5)
            & ~F.contains(low, F.lit("javascript"))
            & ~policy
        )

    stats = d.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.filter(lines, line_kept)).cast("long").alias("n_kept_lines"),
        (
            F.length(t)
            - F.length(
                F.replace(
                    F.replace(F.replace(t, F.lit("."), F.lit("")), F.lit("!"), F.lit("")),
                    F.lit("?"),
                    F.lit(""),
                )
            )
        ).alias("n_sentences"),
        F.contains(F.lower(t), F.lit("lorem ipsum")).alias("has_lorem"),
        F.contains(t, F.lit("{")).alias("has_brace"),
    )
    nl = F.col("n_lines")
    nk = F.col("n_kept_lines")
    ns = F.col("n_sentences")
    pass_sent = ns >= 3
    pass_lorem = ~F.col("has_lorem")
    pass_brace = ~F.col("has_brace")
    return stats.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        F.when(nl == 0, F.lit(0.0))
        .otherwise(F.floor(1e6 * (nk / nl.cast("double")) + F.lit(0.5)) / 1e6)
        .alias("kept_line_ratio"),
        pass_sent.alias("pass_min_sentences"),
        pass_lorem.alias("pass_no_lorem"),
        pass_brace.alias("pass_no_braces"),
        (pass_sent & pass_lorem & pass_brace & (nk >= 1)).alias("pass_all"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count report (Flajolet et al. 2007)
# ---------------------------------------------------------------------------

_HLL_SH_CTE = r"""sh AS (
      SELECT unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> array_to_string(t[i:i+2], ' ')))) AS shingle
      FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS t
            FROM documents WHERE text IS NOT NULL)
    )"""


def _hll_oracle() -> str:
    from ..operators.sketches import hll_sql

    return f"""
    WITH {_HLL_SH_CTE},
    {hll_sql('shingle', 'FROM sh')},
    ex AS (SELECT CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_exact FROM sh)
    SELECT r.register, r.rho, ex.n_exact, e.est_micro,
           abs(e.est_micro - 1000000 * ex.n_exact) <= 195000 * ex.n_exact
             AS within_3sigma
    FROM hll_regs r CROSS JOIN ex CROSS JOIN hll_est e
    """


@register("sketch_hll_report", oracle=_hll_oracle())
def sketch_hll_report(spark, sf_dir):
    """HyperLogLog distinct-count report (Flajolet, Fusy, Gandouet &
    Meunier 2007): build the m = 256 register file over the corpus's
    3-token shingle stream, output every register's rank next to the
    sketch estimate (exact micro-units) and the true distinct count, plus
    the 3-sigma accuracy invariant |est - n| <= 3 * 1.04/sqrt(m) * n in
    pure integer arithmetic. Hashing is the engine-portable md5-derived
    60-bit hash, so the DuckDB oracle rebuilds the IDENTICAL register
    file: the driver attests the sketch construction itself (all 256
    register values), not just the final estimate.

    Why HLL earns a slot next to approx_count_distinct (Spark's built-in
    HLL++): the built-in's register file is opaque and
    version-dependent; this one is a portable relational register file a
    100 TB pipeline can persist, ship across engines, and merge with
    elementwise MAX across shards/days/streams — the distinct-counting
    analogue of the Count-Min cells. Scale shape: groupBy(register)
    partial-aggregates map-side (<= m rows leave any task); the exact
    side exists only because this is an accuracy report; the register
    file, estimate, and exact count all broadcast into the 256-row
    output."""
    from ..operators import sketches as K

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # The shingle stream feeds the register build AND the exact-count
    # leg; without materialization each branch re-runs the scan + explode
    # + md5 chain (the hash dominates — measured 31.8 s -> ~17 s at sf5).
    # Same trade as ngram_jaccard_pairs: the intermediate is O(corpus
    # tokens), spillable, and far cheaper than recomputing the explode.
    sh = D.shingles_df(d).localCheckpoint(eager=True)
    regs = K.hll_registers(sh, "shingle").localCheckpoint(eager=True)
    est = K.hll_estimate_micro(regs)
    exact = sh.agg(F.count_distinct("shingle").cast("long").alias("n_exact"))
    return (
        regs.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(exact))
        .select(
            "register",
            "rho",
            "n_exact",
            "est_micro",
            (
                F.abs(F.col("est_micro") - F.lit(1000000) * F.col("n_exact"))
                <= F.lit(195000) * F.col("n_exact")
            ).alias("within_3sigma"),
        )
    )


# ---------------------------------------------------------------------------
# KMV sketch set-operation report (Bar-Yossef et al. 2002; Beyer et al. 2007)
# ---------------------------------------------------------------------------


def _kmv_oracle() -> str:
    from ..operators.dedup import portable_hash60_sql
    from ..operators.sketches import KMV_3SIG_MICRO, KMV_EST_NUM, KMV_K

    h60 = portable_hash60_sql("shingle")
    return rf"""
    WITH t AS (
      SELECT CAST(substr(source, 4) AS INT) % 2 AS side,
             string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    sh AS (
      SELECT DISTINCT side, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> array_to_string(t[i:i+2], ' ')))) AS shingle
      FROM t
    ),
    hs AS (SELECT DISTINCT side, ({h60}) AS h FROM sh),
    ska AS (SELECT h FROM hs WHERE side = 0 ORDER BY h LIMIT {KMV_K}),
    skb AS (SELECT h FROM hs WHERE side = 1 ORDER BY h LIMIT {KMV_K}),
    un AS (
      SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb)
      ORDER BY h LIMIT {KMV_K}
    ),
    flags AS (
      SELECT un.h,
             CAST(ROW_NUMBER() OVER (ORDER BY un.h) AS BIGINT) AS rank,
             (ska.h IS NOT NULL) AS in_a, (skb.h IS NOT NULL) AS in_b
      FROM un LEFT JOIN ska ON ska.h = un.h LEFT JOIN skb ON skb.h = un.h
    ),
    summ AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS ku, MAX(h) AS hk,
             CAST(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
               AS nboth
      FROM flags
    ),
    ex AS (
      SELECT CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_union_exact,
             CAST(SUM(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT) AS n_inter
      FROM (SELECT shingle, COUNT(DISTINCT side) = 2 AS in_both
            FROM sh GROUP BY shingle)
    ),
    est AS (
      SELECT CASE WHEN ku < {KMV_K} THEN ku * 1000000
                  ELSE CAST(floor({KMV_EST_NUM!r} / CAST(hk AS DOUBLE)
                                  * 1000000.0 + 0.5) AS BIGINT) END
               AS est_union_micro,
             CAST(floor(1000000.0 * nboth / ku + 0.5) AS BIGINT)
               AS jacc_est_micro
      FROM summ
    )
    SELECT f.rank, f.h, f.in_a, f.in_b,
           e.est_union_micro, e.jacc_est_micro,
           x.n_union_exact,
           CAST(floor(1000000.0 * x.n_inter / x.n_union_exact + 0.5) AS BIGINT)
             AS jacc_exact_micro,
           abs(e.est_union_micro - 1000000 * x.n_union_exact)
             <= {KMV_3SIG_MICRO} * x.n_union_exact AS union_within_3sigma
    FROM flags f CROSS JOIN est e CROSS JOIN ex x
    """


@register("sketch_kmv_report", oracle=_kmv_oracle())
def sketch_kmv_report(spark, sf_dir):
    """KMV (k-minimum-values) sketch set-operation report: split the
    corpus into two sides by source parity, sketch each side's distinct
    3-shingle set with its k=256 smallest portable hashes, and estimate
    the UNION cardinality ((k-1) * 2^60 / h_(k)) and the JACCARD between
    the sides (union-sketch members present in both sketches / k) next
    to the exact values, with the 3-sigma cardinality invariant in
    integer micro-units. All 256 union-sketch members are output with
    their side-membership flags, so the driver attests the sketch
    CONTENT, not just the estimates.

    Why KMV completes the sketch family: CMS answers frequency point
    queries, HLL answers union cardinality, but neither can estimate an
    INTERSECTION — KMV's k-min set is a uniform sample of the distinct
    space, so set-expression estimates (Jaccard, containment, overlap of
    two crawls/days/corpora) fall out of the same 256 values, and the
    union of two sketches is just the re-trimmed k-min of their merged
    values (mergeable like HLL registers). Scale shape: a bounded-memory
    per-partition k-min pass emits <= k rows per task (the streaming KMV
    update), so the reduce sees k * partitions rows however large the
    corpus; everything downstream is on <= 3k rows."""
    from ..operators import sketches as K

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    side = (F.substring("source", 4, 10).cast("int") % 2).alias("side")
    # The side flag is a per-row expression on the SAME scan the shingles
    # come from — compute it in the explode projection instead of joining
    # shingles back to documents by doc_id (r9-opt: one exchange fewer),
    # and hash in-row BEFORE the distinct so the exchange carries 16-byte
    # (int, long) rows, never shingle strings. Distinct-of-hashes equals
    # hash-of-distincts (the oracle's hs does the same DISTINCT over h);
    # the exact leg below counts hashes too — identical modulo the
    # documented ~2^-60 md5-fold collision trade.
    wide = ensure_parallelism(d.select(side, "text"))
    shingle_arr = D.let_col(
        D.tokens_col(F.col("text")),
        lambda t: F.when(
            F.size(t) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 2),
                lambda i: F.array_join(F.slice(t, i, 3), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    sh = (
        wide.select("side", F.explode(F.array_distinct(shingle_arr)).alias("shingle"))
        .select("side", D.portable_hash60(F.col("shingle")).alias("h"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # BOTH sides' k-min sketches in one pass/job (dual streaming KMV).
    sides = K.kmv_sketch_sides(sh).localCheckpoint(eager=True)
    ska = sides.filter(F.col("side") == 0).select("h")
    skb = sides.filter(F.col("side") == 1).select("h")
    un = (
        ska.union(skb).distinct().orderBy("h").limit(K.KMV_K).localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    flags = (
        un.join(ska.select(F.col("h"), F.lit(True).alias("_a")), "h", "left")
        .join(skb.select(F.col("h"), F.lit(True).alias("_b")), "h", "left")
        .select(
            F.row_number().over(Window.orderBy("h")).cast("long").alias("rank"),
            "h",
            F.coalesce("_a", F.lit(False)).alias("in_a"),
            F.coalesce("_b", F.lit(False)).alias("in_b"),
        )
    )
    summ = flags.agg(
        F.count(F.lit(1)).alias("ku"),
        F.max("h").alias("hk"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("nboth"),
    )
    est = summ.select(
        F.when(F.col("ku") < K.KMV_K, F.col("ku") * 1000000)
        .otherwise(
            F.floor(
                F.lit(K.KMV_EST_NUM) / F.col("hk").cast("double") * 1000000.0 + 0.5
            ).cast("long")
        )
        .alias("est_union_micro"),
        F.floor(1000000.0 * F.col("nboth") / F.col("ku") + 0.5)
        .cast("long")
        .alias("jacc_est_micro"),
    )
    ex = sh.groupBy("h").agg(
        (F.count_distinct("side") == 2).alias("both")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_union_exact"),
        F.sum(F.col("both").cast("long")).alias("n_inter"),
    )
    return (
        flags.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(ex))
        .select(
            "rank",
            "h",
            "in_a",
            "in_b",
            "est_union_micro",
            "jacc_est_micro",
            "n_union_exact",
            F.floor(1000000.0 * F.col("n_inter") / F.col("n_union_exact") + 0.5)
            .cast("long")
            .alias("jacc_exact_micro"),
            (
                F.abs(F.col("est_union_micro") - 1000000 * F.col("n_union_exact"))
                <= F.lit(K.KMV_3SIG_MICRO) * F.col("n_union_exact")
            ).alias("union_within_3sigma"),
        )
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995; Chen &
# Goodman 1999 "An empirical study of smoothing techniques")
# ---------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount


@register(
    "doc_kn_logppl",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    tt AS (SELECT doc_id, t FROM t WHERE len(t) >= 2),
    b AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
        SELECT doc_id, unnest(list_transform(
                 generate_series(2, len(t)),
                 i -> {{'w1': t[i-1], 'w2': t[i]}})) AS p
        FROM tt)
    ),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM b GROUP BY w1, w2),
    lft AS (SELECT w1, COUNT(*) AS cp, COUNT(DISTINCT w2) AS n1p
            FROM b GROUP BY w1),
    cont AS (SELECT w2, COUNT(DISTINCT w1) AS ncont FROM b GROUP BY w2),
    tot AS (SELECT COUNT(*) AS ntypes FROM cb),
    sc AS (
      SELECT b.doc_id,
             ln(greatest(cb.cb - {_KN_D}, 0) / lft.cp
                + {_KN_D} * lft.n1p / lft.cp * cont.ncont / tot.ntypes) AS lp
      FROM b
      JOIN cb USING (w1, w2)
      JOIN lft USING (w1)
      JOIN cont ON cont.w2 = b.w2
      CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
           ROUND(-AVG(lp), 6) AS kn_logppl
    FROM sc GROUP BY doc_id
    """,
)
def doc_kn_logppl(spark, sf_dir):
    """Interpolated Kneser-Ney bigram scoring — the smoothing real LM
    quality filters (KenLM/CCNet) actually use, one rung above the plain
    interpolated bigram: p(w2|w1) = max(c(w1w2) - D, 0)/c(w1.)
    + D*N1+(w1.)/c(w1.) * Pcont(w2), where the CONTINUATION probability
    Pcont(w2) = N1+(.w2)/N1+(..) counts the distinct contexts w2 follows
    rather than its raw frequency — the fix for high-frequency
    low-versatility tokens ('Francisco' follows only 'San') that raw
    backoff over-scores. Every factor is a corpus count, so the whole
    score is oracle-exact.

    Scale shape mirrors doc_bigram_logppl: pairs build map-only from the
    token array; the count tables shuffle on bigram/unigram keys
    (vocabulary-bounded, far below corpus size); the continuation and
    total-types tables broadcast."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    toks = T.tokens(F.col("text"))
    tt = d.select("doc_id", toks.alias("t")).filter(F.size("t") >= 2)
    b = tt.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(2), F.size("t")),
                lambda i: F.struct(
                    F.element_at("t", i - 1).alias("w1"),
                    F.element_at("t", i).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    # Every KN statistic is derivable from the bigram-TYPE table (cp =
    # sum of counts per w1, N1+ = type count per w1/w2, ntypes = |cb|),
    # so the corpus bigram stream aggregates exactly once and no
    # count_distinct expansion ever runs; cb (vocabulary²-bounded) feeds
    # four consumers, hence the one materialization.
    cb = (
        b.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cb"))
        .localCheckpoint(eager=True)
    )
    lft = cb.groupBy("w1").agg(
        F.sum("cb").alias("cp"), F.count(F.lit(1)).alias("n1p")
    )
    cont = cb.groupBy("w2").agg(F.count(F.lit(1)).alias("ncont"))
    tot = cb.agg(F.count(F.lit(1)).alias("ntypes"))
    lp = F.log(
        F.greatest(F.col("cb") - F.lit(_KN_D), F.lit(0.0)) / F.col("cp")
        + F.lit(_KN_D) * F.col("n1p") / F.col("cp") * F.col("ncont") / F.col("ntypes")
    )
    return (
        b.join(cb, ["w1", "w2"])
        .join(lft, "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.round(-F.avg(lp), 6).alias("kn_logppl"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (Sweeney 2002) over quasi-identifier combinations
# ---------------------------------------------------------------------------

_KANON_K = 5
_KANON_BAND = 5000


@register(
    "privacy_k_anonymity",
    oracle=f"""
    WITH q AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(floor(c_acctbal / {_KANON_BAND}) AS BIGINT) AS bal_band
      FROM customer
      WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
        AND c_acctbal IS NOT NULL
    ),
    g AS (
      SELECT nation, segment, bal_band, CAST(COUNT(*) AS BIGINT) AS group_size
      FROM q GROUP BY nation, segment, bal_band
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN group_size < {_KANON_K} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violating_groups,
             CAST(SUM(CASE WHEN group_size < {_KANON_K} THEN group_size
                           ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
             CAST(SUM(group_size) AS BIGINT) AS n_rows
      FROM g
    )
    SELECT g.nation, g.segment, g.bal_band, g.group_size,
           g.group_size < {_KANON_K} AS violates_k,
           s.n_violating_groups, s.n_rows_at_risk,
           CAST(floor(1000000.0 * s.n_rows_at_risk / s.n_rows + 0.5) AS BIGINT)
             AS risk_share_micro
    FROM g CROSS JOIN s
    """,
)
def privacy_k_anonymity(spark, sf_dir):
    """k-anonymity audit (Sweeney 2002): group the released table by its
    quasi-identifier combination (nation x market segment x account-
    balance band) and flag every equivalence class smaller than k=5 — a
    record in such a class is re-identifiable by linking the QIs against
    an external dataset. Output: every class with its size and violation
    flag, plus the corpus-level risk share (rows in violating classes /
    total, micro-units) — the number a release gate thresholds on before
    shipping a dataset containing user-derived columns. Complements the
    pattern-based PII redaction (text_pii_redact): redaction removes
    direct identifiers, k-anonymity measures what the REMAINING columns
    still leak in combination.

    Scale shape: one hash aggregate on the QI key (map-side partial) and
    a 3-long-column summary that broadcasts back into the class rows."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isNotNull()
        & F.col("c_mktsegment").isNotNull()
        & F.col("c_acctbal").isNotNull()
    )
    g = (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / _KANON_BAND).cast("long").alias("bal_band"),
        )
        .groupBy("nation", "segment", "bal_band")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    s = g.agg(
        F.sum((F.col("group_size") < _KANON_K).cast("long")).alias(
            "n_violating_groups"
        ),
        F.sum(
            F.when(F.col("group_size") < _KANON_K, F.col("group_size")).otherwise(0)
        ).alias("n_rows_at_risk"),
        F.sum("group_size").alias("n_rows"),
    )
    return g.crossJoin(F.broadcast(s)).select(
        "nation",
        "segment",
        "bal_band",
        "group_size",
        (F.col("group_size") < _KANON_K).alias("violates_k"),
        "n_violating_groups",
        "n_rows_at_risk",
        F.floor(1000000.0 * F.col("n_rows_at_risk") / F.col("n_rows") + 0.5)
        .cast("long")
        .alias("risk_share_micro"),
    )


_LDIV_L = 3


@register(
    "privacy_l_diversity",
    oracle=f"""
    WITH q AS (
      SELECT c_nationkey AS nation,
             CAST(floor(c_acctbal / {_KANON_BAND}) AS BIGINT) AS bal_band,
             c_mktsegment AS segment
      FROM customer
      WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
        AND c_acctbal IS NOT NULL
    ),
    g AS (
      SELECT nation, bal_band,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT segment) AS BIGINT) AS n_sensitive
      FROM q GROUP BY nation, bal_band
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN n_sensitive < {_LDIV_L} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violating_groups,
             CAST(SUM(CASE WHEN n_sensitive < {_LDIV_L} THEN group_size
                           ELSE 0 END) AS BIGINT) AS n_rows_at_risk
      FROM g
    )
    SELECT g.nation, g.bal_band, g.group_size, g.n_sensitive,
           g.n_sensitive < {_LDIV_L} AS violates_l,
           s.n_violating_groups, s.n_rows_at_risk
    FROM g CROSS JOIN s
    """,
)
def privacy_l_diversity(spark, sf_dir):
    """l-diversity audit (Machanavajjhala et al. 2006) — the attribute-
    disclosure companion to privacy_k_anonymity: a QI class can satisfy
    k-anonymity yet still leak if (nearly) all its members share the
    SAME sensitive value, so here every (nation x balance-band) class
    must contain >= l=3 distinct market segments. Output: every class
    with its size, distinct-sensitive count, and violation flag, plus
    corpus totals. Identity disclosure (k) and attribute disclosure (l)
    are different failure modes; a release gate checks both.

    Scale shape: one aggregate on the QI key (count_distinct over the
    5-value sensitive column stays cheap) and a broadcast summary."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isNotNull()
        & F.col("c_mktsegment").isNotNull()
        & F.col("c_acctbal").isNotNull()
    )
    g = (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.floor(F.col("c_acctbal") / _KANON_BAND).cast("long").alias("bal_band"),
            F.col("c_mktsegment").alias("segment"),
        )
        .groupBy("nation", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct("segment").cast("long").alias("n_sensitive"),
        )
    )
    s = g.agg(
        F.sum((F.col("n_sensitive") < _LDIV_L).cast("long")).alias(
            "n_violating_groups"
        ),
        F.sum(
            F.when(F.col("n_sensitive") < _LDIV_L, F.col("group_size")).otherwise(0)
        ).alias("n_rows_at_risk"),
    )
    return g.crossJoin(F.broadcast(s)).select(
        "nation",
        "bal_band",
        "group_size",
        "n_sensitive",
        (F.col("n_sensitive") < _LDIV_L).alias("violates_l"),
        "n_violating_groups",
        "n_rows_at_risk",
    )


_TCLOSE_T_MICRO = 200_000  # t = 0.2, the Li et al. worked-example value


@register(
    "privacy_t_closeness",
    oracle=f"""
    WITH q AS (
      SELECT c_nationkey AS nation,
             CAST(floor(c_acctbal / {_KANON_BAND}) AS BIGINT) AS bal_band,
             c_mktsegment AS segment
      FROM customer
      WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
        AND c_acctbal IS NOT NULL
    ),
    cell AS (
      SELECT nation, bal_band, segment, CAST(COUNT(*) AS BIGINT) AS ccnt
      FROM q GROUP BY nation, bal_band, segment
    ),
    cls AS (
      SELECT nation, bal_band, CAST(SUM(ccnt) AS BIGINT) AS group_size
      FROM cell GROUP BY nation, bal_band
    ),
    gdist AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS g FROM q GROUP BY segment
    ),
    tot AS (SELECT CAST(SUM(g) AS BIGINT) AS t FROM gdist),
    grid AS (
      SELECT cls.nation, cls.bal_band, cls.group_size,
             gdist.segment, gdist.g, tot.t,
             COALESCE(cell.ccnt, 0) AS ccnt
      FROM cls CROSS JOIN gdist CROSS JOIN tot
      LEFT JOIN cell ON cell.nation = cls.nation
                    AND cell.bal_band = cls.bal_band
                    AND cell.segment = gdist.segment
    ),
    d AS (
      SELECT nation, bal_band, group_size,
             CAST(floor(1000000.0 * SUM(abs(ccnt * t - g * group_size))
                        / (2.0 * group_size * MAX(t)) + 0.5) AS BIGINT)
               AS dist_micro
      FROM grid GROUP BY nation, bal_band, group_size
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN dist_micro > {_TCLOSE_T_MICRO} THEN 1
                           ELSE 0 END) AS BIGINT) AS n_violating_groups,
             CAST(SUM(CASE WHEN dist_micro > {_TCLOSE_T_MICRO}
                           THEN group_size ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk
      FROM d
    )
    SELECT d.nation, d.bal_band, d.group_size, d.dist_micro,
           d.dist_micro > {_TCLOSE_T_MICRO} AS violates_t,
           s.n_violating_groups, s.n_rows_at_risk
    FROM d CROSS JOIN s
    """,
)
def privacy_t_closeness(spark, sf_dir):
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — completes
    the release-gate triad with privacy_k_anonymity (identity
    disclosure) and privacy_l_diversity (attribute disclosure): a class
    can be k-anonymous AND l-diverse yet still leak if its sensitive
    DISTRIBUTION differs sharply from the table's (the classic
    skewness/similarity attacks). Per (nation x balance-band) class,
    the variational distance (the EMD instance for an unordered
    sensitive attribute) between the class's market-segment distribution
    and the global one: d = ½ Σ_v |p_class(v) − p_global(v)|, flagged
    when d > t = 0.2. Arithmetic is exact: cross-multiplied integer
    counts (|ccnt·T − g·cs|) with ONE terminal micro-unit floor shared
    with the oracle.

    Scale shape: the cell aggregate is the only corpus-keyed exchange;
    the global distribution (|segments| rows) and the 1-row total
    broadcast into a class-keyed grid — the distance rides
    |classes| × |segments| rows, never the corpus."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isNotNull()
        & F.col("c_mktsegment").isNotNull()
        & F.col("c_acctbal").isNotNull()
    )
    q = c.select(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / _KANON_BAND).cast("long").alias("bal_band"),
        F.col("c_mktsegment").alias("segment"),
    )
    cell = q.groupBy("nation", "bal_band", "segment").agg(
        F.count(F.lit(1)).alias("ccnt")
    )
    cls = cell.groupBy("nation", "bal_band").agg(
        F.sum("ccnt").alias("group_size")
    )
    glob = q.groupBy("segment").agg(F.count(F.lit(1)).alias("g"))
    tot = glob.agg(F.sum("g").alias("t"))  # 1 row
    grid = (
        cls.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cell, ["nation", "bal_band", "segment"], "left")
        .withColumn("ccnt", F.coalesce("ccnt", F.lit(0)))
    )
    d = grid.groupBy("nation", "bal_band", "group_size").agg(
        F.floor(
            1000000.0
            * F.sum(F.abs(F.col("ccnt") * F.col("t") - F.col("g") * F.col("group_size")))
            / (2.0 * F.first("group_size") * F.max("t"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("dist_micro")
    )
    s = d.agg(
        F.sum((F.col("dist_micro") > _TCLOSE_T_MICRO).cast("long")).alias(
            "n_violating_groups"
        ),
        F.sum(
            F.when(
                F.col("dist_micro") > _TCLOSE_T_MICRO, F.col("group_size")
            ).otherwise(0)
        ).alias("n_rows_at_risk"),
    )
    return d.crossJoin(F.broadcast(s)).select(
        "nation",
        "bal_band",
        "group_size",
        "dist_micro",
        (F.col("dist_micro") > _TCLOSE_T_MICRO).alias("violates_t"),
        "n_violating_groups",
        "n_rows_at_risk",
    )


# ---------------------------------------------------------------------------
# Physical layout: dense global ids + Z-order clustering (operators/layout)
# ---------------------------------------------------------------------------


@register(
    "assign_global_ids",
    oracle="""
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS global_id
    FROM documents WHERE doc_id IS NOT NULL
    """,
)
def assign_global_ids(spark, sf_dir):
    """Dense, contiguous, order-preserving global row ids — the example-id
    stamp a training pipeline applies before sharding — WITHOUT the
    single-reducer ``row_number() OVER (ORDER BY ...)`` the oracle uses
    (correct SQL, fatal plan: an empty PARTITION BY funnels all 100 TB
    through one task).

    Scale shape (operators/layout.assign_dense_ids): range-exchange on
    the key pinned by an eager localCheckpoint, per-partition counts
    (driver sees ONE long per partition, never rows), then a
    partition-local row_number plus the broadcast cumulative offset —
    every stage is as wide as the shuffle width. The plan audit pins the
    absence of a SinglePartition exchange; the oracle proves the
    distributed recipe equals the naive total order exactly.
    """
    from ..operators.layout import assign_dense_ids

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    return assign_dense_ids(d.select("doc_id", "source"), "doc_id")


def _zorder_sql(x: str, y: str, bits: int) -> str:
    """DuckDB twin of sources/layout._interleave_bits for two columns
    (x in the even bit positions, y in the odd — j-major, identical bit
    layout to the Spark expression). Positions are disjoint so + == OR."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _zorder_oracle() -> str:
    z = _zorder_sql("((l_partkey * 37) % 4096)", "((l_suppkey * 149) % 4096)", bits=12)
    return f"""
    WITH keyed AS (
      SELECT {z} >> 16 AS z_bucket,
             (l_partkey * 37) % 4096 AS x, (l_suppkey * 149) % 4096 AS y
      FROM lineitem
      WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
    )
    SELECT z_bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max
    FROM keyed GROUP BY z_bucket
    """


@register("layout_zorder_report", oracle=_zorder_oracle())
def layout_zorder_report(spark, sf_dir):
    """Z-order (Morton) multi-dimensional clustering — the key behind
    Delta/Iceberg OPTIMIZE ZORDER: interleave the low 12 bits of two
    dimensions so rows close in (x, y) land close in z, then split the
    24-bit keyspace into 256 static z-range buckets (file surrogates;
    ``z >> 16`` — a static split, NO sort and no single-partition
    exchange) and report each bucket's min/max on both dimensions. The
    payoff the report shows: every bucket's bbox is a ~256×256 tile of
    the 4096² space, so a predicate on EITHER dimension prunes ~15/16
    of the files — a 1-D sort gets tight x-ranges but full-width
    y-ranges.

    Scale shape: the key is pure integer whole-stage-codegen arithmetic
    (sources/layout._interleave_bits — the SAME key expression the
    write path ``write_zorder_layout`` clusters files by, so this report
    is the oracle attestation of that layout's key math), one map-side-
    combinable aggregate over 256 groups; all-integer output so the
    oracle (the identical expression via _zorder_sql) matches exactly.
    """
    from ..sources.layout import _interleave_bits

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    # Odd multipliers are bijections mod 4096: dense key sequences spread
    # over the full 12-bit range at ANY scale factor (raw suppkey at
    # sf0.01 spans <7 bits, leaving the interleave's high bits empty).
    xk = (F.col("l_partkey") * 37) % 4096
    yk = (F.col("l_suppkey") * 149) % 4096
    keyed = li.select(
        F.shiftright(_interleave_bits([xk, yk], bits=12), 16).alias("z_bucket"),
        xk.alias("x"),
        yk.alias("y"),
    )
    return keyed.groupBy("z_bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )


# ---------------------------------------------------------------------------
# Probabilistic record linkage (Fellegi–Sunter) + DP-noised release
# ---------------------------------------------------------------------------

# Match/unmatch field probabilities and their log2 evidence weights as
# exact shared literals: both engines only ever ADD these constants, so
# the score is bit-identical however partitions combine.
import math as _math

_FS_FIELDS = {  # field -> (m, u)
    "seg": (0.9, 0.2),
    "bal": (0.8, 0.1),
    "name3": (0.95, 0.01),
}
_FS_W = {
    f: (
        repr(_math.log2(m / u)),
        repr(_math.log2((1 - m) / (1 - u))),
    )
    for f, (m, u) in _FS_FIELDS.items()
}


def _fs_oracle() -> str:
    score = " + ".join(
        f"(CASE WHEN agree_{f} THEN {w_a} ELSE {w_d} END)"
        for f, (w_a, w_d) in _FS_W.items()
    )
    return f"""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             CAST(floor(c_acctbal / 2500) AS BIGINT) AS band
      FROM customer
      WHERE c_custkey IS NOT NULL AND c_acctbal IS NOT NULL
    ),
    pairs AS (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
             (a.c_mktsegment = b.c_mktsegment) AS agree_seg,
             (abs(a.c_acctbal - b.c_acctbal) < 50) AS agree_bal,
             (right(a.c_name, 3) = right(b.c_name, 3)) AS agree_name3
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey AND a.band = b.band
       AND a.c_custkey < b.c_custkey
    )
    SELECT key_a, key_b, agree_seg, agree_bal, agree_name3,
           floor(1e6 * ({score}) + 0.5) / 1e6 AS fs_score,
           CASE WHEN ({score}) >= 6 THEN 'match'
                WHEN ({score}) >= 0 THEN 'possible'
                ELSE 'non-match' END AS tier
    FROM pairs WHERE ({score}) >= 0
    """


@register("record_linkage_fs", oracle=_fs_oracle())
def record_linkage_fs(spark, sf_dir):
    """Probabilistic record linkage (Fellegi & Sunter 1969): blocked
    candidate pairs scored by summed log2 evidence weights — each field
    contributes log2(m/u) when it agrees and log2((1-m)/(1-u)) when it
    doesn't (m = P(agree | same entity), u = P(agree | different)) —
    then tiered into match / possible / non-match. The probabilistic
    complement to the deterministic edit-distance ER composite
    (``customer_entity_resolution``): fields carry different evidence,
    and a rare agreement (name tail, u=0.01) outweighs a common one
    (segment, u=0.2).

    Scale shape: the compound blocking key (nation × acctbal-band) keeps
    candidate generation an equi-join with bounded per-block fanout —
    never all-pairs; agreement tests and the score are codegen Column
    expressions; the m/u weights are exact double literals shared with
    the oracle, so the only FP op is adding three constants."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey").isNotNull() & F.col("c_acctbal").isNotNull()
    ).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2500).cast("long").alias("band"),
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.band") == F.col("b.band"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("key_a"),
        F.col("b.c_custkey").alias("key_b"),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias("agree_seg"),
        (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) < 50).alias("agree_bal"),
        (F.substring(F.col("a.c_name"), -3, 3) == F.substring(F.col("b.c_name"), -3, 3)).alias("agree_name3"),
    )
    score = None
    for f, (w_a, w_d) in _FS_W.items():
        term = F.when(F.col(f"agree_{f}"), F.lit(float(w_a))).otherwise(
            F.lit(float(w_d))
        )
        score = term if score is None else score + term
    tier = (
        F.when(score >= 6, F.lit("match"))
        .when(score >= 0, F.lit("possible"))
        .otherwise(F.lit("non-match"))
    )
    return (
        pairs.withColumn("fs_score", F.floor(F.lit(1e6) * score + F.lit(0.5)) / F.lit(1e6))
        .withColumn("tier", tier)
        .filter(score >= 0)
        .select("key_a", "key_b", "agree_seg", "agree_bal", "agree_name3", "fs_score", "tier")
    )


_DP_EPS = 1.0
_DP_M = 2147483648  # 2^31


def _dp_oracle() -> str:
    h = D.portable_hash60_sql("source || '|' || lang")
    return f"""
    WITH g AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
      GROUP BY source, lang
    ),
    u AS (
      SELECT *, (({h}) % {_DP_M} + 0.5) / {_DP_M}.0 AS unif FROM g
    )
    SELECT source, lang, n_docs,
           floor(1e6 * (n_docs
             - (1.0 / {_DP_EPS}) * CASE WHEN unif >= 0.5 THEN 1 ELSE -1 END
               * ln(1 - 2 * abs(unif - 0.5))) + 0.5) / 1e6 AS noised_count,
           {_DP_EPS} AS epsilon
    FROM u
    """


@register("privacy_dp_histogram", oracle=_dp_oracle())
def privacy_dp_histogram(spark, sf_dir):
    """Differentially-private histogram release (Dwork et al. 2006): per
    (source, lang) counts plus Laplace(sensitivity/epsilon) noise — the
    third leg of the privacy audit family (k-anonymity says which groups
    are too small to release, l-diversity which leak attributes; DP
    releases ALL groups by calibrating noise to the count's unit
    sensitivity instead of suppressing).

    The noise is sampled by inverse-CDF from an engine-portable uniform
    (md5-derived 60-bit hash of the group key, operators/dedup
    .portable_hash60 — the same primitive the portable MinHash uses), so
    the 'random' draw is deterministic, auditable, and bit-identical in
    the oracle; a production release would swap in a CSPRNG draw per
    group — the calibration, not the source of randomness, is what's
    under test. Scale shape: one map-side-combinable count plus pure
    codegen arithmetic; groups are bounded (sources × langs), rows never
    leave their executors."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    )
    g = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_docs"))
    h = D.portable_hash60(F.concat_ws("|", F.col("source"), F.col("lang")))
    unif = (h % F.lit(_DP_M) + F.lit(0.5)) / F.lit(float(_DP_M))
    lap = (
        F.lit(1.0 / _DP_EPS)
        * F.when(unif >= 0.5, F.lit(1)).otherwise(F.lit(-1))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(unif - F.lit(0.5)))
    )
    return g.select(
        "source",
        "lang",
        "n_docs",
        (F.floor(F.lit(1e6) * (F.col("n_docs") - lap) + F.lit(0.5)) / F.lit(1e6)).alias(
            "noised_count"
        ),
        F.lit(_DP_EPS).alias("epsilon"),
    )


# ---------------------------------------------------------------------------
# Geospatial: cell-blocked neighbor join (geohash-style spatial dedup)
# ---------------------------------------------------------------------------

_GEO_R = 0.02  # neighbor radius in degrees (~2.2 km at the equator)
_GEO_M = 2147483648


def _geo_oracle() -> str:
    ulat = D.portable_hash60_sql("CAST(c_custkey AS VARCHAR) || '|lat'")
    ulon = D.portable_hash60_sql("CAST(c_custkey AS VARCHAR) || '|lon'")
    return f"""
    WITH pts AS (
      SELECT c_custkey AS key,
             (({ulat}) % {_GEO_M} + 0.5) / {_GEO_M}.0 AS lat,
             (({ulon}) % {_GEO_M} + 0.5) / {_GEO_M}.0 AS lon
      FROM customer WHERE c_custkey IS NOT NULL
    ),
    cells AS (
      SELECT *, CAST(floor(lon / {_GEO_R}) AS BIGINT) AS cx,
                CAST(floor(lat / {_GEO_R}) AS BIGINT) AS cy
      FROM pts
    ),
    probe AS (
      SELECT cells.*, cx + dx.d AS px, cy + dy.d AS py
      FROM cells
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
    )
    SELECT a.key AS key_a, b.key AS key_b,
           CAST(floor(1e12 * ((a.lat - b.lat) * (a.lat - b.lat)
                              + (a.lon - b.lon) * (a.lon - b.lon)) + 0.5)
                AS BIGINT) AS dist_sq_pico
    FROM probe a JOIN cells b
      ON a.px = b.cx AND a.py = b.cy AND a.key < b.key
    WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) < {_GEO_R} * {_GEO_R}
    """


@register("geo_neighbor_join", oracle=_geo_oracle())
def geo_neighbor_join(spark, sf_dir):
    """Spatial neighbor join by grid-cell blocking — the geohash pattern
    every POI/address dedup runs: bucket points into r-sized cells, probe
    each point against its 3×3 cell neighborhood (candidates), verify
    true distance < r. A point pair within r ALWAYS falls in adjacent
    cells, so the equi-join on cell ids is lossless while reducing the
    all-pairs O(n²) to O(n · density). Coordinates are synthesized
    deterministically from the portable hash (a unit-degree city box);
    the planar degree-space metric keeps the verify trig-free so both
    engines compute bit-identical distances (at real scale swap in
    haversine — the blocking is unchanged).

    Scale shape: the 9× probe explode multiplies a constant; the join is
    an equi-join on cell ids (spatial locality IS the shuffle key — the
    whole point of geohashing); per-cell fanout is bounded by point
    density, the spatial analogue of the dedup family's hot-bucket
    caps."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey").isNotNull())
    ulat = (
        D.portable_hash60(F.concat(F.col("c_custkey").cast("string"), F.lit("|lat")))
        % F.lit(_GEO_M)
        + F.lit(0.5)
    ) / F.lit(float(_GEO_M))
    ulon = (
        D.portable_hash60(F.concat(F.col("c_custkey").cast("string"), F.lit("|lon")))
        % F.lit(_GEO_M)
        + F.lit(0.5)
    ) / F.lit(float(_GEO_M))
    pts = c.select(
        F.col("c_custkey").alias("key"), ulat.alias("lat"), ulon.alias("lon")
    )
    cells = pts.select(
        "*",
        F.floor(F.col("lon") / _GEO_R).cast("long").alias("cx"),
        F.floor(F.col("lat") / _GEO_R).cast("long").alias("cy"),
    )
    probe = cells.select(
        "*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx")
    ).select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"))
    a = probe.select(
        F.col("key").alias("key_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cx") + F.col("dx")).alias("px"),
        (F.col("cy") + F.col("dy")).alias("py"),
    )
    b = cells.select(
        F.col("key").alias("key_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cx",
        "cy",
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b")) + (
        F.col("lon_a") - F.col("lon_b")
    ) * (F.col("lon_a") - F.col("lon_b"))
    return (
        a.join(
            b,
            (F.col("px") == F.col("cx"))
            & (F.col("py") == F.col("cy"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .filter(d2 < F.lit(_GEO_R * _GEO_R))
        .select(
            "key_a",
            "key_b",
            F.floor(F.lit(1e12) * d2 + F.lit(0.5)).cast("long").alias("dist_sq_pico"),
        )
    )


@register(
    "sample_reservoir_per_group",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source, lang,
             {D.portable_hash60_sql("CAST(doc_id AS VARCHAR) || '|res'")} AS k
      FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
    )
    SELECT doc_id, source, lang, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
               AS rnk
      FROM keyed) WHERE rnk <= 10
    """,
)
def sample_reservoir_per_group(spark, sf_dir):
    """Exact-k uniform reservoir sample PER GROUP (distributed
    reservoir = top-k by a deterministic per-row hash key within each
    group — every row equally likely, k exact, reproducible): the third
    leg of the sampling family (stratified = per-group FRACTION,
    weighted = GLOBAL Efraimidis–Spirakis; this is per-group exact-k).

    Scale shape: the rank<=k predicate pushes into a map-side partial
    WindowGroupLimit (the same plan virtue ``topk_per_group`` pins), so
    each input partition forwards at most k rows per group to the
    exchange — sampling 10 docs/source from 100 TB shuffles O(groups×k),
    not the corpus."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("source").isNotNull()
    )
    from pyspark.sql import Window

    k = D.portable_hash60(F.concat(F.col("doc_id").cast("string"), F.lit("|res")))
    w = Window.partitionBy("source").orderBy("k", "doc_id")
    return (
        d.select("doc_id", "source", "lang", k.alias("k"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("doc_id", "source", "lang", F.col("rnk").cast("long").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# Training-mixture weights + robust (MAD) anomaly detection
# ---------------------------------------------------------------------------

_MIX_ALPHA_NOTE = "alpha = 0.5 (sqrt temperature)"


@register(
    "curation_mixture_weights",
    oracle=r"""
    WITH n AS (
      SELECT source,
             CAST(SUM(len(list_filter(string_split_regex(trim(lower(text)),
                  '\s+'), t -> length(t) > 0))) AS BIGINT) AS n_tokens
      FROM documents
      WHERE source IS NOT NULL AND text IS NOT NULL AND length(text) > 0
      GROUP BY source
      HAVING n_tokens > 0
    ),
    s AS (
      SELECT source, n_tokens,
             CAST(floor(1e6 * sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
               AS s_micro
      FROM n
    ),
    tot AS (
      SELECT CAST(SUM(s_micro) AS BIGINT) AS w,
             CAST(SUM(n_tokens) AS BIGINT) AS nt
      FROM s
    )
    SELECT s.source, s.n_tokens,
           CAST(floor(1e6 * s.s_micro / tot.w + 0.5) AS BIGINT)
             AS weight_micro,
           CAST(floor(1e6 * (s.s_micro * CAST(tot.nt AS DOUBLE))
                      / (tot.w * CAST(s.n_tokens AS DOUBLE)) + 0.5) AS BIGINT)
             AS upsample_micro
    FROM s CROSS JOIN tot
    """,
)
def curation_mixture_weights(spark, sf_dir):
    """Temperature-based training-mixture weights (the multilingual /
    multi-source sampling rule of mBERT/XLM-R/PaLM data recipes):
    source i is sampled with probability ∝ n_i^α, α = 0.5, so
    low-resource sources are upsampled relative to their natural share
    without letting any single giant source dominate. Emits each
    source's token count, its mixture weight, and the upsample factor
    (weight ÷ natural share — >1 means the source is seen more often
    than proportional sampling would show it).

    Complements ``curation_dsir_weights`` (importance weights from a
    target distribution) with the simpler temperature rule used when no
    target corpus exists. Exactness: α = ½ makes the power a SQRT —
    correctly rounded per IEEE 754 in BOTH engines (a general pow(x,
    0.3) is not) — and each sqrt is floored to integer micro-units
    BEFORE the sums, the repo's summed-doubles convention, so no
    engine's summation order can move a boundary.

    Scale shape: one map-side-combinable per-source token-count
    aggregate; everything after rides |sources| rows."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
        & F.col("text").isNotNull()
        & (F.length("text") > 0)
    )
    toks = F.size(
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    )
    # A source whose surviving docs hold zero tokens (all-whitespace text)
    # contributes nothing to the mixture — and would divide by zero in the
    # upsample ratio. Drop it on both engines (oracle: HAVING n_tokens > 0).
    n = (
        d.groupBy("source")
        .agg(F.sum(toks.cast("long")).alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    s = n.select(
        "source",
        "n_tokens",
        F.floor(F.lit(1e6) * F.sqrt(F.col("n_tokens").cast("double")))
        .cast("long")
        .alias("s_micro"),
    )
    tot = s.agg(
        F.sum("s_micro").alias("w"), F.sum("n_tokens").alias("nt")
    )  # 1 row
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.floor(F.lit(1e6) * F.col("s_micro") / F.col("w") + F.lit(0.5))
        .cast("long")
        .alias("weight_micro"),
        F.floor(
            F.lit(1e6)
            * (F.col("s_micro") * F.col("nt").cast("double"))
            / (F.col("w") * F.col("n_tokens").cast("double"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("upsample_micro"),
    )


_MAD_K = 1.4826  # consistency constant: MAD * k estimates sigma under normality
_MAD_THR = 3.0


@register(
    "events_anomaly_mad",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
    ),
    med AS (
      SELECT user_id, quantile_cont(cents, 0.5) AS med,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY user_id
    ),
    dev AS (
      SELECT e.user_id, e.event_id, e.ts, e.cents, med.med, med.n,
             abs(e.cents - med.med) AS adev
      FROM e JOIN med USING (user_id)
    ),
    mad AS (
      SELECT user_id, quantile_cont(adev, 0.5) AS mad FROM dev
      GROUP BY user_id
    )
    SELECT dev.user_id, dev.event_id, dev.ts, dev.cents,
           CAST(floor(1e6 * dev.adev / ({_MAD_K} * mad.mad) + 0.5) AS BIGINT)
             AS robust_z_micro,
           CASE WHEN dev.cents >= dev.med THEN 1 ELSE -1 END AS direction
    FROM dev JOIN mad USING (user_id)
    WHERE dev.n >= 8 AND mad.mad > 0
      AND dev.adev > {_MAD_THR} * {_MAD_K} * mad.mad
    """,
)
def events_anomaly_mad(spark, sf_dir):
    """Robust outlier detection via median absolute deviation — the
    breakdown-resistant companion to ``events_anomaly_zscore``: mean and
    stddev are themselves dragged by the outliers they are supposed to
    find (one 100x spike inflates σ enough to hide a 10x spike), while
    the median and MAD have a 50% breakdown point. Flags events with
    |x − median| > 3 · 1.4826 · MAD per user (the 1.4826 consistency
    constant makes MAD·k estimate σ under normality, so the threshold is
    comparable to ±3σ).

    Exactness: values are floored to integer cents; the interpolated
    median of integers lands on the exact .0/.5 double grid and the MAD
    of those on the .25 grid — both engines' quantile_cont/percentile
    use the same (n−1)·p interpolation rule, so every comparison is over
    exactly representable doubles and the strict > cannot flip.

    Scale shape: two per-user aggregates (the median via a sort-based
    percentile over each user's bounded event list) and two user-keyed
    joins that reuse the same partitioning; nothing corpus-wide."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    ).select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    med = e.groupBy("user_id").agg(
        F.percentile("cents", F.lit(0.5)).alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = e.join(med, "user_id").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    return (
        dev.join(mad, "user_id")
        .filter(
            (F.col("n") >= 8)
            & (F.col("mad") > 0)
            & (F.col("adev") > F.lit(_MAD_THR * _MAD_K) * F.col("mad"))
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "cents",
            F.floor(
                F.lit(1e6) * F.col("adev") / (F.lit(_MAD_K) * F.col("mad"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("robust_z_micro"),
            F.when(F.col("cents") >= F.col("med"), F.lit(1))
            .otherwise(F.lit(-1))
            .cast("int")
            .alias("direction"),
        )
    )


# ---------------------------------------------------------------------------
# In-engine model training: logistic-regression quality classifier
# ---------------------------------------------------------------------------

_LR_THRESH = 306      # fixed label threshold (sf0.01 median n_chars)
_LR_RATE = 0.1
_LR_ITERS = 25
_NO_WS_PQ = r"length(regexp_replace(trim(text), '\s+', '', 'g'))"


def _logreg_oracle(iters: int = _LR_ITERS, lr: float = _LR_RATE) -> str:
    z = "(w.w0 * 1.0 + w.w1 * f.x1 + w.w2 * f.x2)"
    sig = f"(1.0 / (1.0 + exp(-{z})))"
    head = rf"""
    WITH feats AS MATERIALIZED (
      SELECT CAST(CASE WHEN n_chars >= {_LR_THRESH} THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y,
             floor(ln(1 + len({_TOKS})) * 1e6 + 0.5) / 1e6 AS x1,
             CAST(ROUND({_NO_WS_PQ} / len({_TOKS}), 6) AS DOUBLE) AS x2
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL AND n_chars IS NOT NULL
    ),
    tot AS MATERIALIZED (SELECT COUNT(*) AS n FROM feats),
    w0_iter AS MATERIALIZED (
      SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
             CAST(0.0 AS DOUBLE) AS w2
    )"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f"""
    g{t} AS MATERIALIZED (
      SELECT CAST(SUM(CAST(floor(({sig} - f.y) * 1.0 * 1e9) AS BIGINT)) AS BIGINT) AS g0,
             CAST(SUM(CAST(floor(({sig} - f.y) * f.x1 * 1e9) AS BIGINT)) AS BIGINT) AS g1,
             CAST(SUM(CAST(floor(({sig} - f.y) * f.x2 * 1e9) AS BIGINT)) AS BIGINT) AS g2
      FROM feats f CROSS JOIN w{t - 1}_iter w
    ),
    w{t}_iter AS MATERIALIZED (
      SELECT w.w0 - {lr} * ((CAST(g.g0 AS DOUBLE) / 1e9) / t.n) AS w0,
             w.w1 - {lr} * ((CAST(g.g1 AS DOUBLE) / 1e9) / t.n) AS w1,
             w.w2 - {lr} * ((CAST(g.g2 AS DOUBLE) / 1e9) / t.n) AS w2
      FROM w{t - 1}_iter w CROSS JOIN g{t} g CROSS JOIN tot t
    )""")
    tail = f"""
    acc AS MATERIALIZED (
      SELECT floor((CAST(SUM(CASE WHEN ({sig} >= 0.5) = (f.y = 1.0)
                                  THEN 1 ELSE 0 END) AS DOUBLE) / t.n) * 1e6 + 0.5)
               / 1e6 AS acc
      FROM feats f CROSS JOIN w{iters}_iter w CROSS JOIN tot t GROUP BY t.n
    )
    SELECT 'train_accuracy' AS feature, acc AS value FROM acc
    UNION ALL SELECT 'w0_bias', floor(w0 * 1e6 + 0.5) / 1e6 FROM w{iters}_iter
    UNION ALL SELECT 'w1_log_tokens', floor(w1 * 1e6 + 0.5) / 1e6 FROM w{iters}_iter
    UNION ALL SELECT 'w2_avg_token_len', floor(w2 * 1e6 + 0.5) / 1e6 FROM w{iters}_iter
    """
    return head + "," + ",".join(steps) + "," + tail


@register("quality_train_logreg", oracle=_logreg_oracle())
def quality_train_logreg(spark, sf_dir):
    """Train a logistic-regression length/quality classifier IN THE ENGINE
    by full-batch gradient descent (25 steps, lr 0.1) over per-document
    text features, and emit the learned weights plus training accuracy.

    Determinism across engines — the hard part of distributed training —
    comes from the repo's exact-integer playbook: every per-row gradient
    contribution is floored to int64 nano-units BEFORE the SUM, so the
    gradient is an exact integer total regardless of partition order, and
    the weight recurrence is the identical IEEE-754 expression both sides
    (the oracle unrolls all 25 steps as CTE pairs). The driver carries
    only the 3 weights per step — bounded, algorithm-intrinsic state, not
    data (contrast the size-gated GEMM collects in operators/similarity).

    Scale shape: features are computed once and localCheckpointed (3
    doubles/row); each GD step is one map-side-combinable aggregate over
    them — the canonical iterate-on-Spark loop (same pattern as
    graph_pagerank). Label threshold is a FIXED constant (the sf0.01
    median n_chars), so the query is scale-portable without a quantile
    pass; at 10x data the classes skew but the algebra is unchanged."""
    import math

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    t = F.col("text")
    feats = (
        ensure_parallelism(d)
        .select(
            F.when(F.col("n_chars") >= _LR_THRESH, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
            (
                F.floor(
                    F.log(F.lit(1.0) + T.token_count(t).cast("double")) * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("x1"),
            T.avg_token_len(t).alias("x2"),
        )
        .localCheckpoint(eager=True)
    )
    n = feats.count()
    # The 25 GD steps are SEQUENTIAL tiny aggregates: each job's cost at
    # bench scale is per-task fixed overhead on every checkpointed block,
    # not arithmetic. Narrow-coalesce the iterate-side read to a
    # byte-proportional width (~8 MB/partition of 3-double rows) so each
    # step schedules a handful of tasks instead of one per core
    # (optimization guide §1.2/§2.2: fewer, larger partitions when the
    # relation is small relative to the cluster). Scale-adaptive: at 1e9+
    # rows this exceeds the checkpoint's own width and is a no-op.
    it_parts = max(1, (n * 32) // (8 << 20))
    feats_it = feats.coalesce(int(it_parts)) if it_parts < feats.rdd.getNumPartitions() else feats
    if n == 0:
        # Empty input: no gradient exists (SUM over zero rows is NULL and
        # accuracy is 0/0) — emit the report shape with NULL values
        # rather than crashing the job on an empty shard.
        return spark.createDataFrame(
            [(f, None) for f in
             ("train_accuracy", "w0_bias", "w1_log_tokens", "w2_avg_token_len")],
            "feature string, value double",
        )
    w = [0.0, 0.0, 0.0]
    xs = [F.lit(1.0), F.col("x1"), F.col("x2")]
    for _ in range(_LR_ITERS):
        z = F.lit(w[0]) * F.lit(1.0) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        dd = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
        g = feats_it.agg(
            *[F.sum(F.floor(dd * x * F.lit(1e9))).alias(f"g{j}") for j, x in enumerate(xs)]
        ).collect()[0]
        w = [w[j] - _LR_RATE * ((g[f"g{j}"] / 1e9) / n) for j in range(3)]
    z = F.lit(w[0]) * F.lit(1.0) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    n_correct = feats_it.agg(
        F.sum(
            F.when((sig >= 0.5) == (F.col("y") == 1.0), 1).otherwise(0)
        ).alias("c")
    ).collect()[0]["c"]
    acc = math.floor((n_correct / n) * 1e6 + 0.5) / 1e6
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    return spark.createDataFrame(
        [
            ("train_accuracy", acc),
            ("w0_bias", r6(w[0])),
            ("w1_log_tokens", r6(w[1])),
            ("w2_avg_token_len", r6(w[2])),
        ],
        "feature string, value double",
    )


# ---------------------------------------------------------------------------
# Preference data: Bradley-Terry strength fitting (RLHF reward-model audit)
# ---------------------------------------------------------------------------

_BT_ITEMS = 16
_BT_ITERS = 10

_BT_A = "CAST(event_id % 16 AS BIGINT)"
_BT_B = "CAST((event_id * 31 + 7) % 16 AS BIGINT)"


def _bt_oracle(items: int = _BT_ITEMS, iters: int = _BT_ITERS) -> str:
    head = f"""
    WITH prefs AS MATERIALIZED (
      SELECT {_BT_A} AS a, {_BT_B} AS b,
             (event_id % ({_BT_A} + {_BT_B} + 2)) <= {_BT_A} AS win_a
      FROM events
      WHERE event_id IS NOT NULL AND {_BT_A} != {_BT_B}
    ),
    counts AS MATERIALIZED (
      SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT a AS i, b AS j FROM prefs
        UNION ALL SELECT b AS i, a AS j FROM prefs
      ) GROUP BY i, j
    ),
    wins AS MATERIALIZED (
      SELECT w AS i, CAST(COUNT(*) AS BIGINT) AS wins FROM (
        SELECT CASE WHEN win_a THEN a ELSE b END AS w FROM prefs
      ) GROUP BY w
    ),
    w0 AS MATERIALIZED (
      SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS wm FROM counts
    )"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f"""
    s{t} AS MATERIALIZED (
      SELECT c.i,
             CAST(SUM(CAST(floor(c.n * 1e9 / (wi.wm + wj.wm)) AS BIGINT))
                  AS BIGINT) AS s
      FROM counts c
      JOIN w{t - 1} wi ON wi.i = c.i
      JOIN w{t - 1} wj ON wj.i = c.j
      GROUP BY c.i
    ),
    w{t} AS MATERIALIZED (
      SELECT w.i,
             CASE WHEN s.s > 0 THEN
               CAST(floor(1e9 * COALESCE(wn.wins, 0) / s.s + 0.5) AS BIGINT)
             ELSE w.wm END AS wm
      FROM w{t - 1} w
      JOIN s{t} s ON s.i = w.i
      LEFT JOIN wins wn ON wn.i = w.i
    )""")
    tail = f"""
    tot AS (SELECT CAST(SUM(wm) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS m FROM w{iters}),
    games AS (SELECT i, CAST(SUM(n) AS BIGINT) AS matches FROM counts GROUP BY i)
    SELECT w.i AS item, COALESCE(wn.wins, 0) AS wins, g.matches,
           w.wm AS strength_micro,
           CAST(floor(w.wm * ({items} * 1000000.0) / tot.t + 0.5) AS BIGINT)
             AS strength_norm_micro,
           CAST(RANK() OVER (ORDER BY w.wm DESC, w.i) AS BIGINT) AS rank
    FROM w{iters} w
    LEFT JOIN wins wn ON wn.i = w.i
    JOIN games g ON g.i = w.i
    CROSS JOIN tot
    """
    return head + "," + ",".join(steps) + "," + tail


@register("preference_bradley_terry", oracle=_bt_oracle())
def preference_bradley_terry(spark, sf_dir):
    """Bradley-Terry preference-strength fitting (Hunter 2004 MM
    algorithm) — THE model behind RLHF preference data: given pairwise
    "A beat B" judgments, recover a latent strength per item (policy,
    annotator, model checkpoint) and a ranking. Run on a preference
    corpus before reward-model training, it surfaces degenerate
    comparisons (never-winning items, disconnected match graphs) and
    gives the baseline ranking a reward model must at least reproduce.

    The 100 TB design point is SUFFICIENT STATISTICS: the MM update needs
    only the m×m match-count matrix and the per-item win totals — one
    distributed groupBy over billions of preferences reduces to ≤ m²
    rows, and the O(m²) iterations run on that bounded, data-independent
    state (the same contract as ``quality_train_logreg``'s 3 weights —
    the collect is gated by algebra, not data size). Engine parity uses
    the exact-integer playbook: strengths live as int64 micro-units, each
    MM denominator term is floored to int64 BEFORE the (exact) sum, and
    the update is a single double division floored back — bit-identical
    across engines and partition orders; the oracle unrolls all 10
    iterations as CTE pairs.

    Preferences are synthesized in-plan from events (items = event_id
    mod 16 vs a shuffled opponent; the winner rule biases toward
    higher-indexed items so the fit recovers a real gradient), so the
    oracle re-derives the full pipeline from the raw table."""
    import math

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    i64 = F.col("event_id")
    a = (i64 % 16).cast("long")
    b = ((i64 * 31 + 7) % 16).cast("long")
    prefs = (
        e.select(
            a.alias("a"),
            b.alias("b"),
            ((i64 % (a + b + 2)) <= a).alias("win_a"),
        )
        .filter(F.col("a") != F.col("b"))
    )
    games = prefs.select(
        F.col("a").alias("i"), F.col("b").alias("j")
    ).unionAll(prefs.select(F.col("b").alias("i"), F.col("a").alias("j")))
    counts = games.groupBy("i", "j").agg(F.count(F.lit(1)).alias("n"))
    wins = (
        prefs.select(
            F.when(F.col("win_a"), F.col("a")).otherwise(F.col("b")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wins"))
    )
    # Sufficient statistics to the driver: ≤ items² rows by construction.
    cnt_rows = counts.collect()
    win_rows = {r["w"]: r["wins"] for r in wins.collect()}
    items = sorted({r["i"] for r in cnt_rows})
    n_ij = {(r["i"], r["j"]): r["n"] for r in cnt_rows}
    wm = {i: 1_000_000 for i in items}
    for _ in range(_BT_ITERS):
        s = {
            i: sum(
                math.floor(n * 1e9 / (wm[i] + wm[j]))
                for (ii, j), n in sorted(n_ij.items())
                if ii == i
            )
            for i in items
        }
        wm = {
            i: (
                math.floor(1e9 * win_rows.get(i, 0) / s[i] + 0.5)
                if s[i] > 0
                else wm[i]
            )
            for i in items
        }
    total = sum(wm.values())
    matches = {
        i: sum(n for (ii, _), n in n_ij.items() if ii == i) for i in items
    }
    order = sorted(items, key=lambda i: (-wm[i], i))
    rank = {}
    for pos, i in enumerate(order):
        rank[i] = (
            rank[order[pos - 1]]
            if pos and wm[i] == wm[order[pos - 1]]
            else pos + 1
        )
    rows = [
        (
            i,
            win_rows.get(i, 0),
            matches[i],
            wm[i],
            math.floor(wm[i] * (_BT_ITEMS * 1_000_000.0) / total + 0.5),
            rank[i],
        )
        for i in items
    ]
    return spark.createDataFrame(
        rows,
        "item long, wins long, matches long, strength_micro long, "
        "strength_norm_micro long, rank long",
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (zlib): invariants attestation
# ---------------------------------------------------------------------------

@register(
    "quality_compression_invariants",
    oracle="""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
           TRUE AS ok_const_floor, TRUE AS ok_repeat_window,
           TRUE AS ok_bounds
    FROM documents
    WHERE doc_id IS NOT NULL AND text IS NOT NULL AND length(text) >= 50
    """,
)
def quality_compression_invariants(spark, sf_dir):
    """zlib compression ratio — the information-density gate (templated
    or repetitive pages compress far better than prose; near-random
    noise barely compresses) used by Dolma/RefinedWeb-class pipelines.
    The compressed length is deterministic but not SQL-derivable, so
    this is the oracle-attested INVARIANTS face (the established
    ``ann_recall_floors`` pattern): for every document ≥ 50 chars the
    executor compresses the text, its self-concatenation, and an
    equal-length constant run, and the oracle states byte counts and the
    compression algebra that must hold —
      * ok_const_floor: a constant run never compresses worse than the
        real text (c_const ≤ c_orig);
      * ok_repeat_window: the second copy of text‖text is a window
        match, so c_repeat < 2·c_orig (catches a broken window/flush);
      * ok_bounds: 0 < c_orig ≤ n_bytes + 64 (zlib's stored-block
        expansion cap).
    The raw per-doc ratios are ``operators/quality.compression_ratios``
    — same Arrow pass, report form.

    Scale shape: map-only Arrow pass; one document in memory at a time,
    zero exchanges — scan-speed at 100 TB."""
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("ok_const_floor", BooleanType()),
            StructField("ok_repeat_window", BooleanType()),
            StructField("ok_bounds", BooleanType()),
        ]
    )

    def extract(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                raw = str(t).encode("utf-8")
                c_orig = len(zlib.compress(raw, 6))
                c_rep = len(zlib.compress(raw + raw, 6))
                c_const = len(zlib.compress(b"a" * len(raw), 6))
                out["doc_id"].append(i)
                out["n_bytes"].append(len(raw))
                out["ok_const_floor"].append(c_const <= c_orig)
                out["ok_repeat_window"].append(c_rep < 2 * c_orig)
                out["ok_bounds"].append(0 < c_orig <= len(raw) + 64)
            yield pd.DataFrame(out)

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents")
        .filter(
            F.col("doc_id").isNotNull()
            & F.col("text").isNotNull()
            & (F.length("text") >= 50)
        )
        .select("doc_id", "text")
    )
    return d.mapInPandas(extract, schema)


# ---------------------------------------------------------------------------
# Layout ops: partition-column advisor
# ---------------------------------------------------------------------------

_ADVISOR_CANDS = [
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("o_custkey", "o_custkey"),
    ("order_month", "substr(CAST(o_orderdate AS VARCHAR), 1, 7)"),
]


def _advisor_oracle() -> str:
    parts = []
    for name, expr in _ADVISOR_CANDS:
        parts.append(f"""
      SELECT '{name}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(floor(1e6 * MAX(n) / SUM(n) + 0.5) AS BIGINT)
               AS top1_share_micro
      FROM (SELECT {expr} AS v, COUNT(*) AS n FROM orders GROUP BY 1)""")
    stats = "\n      UNION ALL".join(parts)
    return f"""
    WITH stats AS ({stats}
    ),
    scored AS (
      SELECT column_name, n_distinct, top1_share_micro,
             (CASE WHEN n_distinct BETWEEN 8 AND 10000 THEN 500 ELSE 0 END)
             + CAST(floor(500 * (1000000 - top1_share_micro) / 1000000.0)
                    AS BIGINT) AS score_milli
      FROM stats
    )
    SELECT column_name, n_distinct, top1_share_micro, score_milli,
           RANK() OVER (ORDER BY score_milli DESC, column_name) = 1
             AS recommended
    FROM scored
    """


@register("layout_partition_advisor", oracle=_advisor_oracle())
def layout_partition_advisor(spark, sf_dir):
    """Partition-column advisor — the first question of laying out 100 TB
    as a partitioned table: which column balances partition COUNT (too
    few → no pruning; too many → small-file death, metastore blowup)
    against partition SKEW (one giant partition serializes every reader).
    Scores each candidate on cardinality-in-range [8, 10000] plus
    evenness (1 − top-partition share), integer milli-units, and flags
    the winner. The stats are exactly the aggregates a real advisor
    (or Iceberg's partition-stats file) maintains.

    Scale shape: one groupBy per candidate column over the fact table —
    each map-side combinable — then a 4-row union and rank; nothing
    corpus-sized past the first aggregation."""
    o = load_table(spark, sf_dir, "orders")
    frames = []
    for name, _ in _ADVISOR_CANDS:
        col = (
            F.substring(F.col("o_orderdate").cast("string"), 1, 7)
            if name == "order_month"
            else F.col(name)
        )
        g = o.groupBy(col.alias("v")).agg(F.count(F.lit(1)).alias("n"))
        frames.append(
            g.agg(
                F.lit(name).alias("column_name"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.floor(
                    F.lit(1e6) * F.max("n") / F.sum("n") + F.lit(0.5)
                )
                .cast("long")
                .alias("top1_share_micro"),
            )
        )
    stats = frames[0]
    for fr in frames[1:]:
        stats = stats.unionAll(fr)
    score = (
        F.when(F.col("n_distinct").between(8, 10000), F.lit(500))
        .otherwise(F.lit(0))
        + F.floor(
            F.lit(500) * (F.lit(1000000) - F.col("top1_share_micro"))
            / F.lit(1000000.0)
        ).cast("long")
    ).cast("long")
    from pyspark.sql import Window

    scored = stats.select(
        "column_name", "n_distinct", "top1_share_micro",
        score.alias("score_milli"),
    )
    w = Window.orderBy(F.desc("score_milli"), F.asc("column_name"))
    return scored.select(
        "*", (F.rank().over(w) == 1).alias("recommended")
    )


@register(
    "curation_epoch_schedule",
    oracle=r"""
    WITH n AS (
      SELECT source,
             CAST(SUM(len(list_filter(string_split_regex(trim(lower(text)),
                  '\s+'), t -> length(t) > 0))) AS BIGINT) AS n_tokens
      FROM documents
      WHERE source IS NOT NULL AND text IS NOT NULL AND length(text) > 0
      GROUP BY source
      HAVING n_tokens > 0
    ),
    s AS (
      SELECT source, n_tokens,
             CAST(floor(1e6 * sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
               AS s_micro
      FROM n
    ),
    tot AS (
      SELECT CAST(SUM(s_micro) AS BIGINT) AS w,
             CAST(SUM(n_tokens) AS BIGINT) AS nt
      FROM s
    )
    SELECT s.source, s.n_tokens,
           CAST(floor(2.0 * tot.nt * s.s_micro / tot.w) AS BIGINT) AS draws,
           CAST(floor(1000.0 * floor(2.0 * tot.nt * s.s_micro / tot.w)
                      / s.n_tokens) AS BIGINT) AS epochs_milli,
           floor(1000.0 * floor(2.0 * tot.nt * s.s_micro / tot.w)
                 / s.n_tokens) > 4000 AS over_repeat_cap
    FROM s CROSS JOIN tot
    """,
)
def curation_epoch_schedule(spark, sf_dir):
    """Epoch schedule under a token budget — the data-constrained-scaling
    decision (Muennighoff et al. 2023: value decays past ~4 repeats):
    given temperature-mixture weights (α = ½, the
    ``curation_mixture_weights`` rule) and a training budget of 2× the
    corpus token count, how many tokens are DRAWN from each source and
    how many EPOCHS of it does that imply? Sources whose schedule
    exceeds 4 epochs are flagged — those are the ones to de-weight or
    augment before training, and the flag is precisely what the repeat
    rule exists to catch (upsampled low-resource sources blow the cap
    first).

    Exactness: draws = ⌊B·sᵢ/W⌋ and epochs = ⌊1000·draws/nᵢ⌋ are single
    floored double divisions over exact integer aggregates — identical
    IEEE sequences both engines. Scale shape: identical to the mixture
    query — one combinable per-source aggregate, then |sources| rows."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
        & F.col("text").isNotNull()
        & (F.length("text") > 0)
    )
    toks = F.size(
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    )
    n = (
        d.groupBy("source")
        .agg(F.sum(toks.cast("long")).alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    s = n.select(
        "source",
        "n_tokens",
        F.floor(F.lit(1e6) * F.sqrt(F.col("n_tokens").cast("double")))
        .cast("long")
        .alias("s_micro"),
    )
    tot = s.agg(F.sum("s_micro").alias("w"), F.sum("n_tokens").alias("nt"))
    draws = F.floor(
        F.lit(2.0) * F.col("nt") * F.col("s_micro") / F.col("w")
    ).cast("long")
    epochs = F.floor(
        F.lit(1000.0) * draws.cast("double") / F.col("n_tokens")
    ).cast("long")
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        draws.alias("draws"),
        epochs.alias("epochs_milli"),
        (epochs > 4000).alias("over_repeat_cap"),
    )
