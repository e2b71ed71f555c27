"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — SURVEY.md §2.9
[EXT]: the vocabulary-construction step of an LLM data pipeline, learned
from the corpus itself.

The classic algorithm iterates on the WORD-FREQUENCY table, not the
corpus: after one ``groupBy(word)`` over the token stream (the only
corpus-sized shuffle), every merge round touches a vocabulary-sized
relation — millions of rows at 100 TB, not billions. Each round is:

  adjacent-pair counts (explode + hash agg, weighted by word freq)
  → argmax pair (freq DESC, then lexicographic — deterministic)
  → apply the merge to every word (map-only string replace)

The word's symbol sequence is encoded engine-portably as a separator-
framed string: ``SEP s1 SEP SEP s2 SEP … SEP sn SEP`` (SEP = U+001F,
outside any sane corpus alphabet). Applying merge (a, b) is then exactly
``replace(repr, SEP a SEP SEP b SEP, SEP a b SEP)`` — and both Spark's
``replace`` and DuckDB's ``replace`` scan left-to-right over the
original string without rescanning replacements, which reproduces
greedy BPE merge semantics including the overlapping-run case
("aaa" + merge(a,a) → "aa","a"). That makes the whole training loop
expressible in BOTH engines, so the registered query is oracle-EXACT —
rare for an iterative algorithm (cf. graph_pagerank's unrolled oracle).

Driver state is bounded at the algorithm's constants: the per-round
argmax is ONE collected row (the ``quality_train_logreg`` convention —
algorithm-intrinsic scalars, never data), so each round is exactly one
Spark job (the pair-count TakeOrdered) and the chosen merge folds back
into the next round's plan as literal strings. The r8 formulation
instead kept the argmax distributed (1-row crossJoin-broadcast) with
TWO eager localCheckpoints per round — 16 extra jobs and 8 vocab
materializations whose fixed cost dominated the sf0.1 bench
(optimization guide §1.2: remove passes before tuning per-task work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
_SEP2 = SEP + SEP


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-lowercase tokens — the one
    corpus-sized aggregation."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_repr(word_col) -> F.Column:
    chars = F.regexp_extract_all(word_col, F.lit("."), 0)
    return F.concat(F.lit(SEP), F.array_join(chars, _SEP2), F.lit(SEP))


def _symbols(repr_col) -> F.Column:
    return F.split(
        F.substring(repr_col, 2, F.length(repr_col) - 2), _SEP2
    )


def bpe_train_local(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    wf: DataFrame | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; return them as a bounded python list
    [(rank, left_sym, right_sym, freq)]. The per-round argmax is ONE
    collected row (bounded, algorithm-intrinsic driver state — the
    ``quality_train_logreg`` convention), so each round costs exactly one
    Spark job: the pair-count TakeOrderedAndProject over the checkpointed
    word table with the already-chosen merges applied as a chained
    literal ``replace`` (map-only, identical composition to the oracle's
    materialized w0→w1→… CTEs — replace is a deterministic function, so
    chaining == re-materializing). Deterministic ties as before
    (freq DESC, then lexicographic on codepoints — both engines agree).

    ``wf`` lets callers share one checkpointed (word, freq) table between
    training and the encode pass (saves a corpus-sized aggregation)."""
    if wf is None:
        wf = word_freq_table(docs, text_col).localCheckpoint(eager=True)
    w = wf.select(_initial_repr(F.col("word")).alias("repr"), "freq")
    merges: list[tuple[int, str, str, int]] = []
    expr = F.col("repr")

    def adjacent_pairs(syms):
        # ``syms`` MUST be a let-bound lambda variable here: a direct
        # reference to the split(substring(replace-chain)) tree inside
        # the transform lambda re-evaluates that whole tree once PER
        # ELEMENT (HOF lambdas are interpreted and nothing hoists the
        # subexpression) — O(n²) per word, hours on a single 50k-char
        # token (caught by test_empty_input's adversarial fixture).
        return F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("a"),
                    F.element_at(syms, i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))

    from .dedup import let_col

    for r in range(n_merges):
        pairs = let_col(_symbols(expr), adjacent_pairs)
        pc = (
            w.select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        rows = pc.orderBy(F.desc("pair_freq"), "a", "b").limit(1).collect()
        if not rows:
            # Merge exhaustion (or empty corpus): no pair left anywhere.
            # Matches the oracle, whose b_r CTE is empty from here on.
            break
        a, b, pf = rows[0]["a"], rows[0]["b"], int(rows[0]["pair_freq"])
        merges.append((r + 1, a, b, pf))
        expr = F.replace(
            expr,
            F.lit(SEP + a + _SEP2 + b + SEP),
            F.lit(SEP + a + b + SEP),
        )
    return merges


def bpe_train(docs: DataFrame, n_merges: int = 8, text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    (rank, left_sym, right_sym, freq): the merge table in learned order,
    where ``freq`` is the pair's weighted count at the time it was
    chosen. Deterministic: ties broken lexicographically on (left,
    right), and string order is codepoint order in both engines."""
    merges = bpe_train_local(docs, n_merges, text_col)
    return docs.sparkSession.createDataFrame(
        merges, "rank int, left_sym string, right_sym string, freq long"
    )


def bpe_train_py(word_freqs: dict[str, int], n_merges: int = 8):
    """Pure-Python reference (independent of the string encoding): words
    as symbol tuples, greedy left-to-right merge. Used by tests to pin
    the distributed implementation's semantics."""
    words = {tuple(w): f for w, f in word_freqs.items() if w}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), f = best
        merges.append((rank, a, b, f))
        new_words: dict[tuple, int] = {}
        for syms, fr in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + fr
        words = new_words
    return merges


def bpe_oracle_sql(n_merges: int = 8) -> str:
    """DuckDB twin of ``bpe_train`` — the merge loop unrolled into CTE
    rounds with the identical repr encoding, pair argmax, and replace."""
    sep = "chr(31)"
    sep2 = f"{sep}||{sep}"
    parts = [
        f"""
    w0 AS (
      SELECT {sep} || array_to_string(regexp_extract_all(word, '.'), {sep2}) || {sep} AS repr,
             freq
      FROM (
        SELECT word, COUNT(*) AS freq
        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
              FROM documents WHERE text IS NOT NULL)
        WHERE length(word) > 0
        GROUP BY word
      )
    )"""
    ]
    for r in range(n_merges):
        parts.append(
            f"""
    s{r} AS (
      SELECT string_split(substr(repr, 2, length(repr) - 2), {sep2}) AS syms, freq
      FROM w{r}
    ),
    p{r} AS (
      SELECT syms[i] AS a, syms[i + 1] AS b, SUM(freq) AS pair_freq
      FROM s{r}, unnest(generate_series(1, greatest(len(syms) - 1, 0))) AS t(i)
      GROUP BY 1, 2
    ),
    b{r} AS (SELECT a, b, pair_freq FROM p{r} ORDER BY pair_freq DESC, a, b LIMIT 1),
    w{r + 1} AS (
      SELECT replace(repr, {sep}||a||{sep2}||b||{sep}, {sep}||a||b||{sep}) AS repr, freq
      FROM w{r}, b{r}
    )"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT {r + 1} AS rank, a, b, pair_freq FROM b{r}" for r in range(n_merges)
    )
    return f"""
    WITH {",".join(parts)}
    SELECT rank, a AS left_sym, b AS right_sym, CAST(pair_freq AS BIGINT) AS freq
    FROM ({union})
    """


def _merges_as_list(merges) -> list[tuple[int, str, str]]:
    """Normalize a merge table (bounded python list or the ≤n_merges-row
    DataFrame ``bpe_train`` returns) to [(rank, left, right)]."""
    if isinstance(merges, DataFrame):
        return [
            (r["rank"], r["left_sym"], r["right_sym"])
            for r in merges.orderBy("rank").collect()
        ]
    return [(m[0], m[1], m[2]) for m in merges]


def bpe_word_lengths(
    docs: DataFrame,
    merges,
    n_merges: int = 8,
    text_col: str = "text",
    wf: DataFrame | None = None,
) -> DataFrame:
    """(word, n_bpe_word) for every DISTINCT corpus word under a learned
    merge table — the vocabulary-sized encode pass shared by
    ``bpe_encode_lengths`` and the fertility report. Merge application is
    the same portable string replace as training, chained in rank order
    as literal strings (the merge table is ≤ n_merges rows by
    construction — bounded, so inlining it is the broadcast-join's
    degenerate case with zero exchanges). ``merges`` may be the bounded
    list from ``bpe_train_local`` or the DataFrame from ``bpe_train``."""
    ms = _merges_as_list(merges)
    by_rank = {r: (a, b) for r, a, b in ms}
    if wf is None:
        wf = word_freq_table(docs, text_col)
    enc = wf.select("word", _initial_repr(F.col("word")).alias("repr"))
    expr = F.col("repr")
    for r in range(1, n_merges + 1):
        if r not in by_rank:
            # Exhausted merge table: rank r is EMPTY, and the r8 crossJoin
            # formulation (like the oracle's CROSS JOIN over an empty b_r)
            # produced an empty relation — preserve that contract.
            return enc.sparkSession.createDataFrame(
                [], "word string, n_bpe_word int"
            )
        a, b = by_rank[r]
        expr = F.replace(
            expr,
            F.lit(SEP + a + _SEP2 + b + SEP),
            F.lit(SEP + a + b + SEP),
        )
    return enc.select("word", F.size(_symbols(expr)).alias("n_bpe_word"))


def bpe_encode_lengths(
    docs: DataFrame,
    merges,
    n_merges: int = 8,
    text_col: str = "text",
    wf: DataFrame | None = None,
) -> DataFrame:
    """Apply a learned merge table to the corpus and report per-document
    BPE token counts next to whitespace token counts (the number packing
    and token-budget planning actually need). Each DISTINCT word is
    encoded once (vocabulary-sized work), then the per-doc counts come
    from a broadcast join of the word→length map onto the exploded token
    stream — the corpus never carries symbol strings through a shuffle."""
    word_lens = bpe_word_lengths(docs, merges, n_merges, text_col, wf=wf)
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word"),
    ).filter(F.length("word") > 0)
    # Hint-free: the word->length map is VOCABULARY-sized — sublinear in
    # the corpus but unbounded at 100 TB of web text, so a forced
    # broadcast is a driver OOM there. AQE broadcasts while it fits
    # (repo rule: hints only on provably bounded sides, commit c2b4492).
    return (
        words.join(word_lens, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ws_tokens"),
            F.sum("n_bpe_word").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_ws_tokens",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens") / F.col("n_ws_tokens").cast("double"), 6
            ).alias("bpe_ratio"),
        )
    )


def bpe_encode_oracle_sql(n_merges: int = 8) -> str:
    """DuckDB twin: trains the same merges (unrolled CTEs from
    ``bpe_oracle_sql``) then applies them to every distinct word and
    aggregates per document."""
    sep = "chr(31)"
    sep2 = f"{sep}||{sep}"
    base = bpe_oracle_sql(n_merges)
    # reuse the WITH-block of the training oracle, swap the final SELECT
    with_block = base.split("SELECT rank,")[0].rstrip().rstrip(",")
    expr = "repr"
    aliases = ", ".join(f"b{r} m{r}" for r in range(n_merges))
    for r in range(n_merges):
        s = f"{sep}||m{r}.a||{sep2}||m{r}.b||{sep}"
        t = f"{sep}||m{r}.a||m{r}.b||{sep}"
        expr = f"replace({expr}, {s}, {t})"
    return f"""{with_block},
    vocab AS (
      SELECT word, {sep} || array_to_string(regexp_extract_all(word, '.'), {sep2}) || {sep} AS repr
      FROM (
        SELECT DISTINCT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents WHERE text IS NOT NULL
      ) WHERE length(word) > 0
    ),
    enc AS (
      SELECT word,
             len(string_split(substr(f, 2, length(f) - 2), {sep2})) AS n_bpe_word
      FROM (SELECT word, {expr} AS f FROM vocab, {aliases})
    ),
    dw AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           COUNT(*) AS n_ws_tokens,
           CAST(SUM(n_bpe_word) AS BIGINT) AS n_bpe_tokens,
           ROUND(SUM(n_bpe_word) / CAST(COUNT(*) AS DOUBLE), 6) AS bpe_ratio
    FROM dw JOIN enc USING (word)
    WHERE length(word) > 0
    GROUP BY doc_id
    """


def bpe_fertility_oracle_sql(n_merges: int = 8) -> str:
    """DuckDB twin of the per-source fertility report: trains the same
    merges (unrolled CTEs), encodes the vocabulary once, then rolls the
    exploded token stream up by source with tokens-per-word and
    chars-per-token."""
    sep = "chr(31)"
    sep2 = f"{sep}||{sep}"
    base = bpe_encode_oracle_sql(n_merges)
    # reuse everything up to the per-doc rollup; swap stream + final SELECT
    with_block = base.split("dw AS (")[0].rstrip().rstrip(",")
    return f"""{with_block},
    dw AS (
      SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
      FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           COUNT(*) AS n_words,
           CAST(SUM(n_bpe_word) AS BIGINT) AS n_bpe_tokens,
           ROUND(SUM(length(word)) / CAST(SUM(n_bpe_word) AS DOUBLE), 6) AS chars_per_token,
           ROUND(SUM(n_bpe_word) / CAST(COUNT(*) AS DOUBLE), 6) AS fertility
    FROM dw JOIN enc USING (word)
    WHERE length(word) > 0
    GROUP BY source
    """
