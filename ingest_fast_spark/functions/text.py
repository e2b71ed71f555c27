"""Text-analysis column functions for LLM-data pipelines (SURVEY.md §2.9).

All JVM-side Column expressions (split/filter/length/regexp) — token
counting, quality ratios, stopword-based language scoring, and content
fingerprints. Designed so the same logic is expressible in ANSI SQL for
the DuckDB oracle (see queries/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately small and fixed: the heuristic must be
# reproducible in SQL, not maximally accurate.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "los", "que", "y", "es", "un"],
    "fr": ["le", "la", "les", "et", "est", "une", "des"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: alpha runs and digit runs count separately,
    a cheap BPE proxy (RE2-compatible regexp, engine-portable)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit("[a-z]+|[0-9]+"), 0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    toks = tokens(text)
    return F.round(
        F.size(F.filter(toks, lambda t: t.isin(*words))) / F.size(toks), 6
    )


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    return F.round(
        F.length(F.regexp_replace(F.trim(text), r"\s+", "")) / F.size(toks), 6
    )


def non_alnum_ratio(text: Column) -> Column:
    """Punctuation/noise ratio: share of characters that are not
    alphanumeric or whitespace."""
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
    return F.round(F.length(stripped) / F.greatest(F.length(text), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize very short docs, noise
    chars, and low vocabulary diversity. Fixed weights, SQL-portable."""
    len_score = F.least(F.size(tokens(text)) / F.lit(50.0), F.lit(1.0))
    noise_penalty = F.lit(1.0) - non_alnum_ratio(text)
    diversity = distinct_token_count(text) / token_count(text)
    return F.round((len_score + noise_penalty + diversity) / 3.0, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_ratio(text, lang) for lang in STOPWORDS}


def predicted_lang(text: Column) -> Column:
    """Argmax over stopword scores with deterministic tiebreak (language
    code order); 'und' (undetermined) when every score is zero."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out = F.when(best <= 0, F.lit("und"))
    for lang in sorted(scores):  # alphabetical => deterministic tiebreak
        out = out.when(scores[lang] == best, F.lit(lang))
    return out


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the sorted distinct token set — robust
    to word order, the classic 'bag fingerprint'."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def html_escape(text: Column) -> Column:
    """Minimal HTML entity escaping (&, <, > — ampersand first so the
    later entities survive). Column-only: used to SYNTHESIZE deterministic
    HTML payloads for the extraction round-trip attestation."""
    out = F.regexp_replace(text, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def html_main_text(html: Column) -> Column:
    """Main-text extraction from an HTML page — the first ETL step of any
    web-crawl corpus (the trafilatura/jusText problem, restricted to the
    deterministic core): drop <script>/<style> subtrees, keep only
    paragraph (<p>) content, strip residual inline tags, decode the five
    predefined XML entities, and collapse whitespace. Entirely JVM-side
    Column expressions (regexp_extract_all + regexp_replace chain) — no
    UDF, so the extraction runs inside whole-stage codegen at scan speed.

    Boilerplate OUTSIDE paragraph tags (nav, footer, headers, ads) is
    dropped by construction — the paragraph-only rule is the simplest
    density heuristic and the reason the round-trip query can assert
    exact recovery of the original text."""
    no_scripts = F.regexp_replace(
        html, r"(?s)<(script|style)[^>]*>.*?</\1>", " "
    )
    paras = F.array_join(
        F.regexp_extract_all(no_scripts, F.lit(r"(?s)<p\b[^>]*>(.*?)</p>"), 1),
        " ",
    )
    flat = F.regexp_replace(paras, r"<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", "\""),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes in two honest steps
    ):
        flat = F.regexp_replace(flat, ent, ch)
    return F.trim(F.regexp_replace(flat, r"\s+", " "))


# UTF-8 bytes mis-decoded as cp1252 ("mojibake") — the single most common
# encoding defect in web crawls (the core of what ftfy repairs). The pair
# table is COMPUTED from the codec round-trip, not hand-typed, so every
# entry is correct by construction; characters whose corrupted form
# contains an invisible cp1252 byte (soft hyphen, NBSP) are excluded to
# keep the table printable and the SQL oracle literal-safe.
_MOJIBAKE_CHARS = "éäöüñçèêóúâîôûëïÉ’‘“–—…€°±×½"
MOJIBAKE_PAIRS: list[tuple[str, str]] = sorted(
    (
        (c.encode("utf-8").decode("cp1252"), c)
        for c in _MOJIBAKE_CHARS
        if all(ch.isprintable() for ch in c.encode("utf-8").decode("cp1252"))
    ),
    key=lambda p: -len(p[0]),  # longest corrupted form first: 'â€™' before 'Ã¢'
)


def fix_mojibake(text: Column) -> Column:
    """Repair cp1252-mojibake (ftfy's core case) with a chain of LITERAL
    replaces — JVM-side, codegen-friendly, no UDF. Longest corrupted
    sequences substitute first so multi-byte forms never get split by a
    shorter prefix rule."""
    out = text
    for bad, good in MOJIBAKE_PAIRS:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def mojibake_sql(expr: str) -> str:
    """The DuckDB twin of ``fix_mojibake`` — same pair table, same order."""
    out = expr
    for bad, good in MOJIBAKE_PAIRS:
        out = f"replace({out}, '{bad}', '{good}')"
    return out


# --- Unicode hygiene -------------------------------------------------------
#
# Web corpora mix composed and decomposed codepoint sequences for the same
# visible text ("café" as 4 or 5 codepoints), which silently breaks exact
# dedup, shingling, and tokenization; and adversarial/spam text swaps
# Latin letters for Cyrillic/Greek homoglyphs to dodge filters. NFC
# normalization + homoglyph folding is the standard hygiene pass.

# 1:1 confusable fold: Cyrillic and Greek letters that render identically
# to ASCII (Unicode TR39 subset). Both strings MUST stay codepoint-aligned;
# the same pair feeds Spark's translate and DuckDB's translate, so the
# oracle re-derives the identical fold.
HOMOGLYPH_SRC = "аеорсхуіѕјАЕОРСХВТМКНοΟ"
HOMOGLYPH_DST = "aeopcxyisjAEOPCXBTMKHoO"


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization as an Arrow-vectorized pandas UDF (Spark
    has no NFC builtin; pandas `str.normalize` is the vectorized path —
    C-level ICU-equivalent via Python's unicodedata). The DuckDB oracle
    twin is the built-in ``nfc_normalize``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        return s.str.normalize("NFC")

    # explicit (non-string) annotations: `from __future__ import
    # annotations` would stringify inline hints and Spark's resolver
    # cannot see this function's locals
    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_nfc, "string")(col)


def scrub_homoglyphs(col: Column) -> Column:
    """Fold visually-identical Cyrillic/Greek letters onto their ASCII
    lookalikes — pure-codegen ``translate`` (1:1 codepoint map)."""
    return F.translate(col, HOMOGLYPH_SRC, HOMOGLYPH_DST)
