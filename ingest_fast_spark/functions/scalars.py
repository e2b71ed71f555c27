"""Scalar column functions (SURVEY.md §2.3, F1-F5).

Everything here is a Catalyst ``Column`` expression — JVM-side, codegen'd,
usable inside whole-stage codegen — never a row-at-a-time Python UDF. A
pure-Python twin (``*_py``) exists for unit parity tests against the
reference's golden cases (reference test/fast_parse.test.js:15-80).

Reference parity notes:
  F1 fast id       — reference lib/fast_parse.js:23  (parseInt after split)
  F2 NT literal    — reference lib/fast_parse.js:31  (N3Util.getLiteralValue)
  F3 last segment  — reference lib/ingest.js:220,224 (url.split('/').pop())
  F4 normalize     — reference lib/fast_parse.js:37  (normalizeAndDiacritics;
                     behavior pinned by test/fast_parse.test.js:50-72 goldens)
  F5 singularize   — reference lib/fast_parse.js:37  (utils.singularize; the
                     reference tests pin no plural case, so we define a
                     deterministic regexp rule set, documented below)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Diacritic folding table (latin accents → ascii). Kept as a translate()
# pair so folding stays JVM-side (no Python UDF in the hot path). Generated
# from NFKD decompositions over the latin-1 supplement + latin extended
# blocks, so it agrees with unicodedata-based folding on those ranges.
import unicodedata as _ud


def _build_accent_table() -> tuple[str, str]:
    src, dst = [], []
    for code in range(0x00C0, 0x0250):
        ch = chr(code)
        decomp = _ud.normalize("NFKD", ch)
        base = decomp[0]
        if base != ch and ("a" <= base <= "z" or "A" <= base <= "Z"):
            src.append(ch)
            dst.append(base)
    return "".join(src), "".join(dst)


_ACCENT_SRC, _ACCENT_DST = _build_accent_table()

# Word-level singularization rules (F5), applied to the already-normalized
# (lowercase, punctuation-free) string:
#   1. '...ies'  -> '...y'   (berries -> berry)
#   2. trailing 's' dropped for words >=4 chars not ending in 'ss'
# These are regexp-expressible so the same semantics run in Spark (Java
# regex) and in the DuckDB oracle SQL (RE2) — only the replacement syntax
# differs ($1 vs \1).
_SING_IES_PATTERN = r"\b([a-z0-9]{2,})ies\b"
_SING_S_PATTERN = r"\b([a-z0-9]{2,}[a-rt-z0-9])s\b"


def fast_id(subject: Column) -> Column:
    """F1 — extract the numeric FAST id from a subject URI, NULL if absent."""
    extracted = F.regexp_extract(subject, r"/fast/([0-9]+)", 1)
    return F.when(extracted != "", extracted.cast("long"))


def nt_literal(obj: Column) -> Column:
    """F2 — literal value of an NT object term: strips the quoting and any
    ``@lang`` / ``^^<type>`` suffix, and unescapes NT string escapes."""
    raw = F.regexp_extract(obj, r'^"(.*)"', 1)
    # NT escape sequences, innermost-first so '\\"' resolves correctly.
    raw = F.regexp_replace(raw, r'\\"', '"')
    raw = F.regexp_replace(raw, r"\\n", "\n")
    raw = F.regexp_replace(raw, r"\\t", "\t")
    raw = F.regexp_replace(raw, r"\\r", "\r")
    raw = F.regexp_replace(raw, r"\\\\", "\\\\")
    return raw


def last_segment(url: Column) -> Column:
    """F3 — last path segment of a URI (``.../viaf/143214773`` → ``143214773``)."""
    return F.element_at(F.split(url, "/"), -1)


def fold_accents(s: Column) -> Column:
    return F.translate(s, _ACCENT_SRC, _ACCENT_DST)


def normalize_label(s: Column) -> Column:
    """F4 — lowercase, fold diacritics, strip punctuation, collapse spaces.

    Pinned by the reference goldens, e.g.
    ``"Fiesta San Antonio (San Antonio, Tex.)"`` →
    ``"fiesta san antonio san antonio tex"``
    (reference test/fast_parse.test.js:59-62).
    """
    out = fold_accents(F.lower(s))
    out = F.regexp_replace(out, r"[^a-z0-9]+", " ")
    return F.trim(out)


def singularize_words(s: Column) -> Column:
    """F5 — deterministic word-level singularization (rules in header)."""
    out = F.regexp_replace(s, _SING_IES_PATTERN, "$1y")
    return F.regexp_replace(out, _SING_S_PATTERN, "$1")


def normalize_and_singularize(s: Column) -> Column:
    """F4+F5 composed, as the reference applies them
    (reference lib/fast_parse.js:37,48)."""
    return singularize_words(normalize_label(s))


# ---------------------------------------------------------------------------
# Pure-Python twins — used by unit tests (and anywhere a driver-side value is
# needed); semantics must stay identical to the Column versions above.
# ---------------------------------------------------------------------------

import re as _re

_ACCENT_MAP = str.maketrans(_ACCENT_SRC, _ACCENT_DST)
_SING_IES_RE = _re.compile(_SING_IES_PATTERN)
_SING_S_RE = _re.compile(_SING_S_PATTERN)


def normalize_label_py(s: str) -> str:
    out = s.lower().translate(_ACCENT_MAP)
    out = _re.sub(r"[^a-z0-9]+", " ", out)
    return out.strip()


def singularize_words_py(s: str) -> str:
    out = _SING_IES_RE.sub(r"\1y", s)
    return _SING_S_RE.sub(r"\1", out)


def normalize_and_singularize_py(s: str) -> str:
    return singularize_words_py(normalize_label_py(s))


# --- Literal-array builders (construction-time lever) -----------------------
#
# Building an n-element literal array as F.array(*[F.lit(x) ...]) costs one
# py4j round-trip PER ELEMENT on the driver — measured 1.3 s for a 32x64
# double matrix, all inside the per-run timed region (query construction
# happens per bench invocation). Rendering the same values into ONE SQL
# string and parsing it JVM-side costs ~5 ms and yields bit-identical
# doubles: Python's repr is the shortest round-trip representation and
# Spark's parser reads it back to the nearest (same) IEEE double.


def _double_sql(x) -> str:
    if x is None:
        return "CAST(NULL AS DOUBLE)"
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def lit_doubles(xs) -> Column:
    """``array<double>`` literal column from a Python iterable, built with
    one JVM parse instead of one py4j call per element."""
    return F.expr("array(" + ",".join(_double_sql(x) for x in xs) + ")")


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal column (one JVM parse)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_double_sql(x) for x in row) + ")" for row in rows
        )
        + ")"
    )


def lit_longs(xs) -> Column:
    """``array<bigint>`` literal column (one JVM parse)."""
    return F.expr(
        "array(" + ",".join("CAST(NULL AS BIGINT)" if x is None else f"{int(x)}L" for x in xs) + ")"
    )
