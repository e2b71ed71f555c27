"""PII detection/redaction column functions — the scrubbing pass of a
training-data pipeline. RE2-compatible patterns only (no backrefs or
lookahead) so the exact same regexes run in Spark (Java regex), DuckDB
(RE2), and any other engine auditing the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
# 8+ digit runs allowing separators, anchored on digits at both ends.
PHONE_RE = r"\+?[0-9][0-9 ().-]{6,}[0-9]"

_PATTERNS = (("EMAIL", EMAIL_RE), ("URL", URL_RE), ("PHONE", PHONE_RE))


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (for corpus PII audits / routing docs to
    review)."""
    return {
        kind.lower(): F.size(F.regexp_extract_all(text, F.lit(pattern), 0))
        for kind, pattern in _PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every email/URL/phone with a typed placeholder. Order
    matters: URLs first (they may embed @ and digit runs), then emails,
    then phones."""
    out = F.regexp_replace(text, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")
