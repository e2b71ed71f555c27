"""Web-address Column functions — URL canonicalization for crawl-scale
dedup. The first dedup pass over a web corpus is by URL, and raw crawl
URLs carry case noise, default ports, tracking parameters, and fragments
that make byte-equality useless; canonicalization collapses those
equivalence classes BEFORE any fetch/join, for free (pure whole-stage
codegen — regexp + array HOFs, no UDF, scan speed at 100 TB).

Rules (the common subset of RFC 3986 §6 normalization and what crawl
pipelines actually apply):
  * scheme and host lowercased (path/query case is significant, kept);
  * default ports stripped (``:80`` for http, ``:443`` for https);
  * fragment dropped (never sent to the server);
  * tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``);
  * remaining query parameters sorted (order is almost never semantic);
  * empty path normalized to ``/``.

Reference parity note: /root/reference has no URL handling; this serves
SURVEY.md §2.9 [EXT] (training-data pipeline operations).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring).
    Pure Column expression — composes into any scan."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_replace(url, r"^[^:/?#]+://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("fbclid=")
        & ~p.startswith("gclid="),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def url_host(url: Column) -> Column:
    """Lowercased host (port stripped) of an absolute URL. Pure Column
    expression."""
    hostport = F.lower(F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1))
    return F.regexp_replace(hostport, r":\d+$", "")


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of a host — the registrable domain under the
    common public-suffix approximation (example.com for
    cdn.static.example.com). A real deployment swaps in the Public
    Suffix List (a ~10k-rule broadcast dim); the two-label rule is the
    deterministic, oracle-expressible core with the same plan shape."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n <= 2, host
    ).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )
