"""WARC (ISO 28500) source tests: record framing round-trips in both
storage layouts (plain concatenated, per-record gzip members), the HTTP
response status/body split, honest truncation/garbage gates, and the
Spark mapInPandas operator path."""

import pytest

from ingest_fast_spark.sources.warc import (
    extract_warc_records,
    make_warc,
    parse_warc_records,
)

RECS = [
    {"rec_type": "warcinfo", "content": "software: test\r\n"},
    {
        "rec_type": "response",
        "target_uri": "http://example.com/a",
        "http_status": 200,
        "content": "héllo wörld ✓",
    },
    {
        "rec_type": "response",
        "target_uri": "http://example.com/b",
        "http_status": 404,
        "content": b"\xff\xfe\x00binary",  # not UTF-8: text comes back NULL
    },
    {"rec_type": "metadata", "target_uri": "http://example.com/a",
     "content": "via: x"},
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip_both_layouts(gz):
    out = parse_warc_records(make_warc(RECS, gzip_members=gz))
    assert [r["rec_type"] for r in out] == [
        "warcinfo", "response", "response", "metadata",
    ]
    assert out[0]["target_uri"] is None and out[0]["http_status"] is None
    assert out[1]["http_status"] == 200
    assert out[1]["content"] == "héllo wörld ✓"
    assert out[1]["n_bytes"] == len("héllo wörld ✓".encode())
    assert out[2]["http_status"] == 404
    assert out[2]["content"] is None  # binary body: NULL text, real n_bytes
    assert out[2]["n_bytes"] == len(b"\xff\xfe\x00binary")
    assert out[3]["content"] == "via: x"


def test_warc_truncation_and_garbage_raise():
    w = make_warc(RECS)
    for cut in (5, len(w) // 3, len(w) // 2, len(w) - 2):
        with pytest.raises(ValueError):
            parse_warc_records(w[:cut])
    with pytest.raises(ValueError, match="WARC"):
        parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")
    # a truncated gzip member is caught by the inflater
    gz = make_warc(RECS, gzip_members=True)
    with pytest.raises(ValueError, match="gzip|WARC"):
        parse_warc_records(gz[: len(gz) - 4])
    # Content-Length lies short -> separator check catches the misframe
    bad = make_warc([{"rec_type": "metadata", "content": "0123456789"}])
    bad = bad.replace(b"Content-Length: 10", b"Content-Length: 07")
    with pytest.raises(ValueError):
        parse_warc_records(bad)


def test_warc_spark_operator(spark):
    from ingest_fast_spark.operators import multimodal as M

    rows = [
        (1, make_warc(RECS), "application/warc", "{}"),
        (2, make_warc(RECS, gzip_members=True), "application/warc", "{}"),
        (3, None, "application/warc", "{}"),
    ]
    df = spark.createDataFrame(rows, M.PAYLOAD_SCHEMA)
    got = extract_warc_records(df).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == len(by_doc[2]) == 4
    assert by_doc[3][0]["rec_type"] is None  # NULL payload stays a visible row
    resp = [r for r in by_doc[2] if r["rec_type"] == "response"]
    assert {r["http_status"] for r in resp} == {200, 404}


def test_url_canonicalize_edges_and_pure_codegen(spark):
    """canonicalize_url unit edges: default vs explicit vs absent port,
    tracking-only query collapses to no '?', empty path -> '/', path case
    preserved, fragment dropped — and the expression stays whole-stage
    codegen (no Python eval node in the plan)."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.functions.web import canonicalize_url

    cases = [
        ("HTTP://WWW.X.COM:80/A/b?z=1&a=2#f", "http://www.x.com/A/b?a=2&z=1"),
        ("https://x.com:443", "https://x.com/"),
        ("https://x.com:8080/p", "https://x.com:8080/p"),
        ("http://X.com/p?utm_source=a&utm_medium=b", "http://x.com/p"),
        ("http://x.com/p?fbclid=1&gclid=2&k=v", "http://x.com/p?k=v"),
        ("http://x.com/?", "http://x.com/"),
        ("HTTPS://x.com/UPPER/Case?B=2&a=1", "https://x.com/UPPER/Case?B=2&a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string").select(
        "url", canonicalize_url(F.col("url")).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = {r["url"]: r["c"] for r in df.collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_unicode_normalize_and_homoglyphs(spark):
    """NFC normalization (pandas UDF) composes decomposed sequences;
    homoglyph scrub folds Cyrillic/Greek confusables; NULLs pass through."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.functions.text import nfc_normalize, scrub_homoglyphs

    rows = [
        ("Cafe\u0301",),  # NFD: e + combining acute
        ("аpple pаge",),  # Cyrillic а
        ("οk Ο",),    # Greek omicron lower+upper
        (None,),
    ]
    df = spark.createDataFrame(rows, "t string").select(
        "t",
        nfc_normalize(F.col("t")).alias("nfc"),
        scrub_homoglyphs(F.col("t")).alias("scrub"),
    )
    got = df.collect()
    assert got[0]["nfc"] == "Caf\u00e9" and len(got[0]["nfc"]) == 4 and len(got[0]["t"]) == 5
    assert got[1]["scrub"] == "apple page"
    assert got[2]["scrub"] == "ok O"
    assert got[3]["nfc"] is None and got[3]["scrub"] is None


def test_url_filter_precedence_and_broadcast(spark, sf_dir):
    """Domain blocklist must win over soft words; the blocklist join must
    broadcast (never a shuffle for a 2-row — or 4M-row — dim); host and
    registered-domain extraction handle subdomains and ports."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.functions.web import registered_domain, url_host
    from ingest_fast_spark.queries.llm import web_url_filter

    df = spark.createDataFrame(
        [("https://CDN.Static.Example1.COM:8443/casino/x",)], "url string"
    ).select(
        url_host(F.col("url")).alias("h"),
        registered_domain(url_host(F.col("url"))).alias("rd"),
    )
    row = df.collect()[0]
    assert row["h"] == "cdn.static.example1.com"
    assert row["rd"] == "example1.com"

    out = web_url_filter(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 1: example1.com (blocked domain) AND 'casino' path — domain wins.
    assert rows[1]["verdict"] == "blocked_domain"
    assert rows[1]["soft_score"] == 10
    # doc 8: example1.com blocked regardless of benign path.
    assert rows[8]["verdict"] == "blocked_domain"
    # doc 16: example2.com + 'casino' -> softwords; doc 10: keep.
    assert rows[16]["verdict"] == "blocked_softwords"
    assert rows[10]["verdict"] == "keep"


def test_robots_longest_match_precedence(spark, sf_dir):
    """RFC 9309: longest match wins, Allow beats Disallow on ties; no
    match = allowed; other user-agent groups never leak into the *
    group. The /casino/vip carve-out inside a Disallow /casino domain is
    the both-ways probe."""
    from ingest_fast_spark.queries.llm import web_robots_rules

    rows = {r["doc_id"]: r for r in web_robots_rules(spark, sf_dir).collect()}
    for i, r in rows.items():
        k, m = i % 7, i % 5
        if k in (0, 3, 6):
            assert r["n_star_rules"] == 2
            if m == 1:  # /casino/... blocked by Disallow /casino
                assert not r["allowed"] and r["matched_rule"] == "/casino"
            elif m == 2:  # /casino/vip/... re-allowed by the longer rule
                assert r["allowed"] and r["matched_rule"] == "/casino/vip"
            else:  # /news /poker /blog unmatched -> allowed
                assert r["allowed"] and r["matched_rule"] is None
        elif k in (1, 4):  # Disallow: / blocks every path
            assert r["n_star_rules"] == 1
            assert not r["allowed"] and r["matched_rule"] == "/"
        else:  # empty * group: googlebot/badbot rules must NOT apply
            assert r["n_star_rules"] == 0
            assert r["allowed"] and r["matched_rule"] is None
