"""PDF codec tests: byte-exact text round-trips through all three
text-show forms (literal with escapes, hex, TJ array), multi-page
structure, honest gates (encryption, xref streams, unknown filters),
and structural-corruption detection."""

import zlib

import pytest

from ingest_fast_spark.operators.pdf import extract_pdf_text, make_pdf


def test_roundtrip_all_show_forms_and_unicode():
    pages = [
        "hello (world) \\ test",       # literal form, escape-worthy
        "päge two — unicode ✓",        # hex form, byte-exact UTF-8
        "third page in the TJ array form",
        "",                             # empty page stays a page
        "fifth (p. 5)",
    ]
    r = extract_pdf_text(make_pdf(pages))
    assert r["n_pages"] == 5
    assert r["version"] == "1.4"
    assert r["text"] == "\n".join(pages)


def test_single_page_and_long_text():
    body = "word " * 5000
    r = extract_pdf_text(make_pdf([body]))
    assert r["n_pages"] == 1
    assert r["text"] == body


def test_garbage_and_truncation_raise():
    with pytest.raises(ValueError):
        extract_pdf_text(b"NOT A PDF")
    good = make_pdf(["page one", "page two"])
    with pytest.raises((ValueError, NotImplementedError)):
        extract_pdf_text(good[: len(good) // 2])


def test_encrypted_gate():
    p = bytearray(make_pdf(["secret"]))
    # splice /Encrypt into the trailer dictionary
    i = p.index(b"/Root")
    p[i:i] = b"/Encrypt 9 0 R "
    # fix: startxref offset unchanged (trailer grew AFTER xref table)
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pdf_text(bytes(p))


def test_xref_stream_gate():
    # a minimal 1.5-style file: startxref points at an object, not 'xref'
    body = b"%PDF-1.5\n1 0 obj\n<< /Type /XRef >>\nendobj\n"
    pdf = body + b"startxref\n9\n%%EOF\n"
    with pytest.raises(NotImplementedError, match="cross-reference stream"):
        extract_pdf_text(pdf)


def test_unknown_filter_gate():
    p = make_pdf(["page"])
    with pytest.raises(NotImplementedError, match="filter"):
        extract_pdf_text(p.replace(b"/FlateDecode", b"/LZWDecode  "))


def test_corrupt_stream_raises():
    p = make_pdf(["page"])
    comp = None
    # find the flate stream and corrupt its bytes
    i = p.index(b"stream\n") + len(b"stream\n")
    j = p.index(b"\nendstream", i)
    bad = p[:i] + bytes(len(p[i:j])) + p[j:]
    with pytest.raises(zlib.error):
        extract_pdf_text(bad)


def test_broken_content_stream_raises_not_partial():
    """Module contract: a structurally broken content stream (unterminated
    string) raises a page-scoped ValueError instead of silently returning
    the text collected so far (round-9 ADVICE)."""
    from ingest_fast_spark.operators.pdf import _page_content_text

    class _FakeDoc:
        def resolve(self, x):
            return x

    page = {"/Contents": {"dict": {}, "data": b"BT (kept) Tj (oops Tj ET"}}
    with pytest.raises(ValueError, match="content stream"):
        _page_content_text(_FakeDoc(), page)


def test_spark_extract_operator(spark):
    """The production mapInPandas operator: synthesized payloads in,
    byte-exact text out; NULL payloads stay NULL rows."""
    from ingest_fast_spark.operators import multimodal as M

    rows = [
        (1, make_pdf(["alpha", "beta"]), "application/pdf", "{}"),
        (2, None, "application/pdf", "{}"),
    ]
    df = spark.createDataFrame(rows, M.PAYLOAD_SCHEMA)
    got = {r["doc_id"]: r for r in M.extract_document_text(df).collect()}
    assert got[1]["n_pages"] == 2 and got[1]["text"] == "alpha\nbeta"
    assert got[2]["n_pages"] is None and got[2]["text"] is None
