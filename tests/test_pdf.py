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


def test_xref_stream_roundtrip():
    """PDF 1.5: /Type /XRef cross-reference stream (W-field decode, PNG
    Up predictor) + /Type /ObjStm compressed objects — byte-exact text
    round-trip through the same extractor surface as the classic path."""
    pages = ["hello (world) \\ test", "päge two — unicode ✓", "TJ form", ""]
    r = extract_pdf_text(make_pdf(pages, xref_stream=True))
    assert r["n_pages"] == 4
    assert r["version"] == "1.5"
    assert r["text"] == "\n".join(pages)


def test_xref_stream_truncation_and_garbage():
    p = make_pdf(["page one", "page two"], xref_stream=True)
    for cut in (len(p) // 2, len(p) - 20):
        with pytest.raises((ValueError, NotImplementedError, Exception)):
            extract_pdf_text(p[:cut])
    # a startxref pointing at a non-XRef object is structural damage
    body = b"%PDF-1.5\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
    with pytest.raises(ValueError, match="XRef"):
        extract_pdf_text(body + b"startxref\n9\n%%EOF\n")


def test_hybrid_xrefstm_roundtrip():
    """Hybrid-reference file (ISO 32000 §7.5.8.4): a CLASSIC trailer whose
    /XRefStm points at the cross-reference stream carrying the
    compressed-object entries — the shape 1.4-compatible writers emit."""
    import re

    p = make_pdf(["alpha", "beta"], xref_stream=True)
    xpos = int(re.search(rb"startxref\s+(\d+)", p[-100:]).group(1))
    body = p[: p.rindex(b"startxref")]
    tail = (
        b"xref\n0 1\n0000000000 65535 f \ntrailer\n"
        b"<< /Size 99 /Root 1 0 R /XRefStm %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (xpos, len(body))
    )
    r = extract_pdf_text(body + tail)
    assert r["n_pages"] == 2 and r["text"] == "alpha\nbeta"


def test_png_predictors_unit():
    """All four PNG row predictors round-trip through _png_unpredict
    (the encoder only emits Up; real PDFs use any of them)."""
    from ingest_fast_spark.operators.pdf import _png_unpredict

    raw = bytes(range(1, 29))  # 4 rows x 7 columns
    cols = 7

    def predict(ft):
        out = bytearray()
        prev = bytes(cols)
        for r in range(0, len(raw), cols):
            row = raw[r : r + cols]
            out.append(ft)
            for i in range(cols):
                if ft == 0:
                    d = row[i]
                elif ft == 1:
                    d = row[i] - (row[i - 1] if i else 0)
                elif ft == 2:
                    d = row[i] - prev[i]
                elif ft == 3:
                    d = row[i] - ((row[i - 1] if i else 0) + prev[i]) // 2
                else:  # Paeth
                    a = row[i - 1] if i else 0
                    b = prev[i]
                    c = prev[i - 1] if i else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    d = row[i] - pr
                out.append(d & 0xFF)
            prev = row
        return bytes(out)

    for ft in range(5):
        assert _png_unpredict(predict(ft), cols, 12) == raw, ft
    # TIFF predictor 2 (round 9): horizontal differencing, no tag byte
    tiff = bytearray()
    for r in range(0, len(raw), cols):
        row = raw[r : r + cols]
        tiff.append(row[0])
        for i in range(1, cols):
            tiff.append((row[i] - row[i - 1]) & 0xFF)
    assert _png_unpredict(bytes(tiff), cols, 2) == raw
    with pytest.raises(ValueError):
        _png_unpredict(bytes(tiff[:-1]), cols, 2)  # not whole rows


def test_filter_mix_roundtrip_and_codec_vectors():
    """Round 9: all five text-capable stream filters round-trip, in both
    xref layouts; LZW is additionally pinned against a hand-assembled
    MSB bitstream (codes 256,65,257 at 9 bits -> 'A')."""
    from ingest_fast_spark.operators.pdf import (
        _ascii85_decode,
        _lzw_decode,
        _lzw_encode,
        _rle_decode,
        _rle_encode,
    )

    pages = [f"filter page {i} repetition repetition repetition" for i in range(10)]
    for xs in (False, True):
        got = extract_pdf_text(make_pdf(pages, xref_stream=xs, filter_mix=True))
        assert got["text"].split("\n") == pages
        assert got["n_pages"] == 10
    assert _lzw_decode(bytes([0x80, 0x10, 0x60, 0x20])) == b"A"
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    # run + literal branches of RunLength
    data = b"aaaaaaXYZbbbbbb" * 40
    assert _rle_decode(_rle_encode(data)) == data
    blob = bytes(range(256)) * 30
    assert _lzw_decode(_lzw_encode(blob)) == blob


def test_unknown_filter_gate():
    p = make_pdf(["page"])
    with pytest.raises(NotImplementedError, match="filter"):
        extract_pdf_text(p.replace(b"/FlateDecode", b"/DCTDecode  "))


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


def test_lzw_width_boundary_and_corpus_shapes():
    """Regression: the 9->10 bit switch follows the normative early-change
    schedule (decoder grows when its NEXT table slot reaches 2^w - 1).
    The encoder must simulate the DECODER's entry count — one behind its
    own mid-stream, one ahead at the final data code — or streams whose
    length lands near the 512-entry boundary desync (caught live on the
    sf0.1 corpus: 466-byte word-repetitive text)."""
    from ingest_fast_spark.operators.pdf import _lzw_decode, _lzw_encode

    # word-repetitive text sized to straddle the 512-entry boundary
    words = ["key", "agg", "row", "scan", "slow", "fast", "table", "value"]
    base = " ".join(words[i % 8] for i in range(200)).encode()
    for cut in range(380, 520, 7):
        d = base[:cut]
        assert _lzw_decode(_lzw_encode(d)) == d, cut
    # and across the 1024/2048 boundaries
    import random

    rng = random.Random(11)
    big = bytes(rng.choice(b"abcdef ") for _ in range(20000))
    assert _lzw_decode(_lzw_encode(big)) == big
