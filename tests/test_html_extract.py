"""html_main_text: the paragraph-only web-text extractor must drop every
boilerplate element, decode entities, and survive adversarial markup —
the registered round-trip query only proves recovery on clean prose."""

from pyspark.sql import functions as F

from ingest_fast_spark.functions import text as T


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "page string")
    return df.select(T.html_main_text(F.col("page")).alias("x")).collect()[0]["x"]


def test_drops_script_style_nav_footer(spark):
    html = (
        "<html><head><style>p {color:red}</style>"
        '<script type="text/javascript">document.write("<p>injected</p>");'
        "</script></head><body><nav>Home | About</nav>"
        "<p>kept one</p><aside>sidebar junk</aside><p>kept two</p>"
        "<footer>&copy; 2026</footer></body></html>"
    )
    assert _extract(spark, html) == "kept one kept two"


def test_entities_and_inline_tags(spark):
    html = (
        "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; "
        "<b>bold</b> <a href='/x'>link</a></p>"
    )
    assert _extract(spark, html) == "a & b <tag> \"q\" 's' bold link"


def test_multiline_paragraphs_and_whitespace_collapse(spark):
    html = "<p>line one\n\n   line two</p>\n<p>\tline three </p>"
    assert _extract(spark, html) == "line one line two line three"


def test_no_paragraphs_yields_empty(spark):
    html = "<html><body><div>div text only</div><nav>menu</nav></body></html>"
    assert _extract(spark, html) == ""


def test_paragraph_attributes_and_empty_paragraph(spark):
    html = '<p class="body" data-x="1">first</p><p></p><p id="z">second</p>'
    assert _extract(spark, html) == "first second"


def test_script_with_fake_closing_paragraph(spark):
    # a <p> INSIDE a script body must not leak: the subtree strip runs
    # before paragraph extraction
    html = '<script>var s = "<p>not text</p>";</script><p>real</p>'
    assert _extract(spark, html) == "real"


def test_registered_roundtrip_single_token_docs(spark):
    """The registered query's two-paragraph split degenerates gracefully:
    a one-token document puts everything in paragraph 1 and an empty
    paragraph 2, and still round-trips exactly."""
    from ingest_fast_spark.queries import QUERIES
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "solo", "s1"), (2, "two  tokens", "s1"), (3, "a b c", "s2")],
            "doc_id long, text string, source string",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            r["doc_id"]: r["main_text"]
            for r in QUERIES["text_html_extract"](spark, d).collect()
        }
    assert rows == {1: "solo", 2: "two tokens", 3: "a b c"}


# ---------------------------------------------------------------------------
# fix_mojibake (same module: functions/text.py Column chains)
# ---------------------------------------------------------------------------


def test_fix_mojibake_every_pair_roundtrips(spark):
    from ingest_fast_spark.functions.text import MOJIBAKE_PAIRS

    clean = " ".join(good for _, good in MOJIBAKE_PAIRS)
    bad = clean.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame([(bad,)], "t string")
    out = df.select(T.fix_mojibake(F.col("t")).alias("x")).collect()[0]["x"]
    assert out == clean


def test_fix_mojibake_is_noop_on_clean_ascii(spark):
    s = "plain ascii text, no mojibake markers at all."
    df = spark.createDataFrame([(s,)], "t string")
    assert df.select(T.fix_mojibake(F.col("t")).alias("x")).collect()[0]["x"] == s


def test_fix_mojibake_query_tail_recovers_clean_string(spark):
    # Ground truth for text_fix_mojibake's synthesized tail, pinned
    # independently of the pair table: the repair of the corrupted tail
    # must be exactly the clean constant (the query's oracle now applies
    # the same pair table on both engines, so this test carries the
    # absolute ground-truth check).
    from ingest_fast_spark.queries.llm import _MOJI_BAD, _MOJI_CLEAN

    df = spark.createDataFrame([(_MOJI_BAD,)], "t string")
    out = df.select(T.fix_mojibake(F.col("t")).alias("x")).collect()[0]["x"]
    assert out == _MOJI_CLEAN
    assert len(_MOJI_BAD) - len(_MOJI_CLEAN) > 0


def test_fix_mojibake_ordering_long_before_short(spark):
    # 'â€™' must repair as one right-quote, not decompose via the bare
    # 'Ã¢'/'â' rules; interleaved with a 2-byte pair to prove independence
    df = spark.createDataFrame([("itâ€™s Ã¼ber",)], "t string")
    out = df.select(T.fix_mojibake(F.col("t")).alias("x")).collect()[0]["x"]
    assert out == "it’s über"
