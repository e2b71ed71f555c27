"""PII redaction: positive detection/replacement cases (the corpus oracle
only proves engine-parity on clean text) and paragraph-dedup semantics."""

from pyspark.sql import functions as F

from ingest_fast_spark.functions import redact as R
from ingest_fast_spark.operators.dedup import paragraph_dedup


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    counts = R.pii_counts(F.col("text"))
    row = df.select(
        R.redact_pii(F.col("text")).alias("red"),
        counts["email"].alias("e"),
        counts["url"].alias("u"),
        counts["phone"].alias("p"),
    ).first()
    return row["red"], (row["e"], row["u"], row["p"])


def test_email_redaction(spark):
    red, counts = _one(spark, "contact john.doe+spam@example.co.uk for info")
    assert red == "contact <EMAIL> for info" and counts == (1, 0, 0)


def test_url_redaction_swallows_embedded_pii(spark):
    red, counts = _one(spark, "see https://a.example.com/u?e=x@y.zz&n=12345678 now")
    assert red == "see <URL> now"
    assert counts[1] == 1  # url counted; embedded email/digits belong to it


def test_phone_redaction(spark):
    red, counts = _one(spark, "call +1 (555) 123-4567 today")
    assert red == "call <PHONE> today" and counts[2] == 1


def test_clean_text_untouched(spark):
    text = "no contact information in this sentence at all"
    red, counts = _one(spark, text)
    assert red == text and counts == (0, 0, 0)


def test_paragraph_dedup_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique one\nshared footer\nunique two"),
            (2, "other content\nshared footer"),
            (3, "shared footer"),  # every paragraph already seen → doc vanishes
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["text_clean"], r["n_paras_kept"]) for r in paragraph_dedup(docs).collect()}
    assert out == {
        1: ("unique one\nshared footer\nunique two", 3),
        2: ("other content", 1),
    }
