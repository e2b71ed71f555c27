"""Constraint checker: each rule kind must actually catch violations (the
corpus query only proves clean data reports zeros)."""

from ingest_fast_spark.operators import quality as Q


def test_rules_catch_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "F", 10.0),
            (1, "O", 20.0),      # duplicate id
            (None, "F", 30.0),   # null id
            (4, "X", 40.0),      # bad status
            (5, "O", -7.0),      # out of range
        ],
        "id long, status string, amount double",
    )
    dim = spark.createDataFrame([(1,), (4,), (5,)], "k long")
    report = {
        r["rule"]: r["violations"]
        for r in Q.quality_report(
            df,
            scalar_rules=[
                Q.not_null("id"),
                Q.accepted_values("status", ["F", "O", "P"]),
                Q.in_range("amount", 0, 100),
            ],
            unique=[["id"]],
            referential=[("id", dim, "k")],
        ).collect()
    }
    assert report == {
        "not_null(id)": 1,
        "accepted_values(status)": 1,
        "range(amount)": 1,
        "unique(id)": 1,        # one extra row beyond the first for id=1
        "referential(id)": 0,   # every non-null id exists in dim
    }


def test_referential_catches_orphans(spark):
    df = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    row = Q.check_referential(df, "fk", dim, "k").first()
    assert (row["rule"], row["violations"]) == ("referential(fk)", 1)


def test_all_clean_reports_zeros(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id long, v double")
    report = Q.quality_report(
        df,
        scalar_rules=[Q.not_null("id"), Q.in_range("v", 0, 10)],
        unique=[["id"]],
    )
    assert all(r["violations"] == 0 for r in report.collect())


def test_gopher_rules_flag_planted_pathologies(spark, tmp_path):
    """Each Gopher rule must fire on a document built to violate exactly
    that rule, and a clean 60-word English doc must pass all rules."""
    import os

    from pyspark.sql import functions as F

    from ingest_fast_spark.queries.pipelineq import quality_gopher_rules

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs away with great speed to be seen near the old barn "
            "that have stood there for years of quiet service and it "
            "keeps going through fields and woods and streams and hills "
            "until the evening light fades out over the long horizon "
            "while birds settle down calmly") # 58+ words, stopwords, clean
    docs = [
        (1, good, "en", "src0", len(good)),
        # word-count violation only fires pass_word_count
        (2, "too short to count", "en", "src0", 18),
        # bullet-heavy: >90% of lines start with '-'
        (3, "\n".join(f"- item {i} listed here" for i in range(20)), "en", "src0", 100),
        # ellipsis-heavy: every line ends with ...
        (4, "\n".join(f"line {i} trails off..." for i in range(10)), "en", "src0", 100),
        # symbol spam: hashtags outnumber a tenth of the words
        (5, "#a #b #c #d #e word " * 10, "en", "src0", 100),
        # numeric gibberish: <80% alpha words
        (6, " ".join(str(i) for i in range(80)), "en", "src0", 100),
        # empty / whitespace-only docs: zero words and zero lines must
        # fail-closed, not raise ANSI DIVIDE_BY_ZERO (the boolean guards
        # don't short-circuit; the ratios use try_divide)
        (7, "", "en", "src0", 0),
        (8, "   \n  ", "en", "src0", 6),
    ]
    d = str(tmp_path / "gopher")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    rows = {r["doc_id"]: r for r in quality_gopher_rules(spark, d).collect()}
    assert rows[1]["pass_all"], rows[1]
    assert not rows[2]["pass_word_count"]
    assert not rows[3]["pass_bullet_lines"]
    assert not rows[4]["pass_ellipsis_lines"]
    assert not rows[5]["pass_symbol_ratio"]
    assert not rows[6]["pass_alpha_words"] and not rows[6]["pass_stopwords"]
    for i in (2, 3, 4, 5, 6):
        assert not rows[i]["pass_all"]
    for i in (7, 8):
        assert not rows[i]["pass_word_count"] and not rows[i]["pass_all"], rows[i]


def test_c4_rules_flag_planted_pathologies(spark, tmp_path):
    """Each C4 rule fires on a document built to violate exactly that
    rule; a clean multi-sentence doc passes all rules and keeps all its
    lines."""
    import os

    from ingest_fast_spark.queries.pipelineq import quality_c4_rules

    good = (
        "The quick brown fox jumps over the lazy dog today.\n"
        "It keeps running through the green fields all day.\n"
        "Every evening it sleeps near the old barn door."
    )
    docs = [
        (1, good, "en", "src0", len(good)),
        # lines lack terminal punctuation -> zero kept lines
        (2, "no punctuation on this line\nand none on this one either", "en", "src0", 50),
        # fewer than 3 sentences
        (3, "One sentence only here.", "en", "src0", 23),
        # boilerplate marker
        (4, "Please read this. See our privacy policy for details. It is long. Bye.", "en", "src0", 60),
        # lorem ipsum page drop
        (5, "Lorem ipsum dolor sit amet. Filler text goes on. More filler here.", "en", "src0", 60),
        # curly brace page drop (code)
        (6, "function f() { return 1; } it is code. More code follows. End.", "en", "src0", 60),
        # javascript line drop
        (7, "Please enable javascript to view this page properly.\nReal content sentence is right here today.\nAnother good sentence ends this page now.", "en", "src0", 100),
    ]
    d = str(tmp_path / "c4")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    rows = {r["doc_id"]: r for r in quality_c4_rules(spark, d).collect()}
    assert rows[1]["pass_all"] and rows[1]["n_kept_lines"] == 3
    assert rows[2]["n_kept_lines"] == 0 and not rows[2]["pass_all"]
    assert not rows[3]["pass_min_sentences"]
    # the policy phrase kills its LINE (not the page): doc 4 keeps the others
    assert rows[4]["n_kept_lines"] < rows[4]["n_lines"] or rows[4]["n_lines"] == 1
    assert not rows[5]["pass_no_lorem"] and not rows[5]["pass_all"]
    assert not rows[6]["pass_no_braces"] and not rows[6]["pass_all"]
    # javascript drops exactly the one line; the two clean sentences survive
    assert rows[7]["n_kept_lines"] == 2 and rows[7]["n_lines"] == 3


def test_compression_ratio_separates_prose_from_noise_and_template(spark):
    """The signal the gate rests on: repetitive/templated text compresses
    far better than prose, and high-entropy noise barely compresses.
    Ratios must order template < prose < noise, and the invariant
    booleans must hold on all three."""
    from ingest_fast_spark.operators.quality import compression_ratios
    from ingest_fast_spark.queries.pipelineq import (
        quality_compression_invariants,
    )

    import random

    rng = random.Random(7)
    prose = ("the quick brown fox jumps over the lazy dog and then " * 20)
    template = "menu home about contact " * 50
    noise = "".join(chr(33 + rng.randrange(90)) for _ in range(1000))
    df = spark.createDataFrame(
        [(1, prose), (2, template), (3, noise)], "doc_id long, text string"
    )
    r = {x["doc_id"]: x for x in compression_ratios(df).collect()}
    assert r[2]["ratio_micro"] < r[1]["ratio_micro"] < r[3]["ratio_micro"]
    assert r[3]["ratio_micro"] > 700_000     # noise stays near 1.0
    assert r[2]["ratio_micro"] < 100_000     # template crushes
    inv = quality_compression_invariants(spark, "/root/testdata/sf0.001").collect()
    assert inv and all(
        row["ok_const_floor"] and row["ok_repeat_window"] and row["ok_bounds"]
        for row in inv
    )


def test_code_detect_separates_planted_snippets(spark):
    """Every doc_id % 4 == 0 row carries the synthesized code snippet and
    must classify as code; the prose corpus must overwhelmingly not."""
    from ingest_fast_spark.queries.llm import text_code_detect

    rows = text_code_detect(spark, "/root/testdata/sf0.01").collect()
    code = [r for r in rows if r["doc_id"] % 4 == 0]
    prose = [r for r in rows if r["doc_id"] % 4 != 0]
    assert code and prose
    assert all(r["is_code"] for r in code)
    fp = sum(1 for r in prose if r["is_code"]) / len(prose)
    assert fp < 0.05, f"prose false-positive rate {fp}"
    for r in code:
        assert r["n_keywords"] >= 5 and r["n_indented"] == 2
