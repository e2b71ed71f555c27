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
