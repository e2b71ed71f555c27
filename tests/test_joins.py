"""Unit tests for the temporal/range join operators (operators/joins.py)."""

import datetime as dt

from pyspark.sql import functions as F

from ingest_fast_spark.operators.joins import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),  # before any right row
            (4, "u3", _ts("2024-01-01 10:00:00")),  # key with no right rows
        ],
        "event_id long, user_id string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 1.0),
            ("u1", _ts("2024-01-01 11:00:00"), 2.0),
            ("u1", _ts("2024-01-01 12:00:00"), 3.0),  # tie: ts == left ts
            ("u2", _ts("2024-01-01 09:30:00"), 4.0),
        ],
        "user_id string, ts timestamp_ntz, value double",
    )
    out = {
        r["event_id"]: (r["matched_ts"], r["matched_value"])
        for r in asof_join(left, right, keys=["user_id"], right_cols=["value"]).collect()
    }
    assert out[1] == (_ts("2024-01-01 09:30:00"), 1.0)
    # tie (right.ts == left.ts) IS a match, and latest wins
    assert out[2] == (_ts("2024-01-01 12:00:00"), 3.0)
    assert out[3] == (None, None)  # no right row at or before
    assert out[4] == (None, None)  # key absent from right
    # left join: every left row survives
    assert len(out) == 4


def test_asof_join_one_shuffle(spark):
    """The plan must contain exactly one exchange (the key shuffle) and no
    nested-loop join — the property that makes it viable at 100 TB."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:30:00"), 1.0)],
        "user_id string, ts timestamp_ntz, value double",
    )
    plan = asof_join(left, right, keys=["user_id"], right_cols=["value"])._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_range_join(spark):
    facts = spark.createDataFrame(
        [(1, 905.0), (2, 920.0), (3, 999.9), (4, 899.9)], "id long, price double"
    )
    bands = spark.createDataFrame(
        [("lo", 900.0, 950.0), ("hi", 950.0, 1000.0)], "band string, lo double, hi double"
    )
    got = {
        r["id"]: r["band"]
        for r in range_join(facts, bands, "price").select("id", "band").collect()
    }
    assert got == {1: "lo", 2: "lo", 3: "hi"}  # 4 falls below every band
    # boundary: lo inclusive, hi exclusive
    edge = spark.createDataFrame([(9, 950.0)], "id long, price double")
    assert [
        r["band"] for r in range_join(edge, bands, "price").select("band").collect()
    ] == ["hi"]


def test_asof_cogroup_matches_jvm_asof(spark, sf_dir):
    """Two independent as-of implementations (JVM union+window vs
    cogroup+pd.merge_asof) must produce identical results on the real
    events/orders data."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.operators.joins import asof_join, asof_join_cogroup

    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    a = asof_join(left, right, ["user_id"], right_cols=["value"])
    b = asof_join_cogroup(left, right, ["user_id"], right_cols=["value"])
    ra = sorted(map(tuple, a.select(*sorted(a.columns)).collect()))
    rb = sorted(map(tuple, b.select(*sorted(b.columns)).collect()))
    assert ra == rb
