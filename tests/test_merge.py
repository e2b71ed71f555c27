"""MERGE upsert semantics on hand-built fixtures (corpus-level behavior
is oracle-checked via the merge_upsert_customers query)."""

from ingest_fast_spark.operators.merge import merge_upsert


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_update_insert_passthrough(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "bal"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (4, "d", 40.0)], ["id", "name", "bal"]
    )
    out = rows(merge_upsert(target, updates, ["id"]))
    assert out == [(1, "a", 10.0), (2, "b2", 25.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_update_with_null_column_wins(spark):
    # MERGE updates ALL columns from the update row, including to NULL
    target = spark.createDataFrame([(1, "a", 10.0)], ["id", "name", "bal"])
    updates = spark.createDataFrame(
        [(1, None, 11.0)], schema="id bigint, name string, bal double"
    )
    out = rows(merge_upsert(target, updates, ["id"]))
    assert out == [(1, None, 11.0)]


def test_delete_flag(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "name", "bal"]
    )
    updates = spark.createDataFrame(
        [(1, "x", 0.0, True), (3, "c", 30.0, False)],
        ["id", "name", "bal", "is_delete"],
    )
    out = rows(
        merge_upsert(target, updates, ["id"], delete_col="is_delete").select(
            "id", "name", "bal"
        )
    )
    assert out == [(2, "b", 20.0), (3, "c", 30.0)]


def test_composite_key(spark):
    target = spark.createDataFrame([(1, "x", 5.0), (1, "y", 6.0)], ["k1", "k2", "v"])
    updates = spark.createDataFrame([(1, "y", 60.0), (2, "z", 7.0)], ["k1", "k2", "v"])
    out = rows(merge_upsert(target, updates, ["k1", "k2"]))
    assert out == [(1, "x", 5.0), (1, "y", 60.0), (2, "z", 7.0)]


def test_scd2_collapse_runs_and_validity(spark):
    from ingest_fast_spark.operators.merge import scd2_collapse

    df = spark.createDataFrame(
        [
            (1, "bronze", 10, 100),
            (1, "bronze", 20, 101),  # repeat -> collapses into first run
            (1, "gold", 30, 102),
            (1, "bronze", 40, 103),  # back to bronze -> NEW version
            (2, "silver", 15, 104),
        ],
        ["uid", "tier", "t", "eid"],
    )
    out = {
        (r["uid"], r["valid_from"]): (r["tier"], r["valid_to"], r["is_current"])
        for r in scd2_collapse(df, "uid", "tier", "t", "eid").collect()
    }
    assert out == {
        (1, 10): ("bronze", 30, False),
        (1, 30): ("gold", 40, False),
        (1, 40): ("bronze", None, True),
        (2, 15): ("silver", None, True),
    }
