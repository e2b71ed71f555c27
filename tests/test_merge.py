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


def test_snapshot_diff_roundtrips_through_merge(spark, sf_dir):
    """snapshot_diff is merge_upsert's inverse: applying the changeset it
    emits (plus payloads for insert/update keys) to the old snapshot
    reproduces the new snapshot exactly."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.operators.merge import merge_upsert, snapshot_diff

    old = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    new = (
        old.filter(k % 13 != 0)
        .withColumn(
            "c_acctbal",
            F.when(k % 7 == 0, F.col("c_acctbal") + 100).otherwise(F.col("c_acctbal")),
        )
        .unionByName(old.filter(k % 11 == 0).withColumn("c_custkey", k + 1000000))
    )
    diff = snapshot_diff(old, new, ["c_custkey"])
    assert diff.filter(F.col("change_type") == "insert").count() > 0
    assert diff.filter(F.col("change_type") == "delete").count() > 0
    assert diff.filter(F.col("change_type") == "update").count() > 0

    upserts = new.join(
        diff.filter(F.col("change_type") != "delete").select("c_custkey"), "c_custkey"
    ).withColumn("_del", F.lit(False))
    deletes = (
        diff.filter(F.col("change_type") == "delete")
        .select("c_custkey")
        .select(
            "c_custkey",
            *[F.lit(None).cast(old.schema[c].dataType).alias(c)
              for c in old.columns if c != "c_custkey"],
            F.lit(True).alias("_del"),
        )
    )
    applied = merge_upsert(old, upserts.unionByName(deletes), ["c_custkey"], "_del")
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))
