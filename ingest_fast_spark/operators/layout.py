"""Dense global row ids — order-preserving numbering without the
single-reducer window.

``row_number() OVER (ORDER BY key)`` is correct SQL with a fatal plan:
the empty PARTITION BY funnels the whole table through ONE task — the
classic 100 TB scale-killer. The distributed recipe here: range-exchange
on the order key, rank locally per partition, add cumulative
per-partition offsets (a bounded collect — one long per partition, never
row data). This is how a training pipeline stamps stable example ids
before sharding.

The write-side layout primitives (file sizing, range/Z-order clustering)
live in sources/layout.py; the reference has neither (its scale ceiling
is one process, lib/ingest.js:3) — both modules are [EXT]
scale-infrastructure per SURVEY §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _shuffle_partitions_conf(spark, default: int = 32) -> int:
    """spark.sql.shuffle.partitions as an int, tolerating platforms that
    set it to a non-numeric value (e.g. Databricks' "auto")."""
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions", str(default)))
    except (TypeError, ValueError):
        n = default
    return max(2, n)


def assign_dense_ids(
    df: DataFrame,
    order_col: str,
    id_col: str = "global_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = dense 1..N rank of ``order_col`` across the whole
    DataFrame, computed with per-partition parallelism.

    Phase 1: range-exchange on the key (partition p holds a contiguous
    key range, all ranges ordered) and PIN the partitioning with an
    eager localCheckpoint — the per-partition counts (phase 2) and the
    local ranks (phase 3) are separate jobs and must see the identical
    row→partition assignment. Phase 2: count rows per partition id —
    the ONLY driver-side data is one long per partition. Phase 3: local
    ``row_number`` windowed BY PARTITION ID (each reducer ranks one
    partition's rows — no single-partition exchange anywhere in the
    plan) plus the partition's cumulative offset, broadcast-joined back.

    ``order_col`` must be unique (a key) and non-NULL: ties or NULLs
    spanning a range boundary would make the global order
    partition-dependent. The contract is CHECKED (count vs distinct
    count on the already-checkpointed frame — one cheap extra job),
    because a silently run-dependent id is the worst failure mode a
    stamped example id can have.
    """
    spark = df.sparkSession
    n_parts = num_partitions or _shuffle_partitions_conf(spark)
    part = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Key-contract check + bounded collect in ONE aggregate pass over the
    # checkpointed frame: per-partition row count (one long per
    # partition) plus the global distinct/null tallies for the contract.
    counts = sorted(
        (r["_pid"], r["c"], r["d"], r["nn"])
        for r in part.groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.count_distinct(F.col(order_col)).alias("d"),
            F.count(F.col(order_col)).alias("nn"),
        )
        .collect()
    )
    # Within a range partition all rows share the key range, so per-
    # partition uniqueness + non-NULL implies global uniqueness except
    # for EQUAL keys split across a boundary — which repartitionByRange
    # never does (equal keys hash to one range).
    bad = [(p, c, d, nn) for p, c, d, nn in counts if d != c or nn != c]
    if bad:
        p, c, d, nn = bad[0]
        raise ValueError(
            f"assign_dense_ids: order_col {order_col!r} violates the key "
            f"contract (partition {p}: {c} rows, {d} distinct, {nn} "
            "non-NULL) — duplicate or NULL keys would make the ids "
            "run-dependent"
        )
    counts = [(p, c) for p, c, _, _ in counts]
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    offs = spark.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        part.join(F.broadcast(offs), "_pid")
        .withColumn(id_col, F.col("_off") + F.row_number().over(w))
        .drop("_pid", "_off")
    )
