"""Sequence packing: assign documents to fixed-size training contexts.

Training pipelines concatenate documents into fixed-length sequences
(e.g. 512/4096 tokens) before batching. The scalable, deterministic
assignment is SEQUENTIAL FILL: within each partition group, order docs by
a stable key, take the running token total, and cut a new sequence every
``target`` tokens. A doc whose tokens straddle a boundary belongs to the
sequence where it starts (downstream writers split or pad — the
assignment stays a pure function of the data).

The naive form is a per-group running-sum window — which funnels each
group (or, unpartitioned, the whole corpus) through ONE reducer task: a
grouping column like `source` has ~dozens of values, so "partitioned"
still means corpus/20 rows sorted by a single task at 100 TB. Instead the
prefix sum is computed distributed and EXACT, the same decomposition as
``operators/rank.global_row_number``: range-partition on (group, order)
so each group spans a contiguous run of partitions, take running sums
within each (partition, group) slice in parallel, and shift each slice by
the summed totals of the earlier partitions' slices of the same group —
an offset table bounded by partitions + groups, never by rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    len_col: str,
    order_col: str,
    target: int,
    part_col: str | None = None,
) -> DataFrame:
    """Add (seq_id, seq_offset): which fixed-``target``-token sequence the
    doc starts in (numbered per ``part_col`` group) and its token offset
    inside it. Deterministic for any input partitioning; equals the
    per-group running-sum window row for row (pinned in
    tests/test_pack_decontam.py) without any group-sized sort task."""
    keys = [part_col] if part_col else []
    ranged = df.repartitionByRange(*keys, order_col).withColumn(
        "_pk_pid", F.spark_partition_id()
    )
    wrun = (
        Window.partitionBy("_pk_pid", *keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_pk_run", F.sum(len_col).over(wrun))
    # One materialization: the offset aggregate and the final join must
    # see the SAME sampled range boundaries (see rank.global_row_number).
    local = local.localCheckpoint(eager=True)
    # Totals: one row per (partition, group) slice; contiguous ranges make
    # that at most #partitions + #groups rows. The running sum over them
    # is per group across partition ids — a bounded window.
    totals = local.groupBy("_pk_pid", *keys).agg(F.max("_pk_run").alias("_pk_n"))
    woff = (
        (Window.partitionBy(*keys) if keys else Window.partitionBy())
        .orderBy("_pk_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "_pk_pid",
        *keys,
        F.coalesce(F.sum("_pk_n").over(woff), F.lit(0)).alias("_pk_off"),
    )
    start = F.col("_pk_run") - F.col(len_col) + F.col("_pk_off")
    # Null-safe on the group key: a NULL part_col value is a legitimate
    # group (the window form packs it); a plain equi-join would silently
    # drop its rows.
    offs = offs.withColumnRenamed("_pk_pid", "_po_pid")
    cond = local["_pk_pid"] == offs["_po_pid"]
    for k in keys:
        offs = offs.withColumnRenamed(k, f"_po_{k}")
        cond = cond & local[k].eqNullSafe(offs[f"_po_{k}"])
    return (
        local.join(F.broadcast(offs), cond)
        .withColumn("seq_id", F.floor(start / F.lit(target)))
        .withColumn("seq_offset", start - F.col("seq_id") * target)
        .drop("_pk_pid", "_pk_run", "_pk_off", "_po_pid", *[f"_po_{k}" for k in keys])
    )
