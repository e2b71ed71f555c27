"""Sequence packing: assign documents to fixed-size training contexts.

Training pipelines concatenate documents into fixed-length sequences
(e.g. 512/4096 tokens) before batching. The scalable, deterministic
assignment is SEQUENTIAL FILL: within each partition group, order docs by
a stable key, take the running token total, and cut a new sequence every
``target`` tokens. A doc whose tokens straddle a boundary belongs to the
sequence where it starts (downstream writers split or pad — the
assignment stays a pure function of the data).

This is a window computation, so its scale behavior is the window's:
partitioned by a grouping column (source/shard) it distributes — one
shuffle, then per-group running sums. A single GLOBAL pack would funnel
the corpus through one partition; at scale always pack within shards
(training shuffles shard order anyway, so per-shard packing loses
nothing).
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
    inside it. Deterministic for any input partitioning."""
    w = (
        (Window.partitionBy(part_col) if part_col else Window.partitionBy())
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(len_col).over(w) - F.col(len_col)
    return df.withColumn("seq_id", F.floor(start / F.lit(target))).withColumn(
        "seq_offset", start - F.col("seq_id") * target
    )
