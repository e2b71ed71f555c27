"""Output layout control — file sizing and sort-ordered layouts.

At 100 TB the write side has two classic failure modes this module
addresses declaratively:

* the SMALL-FILES problem: a 2000-task job writing 2000 files per
  partition floods the metastore/listing path. `write_sized` picks the
  partition count from the data's estimated size and a target file size.
* NO DATA SKIPPING: parquet stores per-file/row-group min-max stats, but
  they only prune if values are clustered. `write_range_layout` range-
  partitions + sorts so each file owns a disjoint key range — a filter
  then touches only the files whose range overlaps.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

# In-memory (row-format) size overestimates on-disk parquet: columnar
# encoding + compression typically shrink 3-6× on mixed schemas.
_PARQUET_COMPRESSION_FACTOR = 4.0


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate of the plan output (bytes, in-memory)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


# Catalyst's fallback when a subtree has no stats is to MULTIPLY child
# estimates (joins can report exabytes); treat anything past this bound
# as "unknown" rather than sizing files to a fiction.
_SANE_ESTIMATE_BOUND = 1 << 50  # 1 PiB in-memory
_MAX_PARTITIONS = 100_000


def sized_partitions(df: DataFrame, target_file_bytes: int = 128 * 1024 * 1024) -> int:
    est = estimated_bytes(df)
    if est <= 0 or est > _SANE_ESTIMATE_BOUND:
        # No usable estimate (post-join default blow-up): keep the plan's
        # current width instead of inventing one.
        return max(1, df.rdd.getNumPartitions())
    est_disk = est / _PARQUET_COMPRESSION_FACTOR
    return min(_MAX_PARTITIONS, max(1, math.ceil(est_disk / target_file_bytes)))


def write_sized(
    df: DataFrame, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Write parquet with ~``target_file_bytes`` files regardless of the
    job's task count. Returns the partition count used."""
    n = sized_partitions(df, target_file_bytes)
    df.repartition(n).write.mode("overwrite").parquet(path)
    return n


def write_range_layout(
    df: DataFrame, path: str, col: str, num_files: int
) -> None:
    """Range-partition on ``col`` and sort within partitions, so each
    output file covers a disjoint ``col`` range (verifiable in the parquet
    footers) and range/point filters skip whole files."""
    (
        df.repartitionByRange(num_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )
