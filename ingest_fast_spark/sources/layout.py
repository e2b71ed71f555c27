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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def sized_partitions(
    df: DataFrame,
    target_file_bytes: int = 128 * 1024 * 1024,
    size_hint_bytes: int | None = None,
) -> int:
    """``size_hint_bytes``: a caller-known UPPER BOUND on the output size
    (in-memory scale). Catalyst's post-join estimates MULTIPLY child sizes,
    which can pass the sanity bound while being wildly wrong — r10 caught
    ``run_curation`` sizing a 366-row survivor join at ~4 TB and writing
    100,000 near-empty files (a 7-minute small-files incident at sf0.001,
    and exactly the §6 metastore flood this module exists to prevent). A
    caller that knows its output is a subset of an accurately-estimated
    scan passes that scan's estimate as the bound."""
    est = estimated_bytes(df)
    if size_hint_bytes is not None and size_hint_bytes > 0:
        est = min(est, size_hint_bytes) if est > 0 else size_hint_bytes
    if est <= 0 or est > _SANE_ESTIMATE_BOUND:
        # No usable estimate (post-join default blow-up): keep the plan's
        # current width instead of inventing one.
        return max(1, df.rdd.getNumPartitions())
    est_disk = est / _PARQUET_COMPRESSION_FACTOR
    return min(_MAX_PARTITIONS, max(1, math.ceil(est_disk / target_file_bytes)))


def write_sized(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    size_hint_bytes: int | None = None,
) -> int:
    """Write parquet with ~``target_file_bytes`` files regardless of the
    job's task count. Returns the partition count used."""
    n = sized_partitions(df, target_file_bytes, size_hint_bytes)
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


def _equi_depth_bucket(value: Column, bounds: list[float], bits: int) -> Column:
    """Map ``value`` to its equi-depth bucket id: the number of interior
    quantile boundaries <= value. A higher-order ``aggregate`` over a
    literal boundary array — pure JVM, codegen-friendly, O(2^bits) per
    row with no shuffle and no driver round-trip.

    Low-cardinality columns yield fewer distinct boundaries than
    ``2^bits - 1``; rescale so their ids still span the full bit range —
    otherwise the column only populates its low interleave bits and the
    Z-curve degenerates to a linear sort on the high-cardinality column.
    """
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    bucket = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(value >= b, F.lit(1)).otherwise(F.lit(0)),
    )
    full = (1 << bits) - 1
    if len(bounds) < full:
        bucket = F.round(bucket * F.lit(full / len(bounds))).cast("int")
    return bucket


def _interleave_bits(buckets: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each bucket id into one Z-value.
    Bit positions are disjoint, so summing the shifted terms equals OR."""
    k = len(buckets)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * k + j)
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int = 8,
    relative_error: float = 1.0 / 1024,
) -> None:
    """Z-order (Morton-curve) clustering over ``cols`` so parquet min/max
    footers prune on EVERY listed column, not just a lead sort key.

    A linear sort layout gives perfect skipping on one column and none on
    the others; interleaving equi-depth bucket ids space-fills instead,
    so each output file covers a narrow range of every dimension (what
    Delta's OPTIMIZE ZORDER BY does, built here from public primitives).

    Scale shape: one ``approxQuantile`` pass (Greenwald-Khanna sketch,
    driver receives ``(2^bits - 1) * len(cols)`` doubles); bucketing and
    bit-interleave are whole-stage-codegen Column expressions; then the
    standard range-partition + in-partition sort on the Z-value. Equi-
    depth (rank) buckets keep the curve balanced under skew, where
    min/max-uniform bucketing would collapse.
    """
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    quantiles = df.approxQuantile(cols, probs, relative_error)
    buckets = [
        _equi_depth_bucket(F.col(c).cast("double"), sorted(set(bounds)), bits)
        for c, bounds in zip(cols, quantiles)
    ]
    z = _interleave_bits(buckets, bits)
    (
        df.withColumn("_zvalue", z)
        .repartitionByRange(num_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
