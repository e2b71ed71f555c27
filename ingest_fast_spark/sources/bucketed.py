"""Bucketed-table support: co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
both sides bucketed (and sorted) by the join key lets Spark plan a
SortMergeJoin with ZERO Exchange — each task reads matching bucket files
from both tables. Bucket counts must match (or divide evenly with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

This engine's convention: ``write_bucketed(df, table, keys, n)`` registers
a bucketed table in the session catalog (saveAsTable — bucketing metadata
lives in the metastore; a bare ``.parquet()`` write silently drops it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (+ sorted) managed/external table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables: shuffle-free by construction (assert
    with ``.explain`` — no Exchange above either scan)."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)
