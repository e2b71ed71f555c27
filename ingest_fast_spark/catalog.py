"""Loaders for the synthetic tables in /root/testdata/sf*/.

Schemas are documented in FIXTURES.md §B. All loads are plain parquet scans
so Catalyst gets column pruning + predicate pushdown for free; the only
special case is ``events`` whose parquet carries INT64 TIMESTAMP(NANOS) —
Spark reads it as long (legacy flag) and we convert to ``timestamp_ntz``
truncated to microseconds, which is byte-identical to what DuckDB's
TIMESTAMP (micros) reader produces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events timestamp column."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql.types import LongType

        apply_runtime_confs(spark)  # needs nanosAsLong on driver-made sessions
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            # Driver-made file: INT64 TIMESTAMP(NANOS), read as long under
            # the legacy flag. nanos -> micros -> naive-UTC timestamp,
            # matching DuckDB. Integer DIV, not floor(a/b): double division
            # loses ULPs at 1e18 ns and shifts timestamps by ±1 µs.
            return df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
            )
        # Re-materialized copy (engine-written parquet): ts is already a
        # micros timestamp; just normalize the zone flavor.
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(path)


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the plan currently has fewer partitions
    than the cluster's parallelism.

    Why: a single-row-group parquet file scans as ONE task, serializing
    everything pipelined onto the scan (explodes, partial aggregates). One
    tiny shuffle of the base table unlocks every core. At real scale this
    is a NO-OP — a 100 TB table scans as thousands of splits, so the guard
    keeps the extra shuffle out of production plans.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
