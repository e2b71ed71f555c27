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

# Parquet FOOTER SCHEMA cache, keyed by (absolute path, mtime). Schema
# inference costs a measured ~80-100 ms of driver time PER spark.read.parquet
# call (footer fetch + merge) — a pure fixed cost the bench pays once per
# table per query per repeat (~190 queries x ~2 tables). The schema is file
# METADATA pinned by the dataset contract (FIXTURES.md §B), not data: every
# query still scans the parquet bytes in full, and the mtime key invalidates
# the entry the moment a file is rewritten. At cluster scale the same trick
# is what table catalogs (metastore/Iceberg manifests) do for you — guide §6.
_SCHEMA_CACHE: dict = {}


def _path_stamp(path: str):
    st = os.stat(path)
    if os.path.isdir(path):
        # Directory tables: a new part-file changes the dir mtime; a
        # rewritten part-file changes its own mtime — hash both layers.
        entries = tuple(
            (e.name, e.stat().st_mtime_ns) for e in sorted(os.scandir(path), key=lambda e: e.name)
        )
        return (st.st_mtime_ns, entries)
    return (st.st_mtime_ns, st.st_size)


def parquet_schema(spark: SparkSession, path: str):
    """The parquet footer schema as Spark would infer it (under the session's
    current confs), cached per (path, mtime)."""
    key = (os.path.abspath(path), _path_stamp(path))
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = sch
    return sch


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with the footer-schema cache (same result;
    skips the ~100 ms per-call schema inference after the first load)."""
    return spark.read.schema(parquet_schema(spark, path)).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events timestamp column."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql.types import LongType

        apply_runtime_confs(spark)  # needs nanosAsLong on driver-made sessions
        df = read_parquet(spark, path)
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
    return read_parquet(spark, path)


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
