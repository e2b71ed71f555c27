"""Query registry — the engine's declared operator surface.

Every operator from SURVEY.md §2 is exposed here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an equivalent ANSI SQL string for the DuckDB oracle. The driver compares
the two at sf0.01 (row count + schema + order-insensitive value hash).

Parity conventions (so Spark and DuckDB hash identically):
  * every computed column is aliased the same on both sides;
  * double aggregates are rounded (FP sums are order-dependent at the ULP
    level; rounding makes both engines agree);
  * DuckDB ``SUM(BIGINT)`` returns HUGEINT → always ``CAST(... AS BIGINT)``;
  * arrays are ``array_sort``ed / ``list_sort``ed before comparison;
  * timestamps are naive UTC (timestamp_ntz) on the Spark side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


def _load_all() -> None:
    from . import fastq  # noqa: F401
    from . import llm  # noqa: F401
    from . import relational  # noqa: F401
    from . import streamq  # noqa: F401
    from . import tpch_extra  # noqa: F401


_load_all()
