"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

Demonstrates the engine's source-extensibility path: when an input
format has no JVM connector (proprietary binary logs, an internal
service API, a bespoke sharded store), a pure-Python DataSource plugs it
into the DataFrame reader with real partition-level parallelism — each
`InputPartition` becomes one Spark task, so a 1000-shard source scans as
1000 parallel tasks with no driver bottleneck.

The concrete source here is a deterministic synthetic event generator
(seeded integer arithmetic per (partition, row) — no RNG state), which
doubles as an infinite-scale load generator: rows = partitions ×
rows_per_partition, so a 100 TB read test is two options away.

Filter pushdown: `pushFilters` receives equality/comparison filters;
this source accepts `event_type = <v>` (rows are generated pre-filtered,
the honest analogue of predicate pushdown into a remote scan) and
returns the rest to Spark to evaluate. Requires
`spark.sql.python.filterPushdown.enabled=true` (runtime-settable) —
without it Spark refuses to use a reader that implements pushFilters.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events")
         .option("partitions", 8).option("rows_per_partition", 1000)"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_partitions = int(options.get("partitions", "4"))
        self.rows = int(options.get("rows_per_partition", "1000"))
        self.only_type: str | None = None

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("event_type",)
                and self.only_type is None
                and f.value in EVENT_TYPES
            ):
                self.only_type = f.value  # absorbed: generate pre-filtered
            else:
                yield f  # returned: Spark evaluates it post-scan

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition):
        pid = partition.value
        base = pid * self.rows
        for i in range(self.rows):
            eid = base + i
            etype = EVENT_TYPES[(eid * 7) % len(EVENT_TYPES)]
            if self.only_type is not None and etype != self.only_type:
                continue
            yield (
                eid,
                (eid * 31 + 7) % 1000,
                etype,
                float((eid * 13) % 10000) / 100.0,
            )


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: each micro-batch emits the next
    ``rows_per_batch`` events after the start offset. Offsets are plain
    dicts ({"next": n}) checkpointed by Spark, and ``readBetweenOffsets``
    replays any committed range deterministically — the replayability
    contract exactly-once sinks rely on."""

    def __init__(self, options):
        self.rows = int(options.get("rows_per_batch", "100"))
        # bounded mode: the source reports no new data past max_rows, so
        # processAllAvailable()/AvailableNow terminate. Unset = unbounded.
        self.max_rows = int(options.get("max_rows", "-1"))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _gen(self, lo: int, hi: int):
        # materialized list, not a generator: the simple stream reader
        # prefetches driver-side and PICKLES the batch out to executors
        return [
            (
                eid,
                (eid * 31 + 7) % 1000,
                EVENT_TYPES[(eid * 7) % len(EVENT_TYPES)],
                float((eid * 13) % 10000) / 100.0,
            )
            for eid in range(lo, hi)
        ]

    def read(self, start: dict):
        lo = start["next"]
        hi = lo + self.rows
        if self.max_rows >= 0:
            hi = min(hi, self.max_rows)
        # iter() over a materialized list: the API wants an iterator, but
        # the prefetch cache pickles what it pulls — a bare generator
        # fails pickling, a bare list fails the iterator contract.
        return iter(self._gen(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._gen(start["next"], end["next"]))
