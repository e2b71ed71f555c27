"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState`` (SURVEY.md §2.7 — the reference's per-file
in-heap accumulator maps, reference lib/ingest.js:102-103, generalized to
unbounded keyed state with Spark-managed checkpointing).

Pattern notes for 100 TB streams:
  * state is partitioned by the groupBy key — one state row per user,
    stored in the executor state store (RocksDB in production configs);
  * each micro-batch delivers only that batch's rows per key; the handler
    folds them into state and emits the updated aggregate (update-mode
    semantics);
  * Arrow-batched: the handler sees pandas DataFrames, never Python rows.
"""

# NOTE: no `from __future__ import annotations` — pandas type hints are
# resolved at runtime by the Arrow serializer.

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update_user_state(key, pdf_iter, state: GroupState):
    """Fold this batch's rows for one user into running (count, sum)."""
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running (n_events, sum_value) with keyed state.

    Emits one updated row per user per micro-batch; with a single
    AvailableNow batch the output equals the batch
    ``GROUP BY user_id`` aggregate exactly (that equivalence is the
    oracle check).
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
