"""Temporal and range join operators.

The reference has only equi-joins (SURVEY.md §2.5: J1-J3); these are the
two join shapes a large-scale event/feature pipeline needs that Spark has
no native operator for:

  * as-of join   — for each left row, the most recent right row with
                   ``right.ts <= left.ts`` per key. Implemented as the
                   union + ordered-window idiom: tag both sides, sort by
                   (key, ts, side), carry the last non-null right payload
                   forward. ONE shuffle on (key), no per-row range probe,
                   no candidate explosion — this is the formulation that
                   survives 100 TB (a naive ``ts BETWEEN``-join is a
                   broadcast-nested-loop at best).
  * range join   — fact value joined into dimension [lo, hi) bands via a
                   broadcast non-equi join. Correct strategy when the band
                   table is small (the overwhelmingly common case); the
                   docstring notes the bucketized equi-join rewrite for
                   large band tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """Backward as-of join (``right.ts <= left.ts``, latest wins).

    Returns every ``left`` row plus ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each c in ``right_cols`` (NULL when no right row
    precedes the left row for that key).

    Scale notes: both sides are unioned and shuffled ONCE on ``keys``;
    within each key the window is a linear scan in timestamp order
    (``last(..., ignorenulls)`` over unbounded-preceding). Skewed keys can
    be ranged-salted only if the gap tolerance is bounded; for unbounded
    as-of the per-key scan is inherent (same as any sort-based
    implementation, cf. kdb/QuestDB asof).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    payload = F.struct(
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    # Order: ts, then side (right rows at ts == left ts sort FIRST, so a
    # tie is a match — the conventional `<=` as-of semantics).
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__match.{prefix}{right_ts}").alias(f"{prefix}{right_ts}")
    ] + [F.col(f"__match.{prefix}{c}").alias(f"{prefix}{c}") for c in right_cols]
    return matched.select(*out_cols)


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row into the band with ``lo <= value < hi``.

    The band table is broadcast, so the physical plan is a
    BroadcastNestedLoopJoin over a tiny build side — O(|facts| * |bands|)
    comparisons but zero shuffle of the fact table. For a LARGE band
    table, rewrite as an equi-join: bucketize ``value`` and band ranges to
    a common grid, join on bucket, then re-apply the range predicate.
    """
    cond = (F.col(value_col) >= bands[lo_col]) & (F.col(value_col) < bands[hi_col])
    return facts.join(F.broadcast(bands), cond, how)


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """Backward as-of join via ``cogroup().applyInPandas`` + per-key
    ``pd.merge_asof`` — the Arrow/pandas twin of :func:`asof_join`.

    Same contract as asof_join (every left row; latest right row with
    ``right_ts <= left_ts`` per key; NULLs when none precedes), so the
    two implementations cross-check each other in tests.

    When to prefer which: the JVM union+window form stays in whole-stage
    codegen and is the default; this cogroup form is the template for
    as-of variants the window trick can't express (nearest-in-time with
    tolerance, multi-column nearest) — pandas' merge_asof exposes those
    directly. Scale shape is identical: ONE shuffle of each side on
    ``keys``, then per-key linear merges, Arrow-batched."""
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    # Alias every right payload column BEFORE the cogroup. This both (a)
    # gives the pandas side its final output names and (b) mints fresh
    # expression IDs: when left and right derive from the same parent
    # DataFrame, shared-exprId payload columns get pruned off one side of
    # the cogroup plan (the self-join ambiguity problem) — observed as the
    # right pandas frame silently missing its ts column.
    renamed = {c: f"{prefix}{c}" for c in [right_ts, *right_cols]}
    r = right.select(
        *keys, *[F.col(c).alias(renamed[c]) for c in [right_ts, *right_cols]]
    )
    out_fields = list(left.schema.fields)
    rsch = {f.name: f for f in r.schema.fields}
    for c in [right_ts, *right_cols]:
        out_fields.append(StructField(renamed[c], rsch[renamed[c]].dataType, True))
    schema = StructType(out_fields)
    lcols = list(left.columns)
    r_ts = renamed[right_ts]
    payload = [renamed[c] for c in [right_ts, *right_cols]]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if rpdf.empty:
            out = lpdf.copy()
            for c in payload:
                out[c] = None
            return out
        rpdf = rpdf.sort_values(r_ts, kind="mergesort").drop(columns=keys)
        out = pd.merge_asof(
            lpdf, rpdf, left_on=left_ts, right_on=r_ts, direction="backward"
        )
        return out[lcols + payload]

    return (
        left.groupBy(*keys)
        .cogroup(r.groupBy(*keys))
        .applyInPandas(merge, schema)
    )
