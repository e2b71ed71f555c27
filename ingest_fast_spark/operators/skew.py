"""Skew-mitigation operators.

AQE's skew-join splitting handles skewed JOINS automatically (enabled in
session.py); skewed AGGREGATION keys need the salting pattern below: a
random salt splits each hot key across ``salt_buckets`` reducers for the
partial aggregate, and a second (tiny) aggregate combines the partials.
Spark's map-side partial aggregation already covers most cases — salting
matters when the partial aggregate itself can't reduce enough (e.g.
collect_list/collect_set of many values per hot key, or extreme
single-key skew where one reducer would own the key's entire tail).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_agg, final_agg) per supported measure: the final combines the
# per-salt partials. count → sum of partial counts, avg → sum/sum.
_COMBINE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: list[tuple[str, str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(keys + salt) → groupBy(keys).

    ``measures`` is [(col, fn, alias)] with fn in count/sum/min/max (avg =
    sum/count at the call site). Result is identical to a plain
    ``df.groupBy(keys).agg(...)``; the salt only changes the shuffle
    distribution (each hot key fans across ``salt_buckets`` reducers).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_COMBINE[fn][0](F.col(col)).alias(f"__p_{alias}") for col, fn, alias in measures]
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[fn][1](F.col(f"__p_{alias}")).alias(alias) for _, fn, alias in measures]
    )


def salted_collect_set(
    df: DataFrame, keys: list[str], value: str | Column, alias: str = "values",
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted set-collection: per-salt collect_set partials, then a flatten
    + distinct combine — the aggregation shape that genuinely needs
    salting (a hot key's value list otherwise lands on one reducer)."""
    value_col = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.collect_set(value_col).alias("__part")
    )
    return partial.groupBy(*keys).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("__part")))).alias(alias)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Manual salted equi-join for when AQE can't help (e.g. the skewed
    side feeds a co-partitioned downstream op, or runtime stats are
    unavailable): the big side gets a random salt in [0, salt_buckets),
    the small side is REPLICATED once per salt value (explode of a
    literal range — cost: |small| × salt_buckets rows, which is the price
    of distributing each hot key over ``salt_buckets`` reducers), and the
    join key becomes (key, salt). Result is row-identical to the plain
    join."""
    salted_big = big.withColumn("__salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(replicated_small, [key, "__salt"], how).drop("__salt")
