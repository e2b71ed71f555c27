"""Table profiling — the data-quality pass a training-data pipeline runs
before/after every transformation (null ratios, cardinalities, ranges).

One job, one pass over the data: all per-column statistics are computed
in a SINGLE aggregate (not one job per column, which is the common
anti-pattern that turns profiling of a wide table into N full scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def profile_table(df: DataFrame) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, approx_distinct,
    min_str, max_str). Numeric min/max are rendered to strings so all
    columns share one output schema; one wide aggregate row is computed
    and then unpivoted to the long form."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    profiled: list[str] = []
    for field in df.schema.fields:
        if not isinstance(field.dataType, (NumericType, StringType)):
            continue
        c = field.name
        profiled.append(c)
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_null"),
                F.col(f"{c}__distinct").alias("approx_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in profiled
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
