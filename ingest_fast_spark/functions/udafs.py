"""Custom aggregates (UDAFs) as GROUPED_AGG pandas UDFs.

The reference has no UDAF concept (SURVEY.md §2.8 "Not present: UDAF");
this module is the engine's pattern for one: an Arrow-batched vectorized
reduction per group. NOTE: no ``from __future__ import annotations`` here
— pandas_udf resolves the ``pd.Series`` type hints at definition time, so
they must be real objects, not strings.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def harmonic_mean(v: pd.Series) -> float:
    """Harmonic mean n / sum(1/x) — not a Spark builtin. Each group's
    column arrives as one Arrow batch; the reduction is a numpy
    vectorized op, not a Python per-row loop."""
    return float(len(v) / (1.0 / v).sum())


@pandas_udf("long")
def group_size(v: pd.Series) -> int:
    """COUNT(*) as a pandas UDAF — exists because Spark disallows mixing
    GROUPED_AGG pandas UDFs with JVM aggregates in one agg() call
    (INVALID_PANDAS_UDF_PLACEMENT), so companion stats must also be
    pandas-side."""
    return int(len(v))
