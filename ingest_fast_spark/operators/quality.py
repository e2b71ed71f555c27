"""Data-quality constraint checking — the acceptance gate between
pipeline stages (the reference's only "constraint" is a malformed-doc
filter, lib/ingest.js:304-307; real ingest needs declared expectations).

All scalar rules (not-null / accepted-values / range) fold into ONE
aggregate pass over the table; uniqueness is a single groupBy; referential
integrity is a left-anti join against the (broadcast) dimension keys. The
report is one tiny DataFrame: (rule, violations) — feed it to an alerting
sink or `.filter("violations > 0")` to fail the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, object]:
    return (f"not_null({col})", F.col(col).isNull())

def accepted_values(col: str, values: list) -> tuple[str, object]:
    return (f"accepted_values({col})", ~F.col(col).isin(values) | F.col(col).isNull())

def in_range(col: str, lo, hi) -> tuple[str, object]:
    return (f"range({col})", ~F.col(col).between(lo, hi) | F.col(col).isNull())


def check_constraints(df: DataFrame, rules: list[tuple[str, object]]) -> DataFrame:
    """Scalar rules → (rule, violations). One aggregate job regardless of
    rule count: each rule is a conditional count over the same scan."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules
    ]
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("rule"), F.col(name).alias("violations"))
            for name, _ in rules
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select("p.*")


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """(rule, violations) where violations = rows beyond the first of any
    duplicated key (0 = key is unique)."""
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("violations"))
    )
    return dupes.select(
        F.lit(f"unique({', '.join(cols)})").alias("rule"), "violations"
    )


def check_referential(
    df: DataFrame, fk: str, dim: DataFrame, pk: str
) -> DataFrame:
    """(rule, violations) where violations = fact rows whose non-null FK
    has no match in the dimension — a broadcast anti join, the dimension
    key set being the small side by construction."""
    orphans = (
        df.filter(F.col(fk).isNotNull())
        .join(F.broadcast(dim.select(F.col(pk).alias(fk)).distinct()), fk, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return orphans.select(F.lit(f"referential({fk})").alias("rule"), "violations")


def quality_report(
    df: DataFrame,
    scalar_rules: list[tuple[str, object]] | None = None,
    unique: list[list[str]] | None = None,
    referential: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Union of all constraint checks → (rule, violations)."""
    parts = []
    if scalar_rules:
        parts.append(check_constraints(df, scalar_rules))
    for cols in unique or []:
        parts.append(check_unique(df, cols))
    for fk, dim, pk in referential or []:
        parts.append(check_referential(df, fk, dim, pk))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compression_ratios(df, text_col: str = "text", id_col: str = "doc_id",
                       level: int = 6):
    """Per-document zlib compression ratio — the cheap information-density
    signal web-curation pipelines (Dolma, RefinedWeb) gate on: templated
    or repetitive pages compress far better than prose, and near-random
    noise barely compresses at all. Emits (doc_id, n_bytes,
    c_bytes, ratio_micro) with ratio = compressed/uncompressed in int64
    micro-units. Arrow-batched mapInPandas; one document in memory at a
    time. The compressed LENGTH is deterministic for a fixed zlib level
    but not SQL-derivable — the oracle-attested face of this signal is
    ``quality_compression_invariants``."""
    import math

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("c_bytes", LongType()),
            StructField("ratio_micro", LongType()),
        ]
    )

    def extract(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            ids, nb, cb, rm = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = str(t).encode("utf-8")
                c = len(zlib.compress(raw, level))
                ids.append(i)
                nb.append(len(raw))
                cb.append(c)
                rm.append(math.floor(c * 1e6 / len(raw) + 0.5) if raw else None)
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "c_bytes": cb, "ratio_micro": rm}
            )

    return df.mapInPandas(extract, schema)
