"""Row-format sources/sinks beyond parquet: JSONL and CSV.

Parquet is the engine's primary format (columnar, statistics, pruning);
JSONL/CSV exist because real corpora arrive in them. Both readers accept
an explicit schema — at 100 TB schema inference means a full extra pass,
so production calls should always pass one (the helpers infer only when
``schema=None`` for interactive use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_jsonl_permissive(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """JSONL reader that quarantines malformed lines instead of failing the
    job (web-scale corpora always contain some): bad rows land with their
    raw text in ``_corrupt_record`` and NULLs elsewhere — filter on it to
    route rejects to a quarantine sink. Schema is REQUIRED (PERMISSIVE
    needs the corrupt column declared up front). Caveat: a query that
    references ONLY ``_corrupt_record`` (e.g. ``.count()`` after filtering
    on it) raises QUERY_ONLY_CORRUPT_RECORD_COLUMN — keep a data column in
    the projection or cache first."""
    if isinstance(schema, str):
        schema = schema + ", _corrupt_record string"
    else:
        from pyspark.sql.types import StringType, StructField

        schema = StructType(list(schema.fields) + [StructField("_corrupt_record", StringType())])
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (self-describing columnar; schema travels in the file)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
