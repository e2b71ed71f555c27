"""Binary-file source: raw media ingestion for multimodal pipelines.

`spark.read.format("binaryFile")` is the built-in whole-file source —
one row per file with (path, modificationTime, length, content:binary).
This wrapper adds the typed-metadata convention the multimodal operators
(operators/multimodal.py) expect: a content-sniffed ``media_type`` (magic
bytes, JVM-side — no UDF) and the filename extension.

Scale notes: the source is listing-parallel and assigns whole files to
tasks respecting ``spark.sql.files.maxPartitionBytes``; it never splits a
file, so very large media files bound task memory — pair with
``pathGlobFilter`` + a ``length`` filter pushed to the listing. For
billions of small files, pack them into parquet (binary column) once via
this source and read the parquet thereafter: parquet scan beats file
listing by orders of magnitude at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# magic-byte prefix (hex, uppercase) → media type
_MAGIC = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "riff"),  # container: wav/webp/avi — refined below
    ("494433", "audio/mpeg"),
    ("664C6143", "audio/flac"),
    ("1A45DFA3", "video/webm"),
]


def media_type_col(content=None):
    """Content-sniffed media type from magic bytes — pure JVM expressions
    (hex of a binary prefix), no Python in the scan path."""
    if content is None:
        content = F.col("content")
    head = F.upper(F.hex(F.substring(content, 1, 8)))
    expr = F.lit("application/octet-stream")
    # build the when-chain in reverse so earlier entries take priority
    for prefix, mtype in reversed(_MAGIC):
        if mtype == "riff":
            # RIFF container: bytes 9-12 name the subformat
            sub = F.upper(F.hex(F.substring(content, 9, 4)))
            riff = (
                F.when(sub == "57415645", "audio/wav")      # WAVE
                .when(sub == "57454250", "image/webp")       # WEBP
                .otherwise("application/riff")
            )
            expr = F.when(head.startswith(prefix), riff).otherwise(expr)
        else:
            expr = F.when(head.startswith(prefix), mtype).otherwise(expr)
    return expr


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Read a directory of media files into the multimodal row convention:
    (uri, file_name, ext, media_type, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        # length is a listing-level column: this prunes before content read
        df = df.filter(F.col("length") <= max_bytes)
    return df.select(
        F.col("path").alias("uri"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.lower(F.element_at(F.split(F.col("path"), r"\."), -1)).alias("ext"),
        media_type_col().alias("media_type"),
        "length",
        "content",
    )
