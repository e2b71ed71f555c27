#!/usr/bin/env python
"""One-JVM phase split of dedup_winnowing_fast (xxhash64 twin):
chunks (substr/explode) -> +hash -> +sliding-min selection -> +explode/
distinct -> full pair rollup.  min-of-N noop per phase."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.operators import dedup as D
from ingest_fast_spark.operators.dedup import (
    WINNOW_CHUNK_GRAMS,
    WINNOW_HASH_MOD,
    _WINNOW_LOCAL_MOD,
    _winnow_chunk_selects,
    let_col,
)
from ingest_fast_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K, W = 16, 4


def chunks_frame(df):
    s = df.filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull()).select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("s"),
    )
    n = (F.length("s") - F.lit(K - 1)).cast("long")
    chunk = WINNOW_CHUNK_GRAMS
    return (
        s.filter(F.length("s") >= K + W - 1)
        .select(
            "doc_id",
            "s",
            n.alias("n"),
            F.explode(
                F.sequence(F.lit(0), F.ceil(n / F.lit(chunk)).cast("long") - 1)
            ).alias("c"),
        )
        .select(
            "doc_id",
            F.greatest(F.lit(1).cast("long"), F.col("c") * chunk - (W - 2)).alias("g0"),
            F.least((F.col("c") + 1) * chunk, F.col("n")).alias("g1"),
            "s",
        )
        .select(
            "doc_id",
            "g0",
            F.col("s")
            .substr(F.col("g0").cast("int"), (F.col("g1") - F.col("g0") + K).cast("int"))
            .alias("sub"),
        )
    )


def hash_only(df):
    # chunks + per-gram xxhash64 composites, NO window selection
    def hs_of(sub):
        m = (F.length(sub) - F.lit(K - 1)).cast("int")
        return F.transform(
            F.sequence(F.lit(1), m),
            lambda j: F.pmod(F.xxhash64(sub.substr(j, F.lit(K))), F.lit(WINNOW_HASH_MOD))
            * _WINNOW_LOCAL_MOD
            + (F.lit(_WINNOW_LOCAL_MOD - 1) - j.cast("long")),
        )

    ch = chunks_frame(df)
    hs = let_col(F.col("sub"), hs_of)
    # reduce to a long so noop doesn't ship giant arrays (sum of composites)
    return ch.select(
        "doc_id", "g0",
        F.aggregate(hs, F.lit(0).cast("long"), lambda a, x: a.bitwiseXOR(x)).alias("z")
    )


def main() -> int:
    spark = get_spark("probe-winnow-fast")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    d = load_table(spark, SF_DIR, "documents")
    repeat = int(os.environ.get("PROBE_REPEAT", "3"))

    phases = {
        "A_chunks": lambda: chunks_frame(d),
        "B_chunks+hash": lambda: hash_only(d),
        "C_selection": lambda: _winnow_chunk_selects(
            d, "text", "doc_id", K, W, WINNOW_CHUNK_GRAMS, False
        ),
        "D_fingerprints": lambda: D.winnow_fingerprints(
            d, k=K, w=W, portable=False
        ),
        "E_full_pairs": lambda: D.winnow_pairs(
            d, k=K, w=W, min_shared=8, max_doc_freq=20, portable=False
        ),
    }
    out = {}
    for name, fn in phases.items():
        spark.sparkContext.setJobDescription(f"winnowfast:{name}")
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
