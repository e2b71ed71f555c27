#!/usr/bin/env python
"""One-JVM interleaved A/B of the r10 cosine_near_dup_lsh restructure
(sketch-once checkpoint + narrow band shuffle + attach-after-dedup) vs the
r9 shape (un-barriered sketch, vectors carried through both shuffles).
The old implementation is inlined verbatim so both run in one process —
the only protocol that beats this host's noise."""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_cosine_near_dup_lsh(emb, threshold=0.4, dim=64, nbits=16, bands=4,
                            id_col="vec_id", vec_col="embedding"):
    from ingest_fast_spark.catalog import ensure_parallelism
    from ingest_fast_spark.functions.scalars import lit_doubles
    from ingest_fast_spark.operators.similarity import _hyperplanes, as_double, dot, l2_norm

    planes = _hyperplanes(dim, nbits)
    emb = ensure_parallelism(emb)
    v = as_double(F.col(vec_col))
    bits_per_band = nbits // bands
    band_keys = []
    for bnd in range(bands):
        key = F.lit(0)
        for j in range(bits_per_band):
            plane = lit_doubles(planes[bnd * bits_per_band + j])
            bit = (F.round(dot(v, plane), 6) > 0).cast("int")
            key = key + F.shiftleft(bit, j)
        band_keys.append(F.struct(F.lit(bnd).alias("band"), key.alias("key")))
    sketched = emb.select(
        F.col(id_col).alias("doc_id"),
        v.alias("vec"),
        l2_norm(v).alias("nrm"),
        F.explode(F.array(*band_keys)).alias("bb"),
    ).select(
        "doc_id", "vec", "nrm", F.col("bb.band").alias("band"), F.col("bb.key").alias("key")
    )
    a = sketched.select(
        F.col("doc_id").alias("vec_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), "band", "key",
    )
    b = sketched.select(
        F.col("doc_id").alias("vec_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "band", "key",
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "va", "vb", "na", "nb")
        .dropDuplicates(["vec_a", "vec_b"])
        .select(
            "vec_a", "vec_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def main() -> int:
    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.operators import similarity as S
    from ingest_fast_spark.queries import QUERIES
    from ingest_fast_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-lsh")
    spark.read.parquet(os.path.join(sf, "lineitem.parquet")).count()
    emb = load_table(spark, sf, "embeddings")

    # Row-set equality first: new pairs == old pairs, exactly.
    new_rows = {tuple(r) for r in S.cosine_near_dup_lsh(emb, threshold=0.3).collect()}
    old_rows = {tuple(r) for r in old_cosine_near_dup_lsh(emb, threshold=0.3).collect()}
    assert new_rows == old_rows, (
        f"pair sets differ: {len(new_rows)} new vs {len(old_rows)} old; "
        f"only-new={list(new_rows - old_rows)[:3]} only-old={list(old_rows - new_rows)[:3]}"
    )
    print(f"# parity OK: {len(new_rows)} identical verified pairs", file=sys.stderr)

    variants = {
        "old_pairs": lambda: old_cosine_near_dup_lsh(emb, threshold=0.3),
        "new_pairs": lambda: S.cosine_near_dup_lsh(emb, threshold=0.3),
        "dbscan_lsh_query": lambda: QUERIES["embedding_dbscan_lsh"](spark, sf),
        "dedup_embedding_lsh_query": lambda: QUERIES["dedup_embedding_lsh"](spark, sf),
    }
    for fn in variants.values():
        fn().write.format("noop").mode("overwrite").save()  # warm
    best: dict[str, float] = {}
    for _ in range(3):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best[name] = min(best.get(name, 9e9), time.perf_counter() - t0)
            gc.collect()
    for name, v in best.items():
        print(f"# {name:28} {v:6.3f}s", file=sys.stderr)
    print(json.dumps({k: round(v, 3) for k, v in best.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
