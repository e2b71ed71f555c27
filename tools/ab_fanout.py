#!/usr/bin/env python
"""One-JVM interleaved A/B of ensure_parallelism's fan-out target for the
tiny-input mapInPandas rows (VERDICT r9 item 3): times each named query at
several partition targets by rebinding catalog.ensure_parallelism in every
consumer module, min-of-N noop-sink per (query, target), interleaved
round-robin so host drift hits all targets equally.

Usage: python tools/ab_fanout.py [--targets 32,16,8,4,2] [--repeat 3] name...
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--targets", default="32,16,8,4,2")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    targets = [int(t) for t in args.targets.split(",")]

    from ingest_fast_spark import catalog
    from ingest_fast_spark.queries import QUERIES
    from ingest_fast_spark.session import get_spark

    # Rebind ensure_parallelism in every module that imported it by name.
    import ingest_fast_spark.operators.curation as m_cur
    import ingest_fast_spark.operators.dedup as m_dedup
    import ingest_fast_spark.operators.similarity as m_sim
    import ingest_fast_spark.queries.llm as m_llm
    import ingest_fast_spark.queries.pipelineq as m_pq

    consumers = [m_llm, m_pq, m_sim, m_dedup, m_cur, catalog]
    orig = catalog.ensure_parallelism

    def patched_factory(k):
        def ep(df, min_partitions=None):
            return orig(df, min_partitions=min_partitions or k)

        return ep

    spark = get_spark("ab-fanout")
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).count()

    # Warm each query once at the default so codegen/worker startup is paid.
    for name in args.names:
        QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, dict[int, float]] = {n: {} for n in args.names}
    for r in range(args.repeat):
        for k in targets:
            for mod in consumers:
                mod.ensure_parallelism = patched_factory(k)
            for name in args.names:
                t0 = time.perf_counter()
                QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                out[name][k] = min(out[name].get(k, float("inf")), dt)
                gc.collect()
    for mod in consumers:
        mod.ensure_parallelism = orig
    for name in args.names:
        row = "  ".join(f"{k}:{out[name][k]:.2f}" for k in targets)
        print(f"# {name:38} {row}", file=sys.stderr)
    print(json.dumps({n: {str(k): round(v, 3) for k, v in d.items()} for n, d in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
