#!/usr/bin/env python
"""One-JVM interleaved A/B on the x10 dataset: AQE
coalescePartitions.minPartitionSize 64kb (current) vs 1b (the r8 pin),
for the minhash family rows whose x10 growth factors jumped this round."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingest_fast_spark.queries import QUERIES
from ingest_fast_spark.session import get_spark

X10 = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scaled_x10")
NAMES = sys.argv[1:] or [
    "dedup_minhash_lsh",
    "minhash_scurve_report",
    "dedup_soft_weights_minhash",
    "dedup_weighted_minhash",
]
KEY = "spark.sql.adaptive.coalescePartitions.minPartitionSize"


def main() -> int:
    spark = get_spark("ab-aqe-floor-x10")
    spark.read.parquet(os.path.join(X10, "documents.parquet")).count()
    repeat = int(os.environ.get("PROBE_REPEAT", "2"))
    best: dict[str, dict[str, float]] = {n: {} for n in NAMES}
    for _ in range(repeat):
        for floor in ("64kb", "1b"):
            spark.conf.set(KEY, floor)
            for n in NAMES:
                spark.sparkContext.setJobDescription(f"aqe:{floor}:{n}")
                t0 = time.perf_counter()
                QUERIES[n](spark, X10).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best[n][floor] = min(best[n].get(floor, float("inf")), dt)
                print(f"# {floor} {n}: {dt:.3f}s", file=sys.stderr)
    spark.conf.set(KEY, "64kb")
    print(json.dumps({n: {k: round(v, 3) for k, v in d.items()} for n, d in best.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
