#!/usr/bin/env python
"""Driver-side plan-CONSTRUCTION cost per headliner: time fn(spark, sf_dir)
(DataFrame build only, no action).  Construction is paid inside every timed
bench repeat, so >100 ms here is real bench seconds."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from bench import HEADLINE
    from ingest_fast_spark.queries import QUERIES
    from ingest_fast_spark.session import get_spark

    spark = get_spark("probe-construction")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    out = {}
    for name in HEADLINE:
        if name.startswith("stream_"):
            continue  # construction EXECUTES the stream; skip
        fn = QUERIES[name]
        fn(spark, SF_DIR)  # warm (schema cache, imports)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    for k, v in sorted(out.items(), key=lambda x: -x[1])[:25]:
        print(f"# {v:6.3f}  {k}", file=sys.stderr)
    dump = os.environ.get("SPARK_GRAFT_CONSTR_DUMP")
    if dump:
        with open(dump, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"total_construction": round(sum(out.values()), 2), "n": len(out)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
