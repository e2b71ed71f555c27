#!/usr/bin/env python
"""Optimization probe: capture .explain("formatted") plans and same-JVM
min-of-N noop-sink timings for named queries.

Usage:
  python tools/opt_probe.py [--plans-dir plans/r09] [--suffix before] \
      [--sf-dir /root/testdata/sf0.1] [--repeat 3] [--no-time] name [name ...]

Writes plans/<dir>/<name>_<suffix>.txt and prints one JSON line with the
timings, so before/after evidence comes from one JVM (the only protocol
that beats host noise — see .claude/skills/verify).
"""

from __future__ import annotations

import argparse
import gc
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default="plans/r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    from ingest_fast_spark.queries import QUERIES
    from ingest_fast_spark.session import get_spark

    spark = get_spark("opt-probe")
    os.makedirs(args.plans_dir, exist_ok=True)

    # Warm the JVM + metadata cache like bench.py does.
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in args.names:
        fn = QUERIES[name]
        if not args.no_plan:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"# plan -> {path}", file=sys.stderr)
        if not args.no_time:
            spark.sparkContext.setJobDescription(f"probe:{name}")
            best = float("inf")
            for _ in range(args.repeat):
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            spark.sparkContext.setJobDescription(None)
            print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
            gc.collect()
    print(json.dumps({"sf_dir": args.sf_dir, "repeat": args.repeat, "queries": timings}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
