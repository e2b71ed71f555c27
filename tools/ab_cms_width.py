#!/usr/bin/env python
"""One-JVM A/B of stream_cms_windowed's state-store count: the r9-opt
round measured full-par (32) vs bytes-width (1) only; this sweeps the
intermediate widths.  Each run executes the REAL streaming query
(AvailableNow, memory sink) through the noop sink, min-of-N, widths
interleaved to cancel drift."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import ingest_fast_spark.queries.streamq as SQ
    from ingest_fast_spark.session import get_spark
    from ingest_fast_spark.streaming import events as SE

    spark = get_spark("ab-cms-width")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    orig_run = SQ._run
    widths = [None, 16, 8, 4]  # None = current full-par decision
    repeat = int(os.environ.get("PROBE_REPEAT", "3"))
    best = {str(w): float("inf") for w in widths}

    # warm the streaming machinery once (first stream query pays ~5 s)
    SQ.QUERY_FNS = None  # no-op attr; keep linters quiet
    from ingest_fast_spark.queries import QUERIES

    QUERIES["stream_cms_windowed"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    for _ in range(repeat):
        for w in widths:
            def patched(df, base_name, output_mode="complete", width=None):
                return orig_run(df, base_name, output_mode, width=w)

            SQ._run = patched
            try:
                spark.sparkContext.setJobDescription(f"cms-width:{w}")
                t0 = time.perf_counter()
                QUERIES["stream_cms_windowed"](spark, SF_DIR).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.perf_counter() - t0
            finally:
                SQ._run = orig_run
            best[str(w)] = min(best[str(w)], dt)
            print(f"# width={w}: {dt:.3f}s", file=sys.stderr)
    print(json.dumps({k: round(v, 3) for k, v in best.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
