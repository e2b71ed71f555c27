#!/usr/bin/env python
"""Round-8 x50 growth study ON THE SAME sf5 dataset (within-dataset
ratios are the signal; /tmp regenerations make cross-round absolutes
incomparable): the winnowing rewrite, the bootstrap twin, the let_col-
fixed shingle family, progressive JPEG. Min-of-2, noop sink, one JVM.

Usage: python tools/x50_study.py [out.json] [mult]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

QUERIES = [
    # round-8 headliners: the map-only winnowing rewrite (r7's one weak
    # mark — was 65-76 s here) + its xxhash64 twin, and the bootstrap
    # CI's md5 vs xxhash64 split
    "dedup_winnowing",
    "dedup_winnowing_fast",
    "agg_bootstrap_ci",
    "agg_bootstrap_ci_fast",
    # the let_col O(n^2) fix touches every shingle builder: re-pin the
    # whole shingle family's growth on the same dataset
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix_filter",
    "dedup_weighted_minhash",
    "dedup_weighted_minhash_fast",
    "dedup_exact_substring",
    "dedup_substring_scrub",
    "search_phrase_positional",
    "text_dedup_sentences_within_doc",
    # progressive JPEG vs baseline at scale (both synthesize + decode)
    "multimodal_jpeg_roundtrip",
    "multimodal_jpeg_progressive",
    # continuity canaries from the r7 study
    "dedup_soft_weights_minhash",
    "graph_common_neighbors",
    "assign_global_ids",
    "graph_clustering_coefficient",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_x50_r08.json"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    from ingest_fast_spark.queries import QUERIES as REG
    from ingest_fast_spark.session import get_spark
    from tools.scale_data import make_scaled

    spark = get_spark("x50-study")
    src = "/root/testdata/sf0.1"
    dst = f"/tmp/spark_graft_scaled_x{mult}"
    t0 = time.perf_counter()
    generated = make_scaled(spark, src, dst, mult)
    print(
        f"# x{mult}: {'generated' if generated else 'reused'} {dst} in "
        f"{round(time.perf_counter() - t0, 1)}s",
        file=sys.stderr,
    )
    runs: dict[str, list[float]] = {}
    for name in QUERIES:
        runs[name] = []
        for _ in range(2):
            gc.collect()
            t0 = time.perf_counter()
            REG[name](spark, dst).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
        print(f"# {name}: {runs[name]}", file=sys.stderr)
    art = {
        "sf": round(0.1 * mult, 3),
        "mult": mult,
        "src": "sf0.1",
        "host": "local[32] quiet",
        "note": (
            "Round-8 growth study: the map-only winnowing rewrite vs its "
            "r7 per-character-shuffle cost (the r7 weak mark), the "
            "xxhash64 bootstrap twin, the let_col-fixed shingle family, "
            "and the progressive-JPEG roundtrip."
        ),
        "min_of_2": {k: min(v) for k, v in runs.items()},
        "runs": runs,
    }
    with open(out_path, "w") as f:
        json.dump(art, f)
    print(json.dumps(art["min_of_2"]))


if __name__ == "__main__":
    main()
