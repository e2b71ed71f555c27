#!/usr/bin/env python
"""Round-7 x50 growth study: time the MinHash-fed cluster twins against
the baseline-fed variants ON THE SAME sf5 dataset (within-dataset ratios
are the signal; /tmp regenerations make cross-round absolutes
incomparable), plus the round-7 additions. Min-of-2, noop sink, one JVM.

Usage: python tools/x50_study.py [out.json] [mult]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

QUERIES = [
    # the r6 weak-mark clearers: scale twins vs their baseline-fed inputs
    "dedup_soft_weights_fast",
    "dedup_cluster_keep_best_fast",
    "split_cluster_safe_fast",
    "dedup_soft_weights_minhash",
    "dedup_cluster_keep_best_minhash",
    "split_cluster_safe_minhash",
    "dedup_soft_weights",
    "dedup_cluster_keep_best",
    "split_cluster_safe",
    "dedup_minhash_lsh_fast",  # the shared pair source, for attribution
    # round-7 additions
    "embed_topk_ivf_adc",
    "multimodal_png_palette_roundtrip",
    "dedup_winnowing",
    "sketch_cms_report",
    "sketch_hll_report",
    "sketch_kmv_report",
    "multimodal_dedup_phash",
    # (both DBSCAN variants are excluded: at eps=0.3 this corpus's
    # eps-graph is Theta(n^2) DENSE by construction — the synthetic
    # embeddings form 10 broad label clusters, so ~2% of all pairs are
    # eps-neighbors and any edge-materializing DBSCAN is quadratic
    # HERE regardless of pair source; measured 62 s at sf1 for the LSH
    # twin. Production density clustering runs at near-dup eps where
    # edges are sparse; the layers themselves ride the edge list. See
    # BENCHNOTES round-7 second wave.)
    "doc_kn_logppl",
    "events_drift_ks",
    "graph_kcore",
    "decontaminate_semantic",
    # round-7 third wave: the three growth-risky shapes (the shared-
    # neighbor self-join under its hub cap, the x16-seed weighted
    # sampler's pair join, the global-id range exchange) plus the
    # cheap-by-design families to pin their floors
    "graph_common_neighbors",
    "dedup_weighted_minhash",
    "dedup_weighted_minhash_fast",
    "assign_global_ids",
    "graph_bfs_hops",
    "search_phrase_positional",
    "geo_neighbor_join",
    "agg_bootstrap_ci",
    "attribution_credit",
    "stream_cms_windowed",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_x50_r07.json"
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
            "Round-7 growth study: MinHash-fed cluster twins vs the "
            "baseline-fed variants on the same dataset (weak-mark "
            "clearance), the shared LSH pair source for attribution, and "
            "the round-7 additions."
        ),
        "min_of_2": {k: min(v) for k, v in runs.items()},
        "runs": runs,
    }
    with open(out_path, "w") as f:
        json.dump(art, f)
    print(json.dumps(art["min_of_2"]))


if __name__ == "__main__":
    main()
