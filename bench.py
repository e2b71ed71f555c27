#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink (computes every column,
ships nothing to the driver) so the measured time is the real plan cost.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_left_outer",
    "topk_per_group",
    "window_running_agg",
    "sessionize",
    "time_bucket_tumbling",
    "join_asof",
    "agg_percentiles",
    "q14_promo_revenue",
    "q18_large_orders",
    "q7_volume_shipping",
    "q21_waiting_suppliers",
    "udaf_harmonic_mean",
    "fast_table_end_to_end",
    "stream_windowed_counts",
    "dedup_exact",
    "dedup_paragraphs",
    "dedup_ngram_jaccard",
    "dedup_cluster_canonical",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "embed_topk_bruteforce",
    "text_token_stats",
    "text_quality_score",
    "text_repetition_signals",
    "decontaminate_benchmark",
    "pack_training_sequences",
    "q11_inventory_value",
    "merge_upsert_customers",
    "scd2_user_history",
    "build_vocabulary",
    "funnel_stages",
    "curation_domain_cap",
    "text_chunk_overlap",
    "build_inverted_index",
    "timeseries_gapfill_ffill",
    "dedup_semantic",
    "graph_pagerank",
    "events_ohlc",
    "domain_kl_divergence",
    "dedup_jaccard_prefix_filter",
    "quality_model_score",
    "doc_unigram_logppl",
    "event_transition_matrix",
    "sessions_max_concurrency",
    "search_bm25_topk",
    "search_hybrid_rrf",
    "embedding_quantize_int8",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else -1.0

    from ingest_fast_spark.queries import QUERIES
    from ingest_fast_spark.session import get_spark

    spark = get_spark("ingest-fast-bench")

    # Warm the JVM + file metadata cache so q1 doesn't pay startup cost.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # min over repeats: single-shot timings on a shared machine are noisy
    # (observed 2-3x swings); min is the standard stable estimator.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        # Drop the dead DataFrame refs NOW so the JVM ContextCleaner can
        # reclaim localCheckpoint blocks from iterative/multi-consumer
        # queries before the next timing starts (otherwise storage
        # pressure from query N pollutes query N+1's measurement).
        gc.collect()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
