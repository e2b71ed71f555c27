#!/usr/bin/env python
"""Round-9 growth study ON THE SAME sf5 dataset (within-dataset ratios
are the signal; /tmp regenerations make cross-round absolutes
incomparable): the round-9 operator surface — line-frequency boilerplate
scrub, Sinkhorn OT, in-engine logreg training, Holt-Winters, the
ingest/normalization wave (WARC, URL, NFC, TIFF, PDF with the full
filter mix incl. per-byte Python LZW), the two linkage/mining joins —
plus the r8 continuity canaries. Min-of-2, noop sink, one JVM.

Usage: python tools/x50_study.py [out.json] [mult]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

QUERIES = [
    # round-9 second wave
    "text_boilerplate_scrub",
    "curation_sinkhorn_ot",
    "quality_train_logreg",
    "events_holt_winters",
    "multimodal_tiff_roundtrip",
    # round-9 first wave (ingest/normalization + the two join queries)
    "multimodal_warc_extract",
    "web_url_canonicalize",
    "text_unicode_normalize",
    # bitext_mining_margin is EXCLUDED from the growth study on the
    # record (the dbscan_lsh precedent): it is the exact ALL-PAIRS
    # baseline — |src|x|tgt| scored pairs is ~2.5e9 rows at sf5 by
    # definition (OOMed the study JVM); the scale path feeds candidate
    # pairs from ivf_topk/cosine_near_dup_lsh into the same margin
    # algebra, which is pair-source-agnostic.
    "linkage_fellegi_sunter",
    "multimodal_png_advanced_roundtrip",
    # PDF now rotates ALL five content filters (Python LZW per byte —
    # the expensive one); watch its constant vs the r8 flate-only run
    "multimodal_pdf_text",
    "multimodal_jpeg_roundtrip",
    # round-9 third wave (the session-2 additions): web curation,
    # preference fit, seq2seq shaping, sketch compression, diversified
    # rerank, EXIF/audio/video features, resize/frame attestations,
    # compression signal, code routing, layout advisor, truncation audit
    "web_url_filter",
    "web_robots_rules",
    "preference_bradley_terry",
    "pack_span_corruption",
    "dedup_bbit_minhash",
    "search_mmr_rerank",
    "multimodal_exif",
    "multimodal_audio_filterbank",
    "multimodal_motion_energy",
    "multimodal_resize_attest",
    "multimodal_frame_sample",
    "quality_compression_invariants",
    "embed_matryoshka_recall",
    "text_code_detect",
    "layout_partition_advisor",
    "graph_assortativity",
    "stream_percentile_windowed",
    "curation_epoch_schedule",
    "ivm_incremental_topk",
    # continuity canaries from the r8 study
    "dedup_winnowing",
    "dedup_winnowing_fast",
    "dedup_minhash_lsh",
    "dedup_weighted_minhash",
    "graph_clustering_coefficient",
    "agg_bootstrap_ci_fast",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_x50_r09.json"
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
            "Round-9 growth study: the second-wave operators (boilerplate "
            "scrub, Sinkhorn OT, logreg training, Holt-Winters, TIFF), the "
            "first-wave ingest/normalization and linkage queries, the PDF "
            "filter-mix constant, and the r8 continuity canaries."
        ),
        "min_of_2": {k: min(v) for k, v in runs.items()},
        "runs": runs,
    }
    with open(out_path, "w") as f:
        json.dump(art, f)
    print(json.dumps(art["min_of_2"]))


if __name__ == "__main__":
    main()
