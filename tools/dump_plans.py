#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for representative
queries, annotated with what each plan proves about scale behavior.
Run: python tools/dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    (
        "q1_pricing_summary",
        "Scan→filter→hash-agg: the filter reaches the parquet scan "
        "(PushedFilters), only the 7 needed columns are read (ReadSchema), "
        "and the aggregate is a map-side partial + final pair.",
    ),
    (
        "q5_region_revenue",
        "6-table star join: every dimension is a BroadcastHashJoin; the "
        "only exchanges are the lineitem⋈orders co-partition and the "
        "final 25-group aggregate.",
    ),
    (
        "q21_waiting_suppliers",
        "Decorrelated EXISTS/NOT-EXISTS: order-level supplier stats are "
        "computed once and joined back — no per-row subquery, two "
        "orderkey shuffles total.",
    ),
    (
        "filter_project",
        "Minimal projection: predicate pushdown + column pruning proof "
        "(ReadSchema lists 6 of lineitem's 11 columns).",
    ),
    (
        "join_asof",
        "As-of join as union+window: one shuffle on the join key, no "
        "range-candidate explosion.",
    ),
    (
        "dedup_minhash_lsh",
        "MinHash-LSH: signatures computed JVM-side (engine-portable "
        "md5-derived families, one hash per shingle), banded buckets are "
        "the shuffle key, exact-verify touches only candidate pairs.",
    ),
    (
        "dedup_jaccard_prefix_filter",
        "AllPairs/PPJoin prefix filtering: candidates join only on each "
        "doc's rarest shingles (frequent-shingle skew keys never fan "
        "out) with size-ratio pruning; exact verify, zero recall loss.",
    ),
    (
        "dedup_exact_substring",
        "Exact-substring dedup (Lee et al. 2022 family): positional "
        "8-grams join on 8-byte xxhash64 keys (the blocking key — only "
        "docs sharing a gram meet), then the diagonal gaps-and-islands "
        "runs as one window + two hash aggregates. No cartesian, no "
        "driver collect; fan-out tracks genuinely shared text.",
    ),
    (
        "quality_model_score",
        "Model-based quality filter: feature extraction + logistic "
        "scoring fused into one codegen'd scan — no Exchange anywhere "
        "in the plan.",
    ),
    (
        "decontaminate_benchmark",
        "Decontamination: the benchmark shingle-hash set broadcasts; the "
        "corpus side is probed map-only before the per-doc count.",
    ),
    (
        "pack_training_sequences",
        "Sequence packing: a single Window pass partitioned by source — "
        "one shuffle, running sum, no global sort.",
    ),
    (
        "q2_min_cost_supplier",
        "TPC-H Q2 over the synthetic partsupp: the correlated MIN is a "
        "per-part aggregate broadcast back onto the costs; every dim "
        "broadcasts; integer-cents comparisons.",
    ),
    (
        "fuzzy_name_pairs",
        "SymSpell-style fuzzy linkage: deletion-variant equi-join "
        "generates candidates (no n² pair scan); levenshtein verifies "
        "only candidates.",
    ),
    (
        "curation_domain_cap",
        "Per-domain quota: the rank<=cap predicate compiles to a "
        "Partial+Final WindowGroupLimit (each task ships only its local "
        "top-cap per source into the shuffle); per-domain totals join "
        "back as a BroadcastHashJoin.",
    ),
    (
        "timeseries_gapfill_ffill",
        "Gap-fill + forward-fill: the date spine is an explode off the "
        "per-user span aggregate (narrow), the fill is one window pass "
        "over the same user partitioning.",
    ),
    (
        "dedup_bloom_prefilter",
        "Bloom admission pre-filter: the set-bit positions (≤ m ints, the "
        "relational twin of the broadcast bit array) broadcast into the "
        "probe; the only corpus-sized shuffle is the exact-membership leg "
        "the filter exists to replace — kept in-plan to measure it.",
    ),
    (
        "text_heavy_hitters",
        "Exact heavy hitters: one bounded MapInPandas stage emits the "
        "Misra-Gries candidate superset, which broadcasts into the exact "
        "recount — the full token stream never shuffles on the token key.",
    ),
    (
        "bpe_train_merges",
        "BPE training: after the single corpus-sized word groupBy, each "
        "merge round is a vocabulary-sized pair count + 1-row argmax "
        "broadcast + map-only replace; rounds are checkpoint-barriered so "
        "the plan stays linear.",
    ),
    (
        "embed_hard_negatives",
        "Label-masked hard negatives: queries broadcast into a "
        "per-partition GEMM (mask applied inside the kernel), local top-k "
        "per partition, global window ranks only partitions×k candidates.",
    ),
    (
        "quality_quarantine",
        "Quarantine gate: five reason rules as Column expressions over one "
        "codegen'd scan — zero exchanges, zero Python; the cheapest stage "
        "of the pipeline by construction.",
    ),
    (
        "curation_dsir_weights",
        "DSIR importance weights: the md5 bucket hash is computed once per "
        "DISTINCT vocabulary word, the 1024-bucket LM ratio table and the "
        "word→ratio map both broadcast, so the raw-corpus scoring pass is "
        "map-only after one vocabulary-sized aggregate.",
    ),
    (
        "events_anomaly_zscore",
        "Rolling z-score anomaly scan: exactly one hash exchange (the "
        "per-user sort for the 20-row trailing frame); count/avg/stddev "
        "share the frame, and the flag filter compares the rounded z.",
    ),
    (
        "search_ndcg_eval",
        "Retrieval eval: corpus never shuffles (per-partition GEMM local "
        "top-k); label lookups and per-query relevant totals ride "
        "broadcast joins against the 5-row query table; metric math "
        "touches ≤ k rows per query.",
    ),
    (
        "dedup_soft_weights_fast",
        "MinHash-fed cluster layer (round-7 scale twin): the checkpointed "
        "signature frame feeds the banded candidate join; CC rounds ride "
        "their own checkpoints; the weights layer is one cluster-keyed "
        "count plus a join back — same exchanges as the baseline-fed "
        "variant, only the pair source changed.",
    ),
    (
        "embed_topk_ivf_adc",
        "IVF×ADC fusion: coarse assignment is a map-side max_by over the "
        "broadcast centroid table (full-dim vectors die here); candidates "
        "ride (bucket, sub, code) ints; probe set and per-query distance "
        "tables broadcast; final rollup keys on (query_id, vec_id).",
    ),
    (
        "multimodal_png_palette_roundtrip",
        "Paletted-PNG attestation: two chained map-only mapInPandas "
        "passes (synthesize, decode) — zero exchanges, payload bytes "
        "never leave their executor.",
    ),
    (
        "sketch_hll_report",
        "HyperLogLog register build: groupBy(register).max(rho) partial-"
        "aggregates map-side, so at most m=256 rows leave any task "
        "regardless of corpus size; estimate/exact legs broadcast into "
        "the 256-row output.",
    ),
    (
        "sketch_kmv_report",
        "KMV: the per-partition k-min heap pass bounds every task's "
        "output at k=256 rows before the distinct+take-ordered reduce; "
        "the only corpus-sized exchanges are the exact union/Jaccard "
        "legs the report exists to compare against.",
    ),
    (
        "embedding_dbscan",
        "DBSCAN: degree count, core semi-joins, CC rounds, and the "
        "border min-cluster aggregate all ride the sparse eps-EDGE list "
        "(checkpointed once); corpus vectors never shuffle — the GEMM "
        "pair source broadcasts the normalized matrix.",
    ),
    (
        "doc_kn_logppl",
        "Kneser-Ney: one bigram-type aggregate feeds ALL four KN "
        "statistics (no count_distinct expansion over the corpus "
        "stream); vocabulary-bounded count tables join AQE-planned, the "
        "doc rollup is the only other exchange.",
    ),
    (
        "embedding_jl_distortion",
        "JL projection: the 32x64 Gaussian matrix folds into the plan "
        "as literals — 32 HOF dot products per row, entirely map-only, "
        "zero hash exchanges; the summary is a single-partition "
        "aggregate broadcast back.",
    ),
    (
        "dedup_substring_scrub",
        "Substring scrub: positional-gram equi-join blocks the span "
        "discovery; island and interval-merge windows ride the sparse "
        "span list (never the corpus); the cleaned-text rebuild is "
        "map-only array HOFs after a left join.",
    ),
    (
        "assign_global_ids",
        "Dense global ids: NO SinglePartition exchange anywhere — the "
        "range exchange is pinned behind a checkpoint scan, the "
        "row_number windows BY PARTITION ID, and the cumulative offsets "
        "come back as a BroadcastHashJoin of one row per partition.",
    ),
    (
        "graph_bfs_hops",
        "Multi-source BFS: each round is one frontier⋈edges hash join "
        "plus a LeftAnti against the visited set, both reading "
        "checkpointed state (Scan ExistingRDD) — shuffle volume tracks "
        "the frontier, never the corpus.",
    ),
    (
        "graph_common_neighbors",
        "Friends-of-friends: the self-join keys on the shared neighbor "
        "after the degree cap's left-semi prune, so per-key fanout is "
        "bounded; Jaccard degrees join back as two node-keyed hash "
        "joins on the bounded pair list.",
    ),
    (
        "dedup_weighted_minhash",
        "Consistent weighted sampling: tf is one partial+final hash "
        "aggregate; the per-(doc, seed) argmin is a partial-aggregable "
        "min_by (objectHashAggregate, no window over the corpus); "
        "candidates come from the (seed, shingle) equi-join after the "
        "hot-bucket window prunes — no cartesian anywhere.",
    ),
    (
        "search_phrase_positional",
        "Positional phrase query: the 3-row query table broadcasts into "
        "the postings scan FIRST, so the (doc, pos+k) positional joins "
        "only ever shuffle postings of the query terms.",
    ),
    (
        "dedup_winnowing",
        "Map-only MOSS selection: the gram stream never shuffles — the "
        "in-row sparse-table window minimum feeds ONE repartition(fp) "
        "that serves the distinct, the df-guard window and the bounded "
        "bucket collect; the pair rollup is the only other exchange.",
    ),
    (
        "agg_bootstrap_ci_fast",
        "Poisson bootstrap, xxhash64 path: the x32 replicate explode is "
        "map-only codegen arithmetic; both aggregates are map-side "
        "combinable; the order-statistic step touches 32 values/group.",
    ),
    (
        "multimodal_pdf_text",
        "PDF synthesize + extract as two chained map-only mapInPandas "
        "passes — zero exchanges; the ISO 32000 parser runs Arrow-batched "
        "in the executors.",
    ),
    (
        "ivm_incremental_join",
        "Delta-rule join maintenance: the three delta legs join "
        "changeset-sized sides (AQE-broadcast here, bucketed probes in "
        "production); the merge re-aggregates |groups|+|delta| rows.",
    ),
    (
        "privacy_t_closeness",
        "Release-gate distance: one corpus-keyed cell aggregate; the "
        "global distribution and 1-row total broadcast into a "
        "|classes| x |segments| grid that never touches the corpus again.",
    ),
    (
        "layout_zorder_report",
        "Z-order report: the Morton key is a single codegen'd integer "
        "expression over the scan; one partial+final aggregate over 256 "
        "static buckets — no sort, no range exchange, no Python.",
    ),
    (
        "text_boilerplate_scrub",
        "Line-frequency boilerplate scrub (round 9): in-plan line "
        "synthesis is pure codegen; the count-distinct line-df aggregate "
        "and its join-back are the only corpus-keyed exchanges (the hot "
        "boilerplate key is probe-side only — AQE skew split applies), "
        "then one doc_id reassembly.",
    ),
    (
        "curation_sinkhorn_ot",
        "Sinkhorn OT (round 9): token counting is a two-phase hash agg; "
        "the V-row support and V×V Gibbs kernel ride broadcasts; the "
        "fixed-point solve runs inside one Arrow batch per source "
        "(applyInPandas) — a million domains = a million independent "
        "tiny solves, no driver traffic.",
    ),
    (
        "events_holt_winters",
        "Holt-Winters (round 9): the corpus-sized work is one daily "
        "count aggregate; the sequential recurrence rides the BOUNDED "
        "per-type daily series inside applyInPandas (365 rows/type/year "
        "at any corpus size).",
    ),
    (
        "multimodal_tiff_roundtrip",
        "TIFF synthesize + decode (round 9): two chained map-only "
        "mapInPandas passes — zero exchanges; strips decode Arrow-batched "
        "in the executors.",
    ),
    (
        "bitext_mining_margin",
        "Margin-criterion bitext mining (round 9, rewritten): the "
        "cross-score is the blocked broadcast GEMM (one Arrow pass per "
        "source block against the broadcast target matrix, numpy dot), "
        "localCheckpointed once and consumed by both k-NN normalizers "
        "and the final argmax — not a per-pair HOF cosine; a dense-pair "
        "gate bounds the exact baseline and points to the LSH path.",
    ),
    (
        "pack_span_corruption",
        "T5 span-corruption shaping (round 9): the hash-noise mask, span "
        "merge, and sentinel count are ONE fused whole-stage-codegen "
        "projection over sequence() HOFs — zero exchanges, zero Python; "
        "corruption is reproducible because it is seeded by (doc_id, "
        "position), not worker state.",
    ),
    (
        "web_robots_rules",
        "robots.txt evaluation (round 9): group extraction (regexp), "
        "Allow/Disallow parsing (array HOFs), and RFC 9309 longest-match "
        "precedence (one integer max over scored prefix hits) all in-row "
        "— scan-speed codegen, no UDF, no exchange.",
    ),
    (
        "preference_bradley_terry",
        "Bradley-Terry fit (round 9): the plan shows only the 16-row "
        "result relation — the corpus-sized work is the sufficient-"
        "statistics groupBy (preferences → m×m match counts) and the MM "
        "iterations run on that bounded state; the collect is gated by "
        "algebra (≤ items² rows), not data size.",
    ),
    (
        "search_mmr_rerank",
        "MMR rerank (round 9): candidate pool via broadcast-queries × "
        "corpus scan + per-query window; the O(pool²) diversity matrix "
        "and greedy selection live in per-query cogrouped applyInPandas "
        "— quadratic only in the constant pool, distributed across "
        "queries.",
    ),
]


def main() -> int:
    from ingest_fast_spark.queries import QUERIES
    from ingest_fast_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-dump")
    out = [
        "# PLANS — captured physical plans (regenerate: `python tools/dump_plans.py`)",
        "",
        f"Source scale: `{sf_dir}` (plan shapes are scale-invariant; AQE",
        "may re-plan exchanges at runtime — these are the pre-execution",
        "plans Catalyst produces).",
        "",
    ]
    for name, note in SHOWCASE:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # strip absolute paths and volatile ids for a stable, readable doc
        plan = re.sub(r"file:[^\],\s]+", "<path>", plan)
        plan = re.sub(r"#\d+L?", "", plan)
        plan = re.sub(r"plan_id=\d+", "plan_id=*", plan)
        out.append(f"## {name}\n\n{note}\n\n```\n{plan.rstrip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
