"""Partitioning-invariance e2e: results must not depend on file layout.

The driver's testdata is one single-row-group file per table; production
is thousands of files per table. Re-materializing every table as a
multi-file copy and re-running representative queries proves no operator
silently depends on input partitioning or intra-file row order (the
classic failure: unsorted collect_list, first()/limit without order,
RNG-based sampling).
"""

import pytest

from ingest_fast_spark.queries import QUERIES

REPRESENTATIVE = [
    "q1_pricing_summary",       # hash agg
    "q21_waiting_suppliers",    # join + decorrelated exists
    "topk_per_group",           # window rank
    "sessionize",               # gaps-and-islands over event order
    "event_pattern_match",      # ordered collect_list
    "dedup_exact",              # content digest groupBy
    "dedup_ngram_jaccard",      # shingle self-join
    "sample_stratified",        # content-hash sampling
    "pack_training_sequences",  # running-sum window
    "merge_upsert_customers",   # full-outer merge
    "build_vocabulary",         # global rank
    "funnel_stages",            # chained conditional aggs
    "dedup_exact_substring",    # positional grams + diagonal islands
    "shard_training_data",      # row_number over hash order
    "text_dedup_sentences_within_doc",  # per-doc array ops
    "text_heavy_hitters",       # MG candidates vary per layout; recount must not
    "bpe_train_merges",         # argmax tie-break must be partition-independent
    "dedup_bloom_prefilter",    # bit-set build across layouts
    "embed_hard_negatives",     # GEMM local top-k across partition boundaries
    "search_ndcg_eval",         # metric math over GEMM top-k across layouts
    "doc_bigram_logppl",        # avg over FP summation order
    "curation_dsir_weights",    # partition-order-free log-weight sums
    "events_anomaly_zscore",    # trailing frame over ts order, not file order
    "events_drift_psi",         # reference-decile cuts across layouts
    "curation_decision_ledger", # digest canonical-min + quota rank tie-breaks
    "minhash_scurve_report",    # banded candidates + bin counts across layouts
    "embedding_whiten_zca",     # driver-reduced moments across partitionings
    "dedup_cluster_keep_best",  # max_by (quality,-id) winner across layouts
    "dedup_soft_weights",       # cluster sizes across layouts
    "bpe_fertility_by_source",  # per-source sums over partition order
    # MinHash-fed scale twins: banded candidates + CC + layer must be
    # file-layout-free end to end (the xxhash64 fast default shares the
    # portable twin's plan, so one representative per layer suffices)
    "dedup_soft_weights_minhash",
    "dedup_cluster_keep_best_fast",
    "split_cluster_safe_fast",
    # round-7 second wave
    "sketch_hll_report",        # register MAX union across layouts
    "sketch_kmv_report",        # per-partition k-min heaps merge order-free
    "dedup_substring_scrub",    # island windows + interval merge + HOF rebuild
    "embedding_dbscan",         # GEMM eps-pairs + CC + min-id border rule
    "doc_kn_logppl",            # avg over FP summation order (like bigram)
    # round-7 third wave
    "assign_global_ids",        # range exchange + pid rank == total order, any layout
    "dedup_weighted_minhash",   # argmin tie-breaks + hot-bucket caps across layouts
    "attribution_credit",       # per-purchase rank ties on (ts, event_id), not file order
    "events_cusum_changepoint", # ordered running sums over day order, not row order
    "agg_bootstrap_ci",         # hash-keyed Poisson draws are layout-free
    "search_phrase_positional", # positions from per-doc arrays, not scan order
    # round-8
    "graph_common_neighbors",   # micro-unit Adamic-Adar sums, order-free by construction
    "dedup_winnowing",          # in-row window-min selection across chunk layouts
    "events_anomaly_mad",       # sort-based medians are layout-free
    "privacy_t_closeness",      # integer cross-multiplied distances
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def shredded_dir(spark, sf_dir, tmp_path_factory):
    """Every table rewritten as 7 parquet files in shuffled row order."""
    import pyspark.sql.functions as F

    from ingest_fast_spark.catalog import load_table

    out = tmp_path_factory.mktemp("shredded")
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        # orderBy(rand) then repartition: different files AND different
        # row order within files, deterministic enough for one test run
        df.withColumn("_r", F.xxhash64(*df.columns)).orderBy("_r").drop(
            "_r"
        ).repartition(7).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


# Queries whose outputs are ROUND(SUM(double), d): IEEE summation is not
# associative, so reordering rows moves the sum by ULPs, and when it sits
# within ULPs of a .xx5 rounding boundary the rounded cent legitimately
# flips with the layout. q1's sf0.001 sum_disc_price for (N, F) is exactly
# such a boundary (30158055.965): any change to partial-aggregation
# grouping — here the r9 AQE coalescing floor (1b -> 64kb), bisected — can
# flip it. One rounding quantum of slack on FLOAT cells for these queries
# keeps the test's real power (order-dependence bugs produce whole-row or
# multi-quantum drift) without pinning FP associativity the engine never
# promised. The driver's oracle gate always reads the canonical layout and
# is unaffected.
FP_BOUNDARY_TOLERANT = {"q1_pricing_summary"}


def _rows_equal_mod_rounding(a, b) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float) and abs(x - y) <= 0.01 + 1e-9:
                continue
            return False
    return True


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_layout_invariant(spark, sf_dir, shredded_dir, name):
    base = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    shredded = sorted(map(tuple, QUERIES[name](spark, shredded_dir).collect()))
    if name in FP_BOUNDARY_TOLERANT:
        assert _rows_equal_mod_rounding(base, shredded), (
            f"{name} depends on input file layout beyond FP rounding quanta"
        )
    else:
        assert base == shredded, f"{name} depends on input file layout"
