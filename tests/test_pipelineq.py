"""Targeted invariants for the pipeline-evaluation queries
(queries/pipelineq.py) beyond the registry's oracle checks: whitening's
covariance≈I contract (not SQL-expressible, hence rows-only), metric
range sanity for the retrieval eval, and gate/report consistency."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.01"


def test_whitening_decorrelates(spark):
    """ZCA output must have ~zero mean and ~identity covariance — the
    whole point of the transform, and the invariant that substitutes for
    a SQL oracle."""
    from ingest_fast_spark.queries.pipelineq import embedding_whiten_zca

    rows = embedding_whiten_zca(spark, SF).collect()
    # long form: 500 vectors x 64 dims
    assert len(rows) == 500 * 64
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], {})[r["dim"]] = r["value"]
    assert len(by_vec) == 500
    x = np.array(
        [[cells[d] for d in sorted(cells)] for _, cells in sorted(by_vec.items())]
    )
    mu = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mu, mu)
    assert np.abs(mu).max() < 1e-3  # rounded to 6 decimals upstream
    off = cov - np.eye(cov.shape[0])
    # eps=1e-6 regularization + round(...,6) leave small residuals
    assert np.abs(off).max() < 0.05


def test_whitening_deterministic(spark):
    from ingest_fast_spark.queries.pipelineq import embedding_whiten_zca

    a = {
        (r["vec_id"], r["dim"]): r["value"]
        for r in embedding_whiten_zca(spark, SF).collect()
    }
    b = {
        (r["vec_id"], r["dim"]): r["value"]
        for r in embedding_whiten_zca(spark, SF).collect()
    }
    assert a == b


def test_ndcg_metrics_in_range(spark):
    from ingest_fast_spark.queries.pipelineq import search_ndcg_eval

    rows = search_ndcg_eval(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["p_at_k"] <= 1.0
        assert 0.0 <= r["mrr"] <= 1.0
        assert 0.0 <= r["ndcg_at_k"] <= 1.0 + 1e-9
        assert r["n_rel_topk"] <= 10
        # with 10 labels over 500 vectors every query has relevant docs
        assert r["n_rel_total"] > 0


def test_bigram_beats_unigram_on_fluent_docs(spark):
    """The interpolated bigram LM must assign lower (better) mean NLL than
    the unigram LM on average — bigram context is real signal, and losing
    to unigram would mean the interpolation is wired wrong."""
    from ingest_fast_spark.queries.llm import doc_unigram_logppl
    from ingest_fast_spark.queries.pipelineq import doc_bigram_logppl

    bi = {r["doc_id"]: r["logppl"] for r in doc_bigram_logppl(spark, SF).collect()}
    un = {
        r["doc_id"]: r["unigram_logppl"]
        for r in doc_unigram_logppl(spark, SF).collect()
    }
    common = set(bi) & set(un)
    assert len(common) > 400
    mean_bi = sum(bi[d] for d in common) / len(common)
    mean_un = sum(un[d] for d in common) / len(common)
    assert mean_bi < mean_un


def test_quarantine_reasons_imply_fail(spark):
    from ingest_fast_spark.queries.pipelineq import quality_quarantine

    rows = quality_quarantine(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        # reasons is the '|'-joined sorted code list ('' == passed)
        codes = r["reasons"].split("|") if r["reasons"] else []
        assert r["passed"] == (len(codes) == 0)
        assert codes == sorted(codes)


def test_dsir_weights_favor_target_like_docs(spark):
    """Score TARGET docs through the same bucket LMs (as if they were raw)
    and compare TOKEN-weighted mean log-ratios: the target side estimates
    +KL(target‖raw) and the raw side −KL(raw‖target), so target > raw is
    guaranteed by KL ≥ 0 whenever the distributions differ at all — the
    direction-of-classifier invariant, free of document-length
    confounding (per-DOC sums scale with length, which is why the test
    normalizes by token count)."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.queries.pipelineq import curation_dsir_weights

    out = curation_dsir_weights(spark, SF)
    agg = out.agg(F.sum("log_weight").alias("s"), F.sum("n_toks").alias("n")).collect()[0]
    raw_mean = agg["s"] / agg["n"]
    # independent DuckDB replica scoring the TARGET side with the same LMs
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    from ingest_fast_spark.operators.dedup import portable_hash60_sql

    tgt_mean = con.execute(
        rf"""
        WITH toks AS (
          SELECT doc_id, COALESCE(source IN ('src0','src1'), FALSE) AS is_target,
                 unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
          FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
        ),
        vocab AS (
          SELECT w, CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                 CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr,
                 {portable_hash60_sql("w")} % 1024 AS b
          FROM toks GROUP BY w
        ),
        buckets AS (SELECT b, SUM(ct) AS ct, SUM(cr) AS cr FROM vocab GROUP BY b),
        totals AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM vocab),
        ratio AS (
          SELECT b, ln((ct + 1.0) / (tt + 1024)) - ln((cr + 1.0) / (tr + 1024)) AS lr
          FROM buckets CROSS JOIN totals
        ),
        wmap AS (SELECT w, lr FROM vocab JOIN ratio USING (b)),
        scored AS (
          SELECT lr FROM toks JOIN wmap USING (w) WHERE is_target
        )
        SELECT SUM(lr) / COUNT(*) FROM scored
        """
    ).fetchone()[0]
    con.close()
    assert tgt_mean > raw_mean


def test_leakage_report_counts_consistent(spark):
    from pyspark.sql import functions as F

    from ingest_fast_spark.queries.pipelineq import split_leakage_report

    rows = split_leakage_report(spark, SF).collect()
    assert sum(r["n_eval"] for r in rows) > 0
    for r in rows:
        assert 0 <= r["n_leaked"] <= r["n_eval"]
        assert abs(r["leak_rate"] - round(r["n_leaked"] / r["n_eval"], 6)) < 1e-9


def test_anomaly_zscore_flags_planted_outlier(spark):
    """Plant a 100σ spike in an otherwise-calm synthetic user stream and
    assert the operator flags exactly that event."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ingest_fast_spark.queries import pipelineq as P

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "e", 10.0 + (i % 3) * 0.1, None)
        for i in range(30)
    ]
    rows[25] = (25, base + dt.timedelta(minutes=25), 1, "e", 500.0, None)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = P.events_anomaly_zscore(spark, d).collect()
    assert [r["event_id"] for r in out] == [25]
    assert out[0]["zscore"] > 3


def test_sketch_quantile_error_bounded(spark):
    """percentile_approx guarantees RANK error ≤ 1/accuracy (the value gap
    can be anything in a sparse region) — so assert the principled bound:
    the fraction of rows ≤ the approximate quantile must sit within
    1.5/accuracy of the requested quantile."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.queries.pipelineq import sketch_quantile_report

    rows = sketch_quantile_report(spark, SF).collect()
    assert len(rows) == 5
    assert all(r["approx_within_bound"] for r in rows)
    # Independent re-derivation (the report computes the same bound
    # internally; this recomputes it from a fresh percentile_approx call
    # so a wiring bug in the report can't vacuously pass):
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    o = load_table(spark, SF, "orders").filter(F.col("o_totalprice").isNotNull())
    n = o.count()
    approx = o.agg(
        F.percentile_approx("o_totalprice", qs, 10000).alias("a")
    ).first()["a"]
    for q, v in zip(qs, approx):
        n_le = o.filter(F.col("o_totalprice") <= v).count()
        assert abs(n_le / n - q) <= 1.5 / 10000


def test_novelty_zero_for_exact_duplicate(spark):
    """A doc duplicated verbatim shares every shingle with its copy —
    both must score novelty 0; a unique doc scores 1."""
    import os
    import tempfile

    from ingest_fast_spark.queries.pipelineq import text_ngram_novelty

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "one two three four five six seven eight nine"
    df = spark.createDataFrame(
        [(1, dup, "en", "s", len(dup)),
         (2, dup, "en", "s", len(dup)),
         (3, uniq, "en", "s", len(uniq))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r for r in text_ngram_novelty(spark, d).collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["novelty"] == 1.0


def test_stream_anomaly_state_carries_across_microbatches(spark):
    """The flagged spike sits in the SECOND file; its entire baseline
    history sits in the FIRST. With maxFilesPerTrigger=1 the spike's
    micro-batch never sees the baseline rows — only the state carried
    from batch 1 can supply them — so this test fails unless the ring
    buffer truly persists across batches."""
    import datetime as dt
    import os
    import tempfile
    import time

    from ingest_fast_spark.streaming.events import normalize_ts, raw_events_schema
    from ingest_fast_spark.streaming.stateful import anomaly_zscore_stream

    base = dt.datetime(2024, 1, 1)

    def rows(lo, hi, spike=None):
        out = []
        for i in range(lo, hi):
            v = 500.0 if i == spike else 10.0 + (i % 3) * 0.1
            out.append((i, base + dt.timedelta(minutes=i), 1, "e", v, None))
        return out

    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev_dir = os.path.join(d, "events.parquet")
        spark.createDataFrame(rows(0, 20), schema).coalesce(1).write.mode(
            "append"
        ).parquet(ev_dir)
        time.sleep(1.1)  # distinct mtimes => deterministic file order
        spark.createDataFrame(rows(20, 25, spike=22), schema).coalesce(1).write.mode(
            "append"
        ).parquet(ev_dir)

        src = (
            spark.readStream.schema(raw_events_schema(spark, ev_dir))
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .load(ev_dir)
        )
        q = (
            anomaly_zscore_stream(normalize_ts(src))
            .writeStream.format("memory")
            .queryName("t_anom_mb")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("SELECT * FROM t_anom_mb").collect()
        assert q.lastProgress["batchId"] >= 1  # really ran >1 micro-batch
    assert [r["event_id"] for r in out] == [22]
    assert out[0]["zscore"] > 3


def test_psi_detects_planted_shift(spark):
    """Shift the current slice's distribution for one event type by +5σ
    and leave another untouched: PSI must scream (>0.25) for the shifted
    type and stay calm (<0.1) for the stable one."""
    import datetime as dt
    import os
    import tempfile

    from ingest_fast_spark.queries.pipelineq import events_drift_psi

    ref = dt.datetime(2024, 1, 10)
    cur = dt.datetime(2024, 1, 20)
    rows = []
    for i in range(400):
        v = (i % 100) / 10.0
        rows.append((i, ref, 1, "stable", v, None))
        rows.append((1000 + i, cur, 1, "stable", v, None))
        rows.append((2000 + i, ref, 1, "shifted", v, None))
        rows.append((3000 + i, cur, 1, "shifted", v + 50.0, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r["psi"] for r in events_drift_psi(spark, d).collect()}
    assert out["shifted"] > 0.25
    assert out["stable"] < 0.1


def test_scurve_recall_monotone_and_sane(spark):
    """Measured LSH recall must be ~monotone in the Jaccard bin and the
    top bin must be near-total; theory and measurement must agree in
    direction."""
    from ingest_fast_spark.queries.pipelineq import minhash_scurve_report

    rows = sorted(
        minhash_scurve_report(spark, SF).collect(), key=lambda r: r["j_lo"]
    )
    assert rows, "no jaccard bins measured"
    recalls = [r["measured_recall"] for r in rows]
    assert recalls[-1] >= 0.9  # high-similarity pairs must be caught
    for r in rows:
        assert 0.0 <= r["measured_recall"] <= 1.0
        assert 0.0 <= r["theoretical_recall"] <= 1.0


def test_ledger_stages_are_exclusive_and_quota_respected(spark):
    from ingest_fast_spark.queries.pipelineq import (
        _LEDGER_QUOTA,
        curation_decision_ledger,
    )

    rows = curation_decision_ledger(spark, SF).collect()
    assert len(rows) == 500
    kept_by_source = {}
    for r in rows:
        if r["kept"]:
            assert r["dropped_at"] is None
            assert r["gate_reasons"] == ""  # '|'-joined scalar form
            kept_by_source[r["source"]] = kept_by_source.get(r["source"], 0) + 1
        else:
            assert r["dropped_at"] in ("gate", "duplicate", "quota")
            if r["dropped_at"] == "gate":
                assert len(r["gate_reasons"]) > 0
    assert kept_by_source and all(
        v <= _LEDGER_QUOTA for v in kept_by_source.values()
    )


def test_skew_report_flags_planted_hot_key(spark):
    """A table where one user owns 60% of the rows must report
    skew_factor far above the uniform tables'."""
    import datetime as dt
    import os
    import tempfile

    from ingest_fast_spark.queries.pipelineq import table_skew_report

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base, (7 if i < 600 else i) , "e", 1.0, None) for i in range(1000)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        for t in ("lineitem", "orders", "documents"):
            spark.read.parquet(f"{SF}/{t}.parquet").limit(50).write.mode(
                "overwrite"
            ).parquet(os.path.join(d, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r["key_col"]: r for r in table_skew_report(spark, d).collect()}
    ev = out["events.user_id"]
    assert ev["top1_share"] > 0.55
    assert ev["skew_factor"] > 100  # 600 rows on one of ~401 distinct keys


def test_entity_resolution_fuses_transitive_chain(spark):
    """a~b and b~c at edit distance 1 (but a-c at distance 2) must land in
    ONE entity with the min key canonical — the transitivity CC provides
    and pairwise verification alone cannot."""
    import os
    import tempfile

    from ingest_fast_spark.queries.pipelineq import customer_entity_resolution

    rows = [
        (1, "Customer#AAA"),
        (2, "Customer#AAB"),  # dist 1 from AAA
        (3, "Customer#ABB"),  # dist 1 from AAB, dist 2 from AAA
        (4, "Totally Different"),
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
        out = {r["c_custkey"]: r for r in customer_entity_resolution(spark, d).collect()}
    assert out[1]["entity_id"] == out[2]["entity_id"] == out[3]["entity_id"] == 1
    assert out[1]["is_canonical"] and not out[2]["is_canonical"]
    assert out[1]["n_members"] == 3
    assert out[4]["entity_id"] == 4 and out[4]["n_members"] == 1


def test_symspell_d2_catches_two_stacked_edits(spark):
    """Planted pairs at each edit composition the d=2 neighborhood must
    cover — two substitutions, two deletions, two insertions, and one of
    each — all invisible to the d=1 blocking, all found at d=2; a
    distance-3 pair stays excluded."""
    import os
    import tempfile

    from ingest_fast_spark.queries.llm import fuzzy_name_pairs, fuzzy_name_pairs_d2

    rows = [
        (1, "marianne"),
        (2, "marizmne"),  # two substitutions of #1
        (3, "marian"),  # two deletions of #1
        (4, "xmariannex"),  # two insertions of #1
        (5, "amarianne"),  # insertion of #1 ... and one sub from #4? no: d(4,5)=2
        (6, "zzzianne"),  # distance 3 from #1: must NOT pair with 1
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
        d1 = {(r["key_a"], r["key_b"]) for r in fuzzy_name_pairs(spark, d).collect()}
        d2 = {
            (r["key_a"], r["key_b"]): r["dist"]
            for r in fuzzy_name_pairs_d2(spark, d).collect()
        }
    assert (1, 2) not in d1 and (1, 3) not in d1 and (1, 4) not in d1
    assert d2[(1, 2)] == 2 and d2[(1, 3)] == 2 and d2[(1, 4)] == 2
    assert d2[(1, 5)] == 1  # d=1 pairs are a subset of d=2 results
    assert (1, 6) not in d2
    assert set(d1) <= set(d2)


def test_ks_detects_planted_shift_and_matches_scipy_formula(spark):
    """The exact two-sample KS: a +5 shift must reject at alpha=0.05, an
    identical distribution must not; the statistic must equal the direct
    numpy computation of sup|F1-F2| on the same data."""
    import datetime as dt
    import os
    import tempfile

    import numpy as np

    from ingest_fast_spark.queries.pipelineq import events_drift_ks

    ref = dt.datetime(2024, 1, 10)
    cur = dt.datetime(2024, 1, 20)
    rows = []
    for i in range(300):
        v = (i % 100) / 10.0
        rows.append((i, ref, 1, "stable", v, None))
        rows.append((1000 + i, cur, 1, "stable", v, None))
        rows.append((2000 + i, ref, 1, "shifted", v, None))
        rows.append((3000 + i, cur, 1, "shifted", v + 5.0, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r for r in events_drift_ks(spark, d).collect()}
    assert out["shifted"]["drifted"] and not out["stable"]["drifted"]
    assert out["stable"]["ks"] == 0.0
    # direct sup|F1-F2| on the planted data (evaluate at every sample point)
    a = np.array([(i % 100) / 10.0 for i in range(300)])
    b = a + 5.0
    grid = np.union1d(a, b)
    d_direct = np.max(
        np.abs(
            np.searchsorted(np.sort(a), grid, "right") / 300
            - np.searchsorted(np.sort(b), grid, "right") / 300
        )
    )
    assert abs(out["shifted"]["ks"] - round(float(d_direct), 6)) < 1e-9


def test_attribution_conserves_purchase_value(spark, sf_dir):
    """Position-based fractions sum to 1 per conversion, so total credited
    micro-cents must equal total purchase value up to the per-row floor
    loss (< 0.5 micro-cents per credited touch)."""
    from pyspark.sql import functions as F

    from ingest_fast_spark.catalog import load_table
    from ingest_fast_spark.queries import QUERIES

    out = QUERIES["attribution_credit"](spark, sf_dir)
    total = out.agg(
        F.sum("credit_micro_cents").alias("c"), F.sum("n_credits").alias("n")
    ).first()
    e = load_table(spark, sf_dir, "events")
    expected = (
        e.filter(
            (F.col("event_type") == "purchase")
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long") * 10000
            ).alias("v")
        )
        .first()["v"]
    )
    assert abs(total["c"] - expected) <= total["n"], (total["c"], expected)


def test_sinkhorn_matches_reference_and_orders_by_rank_distance(spark):
    """The distributed Sinkhorn solve must equal a straight numpy
    re-computation from raw token counts (plumbing: support selection,
    dense-grid zeros, integer normalization), and the distance must
    respect rank-space geometry: a source concentrated near the top of
    the global ranking scores closer to the corpus than one concentrated
    at the bottom."""
    from ingest_fast_spark.operators.curation import sinkhorn_domain_distance

    # 8 tokens with strictly decreasing global frequency; three sources.
    vocab = [f"t{i}" for i in range(8)]
    def doc(counts):
        return " ".join(" ".join([tok] * c) for tok, c in zip(vocab, counts))

    # bulk dominates so the GLOBAL rank order is exactly the vocab order
    rows = [
        (1, "bulk", doc([400, 350, 300, 250, 200, 150, 100, 50])),
        (2, "near", doc([20, 18, 2, 1, 1, 1, 1, 1])),
        (3, "far", doc([1, 1, 1, 1, 1, 2, 18, 20])),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: r["sinkhorn_cost"]
        for r in sinkhorn_domain_distance(docs, vocab_size=8).collect()
    }

    # independent reference from the same construction
    raw = {s: np.array(c, dtype="float64") for s, c in
           [("bulk", [400, 350, 300, 250, 200, 150, 100, 50]),
            ("near", [20, 18, 2, 1, 1, 1, 1, 1]),
            ("far", [1, 1, 1, 1, 1, 2, 18, 20])]}
    g_raw = sum(raw.values())
    # support is ordered by GLOBAL rank (count desc, token asc); the bulk
    # source makes that the vocab order — assert, then index by rank
    order = sorted(range(8), key=lambda i: (-g_raw[i], vocab[i]))
    assert order == list(range(8))
    counts = {s: c[order] for s, c in raw.items()}
    g = g_raw[order]
    idx = np.arange(8, dtype="float64")
    C = np.abs(idx[:, None] - idx[None, :]) / 7.0
    K = np.exp(-C / 0.1)
    for s, c in counts.items():
        a, b = c / c.sum(), g / g.sum()
        v = np.ones(8)
        for _ in range(15):
            u = a / (K @ v)
            v = b / (K.T @ u)
        want = round(float((u[:, None] * K * v[None, :] * C).sum()), 6)
        assert got[s] == pytest.approx(want, abs=1e-6), s
    assert got["near"] < got["far"]


def test_holt_winters_learns_season_and_trend(spark):
    """A purely periodic series must fit with ~zero trend and forecast the
    upcoming pattern positions; a purely linear series must learn its
    slope and extrapolate the line."""
    import datetime

    from ingest_fast_spark.queries.relational import holt_winters_daily

    pattern = [10.0, 12.0, 8.0, 14.0, 9.0, 11.0, 7.0]
    d0 = datetime.date(2024, 1, 1)
    rows = []
    for d in range(28):
        rows.append(("periodic", d0 + datetime.timedelta(days=d), pattern[d % 7]))
        rows.append(("linear", d0 + datetime.timedelta(days=d), 5.0 + d))
    daily = spark.createDataFrame(rows, "event_type string, day date, y double")
    out = {r["event_type"]: r for r in holt_winters_daily(daily).collect()}

    p = out["periodic"]
    assert abs(p["trend"]) < 0.2
    for h in (1, 2, 3):
        assert abs(p[f"forecast_{h}"] - pattern[(28 + h - 1) % 7]) < 1.0, h

    ln = out["linear"]
    assert abs(ln["trend"] - 1.0) < 0.3
    # the spurious seasonal init (deviations of the first week from its
    # mean) decays as 0.8^4 over 4 weeks: ~1.2 residual is expected
    assert abs(ln["forecast_1"] - 33.0) < 2.0


def test_logreg_training_learns_signal(spark):
    """25 GD steps must beat the 50% base rate decisively on the
    length-balanced label (the oracle pins exactness; this pins learning)."""
    from ingest_fast_spark.queries.pipelineq import quality_train_logreg

    out = {r["feature"]: r["value"] for r in quality_train_logreg(spark, SF).collect()}
    assert out["train_accuracy"] > 0.7
    assert out["w1_log_tokens"] > 0  # longer docs -> positive class


def test_bradley_terry_recovers_planted_order(spark):
    """The winner rule biases toward higher-indexed items, so the fitted
    strengths must correlate with empirical win rate, ranks must be a
    valid 1..m assignment with ties shared, and the normalized strengths
    must sum to ~m*1e6 (exact-integer normalization)."""
    from ingest_fast_spark.queries.pipelineq import preference_bradley_terry

    rows = preference_bradley_terry(spark, SF).collect()
    assert len(rows) == 16
    by_item = {r["item"]: r for r in rows}
    # Strength order must match win-rate order at the extremes.
    win_rate = {i: by_item[i]["wins"] / by_item[i]["matches"] for i in by_item}
    best = max(win_rate, key=win_rate.get)
    worst = min(win_rate, key=win_rate.get)
    assert by_item[best]["strength_micro"] > by_item[worst]["strength_micro"]
    assert by_item[best]["rank"] < by_item[worst]["rank"]
    # Valid rank assignment and exact normalization.
    assert min(r["rank"] for r in rows) == 1
    total_norm = sum(r["strength_norm_micro"] for r in rows)
    assert abs(total_norm - 16_000_000) <= 16  # one floor step per item
    # Spearman-ish: top-4 by strength should all sit in the top half by
    # win rate (the MM fit must not inverse the gradient).
    top4 = sorted(rows, key=lambda r: r["rank"])[:4]
    wr_sorted = sorted(win_rate, key=win_rate.get, reverse=True)[:8]
    assert all(r["item"] in wr_sorted for r in top4)


def test_partition_advisor_prefers_balanced_midcardinality(spark):
    """The advisor must penalize the low-cardinality skewed extremes:
    o_orderstatus (3 values, one dominant) and o_orderpriority (5)
    fail the cardinality floor, so both in-range candidates
    (order_month, o_custkey — 1500 distinct at this SF; at production
    scale custkey would blow the 10k cap and the same scoring would
    reject it) must outscore them. Exactly one recommendation, and it
    is in-range."""
    from ingest_fast_spark.queries.pipelineq import layout_partition_advisor

    rows = {r["column_name"]: r for r in
            layout_partition_advisor(spark, SF).collect()}
    assert sum(1 for r in rows.values() if r["recommended"]) == 1
    winner = next(r for r in rows.values() if r["recommended"])
    assert 8 <= winner["n_distinct"] <= 10000
    for bad in ("o_orderstatus", "o_orderpriority"):
        assert rows[bad]["score_milli"] < rows["order_month"]["score_milli"]
        assert rows[bad]["score_milli"] < winner["score_milli"]
    # the dominant status partition holds >30% of rows — the skew the
    # evenness term exists to punish
    assert rows["o_orderstatus"]["top1_share_micro"] > 300_000


def test_epoch_schedule_conserves_budget_and_flags_small_sources(spark):
    """Total draws must equal the 2x-corpus budget within one floor step
    per source; sqrt-temperature upsampling means the SMALLEST source
    carries the highest epoch count; any over_repeat_cap flag implies
    epochs > 4.0."""
    from ingest_fast_spark.queries.pipelineq import curation_epoch_schedule

    rows = curation_epoch_schedule(spark, SF).collect()
    assert rows
    total_tokens = sum(r["n_tokens"] for r in rows)
    total_draws = sum(r["draws"] for r in rows)
    assert 0 <= 2 * total_tokens - total_draws <= len(rows)
    smallest = min(rows, key=lambda r: r["n_tokens"])
    largest = max(rows, key=lambda r: r["n_tokens"])
    assert smallest["epochs_milli"] > largest["epochs_milli"]
    for r in rows:
        assert r["over_repeat_cap"] == (r["epochs_milli"] > 4000)


def test_ivm_topk_guard_and_shape(spark):
    """The slack-buffer maintenance must produce a valid ranking (1..10,
    totals non-increasing, ties broken by custkey) with the underflow
    guard FALSE on this changeset — the condition under which the
    oracle's full-recompute equality (driver-checked) proves the
    maintained answer exactly."""
    from ingest_fast_spark.queries.relational import ivm_incremental_topk

    rows = sorted(
        ivm_incremental_topk(spark, SF).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert all(not r["underflow"] for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert (a["total_cents"], -a["o_custkey"]) >= (
            b["total_cents"], -b["o_custkey"]
        )
        assert a["total_cents"] >= b["total_cents"]
