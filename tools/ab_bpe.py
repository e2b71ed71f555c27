#!/usr/bin/env python
"""One-JVM interleaved A/B for the BPE pairs-expression formulation:
  inline  — syms tree referenced directly in the transform lambda (r9 #1)
  letcol  — let_col-bound syms (O(n) per word on long tokens)
  column  — syms materialized as a child-projection column
Times the 8-round training loop over sf0.1 words and over the
adversarial 50k-char single-token doc; asserts identical merge lists.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ingest_fast_spark.catalog import load_table
from ingest_fast_spark.operators.bpe import SEP, _SEP2, _initial_repr, _symbols, word_freq_table
from ingest_fast_spark.operators.dedup import let_col
from ingest_fast_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_MERGES = 8


def adjacent_pairs(syms):
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def train(wf, mode):
    w = wf.select(_initial_repr(F.col("word")).alias("repr"), "freq")
    merges = []
    expr = F.col("repr")
    for _ in range(N_MERGES):
        if mode == "inline":
            pairs_src = w.select(adjacent_pairs(_symbols(expr)).alias("pairs"), "freq")
        elif mode == "letcol":
            pairs_src = w.select(
                let_col(_symbols(expr), adjacent_pairs).alias("pairs"), "freq"
            )
        else:  # column
            pairs_src = w.select(_symbols(expr).alias("syms"), "freq").select(
                adjacent_pairs(F.col("syms")).alias("pairs"), "freq"
            )
        pc = (
            pairs_src.select(F.explode("pairs").alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        rows = pc.orderBy(F.desc("pair_freq"), "a", "b").limit(1).collect()
        if not rows:
            break
        a, b = rows[0]["a"], rows[0]["b"]
        merges.append((a, b, int(rows[0]["pair_freq"])))
        expr = F.replace(
            expr, F.lit(SEP + a + _SEP2 + b + SEP), F.lit(SEP + a + b + SEP)
        )
    return merges


def main():
    spark = get_spark("ab-bpe")
    docs = load_table(spark, SF_DIR, "documents")
    wf = word_freq_table(docs).localCheckpoint(eager=True)

    ref = train(wf, "inline")
    for mode in ("letcol", "column"):
        assert train(wf, mode) == ref, mode

    out = {}
    for mode in ("inline", "letcol", "column"):
        out[mode] = float("inf")
    for _ in range(3):
        for mode in ("inline", "letcol", "column"):
            t0 = time.time()
            train(wf, mode)
            out[mode] = min(out[mode], time.time() - t0)

    # adversarial: one 50k-char token + a normal doc
    adv = spark.createDataFrame(
        [(0, "a" * 50000), (1, "normal text repeated normal text")],
        "doc_id long, text string",
    )
    wf2 = word_freq_table(adv).localCheckpoint(eager=True)
    ref2 = train(wf2, "letcol")
    assert train(wf2, "column") == ref2
    adv_out = {}
    for mode in ("letcol", "column"):
        t0 = time.time()
        train(wf2, mode)
        adv_out[mode] = round(time.time() - t0, 2)

    print(json.dumps({"sf01_min3": {k: round(v, 3) for k, v in out.items()},
                      "adversarial_50k": adv_out}))


if __name__ == "__main__":
    main()
