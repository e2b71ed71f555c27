#!/usr/bin/env python
"""Skewed-graph growth study (VERDICT r6 item 5): time the distributed
connected-components star rounds and the LPA max_by argmax on a PLANTED
power-law graph — one hub family owning >70% of all edges, the shape a
100 TB boilerplate dedup cluster takes — at 1x and 5x edge counts, and
print the growth factor. A straggling reducer (one key absorbing the hot
family) would show as super-linear growth here long before it shows on
the benign synthetic corpus.

Usage: python tools/skew_graph_bench.py [base_hot_nodes]
Prints one JSON line {"cc": {...}, "lpa": {...}}.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time


def planted_hot_edges(n_hot: int, n_small_comps: int, seed: int = 99):
    rng = random.Random(seed)
    edges = [(0, i) for i in range(1, n_hot)]
    edges += [(rng.randrange(n_hot), rng.randrange(n_hot)) for _ in range(n_hot // 2)]
    base = n_hot
    for _ in range(n_small_comps):
        edges += [(base + i, base + i + 1) for i in range(3)]
        base += 4
    return [(a, b) for a, b in edges if a != b]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ingest_fast_spark.operators.graph import (
        clustering_coefficient,
        connected_components,
        label_propagation,
    )
    from ingest_fast_spark.session import get_spark

    base_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("skew-graph-bench")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    out: dict = {}
    for mult in (1, 5):
        n_hot = base_hot * mult
        edges = planted_hot_edges(n_hot, n_small_comps=n_hot // 20)
        edf = spark.createDataFrame(edges, "src long, dst long").localCheckpoint()
        n_edges = edf.count()
        for name, run in (
            # threshold=0 forces the distributed star rounds (the scale path)
            ("cc", lambda: connected_components(edf, small_graph_threshold=0)),
            ("lpa", lambda: label_propagation(edf, iterations=3)),
            # the wedge self-join under its hub cap: the planted
            # celebrity (degree ~n_hot) is excluded as a wedge center, so
            # growth must track the CAPPED wedge count, not deg(hub)^2 —
            # uncapped, the 1x graph alone would build C(n_hot, 2) wedges
            ("lcc_capped", lambda: clustering_coefficient(edf, max_degree=64)),
        ):
            best = None
            for _ in range(repeats):
                t0 = time.perf_counter()
                run().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out.setdefault(name, {})[f"x{mult}"] = {
                "edges": n_edges,
                "sec": round(best, 3),
            }
        edf.unpersist()
    for name in out:
        a, b = out[name]["x1"]["sec"], out[name]["x5"]["sec"]
        out[name]["growth_on_5x_edges"] = round(b / a, 2) if a else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
