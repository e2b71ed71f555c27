"""Distributed connected components — the clustering step of near-dedup.

Pair-finders (MinHash/SimHash/Jaccard/embedding, operators/dedup.py and
operators/similarity.py) emit EDGES (doc_a, doc_b); turning edges into
dedup groups ("keep one doc per near-dup cluster") is a connected-
components problem. The reference has nothing like this (its dedup is
per-key array membership, lib/ingest.js:144-155); this is the [EXT]
scale path.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14). Each round is
two groupBy+join passes over the edge list; converges in O(log n) rounds
even on pathological long-chain graphs — unlike naive label propagation,
whose round count is the graph DIAMETER (a 1M-node chain would need 1M
rounds). Every round's shuffle is keyed by node id, and the edge list
shrinks monotonically toward the final star graph, so at 100 TB the cost
is a handful of self-joins on an edge list that is tiny relative to the
corpus (only near-dup docs appear in any edge).

Driver-side iteration state is one (count, checksum) row per round —
never the edge data itself; lineage is cut per round with
localCheckpoint so the plan doesn't grow exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_over_neighbors(adj: DataFrame) -> DataFrame:
    """Per src node: m = min(src, all dst neighbors) — one hash aggregate."""
    return (
        adj.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least(F.col("src"), F.col("_mn")).alias("m"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to min(Γ⁺(u)). Output may carry
    duplicates — the following small-star round dedups on orientation, so
    no extra shuffle here."""
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = _min_over_neighbors(sym)
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges large→small, then connect every smaller neighbor (and
    u itself) to min(N(u) ∪ {u})."""
    oriented = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    m = _min_over_neighbors(oriented)
    joined = oriented.join(m, "src")
    return (
        joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(m.select("src", F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_rounds: int = 25,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """(id, component) for every node; component = MIN node id in the
    component (deterministic canonical label).

    ``nodes`` (single-column DataFrame, optional) adds isolated nodes —
    they come out as their own singleton components. ``max_rounds`` is a
    safety bound; O(log n) rounds suffice (25 covers n ≈ 2²⁵ per the
    algorithm's convergence proof, and convergence is checksum-detected
    much earlier on real graphs).

    Edge lists at or below ``small_graph_threshold`` run a driver-side
    vectorized union-find instead of the iterative job — the same
    size-gated logic as a broadcast join (≤1M edges ≈ 16 MB via Arrow,
    the order of a broadcast-side table, vs 4+ distributed rounds of
    fixed scheduling cost; the sf0.1 entity-resolution graph — 262k
    edges, one giant component — drops 4.6s → ~1s warm). Identical
    output by construction; the distributed path is exercised in tests
    with ``small_graph_threshold=0``.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        # Materialize BEFORE iterating: each star round references the edge
        # list twice (e ∪ reverse(e)), so an unmaterialized input plan —
        # e.g. a full near-dup pair pipeline — would re-execute per branch
        # per round. Measured 9.8s → ~4s at sf0.1 on the Jaccard pairs.
        .localCheckpoint(eager=True)
    )
    # Size the iteration's partitioning to the EDGE list, not the session
    # default: near-dup edges are tiny relative to the corpus (only dup
    # docs appear), and each round is several shuffles whose fixed task
    # cost dominates on over-partitioned small data. ~100k edges/partition
    # keeps a 10⁹-edge graph at healthy width while a 10⁴-edge one runs
    # in a couple of tasks.
    n_edges = e.count()
    if n_edges <= small_graph_threshold:
        return _union_find_local(e, edges.sparkSession, nodes)
    width = max(1, min(e.rdd.getNumPartitions(), n_edges // 100_000 + 1))
    e = e.repartition(width, "src")
    prev: tuple | None = None
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # Convergence probe: one aggregate row (count + order-insensitive
        # XOR checksum — SUM would long-overflow under ANSI mode), not a
        # driver-side collect of the edges.
        cur = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("chk"),
        ).first()
        if (cur["n"], cur["chk"]) == prev:
            break
        prev = (cur["n"], cur["chk"])
    # Fixpoint edge list is a star forest: (node → component-min root).
    assign = e.groupBy(F.col("src").alias("id")).agg(F.min("dst").alias("component"))
    roots = (
        e.select(F.col("dst").alias("id"))
        .distinct()
        .join(assign.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    out = assign.unionByName(roots)
    if nodes is not None:
        node_ids = nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")).distinct()
        singletons = node_ids.join(out.select("id"), "id", "left_anti").select(
            "id", F.col("id").alias("component")
        )
        out = out.unionByName(singletons)
    return out


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
) -> DataFrame:
    """Cluster near-dup pairs into groups and mark the canonical survivor.

    Returns (doc_id, cluster_id, is_canonical): cluster_id is the min
    doc_id of the cluster, which is therefore also the canonical doc —
    the deterministic keep-one-per-cluster rule a dedup pipeline applies
    with ``.filter("is_canonical")``.
    """
    cc = connected_components(
        pairs, pair_cols[0], pair_cols[1], nodes=docs.select(id_col)
    )
    return cc.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def _union_find_local(e: DataFrame, spark, nodes: DataFrame | None) -> DataFrame:
    """Small-graph path: vectorized min-label propagation over an
    Arrow-collected edge array.

    Per iteration: every edge pulls both endpoints' labels down to their
    minimum (two ``np.minimum.at`` scatters, O(E) each), then labels are
    pointer-jump compressed (``l = l[l]`` until fixpoint, O(V log V)
    total). Converges in O(log V) outer iterations — same bound as the
    distributed star rounds, but each round is a C-speed array pass, so a
    million-edge graph resolves in well under a second where the old
    per-edge Python dict loop took seconds. The final label is the min
    node id reachable, i.e. the same canonical component id the
    distributed path produces.
    """
    import numpy as np
    import pandas as pd

    pdf = e.toPandas()
    if len(pdf) == 0:
        out = spark.createDataFrame([], "id long, component long")
    else:
        src = pdf["src"].to_numpy(dtype=np.int64)
        dst = pdf["dst"].to_numpy(dtype=np.int64)
        node_ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        # node_ids is sorted, so index order == id order: the min label in
        # index space maps back to the min node id in id space.
        a, b = inv[: len(src)], inv[len(src) :]
        label = np.arange(len(node_ids), dtype=np.int64)
        while True:
            la, lb = label[a], label[b]
            mn = np.minimum(la, lb)
            label_prev = label.copy()
            np.minimum.at(label, a, mn)
            np.minimum.at(label, b, mn)
            while True:
                nxt = label[label]
                if np.array_equal(nxt, label):
                    break
                label = nxt
            if np.array_equal(label, label_prev):
                break
        out = spark.createDataFrame(
            pd.DataFrame({"id": node_ids, "component": node_ids[label]})
        )
    if nodes is not None:
        node_ids = nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")).distinct()
        singletons = node_ids.join(out.select("id"), "id", "left_anti").select(
            "id", F.col("id").alias("component")
        )
        out = out.unionByName(singletons)
    return out


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank by power iteration, pure DataFrame ops.

    Per round: contributions = rank/outdeg shipped along edges (one
    shuffle on ``dst``), plus the dangling-node mass (nodes with no
    out-edges) and the teleport term redistributed uniformly. The
    dangling mass and node count are 1-row aggregates cross-joined back
    (broadcast) — no driver-side collect, so the whole run is one DAG
    per round. Edge/degree/node sets are localCheckpointed once: every
    iteration reuses them, and without the checkpoint the lineage (and
    the re-scan of the edge source) grows linearly with rounds.

    Fixed iteration count (not convergence-tested) keeps the operator
    deterministic and its oracle SQL-expressible as unrolled CTEs; at
    100 TB the per-round cost is one edges⋈ranks shuffle — identical to
    the connected-components round above — and rank state is one row
    per node, co-partitioned by node id across rounds.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).localCheckpoint(eager=True)
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))  # 1 row
    d = F.lit(damping)

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "n", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(iterations):
        # deg is one row per node — linear in the graph, so no broadcast
        # hint; ranks and deg co-partition on the node key, and AQE
        # broadcasts the build side when the graph is actually small.
        rd = ranks.join(deg, ranks["n"] == deg["src"], "left")
        dangling = rd.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")
        )  # 1 row
        contrib = (
            e.join(
                rd.filter(F.col("outdeg").isNotNull()).select(
                    F.col("n").alias("csrc"), (F.col("r") / F.col("outdeg")).alias("w")
                ),
                F.col("src") == F.col("csrc"),
            )
            .groupBy("dst")
            .agg(F.sum("w").alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["n"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n_nodes))
            .crossJoin(F.broadcast(dangling))
            .select(
                "n",
                (
                    (F.lit(1.0) - d) / F.col("n_nodes")
                    + d * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / F.col("n_nodes"))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank (Haveliwala 2002): PageRank whose teleport
    mass returns to a SEED distribution instead of uniform — rank
    concentrates around the seeds, giving "importance relative to THIS
    set": the recommendation / related-entities / trusted-seed primitive
    plain PageRank can't express. p0 is uniform over the seed set; both
    the teleport term and the dangling mass redistribute to p0, so
    non-seed dead ends leak no rank away from the neighborhood.

    Same execution contract as ``pagerank``: one edges⋈ranks shuffle per
    round, 1-row broadcast aggregates for dangling mass, rank state one
    row per node localCheckpointed, fixed rounds so the oracle unrolls
    as CTEs.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = sources.select(
        F.col(sources.columns[0]).cast("long").alias("n")
    ).distinct()
    n_seeds = seeds.count()  # bounded: the seed set is query-sized
    p0 = nodes.join(seeds, "n", "left_semi").select(
        "n", (F.lit(1.0) / F.lit(float(n_seeds))).alias("p0")
    )
    base = nodes.join(p0, "n", "left").select(
        "n", F.coalesce("p0", F.lit(0.0)).alias("p0")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).localCheckpoint(eager=True)
    d = F.lit(damping)
    ranks = base.select("n", F.col("p0").alias("r"))
    for _ in range(iterations):
        rd = ranks.join(deg, ranks["n"] == deg["src"], "left")
        dangling = rd.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")
        )  # 1 row
        contrib = (
            e.join(
                rd.filter(F.col("outdeg").isNotNull()).select(
                    F.col("n").alias("csrc"), (F.col("r") / F.col("outdeg")).alias("w")
                ),
                F.col("src") == F.col("csrc"),
            )
            .groupBy("dst")
            .agg(F.sum("w").alias("c"))
        )
        ranks = (
            base.join(contrib, base["n"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "n",
                (
                    (F.lit(1.0) - d) * F.col("p0")
                    + d * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") * F.col("p0"))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (community detection, Raghavan et al.
    2007) with the deterministic variant every distributed engine ships:
    labels start as node ids; each round every node adopts the most
    frequent label among its neighbors, ties broken by the SMALLEST label
    (GraphX's LPA uses the same argmax-with-min-tiebreak so runs are
    reproducible). Fixed iteration count keeps the operator deterministic
    and its oracle SQL-expressible as unrolled CTEs — the same contract
    as ``pagerank`` above.

    All-integer arithmetic: no float rounding concerns cross-engine.

    Scale shape per round: one labels⋈edges shuffle on the node key plus
    one (node, label) hash aggregate with map-side combine, then a
    max_by argmax — no window over the node set, so the reducer never
    sorts more than one node's candidate labels. Label state is one row
    per node, localCheckpointed between rounds; edges are symmetrized
    once up front.
    """
    # Undirected: symmetrize + dedup once; every node then has >= 1
    # neighbor, but the final left join still falls back to the previous
    # label so isolated nodes (present only via a self-loop filtered
    # upstream) would keep their identity label.
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull() & (F.col("s") != F.col("d")))
    )
    e = (
        e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("s").alias("n")).distinct().localCheckpoint(eager=True)
    labels = nodes.select("n", F.col("n").alias("lbl"))
    for _ in range(iterations):
        counted = (
            e.join(labels.select(F.col("n").alias("s"), "lbl"), "s")
            .groupBy(F.col("d").alias("n"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax(cnt) with min-label tie-break as a partial-aggregable
        # max_by over (cnt, -lbl) — never a window sort.
        winner = counted.groupBy("n").agg(
            F.max_by("lbl", F.struct(F.col("cnt"), (-F.col("lbl")).alias("neg"))).alias(
                "new_lbl"
            )
        )
        labels = (
            labels.join(winner, "n", "left")
            .select("n", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS: ``(n, hops)`` — the minimum hop count from ANY
    source node, for every node reachable within ``max_hops``. The
    lineage/provenance primitive of a data lake ("which tables are
    within k derivation steps of this source?") and the crawl-frontier
    primitive of a web pipeline ("pages within k links of the seed
    set"). Directed; callers symmetrize for undirected reachability.

    Frontier expansion, not matrix iteration: round h joins ONLY the
    previous frontier (nodes first reached at h-1) against the edge
    list, then anti-joins the visited set — so per-round shuffle volume
    is proportional to the frontier, which on real graphs peaks and
    shrinks rather than staying corpus-sized. Visited state is one row
    per reached node, localCheckpointed per round; an empty frontier
    short-circuits (every later round would also be empty), which keeps
    the fixed ``max_hops`` bound oracle-friendly without paying for
    rounds past exhaustion. No collect anywhere — the early-exit probe
    is a LIMIT-1 job.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = (
        sources.select(F.col(sources.columns[0]).cast("long").alias("n"))
        .distinct()
        .select("n", F.lit(0).cast("long").alias("hops"))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("n")
    for h in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.select(F.col("n").alias("src")), "src")
            .select(F.col("dst").alias("n"))
            .distinct()
            .join(dist.select("n"), "n", "left_anti")
            .select("n", F.lit(h).cast("long").alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("n")
    return dist


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999): ``(n, auth, hub)`` with
    L1-normalized scores. The hub/authority split is what PageRank
    can't express — in a citation or link graph it separates the
    curated index pages (hubs) from the canonical sources (authorities),
    the standard seed-quality signal for crawl prioritization.

    Kleinberg's update order: auth ← Eᵀ·hub, THEN hub ← E·auth using the
    NEW authorities; each vector is normalized to sum 1 per round (L1 —
    the choice that keeps the oracle a plain SUM, no sqrt). Per round:
    two edges⋈scores shuffles on a node key plus two 1-row total
    aggregates cross-joined back broadcast — no driver collect; score
    state is one row per node, localCheckpointed per round, same
    contract as ``pagerank`` above so the oracle unrolls as CTEs.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    auth = nodes.select("n", F.lit(1.0).alias("a"))
    hub = nodes.select("n", F.lit(1.0).alias("h"))
    for _ in range(iterations):
        a_raw = (
            e.join(hub.select(F.col("n").alias("src"), F.col("h").alias("hw")), "src")
            .groupBy(F.col("dst").alias("n"))
            .agg(F.sum("hw").alias("raw"))
        )
        a_full = nodes.join(a_raw, "n", "left").select(
            "n", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        a_tot = a_full.agg(F.sum("raw").alias("t"))  # 1 row
        auth = (
            a_full.crossJoin(F.broadcast(a_tot))
            .select("n", (F.col("raw") / F.col("t")).alias("a"))
            .localCheckpoint(eager=True)
        )
        h_raw = (
            e.join(auth.select(F.col("n").alias("dst"), F.col("a").alias("aw")), "dst")
            .groupBy(F.col("src").alias("n"))
            .agg(F.sum("aw").alias("raw"))
        )
        h_full = nodes.join(h_raw, "n", "left").select(
            "n", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        h_tot = h_full.agg(F.sum("raw").alias("t"))  # 1 row
        hub = (
            h_full.crossJoin(F.broadcast(h_tot))
            .select("n", (F.col("raw") / F.col("t")).alias("h"))
            .localCheckpoint(eager=True)
        )
    return auth.join(hub, "n").select("n", "a", "h")


def neighbor_similarity(
    edges: DataFrame,
    max_degree: int | None = None,
    min_common: int = 1,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Link prediction by neighborhood overlap: for every node pair that
    shares >= ``min_common`` neighbors, emit common-neighbor count,
    Jaccard overlap, and Adamic–Adar (Σ 1/ln(deg(w)) over shared
    neighbors w — rare shared neighbors count more). The classic
    "suggest an edge" / "are these two entities the same" score over a
    co-occurrence or citation graph.

    The pair generation is the friends-of-friends self-join keyed on the
    SHARED neighbor, so its cost is Σ_w deg(w)² — quadratic in the
    hottest node. ``max_degree`` is the standard hub guard: nodes above
    the cap are dropped as shared-neighbor pivots BEFORE the self-join
    (a celebrity node connected to everyone predicts nothing anyway —
    its 1/ln(deg) weight is already ≈0). With the cap, per-key fanout is
    bounded and the join shuffles cleanly on w at any corpus size;
    degrees for the Jaccard denominator are computed on the UNCAPPED
    graph so the scores stay exact.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull() & (F.col("s") != F.col("d")))
    )
    adj = (
        e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )  # (s = node, d = neighbor), symmetric
    deg = adj.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # pivot on the shared neighbor w: adjacency re-keyed as (w, member)
    piv = adj.select(F.col("d").alias("w"), F.col("s").alias("m"))
    if max_degree is not None:
        keep = deg.filter(F.col("deg") <= max_degree).select(F.col("s").alias("w"))
        piv = piv.join(keep, "w", "left_semi")
    piv = piv.join(
        deg.select(F.col("s").alias("w"), F.col("deg").alias("wdeg")), "w"
    )
    a, b = piv.alias("a"), piv.alias("b")
    # Adamic–Adar terms are floored to integer MICRO-UNITS before the
    # SUM (the repo's cross-engine convention for summed doubles): an
    # integer sum is partition-order independent, so the score can never
    # flake across layouts/AQE or drift from a DuckDB oracle at a
    # rounding boundary the way a float sum reduced in a different order
    # could.
    aa_micro = F.floor(F.lit(1000000.0) / F.log(F.col("a.wdeg").cast("double")))
    pairs = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.m") < F.col("b.m")))
        .groupBy(F.col("a.m").alias("u"), F.col("b.m").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            (F.sum(aa_micro) / F.lit(1000000.0)).alias("adamic_adar"),
        )
        .filter(F.col("common") >= min_common)
    )
    return (
        pairs.join(deg.select(F.col("s").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("s").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u",
            "v",
            "common",
            (F.col("common") / (F.col("du") + F.col("dv") - F.col("common")).cast("double")).alias("jaccard"),
            "adamic_adar",
        )
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling: ``(n, core_degree)`` for nodes that
    survive ``rounds`` iterations of "drop every node with degree < k"
    (Seidman 1983 cores; the standard boilerplate/hub detector over a
    near-dup or citation graph — the k-core is what's left after the
    sparse fringe peels away). Fixed round count keeps the operator
    deterministic and the oracle expressible as unrolled CTEs, the same
    contract as ``pagerank``/``label_propagation``; when a round removes
    nothing the edge set is a fixpoint, so with enough rounds this IS the
    exact k-core (convergence is data-dependent; callers pin rounds).

    Scale shape per round: one degree aggregate (map-side combinable) +
    two semi-joins of the edge list against the surviving-node set —
    edges shuffle on one endpoint key each; the node set is corpus-sized
    so no broadcast hint (AQE demotes when small). Edge state is
    localCheckpointed per round to truncate lineage.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull() & (F.col("s") != F.col("d")))
    )
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    e = e.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("s")
        e = (
            e.join(keep, "s", "left_semi")
            .join(keep.select(F.col("s").alias("d")), "d", "left_semi")
            .localCheckpoint(eager=True)
        )
    return e.groupBy(F.col("s").alias("n")).agg(F.count(F.lit(1)).alias("core_degree"))


def clustering_coefficient(
    edges: DataFrame,
    max_degree: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node (Watts & Strogatz 1998):
    lcc(n) = triangles(n) / C(deg(n), 2). Returns ``(node, degree,
    n_triangles, lcc)`` for every node with degree >= 2.

    The wedge generation is the adjacency self-join keyed on the CENTER
    node — cost Σ_n deg(n)², quadratic in the hottest node, the same
    shape as ``neighbor_similarity``'s shared-neighbor pivot. The same
    hub guard applies: with ``max_degree`` set, nodes above the cap are
    dropped as wedge CENTERS before the self-join (per-key fanout
    bounded at C(max_degree, 2), so the join shuffles cleanly at any
    corpus size) and reported with ``n_triangles``/``lcc`` NULL — an
    honest "not computed", never a silent 0, because a celebrity hub's
    lcc is ≈0 by construction and not worth a quadratic stage. Degrees
    (the denominator AND the cap test) come from the uncapped adjacency,
    so every emitted lcc is exact.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull() & (F.col("s") != F.col("d")))
    )
    adj = (
        e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)  # feeds degrees, wedges and the closer
    )
    deg = adj.groupBy(F.col("s").alias("n")).agg(F.count(F.lit(1)).alias("degree"))
    wsrc = adj
    if max_degree is not None:
        keep = deg.filter(F.col("degree") <= max_degree).select(F.col("n").alias("s"))
        wsrc = wsrc.join(keep, "s", "left_semi")
    a, b = wsrc.alias("a"), wsrc.alias("b")
    wedge = a.join(
        b, (F.col("a.s") == F.col("b.s")) & (F.col("a.d") < F.col("b.d"))
    ).select(F.col("a.s").alias("n"), F.col("a.d").alias("u"), F.col("b.d").alias("v"))
    closer = adj.select(F.col("s").alias("u"), F.col("d").alias("v"))
    tri = wedge.join(closer, ["u", "v"]).groupBy("n").agg(
        F.count(F.lit(1)).alias("n_tri")
    )
    out = deg.join(tri, "n", "left").filter(F.col("degree") >= 2)
    capped = (
        F.lit(False) if max_degree is None else F.col("degree") > F.lit(max_degree)
    )
    n_tri = F.when(capped, F.lit(None).cast("long")).otherwise(
        F.coalesce("n_tri", F.lit(0)).cast("long")
    )
    lcc = F.round(
        F.coalesce("n_tri", F.lit(0))
        / (F.col("degree") * (F.col("degree") - 1) / F.lit(2.0)),
        6,
    )
    return out.select(
        F.col("n").alias("node"),
        "degree",
        n_tri.alias("n_triangles"),
        F.when(capped, F.lit(None).cast("double")).otherwise(lcc).alias("lcc"),
    )
