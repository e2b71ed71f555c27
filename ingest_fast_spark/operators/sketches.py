"""Sketch-backed pre-filters for 100 TB membership / frequency questions
(SURVEY.md §2.9 [EXT] family; no reference counterpart — the reference's
closest analogue is the in-heap ``allSameAs`` probe index,
lib/ingest.js:103,257-260, which these replace with bounded-size sketches).

Two operators, both designed so the APPROXIMATE structure only *routes*
work and the registered answer stays EXACTLY equal to a direct
computation (hence DuckDB-oracle-checkable):

* Bloom-filter membership pre-filter — build an m-bit filter over the
  reference corpus's shingles, probe every new-crawl shingle against it.
  The filter is the classic crawl-admission gate: at 100 TB the bit
  array (m bits, e.g. 2^30 bits = 128 MB) broadcasts to every executor
  while the reference shingle set itself (TBs) never moves. The filter
  content is represented relationally as the DISTINCT set-bit positions
  (≤ m rows of one int) — semantically identical to the bit array,
  join-able, and expressible in SQL for the oracle. No false negatives
  by construction; false positives are *measured* by the query output.

* Misra-Gries heavy hitters with exact recount — per-partition bounded
  MG summaries (capacity c) find a candidate superset, then only the
  ≤ c×partitions candidate tokens are exactly recounted. The MG merge
  guarantee (undercount ≤ Σ_p n_p/(c+1) = n/(c+1)) makes the candidate
  set a PROVEN superset of every token with frequency > n/(c+1), so
  with threshold φ ≥ 1/(c+1) the final output equals the plain
  GROUP BY / HAVING answer — without ever shuffling the full token
  stream on the token key. (Cf. Misra & Gries 1982; mergeability per
  Agarwal et al., "Mergeable Summaries", PODS 2012.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _MINHASH_P, minhash_families, portable_hash60, portable_hash60_sql

# Bloom geometry for the registered query (sf-test sized so the measured
# false-positive rate is non-trivial: ~13% at sf0.01's 14.5k reference
# shingles; at 100 TB you scale m with the reference corpus's
# distinct-shingle count to hold fp ≈ (1 - e^{-k·n/m})^k at target).
BLOOM_M = 1 << 16
BLOOM_K = 2
BLOOM_SEED = 20260814


def _bloom_fams() -> list[tuple[int, int]]:
    return minhash_families(BLOOM_K, seed=BLOOM_SEED)


def _positions(hcol):
    """Array of BLOOM_K bit positions for a (already mod-P) 60-bit hash."""
    return F.array(
        *[
            ((F.lit(a) * hcol + F.lit(b)) % _MINHASH_P) % F.lit(BLOOM_M)
            for a, b in _bloom_fams()
        ]
    )


def bloom_build_bits(shingle_df: DataFrame, shingle_col: str = "shingle") -> DataFrame:
    """Set-bit positions (one int column ``pos``) of the Bloom filter over
    a shingle relation. One explode + one distinct; ≤ BLOOM_M rows out,
    always broadcastable regardless of input size."""
    h = portable_hash60(F.col(shingle_col)) % _MINHASH_P
    return (
        shingle_df.select(F.explode(_positions(h)).alias("pos"))
        .dropDuplicates(["pos"])
    )


def bloom_probe_report(
    probe_shingles: DataFrame,
    ref_shingles: DataFrame,
) -> DataFrame:
    """Per probe document: how many of its shingles pass the Bloom filter
    built from ``ref_shingles``, versus how many are EXACT members of the
    reference shingle set. ``n_false_pos`` is the filter's measured
    false-positive count — the number you check before trusting the
    filter as an admission gate.

    Inputs are (doc_id, shingle) relations (see ``dedup.shingles_df``).
    Plan shape: bits (≤ m rows) broadcasts into the position probe; the
    exact check is a semi-join on the shingle key (the only big shuffle,
    and it is exactly the join the filter would *replace* at scale — the
    query exists to measure that trade)."""
    bits = bloom_build_bits(ref_shingles)
    h = portable_hash60(F.col("shingle")) % _MINHASH_P
    probed = probe_shingles.select(
        "doc_id", "shingle", F.explode(_positions(h)).alias("pos")
    )
    # A shingle passes iff ALL K of its positions are set. Count matched
    # exploded rows per (doc, shingle): every position row matches ≤ 1
    # bits row (bits is distinct), so hits == BLOOM_K ⇔ all set.
    hits = (
        probed.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    passed = hits.filter(F.col("n_hit") == BLOOM_K).select("doc_id", "shingle")
    exact = probe_shingles.join(
        ref_shingles.select("shingle").dropDuplicates(["shingle"]),
        "shingle",
        "left_semi",
    )
    n_all = probe_shingles.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    n_pass = passed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_bloom_pass"))
    n_exact = exact.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_exact_hits"))
    return (
        n_all.join(n_pass, "doc_id", "left")
        .join(n_exact, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_bloom_pass", F.lit(0)).alias("n_bloom_pass"),
            F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
            (
                F.coalesce("n_bloom_pass", F.lit(0))
                - F.coalesce("n_exact_hits", F.lit(0))
            ).alias("n_false_pos"),
        )
    )


def bloom_positions_sql(hexpr: str, i: int) -> str:
    """DuckDB twin of position i for a mod-P hash expression."""
    a, b = _bloom_fams()[i]
    return f"(({a} * ({hexpr}) + {b}) % {_MINHASH_P}) % {BLOOM_M}"


def bloom_hash_sql(shingle_expr: str) -> str:
    return f"({portable_hash60_sql(shingle_expr)} % {_MINHASH_P})"


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def mg_candidates(tokens_df: DataFrame, capacity: int, tok_col: str = "tok") -> DataFrame:
    """Per-partition Misra-Gries survivors (distinct tokens). Bounded
    memory (``capacity`` counters per partition) and bounded output
    (≤ capacity × partitions rows) no matter the input size — this is
    the routing stage, not the answer."""

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf[tok_col]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    # Decrement-all; drop zeros. Amortized O(1)/token: each
                    # decrement cancels one earlier increment.
                    dead = []
                    for k2 in counters:
                        counters[k2] -= 1
                        if counters[k2] == 0:
                            dead.append(k2)
                    for k2 in dead:
                        del counters[k2]
        if counters:
            yield pd.DataFrame({tok_col: list(counters.keys())})

    return tokens_df.select(tok_col).mapInPandas(
        mg, f"{tok_col} string"
    ).dropDuplicates([tok_col])


def heavy_hitters_exact(
    tokens_df: DataFrame,
    inv_phi: int = 500,
    capacity: int = 1000,
    tok_col: str = "tok",
) -> DataFrame:
    """Tokens with frequency ≥ total/inv_phi, with EXACT counts — equal to
    a plain GROUP BY/HAVING (the oracle) by the MG superset guarantee,
    which needs capacity + 1 > inv_phi (asserted). The full token stream
    is aggregated only against the broadcast candidate set, so the big
    shuffle a naive global GROUP BY pays on the token key is bounded to
    candidate tokens."""
    if capacity + 1 <= inv_phi:
        raise ValueError("MG guarantee needs capacity + 1 > inv_phi")
    cand = mg_candidates(tokens_df, capacity, tok_col)
    counts = (
        tokens_df.join(F.broadcast(cand), tok_col)
        .groupBy(tok_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = tokens_df.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * inv_phi >= F.col("total"))
        .select(
            tok_col,
            "cnt",
            F.round(F.col("cnt") / F.col("total").cast("double"), 6).alias("share"),
        )
    )


# --- Count-Min sketch (Cormode & Muthukrishnan 2005) -------------------------
#
# The mergeable streaming-frequency summary: d hash rows x w buckets of
# counters; EST(t) = min over rows of the counter t hashes into. Always an
# overestimate; err <= (e/w)*N per query with probability 1 - e^-d. Engine-
# portable hashing (md5-derived token hash pushed through the same affine
# family machinery as MinHash) so DuckDB rebuilds the identical sketch.

CMS_D = 4
CMS_W = 256
CMS_SEED = 20260815


def _cms_fams() -> list[tuple[int, int]]:
    return minhash_families(CMS_D, seed=CMS_SEED)


def cms_bucket(hcol, i: int):
    """Bucket of hash row ``i`` for a reduced token hash column."""
    a, b = _cms_fams()[i]
    return ((F.lit(a) * hcol + F.lit(b)) % _MINHASH_P) % CMS_W


def cms_bucket_sql(hexpr: str, i: int) -> str:
    a, b = _cms_fams()[i]
    return f"((({a} * ({hexpr}) + {b}) % {_MINHASH_P}) % {CMS_W})"


def cms_cells(tokens_df: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Build the d x w counter table: ``(row_i, bucket, cnt)``.

    One pass over the token stream; the explode to d rows happens on the
    (row_i, bucket) AGGREGATE keys, so the shuffle carries at most d*w
    = 4x256 cells per map task (map-side partial aggregation collapses
    the token stream before the exchange) — the sketch property that makes
    it viable as a 100 TB running summary where exact per-token counts
    are not.
    """
    h = (portable_hash60(F.col(tok_col)) % _MINHASH_P).alias("h")
    cells = tokens_df.select(h).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row_i"), cms_bucket(F.col("h"), i).alias("bucket"))
                    for i in range(CMS_D)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy("c.row_i", "c.bucket").agg(F.count(F.lit(1)).alias("cnt"))


# --- HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) -------------------
#
# The mergeable distinct-count summary: m = 2^p registers, each holding the
# max "rank" (trailing-zero run + 1) of the hashes routed to it; the raw
# estimate is alpha_m * m^2 / sum_j 2^-M_j with the linear-counting
# correction for the small-cardinality regime. Register union = elementwise
# MAX, so partial aggregation collapses any input to <= m rows per map task
# -- the property that makes it THE 100 TB distinct counter. Engine-portable
# hashing (the md5-derived 60-bit hash used by the whole sketch family) so
# DuckDB rebuilds the IDENTICAL register file: low p bits route, the
# remaining 52 bits feed the rank (an equivalent-distribution variant of the
# paper's leading-zero formulation; documented here so the oracle twin is
# read as intentional).

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers: sigma = 1.04/sqrt(m) = 6.5%
HLL_MAXRHO = 53  # rank cap when the remaining 52 hash bits are all zero
# alpha_m * m^2 * 2^53 precomputed in Python and embedded as ONE decimal
# literal on both engines, so the estimate is a single exactly-rounded IEEE
# division of two identical doubles (no transcendental parity risk on the
# raw path).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_EST_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_MAXRHO)


def hll_rho(rest):
    """Rank of the non-routing hash bits: trailing-zero count + 1, computed
    in pure integer ops ((rest & -rest) isolates the lowest set bit;
    bit_count of one-less gives the zero run) -- bit-identical across
    engines, unlike a float log2."""
    return F.when(rest == 0, F.lit(HLL_MAXRHO)).otherwise(
        F.bit_count((rest.bitwiseAND(-rest)) - F.lit(1)) + F.lit(1)
    )


def hll_registers(items: DataFrame, item_col: str) -> DataFrame:
    """Dense register file ``(register, rho)`` -- exactly HLL_M rows, zero
    registers materialized (the estimate needs them and the driver oracle
    attests them). groupBy(register).max(rho) partial-aggregates map-side:
    at most m rows leave any task regardless of input size, and the same
    MAX merges register files across shards/streams."""
    h = portable_hash60(F.col(item_col))
    routed = items.select(
        (h % HLL_M).alias("register"), F.shiftright(h, HLL_P).alias("rest")
    )
    regs = routed.select("register", hll_rho(F.col("rest")).alias("rho")).groupBy(
        "register"
    ).agg(F.max("rho").alias("rho"))
    spine = items.sparkSession.range(HLL_M).select(F.col("id").alias("register"))
    return spine.join(regs, "register", "left").select(
        "register", F.coalesce("rho", F.lit(0)).cast("int").alias("rho")
    )


def hll_estimate_micro(regs: DataFrame) -> DataFrame:
    """One row ``(est_micro,)``: the HLL estimate in exact micro-units.
    Raw path: EST_NUM / S where S = sum 2^(MAXRHO - rho) is an exact
    BIGINT (<= m * 2^53 < 2^63) -- one IEEE division, parity-exact.
    Linear-counting path (raw <= 2.5m and zero registers exist):
    m * ln(m / V); ln is the one transcendental, stabilized by the
    micro-unit floor like every other logarithm in the registry."""
    # F.shiftleft needs a Python-int shift; the per-row amount forces expr()
    s = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_MAXRHO} - rho)"))
    v = F.sum((F.col("rho") == 0).cast("long"))
    agg = regs.agg(s.alias("s"), v.alias("v"))
    raw = F.lit(HLL_EST_NUM) / F.col("s").cast("double")
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v").cast("double"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (F.col("v") > 0), lc).otherwise(raw)
    return agg.select(
        F.floor(est * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("est_micro")
    )


def hll_sql(item_expr: str, from_clause: str) -> str:
    """DuckDB CTE chain rebuilding the identical register file + estimate.
    Returns the text of CTEs ``hll_regs`` (register, rho) and ``hll_est``
    (est_micro) to embed in an oracle query."""
    h60 = portable_hash60_sql(item_expr)
    return f"""hll_rr AS (
      SELECT h % {HLL_M} AS register, h >> {HLL_P} AS rest
      FROM (SELECT ({h60}) AS h {from_clause})
    ),
    hll_mx AS (
      SELECT register,
             MAX(CASE WHEN rest = 0 THEN {HLL_MAXRHO}
                      ELSE bit_count((rest & (-rest)) - 1) + 1 END) AS rho
      FROM hll_rr GROUP BY register
    ),
    hll_regs AS (
      SELECT g.register, CAST(COALESCE(hll_mx.rho, 0) AS INTEGER) AS rho
      FROM (SELECT unnest(generate_series(0, {HLL_M - 1})) AS register) g
      LEFT JOIN hll_mx USING (register)
    ),
    hll_sum AS (
      SELECT CAST(SUM(1::BIGINT << ({HLL_MAXRHO} - rho)) AS BIGINT) AS s,
             CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
      FROM hll_regs
    ),
    hll_est AS (
      SELECT CAST(floor(
        CASE WHEN ({HLL_EST_NUM!r} / s) <= {2.5 * HLL_M!r} AND v > 0
             THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
             ELSE {HLL_EST_NUM!r} / s END * 1000000.0 + 0.5) AS BIGINT) AS est_micro
      FROM hll_sum
    )"""


# --- KMV / k-minimum-values sketch (Bar-Yossef et al. 2002; Beyer et al.
# SIGMOD 2007) ----------------------------------------------------------------
#
# The distinct-SET-OPERATION summary: keep the k smallest distinct hash
# values of a set. Union of two sketches = re-trimmed k-min of their merged
# values (so sketches are mergeable like HLL registers), but unlike HLL the
# sketch is a uniform SAMPLE of the distinct space — so it also estimates
# INTERSECTIONS and Jaccard (count union-sketch members present in both
# sides / k), which register-max structures cannot. Cardinality estimate:
# (k-1) * |hash space| / h_(k), exact when the set is smaller than k.

KMV_K = 256
KMV_EST_NUM = float((KMV_K - 1) << 60)  # (k-1) * 2^60: exact double
# 3 * 1/sqrt(k-2) in micro-units for the cardinality accuracy invariant
KMV_3SIG_MICRO = int(3.0 / (KMV_K - 2) ** 0.5 * 1e6)


def kmv_sketch(items: DataFrame, item_col: str, k: int = KMV_K) -> DataFrame:
    """The k smallest DISTINCT portable 60-bit hashes of ``items`` as a
    one-column frame ``h``. Scale shape: a bounded-memory per-partition
    pass (size-k max-heap — exactly how a streaming KMV is maintained)
    emits <= k rows per task, so the final distinct + take-ordered
    reduces <= k * partitions rows regardless of input size."""

    def local_k(batches):
        import heapq

        import pandas as pd

        heap: list[int] = []  # max-heap via negation
        inset: set[int] = set()
        for pdf in batches:
            for v in pdf["h"]:
                v = int(v)
                if v in inset:
                    continue
                if len(heap) < k:
                    heapq.heappush(heap, -v)
                    inset.add(v)
                elif v < -heap[0]:
                    dropped = -heapq.heappushpop(heap, -v)
                    inset.discard(dropped)
                    inset.add(v)
        if inset:
            yield pd.DataFrame({"h": sorted(inset)})

    hs = items.select(portable_hash60(F.col(item_col)).alias("h"))
    return hs.mapInPandas(local_k, "h long").distinct().orderBy("h").limit(k)


def kmv_sketch_sides(
    hashed: DataFrame, side_col: str = "side", h_col: str = "h", k: int = KMV_K
) -> DataFrame:
    """Per-SIDE k smallest distinct hashes in ONE corpus pass: the
    per-partition pass keeps a size-k max-heap per side (two streaming
    KMVs side by side), so a two-corpus comparison pays one Arrow
    transfer and one job instead of one per side. Input must already
    carry the hash column (hash in-row before any shuffle — the distinct
    upstream then exchanges 16-byte (int, long) rows, never strings).
    Batch path is vectorized: np.unique per (batch, side), then only
    values below the current kth minimum enter the Python heap loop —
    after the first few batches that subset is ~empty (guide §4.2)."""

    def local_k(batches):
        import heapq

        import numpy as np
        import pandas as pd

        heaps: dict = {}  # side -> (max-heap via negation, member set)
        for pdf in batches:
            for s, vals in pdf.groupby(side_col)[h_col]:
                hp, inset = heaps.setdefault(int(s), ([], set()))
                u = np.unique(vals.to_numpy())
                if len(hp) == k:
                    u = u[u < -hp[0]]
                for v in u:
                    v = int(v)
                    if v in inset:
                        continue
                    if len(hp) < k:
                        heapq.heappush(hp, -v)
                        inset.add(v)
                    elif v < -hp[0]:
                        dropped = -heapq.heappushpop(hp, -v)
                        inset.discard(dropped)
                        inset.add(v)
        for s, (hp, inset) in sorted(heaps.items()):
            if inset:
                yield pd.DataFrame({side_col: s, h_col: sorted(inset)})

    from pyspark.sql import Window

    out = hashed.select(side_col, h_col).mapInPandas(
        local_k, f"{side_col} int, {h_col} long"
    )
    w = Window.partitionBy(side_col).orderBy(h_col)
    return (
        out.dropDuplicates([side_col, h_col])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
