"""Relational operator surface (SURVEY.md §2.2-§2.6) on the star schema.

Each query is the idiomatic Catalyst plan for its operator: filters and
projections reach the parquet scan (pushdown/pruning), joins are
broadcast where one side is a dimension table, aggregates are partial
(map-side) hash aggregates, window functions declare explicit frames.
The paired DuckDB SQL (see queries/__init__ conventions) is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


import itertools

_SEQ_VIEWS = itertools.count()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scans / filters / projections (P2-P8 generalized)
# ---------------------------------------------------------------------------

@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net_price
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05
      AND l_returnflag = 'R'
    """,
)
def filter_project(spark, sf_dir):
    """Predicate + projection; both reach the parquet scan (PushedFilters).

    Rounding is the engine-portable ``floor(x*100+0.5)/100`` — per-row
    ROUND() of a double differs between engines exactly at .xx5 boundaries
    (Spark rounds the shortest decimal repr half-up, DuckDB rounds the
    binary value), and with 60k+ raw rows a boundary hit is near-certain.
    Aggregated outputs (sums/avgs) keep plain ROUND: boundary hits there
    are measure-zero and the values are few."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            F.col("l_quantity").between(10, 20)
            & (F.col("l_discount") > 0.05)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_partkey",
            "l_linenumber",
            (
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5))
                / 100
            ).alias("net_price"),
        )
    )


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           substr(p_name, 1, 5)                            AS name_prefix,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
           CAST(length(p_name) AS INT)                     AS name_len,
           concat(p_type, '/', p_brand)                    AS type_brand,
           replace(p_type, 'ECONOMY', 'ECO')               AS type_short
    FROM part
    WHERE p_size >= 25
    """,
)
def scalar_string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_size") >= 25).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("long").alias("brand_num"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
    )


@register(
    "date_time_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)      AS order_year,
           CAST(month(o_orderdate) AS INT)     AS order_month,
           CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
           strftime(o_orderdate, '%Y-%m')      AS order_ym,
           strftime(o_orderdate, '%Y-%m-%d')   AS order_date
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def date_time_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A7 generalized + standard numeric aggs)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the flagship scan→filter→hash-agg pipeline. Partial
    aggregation happens map-side; 6 groups means near-zero shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_basic_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*)                        AS n_orders,
           ROUND(SUM(o_totalprice), 2)     AS sum_total,
           ROUND(AVG(o_totalprice), 2)     AS avg_total,
           ROUND(MIN(o_totalprice), 2)     AS min_total,
           ROUND(MAX(o_totalprice), 2)     AS max_total
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def agg_basic_stats(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_total"),
        F.round(F.min("o_totalprice"), 2).alias("min_total"),
        F.round(F.max("o_totalprice"), 2).alias("max_total"),
    )


@register(
    "agg_distinct_collect",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list_distinct(list(l_linestatus))), '|') AS statuses,
           COUNT(DISTINCT l_suppkey)                    AS n_supp,
           COUNT(DISTINCT l_partkey)                    AS n_part
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_collect(spark, sf_dir):
    """Set-collect (A5) + multi distinct-count in one aggregate. The set is
    emitted '|'-joined: the driver canonicalizer sorts rows by every column
    and can't order list cells."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), "|").alias("statuses"),
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct("l_partkey").alias("n_part"),
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark, sf_dir):
    """approx_count_distinct — the 100 TB path for distinct cardinality
    (single pass, bounded memory, no exact-distinct shuffle explosion).
    The HLL++ ESTIMATE is engine-specific (DuckDB has no twin) but
    deterministic for a given input (no RNG — fixed hash family), so the
    registered row carries the exact count plus a boolean attesting the
    estimate landed within 3× the requested relative standard deviation —
    TRUE with overwhelming margin by the sketch's contract, hence
    oracle-exact. (Converted from rows-only: VERDICT r4 task-5 pattern.)"""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    ).select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 3 * 0.02 * F.col("exact_parts")
        ).alias("approx_within_bound"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_quantity), 2)     AS sum_qty,
           COUNT(*)                      AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*)                         AS n_orders,
           ROUND(SUM(o_totalprice), 2)      AS sum_total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_total",
        )
    )


# ---------------------------------------------------------------------------
# Joins (J1-J3 generalized: inner/left/semi/anti/broadcast/disjunctive)
# ---------------------------------------------------------------------------

@register(
    "join_inner_broadcast",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment,
           ROUND(o.o_totalprice, 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 9000
    """,
)
def join_inner_broadcast(spark, sf_dir):
    """Fact⋈dimension: the dimension side is explicitly broadcast — at
    100 TB the orders side never shuffles."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey",
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round("o_totalprice", 2).alias("total"),
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey)                        AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS sum_total
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("sum_total"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_disjunctive_union",
    oracle="""
    SELECT DISTINCT c.c_custkey, s.s_suppkey
    FROM customer c JOIN supplier s
      ON s.s_nationkey = c.c_nationkey OR ROUND(s.s_acctbal) = ROUND(c.c_acctbal)
    """,
)
def join_disjunctive_union(spark, sf_dir):
    """J2 pattern (reference lib/ingest.js:108-113): an OR-join rewritten as
    a UNION of two equi-joins so both probes stay hash joins — the OR form
    degrades to a nested-loop at scale."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    by_nation = c.join(s, s.s_nationkey == c.c_nationkey).select("c_custkey", "s_suppkey")
    by_bal = c.join(s, F.round(s.s_acctbal) == F.round(c.c_acctbal)).select(
        "c_custkey", "s_suppkey"
    )
    return by_nation.unionByName(by_bal).dropDuplicates(["c_custkey", "s_suppkey"])


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dimension filter broadcast into a two-fact
    join, then agg + deterministic top-k."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        # Only the customer DIM broadcasts; the filtered orders⋈customer
        # result is fact-scale (a constant fraction of orders), so its
        # join to lineitem is hint-free — AQE broadcasts it at small SFs
        # and shuffles at scale.
        l.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
               l.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join; every dimension is broadcast so the
    only shuffles are the lineitem⋈orders co-partition and the final agg."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k / windows / set ops (§2.6)
# ---------------------------------------------------------------------------

@register(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def sort_limit_topn(spark, sf_dir):
    """Global top-N: Spark plans TakeOrderedAndProject — per-partition heap
    + driver merge, no full sort at any scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .limit(20)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_ranking",
    oracle="""
    SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 2) AS acctbal,
           CAST(RANK()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INT) AS bal_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INT) AS bal_dense_rank,
           ROUND(AVG(s_acctbal) OVER (PARTITION BY s_nationkey), 2) AS nation_avg_bal
    FROM supplier
    """,
)
def window_ranking(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    wp = Window.partitionBy("s_nationkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round("s_acctbal", 2).alias("acctbal"),
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.round(F.avg("s_acctbal").over(wp), 2).alias("nation_avg_bal"),
    )


@register(
    "window_running_agg",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 2) AS value,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value,
           ROUND(LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_value
    FROM events
    """,
)
def window_running_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    order = [F.asc("ts"), F.asc("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round(F.sum("value").over(wf), 2).alias("running_total"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
    )


@register(
    "set_ops",
    oracle="""
    WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 7000),
         bldg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'union' AS op, c_custkey FROM (SELECT * FROM rich UNION SELECT * FROM bldg)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM rich INTERSECT SELECT * FROM bldg)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT * FROM rich EXCEPT SELECT * FROM bldg)
    """,
)
def set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    bldg = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "c_custkey")  # noqa: E731
    return (
        tag(rich.union(bldg).distinct(), "union")
        .unionByName(tag(rich.intersect(bldg), "intersect"))
        .unionByName(tag(rich.exceptAll(bldg).distinct(), "except"))
    )


@register(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark, sf_dir):
    """Pivot with an explicit value list — never the two-pass value-discovery
    form, which would add a full extra scan at scale."""
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = e.groupBy("user_id").pivot("event_type", kinds).count().na.fill(0)
    return out.select("user_id", *[F.col(k).alias(f"n_{k}") for k in kinds])


@register(
    "json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')               AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT)  AS k_int
    FROM events WHERE event_type = 'purchase'
    """,
)
def json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


@register(
    "time_bucket_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
           event_type,
           COUNT(*)              AS n_events,
           ROUND(SUM(value), 2)  AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def time_bucket_tumbling(spark, sf_dir):
    """Tumbling-window aggregation — the batch shape of the Structured
    Streaming windowed agg (streaming/ has the readStream variant)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events", "sum_value")
    )


@register(
    "sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize(spark, sf_dir):
    """Session windows (30-min inactivity gap) via gaps-and-islands — pure
    window functions, no per-row state. The streaming/ module has the
    session_window + watermark variant for unbounded input."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1000 * 1000), 1).otherwise(0).alias("new_session"),
    )
    sessions = flagged.select(
        "user_id", F.sum("new_session").over(wf).alias("session_id")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# ---------------------------------------------------------------------------
# Temporal / range joins and remaining aggregate shapes
# ---------------------------------------------------------------------------

@register(
    "join_asof",
    oracle="""
    WITH a AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         b AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT a.event_id, a.user_id, a.ts,
           b.ts    AS matched_ts,
           b.value AS matched_value
    FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND b.ts <= a.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent click at
    or before it. Spark side is the union+window idiom (one shuffle on
    user_id, no range probe) — see operators/joins.py."""
    from ..operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(purchases, clicks, keys=["user_id"], right_cols=["value"])


_PRICE_BANDS = [
    ("b900", 900.0, 920.0),
    ("b920", 920.0, 940.0),
    ("b940", 940.0, 960.0),
    ("b960", 960.0, 980.0),
    ("b980", 980.0, 1000.0),
]


@register(
    "join_range",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
      ('b900', 900.0, 920.0), ('b920', 920.0, 940.0), ('b940', 940.0, 960.0),
      ('b960', 960.0, 980.0), ('b980', 980.0, 1000.0))
    SELECT band, COUNT(*) AS n_parts, ROUND(SUM(p_retailprice), 2) AS sum_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def join_range(spark, sf_dir):
    """Range (band) join: facts into [lo, hi) price bands via a broadcast
    non-equi join — zero shuffle of the fact side."""
    from ..operators.joins import range_join

    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(_PRICE_BANDS, "band string, lo double, hi double")
    return (
        range_join(p, bands, "p_retailprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_quantity), 2)     AS sum_qty,
           COUNT(*)                      AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (rollup/cube's general form) via Spark SQL."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_grouping_sets")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               ROUND(SUM(l_quantity), 2)     AS sum_qty,
               COUNT(*)                      AS n_rows
        FROM li_grouping_sets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           ROUND(median(l_extendedprice), 4)              AS med
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (sort-based aggregate). The approx
    sketch twin (percentile_approx / KLL at scale) is agg_approx_count_
    distinct's pattern; exact percentile is the oracle-matchable form."""
    l = _t(spark, sf_dir, "lineitem")
    # ONE percentile aggregate with an array argument — a single sort per
    # group instead of four independent sort-based aggregates.
    parr = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75)))
    return (
        l.groupBy("l_returnflag")
        .agg(parr.alias("_p"))
        .select(
            "l_returnflag",
            F.round(F.element_at("_p", 1), 4).alias("p25"),
            F.round(F.element_at("_p", 2), 4).alias("p50"),
            F.round(F.element_at("_p", 3), 4).alias("p75"),
            F.round(F.element_at("_p", 2), 4).alias("med"),
        )
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           COUNT(*)                        AS n_events,
           ROUND(SUM(value), 2)            AS sum_value,
           ROUND(MIN(value), 2)            AS min_value,
           ROUND(MAX(value), 2)            AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark, sf_dir):
    """Salted two-phase aggregation over a genuinely skewed key (5 hot
    event_type values across all rows): each hot key fans across 16
    reducers in phase 1, a tiny phase-2 combine restores exact semantics.
    See operators/skew.py."""
    from ..operators.skew import salted_agg

    e = _t(spark, sf_dir, "events")
    out = salted_agg(
        e,
        ["event_type"],
        [
            ("value", "count", "n_events"),
            ("value", "sum", "sum_value"),
            ("value", "min", "min_value"),
            ("value", "max", "max_value"),
        ],
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        F.round("min_value", 2).alias("min_value"),
        F.round("max_value", 2).alias("max_value"),
    )


@register(
    "unpivot_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, value
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
    """,
)
def unpivot_metrics(spark, sf_dir):
    """UNPIVOT/melt: wide measure columns → (metric, value) long form."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return l.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax",
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )


@register(
    "agg_corr_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(stddev_samp(l_extendedprice), 2)            AS std_price,
           ROUND(var_samp(l_quantity), 4)                    AS var_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_stats(spark, sf_dir):
    """Bivariate/statistical aggregates (corr, covariance, stddev, var)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
    )


@register(
    "correlated_subquery",
    oracle="""
    SELECT l.l_partkey,
           ROUND(SUM(l.l_extendedprice), 2) AS sum_below_avg
    FROM lineitem l
    WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    """,
)
def correlated_subquery(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) —
    Catalyst decorrelates it into an aggregate + join, which is the plan
    you'd hand-write; expressing it as the subquery keeps user SQL
    portable."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_corr")
    return spark.sql(
        """
        SELECT l.l_partkey,
               ROUND(SUM(l.l_extendedprice), 2) AS sum_below_avg
        FROM li_corr l
        WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                              FROM li_corr l2
                              WHERE l2.l_partkey = l.l_partkey)
        GROUP BY l.l_partkey
        """
    )


@register(
    "complex_types",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
      FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           array_to_string(list_transform(qtys,
             x -> CAST(CAST(ROUND(x * 100) AS BIGINT) AS VARCHAR)), '|') AS qtys,
           ROUND(list_aggregate(qtys, 'sum'), 2)                  AS qty_sum,
           CAST(len(list_filter(qtys, x -> x > 30)) AS INT)       AS n_large,
           array_to_string(list_transform(qtys,
             x -> CAST(CAST(ROUND(x * 200) AS BIGINT) AS VARCHAR)), '|') AS doubled,
           ROUND(list_aggregate(qtys, 'max'), 2)                  AS qty_max
    FROM per_order
    """,
)
def complex_types(spark, sf_dir):
    """Complex-type surface: array aggregation + higher-order functions
    (transform / filter / aggregate) — all JVM-side, codegen-friendly.
    The registered output flattens the two array columns to '|'-joined
    cent-scaled integers (scalar-only driver contract; double→string
    formatting differs between engines, integer cents don't)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    per_order = l.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qtys")
    )
    cents = lambda scale: lambda x: F.round(x * scale).cast("long").cast("string")  # noqa: E731
    return per_order.select(
        "l_orderkey",
        F.array_join(F.transform("qtys", cents(100)), "|").alias("qtys"),
        F.round(
            F.aggregate("qtys", F.lit(0.0), lambda acc, x: acc + x), 2
        ).alias("qty_sum"),
        F.size(F.filter("qtys", lambda x: x > 30)).alias("n_large"),
        F.array_join(F.transform("qtys", cents(200)), "|").alias("doubled"),
        F.round(F.array_max("qtys"), 2).alias("qty_max"),
    )


@register(
    "global_sort",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def global_sort(spark, sf_dir):
    """Total ordering of a large output: range-partitioned sort (sampled
    split points -> Exchange rangepartitioning -> per-partition sort), the
    scalable full-sort plan. (The driver's value hash is order-insensitive;
    the ORDER BY here exists to exercise the range exchange.)"""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .orderBy(F.desc("total"), F.asc("o_orderkey"))
    )


@register(
    "map_ops",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           CAST(COUNT(DISTINCT event_type) AS INT)         AS n_types
    FROM events GROUP BY user_id
    """,
)
def map_ops(spark, sf_dir):
    """Map-type surface: per-user map<event_type, count> built with
    map_from_entries, probed with element_at / map_keys. The oracle states
    the same VALUES without maps (map column ordering is engine-specific,
    so the query's output is scalar probes, not the raw map)."""
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(
            # NULL can't be a map key (NULL_MAP_KEY): drop null-typed
            # entries but keep the user row (empty map, zero probes).
            F.filter(
                F.array_sort(F.collect_list(F.struct("event_type", "n"))),
                lambda e: e["event_type"].isNotNull(),
            )
        ).alias("m")
    )
    return maps.select(
        "user_id",
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("n_purchase"),
        F.size(F.map_keys("m")).alias("n_types"),
    )


@register(
    "exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    """,
)
def exists_subquery(spark, sf_dir):
    """EXISTS / NOT EXISTS subqueries — planned as semi + anti joins."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("cust_exists")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("ord_exists")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM cust_exists c
        WHERE EXISTS (SELECT 1 FROM ord_exists o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM ord_exists o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        """
    )


@register(
    "scalar_subquery",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_above_avg
    FROM lineitem
    WHERE l_extendedprice > (SELECT AVG(l_extendedprice) FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery — evaluated once, folded into the
    filter as a literal at runtime."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_scalar")
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n_above_avg
        FROM li_scalar
        WHERE l_extendedprice > (SELECT AVG(l_extendedprice) FROM li_scalar)
        GROUP BY l_returnflag
        """
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(o_totalprice, 2) AS total,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT)
             AS n_within_1k
    FROM orders WHERE o_custkey < 200
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based window bounds): peers within ±1000 of the
    current row's price — distinct from ROWS frames, which count rows."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total"),
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + conjunctive pushed filters + global
    aggregate — the minimal I/O-bound query (no shuffle beyond the final
    single-row combine)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 20 AND SUM(o_totalprice) > 1000000
    """,
)
def agg_having(spark, sf_dir):
    """GROUP BY + HAVING (post-aggregation predicate)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_spend"),
        )
        .filter((F.col("n_orders") >= 20) & (F.col("_spend") > 1000000))
        .select("o_custkey", "n_orders", F.round("_spend", 2).alias("spend"))
    )


@register(
    "profile_table",
    oracle="""
    SELECT 'o_custkey' AS column, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(o_custkey_min AS VARCHAR) AS min_str, CAST(o_custkey_max AS VARCHAR) AS max_str
    FROM orders, (SELECT MIN(o_custkey) o_custkey_min, MAX(o_custkey) o_custkey_max FROM orders)
    GROUP BY o_custkey_min, o_custkey_max
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(s_min AS VARCHAR), CAST(s_max AS VARCHAR)
    FROM orders, (SELECT MIN(o_orderstatus) s_min, MAX(o_orderstatus) s_max FROM orders)
    GROUP BY s_min, s_max
    """,
)
def profile_table(spark, sf_dir):
    """Single-pass table profiling (see operators/profile.py); the oracle
    states two representative columns' stats (approx_distinct is a sketch,
    so it is excluded from the compared columns)."""
    from ..operators.profile import profile_table as _profile

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    return _profile(o).select("column", "n_rows", "n_null", "min_str", "max_str")


# ---------------------------------------------------------------------------
# Join-type completions (§2.5 "not present" list: full outer, cross)
# ---------------------------------------------------------------------------

@register(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(c.k, s.k) AS nationkey, n_cust, n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust
          FROM customer WHERE c_acctbal < -800 GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS n_supp
          FROM supplier WHERE s_acctbal < 0 GROUP BY 1) s
    ON c.k = s.k
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER join of two pre-aggregated sides with asymmetric key sets
    (deep-debit customers vs in-debt suppliers by nation) so both null
    sides are exercised. Aggregating BEFORE the join keeps the outer join
    small — at 100 TB the shuffle carries one row per nation, not one per
    customer."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < -800)
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.ck == s.sk, "full_outer").select(
        F.coalesce("ck", "sk").alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, m AS mfgr_brand
    FROM region CROSS JOIN (SELECT DISTINCT p_brand AS m FROM part) b
    """,
)
def join_cross(spark, sf_dir):
    """Explicit cartesian product of two SMALL relations (regions x distinct
    brands) — the only safe cross-join shape at scale: both sides are
    dimension-sized, so Spark broadcasts one side (BroadcastNestedLoopJoin)
    and never shuffles the fact data."""
    r = _t(spark, sf_dir, "region").select("r_name")
    b = _t(spark, sf_dir, "part").select(F.col("p_brand").alias("mfgr_brand")).distinct()
    return r.crossJoin(F.broadcast(b))


# ---------------------------------------------------------------------------
# Distribution window functions (§2.6: ntile / percent_rank / cume_dist)
# ---------------------------------------------------------------------------

@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4)       OVER w AS balance_quartile,
           percent_rank() OVER w AS balance_pct_rank,
           cume_dist()    OVER w AS balance_cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution(spark, sf_dir):
    """Distribution window functions per market segment. The ORDER BY
    includes the unique c_custkey tiebreaker: ntile() assigns by row
    position, so a non-total ordering would be engine-nondeterministic.
    percent_rank/cume_dist are exact small-integer ratios -> bitwise equal
    across engines without rounding."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.percent_rank().over(w).alias("balance_pct_rank"),
        F.cume_dist().over(w).alias("balance_cume_dist"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: aggregate-filtered semi join + top-k (large orders)
# ---------------------------------------------------------------------------

@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum_qty, 2) AS sum_qty
    FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 (large-volume customers). The HAVING aggregate runs FIRST
    and shrinks lineitem to a handful of orderkeys, so both subsequent
    joins are broadcast-able; at 100 TB the only large shuffle is the
    map-side-combined groupBy on the lineitem scan."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 300)
    )
    return (
        # `big` is a filtered fact aggregate (orderkeys with qty > 300) —
        # selective but linear in orders, so hint-free; AQE converts its
        # join to broadcast when the survivor set is actually tiny.
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.round("_sq", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Positional aggregates and ordered string aggregation (§2.4 extensions)
# ---------------------------------------------------------------------------

@register(
    "agg_min_max_by",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderstatus, o_orderkey) AS last_status,
           arg_min(o_custkey, o_orderkey) AS first_custkey,
           arg_max(o_totalprice, o_orderkey) AS last_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_min_max_by(spark, sf_dir):
    """Positional (argmin/argmax) aggregates: the value of one column at
    another column's extremum — a single hash aggregate, no self-join or
    window needed. The ordering key o_orderkey is unique, so the winner is
    deterministic on both engines."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderstatus", "o_orderkey").alias("last_status"),
        F.min_by("o_custkey", "o_orderkey").alias("first_custkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("last_price"),
    )


@register(
    "agg_listagg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_listagg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG): broadcast dim-dim join, then
    collect_list sorted inside the aggregate so the concatenation order is
    total regardless of partitioning."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
        )
    )


# ---------------------------------------------------------------------------
# UDAF surface (§2.8): Arrow-batched GROUPED_AGG pandas UDF
# ---------------------------------------------------------------------------

@register(
    "udaf_harmonic_mean",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(COUNT(*) / SUM(1.0 / l_quantity), 2) AS hmean_qty,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def udaf_harmonic_mean(spark, sf_dir):
    """Custom aggregate as a GROUPED_AGG pandas UDF (harmonic mean — not a
    Spark builtin). Arrow ships each group's column as one vectorized
    numpy reduction; Spark still runs a partial-aggregate-free shuffle on
    the group keys only. This is the UDAF pattern the reference lacks
    entirely (SURVEY.md §2.8 'Not present: UDAF')."""
    from ..functions.udafs import group_size, harmonic_mean

    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(harmonic_mean("l_quantity"), 2).alias("hmean_qty"),
        group_size("l_quantity").alias("n_items"),
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE (c_mktsegment = 'BUILDING'  AND c_custkey % 10 < 2)
       OR (c_mktsegment = 'MACHINERY' AND c_custkey % 10 < 5)
    """,
)
def sample_stratified(spark, sf_dir):
    """Stratified deterministic sampling as a pure filter (pushes down, no
    shuffle, no RNG state): 20% of BUILDING, 50% of MACHINERY, other
    segments dropped. The oracle uses the SQL-portable modulo bucket;
    production uses the seedable content-hash bucket
    (operators/sample.py, xxhash64 — same plan shape, tested for
    determinism/disjointness in tests/test_sample.py)."""
    c = _t(spark, sf_dir, "customer")
    bucket = F.pmod(F.col("c_custkey"), F.lit(10))
    return c.filter(
        ((F.col("c_mktsegment") == "BUILDING") & (bucket < 2))
        | ((F.col("c_mktsegment") == "MACHINERY") & (bucket < 5))
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


@register(
    "window_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_navigation(spark, sf_dir):
    """Navigation window functions (first/last/nth). last_value and
    nth_value declare the full-partition frame explicitly — the default
    RANGE..CURRENT ROW frame silently turns last_value into current-row
    on BOTH engines, the classic window trap. Unique o_orderkey tiebreak
    keeps every value deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
           bool_or(l_quantity > 49)   AS any_maxed,
           bool_and(l_quantity >= 1)  AS all_positive,
           ROUND(SUM(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2) AS discounted_rev
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_conditional(spark, sf_dir):
    """Conditional aggregates: count_if / bool_or / bool_and / filtered
    sum — all map-side-combinable (unlike holistic aggs, these stay one
    row per group per partition through the shuffle)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_maxed"),
        F.bool_and(F.col("l_quantity") >= 1).alias("all_positive"),
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(0)), 2
        ).alias("discounted_rev"),
    )


@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')  AS due_date,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           strftime(last_day(o_orderdate), '%Y-%m-%d')            AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT)        AS dow  -- DuckDB Sun=0, Spark Sun=1
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def date_arithmetic(spark, sf_dir):
    """Date arithmetic surface: diffs, interval add, truncation, month
    boundaries, day-of-week — column expressions only, no UDF."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.filter(F.pmod("o_orderkey", F.lit(100)) == 0).select(
        "o_orderkey",
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_95"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("order_month"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek(d).alias("dow"),
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect): date-filtered fact scan, broadcast
    part join, single conditional-aggregate row. The month filter prunes
    at the scan; part is the broadcast side."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive multi-table predicates): the OR spans
    both sides of the join, so it can only be applied post-join — but the
    single-side implications (p_size <= 50 etc.) are still derivable; the
    join itself stays a broadcast equi-join on partkey, never a filtering
    nested loop."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#3") & s.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#5") & s.between(20, 50) & q.between(20, 50))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_inactive_customers",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_inactive_customers(spark, sf_dir):
    """TPC-H Q22 shape (global-counting): above-average-balance customers
    with NO RECENT (1998+) orders, per nation. The scalar AVG subquery broadcasts as a
    literal-sized join; the NOT EXISTS is a left-anti hash join — both
    stay shuffle-light at any scale."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "quality_report",
    oracle="""
    SELECT 'not_null(o_custkey)' AS rule,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'accepted_values(o_orderstatus)',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') OR o_orderstatus IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'range(o_totalprice)',
           CAST(SUM(CASE WHEN o_totalprice NOT BETWEEN 0 AND 1000000 OR o_totalprice IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1)
    UNION ALL
    SELECT 'referential(o_custkey)', CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
)
def quality_report(spark, sf_dir):
    """Declared-expectations gate (operators/quality.py): null /
    accepted-values / range rules in ONE aggregate pass, plus uniqueness
    (groupBy) and referential integrity (broadcast anti join) — the
    between-stages acceptance check of a production pipeline."""
    from ..operators import quality as Q

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return Q.quality_report(
        o,
        scalar_rules=[
            Q.not_null("o_custkey"),
            Q.accepted_values("o_orderstatus", ["F", "O", "P"]),
            Q.in_range("o_totalprice", 0, 1_000_000),
        ],
        unique=[["o_orderkey"]],
        referential=[("o_custkey", c, "c_custkey")],
    )


@register(
    "json_struct_agg",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
    """,
)
def json_struct_agg(spark, sf_dir):
    """Schema-declared JSON parsing (from_json → typed struct, vs
    json_extract's stringly get_json_object): parse ONCE per row into a
    struct, then aggregate its typed fields — the pattern for semi-
    structured columns at scale (one parse, many consumers; Catalyst
    prunes unused struct fields)."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type", F.from_json("props", "k int").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.round(F.avg("p.k"), 4).alias("avg_k"),
        F.max("p.k").alias("max_k"),
        F.count_if(F.col("p.k").isNull()).alias("n_missing"),
    )


@register(
    "sql_front_door",
    oracle="""
    SELECT n_name,
           COUNT(DISTINCT c_custkey) AS n_customers,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
    GROUP BY n_name
    HAVING COUNT(DISTINCT c_custkey) >= 10
    """,
)
def sql_front_door(spark, sf_dir):
    """The engine's SQL entry point: tables registered as temp views, the
    query stated as SQL text — Catalyst plans it identically to the
    DataFrame API (same scans, same broadcast joins), so the whole
    DataFrame surface is equally reachable from SQL."""
    for t in ("orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n_name,
               COUNT(DISTINCT c_custkey) AS n_customers,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
        GROUP BY n_name
        HAVING COUNT(DISTINCT c_custkey) >= 10
        """
    )


@register(
    "merge_upsert_customers",
    oracle="""
    WITH upd AS (
      SELECT c_custkey, c_mktsegment,
             floor(c_acctbal * 1.1 * 100 + 0.5) / 100 AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEW', floor(c_acctbal * 100 + 0.5) / 100
      FROM customer WHERE c_custkey % 97 = 0
    ),
    tgt AS (SELECT c_custkey, c_mktsegment, floor(c_acctbal * 100 + 0.5) / 100 AS c_acctbal
            FROM customer)
    SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment
                ELSE t.c_mktsegment END AS c_mktsegment,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
                ELSE t.c_acctbal END AS c_acctbal
    FROM tgt t FULL OUTER JOIN upd u ON t.c_custkey = u.c_custkey
    """,
)
def merge_upsert_customers(spark, sf_dir):
    """Set-oriented MERGE (operators/merge.merge_upsert): one update batch
    carrying both matched-key updates (+10% balance for custkey%7) and
    new-key inserts (shifted keys) applied to the customer table in a
    single full-outer pass — the deterministic replacement for the
    reference's per-document $set / insert-retry loop
    (reference lib/ingest.js:118,134-183)."""
    from ..operators.merge import merge_upsert

    r2 = lambda col: F.floor(col * 100 + F.lit(0.5)) / 100  # noqa: E731
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", r2(F.col("c_acctbal")).alias("c_acctbal")
    )
    upd = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            r2(F.col("c_acctbal") * 1.1).alias("c_acctbal"),
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("NEW").alias("c_mktsegment"),
                "c_acctbal",
            )
        )
    )
    return merge_upsert(c, upd, ["c_custkey"])


@register(
    "funnel_stages",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
          FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
          FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
           CAST(1 + CASE WHEN c.c_ts IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_stages(spark, sf_dir):
    """Ordered-funnel analysis (view → click → purchase): each stage's
    earliest qualifying event must FOLLOW the previous stage's — the
    event-sequence pattern behind conversion funnels. Three conditional
    min-aggregates chained by hint-free equi-joins: per-stage user sets
    shrink monotonically but are still one row PER USER (linear in the
    log), so AQE picks broadcast only when a stage is actually small; no
    window over the full log, no self-join explosion."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    stage = (
        F.lit(1)
        + F.when(F.col("c_ts").isNotNull(), 1).otherwise(0)
        + F.when(F.col("p_ts").isNotNull(), 1).otherwise(0)
    ).cast("int")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "v_ts", "c_ts", "p_ts", stage.alias("stage"))
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w
      FROM events GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
    SELECT strftime(f.cohort_w, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_w, a.w) / 7 AS INT) AS week_offset,
           COUNT(*) AS n_users
    FROM firsts f JOIN act a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-seen week, counted in
    each later activity week. Week offsets are exact (both sides
    Monday-truncated, so the day diff is a multiple of 7). Two hash
    aggregates + one join shuffled on user_id — the cohort matrix
    itself is tiny (weeks × weeks)."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    act = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    return (
        firsts.join(act, "user_id")
        .groupBy(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.col("w"), F.col("cohort_w")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "event_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             array_to_string(list(event_type ORDER BY ts, event_id), ' ')
               AS type_seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(regexp_matches(type_seq, 'view( \\w+)*? click( \\w+)*? purchase')
                AS BOOLEAN) AS converted,
           CAST(length(type_seq) - length(replace(type_seq, ' ', ''))
                + 1 AS INT) AS n_events
    FROM seq
    """,
)
def event_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-style sequence pattern over per-user event
    histories: order-collect each user's event types (deterministic
    (ts, event_id) order), then regex-match the funnel pattern
    'view … click … purchase' against the flattened sequence. One hash
    agg keyed by user; per-user sequences stay small (state is bounded
    by a user's history, the same assumption any session store makes)."""
    e = _t(spark, sf_dir, "events")
    seq = (
        e.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                " ",
            ).alias("type_seq")
        )
    )
    return seq.select(
        "user_id",
        F.col("type_seq").rlike(r"view( \w+)*? click( \w+)*? purchase").alias(
            "converted"
        ),
        (
            F.length("type_seq")
            - F.length(F.replace(F.col("type_seq"), F.lit(" "), F.lit("")))
            + 1
        ).cast("int").alias("n_events"),
    )


@register(
    "histogram_totalprice",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000) * 50000 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n_orders,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def histogram_totalprice(spark, sf_dir):
    """Fixed-width numeric histogram: bucket id computed in the scan
    projection, then one hash agg — the one-pass distributed histogram
    (no sort, no per-bucket pass)."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000)
    return (
        o.groupBy(
            bucket.alias("bucket"),
            (bucket * 50000).cast("double").alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


@register(
    "scd2_user_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             AS is_current
    FROM changes
    """,
)
def scd2_user_history(spark, sf_dir):
    """SCD Type-2 dimension history built from the event log
    (operators/merge.scd2_collapse): consecutive equal states collapse,
    each version carries [valid_from, valid_to) and the open row is
    flagged current — the warehouse pattern for 'what was this entity's
    state at time T' joins."""
    from ..operators.merge import scd2_collapse

    e = _t(spark, sf_dir, "events")
    return scd2_collapse(
        e.select("user_id", "event_type", "ts", "event_id"),
        key_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )


@register(
    "join_asof_cogroup",
    oracle="""
    WITH a AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         b AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT a.event_id, a.user_id, a.ts,
           b.ts    AS matched_ts,
           b.value AS matched_value
    FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND b.ts <= a.ts
    """,
)
def join_asof_cogroup(spark, sf_dir):
    """Same as-of semantics as join_asof, through the OTHER engine path:
    cogroup().applyInPandas with per-key pd.merge_asof (Arrow-batched).
    Both implementations hit the same DuckDB ASOF JOIN oracle — a
    three-way agreement (JVM window form, pandas cogroup form, DuckDB)."""
    from ..operators.joins import asof_join_cogroup

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join_cogroup(
        purchases, clicks, keys=["user_id"], right_cols=["value"]
    )


@register(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def variant_props_stats(spark, sf_dir):
    """Semi-structured props via the VARIANT type (Spark 4): parse_json
    once into the binary variant encoding, then typed variant_get
    extraction feeding a plain hash agg. Unlike get_json_object (string
    re-parse per access), a variant column parses once and supports
    multiple typed reads — the right model for heavily-accessed JSON at
    scale."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "date_spine_monthly_revenue",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-08-01'
    ),
    rev AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             ROUND(SUM(o_totalprice), 2) AS revenue,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT strftime(months.m, '%Y-%m') AS month,
           COALESCE(rev.revenue, 0.0)  AS revenue,
           COALESCE(rev.n_orders, 0)   AS n_orders
    FROM months LEFT JOIN rev ON months.m = rev.m
    """,
)
def date_spine_monthly_revenue(spark, sf_dir):
    """Gap-free monthly revenue series via a RECURSIVE CTE date spine
    (Spark 4 WITH RECURSIVE): generate every month in the data's range,
    left-join the revenue aggregate, zero-fill empty months — the
    warehouse pattern for time-series charts that must not silently skip
    gaps. The spine is ~80 rows; the heavy side is the ordinary
    distributed aggregate."""
    nonce = next(_SEQ_VIEWS)
    view = f"orders_spine_{nonce}"
    _t(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01'
        ),
        rev AS (
          SELECT date_trunc('month', o_orderdate) AS m,
                 ROUND(SUM(o_totalprice), 2) AS revenue,
                 COUNT(*) AS n_orders
          FROM {view} GROUP BY 1
        )
        SELECT date_format(months.m, 'yyyy-MM') AS month,
               COALESCE(rev.revenue, 0.0)  AS revenue,
               COALESCE(rev.n_orders, 0)   AS n_orders
        FROM months LEFT JOIN rev ON months.m = rev.m
        """
    )


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (SELECT c_custkey, nullif(c_nationkey % 5, 0) AS bucket FROM customer),
    r AS (SELECT nullif(s_nationkey % 5, 0) AS bucket, COUNT(*) AS n_suppliers
          FROM supplier GROUP BY 1)
    SELECT l.c_custkey, l.bucket, r.n_suppliers
    FROM l JOIN r ON l.bucket IS NOT DISTINCT FROM r.bucket
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL is a
    joinable key value, so rows with an unknown bucket still match the
    right side's unknown-bucket row instead of silently dropping. The
    EqualNullSafe condition is still a hash-join key — with the 5-row
    aggregate broadcast, no shuffle touches the big side (contrast an
    OR-with-IS-NULL rewrite, which degrades to nested loop)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.expr("nullif(c_nationkey % 5, 0)").alias("bucket")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .select(F.expr("nullif(s_nationkey % 5, 0)").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(F.broadcast(s), c["bucket"].eqNullSafe(s["bucket"]))
        .select("c_custkey", c["bucket"].alias("bucket"), "n_suppliers")
    )


@register(
    "timeseries_gapfill_ffill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
             ROUND(SUM(value), 2) AS day_value
      FROM events GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM spans
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n_events, 0) AS n_events,
           last_value(d.day_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    """,
)
def timeseries_gapfill_ffill(spark, sf_dir):
    """Time-series densification: per-user daily aggregate → explode a
    `sequence()` date spine over each user's active span → left join →
    zero-fill counts and forward-fill the last observed value
    (`last(..., ignorenulls)` over an unbounded-preceding frame). The
    spine explode is O(users * days) narrow work with no extra shuffle
    beyond the daily aggregate's; the fill is one window pass."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("day_value"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@register(
    "scalar_try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 20 THEN NULL
                ELSE l_extendedprice / (l_quantity - 20) END AS safe_ratio,
           strftime(TRY_CAST('2024-01-' || lpad(CAST(l_linenumber * 9 AS VARCHAR), 2, '0')
                             AS DATE), '%Y-%m-%d') AS safe_date,
           (['a', 'b', 'c'])[l_linenumber] AS safe_elem
    FROM lineitem
    """,
)
def scalar_try_funcs(spark, sf_dir):
    """Error-safe scalar surface (`try_*` family): malformed input becomes
    NULL instead of failing the job — the posture a 100 TB pipeline needs,
    where one corrupt row must not kill a stage. try_divide nulls the
    divide-by-zero rows, try_cast nulls unparseable dates, try_element_at
    nulls out-of-bounds lookups; all stay JVM-side Column expressions
    (ANSI mode stays ON for everything else)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("try_divide(l_extendedprice, l_quantity - 20)").alias("safe_ratio"),
        F.date_format(
            F.expr(
                "try_cast(concat('2024-01-', lpad(cast(l_linenumber * 9 as string), 2, '0')) as date)"
            ),
            "yyyy-MM-dd",
        ).alias("safe_date"),
        F.expr("try_element_at(array('a', 'b', 'c'), l_linenumber)").alias("safe_elem"),
    )


@register(
    "join_lateral_topk",
    oracle="""
    SELECT r.r_name, l.n_name, l.n_custs
    FROM region r JOIN LATERAL (
      SELECT n.n_name, COUNT(c.c_custkey) AS n_custs
      FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name
      ORDER BY n_custs DESC, n_name
      LIMIT 2
    ) l ON true
    """,
)
def join_lateral_topk(spark, sf_dir):
    """Correlated LATERAL join (per-outer-row subquery with its own
    ORDER BY + LIMIT): each region's top-2 nations by customer count.
    Catalyst decorrelates the lateral into a join + per-group limit
    instead of re-executing the subquery per row — the declarative
    free-lunch the reference's per-record lookup loop
    (lib/ingest.js:108-113) never gets."""
    nonce = next(_SEQ_VIEWS)
    views = {}
    for t in ("region", "nation", "customer"):
        views[t] = f"{t}_lat_{nonce}"
        _t(spark, sf_dir, t).createOrReplaceTempView(views[t])
    return spark.sql(
        f"""
        SELECT r.r_name, l.n_name, l.n_custs
        FROM {views['region']} r JOIN LATERAL (
          SELECT n.n_name, COUNT(c.c_custkey) AS n_custs
          FROM {views['nation']} n
          JOIN {views['customer']} c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_custs DESC, n_name
          LIMIT 2
        ) l
        """
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
    SELECT c_custkey + 1000000 AS c_custkey, 'insert' AS change_type
    FROM customer WHERE c_custkey % 11 = 0
    UNION ALL
    SELECT c_custkey, 'delete' FROM customer WHERE c_custkey % 13 = 0
    UNION ALL
    SELECT c_custkey, 'update' FROM customer
    WHERE c_custkey % 7 = 0 AND c_custkey % 13 <> 0
    """,
)
def cdc_snapshot_diff(spark, sf_dir):
    """CDC changeset generation (operators/merge.snapshot_diff): diff two
    snapshots of the customer table — a deterministic synthetic edit
    (inserts: %11 keys re-keyed +1e6; deletes: %13 keys; updates: +100
    acctbal on %7 keys) — into insert/update/delete rows. The oracle
    states the expected changeset directly from the edit rule, so the
    full-outer hash-compare machinery is checked end-to-end."""
    from ..operators.merge import snapshot_diff

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    new = (
        c.filter(k % 13 != 0)
        .withColumn(
            "c_acctbal",
            F.when(k % 7 == 0, F.col("c_acctbal") + 100).otherwise(F.col("c_acctbal")),
        )
        .unionByName(c.filter(k % 11 == 0).withColumn("c_custkey", k + 1000000))
    )
    return snapshot_diff(c, new, ["c_custkey"])


@register(
    "events_ohlc",
    oracle="""
    WITH e AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type, ts, event_id, value
      FROM events
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY bucket, event_type
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY bucket, event_type) AS cnt
      FROM e
    )
    SELECT bucket, event_type,
           MAX(CASE WHEN rn = 1   THEN value END) AS open,
           MAX(value)                             AS high,
           MIN(value)                             AS low,
           MAX(CASE WHEN rn = cnt THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT)               AS n_events,
           ROUND(SUM(value), 2)                   AS sum_value
    FROM r GROUP BY bucket, event_type
    """,
)
def events_ohlc(spark, sf_dir):
    """OHLC candle rollup (the hypertable continuous-aggregate shape):
    open/close are ``min_by``/``max_by`` over the (ts, event_id) ordering
    struct — the whole candle is ONE map-side-combinable hash aggregate,
    no window, no sort. The oracle says the same thing with row_number
    windows (DuckDB 1.0 lacks struct-ordered arg_min); high/low/open/close
    propagate raw doubles untouched, so no rounding is needed for parity."""
    e = _t(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts").alias("o1"), F.col("event_id").alias("o2"))
    return (
        e.select(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
            "ts",
            "event_id",
            "value",
        )
        .groupBy("bucket", "event_type")
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 6)      AS avg_x,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 2)      AS avg_y,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regression(spark, sf_dir):
    """Closed-form per-group OLS via the SQL-standard REGR_* aggregate
    family (slope/intercept/R²/means/count of extendedprice ~ quantity).
    Single-pass, map-side-combinable moment sums — the distributed way to
    fit millions of small per-group models without any iterative solver."""
    l = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return l.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 2).alias("avg_y"),
        F.regr_count(y, x).cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Event-sequence analytics: Markov transitions, interval concurrency
# ---------------------------------------------------------------------------

@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events
    ),
    t AS (
      SELECT from_type, to_type, COUNT(*) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type
    ),
    tot AS (SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS tn
            FROM t GROUP BY from_type)
    SELECT t.from_type, t.to_type, t.n_transitions,
           ROUND(t.n_transitions / CAST(tn AS DOUBLE), 6) AS p_transition
    FROM t JOIN tot USING (from_type)
    """,
)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current event type). One window (lead) over the
    user-time order, one hash aggregate on the (from, to) pair, and the
    per-from totals broadcast back for normalization — the standard
    user-journey / clickstream model, all map-side after the one
    user-keyed shuffle."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = t.groupBy("from_type").agg(F.sum("n_transitions").alias("tn"))
    return (
        t.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("tn").cast("double"), 6).alias(
                "p_transition"
            ),
        )
    )


@register(
    "sessions_max_concurrency",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ),
    sess AS (
      SELECT user_id, session_id, MIN(ts) AS s, MAX(ts) AS e
      FROM numbered GROUP BY user_id, session_id
    ),
    pts AS (
      SELECT s AS t, 1 AS d FROM sess
      UNION ALL
      SELECT e, -1 FROM sess
    ),
    run AS (
      SELECT t, SUM(d) OVER (ORDER BY t, d DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
      FROM pts
    )
    SELECT CAST(MAX(r) AS BIGINT) AS max_concurrent,
           MIN(t) FILTER (WHERE r = (SELECT MAX(r) FROM run)) AS peak_ts
    FROM run
    """,
)
def sessions_max_concurrency(spark, sf_dir):
    """Peak session concurrency via the sweep-line idiom: sessionize (same
    30-min gaps-and-islands as ``sessionize``), reduce each session to its
    [start, end] interval, emit +1/-1 boundary points, and take the max of
    the running sum over the global time order (+1 sorts before -1 at the
    same instant, so a session starting exactly when another ends counts
    as overlapping — both engines use the identical tie rule).

    The sweep itself is distributed: boundary points bucket by hour, each
    bucket computes its running sum in parallel, and a per-bucket delta
    total (one row per hour of data — bounded by the time span, not by
    event volume) supplies the open-count offset each bucket inherits
    from its past. No task ever sorts more than one bucket's boundary
    points; the only global-order window runs over the hour table."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    numbered = e.select(
        "user_id",
        "ts",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1000 * 1000), 1)
        .otherwise(0)
        .alias("new_session"),
        F.col("event_id"),
    ).select(
        "user_id", "ts", F.sum("new_session").over(wf).alias("session_id")
    )
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    # explode, not unionAll: a union of two selects over `sess` evaluates
    # the whole sessionize DAG twice (two full event scans); one exploded
    # struct array emits both boundary points from a single evaluation.
    pts = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("p")
    ).select("p.t", "p.d")
    # The sweep reads pts twice (running-sum leg + bucket-offset leg):
    # materialize once so the event scan and sessionize window run once.
    pts = pts.localCheckpoint(eager=True)
    # Distributed prefix sum: hour buckets are monotone in t, so the global
    # running sum decomposes into a per-bucket running sum (parallel across
    # buckets; same-t ties share a bucket, preserving the tie rule) plus the
    # summed deltas of all earlier buckets. The offset table has one row per
    # hour of data — bounded by the time span, never by event volume — so
    # its global-order window and broadcast join stay tiny at any scale.
    bkt = pts.withColumn("bk", F.date_trunc("hour", F.col("t")))
    wrun = Window.partitionBy("bk").orderBy(F.asc("t"), F.desc("d")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    woff = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    boff = (
        bkt.groupBy("bk")
        .agg(F.sum("d").alias("bd"))
        .select("bk", F.coalesce(F.sum("bd").over(woff), F.lit(0)).alias("off"))
    )
    run = (
        bkt.withColumn("rin", F.sum("d").over(wrun))
        .join(F.broadcast(boff), "bk")
        .select("t", (F.col("rin") + F.col("off")).alias("r"))
    )
    mx = run.agg(F.max("r").alias("mx"))
    return (
        run.crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("mx"))
        .agg(
            F.max("r").cast("long").alias("max_concurrent"),
            F.min("t").alias("peak_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series smoothing & decomposition
# ---------------------------------------------------------------------------

_EWMA_A = 0.3
_EWMA_K = 8
# (1-a) * a^j weights and 1 - a^n normalizers as exact double literals —
# Python repr round-trips bit-exactly, so both engines parse the SAME
# doubles and every product/sum below is IEEE-identical cross-engine.
_EWMA_W = [repr((1 - _EWMA_A) * _EWMA_A**j) for j in range(_EWMA_K)]
_EWMA_DENOM = [repr(1 - _EWMA_A**n) for n in range(1, _EWMA_K + 1)]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"(COALESCE(lag(value, {j}) OVER w, CAST(0 AS DOUBLE)) * {w})"
        for j, w in enumerate(_EWMA_W)
    )
    denom_case = " ".join(
        f"WHEN {n} THEN {d}" for n, d in enumerate(_EWMA_DENOM, start=1)
    )
    return f"""
    SELECT event_id, user_id, value,
           floor(1e6 * (({num}) / (CASE least(
             ROW_NUMBER() OVER w, {_EWMA_K}) {denom_case} END)) + 0.5) / 1e6
             AS ewma
    FROM events
    WHERE value IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register("events_ewma", oracle=_ewma_oracle())
def events_ewma(spark, sf_dir):
    """Per-user exponentially-weighted moving average (alpha=0.3) over the
    event stream — the standard smoother behind rate limiting, anomaly
    baselines, and metric dashboards. The textbook recurrence
    s_t = (1-a)x_t + a·s_{t-1} is unbounded-memory; the distributed form
    truncates to the last K=8 lags (the dropped tail carries a^8 ≈ 0.007%
    of the weight) and renormalizes by 1 - a^n over the n lags that exist
    — so early rows are unbiased, not damped toward zero.

    Scale shape: ONE hash exchange (the per-user window partition); the
    8 lag() frames share it; weights and normalizers are exact double
    literals folded into codegen. Every product and sum is evaluated in
    the same order on both engines over bit-identical constants, so the
    only rounding is the final display floor at 1e-6."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    for j, wj in enumerate(_EWMA_W):
        term = F.coalesce(F.lag("value", j).over(w), F.lit(0.0)) * F.lit(float(wj))
        num = term if num is None else num + term
    navail = F.least(F.row_number().over(w), F.lit(_EWMA_K))
    denom = F.element_at(
        F.array(*[F.lit(float(d)) for d in _EWMA_DENOM]), navail
    )
    # ts is an ORDER key: a NULL ts would sort FIRST in Spark but LAST
    # in DuckDB and silently desynchronize every lag for that user, so
    # it is filtered like the other streaming queries do defensively.
    e = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    return e.select(
        "event_id",
        "user_id",
        "value",
        (F.floor(F.lit(1e6) * (num / denom) + F.lit(0.5)) / F.lit(1e6)).alias("ewma"),
    )


@register(
    "timeseries_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    tr AS (
      SELECT *,
             datediff('day', DATE '2024-01-01', day) % 7 AS dow,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN CAST(SUM(cents) OVER w7 AS BIGINT) END AS trend7
      FROM daily
      WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    dt AS (
      SELECT *, 7 * cents - trend7 AS detr7 FROM tr
    ),
    sea AS (
      SELECT *,
             CAST(CAST(SUM(detr7) OVER ws AS BIGINT) AS DOUBLE)
               / COUNT(detr7) OVER ws AS seasonal7
      FROM dt
      WINDOW ws AS (PARTITION BY event_type, dow)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, CAST(dow AS BIGINT) AS dow,
           cents / 100.0 AS total,
           CAST(trend7 AS DOUBLE) / 700.0 AS trend,
           seasonal7 / 700.0 AS seasonal,
           (CAST(detr7 AS DOUBLE) - seasonal7) / 700.0 AS residual
    FROM sea
    """,
)
def timeseries_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition of the per-type daily
    series: trend = centered 7-day moving average (NULL at the edges
    where the window is short), weekly seasonal index = mean detrended
    value per day-of-week, residual = what neither explains — the
    corpus-health view that separates 'weekends are slow' from 'Tuesday
    was anomalous'.

    Exact-parity engineering: daily totals are summed as integer CENTS,
    the MA is kept as the 7-day integer SUM (trend×7), and detrending
    happens in that ×7 integer space — so every aggregation is exact
    integer arithmetic regardless of partition order, and the only
    doubles are final divisions of identical integers. Day-of-week is
    datediff-mod-7 (engine-neutral, no locale). Scale shape: one
    map-side-combinable daily aggregate, then two windows over the
    BOUNDED daily series (365 rows/type/year no matter the corpus
    size); rows-based MA assumes the daily series is dense, which a
    corpus-scale event stream always is."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"))
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "cents",
        (F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) % 7)
        .cast("long")
        .alias("dow"),
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("cents").over(w7)).alias(
            "trend7"
        ),
    )
    dt = tr.withColumn("detr7", F.lit(7) * F.col("cents") - F.col("trend7"))
    ws = Window.partitionBy("event_type", "dow")
    sea = dt.withColumn(
        "seasonal7",
        F.sum("detr7").over(ws).cast("double") / F.count("detr7").over(ws),
    )
    return sea.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dow",
        (F.col("cents") / F.lit(100.0)).alias("total"),
        (F.col("trend7").cast("double") / F.lit(700.0)).alias("trend"),
        (F.col("seasonal7") / F.lit(700.0)).alias("seasonal"),
        (
            (F.col("detr7").cast("double") - F.col("seasonal7")) / F.lit(700.0)
        ).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Marketing attribution + incremental view maintenance
# ---------------------------------------------------------------------------


@register(
    "attribution_credit",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
        AND user_id IS NOT NULL AND value IS NOT NULL
    ),
    t AS (
      SELECT user_id, ts, event_id, event_type
      FROM events WHERE event_type IN ('click', 'view', 'signup')
        AND user_id IS NOT NULL
    ),
    joined AS (
      SELECT p.pid, p.cents, t.event_type, t.ts, t.event_id
      FROM p JOIN t ON t.user_id = p.user_id
       AND t.ts <= p.pts AND t.ts > p.pts - INTERVAL 24 HOURS
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts, event_id) AS rn,
             COUNT(*)     OVER (PARTITION BY pid) AS n
      FROM joined
    ),
    credited AS (
      SELECT event_type AS channel,
             CAST(floor(cents * (CASE
               WHEN n = 1 THEN 1.0
               WHEN n = 2 THEN 0.5
               WHEN rn = 1 OR rn = n THEN 0.4
               ELSE 0.2 / (n - 2) END) * 10000 + 0.5) AS BIGINT) AS micro
      FROM ranked
      UNION ALL
      SELECT 'direct', cents * 10000
      FROM p WHERE pid NOT IN (SELECT pid FROM joined)
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(micro) AS BIGINT) AS credit_micro_cents
    FROM credited GROUP BY channel
    """,
)
def attribution_credit(spark, sf_dir):
    """Position-based (U-shaped) multi-touch attribution: every purchase's
    revenue is credited to the user's click/view/signup touchpoints in
    the 24h lookback — 40% to the first touch, 40% to the last, 20%
    split over the middles (degenerating to 100%/50-50 for 1–2 touches),
    and 'direct' when no touch precedes. The marketing-analytics
    composite of a range join + per-conversion ranking.

    Exact-parity engineering: per-row credit is floored to integer
    micro-cents BEFORE summation, so group totals are exact integer
    sums whatever the partition order. Scale shape: the touch⋈purchase
    range join is an equi-join on user_id with a bounded time predicate
    (per-user event lists, never a cartesian); rankings window over one
    PURCHASE's touches (bounded per conversion, no corpus-wide sort)."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    t = e.filter(
        F.col("event_type").isin("click", "view", "signup")
        & F.col("user_id").isNotNull()
    ).select("user_id", "ts", "event_id", "event_type")
    joined = p.join(
        t,
        (t["user_id"] == p["puser"])
        & (t["ts"] <= p["pts"])
        & (t["ts"] > p["pts"] - F.expr("INTERVAL 24 HOURS")),
    ).select("pid", "cents", "event_type", "ts", "event_id")
    wrn = Window.partitionBy("pid").orderBy("ts", "event_id")
    wn = Window.partitionBy("pid")
    ranked = joined.select(
        "pid",
        "cents",
        "event_type",
        F.row_number().over(wrn).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    frac = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    credited = ranked.select(
        F.col("event_type").alias("channel"),
        F.floor(F.col("cents") * frac * 10000 + F.lit(0.5)).cast("long").alias("micro"),
    ).unionByName(
        p.join(joined.select("pid").distinct(), "pid", "left_anti").select(
            F.lit("direct").alias("channel"),
            (F.col("cents") * 10000).alias("micro"),
        )
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum("micro").alias("credit_micro_cents"),
    )


@register(
    "ivm_incremental_agg",
    oracle="""
    WITH edited AS (
      SELECT o_orderpriority,
             CAST(floor((o_totalprice + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END)
                        * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderpriority, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM edited GROUP BY o_orderpriority
    """,
)
def ivm_incremental_agg(spark, sf_dir):
    """Incremental view maintenance: a grouped aggregate is maintained
    under a CDC changeset ALGEBRAICALLY — base aggregate plus signed
    per-group deltas (insert +1/+cents, delete -1/-cents, update as
    delete+insert) — never by rescanning the base table. The edit rule
    is the same deterministic synthetic changeset as
    ``cdc_snapshot_diff`` (inserts: %11 keys; deletes: %13; updates:
    +100 totalprice on %7), applied to orders; the oracle recomputes the
    aggregate directly from the edited table, proving the delta algebra
    equals full recomputation.

    Scale shape: at 100 TB this is the difference between touching the
    changeset (hours of data) and the base (the whole lake): the
    maintained result is base_agg ∪ deltas → one re-aggregate over
    |groups| + |changeset| rows. All-integer (counts + cents) so parity
    is exact."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey").isNotNull())
    k = F.col("o_orderkey")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    base = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).alias("c")
    )
    # Signed deltas from the edit rule — each row carries (dn, dc).
    deletes = o.filter(k % 13 == 0).select(
        "o_orderpriority", F.lit(-1).cast("long").alias("n"), (-cents).alias("c")
    )
    upd_old = o.filter((k % 7 == 0) & (k % 13 != 0)).select(
        "o_orderpriority", F.lit(-1).cast("long").alias("n"), (-cents).alias("c")
    )
    upd_new = o.filter((k % 7 == 0) & (k % 13 != 0)).select(
        "o_orderpriority",
        F.lit(1).cast("long").alias("n"),
        F.floor((F.col("o_totalprice") + 100) * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    inserts = o.filter(k % 11 == 0).select(
        "o_orderpriority", F.lit(1).cast("long").alias("n"), cents.alias("c")
    )
    merged = base.unionByName(deletes).unionByName(upd_old).unionByName(
        upd_new
    ).unionByName(inserts)
    return (
        merged.groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n_orders"), F.sum("c").alias("total_cents"))
        .filter(F.col("n_orders") > 0)
    )


@register(
    "ivm_incremental_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NOT NULL AND l.l_orderkey IS NOT NULL
      AND l.l_extendedprice IS NOT NULL
    GROUP BY o.o_orderpriority
    """,
)
def ivm_incremental_join(spark, sf_dir):
    """Incremental view maintenance for a JOIN view (the delta rule —
    Blakeley/Larson/Tompa 1986, Griffin & Libkin 1995): a materialized
    orders⋈lineitem revenue view is maintained under late-arriving rows
    on BOTH sides via the three delta legs
    Δ(R⋈S) = ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS — never by re-joining the base
    tables. Late arrivals are simulated deterministically (ΔR = orders
    with key %10 = 0, ΔS = lineitems with key %6 = 0; the rest is the
    already-materialized base view). The oracle computes the view over
    the FULL tables directly, proving the three-legged delta algebra
    reconstructs exactly the full join.

    Scale shape: at 100 TB the three delta legs each join a
    changeset-sized side against one base (AQE broadcasts the small
    side; a real deployment probes the bucketed base), while the base⋈
    base leg is the view you already have — the whole maintenance cost
    rides |Δ|, not the lake. The final merge re-aggregates
    |groups| + |Δ-legs| rows; all-integer cents keep parity exact."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey").isNotNull()).select(
        "o_orderkey", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isNotNull() & F.col("l_extendedprice").isNotNull()
    ).select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    ob, od = o.filter(F.col("o_orderkey") % 10 != 0), o.filter(
        F.col("o_orderkey") % 10 == 0
    )
    lb, ld = li.filter(F.col("l_orderkey") % 6 != 0), li.filter(
        F.col("l_orderkey") % 6 == 0
    )

    def leg(r, s):
        return r.join(s, r["o_orderkey"] == s["l_orderkey"]).select(
            "o_orderpriority", "cents"
        )

    def agg(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
        )

    base_view = agg(leg(ob, lb))  # the view as materialized before the deltas
    deltas = agg(
        leg(od, lb).unionByName(leg(ob, ld)).unionByName(leg(od, ld))
    )
    return (
        base_view.unionByName(deltas)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n_items"), F.sum("c").alias("revenue_cents"))
        .filter(F.col("n_items") > 0)
    )


@register(
    "events_holt_winters",
    oracle="""
    WITH RECURSIVE
    daily AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    series AS MATERIALIZED (
      SELECT event_type, list(y ORDER BY day) AS ys,
             CAST(COUNT(*) AS BIGINT) AS t_len
      FROM daily GROUP BY event_type
    ),
    init AS MATERIALIZED (
      SELECT event_type, ys, t_len,
             list_sum(ys[1:7]) / 7.0 AS l,
             (list_sum(ys[8:14]) / 7.0 - list_sum(ys[1:7]) / 7.0) / 7.0 AS b,
             list_transform(range(7), p -> ys[p+1] - list_sum(ys[1:7]) / 7.0) AS s
      FROM series
    ),
    hw AS (
      SELECT event_type, ys, t_len, CAST(0 AS BIGINT) AS t, l, b, s FROM init
      UNION ALL
      SELECT event_type, ys, t_len, t + 1,
             0.3 * (ys[t+1] - s[(t % 7) + 1]) + 0.7 * (l + b),
             0.1 * ((0.3 * (ys[t+1] - s[(t % 7) + 1]) + 0.7 * (l + b)) - l)
               + 0.9 * b,
             list_transform(range(7), p -> CASE WHEN p = (t % 7)
               THEN 0.2 * (ys[t+1] - l - b) + 0.8 * s[p+1]
               ELSE s[p+1] END)
      FROM hw WHERE t < t_len
    )
    SELECT event_type,
           floor(l * 1e6 + 0.5) / 1e6 AS level,
           floor(b * 1e6 + 0.5) / 1e6 AS trend,
           floor((l + 1 * b + s[(t_len % 7) + 1]) * 1e6 + 0.5) / 1e6       AS forecast_1,
           floor((l + 2 * b + s[((t_len + 1) % 7) + 1]) * 1e6 + 0.5) / 1e6 AS forecast_2,
           floor((l + 3 * b + s[((t_len + 2) % 7) + 1]) * 1e6 + 0.5) / 1e6 AS forecast_3
    FROM hw WHERE t = t_len
    """,
)
def events_holt_winters(spark, sf_dir):
    """Additive Holt-Winters (triple exponential smoothing, weekly
    season m=7, alpha=.3 beta=.1 gamma=.2; Winters 1960 / Hyndman OTexts
    init: level = first-week mean, trend = (week2 mean - week1 mean)/7,
    seasonals = first week's deviations) over the per-type daily count
    series, emitting the final state and a 3-day-ahead forecast.

    The recurrence is inherently sequential per series, so the Spark side
    runs it as plain-Python float ops inside ONE applyInPandas group per
    event_type (a bounded series: 365 rows/type/year no matter the corpus
    size — the heavy lifting is the distributed daily aggregate before
    it), while the oracle unrolls the SAME recurrence as a recursive CTE
    whose working row carries (level, trend, seasonal list). Both engines
    start from exact integer day-counts and evaluate the identical
    IEEE-754 expression tree step by step, so the trajectories agree to
    the last bit; outputs are rounded to 6 dp anyway. Assumes a dense
    daily series (same as timeseries_seasonal_decompose; a corpus-scale
    event stream always is)."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = (
        e.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    return holt_winters_daily(daily)


def holt_winters_daily(daily: DataFrame) -> DataFrame:
    """Fit additive Holt-Winters per event_type over a dense
    (event_type, day, y) daily series — see events_holt_winters."""

    def fit(pdf):
        import pandas as pd

        pdf = pdf.sort_values("day")
        ys = [float(v) for v in pdf["y"]]
        t_len = len(ys)
        w1 = sum(ys[0:7]) / 7.0
        l, b = w1, (sum(ys[7:14]) / 7.0 - w1) / 7.0
        s = [ys[p] - w1 for p in range(7)]
        for t in range(t_len):
            y, sp = ys[t], s[t % 7]
            l_new = 0.3 * (y - sp) + 0.7 * (l + b)
            b_new = 0.1 * (l_new - l) + 0.9 * b
            s[t % 7] = 0.2 * (y - l - b) + 0.8 * sp
            l, b = l_new, b_new
        import math

        def r6(x):
            # floor(x*1e6+0.5)/1e6 on BOTH engines: identical float ops,
            # no half-even vs half-up divergence (see cusum's parity note)
            return math.floor(x * 1e6 + 0.5) / 1e6

        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "level": [r6(l)],
                "trend": [r6(b)],
                "forecast_1": [r6(l + 1 * b + s[t_len % 7])],
                "forecast_2": [r6(l + 2 * b + s[(t_len + 1) % 7])],
                "forecast_3": [r6(l + 3 * b + s[(t_len + 2) % 7])],
            }
        )

    return daily.groupBy("event_type").applyInPandas(
        fit,
        "event_type string, level double, trend double, "
        "forecast_1 double, forecast_2 double, forecast_3 double",
    )


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    ref AS (
      SELECT *,
             CAST(CAST(SUM(cents) OVER wt AS BIGINT) AS DOUBLE)
               / COUNT(*) OVER wt AS mu
      FROM daily WINDOW wt AS (PARTITION BY event_type)
    ),
    dev AS (
      SELECT *, cents - mu - 0.05 * mu AS d FROM ref
    ),
    cs AS (
      SELECT *, SUM(d) OVER wo AS c
      FROM dev
      WINDOW wo AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cum AS (
      SELECT *, MIN(c) OVER wo AS run_min
      FROM cs
      WINDOW wo AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           cents / 100.0 AS total,
           floor(1e6 * (c - least(CAST(0 AS DOUBLE), run_min)) + 0.5) / 1e6
             AS cusum,
           (c - least(CAST(0 AS DOUBLE), run_min)) > 0.5 * mu AS flagged
    FROM cum
    """,
)
def events_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection (Page 1954) on the per-type daily
    series: the one-sided recurrence S_t = max(0, S_{t-1} + (x_t - μ -
    k)) is solved in CLOSED FORM via the reflection identity S_t =
    cum_t - min(0, min_{j<=t} cum_j) — so the sequential recurrence
    becomes two ordered window passes (a running sum and a running min
    of it), fully parallel per series and expressible identically in
    both engines. Days where S_t exceeds h = 0.5μ flag a sustained
    upward shift (allowance k = 0.05μ absorbs noise).

    Parity: daily totals are exact integer cents; μ is one exact
    division; the running sums evaluate in the SAME day order on both
    engines, so every intermediate double is bit-identical — ordered
    windows dodge the aggregation-order FP problem that plagues
    groupBy sums. Scale shape: one daily aggregate, then windows over
    the bounded per-type daily series (365 rows/type/year at any
    corpus size)."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"))
    )
    wt = Window.partitionBy("event_type")
    ref = daily.withColumn(
        "mu", F.sum("cents").over(wt).cast("double") / F.count(F.lit(1)).over(wt)
    )
    dev = ref.withColumn(
        "d", F.col("cents") - F.col("mu") - F.lit(0.05) * F.col("mu")
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dev.withColumn("c", F.sum("d").over(wo)).withColumn(
        "run_min", F.min(F.col("c")).over(wo)
    )
    s = F.col("c") - F.least(F.lit(0.0), F.col("run_min"))
    return cum.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("cents") / F.lit(100.0)).alias("total"),
        (F.floor(F.lit(1e6) * s + F.lit(0.5)) / F.lit(1e6)).alias("cusum"),
        (s > F.lit(0.5) * F.col("mu")).alias("flagged"),
    )


# Poisson(1) CDF thresholds as exact shared literals: the bootstrap weight
# of a row is the number of thresholds its uniform exceeds (inverse CDF).
_POIS1_CDF = [
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712", "0.9999897508033253", "0.999998874797402",
]
_BOOT_REPS = 32


def _bootstrap_oracle() -> str:
    from ..operators.dedup import portable_hash60_sql

    h = portable_hash60_sql("CAST(o_orderkey AS VARCHAR) || '|' || CAST(rep AS VARCHAR)")
    ks = " + ".join(f"(CASE WHEN unif >= {c} THEN 1 ELSE 0 END)" for c in _POIS1_CDF)
    return f"""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    drawn AS (
      SELECT o_orderpriority, cents, rep,
             (({h}) % 2147483648 + 0.5) / 2147483648.0 AS unif
      FROM o CROSS JOIN (SELECT unnest(range(1, {_BOOT_REPS + 1})) AS rep) r
    ),
    reps AS (
      SELECT o_orderpriority, rep,
             CAST(SUM(cents * ({ks})) AS BIGINT) AS t
      FROM drawn GROUP BY o_orderpriority, rep
    ),
    pt AS (
      SELECT o_orderpriority, CAST(SUM(cents) AS BIGINT) AS total_cents FROM o
      GROUP BY o_orderpriority
    )
    SELECT pt.o_orderpriority, pt.total_cents,
           list_sort(list(reps.t))[2]  AS ci_low_cents,
           list_sort(list(reps.t))[{_BOOT_REPS - 1}] AS ci_high_cents
    FROM reps JOIN pt USING (o_orderpriority)
    GROUP BY pt.o_orderpriority, pt.total_cents
    """


def _bootstrap_ci(spark, sf_dir, portable: bool):
    from ..operators.dedup import portable_hash60

    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey").isNotNull() & F.col("o_totalprice").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    drawn = o.select(
        "o_orderpriority",
        "cents",
        "o_orderkey",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_REPS))).alias("rep"),
    )
    key = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"), F.col("rep").cast("string")
    )
    h31 = (
        portable_hash60(key) % F.lit(2147483648)
        if portable
        else F.pmod(F.xxhash64(key), F.lit(2147483648))
    )
    u = (h31 + F.lit(0.5)) / F.lit(2147483648.0)
    k = None
    for c in _POIS1_CDF:
        term = (u >= F.lit(float(c))).cast("long")
        k = term if k is None else k + term
    reps = (
        drawn.withColumn("w", k)
        .groupBy("o_orderpriority", "rep")
        .agg(F.sum(F.col("cents") * F.col("w")).alias("t"))
    )
    pt = o.groupBy("o_orderpriority").agg(F.sum("cents").alias("total_cents"))
    ci = reps.groupBy("o_orderpriority").agg(
        F.sort_array(F.collect_list("t")).alias("ts")
    )
    return ci.join(pt, "o_orderpriority").select(
        "o_orderpriority",
        "total_cents",
        F.element_at("ts", 2).alias("ci_low_cents"),
        F.element_at("ts", _BOOT_REPS - 1).alias("ci_high_cents"),
    )


@register("agg_bootstrap_ci", oracle=_bootstrap_oracle())
def agg_bootstrap_ci(spark, sf_dir):
    """Poisson bootstrap confidence intervals (the online/streaming
    bootstrap — Oza & Russell 2001, Chamandy et al. 2012): each row
    enters replicate r with weight ~ Poisson(1) drawn by inverse CDF
    from a deterministic per-(row, replicate) uniform, so the resample
    never materializes and the whole thing is one weighted aggregate —
    the only way to bootstrap a total when the data doesn't fit on one
    machine (classical resampling needs n draws WITH replacement from a
    global index). 32 replicate totals per group; the CI is the 2nd and
    31st order statistic (~94% coverage), selected from the SORTED
    bounded replicate array — exact integers end to end.

    Scale shape: the ×32 replicate explode multiplies a CONSTANT;
    weights are codegen arithmetic off the md5-portable uniform (the
    oracle re-derives identical draws); both aggregates are map-side
    combinable; the order-statistic step touches 32 values per group."""
    return _bootstrap_ci(spark, sf_dir, portable=True)


@register("agg_bootstrap_ci_fast")  # rows-only BY DESIGN: xxhash64
def agg_bootstrap_ci_fast(spark, sf_dir):
    """xxhash64 scale default of ``agg_bootstrap_ci`` — the identical
    Poisson(1) inverse-CDF weighting and order-statistic CI, with the
    per-(row, replicate) uniform drawn from JVM-codegen ``xxhash64``
    instead of the md5 fold the DuckDB oracle needs (the portable-twin /
    fast-default split the MinHash family uses). The md5 chain is the
    dominant sf0.1 cost of the portable headliner (×32 md5 per row); no
    DuckDB oracle here (xxhash64 is Spark-only) — the oracle-exact twin
    proves the weighting algebra, and ``test_scale_ops.py`` pins that
    both variants report identical deterministic totals with CIs that
    bracket them."""
    return _bootstrap_ci(spark, sf_dir, portable=False)


@register(
    "agg_bootstrap_ci_fast_invariants",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           TRUE AS ci_ordered,
           TRUE AS ci_brackets_total,
           TRUE AS width_ratio_ok
    FROM orders WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
    GROUP BY o_orderpriority
    """,
)
def agg_bootstrap_ci_fast_invariants(spark, sf_dir):
    """DRIVER-ATTESTABLE companion to the rows-only
    ``agg_bootstrap_ci_fast`` (the ``ann_recall_floors`` pattern): per
    group the oracle re-derives the deterministic total EXACTLY in SQL —
    the fast twin's total_cents is hash-independent, so a mismatch is a
    real aggregation bug — and states three booleans over the xxhash64
    twin's actual CI output: the interval is ordered, it BRACKETS the
    true total (the property a bootstrap exists to deliver; pinned also
    in tests/test_scale_ops.py), and its width sits within [0.2x, 5x] of
    the oracle-exact portable twin's width (measured 0.54-1.68 across
    sf0.001-sf0.01 — two independent 32-replicate Poisson bootstraps of
    the same data differ by sampling noise, never by an order of
    magnitude).

    Scale shape: runs both twins (each a map-side-combinable weighted
    aggregate over a x32 constant explode) + one 5-row join."""
    fast = _bootstrap_ci(spark, sf_dir, portable=False)
    portable = _bootstrap_ci(spark, sf_dir, portable=True).select(
        "o_orderpriority",
        (F.col("ci_high_cents") - F.col("ci_low_cents")).alias("pw"),
    )
    fw = F.col("ci_high_cents") - F.col("ci_low_cents")
    return fast.join(portable, "o_orderpriority").select(
        "o_orderpriority",
        "total_cents",
        (F.col("ci_low_cents") <= F.col("ci_high_cents")).alias("ci_ordered"),
        (
            (F.col("ci_low_cents") <= F.col("total_cents"))
            & (F.col("total_cents") <= F.col("ci_high_cents"))
        ).alias("ci_brackets_total"),
        ((fw * 5 >= F.col("pw")) & (fw <= F.col("pw") * 5)).alias("width_ratio_ok"),
    )


@register(
    "ivm_incremental_topk",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS c
      FROM orders
      WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
      GROUP BY o_custkey
    ),
    thr AS (
      SELECT CAST(MIN(c) AS BIGINT) AS t FROM (
        SELECT c FROM base ORDER BY c DESC, o_custkey LIMIT 20)
    ),
    edited AS (
      SELECT o_custkey,
             CAST(floor((o_totalprice + CASE WHEN o_orderkey % 7 = 0
                                             THEN 100 ELSE 0 END)
                        * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        AND o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_custkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      FROM orders
      WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        AND o_orderkey % 11 = 0
    ),
    newtot AS (
      SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM edited GROUP BY o_custkey
    ),
    top10 AS (
      SELECT o_custkey, total_cents, n_orders,
             CAST(ROW_NUMBER() OVER (ORDER BY total_cents DESC, o_custkey)
                  AS BIGINT) AS rank
      FROM newtot ORDER BY total_cents DESC, o_custkey LIMIT 10
    )
    SELECT rank, o_custkey, total_cents, n_orders,
           (SELECT MIN(total_cents) FROM top10) < thr.t AS underflow
    FROM top10 CROSS JOIN thr
    """,
)
def ivm_incremental_topk(spark, sf_dir):
    """Incremental view maintenance for an ORDER-SENSITIVE view — the
    top-10 customers by spend — completing the IVM family (aggregate:
    ``ivm_incremental_agg``; join: ``ivm_incremental_join``). Top-k is
    not a ring aggregate, so the standard trick is a SLACK BUFFER: keep
    the top-2k entries of the maintained per-customer totals view, apply
    the changeset only to buffer members and delta-touched customers
    (key lookups into the maintained view — never a base rescan), and
    take the new top-k from those candidates. Correct whenever the
    maintained k-th total still clears the pre-edit 2k-th total (every
    untouched customer outside the buffer sits below it); the
    ``underflow`` flag is exactly that guard — FALSE means the
    maintained answer is provably the true top-k, TRUE means this batch
    must fall back to one re-rank of the totals view (still never the
    base table). The oracle recomputes the top-10 from the edited table
    in full and derives the same flag, so a green row proves maintained
    == recomputed under the same CDC rule as the other IVM queries.

    Scale shape: the maintained totals view is |customers| rows; the
    changeset aggregation is map-side combinable; candidates are ≤ 2k +
    |touched customers| rows; the final rank is a 30-row sort."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey").isNotNull() & F.col("o_custkey").isNotNull()
    )
    k = F.col("o_orderkey")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    base = o.groupBy("o_custkey").agg(
        F.sum(cents).alias("c"), F.count(F.lit(1)).alias("n")
    )
    buffer = base.orderBy(F.desc("c"), F.asc("o_custkey")).limit(20)
    thr = buffer.agg(F.min("c").alias("t"))
    # Signed per-customer deltas under the shared CDC edit rule.
    deletes = o.filter(k % 13 == 0).select(
        "o_custkey", (-cents).alias("dc"), F.lit(-1).cast("long").alias("dn")
    )
    upd_old = o.filter((k % 7 == 0) & (k % 13 != 0)).select(
        "o_custkey", (-cents).alias("dc"), F.lit(-1).cast("long").alias("dn")
    )
    upd_new = o.filter((k % 7 == 0) & (k % 13 != 0)).select(
        "o_custkey",
        F.floor((F.col("o_totalprice") + 100) * 100 + F.lit(0.5))
        .cast("long")
        .alias("dc"),
        F.lit(1).cast("long").alias("dn"),
    )
    inserts = o.filter(k % 11 == 0).select(
        "o_custkey", cents.alias("dc"), F.lit(1).cast("long").alias("dn")
    )
    deltas = (
        deletes.unionByName(upd_old)
        .unionByName(upd_new)
        .unionByName(inserts)
        .groupBy("o_custkey")
        .agg(F.sum("dc").alias("dc"), F.sum("dn").alias("dn"))
    )
    # Candidates: buffer ∪ touched — totals by key lookup into the
    # maintained view (base here), never a rescan of orders.
    cand_keys = (
        buffer.select("o_custkey").unionByName(deltas.select("o_custkey")).distinct()
    )
    cand = (
        base.join(cand_keys, "o_custkey", "leftsemi")
        .join(deltas, "o_custkey", "left")
        .select(
            "o_custkey",
            (F.col("c") + F.coalesce(F.col("dc"), F.lit(0))).alias("total_cents"),
            (F.col("n") + F.coalesce(F.col("dn"), F.lit(0))).alias("n_orders"),
        )
        .filter(F.col("n_orders") > 0)
    )
    top10 = (
        cand.orderBy(F.desc("total_cents"), F.asc("o_custkey"))
        .limit(10)
        .select(
            "*",
            F.row_number()
            .over(
                Window.orderBy(F.desc("total_cents"), F.asc("o_custkey"))
            )
            .cast("long")
            .alias("rank"),
        )
    )
    kmin = top10.agg(F.min("total_cents").alias("m"))
    return (
        top10.crossJoin(F.broadcast(kmin))
        .crossJoin(F.broadcast(thr))
        .select(
            "rank",
            "o_custkey",
            "total_cents",
            "n_orders",
            (F.col("m") < F.col("t")).alias("underflow"),
        )
    )
