"""Relational query inventory (SURVEY.md §2.2).

The reference delegates all relational semantics to opaque SQL Server
stored procedures (/root/reference/main.py:181-211, main.py:509-514); the
standard operator taxonomy is therefore supplied by Spark built-ins and
declared here, one oracled query per operator family: scans, projection,
filter, every join type, aggregation, rollup/cube/grouping sets, windows,
sort/limit/top-k, set ops, scalar function coverage, and subqueries.

Every entry pairs an idiomatic DataFrame-API plan (Catalyst picks the
physical strategy; small dims are broadcast) with ANSI SQL for the DuckDB
oracle. See registry.py for the cross-engine determinism rules.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table, register_views
from ._helpers import davg, dec, dsum, sql_davg, sql_dsum
from .registry import query

# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

_Q01_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(24,4))
                * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", oracle=_Q01_ORACLE, tags=("agg", "tpch"))
def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan -> filter -> hash agg (partial+final)."""
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = (dec("l_extendedprice") * (one - dec("l_discount"))).cast(
        "decimal(24,4)"
    )
    charge = disc_price * (one + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_filter_project",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       o_orderpriority
FROM orders
WHERE o_totalprice > 400000 AND o_orderstatus = 'O'
""",
    tags=("scan", "filter", "project"),
)
def q02_filter_project(spark, sf_dir):
    """Predicate + column pruning pushed to the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_totalprice") > 400000) & (F.col("o_orderstatus") == "O"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.year("o_orderdate").cast("long").alias("order_year"),
            "o_orderpriority",
        )
    )


@query(
    "q06_revenue_forecast",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    tags=("agg", "filter", "tpch"),
)
def q06_revenue_forecast(spark, sf_dir):
    """TPC-H Q6 shape: tight range filters -> single global aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (inner / left / semi / anti / full / theta / cross / multi-way)
# ---------------------------------------------------------------------------

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@query(
    "q03_top_revenue_orders",
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk", "tpch"),
)
def q03_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join, agg, deterministic top-k."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-30").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-30").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q04_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "agg", "tpch"),
)
def q04_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS as a left-semi join."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q05_region_nation_revenue",
    oracle=f"""
SELECT n_name, CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
    tags=("join", "multiway", "agg", "tpch"),
)
def q05_region_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join; dims broadcast, facts shuffle on keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q07_left_join_counts",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment,
       COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
           AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name, c_mktsegment
""",
    tags=("join", "left", "agg"),
)
def q07_left_join_counts(spark, sf_dir):
    """Left outer join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "q08_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
""",
    tags=("join", "semi"),
)
def q08_semi_join(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q09_anti_join",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
    tags=("join", "anti"),
)
def q09_anti_join(spark, sf_dir):
    """Customers with no high-value order (every customer has SOME order
    in the synthetic data, so the anti join is against a filtered side)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q10_full_outer_daily",
    oracle="""
WITH od AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
            FROM orders GROUP BY 1),
     ld AS (SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_shipments
            FROM lineitem GROUP BY 1)
SELECT COALESCE(od.d, ld.d) AS d, n_orders, n_shipments
FROM od FULL OUTER JOIN ld ON od.d = ld.d
""",
    tags=("join", "full_outer", "agg"),
)
def q10_full_outer_daily(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    od = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    ld = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_shipments")
    )
    return od.join(ld, "d", "full").select("d", "n_orders", "n_shipments")


@query(
    "q11_theta_self_join",
    oracle="""
SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
""",
    tags=("join", "theta", "self"),
)
def q11_theta_self_join(spark, sf_dir):
    """Equi + non-equi (theta) self join: unordered same-region pairs."""
    n = load_table(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


@query(
    "q12_cross_join",
    oracle="""
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
""",
    tags=("join", "cross"),
)
def q12_cross_join(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    a, b = r.alias("a"), r.alias("b")
    return a.crossJoin(b).select(
        F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b")
    )


# ---------------------------------------------------------------------------
# Rollup / cube / grouping sets
# ---------------------------------------------------------------------------


@query(
    "q13_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    tags=("agg", "rollup"),
)
def q13_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "q14_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    tags=("agg", "cube"),
)
def q14_cube(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price")
    )


@query(
    "q15_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       {sql_dsum('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=("agg", "grouping_sets"),
)
def q15_grouping_sets(spark, sf_dir):
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               {sql_dsum('l_extendedprice')} AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q16_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
WHERE rn <= 3
""",
    tags=("window", "topk"),
)
def q16_topk_per_group(spark, sf_dir):
    """Top-k per group: the canonical window + row_number <= k plan."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q17_running_total",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
FROM orders
""",
    tags=("window", "running"),
)
def q17_running_total(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "q18_lag_lead",
    oracle="""
SELECT user_id, event_id, ts, value,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       value - LAG(value) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window", "lag_lead"),
)
def q18_lag_lead(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "q19_rank_ntile",
    oracle="""
SELECT s_suppkey, s_nationkey, s_acctbal,
       CAST(RANK()       OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       PERCENT_RANK()    OVER w AS prnk,
       CAST(NTILE(4)     OVER w AS BIGINT) AS quartile
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
""",
    tags=("window", "rank"),
)
def q19_rank_ntile(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops / distinct
# ---------------------------------------------------------------------------


@query(
    "q20_top_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
    tags=("sort", "limit"),
)
def q20_top_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q21_set_union",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
""",
    tags=("setop", "union"),
)
def q21_set_union(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@query(
    "q22_set_intersect",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS custkey FROM orders
""",
    tags=("setop", "intersect"),
)
def q22_set_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    b = o.select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "q23_set_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
""",
    tags=("setop", "except"),
)
def q23_set_except(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.select(F.col("c_custkey").alias("custkey")).exceptAll(
        o.select(F.col("o_custkey").alias("custkey"))
    ).distinct()


@query(
    "q24_distinct_agg",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "distinct"),
)
def q24_distinct_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q25_having",
    oracle=f"""
SELECT p_brand, COUNT(*) AS n_parts,
       {sql_dsum('p_retailprice')} AS total_price
FROM part GROUP BY p_brand HAVING COUNT(*) > 5
""",
    tags=("agg", "having"),
)
def q25_having(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice").alias("total_price"),
        )
        .filter(F.col("n_parts") > 5)
    )


@query(
    "q26_conditional_agg",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS open_value
FROM orders GROUP BY o_orderpriority
""",
    tags=("agg", "case_when"),
)
def q26_conditional_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    zero = F.lit(0).cast("decimal(18,2)")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.sum(F.when(F.col("o_orderstatus") == "O", dec("o_totalprice")).otherwise(zero))
        .cast("double")
        .alias("open_value"),
    )


@query(
    "q27_pivot",
    oracle=f"""
SELECT l_returnflag,
       COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_finished,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
           AS qty_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
           AS qty_finished
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "pivot"),
)
def q27_pivot(spark, sf_dir):
    """Spark .pivot() -> wide table; oracle is the conditional-agg expansion."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("l_quantity")).cast("double").alias("qty"),
        )
    )
    return wide.select(
        "l_returnflag",
        F.col("O_n").alias("n_open"),
        F.col("F_n").alias("n_finished"),
        F.col("O_qty").alias("qty_open"),
        F.col("F_qty").alias("qty_finished"),
    )


# ---------------------------------------------------------------------------
# Scalar function coverage (string / date / math / json)
# ---------------------------------------------------------------------------


@query(
    "q28_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       SUBSTRING(p_name, 1, 5) AS name_prefix,
       REPLACE(p_name, ' ', '_') AS name_snake,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       REGEXP_EXTRACT(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       REVERSE(p_type) AS type_rev,
       CAST(STRPOS(p_name, 'a') AS BIGINT) AS first_a
FROM part
""",
    tags=("functions", "string"),
)
def q28_string_funcs(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
    )


@query(
    "q29_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
       CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
       CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
       CAST(DAY(o_orderdate) AS BIGINT) AS dom,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
           AS days_since_epoch_start,
       LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
FROM orders WHERE o_orderkey % 10 = 0
""",
    tags=("functions", "date"),
)
def q29_date_funcs(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@query(
    "q30_math_funcs",
    oracle="""
SELECT p_partkey,
       ABS(p_retailprice - 1000.0) AS abs_delta,
       CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       ROUND(SQRT(p_retailprice), 6) AS price_sqrt,
       ROUND(LN(p_retailprice), 6) AS price_ln,
       POW(CAST(p_size AS DOUBLE), 2) AS size_sq,
       CAST(p_size % 7 AS BIGINT) AS size_mod,
       CAST(SIGN(p_retailprice - 1000.0) AS BIGINT) AS price_sign,
       GREATEST(p_size, 25) AS size_hi,
       LEAST(p_size, 25) AS size_lo
FROM part
""",
    tags=("functions", "math"),
)
def q30_math_funcs(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_delta"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
        (F.col("p_size") % 7).cast("long").alias("size_mod"),
        F.signum(F.col("p_retailprice") - 1000.0).cast("long").alias("price_sign"),
        F.greatest("p_size", F.lit(25)).alias("size_hi"),
        F.least("p_size", F.lit(25)).alias("size_lo"),
    )


@query(
    "q34_json_funcs",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
""",
    tags=("functions", "json"),
)
def q34_json_funcs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Subqueries (same ANSI text runs on Spark SQL and DuckDB)
# ---------------------------------------------------------------------------

_Q31_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'AUTOMOBILE')
GROUP BY o_orderstatus
"""


@query("q31_in_subquery", oracle=_Q31_SQL, tags=("subquery", "in"))
def q31_in_subquery(spark, sf_dir):
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(_Q31_SQL)


_Q32_SQL = """
SELECT COUNT(*) AS n_small,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
FROM lineitem l1
WHERE l1.l_quantity < (SELECT 0.3 * AVG(l2.l_quantity) FROM lineitem l2
                       WHERE l2.l_partkey = l1.l_partkey)
"""


@query("q32_correlated_scalar", oracle=_Q32_SQL, tags=("subquery", "correlated"))
def q32_correlated_scalar(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (decorrelated by the
    optimizer into an agg + join in both engines).

    The 0.3*avg threshold comparison uses doubles; avg is over integral
    quantities per part, so both engines compute identical thresholds
    (small-count exact division).
    """
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_Q32_SQL)


_Q33_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                  AS DOUBLE) / COUNT(*) FROM orders)
GROUP BY o_orderpriority
"""


@query("q33_scalar_subquery", oracle=_Q33_SQL, tags=("subquery", "scalar"))
def q33_scalar_subquery(spark, sf_dir):
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_Q33_SQL)
