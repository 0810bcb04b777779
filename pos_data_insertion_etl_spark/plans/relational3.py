"""Third relational batch: the remaining classic TPC-H shapes, adapted
to the reduced test schema (no partsupp / commit-receipt dates), plus a
MERGE-style upsert -- the set operation behind the reference's
insert-or-update sink semantics (/root/reference/main.py stored-proc
upsert path).

Shapes covered here and why they matter at 100 TB:

* Q9  (q101): multi-way star join with an expression-level profit
  measure -- dims broadcast, the fact shuffles once on the group keys.
* Q11 (q102): HAVING against a global scalar -- the scalar aggregates
  once and broadcasts; no per-group recomputation.
* Q13 (q103): aggregate-of-aggregate (distribution of group sizes) --
  two shuffles, the second over tiny cardinality.
* Q15 (q104): argmax via join against a 1-row max -- decimal equality
  is exact, so the argmax is deterministic across engines.
* Q16 (q105): COUNT(DISTINCT) under an anti-joined exclusion list.
* Q20 (q106): nested semi joins over a grouped HAVING.
* Q21 (q107): the four-way correlated EXISTS/NOT EXISTS, reformulated
  as one per-order aggregate + equi-join (the scalable plan; the oracle
  keeps the textbook EXISTS form to prove equivalence).

Determinism rules as in plans/registry.py: exact decimal sums cast to
double at the end; every LIMIT ordered by a total key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.upsert import upsert
from ._helpers import dec, sql_dsum
from .registry import query

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)
# Q9's profit measure: discounted revenue minus the tax amount, all in
# exact decimal so partial-aggregation order cannot change the sum.
_PROFIT_SQL = (
    f"({_DISC_PRICE_SQL}"
    " - CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)))"
)


@query(
    "q101_product_profit",
    oracle=f"""
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_PROFIT_SQL}) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, CAST(YEAR(o_orderdate) AS BIGINT)
""",
    tags=("join", "multiway", "agg", "tpch"),
)
def q101_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit (revenue minus tax, no partsupp cost in
    this schema) per supplier nation per order year for one part family.
    part/supplier/nation broadcast; the lineitem fact shuffles exactly
    once, on the (nation, year) group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    one = F.lit(1).cast("decimal(18,2)")
    profit = dec("l_extendedprice") * (one - dec("l_discount")) - dec(
        "l_extendedprice"
    ) * dec("l_tax")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "q102_value_concentration",
    oracle=f"""
SELECT l_partkey, {sql_dsum('l_extendedprice')} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >
       (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FROM lineitem)
       * CAST(0.0007 AS DECIMAL(10,6))
""",
    tags=("agg", "having", "scalar_subquery", "tpch"),
)
def q102_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape: parts whose total lineitem value exceeds a fixed
    fraction of GLOBAL value. The global sum aggregates once into a
    1-row DataFrame and cross-joins (broadcast) into the HAVING filter;
    the threshold compare stays in exact decimal so the boundary is
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("v")
    )
    total = li.agg(F.sum(dec("l_extendedprice")).alias("grand_total"))
    frac = F.lit("0.0007").cast("decimal(10,6)")
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("grand_total") * frac)
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )


@query(
    "q103_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    tags=("join", "agg_of_agg", "tpch"),
)
def q103_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of orders-per-customer (customers
    with zero orders included via the left join). Two shuffles: one on
    c_custkey, one on the tiny c_count domain."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q104_top_supplier_revenue",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_DISC_PRICE_SQL}) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1999-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
""",
    tags=("agg", "scalar_subquery", "argmax", "tpch"),
)
def q104_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a
    quarter -- argmax via join against a broadcast 1-row MAX. Revenue
    stays decimal until after the equality compare, so ties and the
    argmax itself are exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    one = F.lit(1).cast("decimal(18,2)")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (one - dec("l_discount"))).alias("r")
    )
    best = rev.agg(F.max("r").alias("max_r"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("r") == F.col("max_r"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue"))
    )


@query(
    "q105_supplier_part_mix",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#9'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    tags=("join", "distinct_agg", "anti", "tpch"),
)
def q105_supplier_part_mix(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) with
    an excluded-supplier list. NOT IN becomes a broadcast anti join
    (s_suppkey is non-null here, so anti == NOT IN); the distinct count
    shuffles on the group keys only."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q106_bulk_suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50
)
""",
    tags=("subquery", "semi", "having", "tpch"),
)
def q106_bulk_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who moved bulk quantity of a part
    family in a year -- nested IN lists become two stacked semi joins;
    the grouped HAVING runs once over the filtered fact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    bulk = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    return s.join(bulk, s.s_suppkey == bulk.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "q107_sole_returned_supplier",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("subquery", "exists", "agg", "tpch"),
)
def q107_sole_returned_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers solely responsible for returns on
    finalized multi-supplier orders. The oracle keeps the textbook
    EXISTS + NOT EXISTS; the Spark plan is the scalable reformulation --
    ONE per-order aggregate (supplier count, returned-supplier count)
    equi-joined back to the returned rows:

      EXISTS other-supplier row      <=>  n_suppliers     > 1
      NOT EXISTS other R-supplier    <=>  n_ret_suppliers = 1
                                          (given this row has flag R)

    which replaces two correlated semi/anti joins per row with a single
    shuffle on l_orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_suppliers"),
    )
    flagged = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .join(per_order, "l_orderkey")
        .filter((F.col("n_suppliers") > 1) & (F.col("n_ret_suppliers") == 1))
    )
    return (
        flagged.join(F.broadcast(s), flagged.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q116_priority_by_linestatus",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l_linestatus
""",
    tags=("join", "conditional_agg", "tpch"),
)
def q116_priority_by_linestatus(spark, sf_dir):
    """TPC-H Q12 shape (l_linestatus standing in for l_shipmode, which
    this schema lacks): high- vs low-priority order counts under a
    fact-dimension join with the date filter pushed to the fact scan.
    Completes the 22/22 TPC-H query-shape inventory."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q108_upsert_merge",
    oracle="""
WITH updates AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2))
              * CAST(1.10 AS DECIMAL(4,2)) AS DOUBLE) AS o_totalprice,
         'R' AS o_orderstatus
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey, o_totalprice, o_orderstatus FROM updates
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM updates u
                  WHERE u.o_orderkey = orders.o_orderkey)
""",
    tags=("upsert", "merge", "etl"),
)
def q108_upsert_merge(spark, sf_dir):
    """MERGE-style upsert: an updates batch replaces matching target
    rows by key, non-matching target rows pass through (the semantics of
    the reference's insert-or-update stored-proc sink,
    /root/reference/main.py). Runs as anti join + union -- one shuffle
    on the key, no row-by-row driver logic (operators/upsert.py)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        (dec("o_totalprice") * F.lit("1.10").cast("decimal(4,2)"))
        .cast("double")
        .alias("o_totalprice"),
        F.lit("R").alias("o_orderstatus"),
    )
    return upsert(o, updates, ["o_orderkey"])
