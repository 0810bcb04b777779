"""Second relational batch: TPC-H-shaped queries that exercise optimizer
paths the first batch doesn't -- disjunctive predicate pushdown (Q19),
large-group HAVING + IN (Q18), NOT EXISTS + scalar avg (Q22), min-cost
correlated supplier (Q2), year-pair volume joins (Q7) -- plus
deterministic statistics (variance via exact decimal moments) and
order-insensitive collect aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table, register_views
from ._helpers import dec, dsum, sql_dsum
from .registry import query

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@query(
    "q67_big_customers",
    oracle=f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       {sql_dsum('l_quantity')} AS total_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
""",
    tags=("join", "having", "in_subquery", "tpch"),
)
def q67_big_customers(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped HAVING (semi join against an
    aggregate), then a 3-way join + regroup."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


@query(
    "q68_disjunctive_predicates",
    oracle=f"""
SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1
       AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10
       AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20
       AND l_quantity <= 30)
""",
    tags=("join", "disjunctive", "tpch"),
)
def q68_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides; Catalyst
    extracts the common p_brand/p_size filters below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(18,2)")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_Q69_SQL = """
SELECT SUBSTRING(c_name, 1, 9) AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY SUBSTRING(c_name, 1, 9)
"""


@query("q69_global_sales_opportunity", oracle=_Q69_SQL, tags=("subquery", "anti", "tpch"))
def q69_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: scalar avg subquery + NOT EXISTS anti join, same
    ANSI text on both engines."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_Q69_SQL)


_Q70_SQL = """
SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                     WHERE s2.s_nationkey = s.s_nationkey)
"""


@query("q70_top_supplier_per_nation", oracle=_Q70_SQL, tags=("subquery", "correlated", "tpch"))
def q70_top_supplier_per_nation(spark, sf_dir):
    """TPC-H Q2 shape: correlated max subquery (decorrelated to an agg +
    join by both optimizers)."""
    register_views(spark, sf_dir, ["supplier", "nation"])
    return spark.sql(_Q70_SQL)


@query(
    "q71_volume_by_year",
    oracle=f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE n1.n_name IN ('NATION_3', 'NATION_7') AND n2.n_name IN ('NATION_3', 'NATION_7')
GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l_shipdate) AS BIGINT)
""",
    tags=("join", "multiway", "tpch"),
)
def q71_volume_by_year(spark, sf_dir):
    """TPC-H Q7 shape: nation-pair shipping volume per year."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.filter(F.col("n_name").isin("NATION_3", "NATION_7")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.filter(F.col("n_name").isin("NATION_3", "NATION_7")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("volume")
        )
    )


@query(
    "q72_exact_moments",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2,
       (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
       / (COUNT(*) - 1) AS variance_qty
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "statistics"),
)
def q72_exact_moments(spark, sf_dir):
    """Deterministic variance: exact decimal moments (sum, sum-of-squares)
    then one double evaluation of the textbook formula -- engine-stable
    where native stddev/var (Welford vs naive, merge order) is not."""
    li = load_table(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    s1 = F.sum(q).cast("double")
    s2 = F.sum(q * q).cast("double")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("variance_qty"),
    )


@query(
    "q76_moving_average",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER w AS DOUBLE) / LEAST(
                CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS BIGINT), 4)
           AS moving_avg_4
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "moving_frame"),
)
def q76_moving_average(spark, sf_dir):
    """Bounded ROWS frame (3 preceding..current): 4-order moving average
    per customer, exact decimal numerator / explicit window-size
    denominator so partial frames at the partition head stay exact."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, W.currentRow)
    )
    wn = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.least(F.row_number().over(wn).cast("long"), F.lit(4))
        ).alias("moving_avg_4"),
    )


@query(
    "q77_windowed_conditional",
    oracle="""
SELECT user_id, event_id, ts,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            OVER w AS BIGINT) AS errors_last_10,
       CAST(COUNT(*) OVER w AS BIGINT) AS events_last_10
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "conditional"),
)
def q77_windowed_conditional(spark, sf_dir):
    """Conditional aggregate over a bounded trailing frame: per-user error
    rate over the last 10 events (streaming-ish quality monitor shape)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w)
        .cast("long")
        .alias("errors_last_10"),
        F.count(F.lit(1)).over(w).cast("long").alias("events_last_10"),
    )


@query(
    "q73_collect_sorted",
    oracle="""
SELECT l_returnflag,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
           AS statuses,
       CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS n_statuses
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "collect"),
)
def q73_collect_sorted(spark, sf_dir):
    """Order-insensitive collect: collect_set sorted then joined --
    deterministic where raw collect_list order is not."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )
