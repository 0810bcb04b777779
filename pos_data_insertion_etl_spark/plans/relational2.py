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


# ---------------------------------------------------------------------------
# Round-2 additions: Q10/Q14/Q8 shapes + map-function coverage
# ---------------------------------------------------------------------------


@query(
    "q85_returned_revenue",
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "agg", "topk", "tpch"),
)
def q85_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    Fact side filters push to the scan; customer/nation broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q86_promo_revenue",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue,
       CAST(100 AS DOUBLE) *
         (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE)) AS promo_pct
FROM lineitem JOIN part   ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
""",
    tags=("join", "agg", "ratio", "tpch"),
)
def q86_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share per year. The percentage is
    one double division of two exact decimal sums, then one multiply --
    the same op order in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    one = F.lit(1).cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    disc = dec("l_extendedprice") * (one - dec("l_discount"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc).otherwise(zero)
    ).cast("double")
    total = F.sum(disc).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            promo.alias("promo_revenue"),
            total.alias("total_revenue"),
            (F.lit(100).cast("double") * (promo / total)).alias("promo_pct"),
        )
    )


@query(
    "q87_market_share",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN r_name = 'ASIA' THEN {_DISC_PRICE_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS asia_revenue,
       CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN r_name = 'ASIA' THEN {_DISC_PRICE_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS asia_share
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1
""",
    tags=("join", "agg", "ratio", "tpch"),
)
def q87_market_share(spark, sf_dir):
    """TPC-H Q8 shape: supplier-region market share per order year --
    conditional decimal sums under a 5-way join (three broadcast dims)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    disc = dec("l_extendedprice") * (one - dec("l_discount"))
    asia = F.sum(
        F.when(F.col("r_name") == "ASIA", disc).otherwise(zero)
    ).cast("double")
    total = F.sum(disc).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            asia.alias("asia_revenue"),
            total.alias("total_revenue"),
            (asia / total).alias("asia_share"),
        )
    )


@query(
    "q84_map_funcs",
    oracle="""
SELECT o_orderkey,
       o_orderstatus AS status_v,
       o_orderpriority AS priority_v,
       CAST(2 AS BIGINT) AS n_entries,
       'priority,status' AS keys_sorted,
       CAST(3 AS BIGINT) AS n_after_concat
FROM orders
WHERE o_orderkey < 100
""",
    tags=("functions", "map"),
)
def q84_map_funcs(spark, sf_dir):
    """Map-function coverage (create_map / element_at / map_keys /
    map_concat / size). DuckDB has no comparable MAP pipeline, so the
    oracle states the ground-truth scalars the map ops must reproduce --
    the map machinery runs only on the Spark side."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("extra"), F.lit("x")))
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_v"),
        F.element_at(m, "priority").alias("priority_v"),
        F.size(m).cast("long").alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m2).cast("long").alias("n_after_concat"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

_ORDER_CHAIN_SQL = """
WITH RECURSIVE ord AS (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
edges AS (
  SELECT a.o_custkey AS custkey, a.o_orderkey AS src, b.o_orderkey AS dst
  FROM ord a JOIN ord b ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1
),
chain AS (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         CAST(1 AS BIGINT) AS depth
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT e.custkey, e.dst AS orderkey, c.depth + 1 AS depth
  FROM chain c JOIN edges e ON e.src = c.orderkey AND e.custkey = c.custkey
)
SELECT custkey, orderkey, depth FROM chain
"""


@query(
    "q97_recursive_order_chain",
    oracle=_ORDER_CHAIN_SQL,
    tags=("recursive", "sql", "iterative"),
)
def q97_recursive_order_chain(spark, sf_dir):
    """Recursive CTE (Spark 4 `WITH RECURSIVE`): walk each customer's
    order-succession chain (anchor = first order by date, step = next
    order) and emit the position of every order in its chain. The SAME
    SQL text runs on both engines -- the declarative sibling of the
    DataFrame-level iteration in operators/graph.py (which remains the
    scale path for high-diameter graphs: pointer jumping converges in
    O(log d) rounds vs the CTE's O(d) frontier expansions; here d is
    bounded by orders-per-customer, so the CTE shape is fine and each
    frontier is a parallel equi-join).

    Materialization contract (ADVICE r13): the result is an EAGER
    ``localCheckpoint`` (the scoped conf is read at execution time, so
    the plan must run inside the scope). Two consequences the caller
    owns: (1) the checkpoint blocks stay in the storage pool until the
    returned DataFrame is dropped and the async ContextCleaner
    reclaims the JVM RDD -- a long-lived session invoking this
    repeatedly while holding references should call
    ``session.release_block_pool`` between invocations (bench.py
    clears the pool between entries; the oracle/cluster harnesses run
    each entry once); (2) localCheckpoint is NON-RELIABLE -- blocks
    live on executors, so losing an executor after the scope closes
    makes the returned DataFrame unrecomputable. Consume it promptly;
    a caller that must survive executor loss should persist the result
    (write, or ``sc.setCheckpointDir`` + reliable ``checkpoint()``)
    rather than hold this handle -- the closed-form witnesses
    (tools/closed_form_scale.py) aggregate it in the same job for
    exactly this reason."""
    from ..session import scoped_conf

    register_views(spark, sf_dir, ("orders",))
    # Row budget: the recursion emits each order exactly once across
    # all frontier expansions, so ~n_orders rows total. The engine's
    # default 1M cteRecursionRowLimit is a fixed data-size guard that
    # broke at sf1.0 (round 12); rather than weakening it engine-wide
    # (ADVICE r12), size the cap from the actual input -- it scales
    # with the data by construction -- and scope it to this plan. The
    # count() is a bounded scalar job; the plan is materialized inside
    # the scope because the conf is read at execution time.
    n_orders = spark.table("orders").count()
    cap = max(1_000_000, 4 * n_orders)
    with scoped_conf(spark, "spark.sql.cteRecursionRowLimit", str(cap)):
        return spark.sql(_ORDER_CHAIN_SQL).localCheckpoint(eager=True)
