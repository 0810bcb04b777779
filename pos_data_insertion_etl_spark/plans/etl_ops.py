"""Warehouse-ETL batch: declarative data-quality reporting, SCD Type 2
dimension building, and incremental rollup maintenance -- the three
operations a daily mart pipeline (the reference's workload shape) needs
beyond plain load-transform-write.

* q109: every quality rule compiled into ONE scan (adding a rule adds a
  column, not a pass) + referential orphan counts via anti join.
* q110: SCD2 validity intervals from an event stream -- collapse no-op
  updates, then one LEAD window per entity. No self-join; one shuffle
  on the entity key.
* q111: incremental rollup whose ORACLE is the full recompute -- the
  hash match is the algebraic-merge correctness proof.

Determinism rules as in plans/registry.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from ..operators.incremental import merge_rollups, partial_rollup
from ..operators.quality import quality_report
from ._helpers import dec
from .registry import query


@query(
    "q109_quality_report",
    oracle="""
SELECT 'qty_in_1_50' AS rule,
       CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       COUNT(*) AS n_rows
FROM lineitem
UNION ALL
SELECT 'discount_le_5pct',
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
FROM lineitem
UNION ALL
SELECT 'returnflag_domain',
       CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM lineitem
UNION ALL
SELECT 'shipdate_not_null',
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
FROM lineitem
UNION ALL
SELECT 'orderkey_in_orders',
       (SELECT COUNT(*) FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)),
       COUNT(*)
FROM lineitem
""",
    tags=("quality", "etl"),
)
def q109_quality_report(spark, sf_dir):
    """Data-quality report over lineitem: four scan rules in one pass
    (range, threshold, domain, nullness) plus a referential orphan count
    against orders (broadcast anti join). Long-form output so reports
    append uniformly (operators/quality.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    return quality_report(
        li,
        scan_rules=[
            ("qty_in_1_50", (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
            ("discount_le_5pct", F.col("l_discount") > 0.05),
            ("returnflag_domain", ~F.col("l_returnflag").isin("A", "N", "R")),
            ("shipdate_not_null", F.col("l_shipdate").isNull()),
        ],
        ref_rules=[
            ("orderkey_in_orders", F.col("l_orderkey") == F.col("o_orderkey"), o)
        ],
    )


@query(
    "q110_scd2_dimension",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type, ts AS valid_from,
       LEAD(ts) OVER w2 AS valid_to,
       (LEAD(ts) OVER w2 IS NULL) AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("scd2", "window", "etl"),
)
def q110_scd2_dimension(spark, sf_dir):
    """SCD Type 2 build: per-user event_type history as validity
    intervals. Stage 1 collapses consecutive no-op updates (LAG); stage
    2 assigns [valid_from, valid_to) via LEAD; the open interval is the
    current row. Both windows share the same partitioning, so the whole
    build is ONE shuffle on user_id; (ts, event_id) is a total order."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


@query(
    "q112_temporal_enrichment",
    oracle="""
SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
       (SELECT c.ts FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.value DESC LIMIT 1) AS last_click_ts,
       (SELECT c.value FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.value DESC LIMIT 1) AS last_click_value
FROM events p
WHERE p.event_type = 'purchase'
""",
    tags=("asof", "temporal", "etl"),
)
def q112_temporal_enrichment(spark, sf_dir):
    """Temporal (as-of) enrichment -- the canonical SCD2 consumer: each
    purchase picks up the user's most recent click state at or before
    its timestamp. Runs through operators/asof.py's union-and-carry
    plan: ONE shuffle on user_id, no range join, no per-key Python. The
    oracle's correlated LIMIT-1 subqueries order by (ts DESC, value
    DESC), matching the carry struct's (ts, value) total order for
    same-timestamp peers."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        carry={"click_ts": "last_click_ts", "click_value": "last_click_value"},
    )


@query(
    "q113_snapshot_diff",
    oracle="""
WITH new_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0
              THEN CAST(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(1.05 AS DECIMAL(4,2)) AS DOUBLE)
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000, o_totalprice
  FROM orders WHERE o_orderkey % 11 = 0
),
diff AS (
  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
              WHEN n.o_orderkey IS NULL THEN 'delete'
              WHEN o.o_totalprice <> n.o_totalprice THEN 'update'
              ELSE 'unchanged' END AS change_type,
         COALESCE(n.o_totalprice, o.o_totalprice) AS price
  FROM orders o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
)
SELECT change_type, COUNT(*) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM diff GROUP BY change_type
""",
    tags=("cdc", "diff", "etl"),
)
def q113_snapshot_diff(spark, sf_dir):
    """CDC GENERATION (the upsert's complement): diff two table
    snapshots into insert/update/delete/unchanged classes via one full
    outer join on the key -- the standard way to derive a change feed
    from systems that only hand you full dumps. One shuffle on the key;
    at 100 TB both snapshots bucket/partition on the same key so the
    diff co-locates."""
    old = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bumped = (dec("o_totalprice") * F.lit("1.05").cast("decimal(4,2)")).cast(
        "double"
    )
    new_snap = (
        old.filter(F.col("o_orderkey") % 13 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 7 == 0, bumped)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 11 == 0).select(
                (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    o = old.alias("o")
    n = new_snap.alias("n")
    diff = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer").select(
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .when(F.col("o.o_totalprice") != F.col("n.o_totalprice"), "update")
        .otherwise("unchanged")
        .alias("change_type"),
        F.coalesce(F.col("n.o_totalprice"), F.col("o.o_totalprice")).alias("price"),
    )
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec("price", 4)).cast("double").alias("total_price"),
    )


@query(
    "q114_funnel_conversion",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t1
    AND e.ts < s1.t1 + INTERVAL 6 HOUR
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
    AND e.ts < s2.t2 + INTERVAL 6 HOUR
  GROUP BY e.user_id
)
SELECT COUNT(*) AS n_signup,
       COUNT(s2.t2) AS n_signup_click,
       COUNT(s3.t3) AS n_full_funnel
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
""",
    tags=("funnel", "analytics", "etl"),
)
def q114_funnel_conversion(spark, sf_dir):
    """Ordered funnel (signup -> later click -> later purchase): each
    stage is a per-user MIN over events at-or-after the prior stage's
    entry time. Three aggregates + equi joins on user_id -- every join
    key is the same, so at scale the whole funnel co-locates under one
    partitioning; no window over the global event stream."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") < F.col("t1") + F.expr("INTERVAL 6 HOURS")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") < F.col("t2") + F.expr("INTERVAL 6 HOURS")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_signup"),
            F.count("t2").alias("n_signup_click"),
            F.count("t3").alias("n_full_funnel"),
        )
    )


@query(
    "q115_binned_range_join",
    oracle="""
WITH bands(lo, hi, band) AS (VALUES (0.0, 50.0, 'low'), (50.0, 120.0, 'mid'),
                                    (120.0, 1e18, 'high'))
SELECT band, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band, event_type
""",
    tags=("join", "range", "binned"),
)
def q115_binned_range_join(spark, sf_dir):
    """The both-sides-large range join (operators/rangejoin.py): same
    semantics as q42, but intervals replicate to overlapped bins and
    the join is a plain equi join on the bin -- no nested loop, no
    broadcast requirement, AQE-splittable. q42 keeps the broadcast
    non-equi plan as the small-interval-side fast path; this is the
    plan when the interval table is itself huge."""
    from ..operators.rangejoin import binned_range_join

    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 120.0, "mid"), (120.0, 1e18, "high")],
        "lo double, hi double, band string",
    )
    joined = binned_range_join(
        ev, "value", bands, "lo", "hi", bin_width=25.0
    )
    return joined.groupBy("band", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


@query(
    "q111_incremental_rollup",
    oracle="""
SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
       l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY 1, 2
""",
    tags=("incremental", "agg", "etl"),
)
def q111_incremental_rollup(spark, sf_dir):
    """Incremental rollup maintenance: history (shipdate < 2000-01-01)
    is pre-aggregated into stored partials; the 'new batch' (>= 2000)
    aggregates alone; merge = union + re-sum of algebraic measures
    (operators/incremental.py). The oracle aggregates the WHOLE table
    in one pass -- the hash match proves merge == full recompute, the
    invariant that lets a 100 TB mart pay only O(new day) per run."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("2000-01-01").cast("timestamp")
    keys = ["ship_month", "l_returnflag"]
    measures = {
        "n_rows": F.count(F.lit(1)),
        "sum_qty": F.sum(dec("l_quantity")),
        "sum_price": F.sum(dec("l_extendedprice")),
    }
    month = F.date_trunc("month", "l_shipdate").alias("ship_month")
    history = partial_rollup(
        li.filter(F.col("l_shipdate") < cutoff).select(month, "l_returnflag"
                                                       , "l_quantity", "l_extendedprice"),
        keys,
        measures,
    )
    new_batch = partial_rollup(
        li.filter(F.col("l_shipdate") >= cutoff).select(month, "l_returnflag",
                                                        "l_quantity", "l_extendedprice"),
        keys,
        measures,
    )
    merged = merge_rollups([history, new_batch], keys, list(measures))
    return merged.select(
        "ship_month",
        "l_returnflag",
        "n_rows",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
    )
