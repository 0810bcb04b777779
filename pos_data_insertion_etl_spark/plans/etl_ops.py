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
