"""POS-pipeline-shaped query inventory: the reference's dataflow
operators (SURVEY.md §2.1) re-expressed over the test tables so the
DuckDB oracle can check them -- fixed-width parse (O4), record combine
(O5), retention delete (O12), filename/date scalar work (O17-O19), plus
the event-stream batch analogs (windows, sessionization, keyed dedup).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from ..operators.combine import combine_records
from ..operators.fixedwidth import FixedWidthField, fixed_width_record, parse_fixed_width
from ..operators.retention import retention_filter
from ._helpers import dsum, sql_dsum
from .registry import query

# ---------------------------------------------------------------------------
# Event-time operators (batch analogs of the streaming tier)
# ---------------------------------------------------------------------------


@query(
    "q36_hourly_events",
    oracle=f"""
SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
""",
    tags=("events", "window_agg"),
)
def q36_hourly_events(spark, sf_dir):
    """Tumbling-window aggregate (batch form of the streaming hourly job)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q37_retention_filter",
    oracle="""
SELECT event_type, COUNT(*) AS n_kept, MIN(ts) AS min_ts, MAX(ts) AS max_ts
FROM events
WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 4 DAY
GROUP BY event_type
""",
    tags=("retention", "filter"),
)
def q37_retention_filter(spark, sf_dir):
    """The reference's 4-day retention DELETE (daily_cleanup.py:19-38) as
    a partition-prunable filter; 'now' anchored to max(ts) for
    determinism."""
    ev = load_table(spark, sf_dir, "events")
    return retention_filter(ev, "ts", keep_days=4).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


# ---------------------------------------------------------------------------
# Fixed-width record operators (O4/O5/O17)
# ---------------------------------------------------------------------------

# A 26-char record synthesized from lineitem (orderkey 12 | linenumber 4 |
# returnflag 1 | linestatus 1 | shipdate yyyyMMdd 8) -- same shape as the
# reference's 520-char R520 records, scaled down.
_REC_SQL = (
    "LPAD(CAST(l_orderkey AS VARCHAR), 12, '0')"
    " || LPAD(CAST(l_linenumber AS VARCHAR), 4, '0')"
    " || l_returnflag || l_linestatus"
    " || STRFTIME(l_shipdate, '%Y%m%d')"
)

_REC_FIELDS = [
    FixedWidthField("orderkey", 1, 12, "long"),
    FixedWidthField("linenumber", 13, 4, "long"),
    FixedWidthField("returnflag", 17, 1),
    FixedWidthField("linestatus", 18, 1),
    FixedWidthField("shipdate", 19, 8, "date:yyyyMMdd"),
]


def _records_df(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rec = fixed_width_record(
        [
            F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
            F.lpad(F.col("l_linenumber").cast("string"), 4, "0"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.date_format("l_shipdate", "yyyyMMdd"),
        ]
    )
    return li.select(rec.alias("rec"))


@query(
    "q38_fixed_width_parse",
    oracle=f"""
WITH rec AS (SELECT {_REC_SQL} AS rec FROM lineitem),
parsed AS (
  SELECT CAST(SUBSTRING(rec, 1, 12) AS BIGINT) AS orderkey,
         CAST(SUBSTRING(rec, 13, 4) AS BIGINT) AS linenumber,
         SUBSTRING(rec, 17, 1) AS returnflag,
         SUBSTRING(rec, 18, 1) AS linestatus,
         CAST(STRPTIME(SUBSTRING(rec, 19, 8), '%Y%m%d') AS DATE) AS shipdate
  FROM rec)
SELECT returnflag, linestatus, COUNT(*) AS n_records,
       CAST(SUM(orderkey) AS BIGINT) AS sum_orderkey,
       MIN(shipdate) AS first_ship, MAX(shipdate) AS last_ship
FROM parsed GROUP BY returnflag, linestatus
""",
    tags=("fixedwidth", "parse"),
)
def q38_fixed_width_parse(spark, sf_dir):
    """O4 roundtrip: pack lineitem into fixed-width records, parse back
    with the declarative field spec, aggregate the typed columns."""
    parsed = parse_fixed_width(_records_df(spark, sf_dir), "rec", _REC_FIELDS)
    return parsed.groupBy("returnflag", "linestatus").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("orderkey").alias("sum_orderkey"),
        F.min("shipdate").alias("first_ship"),
        F.max("shipdate").alias("last_ship"),
    )


@query(
    "q39_combine_chunks",
    oracle=f"""
WITH rec AS (
  SELECT {_REC_SQL} AS rec,
         ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS seq
  FROM lineitem)
SELECT CAST(seq // 1000 AS BIGINT) AS group_id,
       md5(STRING_AGG(rec, '' ORDER BY seq)) AS chunk_md5,
       COUNT(*) AS n_records,
       CAST(SUM(LENGTH(rec)) AS BIGINT) AS chunk_len
FROM rec GROUP BY 1
""",
    tags=("fixedwidth", "combine"),
)
def q39_combine_chunks(spark, sf_dir):
    """O5 parity: 1000 consecutive records -> one combined row, checked
    by md5 of the order-preserving concatenation."""
    li = load_table(spark, sf_dir, "lineitem")
    rec = fixed_width_record(
        [
            F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
            F.lpad(F.col("l_linenumber").cast("string"), 4, "0"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.date_format("l_shipdate", "yyyyMMdd"),
        ]
    )
    recs = li.select(rec.alias("rec"), "l_orderkey", "l_linenumber")
    combined = combine_records(
        recs, "rec", ["l_orderkey", "l_linenumber"], n=1000, out_col="combined"
    )
    return combined.select(
        F.col("group_id").cast("long").alias("group_id"),
        F.md5("combined").alias("chunk_md5"),
        "n_records",
        F.length("combined").cast("long").alias("chunk_len"),
    )


# ---------------------------------------------------------------------------
# Sessionization + keyed dedup (stateful-op batch analogs)
# ---------------------------------------------------------------------------


@query(
    "q40_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions GROUP BY user_id, session_id
""",
    tags=("events", "session"),
)
def q40_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (30-min inactivity gap) -- the
    batch-checkable analog of session_window in the streaming tier."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(cum).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "q41_latest_event",
    oracle="""
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT user_id, event_type, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
""",
    tags=("events", "dedup", "keyed"),
)
def q41_latest_event(spark, sf_dir):
    """Keyed dedup keeping the latest row -- deterministic alternative to
    dropDuplicates (which keeps an arbitrary row under shuffles)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )
