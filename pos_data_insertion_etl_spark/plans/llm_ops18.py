"""Round-8 batch O (q251-q253): ranking agreement and robust-center
statistics -- RBO between two rankers, exact weighted medians, Tukey
IQR outlier fences.

* q251 -- truncated rank-biased overlap between frequency- and
  monetary-ranked customer top-20s (operators/scoring.
  rank_biased_overlap): exact rational depth weights (p = 9/10).
* q252 -- per-returnflag weighted median of quantity weighted by
  exact price cents (operators/stats.weighted_median): the running
  half-weight threshold over the collapsed value domain.
* q253 -- per-source Tukey fences + outlier counts over n_chars
  (operators/stats.iqr_outlier_fences): Spark `percentile` <-> DuckDB
  `quantile_cont`, the q45-proven exact pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_RBO_K = 20
_RBO_P_NUM, _RBO_P_DEN = 9, 10

# Exact rational depth weights as shared literals: both engines read
# the SAME integers (DuckDB's power() goes through doubles and loses
# exactness past 2^53 -- 9^19 ~ 1.35e18 -- so neither side computes
# the powers at query time).
_RBO_WEIGHTS = [
    (d, (_RBO_P_NUM ** (d - 1)) * 1_000_000 // (_RBO_P_DEN ** (d - 1)))
    for d in range(1, _RBO_K + 1)
]
_RBO_VALUES = ", ".join(f"({d}, {w})" for d, w in _RBO_WEIGHTS)

# ---------------------------------------------------------------------------
# q251: rank-biased overlap, frequency vs monetary customer rankings
# ---------------------------------------------------------------------------

_RBO_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS monetary
  FROM orders GROUP BY o_custkey
), ra AS (
  SELECT custkey, CAST(ROW_NUMBER() OVER
           (ORDER BY frequency DESC, custkey) AS BIGINT) AS r
  FROM per_cust
), rb AS (
  SELECT custkey, CAST(ROW_NUMBER() OVER
           (ORDER BY monetary DESC, custkey) AS BIGINT) AS r
  FROM per_cust
), joint AS (
  SELECT GREATEST(ra.r, rb.r) AS m
  FROM ra JOIN rb USING (custkey)
  WHERE ra.r <= {_RBO_K} AND rb.r <= {_RBO_K}
), per_m AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM joint GROUP BY m
), depths(d, w_fp) AS (VALUES {_RBO_VALUES}),
terms AS (
  SELECT d.d, d.w_fp,
         CAST(COALESCE(SUM(p.c), 0) AS BIGINT) AS x_d
  FROM depths d LEFT JOIN per_m p ON p.m <= d.d
  GROUP BY d.d, d.w_fp
)
SELECT CAST({_RBO_K} AS BIGINT) AS k,
       CAST(MAX(CASE WHEN d = {_RBO_K} THEN x_d END) AS BIGINT) AS n_joint,
       CAST((SUM(w_fp * x_d // d) * {_RBO_P_DEN - _RBO_P_NUM})
            // {_RBO_P_DEN} AS BIGINT) AS rbo_ppm
FROM terms
"""


@query(
    "q251_rbo_rankings",
    oracle=_RBO_ORACLE,
    tags=("eval", "ranking", "stats"),
)
def q251_rbo_rankings(spark, sf_dir):
    """Truncated rank-biased overlap (p = 9/10, k = 20) between
    customers ranked by order frequency vs by exact monetary cents
    (operators/scoring.rank_biased_overlap) -- the top-weighted
    ranker-agreement measure next to q191's RRF fusion: exact rational
    depth weights shared as literals, one running overlap count, all
    truncating integer divs."""
    from pyspark.sql.window import Window as W

    from ..operators.scoring import rank_biased_overlap

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(
        F.col("o_custkey").alias("custkey")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("frequency"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("monetary"),
    )
    ra = per_cust.select(
        "custkey",
        F.row_number()
        .over(W.orderBy(F.desc("frequency"), F.col("custkey")))
        .cast("long")
        .alias("rank"),
    )
    rb = per_cust.select(
        "custkey",
        F.row_number()
        .over(W.orderBy(F.desc("monetary"), F.col("custkey")))
        .cast("long")
        .alias("rank"),
    )
    return rank_biased_overlap(
        ra, rb, "custkey", k=_RBO_K, p_num=_RBO_P_NUM, p_den=_RBO_P_DEN
    )


# ---------------------------------------------------------------------------
# q252: weighted median quantity per returnflag
# ---------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH pv AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS v,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
), run AS (
  SELECT grp, v,
         SUM(w) OVER (PARTITION BY grp ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(SUM(w) OVER (PARTITION BY grp) AS BIGINT) AS total_weight
  FROM pv
)
SELECT grp, total_weight,
       CAST(MIN(v) AS BIGINT) AS median_value
FROM run WHERE 2 * cum >= total_weight
GROUP BY grp, total_weight
"""


@query(
    "q252_weighted_median",
    oracle=_WMEDIAN_ORACLE,
    tags=("stats", "agg", "robust"),
)
def q252_weighted_median(spark, sf_dir):
    """Exact lower weighted median of quantity per returnflag, weighted
    by exact price cents (operators/stats.weighted_median): the value
    domain collapses in the first groupBy, then one keyed window emits
    running and total weight in a single pass -- the revenue-weighted
    'typical order size'."""
    from ..operators.stats import weighted_median

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    return weighted_median(li, "qty", "cents", "l_returnflag")


# ---------------------------------------------------------------------------
# q253: Tukey IQR outlier fences over document lengths
# ---------------------------------------------------------------------------

_IQR_ORACLE = """
WITH quarts AS (
  SELECT source AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         quantile_cont(n_chars, 0.25) AS q1,
         quantile_cont(n_chars, 0.75) AS q3
  FROM documents GROUP BY source
), fenced AS (
  SELECT grp, n, q1, q3,
         q1 - (CAST(1500 AS DOUBLE) / 1000.0) * (q3 - q1) AS lo,
         q3 + (CAST(1500 AS DOUBLE) / 1000.0) * (q3 - q1) AS hi
  FROM quarts
)
SELECT f.grp, f.n, f.q1, f.q3, f.lo, f.hi,
       CAST(SUM(CASE WHEN CAST(d.n_chars AS DOUBLE) < f.lo
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN CAST(d.n_chars AS DOUBLE) > f.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM documents d JOIN fenced f ON f.grp = d.source
GROUP BY f.grp, f.n, f.q1, f.q3, f.lo, f.hi
"""


@query(
    "q253_iqr_outliers",
    oracle=_IQR_ORACLE,
    tags=("stats", "quality", "monitoring"),
)
def q253_iqr_outliers(spark, sf_dir):
    """Per-source Tukey fences (k = 1.5) and outlier counts over
    document length (operators/stats.iqr_outlier_fences): exact
    interpolated quartiles (Spark `percentile` <-> DuckDB
    `quantile_cont`, the q45-proven pair), fixed-order double fence
    arithmetic, tiny fence table broadcast back for the counting
    pass -- the boxplot monitor next to q205's MAD outliers."""
    from ..operators.stats import iqr_outlier_fences

    docs = load_table(spark, sf_dir, "documents")
    return iqr_outlier_fences(docs, "n_chars", "source")


# ---------------------------------------------------------------------------
# q254: streamed KS drift monitor, replay-certified (full oracle)
# ---------------------------------------------------------------------------

_KS_MONITOR_ORACLE = """
WITH tagged AS (
  SELECT CAST(floor(value * 1000) AS BIGINT) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
), per_value AS (
  SELECT v, CAST(SUM(ia) AS BIGINT) AS na_v, CAST(SUM(ib) AS BIGINT) AS nb_v
  FROM tagged GROUP BY v
), cum AS (
  SELECT SUM(na_v) OVER w AS cum_a, SUM(nb_v) OVER w AS cum_b
  FROM per_value
  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
), tot AS (
  SELECT CAST(SUM(ia) AS BIGINT) AS n_a, CAST(SUM(ib) AS BIGINT) AS n_b
  FROM tagged
), maxd AS (
  SELECT n_a, n_b,
         CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num
  FROM cum CROSS JOIN tot
  GROUP BY n_a, n_b
)
SELECT n_a, n_b, d_num,
       CAST(n_a * n_b AS BIGINT) AS d_denom,
       CAST(CASE WHEN n_a * n_b >= 1000000
                 THEN d_num // ((n_a * n_b) // 1000000)
                 ELSE (d_num * 1000000) // (n_a * n_b) END AS BIGINT)
         AS d_fp,
       CAST(d_num AS DOUBLE)
         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d
FROM maxd
"""


@query(
    "q254_ks_monitor_replay",
    oracle=_KS_MONITOR_ORACLE,
    tags=("streaming", "stats", "drift", "monitor"),
)
def q254_ks_monitor_replay(spark, sf_dir):
    """The q232 KS statistic as a STREAMED drift monitor with the
    monitor-store replay contract (the q175/q176/q211/q218 family):
    three event micro-batches persist per-value count deltas for the
    click/view value distributions (streaming/jobs.ks_monitor_batch),
    one batch is REPLAYED (idempotent overwrite must not double-count),
    the store merges by plain addition, and the merged counts feed the
    single-pass KS tail (operators/stats.ks_from_value_counts).

    FULL oracle: per-value counts are a pure function of the multiset
    -- the monitor's final D must equal DuckDB's straight replay over
    all events, bit for bit. Values are floor(value*1000) -- floor on
    a double is exact on every input, no .5-boundary hazard."""
    import hashlib
    import os
    import tempfile

    from ..operators.stats import ks_from_value_counts
    from ..streaming.jobs import ks_monitor_batch, load_ks_counts

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
            "event_type",
            (F.crc32(F.col("event_id").cast("string")) % 3).alias("b"),
        )
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    store = os.path.join(tempfile.gettempdir(), f"graft_ks_monitor_{tag}")
    for bid in (0, 1, 2, 1):  # batch 1 replayed: absorbed, not doubled
        ks_monitor_batch(
            ev.filter(F.col("b") == bid),
            bid,
            store,
            "v_milli",
            "event_type",
            "click",
            "view",
        )
    return ks_from_value_counts(load_ks_counts(spark, store))
