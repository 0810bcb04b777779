"""Round-8 batch L (q232-q239): the exact-statistics suite --
distribution monitoring and analytics every large-scale data pipeline
runs next to curation, each with a full DuckDB oracle.

* q232 -- exact two-sample KS D between source length distributions
  (operators/stats.ks_two_sample): distinct-value running counts, the
  integer numerator over n_a*n_b.
* q233 -- tie-corrected Spearman rho between daily order volume and
  daily revenue (operators/stats.spearman_corr): doubled average
  ranks keep everything in BIGINT until one closed-form double.
* q234 -- Gini concentration of customer revenue
  (operators/stats.gini_coefficient): two-phase global sequence, the
  (2i-n-1)*x weighted sum in exact integers.
* q235 -- per-returnflag OLS of extended price (cents) on quantity
  (operators/stats.grouped_ols): regression as one aggregation.
* q236 -- strict-dominance Pareto skyline over parts (price cents
  down, size up) (operators/stats.pareto_frontier): RANGE-frame
  running max, join-free.
* q237 -- RFM quintile segmentation (operators/stats.rfm_segments):
  three exact scale-safe NTILEs over the customer aggregate.
* q238 -- lagged daily-order autocorrelation
  (operators/stats.acf_pearson): calendar-offset pairing, exact sums.
* q239 -- two-sided CUSUM drift over daily event volume
  (operators/stats.cusum_scores): the prefix-min identity turns the
  recursive chart into two running aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_KS_A, _KS_B = "src0", "src1"
_ACF_MAX_LAG = 7
_CUSUM_SLACK_MILLI = 500
_RFM_ANCHOR = "2001-09-01"  # pinned: just past max(o_orderdate)

# ---------------------------------------------------------------------------
# q232: exact KS two-sample
# ---------------------------------------------------------------------------

_KS_ORACLE = f"""
WITH tagged AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
         CASE WHEN source = '{_KS_A}' THEN 1 ELSE 0 END AS ia,
         CASE WHEN source = '{_KS_B}' THEN 1 ELSE 0 END AS ib
  FROM documents WHERE source IN ('{_KS_A}', '{_KS_B}')
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
    "q232_ks_two_sample",
    oracle=_KS_ORACLE,
    tags=("stats", "drift", "monitoring"),
)
def q232_ks_two_sample(spark, sf_dir):
    """Exact Kolmogorov-Smirnov D between src0 and src1 document-length
    distributions (operators/stats.ks_two_sample) -- the standard "did
    this source's distribution shift" gate, evaluated at every distinct
    pooled value with an integer numerator."""
    from ..operators.stats import ks_two_sample

    docs = load_table(spark, sf_dir, "documents")
    return ks_two_sample(docs, "n_chars", "source", _KS_A, _KS_B)


# ---------------------------------------------------------------------------
# q233: Spearman rho, daily volume vs revenue
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
  FROM orders GROUP BY 1
), ranked AS (
  SELECT
    CAST(2 * RANK() OVER (ORDER BY x)
         + COUNT(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
    CAST(2 * RANK() OVER (ORDER BY y)
         + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
  FROM daily
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy
  FROM ranked
)
SELECT n, CAST(n * sxy - sx * sy AS BIGINT) AS sxy_num,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho
FROM sums
"""


@query(
    "q233_spearman_daily",
    oracle=_SPEARMAN_ORACLE,
    tags=("stats", "correlation"),
)
def q233_spearman_daily(spark, sf_dir):
    """Tie-corrected Spearman rank correlation between daily order
    count and daily revenue cents (operators/stats.spearman_corr):
    doubled average ranks stay integer; rho is one closed-form double
    over six exact sums."""
    from ..operators.stats import spearman_corr

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("y"),
    )
    return spearman_corr(daily, "x", "y")


# ---------------------------------------------------------------------------
# q234: Gini concentration of customer revenue
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
), seq AS (
  SELECT cents AS x,
         CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
  FROM per_cust
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seq)
SELECT n, CAST(SUM(x) AS BIGINT) AS total,
       CAST(SUM((2 * i - n - 1) * x) AS BIGINT) AS gini_num,
       CAST(SUM((2 * i - n - 1) * x) AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) AS gini
FROM seq CROSS JOIN tot
GROUP BY n
"""


@query(
    "q234_gini_revenue",
    oracle=_GINI_ORACLE,
    tags=("stats", "concentration", "analytics"),
)
def q234_gini_revenue(spark, sf_dir):
    """Gini coefficient of per-customer revenue (operators/stats.
    gini_coefficient): how concentrated spend is across customers --
    in corpus terms, how concentrated the corpus is on few domains.
    Exact cents, two-phase global sequence, integer weighted sum."""
    from ..operators.stats import gini_coefficient

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    return gini_coefficient(per_cust, "cents", "o_custkey")


# ---------------------------------------------------------------------------
# q235: grouped OLS, price-on-quantity per returnflag
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS grp,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,2))) AS BIGINT) AS y
  FROM lineitem
), sums AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM base GROUP BY grp
), d AS (
  -- derived stats in DOUBLE: cast-then-multiply, the same IEEE step
  -- order as the Spark side (n*Syy and Sy^2 overflow int64)
  SELECT grp, n, sx, sy, sxy, sxx, syy,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS fnum,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS fdx,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS fdy
  FROM sums
)
SELECT grp, n, sx, sy, sxy, sxx, syy,
       fnum / NULLIF(fdx, 0.0) AS slope,
       (CAST(sy AS DOUBLE) - (fnum / NULLIF(fdx, 0.0))
          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
       fnum * fnum / NULLIF(fdx * fdy, 0.0) AS r2
FROM d
"""


@query(
    "q235_grouped_ols",
    oracle=_OLS_ORACLE,
    tags=("stats", "regression", "analytics"),
)
def q235_grouped_ols(spark, sf_dir):
    """Per-returnflag OLS of extended price (floor dollars -- the
    coarsest exact unit that keeps sum(y^2) in int64 at billion-row
    groups) on quantity (operators/stats.grouped_ols): regression as
    one aggregation -- six exact integer sums per group,
    slope/intercept/R^2 as cast-then-multiply doubles over them."""
    from ..operators.stats import grouped_ols

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("long")
        .alias("dollars"),
    )
    return grouped_ols(li, "qty", "dollars", "l_returnflag")


# ---------------------------------------------------------------------------
# q236: Pareto skyline over parts
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH base AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         CAST(p_size AS BIGINT) AS g
  FROM part
), scored AS (
  SELECT p_partkey, c, g,
         MAX(g) OVER (ORDER BY c
                      RANGE BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS best_cheaper_gain
  FROM base
)
SELECT p_partkey, c AS cost, g AS gain, best_cheaper_gain
FROM scored
WHERE best_cheaper_gain IS NULL OR best_cheaper_gain <= g
"""


@query(
    "q236_pareto_frontier",
    oracle=_SKYLINE_ORACLE,
    tags=("stats", "skyline", "analytics"),
)
def q236_pareto_frontier(spark, sf_dir):
    """Strict-dominance Pareto skyline over parts -- minimize retail
    price (cents), maximize size (operators/stats.pareto_frontier):
    the O(n log n) join-free RANGE-frame form of "which configs are
    not strictly beaten"."""
    from ..operators.stats import pareto_frontier

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    return pareto_frontier(part, "price_cents", "size", "p_partkey")


# ---------------------------------------------------------------------------
# q237: RFM segmentation
# ---------------------------------------------------------------------------

_RFM_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         CAST(DATE '{_RFM_ANCHOR}' - MAX(CAST(o_orderdate AS DATE))
              AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey
), binned AS (
  SELECT *,
    CAST(NTILE(5) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_bin,
    CAST(NTILE(5) OVER (ORDER BY frequency, custkey) AS BIGINT) AS f_bin,
    CAST(NTILE(5) OVER (ORDER BY monetary_cents, custkey) AS BIGINT) AS m_bin
  FROM per_cust
)
SELECT custkey, recency_days, frequency, monetary_cents,
       r_bin, f_bin, m_bin,
       CAST(r_bin * 100 + f_bin * 10 + m_bin AS BIGINT) AS segment
FROM binned
"""


@query(
    "q237_rfm_segments",
    oracle=_RFM_ORACLE,
    tags=("stats", "segmentation", "analytics"),
)
def q237_rfm_segments(spark, sf_dir):
    """RFM quintile segmentation of customers against a pinned anchor
    date (operators/stats.rfm_segments): three exact NTILEs via the
    two-phase global sequence over the customer aggregate -- never a
    single-partition window."""
    from ..operators.stats import rfm_segments

    orders = load_table(spark, sf_dir, "orders")
    return rfm_segments(orders, _RFM_ANCHOR)


# ---------------------------------------------------------------------------
# q238: lagged autocorrelation of daily order volume
# ---------------------------------------------------------------------------

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
), paired AS (
  SELECT l.lag, a.x AS x0, b.x AS x1
  FROM daily a
  CROSS JOIN (SELECT CAST(i AS BIGINT) AS lag
              FROM range(1, {_ACF_MAX_LAG} + 1) t(i)) l
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
), sums AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x0) AS BIGINT) AS sx, CAST(SUM(x1) AS BIGINT) AS sy,
         CAST(SUM(x0 * x1) AS BIGINT) AS sxy,
         CAST(SUM(x0 * x0) AS BIGINT) AS sxx,
         CAST(SUM(x1 * x1) AS BIGINT) AS syy
  FROM paired GROUP BY lag
)
SELECT lag, n_pairs,
       CAST(n_pairs * sxy - sx * sy AS BIGINT) AS sxy_num,
       (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r
FROM sums
"""


@query(
    "q238_acf_daily",
    oracle=_ACF_ORACLE,
    tags=("stats", "timeseries", "monitoring"),
)
def q238_acf_daily(spark, sf_dir):
    """Autocorrelation of daily order counts at lags 1..7
    (operators/stats.acf_pearson): calendar-offset pairing (gap-aware),
    exact integer sums, one closed-form double per lag -- the weekly
    periodicity detector next to q216's day-of-week seasonality."""
    from ..operators.stats import acf_pearson

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return acf_pearson(daily, "day", "n", max_lag=_ACF_MAX_LAG)


# ---------------------------------------------------------------------------
# q239: two-sided CUSUM drift over daily event volume
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS d
  FROM daily
), dev AS (
  SELECT day, n,
         CAST(n * 1000 - (t * 1000 // d) AS BIGINT) AS dev_milli
  FROM daily CROSS JOIN tot
), prefix AS (
  SELECT day, n, dev_milli,
         SUM(dev_milli - {_CUSUM_SLACK_MILLI}) OVER w AS pp,
         SUM(dev_milli + {_CUSUM_SLACK_MILLI}) OVER w AS pn
  FROM dev
  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
), extrema AS (
  SELECT day, n, dev_milli, pp, pn,
         MIN(pp) OVER w AS pp_min,
         MAX(pn) OVER w AS pn_max
  FROM prefix
  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
)
SELECT day, n, dev_milli,
       CAST(pp - LEAST(CAST(0 AS BIGINT), pp_min) AS BIGINT)
         AS cusum_pos_milli,
       CAST(GREATEST(CAST(0 AS BIGINT), pn_max) - pn AS BIGINT)
         AS cusum_neg_milli
FROM extrema
"""


@query(
    "q239_cusum_drift",
    oracle=_CUSUM_ORACLE,
    tags=("stats", "drift", "monitoring"),
)
def q239_cusum_drift(spark, sf_dir):
    """Two-sided CUSUM drift chart over daily event volume
    (operators/stats.cusum_scores): the recursive chart rewritten as
    prefix-sum minus running prefix-min -- window-only, exact milli
    fixed point, 500-milli slack per side."""
    from ..operators.stats import cusum_scores

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return cusum_scores(daily, "day", "n", slack_milli=_CUSUM_SLACK_MILLI)
