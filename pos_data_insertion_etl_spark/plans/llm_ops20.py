"""Round-8 batch Q (q259-q261): sequential drift, monotone trend, and
categorical association -- the last three panels of the round's
monitoring console.

* q259 -- Page-Hinkley upward-drift score over daily event volume
  (operators/stats.page_hinkley): tests against the RUNNING mean (no
  global pre-pass, online-capable), same prefix-min identity as q239.
* q260 -- Mann-Kendall monotone-trend S over daily order counts
  (operators/stats.mann_kendall): exact pair-sign sums over the
  bounded days^2 self-join.
* q261 -- Cramer's V association between document source and language
  (operators/stats.cramers_v): per-cell chi-square terms in micro
  fixed point, never a float sum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_PH_DELTA_MILLI = 200

# ---------------------------------------------------------------------------
# q259: Page-Hinkley drift over daily event volume
# ---------------------------------------------------------------------------

_PH_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), seq AS (
  SELECT day, n,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
         SUM(n) OVER w AS p
  FROM daily
  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
), terms AS (
  SELECT day, n,
         CAST(p * 1000 // t AS BIGINT) AS mean_milli,
         n * 1000 - (p * 1000 // t) - {_PH_DELTA_MILLI} AS term
  FROM seq
), msum AS (
  SELECT day, n, mean_milli, SUM(term) OVER w AS m
  FROM terms
  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
), mmin AS (
  SELECT day, n, mean_milli, m, MIN(m) OVER w AS m_min
  FROM msum
  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
)
SELECT day, n, mean_milli, CAST(m - m_min AS BIGINT) AS ph_milli
FROM mmin
"""


@query(
    "q259_page_hinkley",
    oracle=_PH_ORACLE,
    tags=("stats", "drift", "monitoring"),
)
def q259_page_hinkley(spark, sf_dir):
    """Page-Hinkley upward-drift chart over daily event volume
    (operators/stats.page_hinkley): deviations against the RUNNING
    milli-mean with a 200-milli allowance, collapsed to PH_t through
    the q239 prefix-min identity -- window-only, online-capable."""
    from ..operators.stats import page_hinkley

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return page_hinkley(daily, "day", "n", delta_milli=_PH_DELTA_MILLI)


# ---------------------------------------------------------------------------
# q260: Mann-Kendall trend over daily order counts
# ---------------------------------------------------------------------------

_MK_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
), pairs AS (
  SELECT a.x AS xi, b.x AS xj
  FROM daily a JOIN daily b ON a.d < b.d
), agg AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN xj > xi THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_pos,
         CAST(COALESCE(SUM(CASE WHEN xj < xi THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_neg,
         CAST(COALESCE(SUM(CASE WHEN xj = xi THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_tie
  FROM pairs
), counts AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
)
SELECT n_days, n_pos, n_neg, n_tie,
       CAST(n_pos - n_neg AS BIGINT) AS s
FROM agg CROSS JOIN counts
"""


@query(
    "q260_mann_kendall",
    oracle=_MK_ORACLE,
    tags=("stats", "trend", "monitoring"),
)
def q260_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotone-trend statistic over daily order counts
    (operators/stats.mann_kendall): exact pair-sign sums over the
    bounded days^2 theta self-join; n_days from a direct series
    count (the pair-count inversion cannot tell 0 days from 1)."""
    from ..operators.stats import mann_kendall

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return mann_kendall(daily, "day", "n")


# ---------------------------------------------------------------------------
# q261: Cramer's V, source x language association
# ---------------------------------------------------------------------------

_CRAMER_ORACLE = """
WITH cells AS (
  SELECT source AS a, lang AS b, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2
), ram AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY a),
cbm AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY b),
tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS c
  FROM cells
), fcells AS (
  -- the FULL r x c cross: absent cells contribute (0-e)^2/e = e
  SELECT ram.a, cbm.b, ram.ra, cbm.cb,
         CAST(COALESCE(cells.o, 0) AS BIGINT) AS o
  FROM ram CROSS JOIN cbm
  LEFT JOIN cells ON cells.a = ram.a AND cells.b = cbm.b
), terms AS (
  SELECT tot.n, tot.r, tot.c,
         CAST(round(CAST(fcells.o * tot.n - fcells.ra * fcells.cb AS DOUBLE)
                    * CAST(fcells.o * tot.n - fcells.ra * fcells.cb AS DOUBLE)
                    / CAST(fcells.ra * fcells.cb AS DOUBLE)
                    / CAST(tot.n AS DOUBLE)
                    * 1000000) AS BIGINT) AS t
  FROM fcells CROSS JOIN tot
)
SELECT n, r, c,
       CAST(SUM(t) AS BIGINT) AS chi2_micro,
       sqrt(CAST(SUM(t) AS DOUBLE) / 1000000.0
            / CAST(n * LEAST(r - 1, c - 1) AS DOUBLE)) AS v
FROM terms GROUP BY n, r, c
"""


@query(
    "q261_cramers_v",
    oracle=_CRAMER_ORACLE,
    tags=("stats", "association", "eval"),
)
def q261_cramers_v(spark, sf_dir):
    """Cramer's V association strength between document source and
    language (operators/stats.cramers_v): per-cell chi-square terms
    computed in one fixed double sequence over exact integers and
    rounded to micro units, so the SUM is integer-exact; V is one
    closed-form double -- the effect-size panel next to q214's
    chi-square screen and q248's kappa."""
    from ..operators.stats import cramers_v

    docs = load_table(spark, sf_dir, "documents")
    return cramers_v(docs, "source", "lang")
