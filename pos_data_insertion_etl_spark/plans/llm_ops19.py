"""Round-8 batch P (q255-q258): the concentration & diversity suite --
Theil inequality, Herfindahl concentration, top-k share curve points,
Shannon source diversity. Together with q234's Gini these are the
standard answers to "how dominated is this corpus by few
domains/customers", each in the exact-integer + single-IEEE contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_TOPK_KS = (10, 100)

# Shared CTE: per-customer revenue in exact floor dollars (the unit
# that keeps sum(x^2) inside BIGINT for HHI at any realistic scale).
_PER_CUST_DOLLARS = """
per_cust AS (
  SELECT o_custkey,
         CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) AS BIGINT)
           AS dollars
  FROM orders GROUP BY o_custkey
)
"""

# ---------------------------------------------------------------------------
# q255: Theil T inequality of customer revenue
# ---------------------------------------------------------------------------

_THEIL_ORACLE = f"""
WITH {_PER_CUST_DOLLARS},
vals AS (SELECT dollars AS x FROM per_cust WHERE dollars > 0),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS total
  FROM vals
)
SELECT n, total,
       CAST(SUM(x * CAST(round(ln(CAST(x * n AS DOUBLE)
                                  / CAST(total AS DOUBLE))
                               * 1000000000) AS BIGINT)) // total
            AS BIGINT) AS theil_nano
FROM vals CROSS JOIN tot
GROUP BY n, total
"""


@query(
    "q255_theil_index",
    oracle=_THEIL_ORACLE,
    tags=("stats", "concentration", "analytics"),
)
def q255_theil_index(spark, sf_dir):
    """Theil T inequality of per-customer revenue (operators/stats.
    theil_index): the entropy-based, subgroup-decomposable complement
    to q234's Gini -- nano fixed-point log-ratios, integer weighted
    sum, one truncating div."""
    from ..operators.stats import theil_index

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("long")
        .alias("dollars")
    )
    return theil_index(per_cust, "dollars")


# ---------------------------------------------------------------------------
# q256: Herfindahl-Hirschman concentration
# ---------------------------------------------------------------------------

_HHI_ORACLE = f"""
WITH {_PER_CUST_DOLLARS},
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dollars) AS BIGINT) AS total,
         CAST(SUM(dollars * dollars) AS BIGINT) AS sum_sq
  FROM per_cust WHERE dollars > 0
)
SELECT n, total, sum_sq,
       CAST(((sum_sq // NULLIF(total, 0)) * 1000000) // NULLIF(total, 0)
            AS BIGINT) AS hhi_ppm,
       CAST(sum_sq AS DOUBLE)
         / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) AS hhi
FROM agg
"""


@query(
    "q256_herfindahl",
    oracle=_HHI_ORACLE,
    tags=("stats", "concentration", "analytics"),
)
def q256_herfindahl(spark, sf_dir):
    """Herfindahl-Hirschman concentration of customer revenue
    (operators/stats.herfindahl_index): sum of squared shares -- 1/n
    uniform, 1.0 monopoly; floor dollars keep sum(x^2) exact in
    BIGINT; the double form is one fixed-order expression mirrored in
    the oracle."""
    from ..operators.stats import herfindahl_index

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("long")
        .alias("dollars")
    )
    return herfindahl_index(per_cust, "dollars")


# ---------------------------------------------------------------------------
# q257: top-k revenue share curve points
# ---------------------------------------------------------------------------

_TOPK_ORACLE = f"""
WITH {_PER_CUST_DOLLARS},
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
         CAST(SUM(dollars) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS topk_value,
         CAST(SUM(dollars) OVER () AS BIGINT) AS total
  FROM per_cust
  WINDOW w AS (ORDER BY dollars DESC, o_custkey)
)
SELECT k, topk_value, total,
       CAST(topk_value * 1000000 // total AS BIGINT) AS share_ppm
FROM ranked WHERE k IN {_TOPK_KS}
"""


@query(
    "q257_topk_share",
    oracle=_TOPK_ORACLE,
    tags=("stats", "concentration", "analytics"),
)
def q257_topk_share(spark, sf_dir):
    """Concentration-curve points: the revenue share held by the top
    10 and top 100 customers (operators/stats.topk_share) -- rank,
    running and full totals from ONE window pass over the customer
    aggregate (the q232 idiom)."""
    from ..operators.stats import topk_share

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .cast("long")
        .alias("dollars")
    )
    return topk_share(per_cust, "dollars", "o_custkey", ks=_TOPK_KS)


# ---------------------------------------------------------------------------
# q258: Shannon diversity of document sources
# ---------------------------------------------------------------------------

_SHARE_ENTROPY_ORACLE = """
WITH counts AS (
  SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(c) AS BIGINT) AS n_rows
  FROM counts
)
SELECT n_groups, n_rows,
       CAST(-(SUM(c * CAST(round(ln(CAST(c AS DOUBLE)
                                    / CAST(n_rows AS DOUBLE))
                                 * 1000000000) AS BIGINT)) // n_rows)
            AS BIGINT) AS entropy_nano
FROM counts CROSS JOIN tot
GROUP BY n_groups, n_rows
"""


@query(
    "q258_source_diversity",
    oracle=_SHARE_ENTROPY_ORACLE,
    tags=("stats", "diversity", "curation"),
)
def q258_source_diversity(spark, sf_dir):
    """Shannon diversity of document-source shares (operators/stats.
    share_entropy): ln(n_sources) for a uniform mix, 0 for a single
    source -- the diversity dial next to q256's concentration dial,
    in the q129 fixed-point ln convention."""
    from ..operators.stats import share_entropy

    docs = load_table(spark, sf_dir, "documents")
    return share_entropy(docs, "source")
