"""Round-9 batch S (q267-q273): the mixture-oracle control twin plus
the six operators the round-8 snapshot commit landed without evidence
(VERDICT r8 item 3: "register and test the six snapshot operators").

* q267 -- budgeted-mixture control twin: the EXACT q131 operator call
  under a fresh name with the BIGINT-casted oracle (VERDICT r8 item 1
  belt-and-braces: new names go green on first driver exposure, so a
  green q267 beside a red q131 would isolate name-keyed driver state;
  both green retires the four-round HUGEINT skew for good).
* q268 -- Kaplan-Meier time-to-purchase over events
  (operators/survival.kaplan_meier): right-censored per-user
  durations, duration-domain risk table, fixed-point-ln curve.
* q269 -- one-way ANOVA of document length across sources
  (operators/stats.anova_oneway): exact integer moment sums, rounded
  milli correction terms, one F-ratio double chain.
* q270 -- per-source Wilson 95% intervals for the English share
  (operators/stats.wilson_intervals): one fixed-order IEEE chain per
  group row, micro fixed-point bounds.
* q271 -- Neyman-optimal sample allocation across sources
  (operators/stats.neyman_allocation): n_h*sigma_h milli weights via
  one exact sqrt per stratum, overflow-safe integer floor shares.
* q272 -- per-node local clustering coefficient of the bounded kNN
  graph (operators/graph.local_clustering_coefficient): q184's wedge
  join + closing semi-join, corner explode, ppm integer division.
* q273 -- isotonic (PAV) calibration of per-bin English rates against
  document length (operators/scoring.isotonic_calibrate_bins): the
  distributed max-min identity over B^2 interval means from prefix
  sums -- bin-domain-sized after the corpus collapses in one groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# ---------------------------------------------------------------------------
# q267: budgeted-mixture control twin (q131 under a fresh name)
# ---------------------------------------------------------------------------


def _mixture_oracle() -> str:
    from .llm_ops6 import _MIXTURE_ORACLE

    return _MIXTURE_ORACLE


@query(
    "q267_mixture_budget_v2",
    oracle=_mixture_oracle(),
    tags=("curation", "sampling", "mixture"),
)
def q267_mixture_budget_v2(spark, sf_dir):
    """Control twin of q131_mixture_budget_sample: the identical
    operators/mixture.budgeted_mixture_sample call and the identical
    BIGINT-casted oracle under a never-before-exposed name. Fresh
    names have gone driver-green on first exposure 98 consecutive
    times (r7-r8); if this twin goes green while q131 stays red, the
    residue is name-keyed driver state, not the query."""
    from ..operators.mixture import budgeted_mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    return budgeted_mixture_sample(
        docs,
        {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        total_tokens=10_000,
        size_col="n_chars",
    )


# ---------------------------------------------------------------------------
# q268: Kaplan-Meier time-to-purchase
# ---------------------------------------------------------------------------

#: Per-user right-censored duration fixture: days from first event to
#: first purchase (event=1), else to last observed event (censored).
_DURATIONS_CTE = """
per_user AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS d0,
         MIN(CASE WHEN event_type = 'purchase'
                  THEN CAST(ts AS DATE) END) AS d_ev,
         MAX(CAST(ts AS DATE)) AS d_last
  FROM events GROUP BY user_id
), durations AS (
  SELECT CAST(CASE WHEN d_ev IS NOT NULL
                   THEN date_diff('day', d0, d_ev)
                   ELSE date_diff('day', d0, d_last) END AS BIGINT)
             AS t_days,
         CAST(CASE WHEN d_ev IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_event
  FROM per_user
)"""

_KM_ORACLE = f"""
WITH {_DURATIONS_CTE},
per_t AS (
  SELECT t_days,
         CAST(SUM(is_event) AS BIGINT) AS n_event,
         CAST(SUM(1 - is_event) AS BIGINT) AS n_censor
  FROM durations GROUP BY t_days
), risk AS (
  SELECT t_days, n_event, n_censor,
         CAST(SUM(n_event + n_censor) OVER (
             ORDER BY t_days
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS n_risk
  FROM per_t
), term AS (
  SELECT *,
         CASE WHEN n_event = 0 THEN 0
              WHEN n_event = n_risk THEN NULL
              ELSE CAST(ROUND(ln(CAST(n_risk - n_event AS DOUBLE)
                                 / CAST(n_risk AS DOUBLE)) * 1000000)
                        AS BIGINT) END AS _term
  FROM risk
)
SELECT t_days, n_risk, n_event, n_censor,
       CASE WHEN _term IS NULL THEN NULL
            ELSE CAST(SUM(_term) OVER (
                ORDER BY t_days ROWS UNBOUNDED PRECEDING) AS BIGINT)
            END AS ln_surv_micro
FROM term
"""


@query(
    "q268_kaplan_meier",
    oracle=_KM_ORACLE,
    tags=("survival", "analytics", "events"),
)
def q268_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve for days-to-first-purchase, users
    without a purchase right-censored at their last observed event
    (operators/survival.kaplan_meier). One groupBy(user) builds the
    duration fixture, one groupBy(duration) the risk table; the curve
    is a single ordered window over the duration-domain table --
    subjects never sort globally. ln terms follow the q129/q241
    fixed-point-ln convention (one IEEE ln per row on exact integer
    ratios, rounded micro ints summed exactly)."""
    from ..operators.survival import kaplan_meier

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("d_ev"),
        F.max(F.to_date("ts")).alias("d_last"),
    )
    durations = per_user.select(
        F.when(
            F.col("d_ev").isNotNull(), F.datediff("d_ev", "d0")
        )
        .otherwise(F.datediff("d_last", "d0"))
        .cast("long")
        .alias("t_days"),
        F.when(F.col("d_ev").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_event"),
    )
    return kaplan_meier(durations, "t_days", "is_event")


# ---------------------------------------------------------------------------
# q269: one-way ANOVA of document length by source
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
  FROM documents GROUP BY source
), wg AS (
  SELECT *,
         CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(n AS DOUBLE) * 1000) AS BIGINT) AS cg
  FROM per
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(s) AS BIGINT) AS ss,
         CAST(SUM(q) AS BIGINT) AS qq,
         CAST(SUM(cg) AS BIGINT) AS cb
  FROM wg
), parts AS (
  SELECT k, n_total,
         CAST(cb - CAST(ROUND(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                              / CAST(n_total AS DOUBLE) * 1000)
                        AS BIGINT) AS BIGINT) AS ssb_milli,
         CAST(qq * 1000 - cb AS BIGINT) AS ssw_milli
  FROM tot
)
SELECT k, n_total, ssb_milli, ssw_milli,
       CAST(ROUND(CAST(ssb_milli AS DOUBLE)
                  / nullif(CAST(k - 1 AS DOUBLE), 0)
                  / nullif(CAST(ssw_milli AS DOUBLE)
                           / CAST(n_total - k AS DOUBLE), 0)
                  * 1000000) AS BIGINT) AS f_micro
FROM parts
"""


@query(
    "q269_anova_source_length",
    oracle=_ANOVA_ORACLE,
    tags=("stats", "curation"),
)
def q269_anova_source_length(spark, sf_dir):
    """Does mean document length differ across sources beyond chance?
    One-way ANOVA F (operators/stats.anova_oneway): one
    map-side-combined groupBy(source) carries exact integer moment
    sums; correction terms are cast-then-multiply DOUBLE chains
    rounded to milli units (the q235 derived-stat convention), so the
    only float ops are identical-operand chains in both engines."""
    from ..operators.stats import anova_oneway

    docs = load_table(spark, sf_dir, "documents")
    return anova_oneway(docs, "source", "n_chars")


# ---------------------------------------------------------------------------
# q270: per-source Wilson intervals for the English share
# ---------------------------------------------------------------------------

_WILSON_ORACLE = """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS x
  FROM documents GROUP BY source
), c AS (
  SELECT source, n, x,
         CAST(1959964 AS DOUBLE) / 1000000.0 AS z,
         CAST(n AS DOUBLE) AS nd,
         CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p
  FROM per
), f AS (
  SELECT source, n, x,
         (p + z * z / (2.0 * nd)) / (1.0 + z * z / nd) AS center,
         z * sqrt(p * (1.0 - p) / nd + z * z / (4.0 * nd * nd))
             / (1.0 + z * z / nd) AS half
  FROM c
)
SELECT source, n, x,
       CAST(ROUND((center - half) * 1000000.0) AS BIGINT) AS lo_micro,
       CAST(ROUND((center + half) * 1000000.0) AS BIGINT) AS hi_micro
FROM f
"""


@query(
    "q270_wilson_en_share",
    oracle=_WILSON_ORACLE,
    tags=("stats", "curation", "langid"),
)
def q270_wilson_en_share(spark, sf_dir):
    """Wilson score 95% interval for each source's English share
    (operators/stats.wilson_intervals): exact (n, x) integers from one
    map-side-combined groupBy, then ONE fixed-order IEEE chain per
    group row (divisions on identical operands, one sqrt, one round)
    -- no float is ever summed, so both engines replay bit-for-bit."""
    from ..operators.stats import wilson_intervals

    docs = load_table(spark, sf_dir, "documents")
    flagged = docs.select(
        "source",
        (F.col("lang") == "en").cast("long").alias("is_en"),
    )
    return wilson_intervals(flagged, "source", "is_en")


# ---------------------------------------------------------------------------
# q271: Neyman-optimal allocation across sources
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 10_000

_NEYMAN_ORACLE = f"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS q
  FROM documents GROUP BY source
), w AS (
  SELECT source, n,
         CAST(ROUND(sqrt(CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    * 1000) AS BIGINT) AS w_milli
  FROM per
), t AS (
  SELECT *, CAST(SUM(w_milli) OVER () AS BIGINT) AS wt FROM w
), a AS (
  SELECT source, n, w_milli,
         CAST(({_NEYMAN_BUDGET} * w_milli) // nullif(wt, 0) AS BIGINT)
             AS alloc
  FROM t
)
SELECT source, n, w_milli, alloc,
       CAST({_NEYMAN_BUDGET} - SUM(alloc) OVER () AS BIGINT)
           AS left_over
FROM a
"""


@query(
    "q271_neyman_allocation",
    oracle=_NEYMAN_ORACLE,
    tags=("stats", "sampling", "design"),
)
def q271_neyman_allocation(spark, sf_dir):
    """Neyman-optimal allocation of a 10k-row sampling budget across
    sources, weights proportional to N_h*sigma_h
    (operators/stats.neyman_allocation): one exact sqrt(nQ - S^2) per
    stratum on identical integer operands, rounded milli weights that
    SUM exactly, overflow-safe integer floor shares; the unassigned
    floor remainder is reported, never silently redistributed."""
    from ..operators.stats import neyman_allocation

    docs = load_table(spark, sf_dir, "documents")
    return neyman_allocation(
        docs, "source", "n_chars", budget=_NEYMAN_BUDGET
    )


# ---------------------------------------------------------------------------
# q272: local clustering coefficient of the bounded kNN graph
# ---------------------------------------------------------------------------


def _lcc_oracle() -> str:
    from .llm_ops10 import _graph_cte

    return f"""
WITH g AS ({_graph_cte()}),
und AS (
  SELECT DISTINCT least(src_id, dst_id) AS a, greatest(src_id, dst_id) AS b
  FROM g WHERE src_id != dst_id
),
wedge AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1 JOIN und e2 ON e2.a = e1.b
),
tri AS (
  SELECT w.a, w.b, w.c FROM wedge w
  WHERE EXISTS (SELECT 1 FROM und u WHERE u.a = w.a AND u.b = w.c)
),
tpn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
  GROUP BY node
)
SELECT d.node, d.deg,
       CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
       CAST((2 * COALESCE(t.n_tri, 0) * 1000000)
            // nullif(d.deg * (d.deg - 1), 0) AS BIGINT) AS lcc_ppm
FROM deg d LEFT JOIN tpn t USING (node)
"""


@query(
    "q272_clustering_coefficient",
    oracle=_lcc_oracle(),
    tags=("graph", "analytics", "similarity"),
)
def q272_clustering_coefficient(spark, sf_dir):
    """Per-node local clustering coefficient of the bounded kNN graph
    (operators/graph.local_clustering_coefficient) -- q184's exact
    wedge equi-join + closing-edge semi-join (O(N*k^2), never
    all-pairs), each triangle crediting its three corners via a
    3-element literal-array explode; lcc in exact ppm integer
    division, NULL below degree 2."""
    from ..operators.graph import local_clustering_coefficient
    from ..operators.similarity import lsh_knn_graph
    from .llm_ops9 import _EMB_DIM, _KNN_CAP, _KNN_K, _KNN_PLANES, _KNN_SEED

    emb = load_table(spark, sf_dir, "embeddings")
    graph = lsh_knn_graph(
        emb,
        "vec_id",
        "embedding",
        k=_KNN_K,
        n_planes=_KNN_PLANES,
        seed=_KNN_SEED,
        dim=_EMB_DIM,
        max_bucket_width=_KNN_CAP,
    )
    return local_clustering_coefficient(graph)


# ---------------------------------------------------------------------------
# q273: isotonic calibration of binned English rates vs length
# ---------------------------------------------------------------------------

_ISO_ORACLE = """
WITH bins AS (
  SELECT CAST(least(n_chars // 50, 9) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS pos
  FROM documents GROUP BY 1
), pre AS (
  SELECT b, cnt, pos,
         CAST(SUM(cnt) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS c_run,
         CAST(SUM(pos) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS p_run
  FROM bins
), lo AS (
  SELECT b AS i, c_run - cnt AS c_lo, p_run - pos AS p_lo FROM pre
), hi AS (
  SELECT b AS j, c_run AS c_hi, p_run AS p_hi FROM pre
), means AS (
  SELECT i, j,
         CAST(p_hi - p_lo AS DOUBLE) / CAST(c_hi - c_lo AS DOUBLE) AS m
  FROM lo JOIN hi ON j >= i
), mi AS (
  SELECT i, MIN(m) AS mmin FROM means GROUP BY i
), fit AS (
  SELECT p.b, p.cnt, p.pos, MAX(mi.mmin) AS f
  FROM pre p JOIN mi ON p.b >= mi.i
  GROUP BY 1, 2, 3
)
SELECT b AS bin, cnt, pos,
       CAST(pos * 1000000 // cnt AS BIGINT) AS rate_ppm,
       CAST(ROUND(f * 1000000.0) AS BIGINT) AS fitted_micro
FROM fit
"""


@query(
    "q273_isotonic_calibration",
    oracle=_ISO_ORACLE,
    tags=("stats", "scoring", "calibration"),
)
def q273_isotonic_calibration(spark, sf_dir):
    """Isotonic (PAV) fit of per-length-bin English rates
    (operators/scoring.isotonic_calibrate_bins): the corpus collapses
    to <=10 bins in one groupBy; the fit is the exact distributed
    max-min identity (fitted(k) = max_{i<=k} min_{j>=i} mean(i..j))
    over B^2 interval means from prefix sums -- each mean ONE IEEE
    division of exact integer sums, min/max order-independent, so no
    float is ever summed and both engines replay bit-for-bit. The
    identity is pinned against a sequential PAV reference in
    tests/test_batch_s_ops.py."""
    from ..operators.scoring import isotonic_calibrate_bins

    docs = load_table(spark, sf_dir, "documents")
    bins = docs.groupBy(
        F.least(F.expr("n_chars div 50"), F.lit(9))
        .cast("long")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum((F.col("lang") == "en").cast("long"))
        .cast("long")
        .alias("pos"),
    )
    return isotonic_calibrate_bins(bins, "bin", "cnt", "pos")
