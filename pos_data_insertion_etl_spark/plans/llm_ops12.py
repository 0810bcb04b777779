"""Round-7 batch I (q209-q217): graph reach/relevance, record-linkage
blocking, streamed sketch-store replay, sequence + seasonal modeling,
feature selection, and the retrieval/classifier evaluation harness.

* q209 -- personalized PageRank (operators/graph.personalized_pagerank):
  teleport mass returns to a SEED set (region-0 nations) instead of
  uniformly; same exact-integer fixed-point loop as q141, so the
  oracle unrolls the identical 3 iterations with the seed teleport.
* q210 -- sorted-neighborhood fuzzy join (operators/fuzzy.
  sorted_neighborhood_join): global order by name + windowed pairing;
  the oracle replays it with ROW_NUMBER + a rank-band self-join.
* q211 -- heavy-hitter monitor replay (streaming/jobs.heavyhitter_*):
  per-batch Misra-Gries summaries persist idempotently (one batch
  replayed TWICE), merge to a certified [count_min, count_max]
  envelope at load; the oracle pins the q138-style guarantee -- every
  token above n/(k+1) must be present with the envelope containing
  its exact count.
* q212 -- multi-source BFS hop distances (operators/graph.
  bfs_distances) over the co-purchase part graph; unrolled min-relax
  iterations are exact integers both engines.
* q213 -- Markov transition table (operators/timeseries.
  markov_transitions) over per-user event sequences; LEAD over a
  TOTAL order (ts, event_id), probabilities in exact 1e-6 fixed point.
* q214 -- chi-squared token/class association (operators/text_mining.
  chi2_token_class): the feature-selection / class-leak screen; chi2
  in one fixed IEEE expression over exact-integer counts.
* q215 -- retrieval evaluation (operators/scoring.rank_metrics): MRR /
  P@5 / R@10 of tf-ranked lookups for the corpus' head tokens against
  a rank-independent relevance label, exact-integer metrics.
* q216 -- day-of-week seasonal residuals (operators/timeseries.
  dow_seasonal_residuals): epoch-day mod 7 weekday key (no engine
  DAYOFWEEK numbering), exact fixed-point means/residuals/flags.
* q217 -- exact ROC-AUC by rank sum (operators/scoring.auc_rank_sum)
  of the q200 logistic quality score against the is-English label;
  tie-averaged ranks kept integer by doubling.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from .llm_ops9 import _monitor_dir
from .registry import query

_PPR_ITERS = 3
_PPR_SCALE = 1_000_000_000
_SNJ_WINDOW = 4
_SNJ_MAXDIST = 2
_HHM_K = 29
_BFS_HOPS = 3
_BFS_SEED_LT = 8
_CHI2_MIN_DF_PCT = 5
_RET_N_QUERIES = 8
_RET_TOPN = 10
_RET_SOURCES = ("src0", "src1", "src2", "src3")

#: q141's trade graph (customer nation -> supplier nation), reused so
#: the two PageRank variants stay comparable side by side.
_TRADE_EDGES_CTE = """
edges AS (
  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
                  CAST(s.s_nationkey AS BIGINT) AS dst
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
)"""


# ---------------------------------------------------------------------------
# q209: personalized PageRank
# ---------------------------------------------------------------------------


def _ppr_oracle() -> str:
    iters = []
    prev = "r0"
    for n in range(1, _PPR_ITERS + 1):
        iters.append(f"""
c{n} AS (
  SELECT node, deg, is_seed, rank_fp,
         CASE WHEN deg > 0 THEN rank_fp // deg ELSE 0 END AS contrib
  FROM {prev}
),
i{n} AS (
  SELECT e.dst AS node, CAST(SUM(c.contrib) AS BIGINT) AS in_fp
  FROM edges e JOIN c{n} c ON c.node = e.src GROUP BY e.dst
),
r{n} AS (
  SELECT c.node, c.deg, c.is_seed,
         CAST((CASE WHEN c.is_seed THEN (SELECT t FROM tele) ELSE 0 END)
              + (((c.rank_fp - c.deg * c.contrib)
                  + COALESCE(i.in_fp, 0)) * 85) // 100
              AS BIGINT) AS rank_fp
  FROM c{n} c LEFT JOIN i{n} i ON i.node = c.node
)""")
        prev = f"r{n}"
    head = f"""
WITH {_TRADE_EDGES_CTE},
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
sg AS (
  SELECT DISTINCT CAST(n.n_nationkey AS BIGINT) AS node
  FROM nation n JOIN nodes nd ON nd.node = n.n_nationkey
  WHERE n.n_regionkey = 0
),
tele AS (
  SELECT CAST((CAST(15 AS BIGINT) * {_PPR_SCALE}
               * (SELECT COUNT(*) FROM nodes))
              // (100 * (SELECT COUNT(*) FROM sg)) AS BIGINT) AS t
),
deg0 AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (
  SELECT n.node, COALESCE(d.deg, 0) AS deg,
         s.node IS NOT NULL AS is_seed,
         CAST({_PPR_SCALE} AS BIGINT) AS rank_fp
  FROM nodes n
  LEFT JOIN deg0 d ON d.src = n.node
  LEFT JOIN sg s ON s.node = n.node
),"""
    tail = f"""
SELECT node, rank_fp,
       CAST(rank_fp AS DOUBLE) / {_PPR_SCALE} AS rank, is_seed
FROM {prev}
"""
    return head + ",".join(iters) + tail


@query(
    "q209_personalized_pagerank",
    oracle=_ppr_oracle(),
    tags=("graph", "pagerank", "seed_expansion"),
)
def q209_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank over the q141 trade graph with region-0
    nations as the trusted seed set: teleport mass returns to seeds,
    so rank concentrates on the seed side -- the seed-expansion
    curation signal. Arithmetic is the exact integer fixed-point loop
    of q141 (remainder-kept division, rational damping), so the
    oracle unrolls the same 3 iterations."""
    from ..operators.graph import personalized_pagerank

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    edges = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
    )
    seeds = nation.filter(F.col("n_regionkey") == 0).select(
        F.col("n_nationkey").cast("long").alias("node")
    )
    return personalized_pagerank(edges, seeds, iters=_PPR_ITERS)


# ---------------------------------------------------------------------------
# q210: sorted-neighborhood fuzzy join
# ---------------------------------------------------------------------------

_SNJ_ORACLE = f"""
WITH ranked AS (
  SELECT p_partkey AS id, p_name AS name,
         ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rk
  FROM part
)
SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM ranked a
JOIN ranked b ON b.rk > a.rk AND b.rk <= a.rk + {_SNJ_WINDOW}
WHERE levenshtein(a.name, b.name) <= {_SNJ_MAXDIST}
"""


@query(
    "q210_sorted_neighborhood",
    oracle=_SNJ_ORACLE,
    tags=("fuzzy", "record_linkage", "dedup"),
)
def q210_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood record linkage over part names
    (operators/fuzzy.sorted_neighborhood_join): global (name, id)
    order via the two-phase sequence, pairing restricted to the next
    `window` ranks through a block equi-join (never a theta join),
    Levenshtein verify at the end. The oracle replays the identical
    total order with ROW_NUMBER and a rank-band self-join."""
    from ..operators.fuzzy import sorted_neighborhood_join

    part = load_table(spark, sf_dir, "part")
    return sorted_neighborhood_join(
        part,
        "p_partkey",
        "p_name",
        window=_SNJ_WINDOW,
        max_dist=_SNJ_MAXDIST,
    )


# ---------------------------------------------------------------------------
# q211: heavy-hitter monitor replay (certified merged envelope)
# ---------------------------------------------------------------------------

_HHM_ORACLE = rf"""
WITH toks AS (
  SELECT unnest(list_filter(
           string_split_regex(lower(trim(text)), '\s+'),
           x -> x != '')) AS tok
  FROM documents
),
n AS (SELECT COUNT(*) AS c FROM toks),
exact AS (
  SELECT tok AS value, CAST(COUNT(*) AS BIGINT) AS count_exact
  FROM toks GROUP BY tok
)
SELECT value, count_exact, TRUE AS lb_ok, TRUE AS ub_ok
FROM exact, n
WHERE count_exact * {_HHM_K + 1} > n.c
"""


@query(
    "q211_heavyhitter_monitor_replay",
    oracle=_HHM_ORACLE,
    tags=("streaming", "sketch", "heavy_hitters", "monitor"),
)
def q211_heavyhitter_monitor_replay(spark, sf_dir):
    """The heavy-hitter monitor's batch analog (q175/q176 pattern):
    document tokens split into three micro-batches replay through
    heavyhitter_monitor_batch's idempotent per-batch persist (batch 1
    deliberately written TWICE -- replay must not double-count), the
    store loads back into ONE merged candidate table with a certified
    [count_min, count_max] envelope, and the q138 Misra-Gries
    guarantee becomes the checkable output: every token with true
    frequency > n/(k+1) must be a candidate whose envelope contains
    its exact recount. A dropped candidate or a broken merge bound
    turns a pinned-TRUE boolean false (or loses the row) and the
    hash comparison fails."""
    from ..streaming.jobs import (
        heavyhitter_monitor_batch,
        load_heavyhitter_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 3).alias("b"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    store = _monitor_dir(sf_dir, "hh")
    shutil.rmtree(store, ignore_errors=True)  # fresh state per run
    for bid in (0, 1, 1, 2):  # batch 1 replayed
        heavyhitter_monitor_batch(
            toks.filter(F.col("b") == bid).select("tok"),
            bid,
            store,
            "tok",
            k=_HHM_K,
        )
    merged = load_heavyhitter_counts(spark, store)
    total = toks.agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        toks.groupBy(F.col("tok").alias("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("count_exact"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("count_exact") * (_HHM_K + 1) > F.col("_n"))
    )
    return exact.join(merged, "value", "left").select(
        "value",
        "count_exact",
        F.coalesce(
            F.col("count_min") <= F.col("count_exact"), F.lit(False)
        ).alias("lb_ok"),
        F.coalesce(
            F.col("count_exact") <= F.col("count_max"), F.lit(False)
        ).alias("ub_ok"),
    )


# ---------------------------------------------------------------------------
# q212: multi-source BFS hop distances
# ---------------------------------------------------------------------------

_BFS_SENTINEL = 1 << 20


def _bfs_oracle() -> str:
    # AS MATERIALIZED on every multiply-referenced CTE: each d{n} is
    # consumed twice by round n+1 and `edges` by every round, so
    # DuckDB's default inlining re-evaluates the whole prefix per
    # reference -- exponential in hops. At sf0.01 that is invisible; at
    # sf1.0 the un-hinted form spilled >79 GB of temp and died, the
    # hinted form runs in 16 s (round-12 scale-correctness finding).
    # The hint only pins evaluation strategy; results are identical.
    iters = []
    prev = "d0"
    for n in range(1, _BFS_HOPS + 1):
        iters.append(f"""
m{n} AS MATERIALIZED (
  SELECT e.dst AS node, MIN(s.dist + 1) AS md
  FROM edges e JOIN {prev} s ON s.node = e.src GROUP BY e.dst
),
d{n} AS MATERIALIZED (
  SELECT d.node,
         LEAST(d.dist, COALESCE(m.md, {_BFS_SENTINEL})) AS dist
  FROM {prev} d LEFT JOIN m{n} m ON m.node = d.node
)""")
        prev = f"d{n}"
    head = f"""
WITH pr AS MATERIALIZED (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS ok,
                  CAST(l_partkey AS BIGINT) AS pk
  FROM lineitem
),
edges AS MATERIALIZED (
  SELECT DISTINCT a.pk AS src, b.pk AS dst
  FROM pr a JOIN pr b ON a.ok = b.ok AND a.pk <> b.pk
),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
d0 AS MATERIALIZED (
  SELECT node,
         CASE WHEN node < {_BFS_SEED_LT} THEN 0
              ELSE {_BFS_SENTINEL} END AS dist
  FROM nodes
),"""
    tail = f"""
SELECT node,
       CAST(CASE WHEN dist >= {_BFS_SENTINEL} THEN -1
                 ELSE dist END AS BIGINT) AS dist,
       dist < {_BFS_SENTINEL} AS reached
FROM {prev}
"""
    return head + ",".join(iters) + tail


@query(
    "q212_bfs_distances",
    oracle=_bfs_oracle(),
    tags=("graph", "bfs", "reachability"),
)
def q212_bfs_distances(spark, sf_dir):
    """Multi-source BFS over the co-purchase part graph (parts sharing
    an order are adjacent; q188's edge shape): hop distance from the
    seed parts (p_partkey < 8), exact integer min-relaxation unrolled
    identically in the oracle. One equi-join + one dst groupBy per
    hop; unreached parts report -1.

    The edge self-join is materialized ONCE (r15 optimization round):
    the lineage cut used to live inside bfs_distances only, so the
    seed derivation replayed the whole lineitem self-join a second
    time. Cutting here and passing ``prepared=True`` gives seeds and
    every relaxation round the same materialized blocks."""
    from ..lineage import cut_lineage
    from ..operators.graph import bfs_distances

    lineitem = load_table(spark, sf_dir, "lineitem")
    pr = lineitem.select(
        F.col("l_orderkey").cast("long").alias("ok"),
        F.col("l_partkey").cast("long").alias("pk"),
    ).distinct()
    a = pr.select(F.col("ok"), F.col("pk").alias("src"))
    b = pr.select(F.col("ok"), F.col("pk").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .filter(F.col("node") < _BFS_SEED_LT)
        .distinct()
    )
    return bfs_distances(edges, seeds, max_hops=_BFS_HOPS, prepared=True)


# ---------------------------------------------------------------------------
# q213: Markov transition table over user event sequences
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type AS from_state,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_state
  FROM events
),
tr AS (
  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2
),
tot AS (
  SELECT from_state, CAST(SUM(n) AS BIGINT) AS tn FROM tr GROUP BY 1
)
SELECT t.from_state, t.to_state, t.n,
       CAST((t.n * 1000000) // tot.tn AS BIGINT) AS prob_fp
FROM tr t JOIN tot ON tot.from_state = t.from_state
"""


@query(
    "q213_markov_transitions",
    oracle=_MARKOV_ORACLE,
    tags=("sequence", "markov", "sessions"),
)
def q213_markov_transitions(spark, sf_dir):
    """First-order Markov transition probabilities over per-user event
    sequences (operators/timeseries.markov_transitions): LEAD over the
    TOTAL order (ts, event_id) within each user, exact 1e-6
    fixed-point row-normalized probabilities."""
    from ..operators.timeseries import markov_transitions

    ev = load_table(spark, sf_dir, "events")
    return markov_transitions(
        ev, "user_id", "event_type", ["ts", "event_id"]
    )


# ---------------------------------------------------------------------------
# q214: chi-squared token/class association
# ---------------------------------------------------------------------------

_CHI2_ORACLE = rf"""
WITH lab AS (
  SELECT doc_id, lang = 'en' AS is_class, text FROM documents
),
td AS (
  SELECT DISTINCT doc_id, is_class,
         unnest(list_filter(
           string_split_regex(lower(trim(text)), '\s+'),
           x -> x != '')) AS token
  FROM lab
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN is_class THEN 1 ELSE 0 END) AS BIGINT)
           AS n_class
  FROM lab
),
counts AS (
  SELECT token,
         CAST(SUM(CASE WHEN is_class THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN is_class THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM td GROUP BY token
)
SELECT token, a AS n_class, b AS n_rest,
       ROUND(
         CAST(n_docs AS DOUBLE)
         * (CAST(a AS DOUBLE) * CAST(n_docs - tot.n_class - b AS DOUBLE)
            - CAST(b AS DOUBLE) * CAST(tot.n_class - a AS DOUBLE))
         * (CAST(a AS DOUBLE) * CAST(n_docs - tot.n_class - b AS DOUBLE)
            - CAST(b AS DOUBLE) * CAST(tot.n_class - a AS DOUBLE))
         / (CAST(a + b AS DOUBLE)
            * CAST(n_docs - a - b AS DOUBLE)
            * CAST(tot.n_class AS DOUBLE)
            * CAST(n_docs - tot.n_class AS DOUBLE)),
         6) AS chi2
FROM counts, tot
WHERE (a + b) * 100 >= {_CHI2_MIN_DF_PCT} * n_docs
  AND a + b < n_docs
"""


@query(
    "q214_chi2_token_class",
    oracle=_CHI2_ORACLE,
    tags=("text", "feature_selection", "curation"),
)
def q214_chi2_token_class(spark, sf_dir):
    """Chi-squared association between token presence and the
    is-English class (operators/text_mining.chi2_token_class) -- the
    feature-selection / class-leakage screen. Contingency counts are
    exact integers from one distinct-(doc, token) explode; chi2 is one
    fixed-order IEEE expression (sub-2^53 exact at oracle scale)."""
    from ..operators.text_mining import chi2_token_class

    docs = load_table(spark, sf_dir, "documents")
    return chi2_token_class(
        docs, "text", F.col("lang") == "en", min_df_pct=_CHI2_MIN_DF_PCT
    )


# ---------------------------------------------------------------------------
# q215: retrieval evaluation harness (MRR / P@5 / R@10)
# ---------------------------------------------------------------------------

_RET_SRC_LIST = ", ".join(f"'{s}'" for s in _RET_SOURCES)

_RET_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(trim(text)), '\s+'),
           x -> x != '')) AS tok
  FROM documents
),
qs AS (
  SELECT tok AS query FROM toks
  GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT {_RET_N_QUERIES}
),
tf AS (
  SELECT t.tok AS query, t.doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks t JOIN qs q ON q.query = t.tok
  GROUP BY 1, 2
),
ranked AS (
  SELECT query, doc_id, tf,
         ROW_NUMBER() OVER (
           PARTITION BY query ORDER BY tf DESC, doc_id
         ) AS rk
  FROM tf
),
cut AS (
  SELECT r.query, r.rk,
         d.source IN ({_RET_SRC_LIST}) AS is_rel
  FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
  WHERE r.rk <= {_RET_TOPN}
),
totals AS (
  SELECT t.query, CAST(COUNT(*) AS BIGINT) AS n_rel
  FROM tf t JOIN documents d ON d.doc_id = t.doc_id
  WHERE d.source IN ({_RET_SRC_LIST})
  GROUP BY 1
),
agg AS (
  SELECT query,
         MIN(CASE WHEN is_rel THEN rk END) AS first_rk,
         CAST(SUM(CASE WHEN is_rel AND rk <= 5 THEN 1 ELSE 0 END)
              AS BIGINT) AS hits_p,
         CAST(SUM(CASE WHEN is_rel AND rk <= {_RET_TOPN} THEN 1
                       ELSE 0 END) AS BIGINT) AS hits_r
  FROM cut GROUP BY query
)
SELECT a.query,
       CAST(COALESCE(a.first_rk, -1) AS BIGINT) AS first_rel_rank,
       CAST(COALESCE(1000000 // a.first_rk, 0) AS BIGINT) AS mrr_fp,
       CAST((a.hits_p * 1000000) // 5 AS BIGINT) AS p_at_k_fp,
       CAST(COALESCE((a.hits_r * 1000000) // NULLIF(t.n_rel, 0), 0)
            AS BIGINT) AS r_at_k_fp,
       CAST(COALESCE(t.n_rel, 0) AS BIGINT) AS n_rel
FROM agg a LEFT JOIN totals t ON t.query = a.query
"""


@query(
    "q215_retrieval_eval",
    oracle=_RET_ORACLE,
    tags=("retrieval", "evaluation", "ranking"),
)
def q215_retrieval_eval(spark, sf_dir):
    """Retrieval evaluation harness (operators/scoring.rank_metrics):
    the corpus' 8 head tokens become queries, candidates rank by
    exact term frequency (tiebreak doc_id), relevance is the
    rank-independent source label, and MRR / P@5 / R@10 come out as
    exact integer-division fixed point. The ranked cut is a per-query
    WindowGroupLimit; totals come from the full corpus."""
    from ..operators.scoring import rank_metrics

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    qs = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.desc("_c"), "tok")
        .limit(_RET_N_QUERIES)
        .select(F.col("tok").alias("query"))
    )
    tf = (
        toks.join(F.broadcast(qs), toks.tok == qs.query)
        .groupBy("query", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    ranked = tf.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("query").orderBy(F.desc("tf"), "doc_id")
        ),
    ).filter(F.col("rk") <= _RET_TOPN)
    rel = F.col("source").isin(*_RET_SOURCES)
    cut = ranked.join(
        docs.select("doc_id", rel.alias("is_rel")), "doc_id"
    )
    totals = (
        tf.join(
            docs.filter(rel).select("doc_id"), "doc_id", "left_semi"
        )
        .groupBy("query")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rel"))
    )
    return rank_metrics(
        cut, "query", "rk", "is_rel", totals, p_k=5, r_k=_RET_TOPN
    )


# ---------------------------------------------------------------------------
# q216: day-of-week seasonal residuals
# ---------------------------------------------------------------------------

_DOW_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
d AS (
  SELECT day, n,
         CAST(datediff('day', DATE '1970-01-01', day) % 7 AS BIGINT)
           AS dow
  FROM daily
),
m AS (
  SELECT dow, CAST(SUM(n) AS BIGINT) AS tot,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM d GROUP BY 1
)
SELECT d.day, d.dow, d.n,
       CAST((m.tot * 1000) // m.cnt AS BIGINT) AS dow_mean_milli,
       CAST(d.n * 1000 - (m.tot * 1000) // m.cnt AS BIGINT)
         AS resid_milli,
       ABS(d.n * 1000 - (m.tot * 1000) // m.cnt) * 100
         > 20 * ((m.tot * 1000) // m.cnt) AS is_anomaly
FROM d JOIN m ON m.dow = d.dow
"""


@query(
    "q216_dow_seasonality",
    oracle=_DOW_ORACLE,
    tags=("timeseries", "seasonality", "monitoring"),
)
def q216_dow_seasonality(spark, sf_dir):
    """Day-of-week seasonal profile + residual anomalies of the event
    stream's daily volumes (operators/timeseries.
    dow_seasonal_residuals): weekday = epoch-day mod 7 (identical
    integer arithmetic both engines), exact fixed-point means and
    all-integer anomaly flags."""
    from ..operators.timeseries import dow_seasonal_residuals

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return dow_seasonal_residuals(daily, "day", "n", anomaly_pct=20)


# ---------------------------------------------------------------------------
# q217: exact ROC-AUC of the quality classifier
# ---------------------------------------------------------------------------


def _auc_oracle() -> str:
    from .llm_ops11 import _q200_oracle

    return f"""
WITH q AS (
{_q200_oracle()}
),
scored AS (
  SELECT q.z_fp AS s, d.lang = 'en' AS y
  FROM q JOIN documents d ON d.doc_id = q.doc_id
),
g AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp
  FROM scored GROUP BY s
),
w AS (
  SELECT s, c, cp,
         SUM(c) OVER (ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum
  FROM g
),
t AS (
  SELECT CAST(SUM(cp) AS BIGINT) AS npos,
         CAST(SUM(c) - SUM(cp) AS BIGINT) AS nneg,
         CAST(SUM(cp * (2 * cum - c + 1)) AS BIGINT) AS ranksum2
  FROM w
)
SELECT npos, nneg,
       CAST(ranksum2 - npos * (npos + 1) AS BIGINT) AS u2,
       CAST(((ranksum2 - npos * (npos + 1)) * 500000)
            // (npos * nneg) AS BIGINT) AS auc_fp
FROM t
"""


@query(
    "q217_score_auc",
    oracle=_auc_oracle(),
    tags=("scoring", "evaluation", "classifier"),
)
def q217_score_auc(spark, sf_dir):
    """EXACT ROC-AUC (Mann-Whitney rank sum, operators/scoring.
    auc_rank_sum) of the q200 logistic quality logit against the
    is-English label -- closes the classifier loop with an
    all-integer, tie-correct evaluation the oracle replays from the
    same nested q200 CTE."""
    from ..operators.scoring import auc_rank_sum
    from .llm_ops11 import q200_quality_logistic

    docs = load_table(spark, sf_dir, "documents")
    scored = q200_quality_logistic(spark, sf_dir).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("_y")),
        "doc_id",
    )
    return auc_rank_sum(scored, "z_fp", "_y")
