"""Round-9 batch V: event-pipeline and graph shapes the registry
lacked -- a WEIGHTED iterative relaxation, conjunctive boolean
retrieval, the ordered-step funnel, and last-touch attribution.

* q282 -- K-round Bellman-Ford (operators/graph.sssp_bounded): the
  weighted sibling of q212's BFS. The K-edge bound is the CONTRACT
  (both engines run exactly K min-plus relaxations -- no convergence
  test whose iteration count could differ), so the unrolled-CTE
  oracle replays it exactly.
* q283 -- conjunctive (AND) boolean retrieval: per-term tf postings,
  docs holding ALL terms, ranked by total tf -- the intersection
  primitive BM25 (q190) skips. Top-k via orderBy+limit
  (TakeOrderedAndProject), rank window only over the k survivors.
* q284 -- ordered-step funnel over events: view -> click-after-view ->
  purchase-after-click as a chain of keyed conditional MINs (each
  stage joins the previous stage's user table) -- the product-
  analytics staple, with strict event-order semantics a naive
  per-type count gets wrong.
* q285 -- last-touch attribution: every purchase credits the user's
  latest PRECEDING non-purchase event via one ignore-nulls window --
  verified portable (DuckDB last_value IGNORE NULLS agrees).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from ..functions.text import tokens
from .registry import query
from ..lineage import cut_lineage

# ---------------------------------------------------------------------------
# q282: K-round weighted SSSP over the co-purchase part graph
# ---------------------------------------------------------------------------

_SSSP_ROUNDS = 4
_SSSP_SEED_LT = 8
_SSSP_SENTINEL = 1 << 20


def _sssp_oracle() -> str:
    iters = []
    prev = "d0"
    for n in range(1, _SSSP_ROUNDS + 1):
        iters.append(f"""
m{n} AS (
  SELECT e.dst AS node, MIN(s.dist + e.w) AS md
  FROM ew e JOIN {prev} s
    ON s.node = e.src AND s.dist < {_SSSP_SENTINEL}
  GROUP BY e.dst
),
d{n} AS (
  SELECT d.node,
         LEAST(d.dist, COALESCE(m.md, {_SSSP_SENTINEL})) AS dist
  FROM {prev} d LEFT JOIN m{n} m ON m.node = d.node
)""")
        prev = f"d{n}"
    head = f"""
WITH pr AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS ok,
                  CAST(l_partkey AS BIGINT) AS pk
  FROM lineitem
),
ew AS (
  SELECT a.pk AS src, b.pk AS dst,
         CAST(GREATEST(1, 6 - COUNT(*)) AS BIGINT) AS w
  FROM pr a JOIN pr b ON a.ok = b.ok AND a.pk <> b.pk
  GROUP BY 1, 2
),
nodes AS (
  SELECT src AS node FROM ew UNION SELECT dst FROM ew
),
d0 AS (
  SELECT node,
         CASE WHEN node < {_SSSP_SEED_LT} THEN 0
              ELSE {_SSSP_SENTINEL} END AS dist
  FROM nodes
),"""
    tail = f"""
SELECT node,
       CAST(CASE WHEN dist >= {_SSSP_SENTINEL} THEN -1
                 ELSE dist END AS BIGINT) AS dist,
       dist < {_SSSP_SENTINEL} AS reached
FROM {prev}
"""
    return head + ",".join(iters) + tail


@query(
    "q282_weighted_sssp",
    oracle=_sssp_oracle(),
    tags=("graph", "sssp", "weighted", "iterative"),
)
def q282_weighted_sssp(spark, sf_dir):
    """Cheapest K-edge-bounded path cost from the seed parts over the
    WEIGHTED co-purchase graph: strongly co-purchased pairs are cheap
    (w = max(1, 6 - shared_orders)), so "distance" reads as
    substitutability. Exactly 4 min-plus relaxation rounds on
    both engines (operators/graph.sssp_bounded); per round one edge
    equi-join + one map-side-combinable dst min, lineage cut per
    round -- the q212 loop shape with weights. Unreached -> -1."""
    from ..operators.graph import sssp_bounded

    lineitem = load_table(spark, sf_dir, "lineitem")
    pr = lineitem.select(
        F.col("l_orderkey").cast("long").alias("ok"),
        F.col("l_partkey").cast("long").alias("pk"),
    ).distinct()
    a = pr.select("ok", F.col("pk").alias("src"))
    b = pr.select("ok", F.col("pk").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(
            F.greatest(F.lit(1), F.lit(6) - F.count(F.lit(1)))
            .cast("long")
            .alias("w")
        )
    )
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .filter(F.col("node") < _SSSP_SEED_LT)
        .distinct()
    )
    return sssp_bounded(edges, seeds, rounds=_SSSP_ROUNDS)


# ---------------------------------------------------------------------------
# q283: conjunctive boolean retrieval (AND of three terms, tf-ranked)
# ---------------------------------------------------------------------------

_BOOL_TERMS = ("table", "scan", "merge")
_BOOL_TOPK = 20

_BOOL_RETRIEVAL_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE tok IN {_BOOL_TERMS!r}
  GROUP BY 1, 2
), hits AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_total
  FROM tf GROUP BY doc_id HAVING COUNT(*) = {len(_BOOL_TERMS)}
), top AS (
  SELECT doc_id, tf_total FROM hits
  ORDER BY tf_total DESC, doc_id LIMIT {_BOOL_TOPK}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY tf_total DESC, doc_id)
            AS BIGINT) AS rank,
       doc_id, tf_total
FROM top
"""


@query(
    "q283_boolean_retrieval",
    oracle=_BOOL_RETRIEVAL_ORACLE,
    tags=("retrieval", "boolean", "topk"),
)
def q283_boolean_retrieval(spark, sf_dir):
    """Conjunctive boolean retrieval: docs containing ALL of
    ('table','scan','merge'), ranked by summed term frequency -- the
    posting-list INTERSECTION primitive under every AND query engine.
    Intersection is a groupBy(doc) HAVING count = n_terms over the
    per-(doc, term) tf table (no self-joins: n_terms-way intersection
    in ONE shuffle); top-k via orderBy+limit plans
    TakeOrderedAndProject (per-partition heaps, driver merge of k),
    and the rank window runs over the k survivors only. Total tie
    order (tf desc, doc_id asc) on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok").isin(*_BOOL_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    hits = (
        tf.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("tf_total"),
            F.count(F.lit(1)).alias("_nt"),
        )
        .filter(F.col("_nt") == len(_BOOL_TERMS))
    )
    top = hits.orderBy(F.desc("tf_total"), "doc_id").limit(_BOOL_TOPK)
    return top.select(
        F.row_number()
        .over(W.orderBy(F.desc("tf_total"), "doc_id"))
        .cast("long")
        .alias("rank"),
        "doc_id",
        "tf_total",
    )


# ---------------------------------------------------------------------------
# q284: ordered-step funnel (view -> click -> purchase, strictly after)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
)
SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
           AS n_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_full_funnel
"""


@query(
    "q284_session_funnel",
    oracle=_FUNNEL_ORACLE,
    tags=("events", "funnel", "analytics"),
)
def q284_session_funnel(spark, sf_dir):
    """Ordered-step conversion funnel: users who viewed, then clicked
    STRICTLY AFTER their first view, then purchased strictly after
    that first qualifying click. Each stage is one keyed conditional
    MIN joined against the previous stage's (user, ts) table -- the
    stage tables are user-cardinality (tiny vs events), so at 100 TB
    each stage is one broadcast-joinable filter + groupBy over the
    event scan; no per-user sequence materialization, no UDFs. A
    naive per-type count (ignoring order) would overcount: a user who
    clicked before ever viewing does not convert here."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    # Stage tables are user-cardinality: cut their lineage so stages
    # 2/3 (and the final counts) reuse the materialized table instead
    # of re-deriving it -- without the checkpoints the executed plan
    # re-scans events 7x (measured); with them, once per stage.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .transform(cut_lineage, eager=True)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .transform(cut_lineage, eager=True)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n_users = ev.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    n_view = v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
    n_click = c.agg(F.count(F.lit(1)).cast("long").alias("n_view_click"))
    n_full = p.agg(F.count(F.lit(1)).cast("long").alias("n_full_funnel"))
    return (
        n_users.crossJoin(F.broadcast(n_view))
        .crossJoin(F.broadcast(n_click))
        .crossJoin(F.broadcast(n_full))
    )


# ---------------------------------------------------------------------------
# q285: last-touch attribution for purchases
# ---------------------------------------------------------------------------

_ATTRIBUTION_ORACLE = """
WITH ordered AS (
  SELECT event_type,
         last_value(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS touch
  FROM events
)
SELECT COALESCE(touch, 'none') AS touch,
       CAST(COUNT(*) AS BIGINT) AS n_purchases
FROM ordered WHERE event_type = 'purchase' GROUP BY 1
"""


@query(
    "q285_last_touch_attribution",
    oracle=_ATTRIBUTION_ORACLE,
    tags=("events", "attribution", "window"),
)
def q285_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: every purchase credits the user's most
    recent PRECEDING non-purchase event (ties broken by event_id -- a
    total order), 'none' when no prior touch exists. ONE ignore-nulls
    window over (user, ts, event_id) -- the per-user partitioning is
    uniform (150+ users per sf unit), so the single shuffle is skew-
    free; DuckDB's last_value IGNORE NULLS replays the same frame
    exactly (verified before registration)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touched = ev.select(
        "event_type",
        F.last(
            F.when(
                F.col("event_type") != "purchase", F.col("event_type")
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("touch"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
    )
