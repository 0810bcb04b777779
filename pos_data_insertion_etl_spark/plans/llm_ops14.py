"""Round-7 batch K (q227-q231): link analysis, reciprocal-kNN
curation, association rules, trend decomposition, and audio framing.
Like batch J these sort after q217, queueing behind the round-7
certification window with full local evidence.

* q227 -- HITS hubs/authorities (operators/graph.hits_scores):
  integer fixed-point half-steps with exact renormalization, the
  link-analysis complement to q141/q209; oracle unrolls both
  iterations.
* q228 -- mutual-kNN pair filter (operators/graph.mutual_knn_pairs)
  over the q169 bounded graph: the high-precision reciprocal cut
  before semantic-dedup merges; oracle self-joins the graph CTE.
* q229 -- association rules A->B (operators/itemsets.
  association_rules): directional confidence + lift in exact fixed
  point over the order/part baskets.
* q230 -- centered moving-average trend + detrended residuals
  (operators/timeseries.centered_moving_trend): the trend half of an
  STL-style decomposition next to q216's seasonal half; ROWS-frame
  window, exact milli fixed point.
* q231 -- audio zero-crossing rate (multimodal/binary_ops.
  audio_zero_crossings): q208's real WAV fixture framed to strict
  sign-change counts -- crossings never span frame boundaries, so a
  closed-form oracle recomputes every frame.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..catalog import load_table
from .llm_ops10 import _graph_cte
from .llm_ops12 import _TRADE_EDGES_CTE
from .registry import query

_HITS_ITERS = 2
_HITS_SCALE = 1_000_000
_AR_MIN_SUPPORT = 2
_TREND_HALF = 3
_ZCR_DOCS = 120
_ZCR_FRAME = 250


# ---------------------------------------------------------------------------
# q227: HITS hubs and authorities
# ---------------------------------------------------------------------------


def _hits_oracle() -> str:
    steps = []
    prev_h = "h0"
    prev_a = None
    for i in range(1, _HITS_ITERS + 1):
        steps.append(f"""
ar{i} AS (
  SELECT n.node,
         CAST(COALESCE(x.raw, 0) AS BIGINT) AS raw
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(h.hub) AS raw
    FROM edges e JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst
  ) x ON x.node = n.node
),
a{i} AS (
  SELECT node,
         CAST((raw * ((mass * 1000000) // (SELECT SUM(raw) FROM ar{i})))
              // 1000000 AS BIGINT) AS auth
  FROM ar{i}, m
),
hr{i} AS (
  SELECT n.node,
         CAST(COALESCE(x.raw, 0) AS BIGINT) AS raw
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, SUM(a.auth) AS raw
    FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src
  ) x ON x.node = n.node
),
h{i} AS (
  SELECT node,
         CAST((raw * ((mass * 1000000) // (SELECT SUM(raw) FROM hr{i})))
              // 1000000 AS BIGINT) AS hub
  FROM hr{i}, m
)""")
        prev_h, prev_a = f"h{i}", f"a{i}"
    return f"""
WITH {_TRADE_EDGES_CTE},
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
m AS (
  SELECT CAST(COUNT(*) * {_HITS_SCALE} AS BIGINT) AS mass FROM nodes
),
h0 AS (
  SELECT node, CAST({_HITS_SCALE} AS BIGINT) AS hub FROM nodes
),{",".join(steps)}
SELECT h.node, h.hub AS hub_fp, a.auth AS auth_fp
FROM {prev_h} h JOIN {prev_a} a ON a.node = h.node
"""


@query(
    "q227_hits",
    oracle=_hits_oracle(),
    tags=("graph", "link_analysis", "hits"),
)
def q227_hits(spark, sf_dir):
    """HITS over the q141 trade graph (operators/graph.hits_scores):
    hub mass flows along out-edges, authority along in-edges, each
    half-step renormalized to N * 1e6 total through exact integer
    factors -- the oracle unrolls both iterations with the identical
    truncating arithmetic."""
    from ..operators.graph import hits_scores

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    edges = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
    )
    return hits_scores(edges, iters=_HITS_ITERS)


# ---------------------------------------------------------------------------
# q228: mutual-kNN reciprocal pair filter
# ---------------------------------------------------------------------------


def _mutual_knn_oracle() -> str:
    return f"""
WITH g AS ({_graph_cte()})
SELECT f.src_id AS id_a, f.dst_id AS id_b,
       f.cos_sim AS sim_ab, r.cos_sim AS sim_ba
FROM g f JOIN g r ON r.src_id = f.dst_id AND r.dst_id = f.src_id
WHERE f.src_id < f.dst_id
"""


@query(
    "q228_mutual_knn",
    oracle=_mutual_knn_oracle(),
    tags=("similarity", "graph", "dedup"),
)
def q228_mutual_knn(spark, sf_dir):
    """Reciprocal-kNN filter over the q169 bounded graph (operators/
    graph.mutual_knn_pairs): keep pairs each side ranks in its own
    top-k -- the high-precision cut before semantic-dedup merges.
    One self-equi-join on the reversed edge key."""
    from ..operators.graph import mutual_knn_pairs
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
    return mutual_knn_pairs(graph)


# ---------------------------------------------------------------------------
# q229: association rules over order baskets
# ---------------------------------------------------------------------------

_AR_ORACLE = f"""
WITH di AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
                  CAST(l_partkey AS BIGINT) AS i
  FROM lineitem
),
sized AS (
  SELECT b, i FROM (
    SELECT b, i, COUNT(*) OVER (PARTITION BY b) AS sz FROM di
  ) WHERE sz <= 100
),
pairs AS (
  SELECT a.i AS antecedent, c.i AS consequent,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM sized a JOIN sized c ON c.b = a.b AND c.i <> a.i
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_AR_MIN_SUPPORT}
),
freq AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS c FROM sized GROUP BY i),
nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n FROM sized)
SELECT p.antecedent, p.consequent, p.support,
       fa.c AS c_a, fc.c AS c_b,
       CAST((p.support * 1000000) // fa.c AS BIGINT) AS conf_fp,
       CAST((((p.support * 1000000) // fa.c) * nb.n) // fc.c AS BIGINT)
         AS lift_fp
FROM pairs p
JOIN freq fa ON fa.i = p.antecedent
JOIN freq fc ON fc.i = p.consequent
CROSS JOIN nb
"""


@query(
    "q229_association_rules",
    oracle=_AR_ORACLE,
    tags=("itemsets", "rules", "analytics"),
)
def q229_association_rules(spark, sf_dir):
    """Directional association rules A -> B over order/part baskets
    (operators/itemsets.association_rules): exact fixed-point
    confidence and lift, basket-size-guarded pair join, support
    floor. q188's pair mining extended to the classic rule output."""
    from ..operators.itemsets import association_rules

    li = load_table(spark, sf_dir, "lineitem")
    return association_rules(
        li,
        "l_orderkey",
        "l_partkey",
        min_support=_AR_MIN_SUPPORT,
        max_basket=100,
    )


# ---------------------------------------------------------------------------
# q230: centered moving-average trend
# ---------------------------------------------------------------------------

_TREND_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT day, n,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_frame,
       CAST((SUM(n) OVER w * 1000) // (COUNT(*) OVER w) AS BIGINT)
         AS trend_milli,
       CAST(n * 1000 - (SUM(n) OVER w * 1000) // (COUNT(*) OVER w)
            AS BIGINT) AS detrended_milli
FROM daily
WINDOW w AS (ORDER BY day
             ROWS BETWEEN {_TREND_HALF} PRECEDING
             AND {_TREND_HALF} FOLLOWING)
"""


@query(
    "q230_trend_ma",
    oracle=_TREND_ORACLE,
    tags=("timeseries", "trend", "monitoring"),
)
def q230_trend_ma(spark, sf_dir):
    """Centered moving-average trend of daily event volumes
    (operators/timeseries.centered_moving_trend): the trend half of
    an STL-style decomposition (q216 is the seasonal half), exact
    milli fixed point over a ROWS frame."""
    from ..operators.timeseries import centered_moving_trend

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return centered_moving_trend(daily, "day", "n", half_window=_TREND_HALF)


# ---------------------------------------------------------------------------
# q231: audio zero-crossing rate (real codec chain)
# ---------------------------------------------------------------------------

_ZCR_ORACLE = f"""
WITH s AS (
  SELECT d.doc_id, i,
         CAST(((d.doc_id * 31 + i * 17) % 4001) - 2000 AS BIGINT) AS cur,
         CAST(((d.doc_id * 31 + (i - 1) * 17) % 4001) - 2000 AS BIGINT)
           AS prv
  FROM documents d CROSS JOIN range(0, 1000) t(i)
  WHERE d.doc_id < {_ZCR_DOCS}
)
SELECT doc_id,
       CAST(i // {_ZCR_FRAME} AS BIGINT) AS frame_idx,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN prv * cur < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS crossings,
       CAST((SUM(CASE WHEN prv * cur < 0 THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS zcr_fp
FROM s
WHERE i >= 1 AND i % {_ZCR_FRAME} != 0
GROUP BY doc_id, i // {_ZCR_FRAME}
"""


@query(
    "q231_audio_zcr",
    oracle=_ZCR_ORACLE,
    tags=("multimodal", "audio", "windowing"),
)
def q231_audio_zcr(spark, sf_dir):
    """Per-frame zero-crossing rate through the REAL WAV chain
    (multimodal/binary_ops.audio_zero_crossings): q208's formula
    samples encode + decode, strict sign-change pairs count within
    frames (never across boundaries), zcr in exact 1e-6 fixed point
    -- the closed-form oracle certifies codec + framing + counting."""
    from ..multimodal.binary_ops import audio_zero_crossings
    from ..multimodal.wav_codec import encode_wav

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < _ZCR_DOCS)
    )

    def to_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [
                        encode_wav(
                            (
                                ((int(d) * 31 + np.arange(1000) * 17) % 4001)
                                - 2000
                            ).astype(np.int16),
                            8000,
                        )
                        for d in pdf["doc_id"]
                    ],
                }
            )

    wavs = docs.mapInPandas(to_wav, "doc_id long, content binary")
    return audio_zero_crossings(wavs, "doc_id", "content", _ZCR_FRAME)
