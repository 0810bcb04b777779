"""Round-7 additions past the r6 queue (q182-q188): iterative and
graph-analytic shapes the inventory lacked.

* q182 -- distributed Lloyd k-means (operators/clustering.py): the
  iterative broadcast-assign/reduce-update template, made RNG-free and
  fixed-point so the oracle UNROLLS both Lloyd rounds in portable SQL
  (init, two assignment+update rounds, final assignment -- an exact
  independent re-derivation, the q144-funnel standard).
* q183/q184 -- consumers of the bounded kNN graph (q169): one-hop
  majority label propagation and an exact triangle census. Both wrap
  the q169 oracle as a CTE, so the whole composed pipeline replays
  bit-for-bit in DuckDB.
* q185 -- dyadic EWMA (operators/timeseries.py): finite-horizon
  exponential smoothing with power-of-two weights -- the construction
  that makes float smoothing engine-portable (each product is an
  exponent shift; one fixed left-associated sum).
* q186/q187 -- corpus-mining (operators/text_mining.py): first-
  occurrence n-gram novelty in corpus order, and collocation mining
  with exact-integer ranking + fixed-order IEEE lift.
* q188 -- market-basket co-purchase pairs over lineitem
  (operators/itemsets.py): basket-keyed self-join with a basket-size
  guard, the relational sibling of q187.

Reference scope note: the reference ETL (main.py:181-211) delegates
all analytics to opaque stored procedures; these operators are the
LLM-data-pipeline surface the brief adds on top, expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_K = 4
_ITERS = 2
_EWMA_TAPS = 8


# ---------------------------------------------------------------------------
# q182: Lloyd k-means, exact unrolled oracle
# ---------------------------------------------------------------------------


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unroll `iters` Lloyd rounds as CTE chains (assignment -> explode
    -> truncated-mean update -> carried centroids), mirroring
    operators/clustering.lloyd_kmeans step for step."""
    dist = (
        "CAST(list_sum(list_transform(list_zip(q.v, c.v),"
        " p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
    )
    parts = [
        """
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT) + 10000000)
             AS v
  FROM embeddings
),
c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                 vec_id) AS INTEGER) AS j, v
  FROM qv QUALIFY j <= %d
)""" % k
    ]
    for t in range(iters + 1):
        parts.append(
            f""",
a{t} AS (
  SELECT vec_id, j, d FROM (
    SELECT vec_id, j, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn
    FROM (SELECT q.vec_id, c.j, {dist} AS d
          FROM qv q CROSS JOIN c{t} c) d{t}) r{t}
  WHERE rn = 1
)"""
        )
        if t == iters:
            break
        parts.append(
            f""",
e{t} AS (
  SELECT a{t}.j, generate_subscripts(q.v, 1) AS i, unnest(q.v) AS x
  FROM a{t} JOIN qv q USING (vec_id)
),
u{t} AS (
  SELECT j, i, CAST(SUM(x) // COUNT(*) AS BIGINT) AS cx
  FROM e{t} GROUP BY j, i
),
c{t + 1} AS (
  SELECT c{t}.j, COALESCE(u.v, c{t}.v) AS v
  FROM c{t} LEFT JOIN (SELECT j, list(cx ORDER BY i) AS v
                       FROM u{t} GROUP BY j) u USING (j)
)"""
        )
    parts.append(
        f"""
SELECT vec_id, CAST(j AS INTEGER) AS cluster, d AS dist FROM a{iters}"""
    )
    return "".join(parts)


@query(
    "q182_kmeans_lloyd",
    oracle=_kmeans_oracle(_K, _ITERS),
    tags=("clustering", "iterative", "embeddings"),
)
def q182_kmeans_lloyd(spark, sf_dir):
    """Two full Lloyd rounds of k=4 k-means over the embedding corpus
    (operators/clustering.lloyd_kmeans): assignment is a pure
    projection against k*dim literal centroids (no join, no shuffle,
    whole-stage codegen); each update is ONE k*dim-group shuffle with
    map-side combine and a codebook-sized collect. Fixed-point shifted
    integers end to end, so the DuckDB oracle replays both rounds
    exactly."""
    from ..operators.clustering import lloyd_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    return lloyd_kmeans(emb, "vec_id", "embedding", k=_K, iters=_ITERS)


# ---------------------------------------------------------------------------
# q183/q184: kNN-graph consumers (label propagation, triangle census)
# ---------------------------------------------------------------------------


def _graph_cte() -> str:
    from .llm_ops9 import _knn_graph_oracle

    return _knn_graph_oracle()


def _label_prop_oracle() -> str:
    return f"""
WITH g AS ({_graph_cte()}),
votes AS (
  SELECT g.src_id, e.label AS nb_label, CAST(COUNT(*) AS BIGINT) AS votes
  FROM g JOIN embeddings e ON e.vec_id = g.dst_id
  GROUP BY 1, 2
),
best AS (
  SELECT src_id, nb_label, votes,
         ROW_NUMBER() OVER (PARTITION BY src_id
                            ORDER BY votes DESC, nb_label) AS rn,
         CAST(SUM(votes) OVER (PARTITION BY src_id) AS BIGINT)
             AS n_neighbors
  FROM votes
)
SELECT b.src_id AS node, e.label AS own_label, b.nb_label AS voted_label,
       b.votes, b.n_neighbors, b.nb_label != e.label AS changed
FROM best b JOIN embeddings e ON e.vec_id = b.src_id
WHERE b.rn = 1
"""


@query(
    "q183_label_propagation",
    oracle=_label_prop_oracle(),
    tags=("graph", "similarity", "semi-supervised"),
)
def q183_label_propagation(spark, sf_dir):
    """One majority-vote hop over the BOUNDED kNN graph (q169's exact
    construction feeds operators/graph.label_propagation_majority):
    label-join on dst, one (src, label) count shuffle, per-src argmax
    window, own-label join back. Everything O(N * k) because the graph
    degree is capped; the oracle replays graph + vote end to end."""
    from ..operators.graph import label_propagation_majority
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
    return label_propagation_majority(
        graph, emb.select("vec_id", "label"), "vec_id", "label"
    )


def _triangle_oracle() -> str:
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
  SELECT w.a FROM wedge w
  WHERE EXISTS (SELECT 1 FROM und u WHERE u.a = w.a AND u.b = w.c)
),
nodes AS (SELECT a AS n FROM und UNION SELECT b FROM und)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles
"""


@query(
    "q184_triangle_count",
    oracle=_triangle_oracle(),
    tags=("graph", "analytics"),
)
def q184_triangle_count(spark, sf_dir):
    """Exact triangle census of the undirected kNN graph
    (operators/graph.triangle_count): canonical a<b edges, one
    edge-edge equi-join enumerating each triangle once as a<b<c, a
    left-semi closing-edge check. Join fan-out is bounded by the
    graph's degree cap (O(N * k^2) wedges), never all-pairs."""
    from ..operators.graph import triangle_count
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
    return triangle_count(graph)


# ---------------------------------------------------------------------------
# q185: dyadic EWMA over events
# ---------------------------------------------------------------------------


def _ewma_oracle(taps: int) -> str:
    terms = ["value * CAST(0.5 AS DOUBLE)"]
    for i in range(1, taps):
        w = 2.0 ** -(i + 1)
        terms.append(f"lag(value, {i}) OVER w * CAST({w!r} AS DOUBLE)")
    norm = 1.0 - 2.0**-taps
    chain = " + ".join(terms)
    return f"""
SELECT user_id, event_id,
       CASE WHEN ROW_NUMBER() OVER w >= {taps}
            THEN ({chain}) / CAST({norm!r} AS DOUBLE)
       END AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query(
    "q185_ewma_dyadic",
    oracle=_ewma_oracle(_EWMA_TAPS),
    tags=("timeseries", "window", "events"),
)
def q185_ewma_dyadic(spark, sf_dir):
    """Per-user exponentially weighted moving average of event values
    (operators/timeseries.ewma_dyadic): 8-tap dyadic weights make
    every product exact and the one fixed-order sum bit-identical
    across engines; warm-up rows are NULL. One per-key window, no
    joins."""
    from ..operators.timeseries import ewma_dyadic

    ev = load_table(spark, sf_dir, "events")
    return ewma_dyadic(
        ev, "user_id", ["ts", "event_id"], "value", taps=_EWMA_TAPS
    ).select("user_id", "event_id", "ewma")


# ---------------------------------------------------------------------------
# q186/q187: corpus mining (novelty, collocations)
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, md5(g) AS d FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
    FROM toks)
),
fo AS (SELECT d, MIN(doc_id) AS f FROM grams GROUP BY d),
per AS (
  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN fo.f = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS novel
  FROM grams g JOIN fo USING (d) GROUP BY g.doc_id
)
SELECT doc.doc_id,
       COALESCE(per.n_grams, 0) AS n_grams,
       COALESCE(per.novel, 0) AS novel,
       CAST((per.novel * 1000) // per.n_grams AS BIGINT) AS novelty_milli
FROM documents doc LEFT JOIN per USING (doc_id)
"""


@query(
    "q186_ngram_novelty",
    oracle=_NOVELTY_ORACLE,
    tags=("text", "dedup", "novelty"),
)
def q186_ngram_novelty(spark, sf_dir):
    """Corpus-order trigram novelty per document
    (operators/text_mining.ngram_novelty): fraction of the doc's
    distinct trigrams first seen in this doc. Grams shuffle as md5
    digests only (q154 convention); one min-groupBy + one digest join
    + one per-doc groupBy."""
    from ..operators.text_mining import ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(docs, "doc_id", "text", n=3)


_COLLOCATION_ORACLE = r"""
WITH toks AS (
  SELECT string_split_regex(lower(text), '\s+') AS t FROM documents
),
uni AS (
  SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS c_w
  FROM (SELECT unnest(t) AS u FROM toks) GROUP BY 1
),
bi AS (
  SELECT g AS bigram, CAST(COUNT(*) AS BIGINT) AS c_ab FROM (
    SELECT unnest(list_transform(range(1, len(t)),
                  i -> t[i] || ' ' || t[i+1])) AS g
    FROM toks) GROUP BY 1
),
tt AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS t_total FROM bi),
scored AS (
  SELECT bi.bigram, bi.c_ab, a.c_w AS c_a, b.c_w AS c_b,
         CAST(bi.c_ab AS DOUBLE) * tt.t_total / a.c_w / b.c_w AS lift
  FROM bi CROSS JOIN tt
  JOIN uni a ON a.w = split_part(bi.bigram, ' ', 1)
  JOIN uni b ON b.w = split_part(bi.bigram, ' ', 2)
)
SELECT bigram, c_ab, c_a, c_b, lift,
       CAST(ROW_NUMBER() OVER (ORDER BY c_ab DESC, bigram) AS BIGINT) AS rn
FROM scored QUALIFY rn <= 50
"""


@query(
    "q187_bigram_collocations",
    oracle=_COLLOCATION_ORACLE,
    tags=("text", "collocations"),
)
def q187_bigram_collocations(spark, sf_dir):
    """Top-50 adjacent-token collocations with exact-integer ranking
    and fixed-order IEEE lift (operators/text_mining
    .bigram_collocations). Two token-keyed groupBys, one join back,
    one broadcast scalar, TakeOrderedAndProject top-k."""
    from ..operators.text_mining import bigram_collocations

    docs = load_table(spark, sf_dir, "documents")
    return bigram_collocations(docs, "text", top=50)


# ---------------------------------------------------------------------------
# q188: market-basket co-purchase pairs
# ---------------------------------------------------------------------------

_COPURCHASE_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
),
sized AS (
  SELECT b, i FROM (
    SELECT b, i, COUNT(*) OVER (PARTITION BY b) AS sz FROM items) t
  WHERE sz <= 100
),
nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_baskets FROM sized),
freq AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS c FROM sized GROUP BY i),
pairs AS (
  SELECT x.i AS item1, y.i AS item2, CAST(COUNT(*) AS BIGINT) AS support
  FROM sized x JOIN sized y ON x.b = y.b AND x.i < y.i
  GROUP BY 1, 2
),
scored AS (
  SELECT p.item1, p.item2, p.support, fa.c AS c_a, fb.c AS c_b,
         CAST(p.support AS DOUBLE) * nb.n_baskets / fa.c / fb.c AS lift
  FROM pairs p CROSS JOIN nb
  JOIN freq fa ON fa.i = p.item1
  JOIN freq fb ON fb.i = p.item2
)
SELECT item1, item2, support, c_a, c_b, lift,
       CAST(ROW_NUMBER() OVER (ORDER BY support DESC, item1, item2)
            AS BIGINT) AS rn
FROM scored QUALIFY rn <= 50
"""


@query(
    "q188_copurchase_pairs",
    oracle=_COPURCHASE_ORACLE,
    tags=("itemsets", "relational", "pairs"),
)
def q188_copurchase_pairs(spark, sf_dir):
    """Top-50 co-ordered part pairs across orders
    (operators/itemsets.copurchase_pairs): basket-keyed self-join with
    item1 < item2 and a basket-size guard (pair fan-out is
    size-choose-2, never corpus-squared), exact support ranking +
    fixed-order lift."""
    from ..operators.itemsets import copurchase_pairs

    li = load_table(spark, sf_dir, "lineitem")
    return copurchase_pairs(li, "l_orderkey", "l_partkey", top=50, max_basket=100)
