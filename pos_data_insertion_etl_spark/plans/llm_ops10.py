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


# ---------------------------------------------------------------------------
# q189: exact set-similarity join via prefix filtering
# ---------------------------------------------------------------------------

_SETSIM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, md5(g) AS d FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
    FROM toks)
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT)
             AS n_common
  FROM sh a JOIN sh b ON a.d = b.d AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common, sa.n AS n_a, sb.n AS n_b,
       ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
           AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common * 2 >= 1 * (sa.n + sb.n - n_common)
"""


@query(
    "q189_setsim_prefix_join",
    oracle=_SETSIM_ORACLE,
    tags=("dedup", "jaccard", "similarity-join"),
)
def q189_setsim_prefix_join(spark, sf_dir):
    """Corpus-COMPLETE and EXACT Jaccard >= 0.5 similarity join via
    PPJoin-style prefix filtering (operators/setsim.py) -- the
    guaranteed-recall counterpart to q54's id-gap window and q55's
    probabilistic LSH. The oracle is a BRUTE-FORCE all-pairs join, so
    a hash match proves the prefix filter dropped no true pair."""
    from ..operators.setsim import prefix_filter_jaccard_join

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_join(
        docs, "doc_id", "text", n=3, t_num=1, t_den=2
    )


# ---------------------------------------------------------------------------
# q190/q191: BM25 retrieval + reciprocal-rank fusion
# ---------------------------------------------------------------------------

_BM25_QUERIES = (
    ("search_1", ("spark", "join")),
    ("search_2", ("window", "merge", "scan")),
    ("search_3", ("slow", "query")),
    ("search_4", ("stream", "batch", "data")),
)


def _bm25_query_df(spark):
    rows = [(qid, t) for qid, terms in _BM25_QUERIES for t in terms]
    return spark.createDataFrame(rows, "query_id string, term string")


def _bm25_values() -> str:
    return ", ".join(
        f"('{qid}', '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )


_BM25_CORE = r"""
qt(query_id, term) AS (VALUES {values}),
toks AS (
  SELECT doc_id AS _doc, unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM documents
),
lengths AS (SELECT _doc, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
corpus AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS t_total,
         CAST(CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS BIGINT)
             AS avgdl
  FROM lengths
),
tf AS (
  SELECT _doc, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
  WHERE w IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2
),
dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
st AS (
  SELECT tf._doc, tf.w,
         CAST((((c.n_docs * 1000000) // dfq.df) * 44 * tf.tf * c.avgdl)
              // (20 * c.avgdl * tf.tf + 6 * c.avgdl + 18 * l.dl)
              AS BIGINT) AS s_fp
  FROM tf JOIN dfq USING (w)
  JOIN lengths l ON l._doc = tf._doc
  CROSS JOIN corpus c
),
bm25 AS (
  SELECT query_id, _doc AS doc_id, score_fp,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score_fp DESC, _doc) AS BIGINT) AS rank
  FROM (SELECT qt.query_id, st._doc, CAST(SUM(s_fp) AS BIGINT) AS score_fp
        FROM st JOIN qt ON qt.term = st.w GROUP BY 1, 2) p
)
"""


def _bm25_oracle() -> str:
    core = _BM25_CORE.format(values=_bm25_values())
    return f"""
WITH {core}
SELECT query_id, doc_id, score_fp, rank FROM bm25 WHERE rank <= 10
"""


@query(
    "q190_bm25_topk",
    oracle=_bm25_oracle(),
    tags=("retrieval", "text", "topk"),
)
def q190_bm25_topk(spark, sf_dir):
    """Top-10 documents per query under exact-integer BM25
    (operators/bm25.py: rational k1=6/5, b=3/4, truncated avgdl, one
    floor division per term at 1e-6 idf resolution). Query terms
    broadcast; tf is one filtered (doc, term) groupBy; corpus stats
    are two broadcast scalars."""
    from ..operators.bm25 import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _bm25_query_df(spark), "doc_id", "text", k=10)


def _rrf_oracle() -> str:
    core = _BM25_CORE.format(values=_bm25_values())
    return f"""
WITH {core},
tfrank AS (
  SELECT query_id, doc_id, tf_sum,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY tf_sum DESC, doc_id) AS BIGINT) AS rank
  FROM (SELECT qt.query_id, tf._doc AS doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS tf_sum
        FROM tf JOIN qt ON qt.term = tf.w GROUP BY 1, 2) p
),
unioned AS (
  SELECT query_id, doc_id, rank FROM bm25 WHERE rank <= 10
  UNION ALL
  SELECT query_id, doc_id, rank FROM tfrank WHERE rank <= 10
),
fused AS (
  SELECT query_id, doc_id,
         CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_fp,
         CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM unioned GROUP BY 1, 2
)
SELECT query_id, doc_id, rrf_fp, n_lists,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rrf_fp DESC, doc_id) AS BIGINT) AS rank
FROM fused QUALIFY rank <= 10
"""


@query(
    "q191_rrf_fusion",
    oracle=_rrf_oracle(),
    tags=("retrieval", "fusion", "topk"),
)
def q191_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (operators/bm25.rrf_fuse, exact integer
    1e6 div (60+rank)) of two retrieval rankings for the same fixed
    queries: BM25 top-10 and raw term-frequency top-10. The fuse is
    one union + one (query, doc) groupBy + one rank window over
    driver-bounded inputs."""
    from pyspark.sql.window import Window as W

    from ..operators.bm25 import bm25_topk, rrf_fuse
    from ..functions.text import tokens as _tok

    docs = load_table(spark, sf_dir, "documents")
    qdf = _bm25_query_df(spark)
    bm = bm25_topk(docs, qdf, "doc_id", "text", k=10)
    toks = docs.select(
        F.col("doc_id"),
        F.explode(_tok(F.lower(F.col("text")))).alias("_w"),
    )
    tf = (
        toks.join(
            F.broadcast(qdf.select(F.col("term").alias("_w")).distinct()),
            "_w",
        )
        .groupBy("doc_id", "_w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tfsum = (
        tf.join(
            F.broadcast(qdf.select("query_id", F.col("term").alias("_w"))),
            "_w",
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tf").cast("long").alias("tf_sum"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("tf_sum"), "doc_id")
    tfrank = (
        tfsum.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )
    return rrf_fuse([bm, tfrank], k=10, c=60)


# ---------------------------------------------------------------------------
# q192: k-core peeling over the kNN graph
# ---------------------------------------------------------------------------


def _kcore_oracle(k: int, iters: int) -> str:
    parts = [
        f"""
WITH g AS ({_graph_cte()}),
e0 AS (
  SELECT DISTINCT least(src_id, dst_id) AS a, greatest(src_id, dst_id) AS b
  FROM g WHERE src_id != dst_id
)"""
    ]
    for t in range(iters):
        parts.append(
            f""",
d{t} AS (SELECT n, COUNT(*) AS d FROM (
    SELECT a AS n FROM e{t} UNION ALL SELECT b FROM e{t}) u GROUP BY 1),
k{t} AS (SELECT n FROM d{t} WHERE d >= {k}),
e{t + 1} AS (
  SELECT e.a, e.b FROM e{t} e
  JOIN k{t} x ON x.n = e.a JOIN k{t} y ON y.n = e.b
)"""
        )
    parts.append(
        f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
  SELECT a AS node FROM e{iters} UNION ALL SELECT b AS node FROM e{iters}) u
GROUP BY 1
"""
    )
    return "".join(parts)


@query(
    "q192_kcore",
    oracle=_kcore_oracle(2, 3),
    tags=("graph", "analytics", "iterative"),
)
def q192_kcore(spark, sf_dir):
    """Three peeling rounds toward the 2-core of the undirected kNN
    graph (operators/graph.kcore): per round one degree groupBy + two
    left-semi joins on node keys, lineage cut per round. Fixed peel
    count keeps it oracle-replayable; the oracle unrolls all three
    rounds over the q169 graph CTE."""
    from ..operators.graph import kcore
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
    return kcore(graph, k=2, iters=3)


# ---------------------------------------------------------------------------
# q193: cross-source contamination matrix
# ---------------------------------------------------------------------------

_SOURCE_OVERLAP_ORACLE = r"""
WITH toks AS (
  SELECT source, string_split_regex(lower(text), '\s+') AS t FROM documents
),
sd AS (
  SELECT DISTINCT source AS s, md5(g) AS d FROM (
    SELECT source,
           unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
    FROM toks)
),
sizes AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM sd GROUP BY 1),
pairs AS (
  SELECT a.s AS source_a, b.s AS source_b, CAST(COUNT(*) AS BIGINT)
             AS n_common
  FROM sd a JOIN sd b ON a.d = b.d AND a.s < b.s
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_common, sa.n AS n_a, sb.n AS n_b,
       CAST((n_common * 1000) // (sa.n + sb.n - n_common) AS BIGINT)
           AS jaccard_milli,
       CAST((n_common * 1000) // least(sa.n, sb.n) AS BIGINT)
           AS containment_milli
FROM pairs
JOIN sizes sa ON sa.s = source_a
JOIN sizes sb ON sb.s = source_b
"""


@query(
    "q193_source_overlap",
    oracle=_SOURCE_OVERLAP_ORACLE,
    tags=("text", "contamination", "audit"),
)
def q193_source_overlap(spark, sf_dir):
    """Cross-source n-gram contamination matrix
    (operators/text_mining.source_ngram_overlap): exact Jaccard +
    containment between every source pair's distinct trigram sets.
    Digest-keyed joins; per-digest fan-out bounded by S^2 over the
    SOURCE count, never the document count."""
    from ..operators.text_mining import source_ngram_overlap

    docs = load_table(spark, sf_dir, "documents")
    return source_ngram_overlap(docs, "source", "text", n=3)
