"""Second LLM-data-pipeline batch: dataset curation operators a training
pipeline needs beyond dedup/ANN -- deterministic splits, quality
filtering, winnowing fingerprints, vocabulary/TF-IDF, cohort analytics,
histogram stats, and bucketed embedding centroids.

Determinism: every score that feeds a filter or rank is integer-valued
(counts, fixed-point milli-scores, rounded cents) so thresholds compare
exactly in both engines; doubles appear only as one final division of
exact integer operands. TF-IDF uses a fixed-point integer idf surrogate
(milli-idf = (N*1000) div df) instead of ln(): natural logs are libm
calls whose last bit need not agree across engines, and rank order is
what a curation pipeline consumes anyway.

Scale shapes: one explode+groupBy shuffle for token stats (map-side
partial aggregation, uniform hash keys), broadcast scalars for corpus
counts, and the winnowing window-min built by zipping shifted slices
(O(w) array ops per row, no per-element upstream re-evaluation -- the
HOF pitfall documented in functions/text.shingles).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from ..functions.text import STOPWORDS, shingles, stopword_hits, tokens
from ..functions.vectors import SCALE, quantize_vec
from . import llm_ops as _llm_ops  # noqa: F401  q89's oracle embeds q54's
# SQL at decoration time, so q54 must be registered before this module's
# bodies run -- make the dependency explicit instead of relying on
# all_queries()'s import order.
from .registry import query

# ---------------------------------------------------------------------------
# Stats / sampling
# ---------------------------------------------------------------------------


@query(
    "q35_price_histogram",
    oracle="""
SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) // 500000 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(MIN(ROUND(l_extendedprice * 100)) AS BIGINT) AS min_cents,
       CAST(MAX(ROUND(l_extendedprice * 100)) AS BIGINT) AS max_cents
FROM lineitem
GROUP BY 1
""",
    tags=("agg", "histogram"),
)
def q35_price_histogram(spark, sf_dir):
    """Fixed-width histogram (5000-currency buckets) on exact cents --
    the one-shuffle equi-width histogram that replaces a sort-based
    binning at scale. Cents are rounded BEFORE bucketing so double
    representation error cannot move a boundary value across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.select(cents.alias("cents"))
        .groupBy((F.col("cents") / 500000).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


@query(
    "q47_hash_split",
    oracle="""
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
""",
    tags=("sampling", "split"),
)
def q47_hash_split(spark, sf_dir):
    """Deterministic train/val/test split by content-independent hash of
    the id (md5 hex prefix: <0xcc ~80%, <0xe6 ~10%, rest ~10%). The
    split is stable under repartitioning, re-runs, and engine swaps --
    the property random() splits lack -- and needs no shuffle beyond the
    final tiny aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    split = (
        F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
    )
    return docs.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# Quality filtering
# ---------------------------------------------------------------------------


@query(
    "q78_quality_score",
    oracle=r"""
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
              x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')))
              AS BIGINT) AS n_stop,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
             AS n_digits,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens, n_stop, n_digits, n_chars,
       (n_tokens BETWEEN 5 AND 2000
        AND n_stop * 20 >= n_tokens
        AND n_digits * 2 <= n_chars) AS keep
FROM m
""",
    tags=("text", "quality"),
)
def q78_quality_score(spark, sf_dir):
    """Heuristic quality filter (C4/Gopher-style rules): token count in
    range, >=5% stopwords, <=50% digits. Every ratio threshold is an
    integer cross-multiplication -- exact in any engine, no double
    comparison at the keep/drop boundary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    m = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        stopword_hits(tokens(F.lower(F.col("text"))), "en").alias("n_stop"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long").alias(
            "n_digits"
        ),
        F.length("text").cast("long").alias("n_chars"),
    )
    keep = (
        F.col("n_tokens").between(5, 2000)
        & (F.col("n_stop") * 20 >= F.col("n_tokens"))
        & (F.col("n_digits") * 2 <= F.col("n_chars"))
    )
    return m.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al., MOSS)
# ---------------------------------------------------------------------------

_WINNOW_W = 4  # window of consecutive shingle hashes; min per window


@query(
    "q79_winnowing_fingerprint",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '\s+')) AS tok,
         unnest(generate_series(1, len(string_split_regex(text, '\s+')))) AS i
  FROM documents
),
hashes AS (
  SELECT doc_id, i,
         md5(tok || ' ' || LEAD(tok, 1) OVER w) AS h,
         COUNT(*) OVER (PARTITION BY doc_id) - 1 AS n_h
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
winmins AS (
  -- the i-range filter must come AFTER the window evaluates: filtering
  -- first would remove the FOLLOWING rows from end-of-doc frames and
  -- truncate their minima
  SELECT doc_id, i, n_h,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
             AS wm
  FROM hashes
  WHERE h IS NOT NULL
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(DISTINCT wm) AS BIGINT) AS n_fingerprints,
         MIN(wm) AS min_fingerprint
  FROM winmins
  WHERE i <= n_h - {_WINNOW_W - 1}
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_fingerprints, 0) AS n_fingerprints,
       a.min_fingerprint
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
""",
    tags=("dedup", "fingerprint", "winnowing"),
)
def q79_winnowing_fingerprint(spark, sf_dir):
    """Winnowing document fingerprints: hash 2-gram shingles, take the
    minimum of every w=4 consecutive hashes, keep the distinct minima.
    Guarantees a shared fingerprint for any sufficiently long common
    substring -- the classic local fingerprinting scheme. Everything is
    row-local array math (zipped shifted slices for the window min): NO
    shuffle at all until a downstream join on fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    hashes = F.transform(shingles(tokens("text"), n=2), lambda s: F.md5(s))
    docs = docs.select("doc_id", hashes.alias("hs"))
    cnt = F.greatest(F.size("hs") - (_WINNOW_W - 1), F.lit(0))
    mins = F.slice("hs", 1, cnt)
    for j in range(1, _WINNOW_W):
        mins = F.zip_with(
            mins,
            F.slice("hs", j + 1, cnt),
            lambda a, b: F.least(a, b),
        )
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(mins)).cast("long").alias("n_fingerprints"),
        F.array_min(mins).alias("min_fingerprint"),
    )


# ---------------------------------------------------------------------------
# Vocabulary / TF-IDF
# ---------------------------------------------------------------------------


@query(
    "q80_vocab_topk",
    oracle=r"""
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents)
GROUP BY tok
ORDER BY n DESC, token
LIMIT 100
""",
    tags=("text", "vocab", "topk"),
)
def q80_vocab_topk(spark, sf_dir):
    """Corpus vocabulary: lowercased token counts, top 100. One
    explode+groupBy shuffle with map-side partials (token keys are
    near-uniform), then a driver-sized top-k with a total order."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(100)
    )


@query(
    "q81_tfidf_topterms",
    oracle=r"""
WITH tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
),
df AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok AS token, tf.tf,
         tf.tf * ((n.n_docs * 1000) // df.df) AS score_milli
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tf, score_milli,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score_milli DESC, token) AS BIGINT) AS rn
  FROM scored
)
SELECT doc_id, token, tf, score_milli, rn
FROM ranked WHERE rn <= 3
""",
    tags=("text", "tfidf"),
)
def q81_tfidf_topterms(spark, sf_dir):
    """Top-3 TF-IDF terms per document with a FIXED-POINT idf surrogate
    (milli-idf = (N*1000) div df): integer scores rank identically in
    any engine, where ln()-based idf could flip ties by one ulp. Two
    shuffles (tf groupBy, df groupBy) + one broadcast scalar."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.expr("tf * ((n_docs * 1000) div df)").alias("score_milli"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score_milli"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# Cohort analytics over events
# ---------------------------------------------------------------------------


@query(
    "q82_retention_cohort",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
  FROM events GROUP BY user_id
)
SELECT f.cohort_date,
       CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS BIGINT)
           AS day_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN firsts f ON e.user_id = f.user_id
WHERE date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) <= 7
GROUP BY 1, 2
""",
    tags=("events", "cohort"),
)
def q82_retention_cohort(spark, sf_dir):
    """Retention cohorts: users grouped by first-seen date, activity
    counted per day offset 0..7. The firsts aggregate is one shuffle on
    user_id; the join back is on the same key (co-partitioned, AQE can
    keep it local); the final rollup is tiny."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    firsts = ev.groupBy("user_id").agg(F.min("event_date").alias("cohort_date"))
    return (
        ev.join(firsts, "user_id")
        .withColumn(
            "day_offset",
            F.datediff(F.col("event_date"), F.col("cohort_date")).cast("long"),
        )
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_date", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Embedding infrastructure: bucketed centroids
# ---------------------------------------------------------------------------


@query(
    "q83_embedding_centroids",
    oracle=f"""
WITH qv AS (
  SELECT vec_id % 8 AS bucket,
         unnest(generate_series(1, len(embedding))) - 1 AS dim,
         unnest(list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(ROUND(x * {SCALE}) AS BIGINT))) AS q
  FROM embeddings
)
SELECT bucket, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(q) AS DOUBLE) / COUNT(*) / {SCALE} AS centroid
FROM qv GROUP BY 1, 2
""",
    tags=("similarity", "centroid"),
)
def q83_embedding_centroids(spark, sf_dir):
    """Per-bucket elementwise centroids (the k-means/IVF training
    primitive) over fixed-point components: exact integer dimension sums
    (associative -> map-side partials on a (bucket, dim) shuffle), one
    double division at the end. At 100 TB this is THE way to average
    vectors: never sum raw floats across an unordered shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        (F.col("vec_id") % 8).alias("bucket"),
        F.posexplode(quantize_vec(F.col("embedding"))).alias("dim", "q"),
    )
    return exploded.groupBy("bucket", F.col("dim").cast("long").alias("dim")).agg(
        F.sum("q").alias("sum_q"),
        F.count(F.lit(1)).alias("n_vecs"),
        (F.sum("q").cast("double") / F.count(F.lit(1)) / SCALE).alias("centroid"),
    )


# ---------------------------------------------------------------------------
# Dedup clustering: connected components
# ---------------------------------------------------------------------------


@query(
    "q88_connected_components",
    oracle="""
SELECT k AS node, CAST(((k // 10) % 10) * 10 AS BIGINT) AS component
FROM range(0, 200) t(k)
""",
    tags=("graph", "dedup", "iterative"),
)
def q88_connected_components(spark, sf_dir):
    """Connected components (operators/graph.py) on a known topology:
    twenty 10-node chains plus cross edges pairing chain b with chain
    b+10 -> components of 20 nodes whose min-id labels have the closed
    form the oracle states. Proves the iterative min-label propagation
    actually converges across multi-hop paths (diameter ~20)."""
    from ..operators.graph import connected_components

    ids = spark.range(200)
    chain = ids.filter(F.col("id") % 10 != 9).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    cross = spark.range(10).select(
        (F.col("id") * 10).alias("src"), (F.col("id") * 10 + 100).alias("dst")
    )
    # driver_threshold=0: this query IS the distributed-iteration proof
    cc = connected_components(chain.union(cross), driver_threshold=0)
    return cc.select(F.col("node"), F.col("component"))


def _dedup_cluster_oracle() -> str:
    from .registry import REGISTRY

    pair_sql = REGISTRY["q54_ngram_jaccard"].oracle
    return f"""
WITH RECURSIVE e AS (
  SELECT id_a AS a, id_b AS b FROM ({pair_sql}) p
  UNION
  SELECT id_b AS a, id_a AS b FROM ({pair_sql}) p
),
nodes AS (SELECT DISTINCT a AS node FROM e),
reach AS (
  SELECT node AS a, node AS b FROM nodes
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
)
SELECT a AS node, CAST(MIN(b) AS BIGINT) AS component FROM reach GROUP BY a
"""


@query(
    "q89_dedup_clusters",
    # q54 is registered by an earlier plans-module import, so its oracle
    # SQL can be embedded here at decoration time
    oracle=_dedup_cluster_oracle(),
    tags=("graph", "dedup", "iterative"),
)
def q89_dedup_clusters(spark, sf_dir):
    """End-to-end near-dup clustering: the n-gram Jaccard candidate
    pairs (q54) become duplicate CLUSTERS via connected components --
    the step that turns pairwise similarity into keep/drop groups. The
    oracle computes the same components with a recursive-CTE transitive
    closure (viable at oracle scale; the Spark side is the one that
    scales)."""
    from ..operators.graph import connected_components
    from .registry import REGISTRY

    pairs = REGISTRY["q54_ngram_jaccard"].spark(spark, sf_dir)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return connected_components(edges)


def _neardup_pipeline_oracle() -> str:
    """DuckDB replica of the full pipeline: MinHash sig -> LSH bands ->
    candidate pairs -> exact Jaccard verify (integer threshold) ->
    recursive-CTE transitive closure -> keeper per document."""
    from .llm_ops import _SHINGLE_CTE, _TOKS_CTE

    hashes = ",\n         ".join(
        f"MIN(md5('mh{i:02d}|' || shingle)) AS h{i:02d}" for i in range(8)
    )
    bands = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx,"
        f" md5(h{2*b:02d} || '|' || h{2*b+1:02d}) AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
WITH RECURSIVE {_TOKS_CTE}, {_SHINGLE_CTE},
sig AS (SELECT doc_id, {hashes} FROM sh GROUP BY doc_id),
bands AS (
  {bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.band_idx = b.band_idx
   AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
edges AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE i.n_common * 2 >= 1 * (sa.n_sh + sb.n_sh - i.n_common)
),
e AS (
  SELECT id_a AS a, id_b AS b FROM edges
  UNION
  SELECT id_b AS a, id_a AS b FROM edges
),
nodes AS (SELECT DISTINCT a AS node FROM e),
reach AS (
  SELECT node AS a, node AS b FROM nodes
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
),
labels AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a)
SELECT d.doc_id, CAST(COALESCE(l.component, d.doc_id) AS BIGINT) AS keeper_id
FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
"""


@query(
    "q90_neardup_pipeline",
    oracle=_neardup_pipeline_oracle(),
    tags=("dedup", "minhash", "lsh", "graph", "iterative", "pipeline"),
)
def q90_neardup_pipeline(spark, sf_dir):
    """The COMPLETE near-dup dedup pipeline as one declared query
    (operators/dedup.neardup_keepers): MinHash signatures -> LSH band
    candidates (equi-join) -> exact Jaccard verification restricted to
    candidates (equi-joins on (id, shingle) -- no all-pairs, no
    nested-loop stand-in) -> connected components -> keeper per
    document. Jaccard threshold 1/2 applied by integer
    cross-multiplication, so both engines compare exactly. Returns
    [doc_id, keeper_id] for every document; keeper_id != doc_id is the
    drop set."""
    from ..operators.dedup import neardup_keepers

    docs = load_table(spark, sf_dir, "documents")
    return neardup_keepers(docs, "text", "doc_id", threshold_num=1, threshold_den=2)
