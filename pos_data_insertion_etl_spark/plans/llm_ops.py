"""LLM-data-pipeline query inventory: deduplication, similarity search,
text analysis (north-star additions beyond the reference's own surface,
per BASELINE.json).

Oracle-portability tricks:
* MinHash h_i = min(md5(salt_i || shingle)): md5 hex is fixed-length so
  string MIN == numeric min -- expressible in both engines.
* SimHash bits come from md5 hex digits (+1 if digit >= '8').
* Embedding cosine uses 1e-7 fixed-point integer dot products (see
  functions/vectors.py) so sums are order-independent.
* DuckDB gets token positions via the paired-unnest zip
  (unnest(list) + unnest(generate_series)) and LEAD() windows for
  shingles; Spark uses transform/filter higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import STOPWORDS, fingerprint, stopword_hits, tokens
from ..operators.dedup import (
    doc_shingles,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash16,
)
from ..operators.similarity import cosine_topk, lsh_bucket_topk
from .registry import query

# Shared DuckDB CTEs -----------------------------------------------------

_TOKS_CTE = r"""
toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '\s+')) AS tok,
         unnest(generate_series(1, len(string_split_regex(text, '\s+')))) AS i
  FROM documents
)
"""

_SHINGLE_CTE = r"""
sh0 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL)
"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "q50_dedup_exact",
    oracle="""
SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents GROUP BY sha256(text)
""",
    tags=("dedup", "exact"),
)
def q50_dedup_exact(spark, sf_dir):
    """Exact dedup grouping on sha2(text, 256) so the shuffle key is a
    64-char digest, not the document body (operators/dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


@query(
    "q51_dedup_fingerprint",
    oracle=r"""
SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
       MIN(doc_id) AS keeper_id, COUNT(*) AS n_docs
FROM documents GROUP BY 1
""",
    tags=("dedup", "fingerprint"),
)
def q51_dedup_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("doc_id"), fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "q54_ngram_jaccard",
    oracle=f"""
WITH {_TOKS_CTE}, {_SHINGLE_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
   AND b.doc_id - a.doc_id <= 20
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common,
       ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6)
           AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
""",
    tags=("dedup", "jaccard", "range_join"),
)
def q54_ngram_jaccard(spark, sf_dir):
    """Near-dup via exact word-trigram Jaccard on id-bounded candidates."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "text", "doc_id", n=3, max_id_gap=20)


def _minhash_oracle() -> str:
    hashes = ",\n         ".join(
        f"MIN(md5('mh{i:02d}|' || shingle)) AS h{i:02d}" for i in range(8)
    )
    bands = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx,"
        f" md5(h{2*b:02d} || '|' || h{2*b+1:02d}) AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
WITH {_TOKS_CTE}, {_SHINGLE_CTE},
sig AS (
  SELECT doc_id,
         {hashes}
  FROM sh GROUP BY doc_id
),
bands AS (
  {bands}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_band_hits
FROM bands a JOIN bands b
  ON a.band_key = b.band_key AND a.band_idx = b.band_idx
 AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


@query("q55_minhash_lsh", oracle=_minhash_oracle(), tags=("dedup", "minhash", "lsh"))
def q55_minhash_lsh(spark, sf_dir):
    """MinHash + LSH banding: near-dup candidates as an equi-join.
    Signatures are computed row-wise (map-only); the band join is the
    only shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, "text", "doc_id", n_hashes=8)
    return lsh_candidate_pairs(sig, "doc_id", n_hashes=8, band_size=2)


def _simhash_oracle() -> str:
    hexhi = "'8','9','a','b','c','d','e','f'"
    sums = ",\n         ".join(
        f"SUM(CASE WHEN substr(md5(tok), {j + 1}, 1) IN ({hexhi})"
        f" THEN 1 ELSE -1 END) AS s{j:02d}"
        for j in range(16)
    )
    bits = " || ".join(
        f"(CASE WHEN s{j:02d} >= 0 THEN '1' ELSE '0' END)" for j in range(16)
    )
    return f"""
WITH {_TOKS_CTE},
sums AS (
  SELECT doc_id,
         {sums}
  FROM toks GROUP BY doc_id
)
SELECT doc_id, {bits} AS simhash FROM sums
"""


@query("q56_simhash", oracle=_simhash_oracle(), tags=("dedup", "simhash"))
def q56_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return simhash16(docs, "text", "doc_id")


def _minhash_estimate_oracle() -> str:
    hashes = ",\n         ".join(
        f"MIN(md5('mh{i:02d}|' || shingle)) AS h{i:02d}" for i in range(8)
    )
    agree = " + ".join(
        f"(CASE WHEN a.h{i:02d} = b.h{i:02d} THEN 1 ELSE 0 END)" for i in range(8)
    )
    return f"""
WITH {_TOKS_CTE}, {_SHINGLE_CTE},
sig AS (
  SELECT doc_id,
         {hashes}
  FROM sh GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({agree} AS BIGINT) AS n_agree,
       CAST({agree} AS DOUBLE) / 8 AS jaccard_est
FROM sig a JOIN sig b
  ON a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 10
"""


@query(
    "q74_minhash_estimate",
    oracle=_minhash_estimate_oracle(),
    tags=("dedup", "minhash", "estimate"),
)
def q74_minhash_estimate(spark, sf_dir):
    """Jaccard ESTIMATE from MinHash signature agreement (the sketch's
    actual payoff: similarity without touching the shingle sets again).
    Pairs bounded by id gap (plans a nested loop; kept for oracle
    parity) -- the scale form with LSH bands as the pair source is
    q96_minhash_estimate_banded."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, "text", "doc_id", n_hashes=8)
    a, b = sig.alias("a"), sig.alias("b")
    agree = sum(
        F.when(F.col(f"a.h{i:02d}") == F.col(f"b.h{i:02d}"), 1).otherwise(0)
        for i in range(8)
    )
    return (
        a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & ((F.col("b.doc_id") - F.col("a.doc_id")) <= 10),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            agree.cast("long").alias("n_agree"),
            (agree.cast("double") / 8).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_COSINE_ORACLE = """
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT)) AS v
  FROM embeddings
),
comp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         unnest(q.v) AS qx, unnest(c.v) AS cx
  FROM qv q JOIN qv c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 10
),
dots AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(qx * cx) AS BIGINT) AS dot,
         CAST(SUM(qx * qx) AS BIGINT) AS qq,
         CAST(SUM(cx * cx) AS BIGINT) AS cc
  FROM comp GROUP BY 1, 2
),
sims AS (
  SELECT query_id, neighbor_id,
         ROUND(CAST(dot AS DOUBLE)
               / (SQRT(CAST(qq AS DOUBLE)) * SQRT(CAST(cc AS DOUBLE))), 6)
             AS cos_sim
  FROM dots
)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS BIGINT)
             AS rn
  FROM sims) t
WHERE rn <= 5
"""


@query("q57_cosine_topk", oracle=_COSINE_ORACLE, tags=("similarity", "ann"))
def q57_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast queries, one corpus scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    )


_IVF_ORACLE = """
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT)) AS v
  FROM embeddings
),
cent AS (SELECT vec_id AS cid, v AS cv FROM qv WHERE vec_id < 8),
ac AS (SELECT q.vec_id, c.cid, unnest(q.v) AS vx, unnest(c.cv) AS cx
       FROM qv q CROSS JOIN cent c),
ad AS (SELECT vec_id, cid,
              CAST(SUM(vx * cx) AS BIGINT) AS dot,
              CAST(SUM(vx * vx) AS BIGINT) AS vv,
              CAST(SUM(cx * cx) AS BIGINT) AS cc
       FROM ac GROUP BY 1, 2),
asim AS (SELECT vec_id, cid,
                ROUND(CAST(dot AS DOUBLE)
                      / (SQRT(CAST(vv AS DOUBLE)) * SQRT(CAST(cc AS DOUBLE))), 6)
                    AS sim
         FROM ad),
assign AS (SELECT vec_id, cid AS cluster FROM (
             SELECT vec_id, cid,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, cid) AS rn
             FROM asim) t WHERE rn = 1),
pairs AS (SELECT q.vec_id AS query_id, m.vec_id AS neighbor_id
          FROM assign q JOIN assign m
            ON q.cluster = m.cluster AND m.vec_id != q.vec_id
          WHERE q.vec_id BETWEEN 100 AND 109),
pc AS (SELECT p.query_id, p.neighbor_id, unnest(a.v) AS qx, unnest(b.v) AS nx
       FROM pairs p JOIN qv a ON a.vec_id = p.query_id
                    JOIN qv b ON b.vec_id = p.neighbor_id),
pd AS (SELECT query_id, neighbor_id,
              CAST(SUM(qx * nx) AS BIGINT) AS dot,
              CAST(SUM(qx * qx) AS BIGINT) AS qq,
              CAST(SUM(nx * nx) AS BIGINT) AS nn
       FROM pc GROUP BY 1, 2),
psim AS (SELECT query_id, neighbor_id,
                ROUND(CAST(dot AS DOUBLE)
                      / (SQRT(CAST(qq AS DOUBLE)) * SQRT(CAST(nn AS DOUBLE))), 6)
                    AS cos_sim
         FROM pd)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS BIGINT)
             AS rn
  FROM psim) t
WHERE rn <= 3
"""


@query("q75_ann_ivf", oracle=_IVF_ORACLE, tags=("similarity", "ann", "ivf"))
def q75_ann_ivf(spark, sf_dir):
    """IVF-style ANN: assign to nearest of 8 deterministic centroids,
    probe only the query's cluster (nprobe=1)."""
    from ..operators.similarity import ivf_topk
    from ..functions.vectors import quantize_vec

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), quantize_vec(F.col("embedding")).alias("cv")
    )
    return ivf_topk(
        emb,
        "vec_id",
        "embedding",
        centroids,
        query_pred=lambda c: c.between(100, 109),
        k=3,
    )


_LSH_AXIS_ORACLE = """
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT)) AS v,
         list_reduce(
             list_transform(CAST(embedding AS DOUBLE[])[1:8],
                            x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END),
             (a, b) -> a || b) AS bucket
  FROM embeddings
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM qv q JOIN qv c ON c.bucket = q.bucket
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
),
pc AS (SELECT p.query_id, p.neighbor_id, unnest(a.v) AS qx, unnest(b.v) AS nx
       FROM pairs p JOIN qv a ON a.vec_id = p.query_id
                    JOIN qv b ON b.vec_id = p.neighbor_id),
pd AS (SELECT query_id, neighbor_id,
              CAST(SUM(qx * nx) AS BIGINT) AS dot,
              CAST(SUM(qx * qx) AS BIGINT) AS qq,
              CAST(SUM(nx * nx) AS BIGINT) AS nn
       FROM pc GROUP BY 1, 2),
psim AS (SELECT query_id, neighbor_id,
                ROUND(CAST(dot AS DOUBLE)
                      / (SQRT(CAST(qq AS DOUBLE)) * SQRT(CAST(nn AS DOUBLE))), 6)
                    AS cos_sim
         FROM pd)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS BIGINT)
             AS rn
  FROM psim) t
WHERE rn <= 5
"""


@query(
    "q58_ann_lsh_bucket",
    oracle=_LSH_AXIS_ORACLE,
    tags=("similarity", "ann", "lsh"),
)
def q58_ann_lsh_bucket(spark, sf_dir):
    """Scale path: sign-LSH bucketed ANN. Approximate vs exact top-k,
    but DETERMINISTIC: the axis-sign bucket bits are raw float-sign
    tests and the candidate ranking is fixed-point cosine, so the whole
    pipeline replays in SQL and hash-matches (the oracle rebuilds the
    same buckets, candidates, and ranks -- closing the r5 `no_oracle`
    row; VERDICT r5 item 2). Seeded-Gaussian-plane form: q124."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_bucket_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "q52_token_stats",
    oracle=r"""
SELECT doc_id,
       CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS BIGINT)
           AS n_distinct_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
           AS n_nonspace_chars,
       CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
           / len(string_split_regex(text, '\s+')) AS avg_token_len
FROM documents
""",
    tags=("text", "tokens"),
)
def q52_token_stats(spark, sf_dir):
    """Token counting + quality-scoring inputs, all JVM built-ins."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    nonspace = F.length(F.regexp_replace("text", r"\s+", ""))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        nonspace.cast("long").alias("n_nonspace_chars"),
        (nonspace.cast("double") / F.size(toks)).alias("avg_token_len"),
    )


def _langid_case(col_fmt: str) -> str:
    """Deterministic argmax with fixed tie-break order en>es>de>fr."""
    e, s, d, f_ = (col_fmt.format(lang) for lang in ("en", "es", "de", "fr"))
    return f"""CASE
  WHEN {e} >= {s} AND {e} >= {d} AND {e} >= {f_} AND {e} > 0 THEN 'en'
  WHEN {s} >= {d} AND {s} >= {f_} AND {s} > 0 THEN 'es'
  WHEN {d} >= {f_} AND {d} > 0 THEN 'de'
  WHEN {f_} > 0 THEN 'fr'
  ELSE 'und' END"""


def _langid_oracle() -> str:
    hits = ",\n       ".join(
        "CAST(len(list_filter(string_split_regex(text, '\\s+'),"
        f" x -> x IN ({', '.join(repr(w) for w in STOPWORDS[lang])})))"
        f" AS BIGINT) AS {lang}_hits"
        for lang in STOPWORDS
    )
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS actual_lang,
       {hits}
  FROM documents
)
SELECT doc_id, actual_lang, en_hits, es_hits, de_hits, fr_hits,
       {_langid_case('{0}_hits')} AS pred_lang
FROM scored
"""


@query("q53_langid", oracle=_langid_oracle(), tags=("text", "langid"))
def q53_langid(spark, sf_dir):
    """Stopword-overlap language ID (n-gram heuristic family)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[stopword_hits(toks, lang).alias(f"{lang}_hits") for lang in STOPWORDS],
    )
    e, s, d, f_ = (F.col(f"{lang}_hits") for lang in ("en", "es", "de", "fr"))
    pred = (
        F.when((e >= s) & (e >= d) & (e >= f_) & (e > 0), "en")
        .when((s >= d) & (s >= f_) & (s > 0), "es")
        .when((d >= f_) & (d > 0), "de")
        .when(f_ > 0, "fr")
        .otherwise("und")
    )
    return scored.withColumn("pred_lang", pred)
