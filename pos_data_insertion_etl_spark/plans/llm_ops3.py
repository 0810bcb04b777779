"""Third LLM-data-pipeline batch: training-data assembly operators --
sequence packing, benchmark-contamination detection, intra-document
repetition scoring, deterministic stratified sampling, and semantic
(embedding) dedup composed end-to-end into keeper assignments.

Determinism rules as elsewhere in the inventory (plans/registry.py):
integer-only arithmetic for anything that feeds a threshold or a
grouping; doubles only as one final division/rounding of exact integer
operands; every rank orders by a total key.

Scale shapes:
* packing windows are PARTITIONED by shard (no global ordered window --
  the single-partition trap); shards are the unit a training job reads,
  so per-shard pack ids are the real contract;
* contamination joins the corpus's distinct shingles against a
  broadcast-small benchmark shingle set (equi-join);
* repetition scoring is row-wise HOF arithmetic, zero shuffle;
* stratified sampling is one window per stratum keyed by an md5 hash --
  deterministic, seedless, engine-portable;
* semantic dedup reuses the blocked equi-join pair source (q65) and the
  pointer-jumping connected components (operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from ..functions.text import shingles, tokens
from . import extended as _extended  # noqa: F401  q95 embeds q65's oracle
# SQL at decoration time, so q65 must be registered before this module's
# bodies run (same explicit-dependency pattern as llm_ops2 -> llm_ops).
from .llm_ops import _SHINGLE_CTE, _TOKS_CTE
from .registry import REGISTRY, query

# ---------------------------------------------------------------------------
# Sequence packing (concat-then-chunk, the standard LLM pretraining layout)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per packed sequence
_N_SHARDS = 8


@query(
    "q91_sequence_packing",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, doc_id % {_N_SHARDS} AS shard,
         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS c
  FROM toks
)
SELECT doc_id, shard, n_tokens,
       CAST((c - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST((c - n_tokens) % {_PACK_BUDGET} AS BIGINT) AS offset_in_pack
FROM cum
""",
    tags=("llm", "packing", "window"),
)
def q91_sequence_packing(spark, sf_dir):
    """Concat-then-chunk sequence packing: documents are concatenated in
    doc_id order within a shard and split at a fixed token budget; each
    doc records the pack it STARTS in and its token offset there (docs
    may straddle pack boundaries, as in standard pretraining layouts).

    The running sum is windowed PER SHARD -- at 100 TB the shard is the
    parallel unit (one window partition per shard, never a global
    ordered window) and shard count scales with the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("shard").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        docs.select(
            "doc_id",
            (F.col("doc_id") % _N_SHARDS).alias("shard"),
            F.size(tokens("text")).cast("long").alias("n_tokens"),
        )
        .withColumn("c", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.expr(f"(c - n_tokens) div {_PACK_BUDGET}").alias("pack_id"),
            ((F.col("c") - F.col("n_tokens")) % _PACK_BUDGET).alias(
                "offset_in_pack"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark contamination
# ---------------------------------------------------------------------------


@query(
    "q92_contamination_overlap",
    oracle=f"""
WITH {_TOKS_CTE}, {_SHINGLE_CTE},
bench AS (
  SELECT DISTINCT shingle FROM sh WHERE sh.doc_id % 50 = 0
),
corpus AS (SELECT * FROM sh WHERE sh.doc_id % 50 != 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM corpus GROUP BY doc_id),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_shared
  FROM corpus c JOIN bench b ON c.shingle = b.shingle
  GROUP BY 1
)
SELECT h.doc_id, h.n_shared, s.n_sh,
       ROUND(CAST(h.n_shared AS DOUBLE) / s.n_sh, 6) AS overlap_ratio
FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
""",
    tags=("llm", "contamination", "dedup"),
)
def q92_contamination_overlap(spark, sf_dir):
    """Benchmark-contamination check: for every corpus document, the
    count and fraction of its distinct trigram shingles that appear in
    the benchmark set (stand-in: doc_id % 50 == 0 -- in production the
    benchmark is a supplied table). The benchmark shingle set is tiny
    relative to the corpus and broadcast; the probe is one equi-join on
    the shingle -- the only scan of the corpus text."""
    from ..operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "text", "doc_id", n=3)
    bench = (
        sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 50 != 0)
    sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_shared",
        "n_sh",
        F.round(F.col("n_shared").cast("double") / F.col("n_sh"), 6).alias(
            "overlap_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Intra-document repetition
# ---------------------------------------------------------------------------


@query(
    "q93_repetition_score",
    oracle=f"""
WITH {_TOKS_CTE},
sh0 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
counts AS (
  SELECT doc_id,
         COUNT(shingle) AS n_all,
         COUNT(DISTINCT shingle) AS n_distinct
  FROM sh0 WHERE shingle IS NOT NULL GROUP BY doc_id
)
SELECT doc_id, n_all, n_distinct,
       ROUND(1 - CAST(n_distinct AS DOUBLE) / n_all, 6) AS rep_ratio
FROM counts
""",
    tags=("llm", "quality", "repetition"),
)
def q93_repetition_score(spark, sf_dir):
    """Intra-document repetition: the fraction of a doc's trigram
    occurrences that are repeats (1 - distinct/total) -- the standard
    boilerplate/loop-generation quality signal. Entirely row-wise HOF
    arithmetic on the in-row shingle array: zero shuffle, scales as a
    pure map."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(tokens("text"), n=3)
    return (
        docs.select(
            "doc_id",
            F.size(sh).cast("long").alias("n_all"),
            F.size(F.array_distinct(sh)).cast("long").alias("n_distinct"),
        )
        .filter(F.col("n_all") > 0)
        .select(
            "doc_id",
            "n_all",
            "n_distinct",
            F.round(
                1 - F.col("n_distinct").cast("double") / F.col("n_all"), 6
            ).alias("rep_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

_SAMPLE_PER_STRATUM = 25


@query(
    "q94_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, rn FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS rn
  FROM documents) t
WHERE rn <= {_SAMPLE_PER_STRATUM}
""",
    tags=("llm", "sampling", "window"),
)
def q94_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample: a fixed-size per-language sample
    selected by md5-hash order (seedless, reproducible across engines
    and runs -- the property a training-data freeze needs; `rand()` is
    not). One window per stratum, total order via (hash, doc_id)
    tiebreak; strata partition the shuffle, so parallelism = number of
    strata x AQE splits."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SAMPLE_PER_STRATUM)
    )


# ---------------------------------------------------------------------------
# Band-bounded MinHash estimate (the scale form of q74)
# ---------------------------------------------------------------------------


def _minhash_estimate_banded_oracle() -> str:
    hashes = ",\n         ".join(
        f"MIN(md5('mh{i:02d}|' || shingle)) AS h{i:02d}" for i in range(8)
    )
    bands = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx,"
        f" md5(h{2*b:02d} || '|' || h{2*b+1:02d}) AS band_key FROM sig"
        for b in range(4)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.h{i:02d} = sb.h{i:02d} THEN 1 ELSE 0 END)"
        for i in range(8)
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
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.band_idx = b.band_idx
   AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST({agree} AS BIGINT) AS n_agree,
       CAST({agree} AS DOUBLE) / 8 AS jaccard_est
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b
"""


@query(
    "q96_minhash_estimate_banded",
    oracle=_minhash_estimate_banded_oracle(),
    tags=("dedup", "minhash", "lsh", "estimate"),
)
def q96_minhash_estimate_banded(spark, sf_dir):
    """MinHash Jaccard ESTIMATE with LSH bands as the pair source -- the
    scale form of q74 (whose id-gap bound plans a nested loop and exists
    for oracle parity only). Candidates come from the band equi-join;
    the estimate is signature agreement, so the shingle sets are never
    touched again after signing. Equi-joins end to end."""
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, "text", "doc_id", n_hashes=8)
    cand = lsh_candidate_pairs(sig, "doc_id", n_hashes=8, band_size=2).select(
        "id_a", "id_b"
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"h{i:02d}").alias(f"a{i:02d}") for i in range(8)],
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"h{i:02d}").alias(f"b{i:02d}") for i in range(8)],
    )
    agree = sum(
        F.when(F.col(f"a{i:02d}") == F.col(f"b{i:02d}"), 1).otherwise(0)
        for i in range(8)
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            agree.cast("long").alias("n_agree"),
            (agree.cast("double") / 8).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup end-to-end (embedding pairs -> clusters -> keepers)
# ---------------------------------------------------------------------------


def _semantic_dedup_oracle() -> str:
    pair_sql = REGISTRY["q65_embedding_neardup"].oracle
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
),
labels AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a)
SELECT emb.vec_id, CAST(COALESCE(l.component, emb.vec_id) AS BIGINT) AS keeper_id
FROM embeddings emb LEFT JOIN labels l ON l.node = emb.vec_id
"""


@query(
    "q95_semantic_dedup",
    oracle=_semantic_dedup_oracle(),
    tags=("llm", "dedup", "embedding", "graph", "iterative", "pipeline"),
)
def q95_semantic_dedup(spark, sf_dir):
    """Semantic dedup composed end-to-end: blocked embedding-cosine
    near-dup pairs (q65's equi-join pair source, exact fixed-point
    cosine) -> connected components -> keeper per vector. The embedding
    twin of the text pipeline (q90); returns [vec_id, keeper_id] for
    every vector."""
    from ..operators.graph import connected_components
    from ..operators.similarity import embedding_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(emb, "vec_id", "embedding", "label", 0.4)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = connected_components(edges)
    return emb.select("vec_id").join(
        labels, F.col("vec_id") == F.col("node"), "left"
    ).select(
        "vec_id",
        F.coalesce(F.col("component"), F.col("vec_id")).alias("keeper_id"),
    )


# ---------------------------------------------------------------------------
# Token position index (posexplode)
# ---------------------------------------------------------------------------


@query(
    "q100_token_positions",
    oracle=f"""
WITH {_TOKS_CTE}
SELECT doc_id, tok,
       CAST(MIN(i) AS BIGINT) AS first_pos,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM toks WHERE doc_id < 50
GROUP BY doc_id, tok
""",
    tags=("llm", "tokens", "posexplode"),
)
def q100_token_positions(spark, sf_dir):
    """Positional token index via posexplode: first occurrence position
    (1-based) and occurrence count per (doc, token) -- the primitive
    under inverted indexes and positional n-gram features. Positions are
    generated row-locally by the explode (no window, no shuffle until
    the per-doc-token groupBy, whose keys are uniform)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        docs.select(
            "doc_id", F.posexplode(tokens("text")).alias("p", "tok")
        )
        .groupBy("doc_id", "tok")
        .agg(
            F.min(F.col("p") + 1).cast("long").alias("first_pos"),
            F.count(F.lit(1)).alias("n_occ"),
        )
    )
