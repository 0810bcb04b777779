"""Round-7 batch D (q194-q197): embedding hygiene, dimensionality
reduction, lexical diversity, and a multimodal scene-cut pipeline.

* q194 -- kNN-graph outlier scores (operators/graph.knn_outlier_scores):
  the curation filter that drops mis-embedded vectors before semantic
  dedup; composes the q169 bounded graph, oracle wraps its CTE.
* q195 -- random-projection (JL) distortion audit
  (operators/projection.py): exact-integer 64->16 projection via the
  seeded-plane machinery, pairwise distances original-vs-projected over
  block-equi-joined id-adjacent pairs.
* q196 -- per-document token-distribution entropy
  (operators/text_mining.token_entropy): lm_score's per-term
  fixed-point-ln convention makes the cross-token sum exact-integer.
* q197 -- video scene-cut detection over the PNGV container
  (media_ops' real-codec convention): two-scene formula frames are
  packed+sampled+DECODED for real, per-frame pixel vectors diffed with
  a lag window, cuts thresholded; the oracle recomputes the diffs from
  the closed-form pixel formula -- a hash match certifies the whole
  encode->pack->sample->decode->diff chain.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from .registry import query
from .llm_ops10 import _graph_cte

_OUTLIER_THRESHOLD_FP = 250_000
_PROJ_OUT_DIM = 16
_PROJ_SEED = 23
_PROJ_GAP = 5


# ---------------------------------------------------------------------------
# q194: kNN outlier scores
# ---------------------------------------------------------------------------


def _outlier_oracle() -> str:
    return f"""
WITH g AS ({_graph_cte()}),
agg AS (
  SELECT src_id,
         CAST(SUM(CAST(ROUND(cos_sim * 1000000) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM g GROUP BY 1
)
SELECT src_id AS node, s AS sum_cos_fp, n AS n_neighbors,
       CAST(s // n AS BIGINT) AS mean_cos_fp,
       (s // n) < {_OUTLIER_THRESHOLD_FP} AS is_outlier
FROM agg
"""


@query(
    "q194_knn_outliers",
    oracle=_outlier_oracle(),
    tags=("similarity", "outliers", "graph"),
)
def q194_knn_outliers(spark, sf_dir):
    """Embedding outlier scoring from the bounded kNN graph: mean
    neighbor cosine in exact 1e-6 fixed point (cos_sim is already
    round(x,6), so the scaling is exact-int and the groupBy sum is
    partitioning-invariant). One O(N*k) groupBy."""
    from ..operators.graph import knn_outlier_scores
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
    return knn_outlier_scores(graph, _OUTLIER_THRESHOLD_FP)


# ---------------------------------------------------------------------------
# q195: random-projection distortion audit
# ---------------------------------------------------------------------------


def _projection_oracle() -> str:
    from ..operators.projection import PROJ_SHIFT
    from ..operators.similarity import PLANE_SCALE, seeded_planes
    from .llm_ops9 import _EMB_DIM

    planes = seeded_planes(_PROJ_OUT_DIM, _EMB_DIM, _PROJ_SEED)
    coords = ", ".join(
        "CAST(list_sum(list_transform(list_zip(v, ["
        + ", ".join(str(int(round(c * PLANE_SCALE))) for c in row)
        + "]), p -> p[1] * p[2])) AS BIGINT) // " + str(PROJ_SHIFT)
        for row in planes
    )
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT)) AS v
  FROM embeddings
),
pr AS (SELECT vec_id, v, [{coords}] AS p FROM qv),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_sum(list_transform(list_zip(a.v, b.v),
              t -> (t[1]-t[2])*(t[1]-t[2]))) AS BIGINT) AS d_orig_sq,
         CAST(list_sum(list_transform(list_zip(a.p, b.p),
              t -> (t[1]-t[2])*(t[1]-t[2]))) AS BIGINT) AS d_proj_sq
  FROM pr a JOIN pr b
    ON a.vec_id < b.vec_id AND b.vec_id - a.vec_id <= {_PROJ_GAP}
)
SELECT id_a, id_b, d_orig_sq, d_proj_sq,
       CAST((d_proj_sq * 1000) // NULLIF(d_orig_sq, 0) AS BIGINT)
           AS ratio_milli
FROM pairs
"""


@query(
    "q195_random_projection",
    oracle=_projection_oracle(),
    tags=("embeddings", "projection", "similarity"),
)
def q195_random_projection(spark, sf_dir):
    """JL random projection 64->16 with an exact distortion table
    (operators/projection.py): integer plane dots, down-shifted
    coordinates, block-equi-joined id-adjacent pairs (q115 binned
    pattern -- no theta join). The oracle replays planes, shift, and
    distances bit-for-bit."""
    from ..operators.projection import projection_distortion
    from .llm_ops9 import _EMB_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    return projection_distortion(
        emb,
        "vec_id",
        "embedding",
        out_dim=_PROJ_OUT_DIM,
        dim=_EMB_DIM,
        seed=_PROJ_SEED,
        max_id_gap=_PROJ_GAP,
    )


# ---------------------------------------------------------------------------
# q196: token-distribution entropy
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = r"""
WITH tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
        FROM documents)
  GROUP BY 1, 2
),
w AS (SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM tf),
t AS (
  SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(c * CAST(ROUND(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                                 * 1000000) AS BIGINT)) AS BIGINT) AS s
  FROM w GROUP BY 1
)
SELECT doc_id, n_tokens, n_distinct,
       CAST(-(s // n_tokens) AS BIGINT) AS entropy_fp
FROM t
"""


@query(
    "q196_token_entropy",
    oracle=_ENTROPY_ORACLE,
    tags=("text", "quality", "entropy"),
)
def q196_token_entropy(spark, sf_dir):
    """Per-document lexical entropy (operators/text_mining
    .token_entropy): each distinct token contributes
    c * round(ln(c/n)*1e6) -- the lm_score per-term fixed-point
    convention -- so the sum is exact-integer and partitioning-
    invariant. Two map-side-combined groupBys."""
    from ..operators.text_mining import token_entropy

    docs = load_table(spark, sf_dir, "documents")
    return token_entropy(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# q197: video scene-cut detection (real codec chain)
# ---------------------------------------------------------------------------

#: two-scene pixel formula: scene 0 for frames 0-2, scene 1 for 3-5.
#: Values stay < 256 WITHOUT a mod wrap across frames (base < 200,
#: +1 per frame, +_SCENE_SHIFT at the break), so within-scene frames
#: differ by exactly 1 per pixel while the 2->3 cut differs by
#: 1 + _SCENE_SHIFT -- a genuine near-identical-frames fixture (a
#: mod-256 formula makes EVERY frame pair maximally different and no
#: threshold separates the cut).
_SCENE_DOCS = 60
_SCENE_FRAMES = 6
_SCENE_BREAK = 3
_SCENE_SHIFT = 37
_PIXELS = 192  # 8 x 8 x 3
_CUT_THRESHOLD = 1_000


def _scene_cut_oracle() -> str:
    return f"""
WITH px AS (
  SELECT d.doc_id, fs.f AS frame_idx, t.k,
         ((d.doc_id * 7919 + t.k) % 200) + fs.f
          + (CASE WHEN fs.f >= {_SCENE_BREAK} THEN {_SCENE_SHIFT} ELSE 0 END)
             AS v
  FROM documents d
  CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5)) fs(f)
  CROSS JOIN range(0, {_PIXELS}) t(k)
  WHERE d.doc_id < {_SCENE_DOCS}
),
diffs AS (
  SELECT a.doc_id, a.frame_idx,
         CAST(SUM(ABS(a.v - b.v)) AS BIGINT) AS diff_sum
  FROM px a JOIN px b
    ON b.doc_id = a.doc_id AND b.k = a.k AND b.frame_idx = a.frame_idx - 1
  GROUP BY 1, 2
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, diff_sum,
       diff_sum > {_CUT_THRESHOLD} AS is_cut
FROM diffs
"""


@query(
    "q197_scene_cuts",
    oracle=_scene_cut_oracle(),
    tags=("multimodal", "video", "scene-detection"),
)
def q197_scene_cuts(spark, sf_dir):
    """Scene-cut detection through the REAL codec chain: two-scene
    formula frames are PNG-encoded, packed into the PNGV container,
    frame-sampled, PNG-decoded back to pixel vectors (all genuine
    multimodal/binary_ops + png_codec kernels), then consecutive
    frames are diffed via a lag window over array columns and
    thresholded. The closed-form oracle matches only if the whole
    encode->pack->sample->decode chain is the identity (media_ops'
    q46 convention, extended with cross-frame state)."""
    from ..multimodal.binary_ops import (
        pack_video_frames,
        sample_video_frames,
    )
    from ..multimodal.png_codec import decode_png, encode_png

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < _SCENE_DOCS)
    )

    def to_video(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                frames = [
                    encode_png(
                        (
                            ((int(d) * 7919 + np.arange(_PIXELS)) % 200)
                            + f
                            + (_SCENE_SHIFT if f >= _SCENE_BREAK else 0)
                        )
                        .reshape(8, 8, 3)
                        .astype(np.uint8)
                    )
                    for f in range(_SCENE_FRAMES)
                ]
                payloads.append(pack_video_frames(frames, fps=2.0))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "content": payloads}
            )

    videos = docs.mapInPandas(to_video, "doc_id long, content binary")
    frames = sample_video_frames(videos, "doc_id", "content", every_s=0.5)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                decode_png(bytes(b)).astype(np.int64).ravel().tolist()
                for b in pdf["frame"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "px": pixels,
                }
            )

    decoded = frames.mapInPandas(
        decode, "doc_id long, frame_idx long, px array<long>"
    )
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    diffed = decoded.withColumn("_prev", F.lag("px").over(w)).filter(
        F.col("_prev").isNotNull()
    )
    return diffed.select(
        "doc_id",
        "frame_idx",
        F.aggregate(
            F.zip_with(
                F.col("px"), F.col("_prev"), lambda a, b: F.abs(a - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("diff_sum"),
    ).select(
        "doc_id",
        "frame_idx",
        "diff_sum",
        (F.col("diff_sum") > F.lit(_CUT_THRESHOLD)).alias("is_cut"),
    )


# ---------------------------------------------------------------------------
# q198: DSIR importance weights
# ---------------------------------------------------------------------------

_DSIR_TARGET = "src0"
_DSIR_BUCKETS = 64

_DSIR_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS t
  FROM documents
),
big AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS g
  FROM toks
),
bk AS (
  SELECT doc_id, source,
         CAST(((strpos('0123456789abcdef', substr(md5(g), 31, 1)) - 1) * 16
               + strpos('0123456789abcdef', substr(md5(g), 32, 1)) - 1)
              % {_DSIR_BUCKETS} AS INTEGER) AS b
  FROM big
),
ct AS (SELECT b, COUNT(*) AS c FROM bk WHERE source = '{_DSIR_TARGET}'
       GROUP BY 1),
cr AS (SELECT b, COUNT(*) AS c FROM bk WHERE source != '{_DSIR_TARGET}'
       GROUP BY 1),
tot AS (
  SELECT (SELECT COUNT(*) FROM bk WHERE source = '{_DSIR_TARGET}') AS tt,
         (SELECT COUNT(*) FROM bk WHERE source != '{_DSIR_TARGET}') AS tr
),
lr AS (
  SELECT g.b,
         CAST(ROUND(ln((CAST(COALESCE(ct.c, 0) + 1 AS DOUBLE)
                        * (tot.tr + {_DSIR_BUCKETS}))
                       / (CAST(COALESCE(cr.c, 0) + 1 AS DOUBLE)
                          * (tot.tt + {_DSIR_BUCKETS}))) * 1000000)
              AS BIGINT) AS lr_fp
  FROM (SELECT CAST(unnest(range(0, {_DSIR_BUCKETS})) AS INTEGER) AS b) g
  LEFT JOIN ct USING (b) LEFT JOIN cr USING (b) CROSS JOIN tot
),
docb AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM bk
         GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feat,
       CAST(SUM(c * lr_fp) AS BIGINT) AS logweight_fp,
       CAST(SUM(c * lr_fp) AS BIGINT) > 0 AS selected
FROM docb JOIN lr USING (b) GROUP BY doc_id
"""


@query(
    "q198_dsir_weights",
    oracle=_DSIR_ORACLE,
    tags=("curation", "importance-sampling", "text"),
)
def q198_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators/dsir.py): hashed-bigram
    bucket model (64 buckets, add-one smoothing, per-bucket fixed-point
    log-likelihood-ratio), exact-integer per-document log-weights,
    threshold acceptance with NO global window. Target corpus =
    source 'src0'."""
    from ..operators.dsir import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(
        docs,
        F.col("source") == _DSIR_TARGET,
        "doc_id",
        "text",
        n_buckets=_DSIR_BUCKETS,
    )


# ---------------------------------------------------------------------------
# q199: streaming dedup-ingest replay (exactly-once table state)
# ---------------------------------------------------------------------------

_DEDUP_REPLAY_ORACLE = """
WITH keep AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT k.doc_id, k.source, k.n_chars,
       CAST(CASE WHEN k.doc_id < n.n // 3 THEN 0
                 WHEN k.doc_id < 2 * (n.n // 3) THEN 1
                 ELSE 2 END AS BIGINT) AS batch
FROM keep k CROSS JOIN n WHERE k.rn = 1
"""


@query(
    "q199_dedup_ingest_replay",
    oracle=_DEDUP_REPLAY_ORACLE,
    tags=("streaming", "dedup", "exactly-once"),
)
def q199_dedup_ingest_replay(spark, sf_dir):
    """The crash-safe dedup ingest's batch analog (q175 pattern, over
    streaming/jobs.dedup_ingest_batch): documents replay in three
    id-ordered micro-batches through the REAL persist path -- batch-id
    keyed idempotent corpus writes + digest-table rename-aside swap --
    with batch 1 deliberately driven TWICE. The corpus read back must
    equal exact keep-first dedup with correct per-batch provenance;
    a double-ingest or a lost swap breaks the hash."""
    import os
    import shutil

    from ..streaming.jobs import dedup_ingest_batch
    from .llm_ops9 import _monitor_dir

    out_dir = _monitor_dir(sf_dir, "dedup_ingest")
    shutil.rmtree(out_dir, ignore_errors=True)  # fresh state per run
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1, s2 = n // 3, 2 * (n // 3)
    batches = [
        (0, docs.filter(F.col("doc_id") < s1)),
        (1, docs.filter((F.col("doc_id") >= s1) & (F.col("doc_id") < s2))),
        (1, docs.filter((F.col("doc_id") >= s1) & (F.col("doc_id") < s2))),
        (2, docs.filter(F.col("doc_id") >= s2)),
    ]
    for bid, b in batches:
        dedup_ingest_batch(b, bid, out_dir, "text", "doc_id")
    corpus = spark.read.parquet(os.path.join(out_dir, "corpus"))
    return corpus.select(
        "doc_id", "source", "n_chars", F.col("batch").cast("long").alias("batch")
    )


# ---------------------------------------------------------------------------
# q200: linear quality-classifier inference
# ---------------------------------------------------------------------------

#: fixed published-style weights (1e-6 fixed point): longer docs and
#: stopword-bearing prose score up; very long mean word length down.
_Q200_WEIGHTS = (
    ("n_tokens_k", 200_000),
    ("stop_frac", 1_500_000),
    ("mean_wlen", -300_000),
)
_Q200_BIAS = -1_000_000
_Q200_STOP = ("the", "a", "of", "and", "to", "in", "is")


def _q200_oracle() -> str:
    stop_list = ", ".join(f"'{s}'" for s in _Q200_STOP)
    weights = ", ".join(f"('{f}', {w})" for f, w in _Q200_WEIGHTS)
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM documents
),
base AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN w IN ({stop_list}) THEN 1 ELSE 0 END)
              AS BIGINT) AS stop_hits,
         CAST(SUM(length(w)) AS BIGINT) AS chars
  FROM toks GROUP BY 1
),
feats AS (
  SELECT doc_id, 'n_tokens_k' AS feature,
         CAST(n_tokens * 1000 AS BIGINT) AS x_fp FROM base
  UNION ALL
  SELECT doc_id, 'stop_frac', CAST((stop_hits * 1000000) // n_tokens
                                   AS BIGINT) FROM base
  UNION ALL
  SELECT doc_id, 'mean_wlen', CAST((chars * 1000000) // n_tokens
                                   AS BIGINT) FROM base
),
wt(feature, w_fp) AS (VALUES {weights}),
dot AS (
  SELECT doc_id, CAST(SUM(x_fp * w_fp) AS BIGINT) AS d
  FROM feats JOIN wt USING (feature) GROUP BY 1
),
zs AS (SELECT doc_id,
              CAST({_Q200_BIAS} + d // 1000000 AS BIGINT) AS z_fp
       FROM dot)
SELECT doc_id, z_fp,
       CAST(ROUND(1.0 / (1.0 + exp(-(CAST(z_fp AS DOUBLE) / 1000000)))
                  * 1000000) AS BIGINT) AS p_fp,
       CAST(ROUND(1.0 / (1.0 + exp(-(CAST(z_fp AS DOUBLE) / 1000000)))
                  * 1000000) AS BIGINT) >= 500000 AS accepted
FROM zs
"""


@query(
    "q200_quality_logistic",
    oracle=_q200_oracle(),
    tags=("curation", "scoring", "classifier"),
)
def q200_quality_logistic(spark, sf_dir):
    """Linear quality-classifier inference (operators/scoring.py): a
    broadcast weight TABLE against a long-form fixed-point feature
    matrix -- the fastText-style serving shape. Exact-integer logit;
    only the final sigmoid is floating point, rounded at 1e-6 (the
    lm_score libm convention)."""
    from ..functions.text import tokens as _tok
    from ..operators.scoring import logistic_score

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_tok(F.lower(F.col("text")))).alias("w")
    )
    base = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.col("w").isin(*_Q200_STOP), 1).otherwise(0)
        ).alias("stop_hits"),
        F.sum(F.length("w")).alias("chars"),
    )
    feats = (
        base.select(
            "doc_id",
            F.lit("n_tokens_k").alias("feature"),
            (F.col("n_tokens") * 1000).cast("long").alias("x_fp"),
        )
        .unionByName(
            base.select(
                "doc_id",
                F.lit("stop_frac").alias("feature"),
                F.expr("(stop_hits * 1000000) div n_tokens")
                .cast("long")
                .alias("x_fp"),
            )
        )
        .unionByName(
            base.select(
                "doc_id",
                F.lit("mean_wlen").alias("feature"),
                F.expr("(chars * 1000000) div n_tokens")
                .cast("long")
                .alias("x_fp"),
            )
        )
    )
    weights = spark.createDataFrame(
        list(_Q200_WEIGHTS), "feature string, w_fp long"
    )
    return logistic_score(
        feats, weights, "doc_id", bias_fp=_Q200_BIAS, threshold_fp=500_000
    )


# ---------------------------------------------------------------------------
# q201: group-stable (leakage-correct) split
# ---------------------------------------------------------------------------

_GROUP_SPLIT_ORACLE = """
SELECT doc_id, source,
       CASE WHEN substr(md5(source), 1, 2) < 'cc' THEN 'train'
            WHEN substr(md5(source), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@query(
    "q201_group_split",
    oracle=_GROUP_SPLIT_ORACLE,
    tags=("curation", "split", "leakage"),
)
def q201_group_split(spark, sf_dir):
    """Leakage-correct train/val/test assignment
    (operators/mixture.group_stable_split): the hash key is the SOURCE,
    so near-duplicate documents from one site can never straddle the
    split -- the property q47's per-document split cannot give. Pure
    projection, no shuffle."""
    from ..operators.mixture import group_stable_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return group_stable_split(docs, "source")


# ---------------------------------------------------------------------------
# q202: exact per-group winsorization
# ---------------------------------------------------------------------------

_WINSORIZE_ORACLE = """
WITH ranked AS (
  SELECT source AS key, n_chars AS v, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
),
bounds AS (
  SELECT key,
         MIN(CASE WHEN rn = GREATEST((n * 1 + 19) // 20, 1) THEN v END)
             AS lo,
         MAX(CASE WHEN rn = GREATEST((n * 19 + 19) // 20, 1) THEN v END)
             AS hi
  FROM ranked GROUP BY key
)
SELECT r.key, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(b.lo) AS BIGINT) AS lo, CAST(MIN(b.hi) AS BIGINT) AS hi,
       CAST(SUM(CASE WHEN r.v < b.lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_lo,
       CAST(SUM(CASE WHEN r.v > b.hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_hi,
       CAST(SUM(GREATEST(LEAST(r.v, b.hi), b.lo)) AS BIGINT)
           AS winsorized_sum
FROM ranked r JOIN bounds b USING (key)
GROUP BY r.key
"""


@query(
    "q202_winsorize",
    oracle=_WINSORIZE_ORACLE,
    tags=("quality", "quantiles", "robust-stats"),
)
def q202_winsorize(spark, sf_dir):
    """Exact per-source winsorization of document lengths at the
    type-1 p05/p95 quantiles (operators/quantiles
    .grouped_winsorize_stats): the per-group sort is scale-correct
    because the window partitions by the stratum; integer rank
    arithmetic and integer sums keep every column exact."""
    from ..operators.quantiles import grouped_winsorize_stats

    docs = load_table(spark, sf_dir, "documents")
    return grouped_winsorize_stats(
        docs, "source", "n_chars", "doc_id", 1, 19, 20
    )


# ---------------------------------------------------------------------------
# q203: crawl-frontier expansion (sitemap -> robots composition)
# ---------------------------------------------------------------------------

_FRONTIER_ROBOTS = (
    "User-agent: *\n"
    "Disallow: /blog/\n"
    "Allow: /blog/sitemap-tips-1*\n"
    "Disallow: /page/*/b\n"
)

#: hand-derived decision table over q174's synthesized page URLs
#: (q173's independent-re-derivation convention):
#: * /page/N/a  -> no rule matches           -> allowed
#: * /page/N/b  -> 'Disallow: /page/*/b'     -> blocked
#: * /blog/sitemap-tips-N -> 'Disallow: /blog/' (6 chars) vs
#:   'Allow: /blog/sitemap-tips-1*' (longer, wins when it matches,
#:   i.e. when N's decimal form starts with '1')
_FRONTIER_ORACLE = """
WITH ids AS (SELECT doc_id FROM documents),
pages AS (
  SELECT doc_id,
         'https://ex.com/page/' || CAST(doc_id AS VARCHAR) || '/a' AS url,
         TRUE AS allowed
  FROM ids WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id,
         'https://ex.com/page/' || CAST(doc_id AS VARCHAR) || '/b',
         FALSE
  FROM ids WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id,
         'https://ex.com/blog/sitemap-tips-' || CAST(doc_id AS VARCHAR),
         CAST(doc_id AS VARCHAR) LIKE '1%'
  FROM ids WHERE doc_id % 3 = 2
)
SELECT doc_id, url, allowed FROM pages
"""


@query(
    "q203_crawl_frontier",
    oracle=_FRONTIER_ORACLE,
    tags=("curation", "crawl", "composition"),
)
def q203_crawl_frontier(spark, sf_dir):
    """Crawl-frontier expansion composing two round-7 operators end to
    end: q174's sitemap extraction seeds the page set (sitemapindex
    entries excluded), then operators/quality.robots_allowed evaluates
    a fixed RFC 9309 rule set (wildcard + longest-match + allow-over-
    disallow) against each page path. The oracle is a hand-derived
    closed-form decision table -- an independent re-derivation of both
    stages."""
    from ..operators.quality import robots_allowed
    from .llm_ops9 import q174_sitemap_urls

    seeds = q174_sitemap_urls(spark, sf_dir).filter(~F.col("is_sitemap"))
    staged = seeds.select(
        "doc_id",
        "url",
        F.lit(_FRONTIER_ROBOTS).alias("_robots"),
        F.regexp_replace("url", r"^https://ex\.com", "").alias("_path"),
    )
    return staged.select(
        "doc_id",
        "url",
        robots_allowed(staged, "_robots", "_path").alias("allowed"),
    )


# ---------------------------------------------------------------------------
# q204: blocked fuzzy (edit-distance) join
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
WITH sized AS (
  SELECT p_partkey, p_name, p_size FROM (
    SELECT p_partkey, p_name, p_size,
           COUNT(*) OVER (PARTITION BY p_size) AS bsz
    FROM part) t
  WHERE bsz <= 1000
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM sized a JOIN sized b
  ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
WHERE ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 2
"""


@query(
    "q204_fuzzy_name_join",
    oracle=_FUZZY_ORACLE,
    tags=("fuzzy", "entity-resolution", "dedup"),
)
def q204_fuzzy_name_join(spark, sf_dir):
    """Blocked edit-distance similarity join (operators/fuzzy.py):
    part names within the same size class at levenshtein <= 2 -- the
    record-linkage shape set-based dedup cannot see. Block-guarded
    self-join, exact length-difference prefilter before the DP;
    levenshtein probed identical across engines."""
    from ..operators.fuzzy import edit_distance_join

    part = load_table(spark, sf_dir, "part")
    return edit_distance_join(
        part, "p_partkey", "p_name", "p_size", max_dist=2, max_block=1000
    )


# ---------------------------------------------------------------------------
# q205: robust per-group outlier census (MAD)
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH base AS (SELECT source AS key, n_chars AS v, doc_id FROM documents),
r1 AS (
  SELECT key, v, doc_id,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY v, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY key) AS n
  FROM base
),
med AS (SELECT key, v AS med FROM r1 WHERE rn = GREATEST((n + 1) // 2, 1)),
devs AS (
  SELECT b.key, b.doc_id, ABS(b.v - m.med) AS dev, m.med
  FROM base b JOIN med m USING (key)
),
r2 AS (
  SELECT key, dev,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY dev, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY key) AS n
  FROM devs
),
mad AS (SELECT key, dev AS mad FROM r2 WHERE rn = GREATEST((n + 1) // 2, 1))
SELECT d.key, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(d.med) AS BIGINT) AS med,
       CAST(MIN(m.mad) AS BIGINT) AS mad,
       CAST(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM devs d JOIN mad m USING (key)
GROUP BY d.key
"""


@query(
    "q205_mad_outliers",
    oracle=_MAD_ORACLE,
    tags=("quality", "robust-stats", "outliers"),
)
def q205_mad_outliers(spark, sf_dir):
    """Per-source robust outlier census via Median Absolute Deviation
    (operators/quantiles.grouped_mad_outlier_stats): two exact type-1
    per-group medians (value, then |v - med|), |v - med| > 3*MAD test,
    all integer arithmetic; the per-stratum windows keep the sorts
    scale-correct."""
    from ..operators.quantiles import grouped_mad_outlier_stats

    docs = load_table(spark, sf_dir, "documents")
    return grouped_mad_outlier_stats(
        docs, "source", "n_chars", "doc_id", k_mad=3
    )


# ---------------------------------------------------------------------------
# q206: Benford first-digit audit
# ---------------------------------------------------------------------------


def _benford_oracle() -> str:
    from ..operators.audit import _LADDER, BENFORD_FP

    ladder = " ".join(f"WHEN t >= {p} THEN t // {p}" for p in _LADDER)
    probs = " ".join(f"WHEN {d} THEN {p}" for d, p in BENFORD_FP.items())
    return f"""
WITH base AS (
  SELECT CAST(FLOOR(ABS(l_extendedprice)) AS BIGINT) AS t
  FROM lineitem WHERE FLOOR(ABS(l_extendedprice)) >= 1
),
dig AS (SELECT CASE {ladder} ELSE t END AS d FROM base),
counts AS (
  SELECT CAST(d AS INTEGER) AS digit, CAST(COUNT(*) AS BIGINT) AS observed
  FROM dig GROUP BY 1
),
tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM counts)
SELECT digit, observed,
       CAST((tot.n * (CASE digit {probs} ELSE 0 END)) // 1000 AS BIGINT)
           AS expected_milli,
       CAST(ABS(observed * 1000
                - (tot.n * (CASE digit {probs} ELSE 0 END)) // 1000)
            AS BIGINT) AS dev_milli
FROM counts CROSS JOIN tot
"""


@query(
    "q206_benford_audit",
    oracle=_benford_oracle(),
    tags=("audit", "quality", "relational"),
)
def q206_benford_audit(spark, sf_dir):
    """Benford first-digit conformance of extended prices
    (operators/audit.py): FLOOR + integer CASE ladder for the digit
    (never CAST(double AS BIGINT), whose rounding differs across
    engines), precomputed fixed-point Benford probabilities, one
    9-group aggregate."""
    from ..operators.audit import benford_first_digit

    li = load_table(spark, sf_dir, "lineitem")
    return benford_first_digit(li, "l_extendedprice")


# ---------------------------------------------------------------------------
# q207: interval-interval overlap join
# ---------------------------------------------------------------------------

_OVERLAP_ORACLE = """
WITH li AS (
  -- the synthetic lineitem has no receiptdate; derive a deterministic
  -- fulfillment window end: shipdate + (quantity % 10 + 1) days
  SELECT l_orderkey, l_linenumber, l_partkey,
         CAST(l_shipdate AS DATE) AS l_shipdate,
         CAST(l_shipdate AS DATE)
             + CAST(CAST(l_quantity AS BIGINT) % 10 + 1 AS INTEGER)
             AS l_receiptdate
  FROM lineitem
)
SELECT a.l_orderkey,
       a.l_linenumber AS l_linenumber_a, a.l_partkey AS l_partkey_a,
       b.l_linenumber AS l_linenumber_b, b.l_partkey AS l_partkey_b,
       CAST(date_diff('day', GREATEST(a.l_shipdate, b.l_shipdate),
                      LEAST(a.l_receiptdate, b.l_receiptdate)) + 1
            AS BIGINT) AS overlap_days
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey
 AND (a.l_linenumber, a.l_partkey, a.l_shipdate, a.l_receiptdate)
     < (b.l_linenumber, b.l_partkey, b.l_shipdate, b.l_receiptdate)
 AND a.l_shipdate <= b.l_receiptdate
 AND b.l_shipdate <= a.l_receiptdate
"""


@query(
    "q207_interval_overlap",
    oracle=_OVERLAP_ORACLE,
    tags=("range_join", "temporal", "relational"),
)
def q207_interval_overlap(spark, sf_dir):
    """Interval x interval OVERLAP join (operators/rangejoin
    .interval_overlap_join): pairs of lineitems in the same order
    whose ship->receipt windows intersect, with exact overlap days --
    the temporal-DB shape binned_range_join (point-in-interval) and
    asof (nearest-preceding) don't cover. One equi-join on the order
    key; fan-out bounded by order size. Pairs canonicalize by strict
    struct comparison, so duplicate (orderkey, linenumber) rows
    behave identically in both engines."""
    from ..operators.rangejoin import interval_overlap_join

    li = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("l_shipdate", F.to_date("l_shipdate"))
        .withColumn(
            "l_receiptdate",
            F.date_add(
                F.col("l_shipdate"),
                (F.col("l_quantity").cast("long") % 10 + 1).cast("int"),
            ),
        )
    )
    return interval_overlap_join(
        li,
        "l_orderkey",
        "l_shipdate",
        "l_receiptdate",
        ["l_linenumber", "l_partkey"],
    )


# ---------------------------------------------------------------------------
# q208: audio frame-energy windows (real codec chain)
# ---------------------------------------------------------------------------

_AUDIO_DOCS = 120
_FRAME_LEN = 250

_FRAME_ENERGY_ORACLE = f"""
SELECT d.doc_id,
       CAST(i // {_FRAME_LEN} AS BIGINT) AS frame_idx,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(CAST(((d.doc_id * 31 + i * 17) % 4001) - 2000 AS BIGINT)
                * CAST(((d.doc_id * 31 + i * 17) % 4001) - 2000 AS BIGINT))
            AS BIGINT) AS energy,
       CAST(MAX(ABS(((d.doc_id * 31 + i * 17) % 4001) - 2000)) AS BIGINT)
           AS peak
FROM documents d CROSS JOIN range(0, 1000) t(i)
WHERE d.doc_id < {_AUDIO_DOCS}
GROUP BY d.doc_id, i // {_FRAME_LEN}
"""


@query(
    "q208_audio_frame_energy",
    oracle=_FRAME_ENERGY_ORACLE,
    tags=("multimodal", "audio", "windowing"),
)
def q208_audio_frame_energy(spark, sf_dir):
    """Windowed audio energy through the REAL WAV chain
    (multimodal/binary_ops.audio_frame_energy): q62's formula samples
    are wave-encoded, decoded back, framed into 250-sample windows,
    and reduced to exact integer energy/peak per frame inside one
    Arrow pass. The closed-form oracle certifies the codec round-trip
    AND the framing arithmetic."""
    from ..multimodal.binary_ops import audio_frame_energy
    from ..multimodal.wav_codec import encode_wav

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < _AUDIO_DOCS)
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
    return audio_frame_energy(wavs, "doc_id", "content", _FRAME_LEN)
