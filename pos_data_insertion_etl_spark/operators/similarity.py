"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k -- broadcast the (small) query set,
scan the corpus once, window-rank per query. One corpus scan, no shuffle
of the corpus itself; the only shuffle is the (n_queries x k)-bounded
ranked output. This is the right plan at 100 TB when the query set is
small; for query sets too big to broadcast, use the LSH-bucketed variant
(lsh_bucket_topk) which equi-joins on sign-pattern buckets instead.

Determinism: fixed-point integer dot products (see functions.vectors),
rounded similarity + id tiebreak in the ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.vectors import (
    cosine_precomputed,
    norm_fixed_point,
    quantize_vec,
)

# Pattern shared by every operator here: quantize + compute the norm ONCE
# per vector on the narrow per-vector side, so the pairwise stage pays one
# dot product per candidate pair (cosine_precomputed) instead of three.


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded)."""
    qv = quantize_vec(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        qv.alias("qv"),
        norm_fixed_point(qv).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("cv"),
        norm_fixed_point(qv).alias("cn"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_precomputed(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def ivf_assign(
    corpus: DataFrame, id_col: str, vec_col: str, centroids: DataFrame
) -> DataFrame:
    """Assign each vector to its nearest centroid (rounded fixed-point
    cosine, centroid-id tiebreak). ``centroids`` is (cid, cv[quantized]),
    small enough to broadcast -- the IVF 'coarse quantizer'. Returns
    (id, cluster)."""
    qv = quantize_vec(F.col(vec_col))
    qc = corpus.select(
        F.col(id_col), qv.alias("_v"), norm_fixed_point(qv).alias("_n")
    )
    cents = centroids.select(
        "cid", "cv", norm_fixed_point(F.col("cv")).alias("_cn")
    )
    sims = qc.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col("cid"),
        F.round(
            cosine_precomputed(
                F.col("_v"), F.col("cv"), F.col("_n"), F.col("_cn")
            ),
            6,
        ).alias("_sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("_sim"), "cid")
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("cid").alias("cluster"))
    )


def ivf_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    query_pred,
    k: int = 3,
) -> DataFrame:
    """IVF-style ANN: probe only the query's own cluster (nprobe=1).

    The scale story: assignment is one broadcast-join pass; search is an
    equi-join on the cluster id instead of a cross product -- candidate
    count drops by ~n_clusters x. Recall < 1.0 by design (neighbors in
    other cells are missed), which is the approximate trade.
    """
    assign = ivf_assign(corpus, id_col, vec_col, centroids)
    qv = quantize_vec(F.col(vec_col))
    vecs = corpus.select(
        F.col(id_col), qv.alias("_v"), norm_fixed_point(qv).alias("_n")
    ).join(assign, id_col)
    q = vecs.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("qv"),
        F.col("_n").alias("qn"),
        "cluster",
    )
    sims = (
        vecs.join(F.broadcast(q), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_precomputed(
                    F.col("qv"), F.col("_v"), F.col("qn"), F.col("_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return sims.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= k
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key.

    Blocking turns the O(n^2) pair space into an equi-join on
    ``block_col`` (a label, an LSH bucket, a shard) -- the standard scale
    move; the cosine itself is the exact fixed-point form, so the
    threshold cut is engine-deterministic.
    """
    qv = quantize_vec(F.col(vec_col))
    a = corpus.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"),
        qv.alias("va"),
        norm_fixed_point(qv).alias("na"),
    )
    b = corpus.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"),
        qv.alias("vb"),
        norm_fixed_point(qv).alias("nb"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("_blk").alias("block"),
            "id_a",
            "id_b",
            F.round(
                cosine_precomputed(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate variant: random-hyperplane (sign) LSH buckets.

    Bucket key = sign pattern of the first `n_planes` components (a
    deterministic, data-independent set of axis-aligned "hyperplanes" --
    at scale swap in seeded random projections). Candidates are pairs in
    the SAME bucket -> the corpus-vs-query comparison becomes an
    equi-join on the bucket key instead of a cross product.
    """

    def bucket(vc):
        bits = [
            F.when(F.get(vc, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_planes)
        ]
        return F.concat(*bits)

    qv = quantize_vec(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        qv.alias("qv"),
        norm_fixed_point(qv).alias("qn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("cv"),
        norm_fixed_point(qv).alias("cn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_precomputed(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )
