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
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: probe the query's ``nprobe`` nearest cells.

    The scale story: assignment is one broadcast-join pass; search is an
    equi-join on the cluster id instead of a cross product -- candidate
    count drops by ~(n_clusters / nprobe) x. Recall < 1.0 by design
    (neighbors outside the probed cells are missed); raising ``nprobe``
    trades candidates for recall, the standard IVF knob -- candidate
    count grows linearly in nprobe while the plan shape (broadcast
    centroid ranking + one cluster equi-join) is unchanged. nprobe=1
    reproduces probe-own-cell exactly (the query's top-1 centroid IS its
    assignment, same sim/tiebreak order).
    """
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    assign = ivf_assign(corpus, id_col, vec_col, centroids)
    qv = quantize_vec(F.col(vec_col))
    vecs = corpus.select(
        F.col(id_col), qv.alias("_v"), norm_fixed_point(qv).alias("_n")
    ).join(assign, id_col)
    q_base = vecs.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("qv"),
        F.col("_n").alias("qn"),
    )
    # Rank centroids per query (broadcast, same scoring as ivf_assign)
    # and keep the top-nprobe cells: one probe row per (query, cell).
    cents = centroids.select(
        "cid", "cv", norm_fixed_point(F.col("cv")).alias("_cn")
    )
    qsims = q_base.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "qn",
        F.col("cid"),
        F.round(
            cosine_precomputed(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("_cn")
            ),
            6,
        ).alias("_sim"),
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("_sim"), "cid")
    q = (
        qsims.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", F.col("cid").alias("cluster"))
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


def seeded_planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian random-projection hyperplanes.

    Generated ONCE on the driver (n_planes x dim floats -- a few KB) and
    embedded as plan literals, so executors pay no RNG and every run of
    the same seed buckets identically. Gaussian entries make each plane
    a uniformly-random direction (the classic SimHash/sign-LSH
    construction: P[sign differs] = angle/pi per plane), which is what
    axis-aligned planes are NOT -- axis planes bucket on raw coordinate
    signs and collapse badly when coordinates are correlated or
    non-centered. Rounded to 6dp so the literal is compact and the plan
    text stable."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    return [[round(float(x), 6) for x in row] for row in planes]


def _plane_dot(vc, plane_row: list[float]):
    """<vec, plane> as a sequential fold: deterministic order, stays in
    the JVM (no Python in the hot path)."""
    plane = F.array(*[F.lit(x) for x in plane_row])
    return F.aggregate(
        F.zip_with(vc.cast("array<double>"), plane, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    seed: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate variant: random-hyperplane (sign) LSH buckets.

    Bucket key = sign pattern of ``n_planes`` projections. With ``seed``
    (and the vector ``dim``) the planes are seeded Gaussian random
    projections (`seeded_planes`) -- the at-scale form, recall governed
    by plane count/quality; without a seed it falls back to axis-aligned
    components (cheap, but coordinate-correlation-sensitive -- fixture
    use only). Candidates are pairs in the SAME bucket -> the
    corpus-vs-query comparison becomes an equi-join on the bucket key
    instead of a cross product.
    """
    if seed is not None:
        if dim is None:
            raise ValueError("seeded planes need the vector dim")
        planes = seeded_planes(n_planes, dim, seed)

        def bucket(vc):
            bits = [
                F.when(_plane_dot(vc, row) >= 0, F.lit("1")).otherwise(
                    F.lit("0")
                )
                for row in planes
            ]
            return F.concat(*bits)

    else:

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
