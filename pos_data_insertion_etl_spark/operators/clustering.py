"""Distributed Lloyd k-means over embedding columns, exact and
engine-portable.

This is the iterative-algorithm shape next to the one-shot similarity
operators: repeated (broadcast-centroids -> assign -> partial-sum
reduce) rounds, the same plan MLlib's KMeans runs but expressed with
plain DataFrame ops and made bit-deterministic so a SQL oracle can
replay it (reference scope: the batch transform family of
`main.py:181-211`; clustering itself is an LLM-pipeline addition --
semantic bucketing / topic sharding of a training corpus).

Determinism design (the q124/q169 fixed-point convention):

* Components quantize to 1e-7 fixed-point BIGINT, then SHIFT toward
  the positive range (distances are shift-invariant); the centroid
  update divides with EXPLICIT truncate-toward-zero semantics, the
  rule Spark `div` and DuckDB `//` share for either sign, so the SQL
  replay holds even for inputs outside the shift's positive range.
* Init is RNG-free: the k corpus vectors with the smallest
  (md5(id), id) key, clusters numbered 1..k in that order.
* Assignment distance is an exact integer sum of squared component
  deltas (<= dim * (2 * SHIFT)^2 ~ 7.7e15 at dim=64, well inside
  BIGINT); argmin ties break on the smaller cluster index.
* Updated centroids are the truncated integer mean of member vectors;
  a cluster that loses every member keeps its previous centroid.

Scale shape (100 TB):

* Assignment is a pure PROJECTION: centroids ship as k*dim literal
  arrays inside the expression tree (k ~ tens, dim ~ hundreds -- a few
  KB), so no join, no shuffle, full whole-stage codegen.
* Each update is ONE shuffle of k*dim partial sums (posexplode ->
  groupBy(cluster, component) with map-side combine), then a k*dim-row
  collect -- the PQ-codebook-sized driver payload, independent of N.
* Component sums fit BIGINT to N ~ 4e11 rows at dim 64 (N * 2*SHIFT <
  2^63); beyond that, raise to DECIMAL partial sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lineage import cut_lineage

VEC_SCALE = 10_000_000  # 1e-7 fixed-point (functions.vectors.SCALE)
VEC_SHIFT = 10_000_000  # +1.0 shift -> positive for |x| < 1.0 inputs


def _quantize_shifted(col):
    """array<float> -> array<bigint>, 1e-7 fixed point shifted positive."""
    return F.transform(
        col,
        lambda x: F.round(x.cast("double") * VEC_SCALE).cast("long")
        + F.lit(VEC_SHIFT),
    )


def _sq_dist_to(centroid: list[int]):
    """Exact integer squared distance from column `_v` to a literal
    centroid (stays in whole-stage codegen; no CSE needed -- evaluated
    once per (row, centroid))."""
    lits = F.array(*[F.lit(int(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(F.col("_v"), lits, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(quantized: DataFrame, centroids: dict[int, list[int]]) -> DataFrame:
    """Add (cluster, dist): argmin over k literal centroids with the
    smaller-index tiebreak, as an array_min over k (dist, j) structs."""
    cands = F.array(
        *[
            F.struct(
                _sq_dist_to(c).alias("d"), F.lit(int(j)).alias("j")
            )
            for j, c in sorted(centroids.items())
        ]
    )
    best = F.array_min(cands)
    return quantized.withColumn("_best", best).select(
        "*",
        F.col("_best.j").alias("cluster"),
        F.col("_best.d").alias("dist"),
    ).drop("_best")


def lloyd_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Run `iters` full Lloyd rounds from the md5-deterministic init and
    return the FINAL assignment: [<id_col>, cluster (int), dist (bigint)]
    where dist is the exact fixed-point squared distance to the final
    centroid. Every step is replayable in portable SQL (see
    plans/llm_ops10's unrolled oracle)."""
    if k < 1 or iters < 0:
        raise ValueError("k >= 1, iters >= 0")
    quantized = df.select(
        F.col(id_col), _quantize_shifted(F.col(vec_col)).alias("_v")
    ).transform(cut_lineage, eager=False)
    # ^ one materialization (r15 optimization round): the init sample,
    #   every round's partial-sums job, and the final assignment each
    #   consumed this frame -- without the cut each re-scanned the
    #   source and re-quantized every vector (iters + 2 full passes).

    init_rows = (
        quantized.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )  # k rows -- codebook-sized driver payload
    centroids = {j + 1: list(r["_v"]) for j, r in enumerate(init_rows)}

    for _ in range(iters):
        assigned = _assign(quantized, centroids)
        partials = (
            assigned.select("cluster", F.posexplode("_v").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )  # k*dim rows, independent of N
        upd: dict[int, dict[int, int]] = {}
        for r in partials:
            # SQL-semantics integer division (truncate toward zero):
            # matches Spark `div` and DuckDB `//` for EITHER sign, so
            # the oracle replay holds even when a caller feeds
            # components outside the shift's positive range
            s_, n_ = int(r["s"]), int(r["n"])
            q = -((-s_) // n_) if s_ < 0 else s_ // n_
            upd.setdefault(r["cluster"], {})[r["i"]] = q
        centroids = {
            j: [upd[j][i] for i in range(len(c))] if j in upd else c
            for j, c in centroids.items()
        }

    return _assign(quantized, centroids).select(
        F.col(id_col),
        F.col("cluster").cast("int").alias("cluster"),
        F.col("dist").cast("long").alias("dist"),
    )
