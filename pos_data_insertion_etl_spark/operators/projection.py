"""Random-projection (Johnson-Lindenstrauss) dimensionality reduction.

The storage/compute half of the embedding stack next to PCA (exact
directions, q140) and PQ (codebook compression, q133): project d-dim
vectors onto k seeded random directions so downstream distance work
costs O(k) per pair. Uses the same seeded-Gaussian plane machinery as
sign-LSH (similarity.seeded_planes) -- sign-LSH keeps only the sign
bit of each projection; this keeps the magnitude.

Determinism: plane coefficients quantize to 1e-6 ints, vector
components to 1e-7 ints (the q124/q169 convention), so each projected
coordinate is an exact integer dot product; the coordinate is then
down-shifted by PROJ_SHIFT via integer div (all-positive after the
norm guard is NOT assumed -- Spark `div` and DuckDB `//` both truncate
toward zero, so the shift is portable for either sign).

Scale: pure projection -- no shuffle, no join; the plane matrix is
k*d literals inside the expression tree (KB-sized), whole-stage
codegen end to end. The distortion audit joins id-adjacent pairs only
(the q54 bounded-pair convention) to keep the check O(N)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import PLANE_SCALE, seeded_planes
from ..functions.vectors import SCALE as VEC_SCALE

#: integer down-shift applied to each raw projected coordinate.
#: Raw dot ~ VEC_SCALE * PLANE_SCALE * d ~ 1.5e15; shifted ~ 1.5e6, so
#: a squared pair distance over out_dim <= 64 coords stays <= ~5e14 and
#: the milli-ratio's *1000 stays well inside BIGINT under ANSI mode
#: (1e6 was measured to overflow the ratio at dim=64 -- see q195).
PROJ_SHIFT = 1_000_000_000


def _quantized(vec_col: str):
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * VEC_SCALE).cast("long"),
    )


def _coord_exprs(out_dim: int, dim: int, seed: int) -> list:
    """Exact-integer projected coordinates over a `_qv` column."""
    return [
        F.expr(
            "aggregate(zip_with(_qv, array({lits}), (a, b) -> a * b),"
            " 0L, (acc, x) -> acc + x) div {shift}".format(
                lits=", ".join(
                    f"{int(round(c * PLANE_SCALE))}L" for c in row
                ),
                shift=PROJ_SHIFT,
            )
        )
        for row in seeded_planes(out_dim, dim, seed)
    ]


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    dim: int,
    seed: int = 23,
) -> DataFrame:
    """[id, proj] with proj = array<long> of `out_dim` exact projected
    coordinates (fixed-point, down-shifted by PROJ_SHIFT)."""
    return (
        df.select(F.col(id_col), _quantized(vec_col).alias("_qv"))
        .select(
            F.col(id_col),
            F.array(*_coord_exprs(out_dim, dim, seed)).alias("proj"),
        )
    )


def projection_distortion(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    dim: int,
    seed: int = 23,
    max_id_gap: int = 5,
) -> DataFrame:
    """Distortion audit over id-adjacent pairs: exact squared distance
    in the original fixed-point space vs the projected space, plus
    ratio_milli = (d_proj_sq * 1000) div d_orig_sq (NULL for an exact
    duplicate pair, where the original distance is 0). No theorem
    bound is claimed per pair (JL bounds are probabilistic over the
    seed); the value of the audit is the exact, replayable distance
    table.

    Output: [id_a, id_b, d_orig_sq, d_proj_sq, ratio_milli].
    """
    base = (
        df.select(F.col(id_col), _quantized(vec_col).alias("_qv"))
        .select(
            F.col(id_col),
            "_qv",
            F.array(*_coord_exprs(out_dim, dim, seed)).alias("proj"),
        )
        .localCheckpoint(eager=False)
    )  # one scan + one projection feeds both pair sides
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col("_qv").alias("_qa"),
        F.col("proj").alias("_pa"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col("_qv").alias("_qb"),
        F.col("proj").alias("_pb"),
    )
    sq = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # block equi-join: a pair within max_id_gap always lands in the
    # same or adjacent block, so the a-side explodes into (block,
    # block+1) and the join key is the block -- no nested-loop theta
    # join at any scale (the q115 binned-range pattern)
    g = int(max_id_gap)
    a_keyed = a.withColumn(
        "_blk",
        F.explode(
            F.array(
                F.expr(f"id_a div {g}"), F.expr(f"id_a div {g} + 1")
            )
        ),
    )
    b_keyed = b.withColumn("_blk", F.expr(f"id_b div {g}"))
    pairs = a_keyed.join(b_keyed, "_blk").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("id_b") - F.col("id_a") <= g)
    )
    return pairs.select(
        "id_a",
        "id_b",
        sq(F.col("_qa"), F.col("_qb")).alias("d_orig_sq"),
        sq(F.col("_pa"), F.col("_pb")).alias("d_proj_sq"),
    ).select(
        "id_a",
        "id_b",
        "d_orig_sq",
        "d_proj_sq",
        F.expr("(d_proj_sq * 1000) div nullif(d_orig_sq, 0)").alias(
            "ratio_milli"
        ),
    )


#: Matryoshka audit quantization: 1e4 keeps the squared-norm sums small
#: enough that head_fp * 1e6 stays inside BIGINT at any dim <= 4096
#: (dim * (1e4)^2 * 1e6 = dim * 1e14).
MRL_SCALE = 10_000


def matryoshka_truncation_report(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_dims: int | None = None,
) -> DataFrame:
    """Matryoshka/truncation audit: how much of each vector's squared
    norm survives keeping only the first ``keep_dims`` components
    (default d/2) -- the acceptance gate before shipping truncated
    embeddings (MRL-style serving cuts index cost 2-4x IF the energy
    actually concentrates in the prefix).

    Exact-integer contract: components quantize to 1e-4 ints (both
    engines round identically: away from zero on the .5 boundary), the
    two squared-norm sums are exact BIGINTs via JVM HOF folds, and
    energy_ppm = head_fp * 1e6 div full_fp -- one truncating integer
    division, NULL for the zero vector.

    Scale: pure projection -- no shuffle, no join, whole-stage codegen;
    runs at corpus width. Output [id, dim, keep_dims, full_fp, head_fp,
    energy_ppm].
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * MRL_SCALE).cast("long"),
    )
    sumsq = lambda col: F.aggregate(  # noqa: E731
        col,
        F.lit(0).cast("long"),
        lambda acc, r: acc + r * r,
    )
    out = emb.select(
        F.col(id_col),
        F.size(vec_col).cast("long").alias("dim"),
        q.alias("_q"),
    )
    keep = (
        F.lit(keep_dims).cast("long")
        if keep_dims is not None
        else (F.col("dim") / 2).cast("long")
    )
    return (
        out.withColumn("keep_dims", keep)
        .select(
            id_col,
            "dim",
            "keep_dims",
            sumsq(F.col("_q")).alias("full_fp"),
            sumsq(
                F.slice(F.col("_q"), 1, F.col("keep_dims").cast("int"))
            ).alias("head_fp"),
        )
        .withColumn(
            "energy_ppm",
            F.expr("head_fp * 1000000 div nullif(full_fp, 0)").cast(
                "long"
            ),
        )
    )
