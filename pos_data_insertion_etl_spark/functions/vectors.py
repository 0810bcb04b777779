"""Vector math over embedding columns (array<float>), JVM-side.

Determinism design: floating-point dot products are order-sensitive, so
for oracle-checked similarity we quantize each component to a 1e-7
fixed-point BIGINT first. Integer sums are associative -> the same
result on any partitioning/engine; the single final double division and
sqrt are correctly-rounded IEEE ops. At 100 TB this also halves shuffle
width vs float64 and keeps everything in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10_000_000  # 1e7 fixed-point quantization


def quantize_vec(col: Column) -> Column:
    """array<float> -> array<bigint> fixed-point."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * SCALE).cast("long")
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_similarity_fixed_point(qa: Column, qb: Column) -> Column:
    """Cosine over two quantized (bigint) vectors; exact integer dot and
    norms, one double division at the end."""
    dot = _dot(qa, qb).cast("double")
    return dot / (F.sqrt(_dot(qa, qa).cast("double")) * F.sqrt(_dot(qb, qb).cast("double")))


def norm_fixed_point(q: Column) -> Column:
    """sqrt of the exact integer self-dot of a quantized vector.

    Compute this ONCE per vector before a pairwise join: inside the join
    `cosine_precomputed` then costs one dot product per pair instead of
    three (higher-order-function expressions get no common-subexpression
    elimination, so per-pair norm recomputation is real work, not free).
    """
    return F.sqrt(_dot(q, q).cast("double"))


def cosine_precomputed(qa: Column, qb: Column, na: Column, nb: Column) -> Column:
    """Cosine from quantized vectors + their precomputed norms. Value-
    identical to cosine_similarity_fixed_point (same exact integer dot,
    same IEEE sqrt/multiply/divide on the same operands)."""
    return _dot(qa, qb).cast("double") / (na * nb)
