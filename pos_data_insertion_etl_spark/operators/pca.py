"""Distributed PCA over an embedding column -- the dimensionality
reducer that makes downstream ANN (IVF/PQ/LSH in operators/similarity)
cheaper: project d=64 vectors to k=8..16 before indexing.

Scale design (the treeAggregate shape, DataFrame-native):

1. Per PARTITION, one Arrow batch stream computes a partial Gram matrix
   G_p = X_p^T X_p with a single numpy matmul (`mapInPandas`) -- the
   only Python in the operator, vectorized, emitting ONE d*d row per
   partition regardless of row count.
2. The d*d partials element-wise sum in one tiny shuffle
   (posexplode -> groupBy index): bytes shuffled are partitions * d^2
   longs, independent of corpus size.
3. The driver eigendecomposes the d x d Gram (bounded work, numpy
   `eigh`) and broadcasts the top-k components back as plan literals.
4. Projection is JVM-side: k zip_with/aggregate folds per row, no
   Python in the per-row path.

Determinism: vectors are quantized to integer grid (1e4) BEFORE the
matmul and partial Grams are exact int64 sums (products are ~1e8,
safely inside int64 for any realistic partition), so the Gram -- and
therefore the eigenbasis -- is bit-identical under any partitioning.
Eigenvector sign is canonicalized (largest-|coordinate| positive);
eigh on identical input is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: integer grid for Gram accumulation (1e4 keeps int64 partial sums
#: exact up to ~1e10 rows per partition).
GRAM_SCALE = 10_000


def gram_matrix(df: DataFrame, vec_col: str, dim: int) -> list[list[int]]:
    """Exact integer Gram matrix of the quantized vectors (driver-side
    d x d result; the distributed part ships one partial per
    partition)."""

    def partial(iterator):
        import numpy as np
        import pandas as pd

        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in iterator:
            if not len(pdf):
                continue
            x = np.rint(
                np.asarray(list(pdf[vec_col]), dtype=np.float64) * GRAM_SCALE
            ).astype(np.int64)
            acc += x.T @ x
            seen = True
        if seen:
            yield pd.DataFrame({"g": [acc.reshape(-1).tolist()]})

    partials = df.select(vec_col).mapInPandas(
        partial, schema="g array<long>"
    )
    summed = (
        partials.select(F.posexplode("g").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    flat = [0] * (dim * dim)
    for r in summed:
        flat[r.i] = r.s
    return [flat[i * dim : (i + 1) * dim] for i in range(dim)]


def pca_components(
    df: DataFrame, vec_col: str, dim: int, k: int
) -> tuple[list[list[float]], list[float]]:
    """Top-k principal axes of the (uncentered) Gram -- for unit-ish
    embedding clouds centering shifts little and keeping the Gram
    uncentered preserves the pure-integer determinism story. Returns
    (components [k][dim], explained variance per component,
    descending). Signs are canonicalized: each component's
    largest-|coordinate| entry is positive."""
    import numpy as np

    g = np.asarray(gram_matrix(df, vec_col, dim), dtype=np.float64)
    vals, vecs = np.linalg.eigh(g)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps, var = [], []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([round(float(x), 6) for x in v])
        var.append(float(vals[idx]) / (GRAM_SCALE * GRAM_SCALE))
    return comps, var


def pca_project(
    df: DataFrame,
    vec_col: str,
    components: list[list[float]],
    out_col: str = "pca",
) -> DataFrame:
    """Append the k-dim projection as ``out_col`` (array<double>,
    rounded 1e-6). Components ride as plan literals; each coordinate is
    one JVM-side zip_with/aggregate fold -- no Python per row."""

    def dot(comp: list[float]):
        lit = F.array(*[F.lit(x) for x in comp])
        return F.round(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col).cast("array<double>"),
                    lit,
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        )

    return df.withColumn(out_col, F.array(*[dot(c) for c in components]))
