"""Semantic (embedding-space) drift between two corpus versions.

The categorical monitor (operators/quantiles.categorical_drift) sees a
mix shift only when a LABEL moves; a corpus can keep its source/lang
mix constant while the CONTENT drifts (new topics, new boilerplate,
new scraper). The cheapest scalable signal for that is the per-group
embedding CENTROID: means are one map-side-combined aggregation per
side, and comparing old vs new centroids (cosine + norm ratio) flags
groups whose semantic center moved.

Determinism: embeddings quantize to the engine-wide 1e-7 fixed point
(functions/vectors.quantize_vec); centroid sums are exact integer
sums per component (associative -- partitioning-proof), and the final
cosine/norm arithmetic is a handful of IEEE ops on identical operands
in both engines, so the operator carries a FULL DuckDB oracle.

Scale shape: explode each vector's components (dim integers per row),
ONE shuffle keyed on (group, component_idx) with map-side combine --
the aggregate state is group-count x dim rows regardless of corpus
size -- then collapse each side's component sums back to one array
per group and join old x new on the group key. No broadcast of
anything data-sized, no driver-side math.

The reference has no analytics tier at all (stored procedures,
/root/reference/main.py:181-211); this extends the engine's
LLM-curation drift family (categorical q168/q175, quantile q172).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import quantize_vec


def _centroid_sums(df: DataFrame, group_col: str, vec_col: str) -> DataFrame:
    """[group, i, s, n]: exact integer component sums + row count per
    group. posexplode (STRICT, not _outer) keeps the component index
    and drops NULL/empty-vector rows entirely, so n counts the rows
    that actually participate in the sums -- an _outer explode would
    emit an i=NULL row whose count competes in the MAX(n) downstream
    and misreport group sizes on dirty data. Sums are associative
    BIGINTs (|component| <= ~2^25, so 2^38 rows per group fit int64)."""
    q = quantize_vec(F.col(vec_col))
    return (
        df.select(
            F.col(group_col).alias("group"),
            F.posexplode(q).alias("i", "c"),
        )
        .groupBy("group", "i")
        .agg(
            F.sum("c").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def embedding_centroid_drift(
    old: DataFrame,
    new: DataFrame,
    group_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-group semantic drift report between two corpus versions:

    [group, n_old, n_new, centroid_cos, norm_ratio, drift]

    ``centroid_cos`` is the cosine between the two centroids (computed
    on the exact integer component sums -- dividing both sides by
    their counts cancels out of the cosine, so no mean is ever
    materialized); ``norm_ratio`` is |mean_new| / |mean_old| (the
    count division does NOT cancel there, so it is applied as one
    exact double each); ``drift`` = 1 - centroid_cos, rounded like
    everything else to 1e-6. Groups present on only one side carry
    NULL cosine (nothing to compare against) and keep their counts.
    """
    o = _centroid_sums(old, group_col, vec_col)
    n = _centroid_sums(new, group_col, vec_col)
    j = (
        o.select(
            "group", "i",
            F.col("s").alias("so"),
            F.col("n").alias("n_old"),
        )
        .join(
            n.select(
                "group", "i",
                F.col("s").alias("sn"),
                F.col("n").alias("n_new"),
            ),
            ["group", "i"],
            "full_outer",
        )
    )
    # Products of component SUMS overflow int64 at corpus scale (a
    # component sum is ~1e7 * n; its square crosses 2^63 near n ~ 2e5
    # rows per group), so the pairwise products run in exact DECIMAL --
    # associative like the integer sums, cast to double once at the
    # end (DuckDB mirrors with HUGEINT).
    dso = F.col("so").cast("decimal(19,0)")
    dsn = F.col("sn").cast("decimal(19,0)")
    per_group = j.groupBy("group").agg(
        F.max("n_old").alias("n_old"),
        F.max("n_new").alias("n_new"),
        F.sum(dso * dsn).alias("dot"),
        F.sum(dso * dso).alias("oo"),
        F.sum(dsn * dsn).alias("nn"),
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("oo").cast("double"))
        * F.sqrt(F.col("nn").cast("double"))
    )
    # |mean| = sqrt(sum^2)/count; ratio needs the counts back
    norm_ratio = (
        F.sqrt(F.col("nn").cast("double")) / F.col("n_new").cast("double")
    ) / (
        F.sqrt(F.col("oo").cast("double")) / F.col("n_old").cast("double")
    )
    return per_group.select(
        "group",
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        F.round(cos, 6).alias("centroid_cos"),
        F.round(norm_ratio, 6).alias("norm_ratio"),
        F.round(F.lit(1.0) - cos, 6).alias("drift"),
    )
