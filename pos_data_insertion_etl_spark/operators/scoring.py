"""Linear-model inference over engineered features (the "quality
classifier" serving path).

Production curation pipelines score every document with a small linear
or logistic model (fastText-style quality classifiers, contamination
classifiers). Training happens offline; what the ENGINE must provide
is the scale-correct inference shape: a weights TABLE joined broadcast
against a feature matrix in long form -- no per-row Python, no model
object on the executors, works for any feature count without changing
the plan.

Determinism: features and weights are fixed-point integers; the logit
z_fp = bias + sum_f x_fp[f] * w_fp[f] is an exact integer (div-scaled
back once); only the final sigmoid runs in floating point, rounded to
1e-6 per row (the lm_score ln/exp convention -- one libm call on an
identical operand).

Scale: one explode to (id, feature, x) long form, one broadcast join
(weights are KB), one per-id sum -- map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

W_SCALE = 1_000_000  # weights and features in 1e-6 fixed point


def logistic_score(
    features: DataFrame,
    weights: DataFrame,
    id_col: str,
    bias_fp: int = 0,
    threshold_fp: int = 500_000,
) -> DataFrame:
    """Score rows of ``features`` [id, feature, x_fp] against
    ``weights`` [feature, w_fp]; both fixed-point at W_SCALE.

    Output: [id, z_fp, p_fp, accepted] where
    z_fp = bias_fp + (sum x_fp*w_fp) div W_SCALE (exact integer),
    p_fp = round(sigmoid(z_fp / W_SCALE) * W_SCALE), and
    accepted = p_fp >= threshold_fp. Features missing a weight
    contribute nothing (coalesced-zero LEFT join), and an id whose
    features ALL miss the vocabulary still scores -- z_fp = bias_fp --
    so every input id gets a row and a keep/drop decision (an inner
    join would silently drop out-of-vocabulary documents)."""
    scored = (
        features.join(F.broadcast(weights), "feature", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("x_fp") * F.coalesce(F.col("w_fp"), F.lit(0))
            )
            .cast("long")
            .alias("_dot")
        )
        .select(
            F.col(id_col),
            (F.lit(bias_fp) + F.expr(f"_dot div {W_SCALE}"))
            .cast("long")
            .alias("z_fp"),
        )
    )
    z = F.col("z_fp").cast("double") / W_SCALE
    p_fp = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) * W_SCALE).cast(
        "long"
    )
    return scored.select(
        id_col,
        "z_fp",
        p_fp.alias("p_fp"),
        (p_fp >= F.lit(threshold_fp)).alias("accepted"),
    )
