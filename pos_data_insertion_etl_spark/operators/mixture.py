"""Budgeted data mixing: fill per-source token budgets derived from
target mixture weights, selecting documents deterministically.

The last stage of a curation pipeline before packing: given "the
training run wants 50% src0 / 30% src1 / 20% src2 and a total budget of
N tokens", select documents per source until that source's budget is
full. Selection order within a source is either uniform-deterministic
(md5 of the id -- an unbiased shuffle both engines can reproduce, the
q126 source-cap idiom) or quality-first when a score column is given
(take the best documents, id tiebreak).

Scale design: one window per source partition (running token sum over
the selection order) -- the parallel unit is the source, like
q91_sequence_packing's shard. No collect, no driver loop; the weight
table rides as a literal CASE expression (mixtures are a handful of
sources by construction). Documents from sources without a weight are
dropped (weight 0).

A document is selected while its tokens START inside the budget (the
same strict-prefix rule as sequence packing), so every budget is filled
to at least its target minus one document and the cut is
order-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import tokens


def budgeted_mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    score_col: str | None = None,
) -> DataFrame:
    """Select documents to fill per-source token budgets.

    Returns [id, source, n_tokens, sel_rank, cum_before, source_budget]
    for every SELECTED document. ``weights`` need not sum to 1 -- each
    source's budget is round(weight * total_tokens) independently, so
    callers can oversample a source without renormalizing the rest.
    """
    if not weights:
        raise ValueError("weights must name at least one source")
    budget = F.lit(None).cast("long")
    for src, wgt in sorted(weights.items()):
        budget = (
            F.when(F.col(source_col) == src, F.lit(int(round(wgt * total_tokens))))
            .otherwise(budget)
        )
    order: list[Column] = (
        [F.desc(score_col), F.col(id_col)]
        if score_col is not None
        else [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    )
    w_rank = W.partitionBy(source_col).orderBy(*order)
    w_sum = w_rank.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        docs.select(
            F.col(id_col),
            F.col(source_col),
            F.size(tokens(text_col)).cast("long").alias("n_tokens"),
            *( [F.col(score_col)] if score_col is not None else [] ),
        )
        .withColumn("source_budget", budget)
        .filter(F.col("source_budget").isNotNull())
        .withColumn("sel_rank", F.row_number().over(w_rank).cast("long"))
        .withColumn(
            "cum_before", F.sum("n_tokens").over(w_sum) - F.col("n_tokens")
        )
        .filter(F.col("cum_before") < F.col("source_budget"))
        .select(
            id_col,
            source_col,
            "n_tokens",
            "sel_rank",
            "cum_before",
            "source_budget",
        )
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Efraimidis-Spirakis A-ES weighted sampling WITHOUT replacement,
    one pass, deterministic: item i gets key u_i^(1/w_i) with u_i a
    hashed-uniform from md5(id) -- no RNG state, so the sample is a
    pure function of (ids, weights) and reproducible on any cluster --
    and the k largest keys per stratum are the sample (inclusion
    probability proportional to weight, the classic A-ES result).

    Plan shape: one window per stratum (global stratum when
    ``stratum_col`` is None -- then the single-partition window is the
    bottleneck and callers should stratify, which is also the
    statistically better design). Keys are log-transformed
    (ln(u)/w, order-equivalent) for numeric stability and ROUNDED to
    1e-9 with an id tiebreak so the rank order is engine-portable.

    Returns the sampled rows with [es_key, sample_rank] appended.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    # u in [0, 1): nudge 0 up to avoid ln(0); 1e-13 << 16^-13 grid
    key = F.round(
        F.log(u + F.lit(1e-300)) / F.col(weight_col).cast("double"), 9
    )
    part = [stratum_col] if stratum_col else []
    # maximizing u^(1/w) == maximizing ln(u)/w (keys are negative, the
    # largest sit closest to zero) -> descending order
    w = W.partitionBy(*part).orderBy(F.desc("es_key"), F.col(id_col))
    return (
        df.withColumn("es_key", key)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )
