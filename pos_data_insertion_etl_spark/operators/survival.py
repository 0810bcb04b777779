"""Kaplan-Meier survival estimation over right-censored durations.

Time-to-event is the canonical product-analytics question the
reference's mart feeds downstream ("how long from signup to first
purchase?") and an LLM-pipeline telemetry one ("how long until a
crawled URL is re-seen?"). The estimator must handle CENSORING --
subjects still event-free at the observation horizon carry
information (they survived at least that long) that a naive mean of
observed durations throws away.

Engine-portable formulation: durations are integer days; the curve is
reported in log space as a cumulative sum of per-event-time terms

    term_micro(t) = round(ln(1 - d_t / n_t) * 1e6)

where d_t = events at time t and n_t = subjects still at risk
entering t. Each term is one IEEE ln on a ratio of exact integers
(the q129/q241 fixed-point-ln convention), and the cumulative sum of
the ROUNDED integers is exact -- no float accumulation crosses
engines. exp() is deliberately NOT applied; consumers exponentiate
client-side if they want S(t) as a probability.

Terminal boundary: if every remaining subject events at the last time
(d_t = n_t), S(t) hits exactly 0 and ln is undefined -- that term and
every cumulative value from it onward are NULL (nullif guard), the
standard convention.

Scale: one groupBy per subject (first event), one groupBy per
duration (the risk table is duration-domain-sized, not
subject-sized), one ordered window over that table. Subjects never
sort globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def kaplan_meier(
    durations: DataFrame,
    duration_col: str = "t_days",
    event_col: str = "is_event",
) -> DataFrame:
    """Kaplan-Meier risk table + log-survival curve.

    Input: one row per subject -- integer duration and an integer
    event flag (1 = event observed at t, 0 = right-censored at t).

    Output, one row per DISTINCT duration with at least one event or
    censor, ordered by time: [t_days, n_risk, n_event, n_censor,
    ln_surv_micro] where ln_surv_micro is the cumulative sum of
    rounded ln(1 - d/n) micro terms over event times <= t (censor-only
    times contribute 0, the KM convention that censored subjects leave
    the risk set without moving the curve).
    """
    per_t = durations.groupBy(
        F.col(duration_col).cast("long").alias("t_days")
    ).agg(
        F.sum(F.col(event_col).cast("long")).cast("long").alias("n_event"),
        F.sum(
            F.lit(1) - F.col(event_col).cast("long")
        ).cast("long").alias("n_censor"),
    )
    ow = W.orderBy("t_days")
    full = ow.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    run = ow.rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = per_t.select(
        "t_days",
        "n_event",
        "n_censor",
        (
            F.sum(F.col("n_event") + F.col("n_censor")).over(full)
            - F.sum(F.col("n_event") + F.col("n_censor")).over(run)
            + F.col("n_event")
            + F.col("n_censor")
        ).cast("long").alias("n_risk"),
    )
    term = F.when(F.col("n_event") == 0, F.lit(0)).otherwise(
        F.round(
            F.log(
                (F.col("n_risk") - F.col("n_event")).cast("double")
                / F.nullif(F.col("n_risk").cast("double"), F.lit(0.0))
            )
            * F.lit(1000000.0)
        ).cast("long")
    )
    # d == n -> ln(0): NULL from here on (survival is exactly 0)
    term = F.when(
        (F.col("n_event") > 0) & (F.col("n_event") == F.col("n_risk")),
        F.lit(None).cast("long"),
    ).otherwise(term)
    # SUM-over-window skips NULLs in every engine, so the terminal
    # d == n row must be forced NULL explicitly (it is necessarily the
    # LAST row: nobody can be at risk after survival hits 0).
    return (
        risk.withColumn("_term", term)
        .select(
            "t_days",
            "n_risk",
            "n_event",
            "n_censor",
            F.when(F.col("_term").isNull(), F.lit(None).cast("long"))
            .otherwise(F.sum("_term").over(run).cast("long"))
            .alias("ln_surv_micro"),
        )
        .orderBy("t_days")
    )
