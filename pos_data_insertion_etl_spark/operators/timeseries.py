"""Exponentially-weighted time-series smoothing, engine-portable.

Complements gapfill.py (structural repair) and the windowed
aggregations in plans/relational.py (uniform weights): EWMA weights
recent points geometrically. A true infinite-horizon EWMA is a
recursive state fold -- cross-engine float determinism is hopeless
because every engine folds in its own order. This variant makes it
portable by construction:

* FINITE horizon: `taps` lagged values per row (a fixed window frame).
* DYADIC alpha = 1/2: every weight 2^-(i+1) is a power of two, so each
  product weight*value is EXACT in IEEE doubles (exponent shift, no
  mantissa rounding).
* ONE fixed expression tree: w0*v0 + w1*v1 + ... evaluated
  left-to-right in both engines -> bit-identical sums, then a single
  division by the closed-form weight total (2^taps - 1) / 2^taps.

Scale: per-key window over (order_cols) -- one hash partition by key,
one sort, no joins; `taps` lag expressions ride the same window frame.
Keys are independent, so skew only matters for a single pathological
key (same envelope as any per-user sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def ewma_dyadic(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    taps: int = 8,
) -> DataFrame:
    """Append `ewma` = sum_{i=0..taps-1} 2^-(i+1) * value[t-i],
    normalized by (1 - 2^-taps); NULL until a key has `taps` rows
    (warm-up -- no zero-padding bias, and a deterministic NULL is
    portable where a partial-window renormalization would re-divide
    per row).

    `order_cols` must be a TOTAL order within each key (pass a unique
    id tiebreak); ties would make lag() nondeterministic.
    """
    if taps < 1 or taps > 52:
        raise ValueError("1 <= taps <= 52 (dyadic weights must stay exact)")
    w = W.partitionBy(key_col).orderBy(*order_cols)
    v = F.col(value_col).cast("double")
    acc = v * F.lit(0.5)
    for i in range(1, taps):
        acc = acc + F.lag(v, i).over(w) * F.lit(2.0 ** -(i + 1))
    norm = 1.0 - 2.0**-taps
    rn = F.row_number().over(w)
    return df.withColumn(
        "ewma",
        F.when(rn >= taps, acc / F.lit(norm)).otherwise(F.lit(None)),
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov transition table over per-key event
    sequences: the session-modeling primitive (what follows what, and
    how often) behind next-event prediction features and synthetic
    session generation.

    Each key's events are ordered by ``order_cols`` (callers MUST pass
    a total order -- e.g. [ts, event_id] -- or LEAD is
    nondeterministic); LEAD pairs consecutive states, the pair counts
    aggregate with map-side combine, and the per-source row
    probability is an exact 1e-6 fixed-point integer division
    (engine-portable; no doubles anywhere).

    Scale: ONE hash partition by key + per-key sort for the window,
    then one (from,to) groupBy whose cardinality is |states|^2 --
    tiny. The per-from totals join is a broadcast of |states| rows.

    Output: [from_state, to_state, n, prob_fp].
    """
    lead = F.lead(state_col).over(
        W.partitionBy(key_col).orderBy(*order_cols)
    )
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            lead.alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(
        F.sum("n").alias("_tot")
    )
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        F.col("n").cast("long").alias("n"),
        F.expr("(n * 1000000) div _tot").cast("long").alias("prob_fp"),
    )


def dow_seasonal_residuals(
    daily: DataFrame,
    day_col: str,
    n_col: str,
    anomaly_pct: int = 20,
) -> DataFrame:
    """Day-of-week seasonal profile + residual anomalies over a daily
    count series: the load-monitoring decomposition (is today's
    volume off for a Tuesday?) that feeds ingest alerting.

    The weekday key is epoch-day mod 7 (datediff from 1970-01-01 --
    identical integer arithmetic in Spark and DuckDB; no locale- or
    engine-dependent DAYOFWEEK numbering). Per-dow means are exact
    1e-3 fixed point (sum*1000 div count), residuals are exact
    integer differences, and a day is anomalous when
    |residual| * 100 > anomaly_pct * dow_mean -- all-integer, so the
    flag never flips on a rounding boundary.

    Scale: the input is already one row per day (pre-aggregated
    upstream); the 7-row dow profile broadcasts back. Output:
    [day, dow, n, dow_mean_milli, resid_milli, is_anomaly].
    """
    base = daily.select(
        F.col(day_col).alias("day"),
        F.col(n_col).cast("long").alias("n"),
        (
            F.datediff(F.col(day_col), F.lit("1970-01-01").cast("date"))
            % 7
        )
        .cast("long")
        .alias("dow"),
    )
    means = base.groupBy("dow").agg(
        F.sum("n").alias("_tot"), F.count(F.lit(1)).alias("_cnt")
    )
    return base.join(F.broadcast(means), "dow").select(
        "day",
        "dow",
        "n",
        F.expr("(_tot * 1000) div _cnt").cast("long").alias(
            "dow_mean_milli"
        ),
        (
            F.col("n") * 1000 - F.expr("(_tot * 1000) div _cnt")
        ).cast("long").alias("resid_milli"),
        (
            F.abs(F.col("n") * 1000 - F.expr("(_tot * 1000) div _cnt"))
            * 100
            > F.lit(anomaly_pct) * F.expr("(_tot * 1000) div _cnt")
        ).alias("is_anomaly"),
    )


def centered_moving_trend(
    daily: DataFrame,
    day_col: str,
    n_col: str,
    half_window: int = 3,
) -> DataFrame:
    """Centered moving-average trend + detrended residual over a daily
    count series -- the trend half of an STL-style decomposition
    (pair with dow_seasonal_residuals for the seasonal half).

    The frame is ROW-based over days ordered by date (edges shrink to
    the available rows; with gaps in the calendar the window covers
    the nearest PRESENT days -- callers wanting strict calendar frames
    gap-fill first with operators/gapfill). trend_milli =
    sum(n)*1000 div count over the frame -- exact integers, so an
    OVER ... ROWS BETWEEN oracle replays it bit-for-bit.

    Scale: one global sort over the DAILY series (one row per day --
    thousands of rows at any corpus size; the heavy groupBy happened
    upstream). Output: [day, n, n_frame, trend_milli, detrended_milli].
    """
    w = W.orderBy(day_col).rowsBetween(-half_window, half_window)
    return daily.select(
        F.col(day_col).alias("day"),
        F.col(n_col).cast("long").alias("n"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_frame"),
        F.expr(
            f"(sum({n_col}) over (order by {day_col} rows between"
            f" {half_window} preceding and {half_window} following)"
            f" * 1000) div (count(1) over (order by {day_col} rows"
            f" between {half_window} preceding and {half_window}"
            f" following))"
        )
        .cast("long")
        .alias("trend_milli"),
    ).select(
        "day",
        "n",
        "n_frame",
        "trend_milli",
        (F.col("n") * 1000 - F.col("trend_milli"))
        .cast("long")
        .alias("detrended_milli"),
    )


def fano_burstiness(
    df: DataFrame,
    group_col: str,
    day_col: str,
    ts_col: str | None = None,
) -> DataFrame:
    """Per-group Fano factor (variance / mean) of daily counts -- the
    burstiness monitor: ~1e6 ppm for Poisson-like steady arrivals,
    far above for bursty spam/incident traffic, below for throttled
    feeds. The dispersion complement to q239's CUSUM level drift.

    Exact contract over OBSERVED days (a day with zero rows for the
    group contributes no count -- gapfill upstream if absent days must
    count as zeros): with population variance,
    fano = var/mean = (n * sum(x^2) - S^2) / (n * S) -- all-integer,
    emitted as 1e6 fixed point via one truncating div. Exact while
    n * sum(x^2) < 2^63 (centuries of daily data at millions/day).

    Scale: one groupBy(group, day) with map-side combine, then one
    tiny groupBy(group). Output [group, n_days, total,
    mean_milli, fano_ppm].
    """
    day = F.col(day_col) if ts_col is None else F.to_date(ts_col)
    daily = df.groupBy(
        F.col(group_col).alias("grp"), day.alias("_day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    return (
        daily.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("x").cast("long").alias("total"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("_sumsq"),
        )
        .select(
            "grp",
            "n_days",
            "total",
            F.expr("total * 1000 div n_days").cast("long").alias(
                "mean_milli"
            ),
            # Divide-first above 1e6 (q256 pattern): the variance
            # numerator is already bounded by n*sum(x^2) < 2^63; its
            # 1e6 multiple is not.
            F.expr(
                "CASE WHEN n_days * total >= 1000000"
                " THEN (n_days * _sumsq - total * total)"
                "      div ((n_days * total) div 1000000)"
                " ELSE ((n_days * _sumsq - total * total) * 1000000)"
                "      div (n_days * total) END"
            )
            .cast("long")
            .alias("fano_ppm"),
        )
    )


def permutation_entropy(
    series: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Permutation entropy (Bandt-Pompe, embedding m=3) of an ordered
    series -- the standard model-free complexity gauge for a metric
    stream: ~0 for monotone/periodic series, ln(6) for white noise.
    The drift monitors (q239/q254/q259) ask "did the level move?";
    this asks "did the DYNAMICS change?" -- a complementary panel for
    corpus-ingest telemetry.

    Each consecutive value triple (x0, x1, x2) is mapped to its
    ordinal pattern via the three pairwise comparisons c01 = x1 >= x0,
    c02 = x2 >= x0, c12 = x2 >= x1 (ties rank by time, the Bandt-Pompe
    convention), coded 4*c01 + 2*c02 + c12 -- 6 of the 8 codes are
    triangle-consistent, so at most 6 pattern rows come out. Per
    pattern:

        p_ppm      = (cnt * 1e6) div total          (exact integer)
        term_micro = round(p * ln(p) * -1e6)        (one IEEE chain)
        h_micro    = sum(term_micro)                (exact integer)

    Determinism: comparisons and counts are exact; the only floats are
    the per-pattern p = double(cnt)/total and its p*ln(p) chain,
    evaluated in one fixed order on identical operands -> the rounded
    micro terms replay bit-for-bit in any engine.

    Scale: one ordered window (two lags) over the series -- for the
    daily-grain series this feeds, thousands of rows, one partition by
    construction; the pattern histogram is <= 6 rows. For per-key
    fleets, partition the window by key first.
    """
    ow = W.orderBy(F.col(order_col))
    x2 = F.col(value_col)
    x1 = F.lag(value_col, 1).over(ow)
    x0 = F.lag(value_col, 2).over(ow)
    coded = (
        series.select(
            (
                F.when(x1 >= x0, 4).otherwise(0)
                + F.when(x2 >= x0, 2).otherwise(0)
                + F.when(x2 >= x1, 1).otherwise(0)
            ).cast("long").alias("pattern"),
            x0.alias("_x0"),
        )
        .filter(F.col("_x0").isNotNull())
        .select("pattern")
    )
    hist = coded.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    full = W.partitionBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    probs = hist.select(
        "pattern",
        "cnt",
        F.sum("cnt").over(full).cast("long").alias("_total"),
    ).select(
        "pattern",
        "cnt",
        F.expr("cnt * 1000000 div _total").cast("long").alias("p_ppm"),
        F.round(
            (F.col("cnt").cast("double") / F.col("_total").cast("double"))
            * F.log(
                F.col("cnt").cast("double") / F.col("_total").cast("double")
            )
            * F.lit(-1000000.0)
        ).cast("long").alias("term_micro"),
    )
    return probs.select(
        "*",
        F.sum("term_micro").over(full).cast("long").alias("h_micro"),
    ).orderBy("pattern")
