"""Binned range join: the both-sides-large plan for interval joins.

A broadcast non-equi join (q42's plan) is right when the interval side
is tiny. When BOTH sides are big -- points against millions of
intervals -- a nested loop is quadratic and a broadcast impossible. The
standard decomposition makes it an EQUI join:

* pick a bin width w;
* each interval [lo, hi) replicates to every bin it overlaps
  (`explode(sequence(floor(lo/w), floor(hi/w)))` -- expansion factor is
  interval_length/w, a tunable constant);
* each point maps to exactly ONE bin (`floor(v/w)`);
* join on the bin (hash/sort-merge, shuffles on the bin key, AQE can
  split skewed bins), then re-check the exact predicate to discard
  same-bin non-overlaps.

Open-ended intervals (hi = +inf sentinels) would replicate without
bound, so they are clamped to the observed point maximum first -- one
scalar aggregate over the points (a driver-side O(1) result, the same
trade as combine.py's partition offsets), which cannot change the join
result because no point lies beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    value_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    domain_max: float | None = None,
) -> DataFrame:
    """Join each point row to every interval row with lo <= v < hi,
    using only equi-joins. ``domain_max`` clamps open-ended intervals;
    when None it is computed from the points (one extra scalar job).
    Output = point columns + interval columns."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if domain_max is None:
        row = points.agg(F.max(value_col)).collect()[0]
        domain_max = row[0]
        if domain_max is None:  # no points: nothing can match
            return points.crossJoin(intervals).limit(0)
    w = F.lit(float(bin_width))
    # Intervals that cannot match any point must go BEFORE binning:
    # empty intervals (hi <= lo), and intervals entirely above the point
    # maximum (lo > domain_max -- every point is <= domain_max).  Without
    # this, clamping makes hi_clamped < lo and F.sequence generates a
    # DESCENDING run replicating the interval into every bin down to the
    # domain max; one far-future sentinel lo could exceed Spark's array
    # limit and fail the job.  After the filter, lo <= domain_max <
    # domain_max + w and lo < hi, so hi_clamped > lo and the sequence is
    # always ascending.
    live = intervals.filter(
        (F.col(lo_col) < F.col(hi_col))
        & (F.col(lo_col) <= F.lit(float(domain_max)))
    )
    hi_clamped = F.least(F.col(hi_col), F.lit(float(domain_max)) + w)
    binned_iv = live.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w), F.floor(hi_clamped / w)
            )
        ),
    )
    binned_pt = points.withColumn("_bin", F.floor(F.col(value_col) / w))
    return (
        binned_pt.join(binned_iv, "_bin")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


def interval_overlap_join(
    df: "DataFrame",
    key_col: str,
    lo_col: str,
    hi_col: str,
    order_cols: list[str],
) -> "DataFrame":
    """Interval-interval OVERLAP self-join within a partition key: all
    pairs of rows sharing ``key_col`` whose [lo, hi] ranges intersect
    (temporal-DB overlap semantics: a.lo <= b.hi AND b.lo <= a.hi),
    plus the overlap length in days. The third member of the range
    family: binned_range_join covers point-in-interval, asof covers
    nearest-preceding; this covers interval x interval.

    Pairs are canonicalized by strict lexicographic order over
    (``order_cols``, lo, hi) -- the interval bounds are appended to
    the comparison struct automatically, so rows whose order_cols tie
    but whose intervals differ STILL pair (only rows identical in key,
    order columns, and interval drop, identically in any engine --
    the lineitem duplicate-(orderkey, linenumber) hazard).

    Scale: one equi-join on the partition key -- fan-out is
    size-choose-2 per key, bounded by the key's group size (orders
    hold a handful of lines); an unkeyed overlap join would need the
    binned machinery instead.
    """
    cols = [F.col(c) for c in order_cols] + [F.col(lo_col), F.col(hi_col)]
    a = df.select(
        F.col(key_col).alias("_k"),
        F.col(lo_col).alias("lo_a"),
        F.col(hi_col).alias("hi_a"),
        F.struct(*cols).alias("_oa"),
        *[F.col(c).alias(f"{c}_a") for c in order_cols],
    )
    b = df.select(
        F.col(key_col).alias("_k"),
        F.col(lo_col).alias("lo_b"),
        F.col(hi_col).alias("hi_b"),
        F.struct(*cols).alias("_ob"),
        *[F.col(c).alias(f"{c}_b") for c in order_cols],
    )
    return (
        a.join(b, "_k")
        .filter(
            (F.col("_oa") < F.col("_ob"))
            & (F.col("lo_a") <= F.col("hi_b"))
            & (F.col("lo_b") <= F.col("hi_a"))
        )
        .select(
            F.col("_k").alias(key_col),
            *[F.col(f"{c}_a") for c in order_cols],
            *[F.col(f"{c}_b") for c in order_cols],
            (
                F.datediff(
                    F.least("hi_a", "hi_b"), F.greatest("lo_a", "lo_b")
                )
                + 1
            )
            .cast("long")
            .alias("overlap_days"),
        )
    )
