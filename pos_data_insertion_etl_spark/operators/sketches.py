"""KMV (k-minimum-values) distinct-count sketches: mergeable
cardinality estimation that is DETERMINISTIC and exactly
SQL-replayable.

Why KMV and not HyperLogLog here: the engine already serves
`approx_count_distinct` (HLL, q63) for the built-in path. What a
*certifiable* pipeline store needs is a mergeable sketch whose every
byte is a pure function of the input set -- KMV over a fixed hash is
exactly that: the summary is the k smallest distinct 52-bit md5-prefix
values, merging is union-then-take-k-smallest (associative,
commutative, idempotent -- replay-safe by construction), and the
estimator (k-1) * 2^52 // h_k is one integer division. A DuckDB
oracle recomputes the identical summary and estimate from raw data,
so the whole persist/merge/load path hash-certifies (the q211
monitor pattern, but with a FULL oracle instead of bound booleans).

Accuracy is the textbook KMV envelope (relative error ~ 1/sqrt(k-2));
the estimate is biased like any sketch -- the point is bounded state
(k longs per group) and exact replayability, not tighter error than
HLL.

Scale: the k-smallest cut is a TakeOrderedAndProject (per-partition
top-k then a k-row merge -- never a global sort); distinct hashes
shuffle as 8-byte longs, never raw values. Grouped form partitions
the window by group with the same per-group k bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: 13 md5 hex digits = 52 bits. Sized for ANSI mode: the estimator's
#: worst-case operand is (k-1) * 2^52 (h_k = 1 on a degenerate input);
#: at the documented k <= 1024 that is < 2^63, so Spark's ANSI long
#: arithmetic never overflows (60 bits did: 255 * 2^60 > 2^63).
#: 52-bit birthday collisions start mattering around 2^26 ~ 67M
#: distinct values per sketch scope -- group/partition the sketch
#: before that point (the monitors do: one sketch per batch+key).
KMV_HASH_SPACE = 1 << 52


def kmv_hash(col: Column) -> Column:
    """Deterministic 52-bit hash: md5-hex prefix as an integer (the
    bloom.py idiom -- identical value in DuckDB via digit expansion)."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("long")


def kmv_summary(df: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """The sketch: k smallest distinct hash values, one column [hv]."""
    return (
        df.select(kmv_hash(F.col(value_col)).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_merge(summaries: DataFrame, k: int = 256) -> DataFrame:
    """Merge any union of summaries ([hv], possibly with extra columns
    ignored): distinct + k smallest. Idempotent -- replayed batches
    change nothing."""
    return summaries.select("hv").distinct().orderBy("hv").limit(k)


def kmv_estimate(summary: DataFrame, k: int = 256) -> DataFrame:
    """[n_kept, kth_hv, distinct_est]: exact count while the summary
    holds fewer than k values (every distinct value is present), else
    the KMV estimator (k-1) * 2^52 // h_k -- all integer."""
    agg = summary.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("hv").cast("long").alias("kth_hv"),
    )
    return agg.select(
        "n_kept",
        "kth_hv",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(f"CAST({k - 1} AS BIGINT) * {KMV_HASH_SPACE} div kth_hv")
        )
        .cast("long")
        .alias("distinct_est"),
    )


def kmv_summary_grouped(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV summaries: [group, hv] with <= k rows per group
    (rank window partitioned by group over distinct hashes)."""
    hashed = df.select(
        F.col(group_col).alias("group"),
        kmv_hash(F.col(value_col)).alias("hv"),
    ).distinct()
    rn = F.row_number().over(W.partitionBy("group").orderBy("hv"))
    return hashed.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop(
        "_rn"
    )


def kmv_estimate_grouped(
    summaries: DataFrame, k: int = 64
) -> DataFrame:
    """Per-group estimates from (possibly merged) grouped summaries:
    [group, n_kept, kth_hv, distinct_est]."""
    agg = (
        summaries.select("group", "hv")
        .distinct()
        .withColumn(
            "_rn", F.row_number().over(W.partitionBy("group").orderBy("hv"))
        )
        .filter(F.col("_rn") <= k)
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("hv").cast("long").alias("kth_hv"),
        )
    )
    return agg.select(
        "group",
        "n_kept",
        "kth_hv",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(f"CAST({k - 1} AS BIGINT) * {KMV_HASH_SPACE} div kth_hv")
        )
        .cast("long")
        .alias("distinct_est"),
    )


def kmv_intersect_estimate(
    summary_a: DataFrame, summary_b: DataFrame, k: int = 256
) -> DataFrame:
    """Set-overlap estimation from two KMV summaries WITHOUT touching
    the raw sets -- the sketch-level join-cardinality / audience-
    overlap primitive: merge to the union's k smallest, count how many
    of those appear in BOTH input summaries (any union-k-smallest
    element of the intersection necessarily survives in each side's
    own k-smallest, so the count is well-defined), and scale.

        jaccard_fp     = n_inter * 1e6 div n_kept
        intersect_est  = floor(union_est * n_inter / n_kept)

    All-integer and exactly SQL-replayable like the base sketch; the
    usual KMV caveat applies (error ~ 1/sqrt(k) on the Jaccard).
    ANSI sizing: union_est * n_inter can exceed 2^63 (union_est alone
    reaches (k-1)*2^52), so the floor is computed by quotient/remainder
    decomposition -- u div n * i + (u % n) * i div n, exactly
    floor(u*i/n) for positives -- whose terms are bounded by union_est
    (n_inter <= n_kept) and n_kept^2 respectively.

    Output: single row [n_kept, union_est, n_inter, jaccard_fp,
    intersect_est].
    """
    merged = kmv_merge(
        summary_a.select("hv").unionByName(summary_b.select("hv")), k=k
    ).localCheckpoint(eager=False)
    both = merged.join(
        summary_a.select("hv").distinct(), "hv", "left_semi"
    ).join(summary_b.select("hv").distinct(), "hv", "left_semi")
    u = kmv_estimate(merged, k=k).select(
        "n_kept", F.col("distinct_est").alias("union_est")
    )
    i = both.agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    return (
        u.crossJoin(F.broadcast(i))
        .select(
            "n_kept",
            "union_est",
            "n_inter",
            F.expr("(n_inter * 1000000) div n_kept")
            .cast("long")
            .alias("jaccard_fp"),
            F.expr(
                "(union_est div n_kept) * n_inter"
                " + ((union_est % n_kept) * n_inter) div n_kept"
            )
            .cast("long")
            .alias("intersect_est"),
        )
    )


def encoding_advisor(
    df: DataFrame, cols: list[str], k: int = 256
) -> DataFrame:
    """Columnar-layout advisor: estimate each column's distinct-value
    ratio with ONE scan (a KMV sketch per column, stacked before the
    shuffle) and recommend dictionary vs plain encoding -- the
    maintenance-time signal that decides parquet dictionary pages and
    whether a join key is worth bucketing.

    One select explodes each row into (col, hv) pairs -- |cols| rows
    per input row but only 8-byte hashes ever shuffle; the per-column
    k-smallest ride the grouped-sketch window. distinct_ratio_fp is
    min(est, n_rows) * 1e6 div n_rows (the estimator can overshoot
    n_rows at small n); the threshold (dict-encode under 10%) is the
    classic parquet heuristic, exposed in the output rather than
    hidden.

    Output: [column, n_rows, distinct_est, distinct_ratio_fp,
    recommend_dictionary].
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("group"),
                        kmv_hash(F.col(c).cast("string")).alias("hv"),
                    )
                    for c in cols
                ]
            )
        ).alias("_p")
    ).select("_p.group", "_p.hv")
    # pairs are already hashed: feed the grouped estimator directly
    # (kmv_estimate_grouped re-dedups and re-cuts to k internally)
    est = kmv_estimate_grouped(pairs, k=k)
    n = df.count()
    return est.select(
        F.col("group").alias("column"),
        F.lit(n).cast("long").alias("n_rows"),
        "distinct_est",
        F.expr(f"(least(distinct_est, {n}) * 1000000) div {max(n, 1)}")
        .cast("long")
        .alias("distinct_ratio_fp"),
        (
            F.least(F.col("distinct_est"), F.lit(n)) * 10 < F.lit(n)
        ).alias("recommend_dictionary"),
    )
