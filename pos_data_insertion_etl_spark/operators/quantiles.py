"""Deterministic mergeable quantile summaries with CERTIFIED rank
error -- the third sketch in the family next to Misra-Gries heavy
hitters and Count-Min (operators/heavyhitters.py).

Design (stratified sorted-stride sampling, the Munro-Paterson idea in
its simplest mergeable form): each Arrow batch sorts its values and
keeps every ``stride``-th element (stride = ceil(len/k)); a kept
element carries the WEIGHT of the block it stands for. For a query
value v, only the single block that STRADDLES v can be miscounted --
every other block lies entirely on one side -- so one batch
contributes at most (stride - 1) rank error, and the total bound is
the sum of per-batch errors. That per-batch error rides IN the
summary (`err` column), so the bound is computed from the summary
itself (``rank_error_bound``): callers don't trust the sketch, they
check it, exactly like the heavy-hitter summary's certified
(count_min, count_max) envelope.

Mergeability: summaries UNION (bounds add; no raw data touched), and
``compress`` re-compresses a grown summary back to ~k weighted
elements, folding the union's accumulated error into the new batch's
`err`. Persist-summary / merge / compress is the cross-ingest shape
Spark's built-in percentile_approx (q64) cannot serve.

Scale: one pass, no shuffle to build (mapInPandas); summary size is
<= k per Arrow batch; merge is a union; compress and estimation touch
only summary-sized data (driver guards trip on anything larger).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..smallframe import values_frame

SUMMARY_SCHEMA = "value double, weight long, err long, batch_id long"

#: refuse driver-side work on anything bigger than this many summary
#: rows -- a summary this large means the caller skipped compression.
_DRIVER_GUARD = 1_000_000


def quantile_summary(
    df: DataFrame, value_col: str, k: int = 256
) -> DataFrame:
    """One-pass summary [value, weight, err, batch_id]: per Arrow
    batch, sorted stride sampling keeping the LAST element of each
    block of ``stride`` values (weight = block size; the final partial
    block keeps its own smaller weight). `err` = stride - 1, the
    batch's certified rank-error contribution. Deterministic given the
    batching; nulls are dropped."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        seq = 0
        for pdf in batches:
            vals = pdf[pdf.columns[0]].dropna().sort_values().to_numpy()
            n = len(vals)
            if n == 0:
                continue
            stride = -(-n // k)  # ceil
            rows = []
            pos = stride - 1
            while pos < n:
                rows.append((float(vals[pos]), stride))
                pos += stride
            tail = n - len(rows) * stride
            if tail > 0:  # final partial block, represented by its max
                rows.append((float(vals[n - 1]), tail))
            yield pd.DataFrame(
                {
                    "value": [r[0] for r in rows],
                    "weight": [r[1] for r in rows],
                    "err": stride - 1,
                    "batch_id": pid * 1_000_000 + seq,
                }
            )
            seq += 1

    return df.select(F.col(value_col).cast("double")).mapInPandas(
        summarize, SUMMARY_SCHEMA
    )


GROUPED_SUMMARY_SCHEMA = (
    "key string, value double, weight long, err long, batch_id long"
)


def grouped_quantile_summary(
    df: DataFrame, key_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """Per-KEY mergeable quantile summaries: the stratified
    sorted-stride sample of ``quantile_summary``, built independently
    for every value of ``key_col`` (per-source length distributions,
    per-language scores -- the stratified form a curation dashboard
    wants).

    ONE shuffle keyed on the group (groupBy + applyInPandas); each
    group's entire value set lands in one Arrow group, is sorted once,
    and emits <= k weighted elements with the same certified rank
    error as the global operator (one batch per key here, so the
    bound is just stride - 1). Output is <= n_keys * k rows; per-key
    estimation reuses the global helpers after a key filter. Keys
    whose cardinality rivals the row count degrade to ~1 row per key
    (weight 1, err 0) -- correct, just pointless; this operator is for
    LOW-cardinality strata, like every stratified op in the registry
    (q126's source cap argument).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        vals = pdf[value_col].dropna().sort_values().to_numpy()
        n = len(vals)
        if n == 0:
            return pd.DataFrame(
                columns=["key", "value", "weight", "err", "batch_id"]
            )
        stride = -(-n // k)  # ceil
        rows = []
        pos = stride - 1
        while pos < n:
            rows.append((float(vals[pos]), stride))
            pos += stride
        tail = n - len(rows) * stride
        if tail > 0:
            rows.append((float(vals[n - 1]), tail))
        return pd.DataFrame(
            {
                "key": str(key),
                "value": [r[0] for r in rows],
                "weight": [r[1] for r in rows],
                "err": stride - 1,
                "batch_id": 0,
            }
        )

    if key_col == value_col:
        raise ValueError("key_col and value_col must differ")
    return (
        df.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy(key_col)
        .applyInPandas(summarize, GROUPED_SUMMARY_SCHEMA)
    )


def merge_summaries(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge = UNION: valid immediately (bounds add via the err
    column), size grows additively. Run ``compress`` when the union
    outgrows its purpose.

    The two sides' batch ids are remapped into disjoint spaces
    (2i / 2i+1): independently built summaries reuse the same
    (partition, seq)-derived ids, and a collision would make
    ``rank_error_bound``'s distinct-batch sum UNDERCOUNT. Shallow
    merge trees stay well inside the long range."""
    return (
        a.withColumn("batch_id", F.col("batch_id") * 2)
        .unionByName(
            b.withColumn("batch_id", F.col("batch_id") * 2 + 1)
        )
    )


def rank_error_bound(summary: DataFrame) -> int:
    """Certified worst-case |estimated rank - true rank|: the sum of
    per-batch err contributions. One tiny distinct+aggregate."""
    row = (
        summary.select("batch_id", "err")
        .distinct()
        .agg(F.sum("err").alias("b"))
        .collect()[0]
    )
    return int(row.b or 0)


def _collect_summary(summary: DataFrame) -> list[tuple[float, int]]:
    rows = summary.select("value", "weight").collect()
    if len(rows) > _DRIVER_GUARD:
        raise ValueError(
            "summary too large for driver-side work -- compress() it, "
            "or this is not a summary"
        )
    return sorted((r.value, r.weight) for r in rows)


def compress(summary: DataFrame, k: int = 256) -> DataFrame:
    """Re-compress a (merged) summary to <= k weighted elements: sort
    by value, cut into blocks of ~equal WEIGHT, keep each block's max
    with the block's total weight. Only the straddling block can err,
    so the new batch's contribution is (max block weight - 1); the
    incoming summary's own certified error is folded in, keeping
    ``rank_error_bound`` exact bookkeeping across any merge/compress
    chain. Summary-sized work; returns a single-batch summary."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    spark = summary.sparkSession
    prior = rank_error_bound(summary)
    pairs = _collect_summary(summary)
    total = sum(w for _, w in pairs)
    target = -(-total // k)  # ceil: block weight target
    rows = []
    acc = 0
    block_max = 0
    cur_val = None
    for v, w in pairs:
        acc += w
        cur_val = v
        if acc >= target:
            rows.append((cur_val, acc))
            block_max = max(block_max, acc)
            acc = 0
    if acc > 0:
        rows.append((cur_val, acc))
        block_max = max(block_max, acc)
    err = prior + max(0, block_max - 1)
    out = [(float(v), int(w), int(err), 0) for v, w in rows]
    # values_frame: compressed summaries feed per-batch monitor WRITES;
    # a Python-backed local relation costs ~5 s per write (smallframe).
    return values_frame(spark, out, SUMMARY_SCHEMA)


def estimate_quantiles(
    summary: DataFrame, qs: Sequence[float]
) -> list[tuple[float, float]]:
    """[(q, value)]: sort the summary by value, walk cumulative
    weights, return the first value whose cumulative weight reaches
    q * N. Driver-side over the SUMMARY, never the data."""
    pairs = _collect_summary(summary)
    if not pairs:
        raise ValueError("empty summary")
    total = sum(w for _, w in pairs)
    out: list[tuple[float, float]] = []
    for q in qs:
        if not 0 <= q <= 1:
            raise ValueError(f"quantile out of range: {q}")
        target = q * total
        cum = 0
        val = pairs[-1][0]
        for v, w in pairs:
            cum += w
            if cum >= target:
                val = v
                break
        out.append((q, val))
    return out


def quantile_drift_report(
    old: DataFrame,
    new: DataFrame,
    qs: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> list[dict]:
    """Distribution drift between two corpus versions from their
    SUMMARIES alone (raw data untouched): per quantile, both values,
    the delta, and both certified rank bounds -- the audit line a
    data-drift monitor logs per ingest.

    The bounds make the report honest: a delta smaller than what the
    bounds can explain (rank uncertainty translated through the value
    scale) is flagged inconclusive rather than reported as drift.
    """
    old_est = dict(estimate_quantiles(old, qs))
    new_est = dict(estimate_quantiles(new, qs))
    b_old, b_new = rank_error_bound(old), rank_error_bound(new)
    n_old = old.agg(F.sum("weight")).collect()[0][0] or 0
    n_new = new.agg(F.sum("weight")).collect()[0][0] or 0
    out = []
    for q in qs:
        ov, nv = old_est[q], new_est[q]
        # rank uncertainty as a quantile-fraction: if the two rank
        # windows [q*n +- bound] overlap after mapping to fractions,
        # the summaries cannot certify a direction of drift
        eps = (b_old / n_old if n_old else 0.0) + (
            b_new / n_new if n_new else 0.0
        )
        out.append(
            {
                "q": q,
                "old_value": ov,
                "new_value": nv,
                "delta": nv - ov,
                "rank_eps": eps,
                "conclusive": abs(q_frac_shift(old, nv) - q) > eps
                if n_old
                else False,
            }
        )
    return out


def q_frac_shift(summary: DataFrame, value: float) -> float:
    """The quantile fraction a VALUE occupies in a summary: estimated
    rank(value) / N -- the inverse lookup drift conclusiveness uses."""
    pairs = _collect_summary(summary)
    total = sum(w for _, w in pairs)
    if total == 0:
        return 0.0
    cum = 0
    for v, w in pairs:
        if v <= value:
            cum += w
        else:
            break
    return cum / total


def categorical_drift_from_counts(
    old_counts: DataFrame,
    new_counts: DataFrame,
    top_k: int = 50,
) -> DataFrame:
    """The categorical-drift core over pre-aggregated counts
    [category, n] per side -- the form a streaming monitor feeds
    (per-batch counts persisted idempotently, summed at load). See
    ``categorical_drift`` for the raw-DataFrame wrapper."""
    from pyspark.sql.window import Window as W

    def with_tot(c, name):
        c = c.select(
            "category", F.col("n").cast("long").alias(f"n_{name}")
        )
        tot = c.agg(F.sum(f"n_{name}").cast("long").alias(f"tot_{name}"))
        return c.crossJoin(F.broadcast(tot))

    joined = (
        with_tot(old_counts, "old")
        .join(with_tot(new_counts, "new"), "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.first("tot_old", ignorenulls=True)
            .over(W.partitionBy())
            .alias("tot_old"),
            F.first("tot_new", ignorenulls=True)
            .over(W.partitionBy())
            .alias("tot_new"),
        )
    )
    share_old = F.col("n_old").cast("double") / F.col("tot_old")
    share_new = F.col("n_new").cast("double") / F.col("tot_new")
    staged = joined.select(
        "category",
        "n_old",
        "n_new",
        F.round(share_old, 6).alias("share_old"),
        F.round(share_new, 6).alias("share_new"),
        F.round(share_new - share_old, 6).alias("share_delta"),
        (share_new - share_old).alias("_raw_delta"),
    )
    w_all = W.partitionBy()
    w_rank = W.orderBy(
        F.desc(F.col("n_old") + F.col("n_new")), "category"
    )
    return (
        staged.withColumn(
            "tv_distance",
            F.round(F.sum(F.abs(F.col("_raw_delta"))).over(w_all) / 2, 6),
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= top_k)
        .drop("_raw_delta")
    )


def categorical_drift(
    old: DataFrame,
    new: DataFrame,
    cat_col: str,
    top_k: int = 50,
) -> DataFrame:
    """EXACT categorical drift between two corpus versions: per
    category the share in each version and the share delta, plus the
    total-variation distance replicated onto every row (half the sum
    of absolute share differences -- the standard distribution-shift
    scalar). Complements quantile_drift_report (numeric columns,
    summary-only) with the exact form for low-cardinality columns
    (source, lang, label).

    One groupBy per side, then the counts core. Deterministic: exact
    integer counts, 1e-6 rounding.
    """

    def counts(df):
        return df.groupBy(F.col(cat_col).alias("category")).agg(
            F.count(F.lit(1)).alias("n")
        )

    return categorical_drift_from_counts(
        counts(old), counts(new), top_k=top_k
    )


def grouped_winsorize_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    p_lo_num: int = 1,
    p_hi_num: int = 19,
    p_den: int = 20,
) -> DataFrame:
    """EXACT per-group winsorization summary: clip each group's values
    at its type-1 p_lo and p_hi quantiles (rank ceil(p*n), total order
    (value, id)) and report what clipping did -- the outlier-damping
    transform applied per stratum before aggregate statistics.

    This is the exact per-GROUP complement of the approximate global
    summaries (quantile_summary / grouped_quantile_summary): exact
    quantiles need a per-group sort, which is scale-correct HERE
    because the window partitions by the group key -- each stratum
    sorts independently, nothing global.

    Output per key: [key, n, lo, hi, n_clipped_lo, n_clipped_hi,
    winsorized_sum] with winsorized_sum exact (integer values in,
    integer sum out).
    """
    from pyspark.sql.window import Window as W

    w = W.partitionBy("key").orderBy("v", "_id")
    ranked = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(value_col).cast("long").alias("v"),
            F.col(id_col).alias("_id"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("key")))
        .localCheckpoint(eager=False)
    )  # one per-group sort feeds both the bound pick and the clip pass
    lo_rank = F.expr(f"(n * {p_lo_num} + {p_den} - 1) div {p_den}")
    hi_rank = F.expr(f"(n * {p_hi_num} + {p_den} - 1) div {p_den}")
    bounds = (
        ranked.filter(
            (F.col("rn") == F.greatest(lo_rank, F.lit(1)))
            | (F.col("rn") == F.greatest(hi_rank, F.lit(1)))
        )
        .groupBy("key")
        .agg(
            F.min(F.when(F.col("rn") == F.greatest(lo_rank, F.lit(1)), F.col("v"))).alias("lo"),
            F.max(F.when(F.col("rn") == F.greatest(hi_rank, F.lit(1)), F.col("v"))).alias("hi"),
        )
    )
    return (
        ranked.join(bounds, "key")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("lo").cast("long").alias("lo"),
            F.min("hi").cast("long").alias("hi"),
            F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_lo"),
            F.sum(F.when(F.col("v") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_hi"),
            F.sum(
                F.greatest(F.least(F.col("v"), F.col("hi")), F.col("lo"))
            )
            .cast("long")
            .alias("winsorized_sum"),
        )
    )


def grouped_mad_outlier_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k_mad: int = 3,
) -> DataFrame:
    """Robust per-group outlier census via Median Absolute Deviation:
    med = the group's type-1 median (rank ceil(n/2), total order
    (value, id)), mad = type-1 median of |v - med| (order (dev, id)),
    outlier test |v - med| > k_mad * mad. Entirely exact-integer for
    integer inputs; the two per-group sorts are scale-correct because
    each window partitions by the stratum (the winsorize argument).

    Output per key: [key, n, med, mad, n_outliers].
    """
    from pyspark.sql.window import Window as W

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("long").alias("v"),
        F.col(id_col).alias("_id"),
    )
    w1 = W.partitionBy("key").orderBy("v", "_id")
    ranked = base.withColumn("rn", F.row_number().over(w1)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("key"))
    )
    med = (
        ranked.filter(F.col("rn") == F.expr("greatest((n + 1) div 2, 1)"))
        .select("key", F.col("v").alias("med"))
    )
    devs = (
        base.join(med, "key")
        .withColumn("dev", F.abs(F.col("v") - F.col("med")))
        .localCheckpoint(eager=False)
    )  # one join feeds both the mad pick and the outlier count
    w2 = W.partitionBy("key").orderBy("dev", "_id")
    mad = (
        devs.withColumn("rn", F.row_number().over(w2))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("key")))
        .filter(F.col("rn") == F.expr("greatest((n + 1) div 2, 1)"))
        .select("key", F.col("dev").alias("mad"))
    )
    return (
        devs.join(mad, "key")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("med").cast("long").alias("med"),
            F.min("mad").cast("long").alias("mad"),
            F.sum(
                F.when(
                    F.col("dev") > F.lit(k_mad) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
