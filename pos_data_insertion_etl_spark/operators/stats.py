"""Exact distribution statistics: KS two-sample, Spearman rank
correlation, Gini concentration, grouped OLS, Pareto skyline, lagged
autocorrelation, CUSUM drift, grouped ECDF, categorical KL.

The monitoring/QA layer a 100 TB training-data pipeline runs NEXT TO
curation: "did this source's length distribution shift" (KS, ECDF),
"is quality correlated with length" (Spearman, OLS), "how concentrated
is the corpus on few domains" (Gini), "is ingest volume drifting"
(CUSUM, ACF), "which config is strictly better" (skyline).

Cross-engine contract (the registry convention): every aggregate is an
exact integer/decimal sum; ratios leave the engine either as 1e-6/1e-9
fixed point (integer div, truncating, identical both engines) or as ONE
closed-form double expression over those exact integer operands --
chained IEEE double ops on identical scalar inputs are bitwise
deterministic across engines; only reassociated SUMs of doubles are
not, and none of these operators sums doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D statistic between the
    ``value_col`` distributions of two groups.

    D = max_x |F_a(x) - F_b(x)| evaluated at every distinct pooled
    value -- exact, no binning: the integer numerator
    |cum_a(x) * n_b - cum_b(x) * n_a| over the common denominator
    n_a * n_b. Exact while n_a * n_b < 2^63 (~3e9 rows per side);
    beyond that pre-aggregate to value counts (this operator already
    does) or rescale to the 1e-9 fractional form.

    Scale: one groupBy(value) with map-side combine collapses the scan
    to DISTINCT VALUES (bounded by the value domain, not the corpus),
    then one single-partition window over that tiny table -- the same
    shape as certified quantile summaries. Output one row:
    [n_a, n_b, d_num, d_denom, d_fp, d] with d_fp = d_num * 1e6 div
    (n_a * n_b) and d the one-division double.
    """
    tagged = df.select(
        F.col(value_col).cast("long").alias("v"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("ia"),
        F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("ib"),
    ).filter((F.col("ia") == 1) | (F.col("ib") == 1))
    per_value = tagged.groupBy("v").agg(
        F.sum("ia").cast("long").alias("na_v"),
        F.sum("ib").cast("long").alias("nb_v"),
    )
    return ks_from_value_counts(per_value)


def ks_from_value_counts(per_value: DataFrame) -> DataFrame:
    """KS tail over an already-collapsed value-count table
    [v, na_v, nb_v] -- shared by ks_two_sample and the streamed KS
    monitor (per-value counts are mergeable and a pure function of the
    multiset, so a batch-keyed store replays exactly).
    """
    # Running AND total counts from the SAME single-partition window
    # pass over the distinct-value table (one sort, one scan, no
    # totals self-join/broadcast -- plan audit round 8): the full
    # frame gives n_a/n_b on every row.
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_full = W.orderBy("v").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = per_value.select(
        F.sum("na_v").over(w).alias("cum_a"),
        F.sum("nb_v").over(w).alias("cum_b"),
        F.sum("na_v").over(w_full).cast("long").alias("n_a"),
        F.sum("nb_v").over(w_full).cast("long").alias("n_b"),
    )
    return (
        cum.select(
            "n_a",
            "n_b",
            F.abs(
                F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
            ).alias("_diff"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("_diff").cast("long").alias("d_num"))
        .select(
            "n_a",
            "n_b",
            "d_num",
            (F.col("n_a") * F.col("n_b")).cast("long").alias("d_denom"),
            # Divide-first above 1e6: d_num * 1e6 would re-overflow at
            # ~3e6 rows per side, three decades under the n_a*n_b
            # bound the d_num form itself honors (q256/q225 pattern).
            # Precision caveat: the truncated denominator makes this
            # branch approximate just above the threshold -- relative
            # error up to 1e6/(n_a*n_b), i.e. ~2x at n_a*n_b ~ 2e6,
            # shrinking hyperbolically (0.1% by n_a*n_b = 1e9). It is
            # oracle-mirrored, so cross-engine exactness still holds;
            # the exact `d` double column is the precision reference.
            F.expr(
                "CASE WHEN n_a * n_b >= 1000000"
                " THEN d_num div ((n_a * n_b) div 1000000)"
                " ELSE (d_num * 1000000) div (n_a * n_b) END"
            )
            .cast("long")
            .alias("d_fp"),
            (
                F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("d"),
        )
    )


def _avg_rank2(value: Column, part: list[str]) -> Column:
    """Doubled average rank (exact integer): 2*RANK + ties - 1.

    Average ranks are half-integers; doubling keeps them in BIGINT and
    cancels in the Pearson ratio. RANK() needs no tiebreak -- equal
    values share a rank by definition, and the +ties-1 term makes the
    result order-independent.
    """
    w_rank = W.partitionBy(*part).orderBy(value)
    w_ties = W.partitionBy(*part, value)
    return (
        2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_ties) - 1
    ).cast("long")


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Exact Spearman rank correlation (tie-corrected): Pearson over
    AVERAGE ranks, computed on doubled ranks (2*rank + ties - 1, exact
    BIGINT -- the doubling cancels in the ratio).

    All five sums (n, Sx, Sy, Sxy, Sxx, Syy) are exact integers; rho is
    (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)) with every
    cross term computed CAST-THEN-MULTIPLY in double (the grouped_ols
    convention: n*Sxy in BIGINT would ANSI-overflow near ~39k rows per
    group, since doubled ranks <= 2n make Sxy <= 4n^3) -- identical
    IEEE steps both engines. The auxiliary `sxy_num` column stays an
    exact BIGINT and therefore carries the TIGHTER bound: it overflows
    past ~39k rows per group; it exists for sign-stable assertions on
    SERIES-level frames (daily aggregates, per-source profiles), which
    is this operator's domain -- aggregate corpora first.

    Scale: ranks are two windows per group; sums one groupBy. Output
    [group?, n, sxy_num, rho].
    """
    part = [group_col] if group_col else []
    ranked = df.select(
        *part,
        _avg_rank2(F.col(x_col), part).alias("rx"),
        _avg_rank2(F.col(y_col), part).alias("ry"),
    )
    agg = ranked.groupBy(*part).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
    )
    def d(c: str) -> Column:
        return F.col(c).cast("double")

    num_d = d("n") * d("sxy") - d("sx") * d("sy")
    dx_d = d("n") * d("sxx") - d("sx") * d("sx")
    dy_d = d("n") * d("syy") - d("sy") * d("sy")
    num_i = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return agg.select(
        *part,
        "n",
        num_i.cast("long").alias("sxy_num"),
        (num_d / F.sqrt(dx_d * dy_d)).alias("rho"),
    )


def gini_coefficient(df: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """Exact Gini concentration of an integer value column (cents,
    tokens, bytes): G = sum((2i - n - 1) * x_i) / (n * sum(x)) with
    x ascending, i the 1-based global rank. Tie-safe -- swapping equal
    values permutes coefficients over identical x, leaving the sum
    unchanged -- so any total order (value, id) works.

    Scale: the global rank is the two-phase range-partition sequence
    (operators/combine.with_global_sequence), never a single-partition
    sort; the weighted sum is one agg. Exactness bound: |gini_num| <=
    n * total, so the integer sum holds while n * total < 2^63
    (~1e7 holders of ~1e5-cent averages; quantize to coarser units
    beyond -- the same discipline as grouped_ols). The `gini` double
    divides cast-then-multiplied operands, so it never overflows.
    Output [n, total, gini_num, gini].
    """
    from .combine import with_global_sequence

    seq = with_global_sequence(
        df.select(F.col(value_col).cast("long").alias("x"), F.col(id_col)),
        [F.col("x"), F.col(id_col)],
        seq_col="_seq",
    )
    n = seq.agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = (
        seq.crossJoin(F.broadcast(n))
        .select(
            "n",
            F.col("x"),
            ((2 * (F.col("_seq") + 1) - F.col("n") - 1) * F.col("x")).alias(
                "_w"
            ),
        )
        .groupBy("n")
        .agg(
            F.sum("x").cast("long").alias("total"),
            F.sum("_w").cast("long").alias("gini_num"),
        )
    )
    return agg.select(
        "n",
        "total",
        "gini_num",
        # cast-then-multiply: n * total in BIGINT ANSI-overflows at
        # ~1e7 customers of ~1e5-cent averages, far inside real scale
        (
            F.col("gini_num").cast("double")
            / (F.col("n").cast("double") * F.col("total").cast("double"))
        ).alias("gini"),
    )


def grouped_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group simple OLS y = a + b*x over INTEGER columns (quantize
    upstream: quantities, cents, token counts): slope, intercept, R^2
    as closed-form double expressions over the six exact integer sums
    -- the regression-as-aggregation form that needs one shuffle and no
    iteration at any scale.

    Exactness bound: the SUMS must stay in int64 -- sum(y^2) < 2^63,
    so quantize y to the coarsest unit the analysis tolerates (floor
    dollars, not cents, for 1e9-row price regressions). The DERIVED
    stats (slope/intercept/r2) are computed in double -- their cross
    terms (n*Syy, Sy^2) overflow int64 long before the sums do, and
    double products of exact integer operands are deterministic IEEE
    on both engines (the oracle mirrors the same cast-then-multiply
    order). Output [grp, n, sx, sy, sxy, sxx, syy, slope, intercept,
    r2] (sums exact integers; doubles NULL when degenerate: vertical
    line or zero variance).
    """
    agg = df.select(
        F.col(group_col).alias("grp"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    def d(c: str) -> Column:
        return F.col(c).cast("double")

    num = d("n") * d("sxy") - d("sx") * d("sy")
    dx = d("n") * d("sxx") - d("sx") * d("sx")
    dy = d("n") * d("syy") - d("sy") * d("sy")
    slope = num / F.nullif(dx, F.lit(0.0))
    return agg.select(
        "grp",
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept"),
        (num * num / F.nullif(dx * dy, F.lit(0.0))).alias("r2"),
    )


def pareto_frontier(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
    id_col: str,
) -> DataFrame:
    """Strict-dominance 2D skyline: keep rows where NO other row has
    strictly lower cost AND strictly higher gain.

    O(n log n), join-free: sort by cost, running max of gain over the
    RANGE frame of strictly-cheaper rows (RANGE, not ROWS -- cost ties
    must not dominate each other); a row survives iff that max is NULL
    or <= its own gain. Both engines share exact RANGE semantics over
    integer costs. Output: the surviving rows
    [id, cost, gain, best_cheaper_gain].
    """
    w = W.orderBy(F.col("c")).rangeBetween(W.unboundedPreceding, -1)
    return (
        df.select(
            F.col(id_col),
            F.col(cost_col).cast("long").alias("c"),
            F.col(gain_col).cast("long").alias("g"),
        )
        .withColumn("best_cheaper_gain", F.max("g").over(w))
        .filter(
            F.col("best_cheaper_gain").isNull()
            | (F.col("best_cheaper_gain") <= F.col("g"))
        )
        .select(
            id_col,
            F.col("c").alias("cost"),
            F.col("g").alias("gain"),
            "best_cheaper_gain",
        )
    )


def acf_pearson(
    daily: DataFrame,
    day_col: str,
    n_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Lagged autocorrelation of a daily integer series: for each lag
    1..max_lag, the exact Pearson correlation between (x_t, x_{t+lag})
    pairs joined on the CALENDAR offset (gap-aware: a missing day
    contributes no pair, it does not shift the series).

    One explode(1..max_lag) + one equi-join on (day + lag) -- the
    series is a daily aggregate (tiny at any corpus size), so this is
    a broadcast-scale op certified by the same closed-form-double
    contract as spearman_corr. Output [lag, n_pairs, sxy_num, r].
    """
    base = daily.select(
        F.col(day_col).alias("day"), F.col(n_col).cast("long").alias("x")
    )
    lags = base.select(
        "day",
        F.col("x").alias("x0"),
        F.explode(
            F.array(*[F.lit(i) for i in range(1, max_lag + 1)])
        ).alias("lag"),
    ).withColumn("day2", F.date_add(F.col("day"), F.col("lag")))
    paired = lags.join(
        base.select(F.col("day").alias("day2"), F.col("x").alias("x1")),
        "day2",
    )
    agg = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x0").cast("long").alias("sx"),
        F.sum("x1").cast("long").alias("sy"),
        F.sum(F.col("x0") * F.col("x1")).cast("long").alias("sxy"),
        F.sum(F.col("x0") * F.col("x0")).cast("long").alias("sxx"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("syy"),
    )

    # Cross terms cast-then-multiply in double (the grouped_ols
    # convention): n_pairs * Sxy in BIGINT would ANSI-overflow long
    # before the sums do. sxy_num stays exact BIGINT with the tighter
    # documented bound (series-level frames).
    def d(c: str) -> Column:
        return F.col(c).cast("double")

    num_d = d("n_pairs") * d("sxy") - d("sx") * d("sy")
    dx_d = d("n_pairs") * d("sxx") - d("sx") * d("sx")
    dy_d = d("n_pairs") * d("syy") - d("sy") * d("sy")
    num_i = (
        F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    )
    return agg.select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        num_i.cast("long").alias("sxy_num"),
        (num_d / F.sqrt(dx_d * dy_d)).alias("r"),
    )


def cusum_scores(
    daily: DataFrame,
    day_col: str,
    n_col: str,
    slack_milli: int = 0,
) -> DataFrame:
    """Two-sided CUSUM drift scores over a daily count series, window-
    expressible through the prefix-min identity: the recursive
    s+_t = max(0, s+_{t-1} + dev_t) equals P_t - min(0, min_{j<=t} P_j)
    with P the running sum of deviations -- so the whole chart is two
    running aggregates, no recursion, no collect.

    Deviations are exact milli fixed point against the global integer
    mean (total*1000 div n_days) with +-slack_milli allowance per side.
    Output [day, n, dev_milli, cusum_pos_milli, cusum_neg_milli].
    """
    base = daily.select(
        F.col(day_col).alias("day"), F.col(n_col).cast("long").alias("n")
    )
    tot = base.agg(
        F.sum("n").cast("long").alias("_tot"),
        F.count(F.lit(1)).cast("long").alias("_days"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    scored = (
        base.crossJoin(F.broadcast(tot))
        .withColumn("_mean_milli", F.expr("_tot * 1000 div _days"))
        .withColumn(
            "dev_milli", F.col("n") * 1000 - F.col("_mean_milli")
        )
        .withColumn(
            "_pp", F.sum(F.col("dev_milli") - slack_milli).over(w)
        )
        .withColumn(
            "_pn", F.sum(F.col("dev_milli") + slack_milli).over(w)
        )
        .withColumn("_pp_min", F.min("_pp").over(w))
        .withColumn("_pn_max", F.max("_pn").over(w))
    )
    return scored.select(
        "day",
        "n",
        "dev_milli",
        (F.col("_pp") - F.least(F.lit(0).cast("long"), F.col("_pp_min")))
        .cast("long")
        .alias("cusum_pos_milli"),
        (
            F.greatest(F.lit(0).cast("long"), F.col("_pn_max"))
            - F.col("_pn")
        )
        .cast("long")
        .alias("cusum_neg_milli"),
    )


def ecdf_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group exact ECDF transform: each row's value mapped to
    count(v <= x)/n_group in 1e-6 fixed point -- the quantile
    normalization that makes length/quality scores comparable ACROSS
    sources before mixing (a raw n_chars=2000 is long for src A,
    median for src B).

    One RANGE-frame window per group (count over value <= current --
    ties all receive the full tied mass, the right ECDF semantics) and
    one partition count. Output [id, group, value, n_le, n_group,
    ecdf_fp].
    """
    w_le = (
        W.partitionBy(group_col)
        .orderBy(F.col(value_col).cast("long"))
        .rangeBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy(group_col)
    return df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col).cast("long").alias("value"),
        F.count(F.lit(1)).over(w_le).cast("long").alias("n_le"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_group"),
    ).withColumn(
        "ecdf_fp", F.expr("n_le * 1000000 div n_group").cast("long")
    )


def rfm_segments(
    orders: DataFrame,
    anchor_date: str,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
    k: int = 5,
) -> DataFrame:
    """RFM customer segmentation: recency (days from last order to the
    pinned ``anchor_date`` -- parameterized, never wall-clock, the q145
    clock convention), frequency (order count), monetary (exact cent
    sum via DECIMAL), each quantile-binned 1..k with exact NTILE
    semantics, segment code = r*100 + f*10 + m.

    Bins come from operators/mixture.ntile_bins -- the two-phase
    range-partition global sequence, NEVER a single-partition NTILE
    window -- run on the CUSTOMER-level aggregate (corpus-scale input
    collapses in the first groupBy). Order is total (metric, custkey),
    so bins are engine-reproducible. Bins ascend with the metric:
    r_bin 1 = most recent, f_bin/m_bin k = most active/valuable.

    Output [custkey, recency_days, frequency, monetary_cents, r_bin,
    f_bin, m_bin, segment].
    """
    from .mixture import ntile_bins

    per_cust = orders.groupBy(F.col(cust_col).alias("custkey")).agg(
        F.datediff(
            F.lit(anchor_date).cast("date"),
            F.max(F.col(date_col).cast("date")),
        )
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col(price_col).cast("decimal(18,2)"))
        .cast("decimal(20,2)")
        .alias("_rev"),
    ).withColumn(
        "monetary_cents",
        (F.col("_rev") * 100).cast("long"),
    ).drop("_rev")
    binned = per_cust
    for metric, bin_col in (
        ("recency_days", "r_bin"),
        ("frequency", "f_bin"),
        ("monetary_cents", "m_bin"),
    ):
        binned = ntile_bins(
            binned, [F.col(metric), F.col("custkey")], k, bin_col=bin_col
        )
    return binned.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_bin",
        "f_bin",
        "m_bin",
        (
            F.col("r_bin") * 100 + F.col("f_bin") * 10 + F.col("m_bin")
        ).cast("long").alias("segment"),
    )


def categorical_kl(
    df: DataFrame,
    group_col: str,
    cat_col: str,
) -> DataFrame:
    """Per-group KL divergence of its categorical distribution from the
    corpus-wide distribution -- "how unusual is this source's language
    mix": KL(g || all) = sum_c (c_gc/n_g) * ln((c_gc * N)/(n_g * C_c)).

    Exact-integer contract: each log-ratio is nano fixed point
    (round(ln * 1e9) -- the q129 LM convention; ln takes ONE double
    quotient of exact integer products, identical both engines), the
    weighted sum runs in integers (sum of c_gc * lnr_nano, exact), and
    the division by n_g is one truncating div. Categories present in
    the group are present in the corpus by construction, so no
    smoothing term is needed.

    Scale: two groupBys over (group, cat) -- output is category-table
    sized. Output [group, n_rows, n_cats, kl_nano].
    """
    gc = df.groupBy(
        F.col(group_col).alias("grp"), F.col(cat_col).alias("cat")
    ).agg(F.count(F.lit(1)).cast("long").alias("c_gc"))
    g = gc.groupBy("grp").agg(F.sum("c_gc").cast("long").alias("n_g"))
    c = gc.groupBy("cat").agg(F.sum("c_gc").cast("long").alias("c_all"))
    n = gc.agg(F.sum("c_gc").cast("long").alias("n_all"))
    lnr = F.round(
        F.log(
            (F.col("c_gc") * F.col("n_all")).cast("double")
            / (F.col("n_g") * F.col("c_all")).cast("double")
        )
        * 1_000_000_000
    ).cast("long")
    return (
        gc.join(g, "grp")
        .join(c, "cat")
        .crossJoin(F.broadcast(n))
        .select("grp", "n_g", (F.col("c_gc") * lnr).alias("_term"))
        .groupBy("grp", "n_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cats"),
            F.sum("_term").cast("long").alias("_num"),
        )
        .select(
            "grp",
            F.col("n_g").alias("n_rows"),
            "n_cats",
            F.expr("_num div n_g").cast("long").alias("kl_nano"),
        )
    )


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str,
) -> DataFrame:
    """Exact per-group LOWER weighted median of an integer value
    column: the smallest value v whose cumulative weight reaches half
    the group total (2 * cum >= total in integers -- no floating
    halves). The robust center for weighted corpora ("median document
    length weighted by token count").

    Scale: groupBy (group, value) collapses to the value domain with
    map-side combine; one keyed window over that collapsed table emits
    running AND total weight in a single pass (the q232 full-frame
    idiom); the median is a one-row-per-group min. Output [group,
    total_weight, median_value].
    """
    pv = df.groupBy(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
    ).agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
    w_run = (
        W.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_full = (
        W.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        pv.select(
            "grp",
            "v",
            F.sum("w").over(w_run).cast("long").alias("cum"),
            F.sum("w").over(w_full).cast("long").alias("total_weight"),
        )
        .filter(2 * F.col("cum") >= F.col("total_weight"))
        .groupBy("grp", "total_weight")
        .agg(F.min("v").cast("long").alias("median_value"))
    )


def iqr_outlier_fences(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k_milli: int = 1500,
) -> DataFrame:
    """Per-group Tukey fences over exact interpolated quartiles: lo =
    Q1 - k*(Q3-Q1), hi = Q3 + k*(Q3-Q1) with k in milli units (1500 =
    the classic 1.5), plus how many rows fall outside each fence --
    the boxplot outlier report, grouped.

    Quartiles are Spark `percentile` <-> DuckDB `quantile_cont` (the
    q45-proven exact pair); fence arithmetic is a fixed-order double
    expression over them. One aggregation pass computes quartiles and
    counts together via conditional re-aggregation? No -- fences
    depend on the quartiles, so the op is two passes: one tiny
    quartile aggregate broadcast back, one counting pass. Output
    [group, n, q1, q3, lo, hi, n_low, n_high].
    """
    v = F.col(value_col).cast("double")
    quarts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"percentile({value_col}, 0.25)").alias("q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("q3"),
    )
    k = F.lit(k_milli).cast("double") / F.lit(1000.0)
    fenced = quarts.select(
        "grp",
        "n",
        "q1",
        "q3",
        (F.col("q1") - k * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + k * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        df.select(F.col(group_col).alias("grp"), v.alias("_v"))
        .join(F.broadcast(fenced), "grp")
        .groupBy("grp", "n", "q1", "q3", "lo", "hi")
        .agg(
            F.sum(F.when(F.col("_v") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("_v") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
    )


def theil_index(df: DataFrame, value_col: str) -> DataFrame:
    """Theil T inequality index of a positive integer value column:
    T = sum_i (x_i / X) * ln(x_i * n / X) -- the entropy-based
    complement to gini_coefficient (decomposable across subgroups,
    which Gini is not).

    Exact contract (the q241/q249 ln convention): each log-ratio
    round(ln(x_i * n / X) * 1e9) is one double op on exact integer
    products; the weighted sum runs in integers; one truncating div by
    X ends it. Bound: x_i * n < 2^63 (shard or rescale units beyond).
    Zero-value rows are excluded (their Theil contribution is 0 by the
    x ln x -> 0 limit).

    Scale: one total aggregate broadcast back over one scan. Output
    one row [n, total, theil_nano].
    """
    vals = df.select(F.col(value_col).cast("long").alias("x")).filter(
        F.col("x") > 0
    )
    tot = vals.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
    )
    lnr = F.round(
        F.log(
            (F.col("x") * F.col("n")).cast("double")
            / F.col("total").cast("double")
        )
        * 1_000_000_000
    ).cast("long")
    return (
        vals.crossJoin(F.broadcast(tot))
        .select("n", "total", (F.col("x") * lnr).alias("_t"))
        .groupBy("n", "total")
        .agg(F.sum("_t").cast("long").alias("_num"))
        .select(
            "n",
            "total",
            F.expr("_num div total").cast("long").alias("theil_nano"),
        )
    )


def herfindahl_index(df: DataFrame, value_col: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of a positive integer value
    column: HHI = sum_i (x_i / X)^2 -- the antitrust-style "how close
    to a monopoly is this distribution" index (1/n for uniform, 1.0
    for a single holder); in corpus terms, domain concentration.

    sum(x^2) and X are exact BIGINTs (quantize to the coarsest unit
    that keeps sum(x^2) < 2^63 -- floor dollars, not cents, for price
    data); hhi is ONE fixed-order double expression over them,
    mirrored in the oracle; the 1e-6 fixed-point form divides FIRST
    (((sum_sq div X) * 1e6) div X -- sum_sq div X <= max(x), so
    nothing squares X, which overflows BIGINT already at ~3e9 units).
    Output one row [n, total, sum_sq, hhi_ppm, hhi].
    """
    agg = (
        df.select(F.col(value_col).cast("long").alias("x"))
        .filter(F.col("x") > 0)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("total"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_sq"),
        )
    )
    return agg.select(
        "n",
        "total",
        "sum_sq",
        # Divide-first form: total^2 overflows BIGINT already at ~3e9
        # total units (measured at sf0.01 dollars), so the fixed point
        # is ((sum_sq div total) * 1e6) div total -- sum_sq div total
        # <= max(x), so the 1e6 product stays small; truncating but
        # deterministic, mirrored in the oracle.
        F.expr("((sum_sq div nullif(total, 0)) * 1000000) div nullif(total, 0)")
        .cast("long")
        .alias("hhi_ppm"),
        (
            F.col("sum_sq").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double"))
        ).alias("hhi"),
    )


def topk_share(
    df: DataFrame,
    value_col: str,
    id_col: str,
    ks: tuple[int, ...] = (10, 100),
) -> DataFrame:
    """Concentration-curve points: what share of the total do the
    top-k holders own, for each requested k -- "the top 100 domains
    are 40% of the corpus" in one table.

    Rank is a total order (value desc, id); running and full totals
    come from ONE window pass (the q232 idiom); the requested ks
    filter the curve. share_ppm = topk_value * 1e6 div total -- exact
    while total < 9.2e12 in the chosen unit; quantize coarser beyond.
    Single-partition window over the HOLDER aggregate (callers
    pre-aggregate corpus rows to holders first). Output [k,
    topk_value, total, share_ppm].
    """
    w_rank = W.orderBy(F.desc(value_col), F.col(id_col))
    w_run = w_rank.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_full = w_rank.rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ranked = df.select(
        F.row_number().over(w_rank).cast("long").alias("k"),
        F.sum(F.col(value_col).cast("long")).over(w_run)
        .cast("long")
        .alias("topk_value"),
        F.sum(F.col(value_col).cast("long")).over(w_full)
        .cast("long")
        .alias("total"),
    )
    return ranked.filter(
        F.col("k").isin([int(k) for k in ks])
    ).withColumn(
        "share_ppm",
        F.expr("topk_value * 1000000 div total").cast("long"),
    )


def share_entropy(df: DataFrame, group_col: str) -> DataFrame:
    """Shannon diversity of group shares (nats, nano fixed point):
    H = -sum_g (c_g/N) ln(c_g/N) -- ln(n_groups) for a uniform mix,
    0 for a single group; the "how diverse is this corpus across
    sources" dial next to herfindahl_index's concentration dial.

    Same exact contract as categorical_kl/image_value_entropy: integer
    counts, one double ln per group rounded to 1e-9, integer weighted
    sum, one truncating div. Output one row [n_groups, n_rows,
    entropy_nano].
    """
    counts = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("c").cast("long").alias("n_rows"),
    )
    lnr = F.round(
        F.log(F.col("c").cast("double") / F.col("n_rows").cast("double"))
        * 1_000_000_000
    ).cast("long")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select("n_groups", "n_rows", (F.col("c") * lnr).alias("_t"))
        .groupBy("n_groups", "n_rows")
        .agg(F.sum("_t").cast("long").alias("_num"))
        .select(
            "n_groups",
            "n_rows",
            F.expr("-(_num div n_rows)").cast("long").alias("entropy_nano"),
        )
    )


def page_hinkley(
    daily: DataFrame,
    day_col: str,
    n_col: str,
    delta_milli: int = 0,
) -> DataFrame:
    """Page-Hinkley upward-drift score over a daily count series --
    CUSUM's sequential sibling that tests against the RUNNING mean
    (no global-mean pre-pass, so it works online): with
    mean_t = P_t*1000 div t, M_t = sum_{i<=t}(x_i*1000 - mean_i -
    delta_milli), PH_t = M_t - min_{j<=t} M_j.

    Window-only via the same prefix-min identity as cusum_scores; the
    running mean is a truncating milli fixed point, deterministic both
    engines. Output [day, n, mean_milli, ph_milli].
    """
    base = daily.select(
        F.col(day_col).alias("day"), F.col(n_col).cast("long").alias("n")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    staged = (
        base.withColumn("_t", F.row_number().over(W.orderBy("day")))
        .withColumn("_p", F.sum("n").over(w))
        .withColumn("mean_milli", F.expr("_p * 1000 div _t").cast("long"))
        .withColumn(
            "_term",
            F.col("n") * 1000 - F.col("mean_milli") - delta_milli,
        )
        .withColumn("_m", F.sum("_term").over(w))
        .withColumn("_m_min", F.min("_m").over(w))
    )
    return staged.select(
        "day",
        "n",
        "mean_milli",
        (F.col("_m") - F.col("_m_min")).cast("long").alias("ph_milli"),
    )


def mann_kendall(daily: DataFrame, day_col: str, n_col: str) -> DataFrame:
    """Mann-Kendall monotone-trend statistic over a daily series:
    S = sum_{i<j} sign(x_j - x_i) -- the nonparametric "is this series
    trending" test (S near +max for monotone growth, 0 for no trend),
    tie-aware by construction.

    Exact integers end to end. The pair source is a theta self-join
    over the DAILY table -- bounded by days^2 (a decade of days is
    ~13M pairs), never corpus-sized; callers aggregate to the series
    first. Output one row [n_days, n_pos, n_neg, n_tie, s].
    """
    base = daily.select(
        F.col(day_col).alias("d"), F.col(n_col).cast("long").alias("x")
    )
    a = base.select(F.col("d").alias("di"), F.col("x").alias("xi"))
    b = base.select(F.col("d").alias("dj"), F.col("x").alias("xj"))
    pairs = a.join(b, F.col("di") < F.col("dj"))
    agg = pairs.agg(
        F.coalesce(
            F.sum(F.when(F.col("xj") > F.col("xi"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_pos"),
        F.coalesce(
            F.sum(F.when(F.col("xj") < F.col("xi"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_neg"),
        F.coalesce(
            F.sum(F.when(F.col("xj") == F.col("xi"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_tie"),
    )
    # n_days from a direct count of the series -- the pair-count
    # quadratic inversion cannot distinguish 0 days from 1 (both give
    # 0 pairs) and reported a phantom n_days=1 on an empty input.
    counts = base.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return agg.crossJoin(F.broadcast(counts)).select(
        "n_days",
        "n_pos",
        "n_neg",
        "n_tie",
        (F.col("n_pos") - F.col("n_neg")).cast("long").alias("s"),
    )


def cramers_v(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cramer's V association strength between two categorical
    columns: V = sqrt(chi^2 / (N * min(r-1, c-1))) -- the effect-size
    companion to q214's chi-square screen and q248's kappa ("are
    source and language associated, and how strongly").

    Exact contract: each chi-square term is computed from exact
    integers (o*N - ra*cb fits BIGINT while N < ~3e9), squared and
    divided in ONE fixed double sequence, rounded to micro units --
    the sum is then integer-exact (never a float sum). V is one
    closed-form double over the integer total. Output one row
    [n, r, c, chi2_micro, v].
    """
    cells = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    ra = cells.groupBy("a").agg(F.sum("o").cast("long").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("o").cast("long").alias("cb"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("r"),
        F.countDistinct("b").cast("long").alias("c"),
    )
    # The FULL r x c category cross: absent cells contribute
    # (0 - e)^2 / e = e to chi-square and must not be dropped (the
    # observed-cells-only form understates perfect association by
    # exactly the missing expected mass -- caught by the unit test).
    full = ra.crossJoin(cb).join(cells, ["a", "b"], "left").select(
        "a", "b", "ra", "cb", F.coalesce("o", F.lit(0)).alias("o")
    )
    term = F.round(
        (
            (F.col("o") * F.col("n") - F.col("ra") * F.col("cb"))
            .cast("double")
            * (F.col("o") * F.col("n") - F.col("ra") * F.col("cb"))
            .cast("double")
            / (F.col("ra") * F.col("cb")).cast("double")
            / F.col("n").cast("double")
        )
        * 1_000_000
    ).cast("long")
    return (
        full.crossJoin(F.broadcast(tot))
        .select("n", "r", "c", term.alias("_t"))
        .groupBy("n", "r", "c")
        .agg(F.sum("_t").cast("long").alias("chi2_micro"))
        .select(
            "n",
            "r",
            "c",
            "chi2_micro",
            F.sqrt(
                F.col("chi2_micro").cast("double")
                / F.lit(1_000_000.0)
                / (
                    F.col("n")
                    * F.least(F.col("r") - 1, F.col("c") - 1)
                ).cast("double")
            ).alias("v"),
        )
    )


def two_proportion_ztest(
    trials: DataFrame,
    variant_col: str,
    success_col: str,
) -> DataFrame:
    """Pooled two-proportion z-test between variant 0 and variant 1 --
    the A/B readout every event pipeline ends in ("did arm B convert
    better, and is the gap larger than chance?"). Reported as z^2 (one
    degree chi-square) so no sqrt sign convention leaks into the hash.

    Input: one row per trial with an integer variant (0/1) and an
    integer success flag (0/1). Output, one row:

        n_a, x_a, n_b, x_b   exact trial/success counts per arm
        z2_micro = round((pa-pb)^2 / (p*(1-p)*(1/na+1/nb)) * 1e6)
        significant_95       z2_micro > 3_841_459  (chi2_1 at 0.95)

    Determinism: counts are exact integers; pa/pb/p and the z^2 chain
    are IEEE ops on identical operands in one fixed order (divisions
    first, no reassociated sums), rounded once to micro units; the
    significance boolean derives from the already-rounded integer, so
    both engines agree by construction. Degenerate pools (p = 0 or 1)
    yield NULL z2 via a nullif guard.

    Scale: one conditional aggregation over the trial stream -- a
    map-side-combined global agg, no window, no join; the result is a
    single row. The cheapest possible shape at any corpus size.
    """
    agg = trials.agg(
        F.sum(
            F.when(F.col(variant_col) == 0, 1).otherwise(0)
        ).cast("long").alias("n_a"),
        F.sum(
            F.when(F.col(variant_col) == 0, F.col(success_col)).otherwise(0)
        ).cast("long").alias("x_a"),
        F.sum(
            F.when(F.col(variant_col) == 1, 1).otherwise(0)
        ).cast("long").alias("n_b"),
        F.sum(
            F.when(F.col(variant_col) == 1, F.col(success_col)).otherwise(0)
        ).cast("long").alias("x_b"),
    )
    pa = F.col("n_a").cast("double")
    pb = F.col("n_b").cast("double")
    scored = agg.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        (F.col("x_a").cast("double") / pa).alias("_pa"),
        (F.col("x_b").cast("double") / pb).alias("_pb"),
        (
            (F.col("x_a") + F.col("x_b")).cast("double")
            / (F.col("n_a") + F.col("n_b")).cast("double")
        ).alias("_p"),
    ).select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(
            (F.col("_pa") - F.col("_pb"))
            * (F.col("_pa") - F.col("_pb"))
            / F.nullif(
                F.col("_p")
                * (F.lit(1.0) - F.col("_p"))
                * (
                    F.lit(1.0) / F.col("n_a").cast("double")
                    + F.lit(1.0) / F.col("n_b").cast("double")
                ),
                F.lit(0.0),
            )
            * F.lit(1000000.0)
        ).cast("long").alias("z2_micro"),
    )
    return scored.select(
        "*",
        (F.col("z2_micro") > F.lit(3_841_459)).alias("significant_95"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One-way ANOVA F-statistic across groups -- "does mean document
    length differ by source beyond chance?" -- the k-group extension
    of q265's two-arm test, decomposing total variance into
    between-group (SSB) and within-group (SSW) parts.

    Engine-portable decomposition: per group, the correction term
    S_g^2 / n_g is computed as a cast-then-multiply DOUBLE chain over
    the exact integer sums and rounded to milli units (the q235
    convention: derived stats may overflow int64 even when each SUM
    fits; chained IEEE on identical integer operands is
    bit-deterministic). The rounded milli integers then SUM exactly:

        cg_milli  = round(dbl(S_g) * dbl(S_g) / dbl(n_g) * 1000)
        ssb_milli = sum(cg_milli) - round(dbl(S)*dbl(S)/dbl(N)*1000)
        ssw_milli = Q * 1000 - sum(cg_milli)
        f_micro   = round(dbl(ssb_milli)/(k-1) / (dbl(ssw_milli)/(N-k))
                          * 1e6)

    Only integer totals cross the final assembly; no reassociated
    float sum exists anywhere. Overflow contract: the binding term is
    `Q * 1000` (ssw_milli), so Q = sum(x^2) must stay under
    2^63 / 1000 ~= 9.2e15 -- with values ~1e4 each (x^2 ~ 1e8) that
    is ~9.2e7 rows, and at x ~ 1e7 only ~92 rows; past it,
    pre-scale the value column down or upgrade Q to DECIMAL.

    Scale: one map-side-combined groupBy(group) + a k-row rollup.
    Output is a single row [k, n_total, ssb_milli, ssw_milli,
    f_micro].
    """
    per = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.col(value_col).cast("long")).cast("long").alias("_s"),
        F.sum(
            F.col(value_col).cast("long") * F.col(value_col).cast("long")
        ).cast("long").alias("_q"),
    )
    cg = F.round(
        F.col("_s").cast("double")
        * F.col("_s").cast("double")
        / F.col("_n").cast("double")
        * F.lit(1000.0)
    ).cast("long")
    tot = per.select("_n", "_s", "_q", cg.alias("_cg")).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("_n").cast("long").alias("n_total"),
        F.sum("_s").cast("long").alias("_ss"),
        F.sum("_q").cast("long").alias("_qq"),
        F.sum("_cg").cast("long").alias("_cb"),
    )
    grand = F.round(
        F.col("_ss").cast("double")
        * F.col("_ss").cast("double")
        / F.col("n_total").cast("double")
        * F.lit(1000.0)
    ).cast("long")
    parts = tot.select(
        "k",
        "n_total",
        (F.col("_cb") - grand).cast("long").alias("ssb_milli"),
        (F.col("_qq") * F.lit(1000) - F.col("_cb"))
        .cast("long")
        .alias("ssw_milli"),
    )
    return parts.select(
        "k",
        "n_total",
        "ssb_milli",
        "ssw_milli",
        F.round(
            F.col("ssb_milli").cast("double")
            / F.nullif((F.col("k") - F.lit(1)).cast("double"), F.lit(0.0))
            / F.nullif(
                F.col("ssw_milli").cast("double")
                / (F.col("n_total") - F.col("k")).cast("double"),
                F.lit(0.0),
            )
            * F.lit(1000000.0)
        ).cast("long").alias("f_micro"),
    )


def wilson_intervals(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z_micro: int = 1_959_964,
) -> DataFrame:
    """Per-group Wilson score 95% confidence interval for a binomial
    proportion -- the interval that behaves at extreme rates and small
    groups where the naive Wald interval collapses ("is src7's English
    share really different, or is the group just small?").

    With p = x/n and z the normal quantile (default micro literal
    1.959964):

        center = (p + z^2/2n) / (1 + z^2/n)
        half   = z * sqrt(p*(1-p)/n + z^2/(4n^2)) / (1 + z^2/n)

    lo/hi are reported in rounded micro units. Determinism: x and n
    are exact integers; each bound is ONE fixed-order IEEE chain per
    row (divisions on identical operands, one sqrt, one round) -- no
    sums of floats anywhere, so both engines replay bit-for-bit.

    Scale: one map-side-combined groupBy; output is group-domain-sized.
    """
    z = F.lit(z_micro).cast("double") / F.lit(1000000.0)
    per = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(success_col).cast("long")).cast("long").alias("x"),
    )
    nd = F.col("n").cast("double")
    p = F.col("x").cast("double") / nd
    denom = F.lit(1.0) + z * z / nd
    center = (p + z * z / (F.lit(2.0) * nd)) / denom
    half = (
        z
        * F.sqrt(
            p * (F.lit(1.0) - p) / nd
            + z * z / (F.lit(4.0) * nd * nd)
        )
        / denom
    )
    return per.select(
        group_col,
        "n",
        "x",
        F.round((center - half) * F.lit(1000000.0))
        .cast("long")
        .alias("lo_micro"),
        F.round((center + half) * F.lit(1000000.0))
        .cast("long")
        .alias("hi_micro"),
    ).orderBy(group_col)


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int = 10_000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation -- "given a budget
    of `budget` rows, how many should come from each stratum to
    minimize the variance of the estimated mean?" The design answer is
    allocation proportional to N_h * sigma_h (big AND noisy strata get
    more), the missing design-side companion to the executed samplers
    (q131/q132/q151).

    Per stratum, from exact integer sums (n, S = sum x, Q = sum x^2):

        w_milli = round(sqrt(dbl(n)*dbl(Q) - dbl(S)*dbl(S)) * 1000)

    (that sqrt is n_h * sigma_h * sqrt(n_h) ... deliberately NOT: it
    is sqrt(n^2 * var) = n * sigma exactly, since
    var = (nQ - S^2)/n^2.) The rounded milli weights then SUM exactly,
    and every allocation is the overflow-safe exact floor share

        alloc = (budget * w_milli) div sum(w_milli)

    -- integer end to end after one IEEE sqrt chain per stratum on
    identical operands (the q235 cast-then-multiply convention), so no
    reassociated float ever crosses engines. Floor shares can leave up
    to k-1 budget rows unassigned; the remainder is reported per row
    (`left_over`) rather than silently redistributed, keeping the
    output pure per-stratum arithmetic. Overflow contract:
    budget * sum(w_milli) < 2^63, i.e. sum over strata of n_h*sigma_h
    < 9.2e14 / budget; past it, scale w down to whole units.

    Scale: one map-side-combined groupBy(stratum) + stratum-domain
    windows. Output is stratum-domain-sized.
    """
    per = df.groupBy(F.col(stratum_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast("long")).cast("long").alias("_s"),
        F.sum(
            F.col(value_col).cast("long") * F.col(value_col).cast("long")
        ).cast("long").alias("_q"),
    )
    w_milli = F.round(
        F.sqrt(
            F.col("n").cast("double") * F.col("_q").cast("double")
            - F.col("_s").cast("double") * F.col("_s").cast("double")
        )
        * F.lit(1000.0)
    ).cast("long")
    full = W.partitionBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    weighted = per.select(
        stratum_col,
        "n",
        w_milli.alias("w_milli"),
    ).select(
        stratum_col,
        "n",
        "w_milli",
        F.sum("w_milli").over(full).cast("long").alias("_wt"),
    )
    # nullif guard: all-constant strata give _wt = 0 -- Spark ANSI
    # errors on integer div-by-zero where DuckDB // returns NULL, so
    # both sides must take the NULL path explicitly.
    alloc = F.expr(f"({budget} * w_milli) div nullif(_wt, 0)").cast("long")
    return weighted.select(
        stratum_col,
        "n",
        "w_milli",
        alloc.alias("alloc"),
        (
            F.lit(budget) - F.sum(alloc).over(full)
        ).cast("long").alias("left_over"),
    ).orderBy(stratum_col)


def theil_sen_slope(
    series: DataFrame,
    x_col: str,
    y_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Theil-Sen robust trend estimator: the median of all pairwise
    slopes (y_j - y_i) / (x_j - x_i) over x_i < x_j -- up to 29%
    contamination leaves it unmoved, where the q235 OLS slope chases a
    single outlier day.

    ``series`` is an already-aggregated (x, y) table with BIGINT
    columns and UNIQUE x (one row per day/month/bucket). Slopes are
    exact fixed-point BIGINTs: ``slope_fp = ((y_j - y_i) * scale) div
    (x_j - x_i)`` -- truncation toward zero on BOTH engines (verified:
    DuckDB // and Spark div agree on negatives), so the median is an
    engine-independent integer. The median is the LOWER median (rank
    ceil(n/2) of a totally ordered list -- slope, then x_i, then x_j),
    deterministic for even pair counts where the two middle values
    differ.

    Shape at 100 TB: the pair join is a theta join over the COLLAPSED
    series table -- bounded by the x-domain squared (a 7-year daily
    series is ~2400 rows -> ~2.9M pairs; months -> 3k pairs), never by
    raw data. The raw corpus collapses in the caller's first groupBy;
    this never sees it. Overflow: |y_j - y_i| * scale < 2^63.

    Returns ONE row: [n_points, n_pairs, slope_fp, slope] where
    ``slope = slope_fp / scale`` as a derived double.
    """
    a = series.select(
        F.col(x_col).cast("long").alias("x1"),
        F.col(y_col).cast("long").alias("y1"),
    )
    b = series.select(
        F.col(x_col).cast("long").alias("x2"),
        F.col(y_col).cast("long").alias("y2"),
    )
    pairs = a.join(b, F.col("x2") > F.col("x1")).select(
        "x1",
        "x2",
        F.expr(f"((y2 - y1) * {scale}) div (x2 - x1)")
        .cast("long")
        .alias("slope_fp"),
    )
    w_rank = W.orderBy("slope_fp", "x1", "x2")
    full = W.partitionBy()
    ranked = pairs.select(
        "slope_fp",
        F.row_number().over(w_rank).cast("long").alias("_rk"),
        F.count(F.lit(1)).over(full).cast("long").alias("n_pairs"),
    )
    n_points = series.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    return (
        ranked.filter(F.col("_rk") == F.expr("(n_pairs + 1) div 2"))
        .select(
            "n_pairs",
            F.col("slope_fp"),
            (F.col("slope_fp").cast("double") / F.lit(float(scale))).alias(
                "slope"
            ),
        )
        .crossJoin(F.broadcast(n_points))
        .select("n_points", "n_pairs", "slope_fp", "slope")
    )
