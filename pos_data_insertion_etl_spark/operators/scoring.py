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

from ..smallframe import values_frame

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


def auc_rank_sum(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank-sum identity -- the
    classifier-evaluation step that closes the scoring loop
    (logistic_score assigns, auc_rank_sum grades against labels)
    without ever materializing a threshold sweep.

    Ties are handled with average ranks kept INTEGER by doubling:
    for a tie group at one score, min_rank + max_rank = 2*avg_rank,
    so u2 = sum over positives of (min+max) - npos*(npos+1) equals
    2*U exactly, and auc_fp = u2 * 500000 div (npos*nneg) is an exact
    1e-6 fixed-point integer. No doubles -> engine-portable.

    Scale: ONE groupBy on score (distinct-score cardinality, not row
    count), one global window over those groups ordered by score (the
    grouped table is sketch-sized for fixed-point scores; for truly
    continuous scores pre-quantize upstream), one 1-row reduce.

    Output: single row [npos, nneg, u2, auc_fp].
    """
    from pyspark.sql.window import Window as W

    g = (
        df.select(
            F.col(score_col).alias("_s"),
            F.when(F.col(label_col), 1).otherwise(0).alias("_y"),
        )
        .groupBy("_s")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum("_y").alias("_cp"),
        )
    )
    cum = g.select(
        "_s",
        "_c",
        "_cp",
        F.sum("_c")
        .over(
            W.orderBy("_s").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("_cum"),
    )
    return cum.agg(
        F.sum("_cp").cast("long").alias("npos"),
        (F.sum("_c") - F.sum("_cp")).cast("long").alias("nneg"),
        F.sum(F.col("_cp") * (2 * F.col("_cum") - F.col("_c") + 1))
        .cast("long")
        .alias("_ranksum2"),
    ).select(
        "npos",
        "nneg",
        (F.col("_ranksum2") - F.col("npos") * (F.col("npos") + 1))
        .cast("long")
        .alias("u2"),
        F.expr(
            "(( _ranksum2 - npos * (npos + 1)) * 500000)"
            " div (npos * nneg)"
        )
        .cast("long")
        .alias("auc_fp"),
    )


def rank_metrics(
    ranked: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    rel_totals: DataFrame,
    p_k: int = 5,
    r_k: int = 10,
) -> DataFrame:
    """Per-query retrieval metrics (MRR, precision@k, recall@k) over
    an already-ranked candidate list -- the evaluation harness for the
    engine's BM25/ANN retrieval stack, exact-integer throughout.

    ``ranked``: [query, rank (1-based within query), is_rel bool].
    ``rel_totals``: [query, n_rel] -- the per-query relevant-universe
    size for recall denominators (computed on the FULL corpus, not the
    ranked cut, by the caller).

    mrr_fp = 1e6 div first_rel_rank (0 when no relevant candidate is
    ranked); p@k and r@k are integer-div fixed point. One groupBy per
    query; the totals join is broadcast-sized (queries are few).

    Output: [query, first_rel_rank, mrr_fp, p_at_k_fp, r_at_k_fp,
    n_rel] with first_rel_rank = -1 when nothing relevant ranked.
    """
    agg = (
        ranked.select(
            F.col(query_col).alias("query"),
            F.col(rank_col).alias("_rk"),
            F.col(rel_col).alias("_rel"),
        )
        .groupBy("query")
        .agg(
            F.min(F.when(F.col("_rel"), F.col("_rk"))).alias("_first"),
            F.sum(
                F.when(F.col("_rel") & (F.col("_rk") <= p_k), 1).otherwise(0)
            ).alias("_hits_p"),
            F.sum(
                F.when(F.col("_rel") & (F.col("_rk") <= r_k), 1).otherwise(0)
            ).alias("_hits_r"),
        )
    )
    return agg.join(
        F.broadcast(
            rel_totals.select(
                F.col(rel_totals.columns[0]).alias("query"),
                F.col(rel_totals.columns[1]).cast("long").alias("n_rel"),
            )
        ),
        "query",
        "left",
    ).select(
        "query",
        F.coalesce(F.col("_first"), F.lit(-1)).cast("long").alias(
            "first_rel_rank"
        ),
        F.coalesce(
            F.expr("1000000 div _first"), F.lit(0)
        )
        .cast("long")
        .alias("mrr_fp"),
        F.expr(f"(_hits_p * 1000000) div {p_k}").cast("long").alias(
            "p_at_k_fp"
        ),
        F.coalesce(
            F.expr("(_hits_r * 1000000) div nullif(n_rel, 0)"), F.lit(0)
        )
        .cast("long")
        .alias("r_at_k_fp"),
        F.coalesce(F.col("n_rel"), F.lit(0)).alias("n_rel"),
    )


def calibration_bins(
    df: DataFrame,
    p_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error for a
    probability-scored classifier (the q200 serving path's companion
    audit: a quality filter whose 0.9 bucket is right 60% of the time
    needs retraining before it gates a corpus).

    ``p_col`` is a 1e-6 fixed-point probability (0..1e6). Bins are
    FIXED-WIDTH probability buckets (bin = min(p*n_bins div 1e6,
    n_bins-1)) -- not quantile bins, so no global sort/window; per-bin
    observed rate and mean confidence are exact integer divisions, the
    |gap| is integer, and ece_fp = sum(gap*n) div N rides a 1-row
    total broadcast. Everything replays exactly in SQL.

    Output: one row per non-empty bin
    [bin, n, n_pos, conf_fp, obs_fp, gap_fp, ece_fp] (ece_fp repeated
    per row, the q175 tv_distance convention).
    """
    binned = df.select(
        F.least(
            F.expr(f"{p_col} * {n_bins} div 1000000"),
            F.lit(n_bins - 1),
        )
        .cast("long")
        .alias("bin"),
        F.col(p_col).alias("_p"),
        F.when(F.col(label_col), 1).otherwise(0).alias("_y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum("_p").cast("long").alias("_psum"),
    )
    enriched = per_bin.select(
        "bin",
        "n",
        "n_pos",
        F.expr("_psum div n").cast("long").alias("conf_fp"),
        F.expr("(n_pos * 1000000) div n").cast("long").alias("obs_fp"),
        F.abs(
            F.expr("_psum div n") - F.expr("(n_pos * 1000000) div n")
        )
        .cast("long")
        .alias("gap_fp"),
    )
    total = enriched.agg(
        F.sum("n").alias("_nt"),
        F.sum(F.col("gap_fp") * F.col("n")).alias("_gsum"),
    )
    return enriched.crossJoin(F.broadcast(total)).select(
        "bin",
        "n",
        "n_pos",
        "conf_fp",
        "obs_fp",
        "gap_fp",
        F.expr("_gsum div _nt").cast("long").alias("ece_fp"),
    )


def cohens_kappa(
    labeled: DataFrame,
    actual_col: str,
    pred_col: str,
) -> DataFrame:
    """Cohen's kappa: chance-corrected agreement between two
    categorical labelings (a classifier vs gold labels, or two
    annotators/models against each other) -- the eval statistic that
    punishes majority-class freeloading where raw accuracy does not.

    Exact rational form: kappa = (n*agree - pe_num) / (n^2 - pe_num)
    with pe_num = sum_k actual_k * pred_k (the chance-agreement
    numerator over marginal products). All integers up to n^2 -- exact
    while n < ~3e9 rows -- emitted both as 1e-6 fixed point (truncating
    div) and as the one-division double.

    Scale: one (actual, pred) contingency groupBy with map-side
    combine; everything after runs on the category-squared table.
    Output one row: [n, agree, pe_num, kappa_ppm, kappa].
    """
    cells = labeled.groupBy(
        F.col(actual_col).alias("a"), F.col(pred_col).alias("p")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a_marg = cells.groupBy("a").agg(F.sum("c").cast("long").alias("ca"))
    p_marg = cells.groupBy(F.col("p").alias("a")).agg(
        F.sum("c").cast("long").alias("cp")
    )
    pe = (
        a_marg.join(p_marg, "a")
        .agg(F.sum(F.col("ca") * F.col("cp")).cast("long").alias("pe_num"))
    )
    base = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("p"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    return (
        base.crossJoin(F.broadcast(pe))
        .select(
            "n",
            "agree",
            "pe_num",
            # Divide-first above 1e6 (q256 pattern): the numerator is
            # bounded by n^2 already, so multiplying it by 1e6 would
            # re-overflow three decades under the documented n < ~3e9.
            F.expr(
                "CASE WHEN n * n - pe_num >= 1000000"
                " THEN (n * agree - pe_num)"
                "      div nullif((n * n - pe_num) div 1000000, 0)"
                " ELSE ((n * agree - pe_num) * 1000000)"
                "      div nullif(n * n - pe_num, 0) END"
            )
            .cast("long")
            .alias("kappa_ppm"),
            (
                (
                    F.col("n").cast("double") * F.col("agree").cast("double")
                    - F.col("pe_num").cast("double")
                )
                / F.nullif(
                    F.col("n").cast("double") * F.col("n").cast("double")
                    - F.col("pe_num").cast("double"),
                    F.lit(0.0),
                )
            ).alias("kappa"),
        )
    )


def rank_biased_overlap(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    id_col: str,
    rank_col: str = "rank",
    k: int = 20,
    p_num: int = 9,
    p_den: int = 10,
) -> DataFrame:
    """Truncated rank-biased overlap between two top-k rankings --
    "how much do these two rankers agree, weighted toward the top":
    RBO@k = (1-p) * sum_{d=1..k} p^(d-1) * |A_d intersect B_d| / d,
    the standard indefinite-ranking agreement measure (residual
    extrapolation omitted -- this is the exact prefix sum, a lower
    bound).

    Exact contract: p is the RATIONAL p_num/p_den, so each depth
    weight is the exact integer p_num^(d-1) * 1e6 div p_den^(d-1)
    (precomputed literals -- k <= 20 keeps 9^19 inside BIGINT);
    overlap@d = count of items with max(rank_a, rank_b) <= d comes
    from ONE running count over the joined rank pairs; term and final
    sums are truncating integer divs. Output one row: [k, n_joint,
    rbo_ppm] (n_joint = items in both top-k).

    Scale: the inputs are already top-k rankings (k rows each); the
    inner join and the k-row depth table are driver-trivial at any
    corpus size -- the heavy lifting happened in whatever produced
    the rankings.
    """
    if not (0 < p_num < p_den):
        raise ValueError("p must be in (0,1) as p_num/p_den")
    if k < 1:
        raise ValueError("k must be >= 1")
    # Depth weights are computed below in arbitrary-precision Python
    # and each w_fp <= 1e6 (p < 1), so no engine-side integer ever
    # holds a raw power -- any k is exact here; the practical k bound
    # is statistical (w_fp hits 0 once p^(d-1) < 1e-6), not numeric.
    a = ranks_a.select(
        F.col(id_col).alias("_id"), F.col(rank_col).alias("ra")
    ).filter(F.col("ra") <= k)
    b = ranks_b.select(
        F.col(id_col).alias("_id"), F.col(rank_col).alias("rb")
    ).filter(F.col("rb") <= k)
    joint = a.join(b, "_id").select(
        F.greatest("ra", "rb").cast("long").alias("m")
    )
    per_m = joint.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # depth table with exact rational weights as literals
    spark = ranks_a.sparkSession
    rows = [
        (d, (p_num ** (d - 1)) * 1_000_000 // (p_den ** (d - 1)))
        for d in range(1, k + 1)
    ]
    depths = values_frame(spark, rows, "d long, w_fp long")
    # overlap@d = sum of counts at depths m <= d: a bounded k x k
    # theta join over two tiny tables (never corpus-sized).
    terms = (
        F.broadcast(depths)
        .join(per_m, F.col("m") <= F.col("d"), "left")
        .groupBy("d", "w_fp")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("x_d"))
        .select(
            "d",
            "x_d",
            F.expr("w_fp * x_d div d").cast("long").alias("term"),
        )
    )
    # n_joint = overlap at full depth (x_k) -- read from the same
    # aggregate, no separate driver-side count action.
    return terms.agg(
        F.lit(k).cast("long").alias("k"),
        F.max(F.when(F.col("d") == k, F.col("x_d")))
        .cast("long")
        .alias("n_joint"),
        F.expr(f"(sum(term) * {p_den - p_num}) div {p_den}")
        .cast("long")
        .alias("rbo_ppm"),
    )


def woe_iv_bins(
    df: DataFrame,
    value_col: str,
    label_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Weight-of-evidence / information-value screen of one numeric
    feature against a binary label -- the classical scorecard-era
    feature-importance panel that LLM-quality-classifier training still
    uses to rank candidate gates (is document length predictive of the
    "good" label?).

    Rows are split into k equal-depth bins over a TOTAL order
    (value, id); bin i holds rows with ((rn-1)*k) div n == i-1, an
    explicit integer formula (not NTILE) so both engines agree by
    construction. Per bin, with Laplace-smoothed counts g1 = good+1 /
    b1 = bad+1 (finite WOE even for pure bins) and class totals
    G = good_tot + k / B = bad_tot + k:

        woe_micro     = round(ln((g1/G) / (b1/B)) * 1e6)
        pg_ppm/pb_ppm = (g1*1e6) div G, (b1*1e6) div B
        iv_term_micro = ((pg_ppm - pb_ppm) * woe_micro) div 1e6
        iv_micro      = sum over bins (repeated per row)

    Determinism: the WOE double chain is division-then-ln on identical
    operands in a fixed order (no reassociated sums); everything after
    the single round() is exact integer. Overflow contract: g1 * 1e6
    must stay under 2^63 => fine to ~9.2e12 positives per class.

    Scale: one ordered window for (rn, n) -- the running row_number and
    the full-frame total share a single Window node -- then a k-row
    groupBy and k-row windows. Only the first window touches the
    corpus; it is the unavoidable cost of exact equal-depth binning
    (an approx-quantile cut would avoid the sort but certifies
    nothing). At 100 TB, pre-aggregate equal values first or accept
    the range-partitioned sort Spark plans for global windows.
    """
    from pyspark.sql.window import Window as W

    ow = W.orderBy(F.col(value_col), F.col(id_col))
    full = ow.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    binned = df.select(
        F.col(label_col).cast("long").alias("_y"),
        (
            (F.row_number().over(ow) - F.lit(1)).cast("long")
            * F.lit(k)
        ).alias("_rnk"),
        F.count(F.lit(1)).over(full).cast("long").alias("_n"),
    ).select(
        (F.expr("_rnk div _n") + F.lit(1)).cast("long").alias("bin"),
        F.col("_y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("_y").cast("long").alias("good_n"),
        (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("bad_n"),
    )
    bw = W.partitionBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    smoothed = per_bin.select(
        "bin",
        "n_rows",
        "good_n",
        "bad_n",
        (F.col("good_n") + F.lit(1)).alias("_g1"),
        (F.col("bad_n") + F.lit(1)).alias("_b1"),
        (F.sum("good_n").over(bw) + F.lit(k)).alias("_gt"),
        (F.sum("bad_n").over(bw) + F.lit(k)).alias("_bt"),
    )
    woe = F.round(
        F.log(
            (F.col("_g1").cast("double") / F.col("_gt").cast("double"))
            / (F.col("_b1").cast("double") / F.col("_bt").cast("double"))
        )
        * F.lit(1000000.0)
    ).cast("long")
    scored = smoothed.select(
        "bin",
        "n_rows",
        "good_n",
        "bad_n",
        woe.alias("woe_micro"),
        F.expr("_g1 * 1000000 div _gt").cast("long").alias("pg_ppm"),
        F.expr("_b1 * 1000000 div _bt").cast("long").alias("pb_ppm"),
    ).select(
        "bin",
        "n_rows",
        "good_n",
        "bad_n",
        "woe_micro",
        "pg_ppm",
        "pb_ppm",
        F.expr("(pg_ppm - pb_ppm) * woe_micro div 1000000")
        .cast("long")
        .alias("iv_term_micro"),
    )
    return scored.select(
        "*",
        F.sum("iv_term_micro").over(bw).cast("long").alias("iv_micro"),
    ).orderBy("bin")


def isotonic_calibrate_bins(
    bins: DataFrame,
    bin_col: str = "bin",
    count_col: str = "cnt",
    positive_col: str = "pos",
) -> DataFrame:
    """Isotonic (PAV) calibration over pre-binned scores: the
    monotone-nondecreasing step function closest (weighted least
    squares) to the per-bin positive rates -- what you fit when a
    quality score ranks well but its raw probabilities wobble
    (complements q221's calibration ECE, which only MEASURES the
    wobble).

    Pool-adjacent-violators is sequential, so the distributed form
    uses the exact min-max identity instead:

        fitted(k) = max_{i<=k} min_{j>=i} mean(pos over bins i..j)

    Over B bins this is B^2 interval means from prefix sums and two
    bounded min/max reductions -- each mean is ONE IEEE division of
    exact integer interval sums, and min/max of doubles is
    order-independent, so the result replays bit-for-bit in any
    engine (no float is ever summed). fitted_micro = round(* 1e6).

    Scale: the corpus collapses to the B-row bin table BEFORE this
    operator (the caller aggregates); everything here is B^2 <= 10^4
    rows of join -- driver-trivial, executor-trivial. The binning
    aggregation is the only corpus-sized stage.
    """
    from pyspark.sql.window import Window as W

    ow = W.orderBy(F.col(bin_col))
    run = ow.rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = bins.select(
        F.col(bin_col).alias("b"),
        F.col(count_col).cast("long").alias("cnt"),
        F.col(positive_col).cast("long").alias("pos"),
        F.sum(F.col(count_col).cast("long")).over(run).alias("c_run"),
        F.sum(F.col(positive_col).cast("long")).over(run).alias("p_run"),
    ).localCheckpoint(eager=False)
    # interval means over (i..j): prefix differences via a self-join
    lo = pre.select(
        F.col("b").alias("i"),
        (F.col("c_run") - F.col("cnt")).alias("c_lo"),
        (F.col("p_run") - F.col("pos")).alias("p_lo"),
    )
    hi = pre.select(
        F.col("b").alias("j"),
        F.col("c_run").alias("c_hi"),
        F.col("p_run").alias("p_hi"),
    )
    means = (
        lo.join(hi, F.col("j") >= F.col("i"))
        .select(
            "i",
            "j",
            (
                (F.col("p_hi") - F.col("p_lo")).cast("double")
                / (F.col("c_hi") - F.col("c_lo")).cast("double")
            ).alias("m"),
        )
    )
    m_i = means.groupBy("i").agg(F.min("m").alias("mmin"))
    fitted = (
        pre.select("b", "cnt", "pos")
        .join(m_i, F.col("b") >= F.col("i"))
        .groupBy("b", "cnt", "pos")
        .agg(F.max("mmin").alias("_fit"))
    )
    return fitted.select(
        F.col("b").alias(bin_col),
        "cnt",
        "pos",
        F.expr("pos * 1000000 div cnt").cast("long").alias("rate_ppm"),
        F.round(F.col("_fit") * F.lit(1000000.0))
        .cast("long")
        .alias("fitted_micro"),
    ).orderBy(bin_col)
