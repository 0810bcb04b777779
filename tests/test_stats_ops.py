"""Unit tests for operators/stats.py (round-8 batch L, q232-q239):
each operator pinned on a tiny hand-built frame with the expected
output computed by hand -- independent of the registry oracles."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.stats import (
    acf_pearson,
    categorical_kl,
    cusum_scores,
    ecdf_percentiles,
    gini_coefficient,
    grouped_ols,
    ks_two_sample,
    pareto_frontier,
    rfm_segments,
    spearman_corr,
)

# --------------------------------------------------------------- q232 KS


def test_ks_two_sample_exact_d(spark):
    # A = {1,2,3,4}, B = {3,4,5,6}: D = max|F_a - F_b| = 1/2 at x=2.
    rows = [(v, "a") for v in (1, 2, 3, 4)] + [
        (v, "b") for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "v long, g string")
    out = ks_two_sample(df, "v", "g", "a", "b").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b, r.d_denom) == (4, 4, 16)
    assert r.d_num == 8  # |2*4 - 0*4| at x=2
    assert r.d_fp == 500_000
    assert r.d == 0.5


def test_ks_identical_distributions_is_zero(spark):
    rows = [(v, g) for g in ("a", "b") for v in (10, 20, 20, 30)]
    df = spark.createDataFrame(rows, "v long, g string")
    r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert r.d_num == 0 and r.d == 0.0


# --------------------------------------------------------- q233 Spearman


def test_spearman_perfect_monotone(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 40), (3, 90), (4, 160)], "x long, y long"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r.n == 4 and r.rho == 1.0


def test_spearman_ties_average_ranks(spark):
    # x ties at 2: avg ranks for x = [1, 2.5, 2.5, 4]; y strictly
    # increasing -> rho = Pearson([1,2.5,2.5,4],[1,2,3,4]) ~= 0.9487
    df = spark.createDataFrame(
        [(1, 1), (2, 2), (2, 3), (3, 4)], "x long, y long"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    rx = [1.0, 2.5, 2.5, 4.0]
    ry = [1.0, 2.0, 3.0, 4.0]
    n = 4
    num = n * sum(a * b for a, b in zip(rx, ry)) - sum(rx) * sum(ry)
    den = math.sqrt(
        (n * sum(a * a for a in rx) - sum(rx) ** 2)
        * (n * sum(b * b for b in ry) - sum(ry) ** 2)
    )
    assert abs(r.rho - num / den) < 1e-12
    # doubled-rank integer numerator: 4x the half-unit-rank numerator
    assert r.sxy_num == int(round(4 * num))


def test_spearman_grouped(spark):
    rows = [("g1", 1, 5), ("g1", 2, 4), ("g1", 3, 3),
            ("g2", 1, 1), ("g2", 2, 2), ("g2", 3, 3)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r.rho for r in spearman_corr(df, "x", "y", "g").collect()}
    assert out["g1"] == -1.0 and out["g2"] == 1.0


# ------------------------------------------------------------- q234 Gini


def test_gini_perfect_equality_and_concentration(spark):
    eq = spark.createDataFrame(
        [(i, 100) for i in range(5)], "id long, x long"
    )
    r = gini_coefficient(eq, "x", "id").collect()[0]
    assert (r.n, r.total, r.gini_num, r.gini) == (5, 500, 0, 0.0)

    # all value on one holder: G = (n-1)/n
    conc = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 100)], "id long, x long"
    )
    r = gini_coefficient(conc, "x", "id").collect()[0]
    # x sorted ascending: weights (2i-n-1) for i=4 -> 3; num=300
    assert r.gini_num == 300 and r.total == 100 and r.n == 4
    assert r.gini == 0.75


def test_gini_tie_invariant_under_partitioning(spark):
    rows = [(i, v) for i, v in enumerate([10, 10, 20, 20, 40])]
    a = gini_coefficient(
        spark.createDataFrame(rows, "id long, x long"), "x", "id"
    ).collect()[0]
    b = gini_coefficient(
        spark.createDataFrame(rows, "id long, x long").repartition(7),
        "x",
        "id",
    ).collect()[0]
    assert (a.gini_num, a.gini) == (b.gini_num, b.gini)


# -------------------------------------------------------------- q235 OLS


def test_grouped_ols_exact_line(spark):
    # y = 3 + 2x exactly -> slope 2, intercept 3, r2 = 1
    df = spark.createDataFrame(
        [("g", x, 3 + 2 * x) for x in (1, 2, 3, 4)],
        "grp string, x long, y long",
    )
    r = grouped_ols(df, "x", "y", "grp").collect()[0]
    assert (r.slope, r.intercept, r.r2) == (2.0, 3.0, 1.0)
    assert (r.n, r.sx, r.sy) == (4, 10, 32)


def test_grouped_ols_degenerate_returns_null(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 9)], "grp string, x long, y long"
    )
    r = grouped_ols(df, "x", "y", "grp").collect()[0]
    assert r.slope is None and r.r2 is None


# ---------------------------------------------------------- q236 skyline


def test_pareto_frontier_strict_dominance(spark):
    # (cost, gain): (1,5) frontier; (2,7) frontier; (3,6) dominated by
    # (2,7); (3,7) NOT dominated (needs strictly lower cost AND
    # strictly higher gain); (4,1) dominated.
    rows = [(1, 1, 5), (2, 2, 7), (3, 3, 6), (4, 3, 7), (5, 4, 1)]
    df = spark.createDataFrame(rows, "id long, c long, g long")
    out = sorted(r.id for r in pareto_frontier(df, "c", "g", "id").collect())
    assert out == [1, 2, 4]


def test_pareto_frontier_cost_ties_do_not_dominate(spark):
    rows = [(1, 10, 3), (2, 10, 9)]  # equal cost: both survive
    df = spark.createDataFrame(rows, "id long, c long, g long")
    out = sorted(r.id for r in pareto_frontier(df, "c", "g", "id").collect())
    assert out == [1, 2]


# -------------------------------------------------------------- q237 RFM


def test_rfm_segments_bins_and_code(spark):
    rows = []
    for ck in range(1, 11):
        # customer k: k orders, last order k days before anchor,
        # total value 100*k dollars
        for j in range(ck):
            rows.append(
                (ck, dt.datetime(2024, 1, ck, 0, 0), 100.0 * ck / ck)
            )
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {r.custkey: r for r in rfm_segments(df, "2024-01-31").collect()}
    assert len(out) == 10
    # frequency ascends with custkey: NTILE(5) over 10 rows -> 2 per bin
    assert [out[k].f_bin for k in range(1, 11)] == [
        1, 1, 2, 2, 3, 3, 4, 4, 5, 5
    ]
    # recency: custkey 10 ordered latest (Jan 10) -> smallest recency
    assert out[10].recency_days == 21 and out[1].recency_days == 30
    # recency_days DESCENDS with custkey, so r_bin of ck=10 is 1
    assert out[10].r_bin == 1 and out[1].r_bin == 5
    for r in out.values():
        assert r.segment == r.r_bin * 100 + r.f_bin * 10 + r.m_bin


# -------------------------------------------------------------- q238 ACF


def test_acf_perfect_period_two(spark):
    days = [dt.date(2024, 1, d) for d in range(1, 9)]
    xs = [10, 20, 10, 20, 10, 20, 10, 20]
    df = spark.createDataFrame(list(zip(days, xs)), "day date, n long")
    out = {r.lag: r for r in acf_pearson(df, "day", "n", 2).collect()}
    assert out[1].n_pairs == 7 and out[2].n_pairs == 6
    assert out[2].r == 1.0  # period-2 series: lag-2 perfectly correlated
    assert out[1].r < 0  # adjacent values anti-correlated


def test_acf_is_gap_aware(spark):
    # missing day 3: lag-1 pairs only (1,2) and (4,5)
    days = [dt.date(2024, 2, d) for d in (1, 2, 4, 5)]
    df = spark.createDataFrame(
        list(zip(days, [1, 2, 3, 4])), "day date, n long"
    )
    out = {r.lag: r for r in acf_pearson(df, "day", "n", 1).collect()}
    assert out[1].n_pairs == 2


# ------------------------------------------------------------ q239 CUSUM


def test_cusum_matches_recursive_reference(spark):
    days = [dt.date(2024, 3, d) for d in range(1, 9)]
    ns = [5, 5, 5, 9, 9, 9, 2, 2]
    df = spark.createDataFrame(list(zip(days, ns)), "day date, n long")
    slack = 250
    out = {
        r.day: r
        for r in cusum_scores(df, "day", "n", slack_milli=slack).collect()
    }
    # reference: the textbook recursion
    mean_milli = (sum(ns) * 1000) // len(ns)
    sp = sn = 0
    for day, n in zip(days, ns):
        dev = n * 1000 - mean_milli
        sp = max(0, sp + dev - slack)
        sn = max(0, sn - dev - slack)  # note: -(dev + slack) accumulated
        r = out[day]
        assert r.dev_milli == dev
        assert r.cusum_pos_milli == sp, day
        assert r.cusum_neg_milli == sn, day


# ------------------------------------------------------------- q240 ECDF


def test_ecdf_percentiles_ties_get_full_mass(spark):
    rows = [(1, "s", 10), (2, "s", 20), (3, "s", 20), (4, "s", 30)]
    df = spark.createDataFrame(rows, "id long, src string, v long")
    out = {r.id: r for r in ecdf_percentiles(df, "v", "src", "id").collect()}
    assert out[1].ecdf_fp == 250_000
    # both 20s count all rows <= 20 (3 of 4)
    assert out[2].ecdf_fp == out[3].ecdf_fp == 750_000
    assert out[4].ecdf_fp == 1_000_000
    assert all(r.n_group == 4 for r in out.values())


def test_ecdf_is_per_group(spark):
    rows = [(1, "a", 5), (2, "a", 6), (3, "b", 5)]
    df = spark.createDataFrame(rows, "id long, src string, v long")
    out = {r.id: r for r in ecdf_percentiles(df, "v", "src", "id").collect()}
    assert out[3].ecdf_fp == 1_000_000  # alone in its group
    assert out[1].ecdf_fp == 500_000


# --------------------------------------------------------------- q241 KL


def test_categorical_kl_identical_distribution_is_zero(spark):
    # both groups have the same cat mix as the corpus -> KL = 0 exactly
    rows = [(g, c) for g in ("a", "b") for c in ("x", "x", "y")]
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.grp: r for r in categorical_kl(df, "g", "c").collect()}
    assert out["a"].kl_nano == 0 and out["b"].kl_nano == 0
    assert out["a"].n_cats == 2 and out["a"].n_rows == 3


def test_categorical_kl_skewed_group_positive(spark):
    # group a: all x; group b: all y; corpus 50/50 ->
    # KL(a||corpus) = ln(2) exactly (one category, ratio 2)
    rows = [("a", "x")] * 4 + [("b", "y")] * 4
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.grp: r for r in categorical_kl(df, "g", "c").collect()}
    ln2_nano = round(math.log(2) * 1e9)
    assert out["a"].kl_nano == ln2_nano
    assert out["b"].kl_nano == ln2_nano
