"""Unit tests for round-8 batch Q operators (q259-q261): Page-Hinkley
drift, Mann-Kendall trend, Cramer's V association."""

from __future__ import annotations

import datetime as dt
import math

from pos_data_insertion_etl_spark.operators.stats import (
    cramers_v,
    mann_kendall,
    page_hinkley,
)

# ---------------------------------------------------------------- q259


def test_page_hinkley_matches_recursive_reference(spark):
    days = [dt.date(2024, 6, d) for d in range(1, 9)]
    ns = [10, 10, 10, 10, 30, 30, 30, 30]  # level shift at day 5
    df = spark.createDataFrame(list(zip(days, ns)), "day date, n long")
    delta = 100
    out = {
        r.day: r
        for r in page_hinkley(df, "day", "n", delta_milli=delta).collect()
    }
    # textbook reference: m_t accumulates x_t*1000 - runmean - delta;
    # PH_t = m_t - min(m_0..m_t)
    p = 0
    m = 0
    m_min = 0
    for t, (day, n) in enumerate(zip(days, ns), start=1):
        p += n
        mean_milli = p * 1000 // t
        m += n * 1000 - mean_milli - delta
        m_min = min(m_min, m)
        r = out[day]
        assert r.mean_milli == mean_milli
        assert r.ph_milli == m - m_min, day
    # drift fires after the shift, not before
    assert out[days[3]].ph_milli == 0
    assert out[days[-1]].ph_milli > 0


# ---------------------------------------------------------------- q260


def test_mann_kendall_monotone_and_flat(spark):
    days = [dt.date(2024, 7, d) for d in range(1, 6)]
    up = spark.createDataFrame(
        list(zip(days, [1, 2, 3, 4, 5])), "day date, n long"
    )
    r = mann_kendall(up, "day", "n").collect()[0]
    assert (r.n_days, r.s) == (5, 10)  # all 10 pairs ascending
    assert (r.n_pos, r.n_neg, r.n_tie) == (10, 0, 0)

    flat = spark.createDataFrame(
        list(zip(days, [7, 7, 7, 7, 7])), "day date, n long"
    )
    r2 = mann_kendall(flat, "day", "n").collect()[0]
    assert (r2.s, r2.n_tie) == (0, 10)


def test_mann_kendall_mixed(spark):
    days = [dt.date(2024, 8, d) for d in range(1, 5)]
    df = spark.createDataFrame(
        list(zip(days, [3, 1, 4, 1])), "day date, n long"
    )
    # pairs: (3,1)- (3,4)+ (3,1)- (1,4)+ (1,1)t (4,1)-
    r = mann_kendall(df, "day", "n").collect()[0]
    assert (r.n_days, r.n_pos, r.n_neg, r.n_tie, r.s) == (4, 2, 3, 1, -1)


# ---------------------------------------------------------------- q261


def test_cramers_v_perfect_association(spark):
    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "s string, l string")
    r = cramers_v(df, "s", "l").collect()[0]
    assert (r.n, r.r, r.c) == (10, 2, 2)
    # perfect association: chi2 = n, V = 1
    assert r.chi2_micro == 10_000_000
    assert abs(r.v - 1.0) < 1e-9


def test_cramers_v_independent(spark):
    # exactly proportional cells -> chi2 = 0, V = 0
    rows = (
        [("a", "x")] * 4 + [("a", "y")] * 2
        + [("b", "x")] * 2 + [("b", "y")] * 1
    )
    df = spark.createDataFrame(rows, "s string, l string")
    r = cramers_v(df, "s", "l").collect()[0]
    assert r.chi2_micro == 0 and r.v == 0.0


def test_cramers_v_hand_computed(spark):
    # 2x2 with o = [[3,1],[1,3]]: chi2 = n(ad-bc)^2/(r1 r2 c1 c2) = 2
    rows = (
        [("a", "x")] * 3 + [("a", "y")] * 1
        + [("b", "x")] * 1 + [("b", "y")] * 3
    )
    df = spark.createDataFrame(rows, "s string, l string")
    r = cramers_v(df, "s", "l").collect()[0]
    # chi2 = 8*(3*3-1*1)^2/(4*4*4*4) = 8*64/256 = 2 -> 2e6 micro
    assert r.chi2_micro == 2_000_000
    assert abs(r.v - math.sqrt(2 / 8)) < 1e-9


def test_mann_kendall_empty_and_single_day(spark):
    import datetime as dt

    empty = spark.createDataFrame([], "day date, n long")
    r = mann_kendall(empty, "day", "n").collect()[0]
    assert (r.n_days, r.n_pos, r.n_neg, r.n_tie, r.s) == (0, 0, 0, 0, 0)

    one = spark.createDataFrame(
        [(dt.date(2024, 9, 1), 5)], "day date, n long"
    )
    r1 = mann_kendall(one, "day", "n").collect()[0]
    assert (r1.n_days, r1.s) == (1, 0)
