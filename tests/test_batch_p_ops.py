"""Unit tests for round-8 batch P operators (q255-q258): Theil index,
Herfindahl, top-k share curve, Shannon source diversity."""

from __future__ import annotations

import math

from pos_data_insertion_etl_spark.operators.stats import (
    herfindahl_index,
    share_entropy,
    theil_index,
    topk_share,
)

# ---------------------------------------------------------------- q255


def test_theil_uniform_is_zero_and_skew_positive(spark):
    eq = spark.createDataFrame([(i, 50) for i in range(4)], "id long, x long")
    r = theil_index(eq, "x").collect()[0]
    assert (r.n, r.total, r.theil_nano) == (4, 200, 0)

    skew = spark.createDataFrame(
        [(0, 97), (1, 1), (2, 1), (3, 1)], "id long, x long"
    )
    r2 = theil_index(skew, "x").collect()[0]
    # T = sum x_i * round(ln(x_i*4/100)*1e9) // 100
    expected = (
        97 * round(math.log(97 * 4 / 100) * 1e9)
        + 3 * 1 * round(math.log(4 / 100) * 1e9)
    ) // 100
    assert r2.theil_nano == expected
    assert r2.theil_nano > 0


def test_theil_excludes_zero_values(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 0)], "id long, x long"
    )
    r = theil_index(df, "x").collect()[0]
    assert (r.n, r.total, r.theil_nano) == (2, 20, 0)


# ---------------------------------------------------------------- q256


def test_herfindahl_uniform_and_monopoly(spark):
    eq = spark.createDataFrame([(i, 25) for i in range(4)], "id long, x long")
    r = herfindahl_index(eq, "x").collect()[0]
    assert r.sum_sq == 4 * 625 and r.total == 100
    assert r.hhi == 0.25  # 1/n
    # divide-first fixed point: ((2500 // 100) * 1e6) // 100 = 250000
    assert r.hhi_ppm == 250_000

    mono = spark.createDataFrame([(0, 1_000_000)], "id long, x long")
    r2 = herfindahl_index(mono, "x").collect()[0]
    assert r2.hhi == 1.0
    assert r2.hhi_ppm == 1_000_000


def test_herfindahl_fixed_point_matches_double(spark):
    rows = [(i, 5_000 + 1_000 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, x long")
    r = herfindahl_index(df, "x").collect()[0]
    assert r.hhi_ppm == ((r.sum_sq // r.total) * 1_000_000) // r.total
    # divide-first truncation loses < 1e6/total ppm
    assert abs(r.hhi * 1_000_000 - r.hhi_ppm) < 1_000_000 / r.total + 20


# ---------------------------------------------------------------- q257


def test_topk_share_curve_points(spark):
    rows = [(1, 50), (2, 30), (3, 15), (4, 5)]
    df = spark.createDataFrame(rows, "id long, x long")
    out = {r.k: r for r in topk_share(df, "x", "id", ks=(1, 2, 4)).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1].topk_value, out[1].share_ppm) == (50, 500_000)
    assert (out[2].topk_value, out[2].share_ppm) == (80, 800_000)
    assert (out[4].topk_value, out[4].share_ppm) == (100, 1_000_000)
    assert all(r.total == 100 for r in out.values())


def test_topk_share_tie_break_is_total_order(spark):
    rows = [(2, 10), (1, 10), (3, 10)]
    df = spark.createDataFrame(rows, "id long, x long")
    out = {r.k: r for r in topk_share(df, "x", "id", ks=(1, 3)).collect()}
    assert out[1].topk_value == 10 and out[3].topk_value == 30


# ---------------------------------------------------------------- q258


def test_share_entropy_uniform_and_single(spark):
    uni = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("b",)], "g string"
    )
    r = share_entropy(uni, "g").collect()[0]
    assert (r.n_groups, r.n_rows) == (2, 4)
    ln_half = round(math.log(0.5) * 1e9)
    assert r.entropy_nano == -((2 * ln_half + 2 * ln_half) // 4)
    # == ln 2 in nanos (up to the one rounding)
    assert abs(r.entropy_nano - round(math.log(2) * 1e9)) <= 1

    single = spark.createDataFrame([("x",)] * 5, "g string")
    r2 = share_entropy(single, "g").collect()[0]
    assert (r2.n_groups, r2.entropy_nano) == (1, 0)
