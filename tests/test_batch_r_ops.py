"""Unit tests for round-8 batch R operators (q262-q266): PII scrub,
WOE/IV screen, permutation entropy, two-proportion z-test, Chao1."""

from __future__ import annotations

import math

from pos_data_insertion_etl_spark.operators.pii import pii_scrub_report
from pos_data_insertion_etl_spark.operators.scoring import woe_iv_bins
from pos_data_insertion_etl_spark.operators.stats import (
    two_proportion_ztest,
)
from pos_data_insertion_etl_spark.operators.text_mining import (
    chao1_richness,
)
from pos_data_insertion_etl_spark.operators.timeseries import (
    permutation_entropy,
)

# ---------------------------------------------------------------- q262


def test_pii_scrub_counts_and_lengths(spark):
    rows = [
        (1, "hi a@b.com and c.d@e.org call 123-456-7890 ip 1.2.3.4"),
        (2, "nothing sensitive here"),
        (3, "card 4111111111111111 is neither phone nor ip"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in pii_scrub_report(df).collect()}

    r1 = out[1]
    assert (r1.n_email, r1.n_phone, r1.n_ip) == (2, 1, 1)
    red = (
        "hi [EMAIL] and [EMAIL] call [PHONE] ip [IP]"
    )
    assert r1.orig_len == len(rows[0][1])
    assert r1.red_len == len(red)

    r2 = out[2]
    assert (r2.n_email, r2.n_phone, r2.n_ip) == (0, 0, 0)
    assert r2.red_len == r2.orig_len

    # contiguous digits: no dashes => not a phone, no dots => not an IP
    r3 = out[3]
    assert (r3.n_email, r3.n_phone, r3.n_ip) == (0, 0, 0)


# ---------------------------------------------------------------- q263


def test_woe_iv_matches_hand_computation(spark):
    ys = [1, 0, 1, 0, 1, 0, 0, 1, 0, 0]
    df = spark.createDataFrame(
        [(i + 1, float(i + 1), ys[i]) for i in range(10)],
        "id long, v double, y long",
    )
    out = {r.bin: r for r in woe_iv_bins(df, "v", "y", "id", k=2).collect()}
    assert sorted(out) == [1, 2]
    assert (out[1].n_rows, out[2].n_rows) == (5, 5)
    assert (out[1].good_n, out[2].good_n) == (3, 1)

    gt, bt = 4 + 2, 6 + 2  # smoothed class totals
    expected_iv = 0
    for b, (g, bad) in {1: (3, 2), 2: (1, 4)}.items():
        g1, b1 = g + 1, bad + 1
        woe = round(math.log((g1 / gt) / (b1 / bt)) * 1_000_000)
        pg, pb = g1 * 1_000_000 // gt, b1 * 1_000_000 // bt
        term = int((pg - pb) * woe / 1_000_000)  # trunc toward zero
        assert out[b].woe_micro == woe, b
        assert (out[b].pg_ppm, out[b].pb_ppm) == (pg, pb)
        assert out[b].iv_term_micro == term
        expected_iv += term
    assert out[1].iv_micro == expected_iv
    assert out[2].iv_micro == expected_iv


def test_woe_bins_are_equal_depth_under_remainder(spark):
    # 7 rows, k=3 -> depths 3/2/2 by the explicit integer formula
    df = spark.createDataFrame(
        [(i, float(i), 0) for i in range(1, 8)], "id long, v double, y long"
    )
    depths = {
        r.bin: r.n_rows
        for r in woe_iv_bins(df, "v", "y", "id", k=3).collect()
    }
    assert depths == {1: 3, 2: 2, 3: 2}


# ---------------------------------------------------------------- q264


def test_permutation_entropy_hand_series(spark):
    import datetime as dt

    days = [dt.date(2024, 1, d) for d in range(1, 6)]
    vals = [1, 3, 2, 5, 4]
    df = spark.createDataFrame(
        list(zip(days, vals)), "day date, v long"
    )
    out = {r.pattern: r for r in permutation_entropy(df, "day", "v").collect()}
    # triples: (1,3,2)->6, (3,2,5)->3, (2,5,4)->6
    assert sorted(out) == [3, 6]
    assert (out[6].cnt, out[3].cnt) == (2, 1)
    assert out[6].p_ppm == 2 * 1_000_000 // 3
    t6 = round((2 / 3) * math.log(2 / 3) * -1_000_000.0)
    t3 = round((1 / 3) * math.log(1 / 3) * -1_000_000.0)
    assert out[6].term_micro == t6
    assert out[3].term_micro == t3
    assert out[6].h_micro == t6 + t3


def test_permutation_entropy_monotone_and_ties(spark):
    import datetime as dt

    days = [dt.date(2024, 2, d) for d in range(1, 6)]
    mono = spark.createDataFrame(
        list(zip(days, [1, 2, 3, 4, 5])), "day date, v long"
    )
    rows = permutation_entropy(mono, "day", "v").collect()
    assert len(rows) == 1 and rows[0].pattern == 7
    assert rows[0].h_micro == 0  # p=1 -> p*ln p = 0

    # ties rank by time (later >= earlier) -> same code as ascending
    flat = spark.createDataFrame(
        list(zip(days, [9, 9, 9, 9, 9])), "day date, v long"
    )
    rows2 = permutation_entropy(flat, "day", "v").collect()
    assert len(rows2) == 1 and rows2[0].pattern == 7


# ---------------------------------------------------------------- q265


def test_two_proportion_ztest_textbook(spark):
    rows = (
        [(0, 1)] * 10 + [(0, 0)] * 90 + [(1, 1)] * 20 + [(1, 0)] * 80
    )
    df = spark.createDataFrame(rows, "variant long, s long")
    r = two_proportion_ztest(df, "variant", "s").collect()[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (100, 10, 100, 20)
    pa, pb, p = 0.1, 0.2, 0.15
    z2 = (pa - pb) * (pa - pb) / (p * (1 - p) * (1 / 100 + 1 / 100))
    assert r.z2_micro == round(z2 * 1_000_000.0)
    assert bool(r.significant_95) is True  # 3.92 > 3.84


def test_two_proportion_ztest_null_and_zero(spark):
    same = spark.createDataFrame(
        [(0, 1), (0, 0), (1, 1), (1, 0)], "variant long, s long"
    )
    r = two_proportion_ztest(same, "variant", "s").collect()[0]
    assert r.z2_micro == 0 and bool(r.significant_95) is False

    # degenerate pool (every trial succeeds) -> NULL z2, NULL verdict
    allwin = spark.createDataFrame(
        [(0, 1), (1, 1)], "variant long, s long"
    )
    r2 = two_proportion_ztest(allwin, "variant", "s").collect()[0]
    assert r2.z2_micro is None and r2.significant_95 is None


# ---------------------------------------------------------------- q266


def test_chao1_hand_counts(spark):
    rows = [
        (1, "a", "x y z"),
        (2, "a", "x y"),
        (3, "b", "p q r s"),
        (4, "c", "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in chao1_richness(df).collect()}
    # group a: bigrams {x y: 2, y z: 1} -> v=2 f1=1 f2=1
    a = out["a"]
    assert (a.n_bigrams, a.v_distinct, a.f1, a.f2) == (3, 2, 1, 1)
    assert a.chao1_milli == 2000  # f1*(f1-1) = 0 correction
    # group b: 3 singleton bigrams -> chao1 = 3 + 3*2/(2*1) = 6
    b = out["b"]
    assert (b.v_distinct, b.f1, b.f2) == (3, 3, 0)
    assert b.chao1_milli == 6000
    # single-token doc yields no bigrams -> group absent
    assert "c" not in out


def test_chao1_literal_split_filters_empty_tokens(spark):
    df = spark.createDataFrame(
        [(1, "a", "x  y")], "doc_id long, source string, text string"
    )
    r = chao1_richness(df).collect()[0]
    # double space would fabricate an empty token; the filter drops it
    assert (r.n_bigrams, r.v_distinct) == (1, 1)
