"""Unit tests for round-8 batch N operators (q246-q250): vocabulary
profile, Zipf points, Heaps growth, Cohen's kappa, image byte-value
entropy -- each pinned on hand-built inputs with hand-computed
expectations."""

from __future__ import annotations

import math

import numpy as np

from pos_data_insertion_etl_spark.multimodal.binary_ops import (
    image_value_entropy,
    image_value_histogram,
)
from pos_data_insertion_etl_spark.multimodal.png_codec import encode_png
from pos_data_insertion_etl_spark.operators.scoring import cohens_kappa
from pos_data_insertion_etl_spark.operators.text_mining import (
    heaps_growth_points,
    vocab_stats,
    zipf_points,
)

# ------------------------------------------------------ q246 vocab stats


def test_vocab_stats_exact_profile(spark):
    df = spark.createDataFrame(
        [
            ("s1", "a a b c"),      # tokens 4, vocab 3, hapax 2 (b, c)
            ("s2", "x  x"),         # double space: literal split stays 2
        ],
        "source string, text string",
    )
    out = {r.grp: r for r in vocab_stats(df, "source").collect()}
    r = out["s1"]
    assert (r.n_tokens, r.vocab_size, r.hapax) == (4, 3, 2)
    assert r.ttr_ppm == 3 * 1_000_000 // 4
    assert r.hapax_ppm == 2 * 1_000_000 // 3
    assert (out["s2"].n_tokens, out["s2"].vocab_size, out["s2"].hapax) == (
        2, 1, 0,
    )


def test_vocab_stats_lowercases(spark):
    df = spark.createDataFrame(
        [("s", "Dog dog DOG")], "source string, text string"
    )
    r = vocab_stats(df, "source").collect()[0]
    assert (r.n_tokens, r.vocab_size, r.hapax) == (3, 1, 0)


# ------------------------------------------------------ q247 Zipf points


def test_zipf_points_rank_and_ln(spark):
    df = spark.createDataFrame(
        [("a a a a b b c",)], "text string"
    )
    out = {r.token: r for r in zipf_points(df).collect()}
    assert out["a"].rank == 1 and out["a"].freq == 4
    assert out["b"].rank == 2 and out["c"].rank == 3
    assert out["a"].x_fp == 0  # ln(1) = 0
    assert out["a"].y_fp == round(math.log(4) * 1000)
    assert out["c"].x_fp == round(math.log(3) * 1000)


def test_zipf_rank_ties_break_on_token(spark):
    df = spark.createDataFrame([("b a b a",)], "text string")
    out = {r.token: r.rank for r in zipf_points(df).collect()}
    assert out == {"a": 1, "b": 2}  # equal freq: lexicographic


# ---------------------------------------------------- q250 Heaps growth


def test_heaps_growth_points_cumulative(spark):
    # buckets of 2 docs: bucket0 = docs 0,1; bucket1 = docs 2,3
    df = spark.createDataFrame(
        [
            (0, "a b"),
            (1, "a c"),
            (2, "a d d"),
            (3, "b e"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.bucket: r
        for r in heaps_growth_points(df, bucket_size=2).collect()
    }
    b0, b1 = out[0], out[1]
    assert (b0.n_tokens, b0.new_types) == (4, 3)  # a b c first here
    assert (b1.n_tokens, b1.new_types) == (5, 2)  # d e new
    assert (b0.cum_tokens, b0.cum_types) == (4, 3)
    assert (b1.cum_tokens, b1.cum_types) == (9, 5)
    assert b1.x_fp == round(math.log(9) * 1000)
    assert b1.y_fp == round(math.log(5) * 1000)


# --------------------------------------------------------- q248 kappa


def test_cohens_kappa_exact_small_case(spark):
    # classic 2x2: n=10, agree=7, marginals a:{x:6,y:4} p:{x:5,y:5}
    rows = (
        [("x", "x")] * 4 + [("x", "y")] * 2
        + [("y", "x")] * 1 + [("y", "y")] * 3
    )
    df = spark.createDataFrame(rows, "a string, p string")
    r = cohens_kappa(df, "a", "p").collect()[0]
    assert (r.n, r.agree) == (10, 7)
    pe_num = 6 * 5 + 4 * 5  # 50
    assert r.pe_num == pe_num
    assert r.kappa_ppm == (10 * 7 - pe_num) * 1_000_000 // (100 - pe_num)
    assert abs(r.kappa - (70 - 50) / (100 - 50)) < 1e-12


def test_cohens_kappa_perfect_and_chance(spark):
    perfect = spark.createDataFrame(
        [("x", "x")] * 3 + [("y", "y")] * 3, "a string, p string"
    )
    assert cohens_kappa(perfect, "a", "p").collect()[0].kappa == 1.0
    # prediction constant -> pe_num = n * n_majority... kappa = 0 when
    # agreement equals chance: actual 50/50, pred always x ->
    # agree = 3, pe_num = 3*6 + 3*0 = 18, n*agree = 18 -> kappa 0
    const = spark.createDataFrame(
        [("x", "x")] * 3 + [("y", "x")] * 3, "a string, p string"
    )
    r = cohens_kappa(const, "a", "p").collect()[0]
    assert r.kappa == 0.0 and r.kappa_ppm == 0


# ------------------------------------------------- q249 image entropy


def _png_df(spark, arrays):
    rows = [
        (i, bytearray(encode_png(a.astype(np.uint8))))
        for i, a in arrays.items()
    ]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_image_histogram_counts(spark):
    flat = np.zeros((2, 2, 3), dtype=np.uint8)  # 12 bytes of value 0
    two = np.zeros((2, 2, 3), dtype=np.uint8)
    two[0, 0, 0] = 7  # one byte of 7, eleven of 0
    df = _png_df(spark, {1: flat, 2: two})
    out = {
        (r.doc_id, r.value): r.cnt
        for r in image_value_histogram(df, "doc_id", "content").collect()
    }
    assert out == {(1, 0): 12, (2, 0): 11, (2, 7): 1}


def test_image_entropy_flat_vs_mixed(spark):
    flat = np.full((2, 2, 3), 9, dtype=np.uint8)
    half = np.zeros((2, 2, 3), dtype=np.uint8)
    half.reshape(-1)[:6] = 255  # 6 bytes 255, 6 bytes 0 -> H = ln 2
    df = _png_df(spark, {1: flat, 2: half})
    out = {
        r.doc_id: r
        for r in image_value_entropy(df, "doc_id", "content").collect()
    }
    assert out[1].entropy_nano == 0 and out[1].n_values == 1
    ln2_nano = round(math.log(0.5) * 1e9)  # per-value term
    # H_nano = -((6*ln2_nano + 6*ln2_nano) div 12) = -ln2_nano
    assert out[2].entropy_nano == -((6 * ln2_nano + 6 * ln2_nano) // 12)
    assert out[2].n_values == 2
