"""Unit tests for round-8 batch O operators (q251-q253): rank-biased
overlap, weighted median, IQR fences -- hand-computed expectations on
tiny frames."""

from __future__ import annotations

from pos_data_insertion_etl_spark.operators.scoring import (
    rank_biased_overlap,
)
from pos_data_insertion_etl_spark.operators.stats import (
    iqr_outlier_fences,
    weighted_median,
)

# ---------------------------------------------------------------- q251


def _ranks(spark, order):
    return spark.createDataFrame(
        [(item, i + 1) for i, item in enumerate(order)],
        "item string, rank long",
    )


def test_rbo_identical_rankings(spark):
    a = _ranks(spark, ["x", "y", "z"])
    r = rank_biased_overlap(a, a, "item", k=3).collect()[0]
    # identical: X_d = d at every depth -> RBO = (1-p) * sum p^(d-1)
    # with truncating fixed point: w = [1e6, 900000, 810000]
    expected = (
        (1_000_000 * 1 // 1 + 900_000 * 2 // 2 + 810_000 * 3 // 3) * 1
    ) // 10
    assert (r.k, r.n_joint, r.rbo_ppm) == (3, 3, expected)
    assert r.rbo_ppm == 271_000  # (1e6+9e5+8.1e5)//10


def test_rbo_disjoint_and_partial(spark):
    a = _ranks(spark, ["a", "b"])
    b = _ranks(spark, ["c", "d"])
    r = rank_biased_overlap(a, b, "item", k=2).collect()[0]
    assert (r.n_joint, r.rbo_ppm) == (0, 0)
    # swap at depth 2: overlap@1 = 0, overlap@2 = 2
    a2 = _ranks(spark, ["x", "y"])
    b2 = _ranks(spark, ["y", "x"])
    r2 = rank_biased_overlap(a2, b2, "item", k=2).collect()[0]
    # terms: d=1 -> 1e6*0//1 = 0; d=2 -> 900000*2//2 = 900000
    assert (r2.n_joint, r2.rbo_ppm) == (2, 90_000)


def test_rbo_k_filter_applies(spark):
    # item beyond k on one side never counts
    a = _ranks(spark, ["x", "y", "z"])
    b = _ranks(spark, ["x", "z", "y"])
    r = rank_biased_overlap(a, b, "item", k=1).collect()[0]
    # only depth 1: overlap@1 = 1 (x) -> rbo = (1e6*1//1)//10
    assert (r.k, r.n_joint, r.rbo_ppm) == (1, 1, 100_000)


# ---------------------------------------------------------------- q252


def test_weighted_median_threshold(spark):
    # values 1,2,3 with weights 1,1,2: total 4, half 2 -> cum at v=2
    # is 2 -> 2*2 >= 4 -> median 2
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 2)],
        "grp string, v long, w long",
    )
    r = weighted_median(df, "v", "w", "grp").collect()[0]
    assert (r.total_weight, r.median_value) == (4, 2)


def test_weighted_median_heavy_tail_and_groups(spark):
    rows = [("g1", 1, 1), ("g1", 100, 10), ("g2", 5, 3), ("g2", 7, 1)]
    df = spark.createDataFrame(rows, "grp string, v long, w long")
    out = {
        r.grp: r.median_value
        for r in weighted_median(df, "v", "w", "grp").collect()
    }
    assert out == {"g1": 100, "g2": 5}


def test_weighted_median_collapses_duplicate_values(spark):
    # duplicate (grp, v) rows sum their weights before the threshold
    rows = [("g", 2, 1), ("g", 2, 1), ("g", 9, 1)]
    df = spark.createDataFrame(rows, "grp string, v long, w long")
    r = weighted_median(df, "v", "w", "grp").collect()[0]
    assert (r.total_weight, r.median_value) == (3, 2)


# ---------------------------------------------------------------- q253


def test_iqr_fences_exact_quartiles_and_counts(spark):
    # group of 5: values 1..4 + outlier 100. quartiles over
    # [1,2,3,4,100]: q1 = 2.0, q3 = 4.0 (linear interpolation),
    # iqr = 2 -> lo = -1, hi = 7 -> one high outlier.
    rows = [("s", v) for v in (1, 2, 3, 4, 100)]
    df = spark.createDataFrame(rows, "src string, v long")
    r = iqr_outlier_fences(df, "v", "src").collect()[0]
    assert r.n == 5
    assert (r.q1, r.q3) == (2.0, 4.0)
    assert (r.lo, r.hi) == (-1.0, 7.0)
    assert (r.n_low, r.n_high) == (0, 1)


def test_iqr_fences_no_outliers(spark):
    rows = [("s", v) for v in (10, 10, 10, 10)]
    df = spark.createDataFrame(rows, "src string, v long")
    r = iqr_outlier_fences(df, "v", "src").collect()[0]
    assert (r.n_low, r.n_high) == (0, 0)
    assert r.lo == r.hi == 10.0


# ---------------------------------------------------------------- q254


def test_ks_monitor_replay_is_idempotent(spark, tmp_path):
    from pos_data_insertion_etl_spark.operators.stats import (
        ks_from_value_counts,
        ks_two_sample,
    )
    from pos_data_insertion_etl_spark.streaming.jobs import (
        ks_monitor_batch,
        load_ks_counts,
    )

    rows = [(v, g) for v in (1, 2, 3) for g in ("a", "b")] + [
        (9, "a"), (9, "a"), (1, "b"),
    ]
    df = spark.createDataFrame(rows, "v long, g string")
    store = str(tmp_path / "ks_store")
    # two batches split by value parity; batch 0 written TWICE
    for bid in (0, 1, 0):
        ks_monitor_batch(
            df.filter((df.v % 2) == bid), bid, store, "v", "g", "a", "b"
        )
    merged = ks_from_value_counts(load_ks_counts(spark, store)).collect()[0]
    direct = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert (merged.n_a, merged.n_b, merged.d_num, merged.d_fp) == (
        direct.n_a, direct.n_b, direct.d_num, direct.d_fp,
    )


def test_ks_monitor_skips_empty_batches(spark, tmp_path):
    from pos_data_insertion_etl_spark.streaming.jobs import (
        ks_monitor_batch,
        load_ks_counts,
    )

    df = spark.createDataFrame([(5, "a"), (6, "b")], "v long, g string")
    store = str(tmp_path / "ks_store2")
    ks_monitor_batch(df, 0, store, "v", "g", "a", "b")
    ks_monitor_batch(df.filter("v > 100"), 1, store, "v", "g", "a", "b")
    merged = load_ks_counts(spark, store).collect()
    assert sorted((r.v, r.na_v, r.nb_v) for r in merged) == [
        (5, 1, 0), (6, 0, 1),
    ]
