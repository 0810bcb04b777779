"""Round-8 registration queue: KMV distinct sketches + monitor store,
golden-record entity resolution, min-K% prob membership scores, and
classifier calibration/ECE. Implemented + tested this round; kept out
of the registry so the round-7 certification window stays intact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.fuzzy import golden_records
from pos_data_insertion_etl_spark.operators.lm_score import (
    min_k_prob_scores,
)
from pos_data_insertion_etl_spark.operators.scoring import (
    calibration_bins,
)
from pos_data_insertion_etl_spark.operators.sketches import (
    KMV_HASH_SPACE,
    kmv_estimate,
    kmv_estimate_grouped,
    kmv_merge,
    kmv_summary,
    kmv_summary_grouped,
)

# ------------------------------------------------------------- KMV


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [(f"v{i % 7}",) for i in range(100)], "v string"
    )
    est = kmv_estimate(kmv_summary(df, "v", k=64), k=64).collect()[0]
    assert est.n_kept == 7 and est.distinct_est == 7


def test_kmv_estimate_within_envelope(spark):
    n = 3000
    df = spark.createDataFrame([(f"val{i}",) for i in range(n)], "v string")
    k = 256
    est = kmv_estimate(kmv_summary(df, "v", k=k), k=k).collect()[0]
    assert est.n_kept == k
    # 3-sigma-ish KMV envelope: 3/sqrt(k-2) ~ 19%
    assert abs(est.distinct_est - n) < 0.2 * n
    assert est.distinct_est == (k - 1) * KMV_HASH_SPACE // est.kth_hv


def test_kmv_merge_is_union_and_idempotent(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "v string")
    k = 128
    sa, sb = kmv_summary(a, "v", k=k), kmv_summary(b, "v", k=k)
    merged = kmv_merge(sa.unionByName(sb).unionByName(sa), k=k)
    direct = kmv_summary(a.unionByName(b), "v", k=k)
    assert sorted(r.hv for r in merged.collect()) == sorted(
        r.hv for r in direct.collect()
    )


def test_kmv_grouped_matches_flat(spark):
    df = spark.createDataFrame(
        [("g1", f"x{i}") for i in range(300)]
        + [("g2", f"y{i % 5}") for i in range(50)],
        "g string, v string",
    )
    k = 64
    got = {r.group: r for r in kmv_estimate_grouped(
        kmv_summary_grouped(df, "g", "v", k=k), k=k).collect()}
    flat_g1 = kmv_estimate(
        kmv_summary(df.filter(F.col("g") == "g1"), "v", k=k), k=k
    ).collect()[0]
    assert got["g1"].distinct_est == flat_g1.distinct_est
    assert got["g2"].distinct_est == 5  # exact below k


def test_kmv_monitor_store_replay(spark, tmp_path):
    from pos_data_insertion_etl_spark.streaming.jobs import (
        kmv_monitor_batch,
        load_kmv_distinct,
    )

    df = spark.createDataFrame([(f"u{i}",) for i in range(900)], "v string")
    store = str(tmp_path / "kmv")
    k = 128
    batches = [
        (0, df.filter(F.crc32("v") % 3 == 0)),
        (1, df.filter(F.crc32("v") % 3 == 1)),
        (1, df.filter(F.crc32("v") % 3 == 1)),  # replayed
        (2, df.filter(F.crc32("v") % 3 == 2)),
    ]
    for bid, b in batches:
        kmv_monitor_batch(b, bid, store, "v", k=k)
    merged = load_kmv_distinct(spark, store, k=k).collect()[0]
    direct = kmv_estimate(kmv_summary(df, "v", k=k), k=k).collect()[0]
    # replay-idempotent AND merge == single-pass sketch, exactly
    assert merged.kth_hv == direct.kth_hv
    assert merged.distinct_est == direct.distinct_est


# ---------------------------------------------------- golden records


def test_golden_records_clusters_and_singletons(spark):
    rows = [
        (1, "blue bolt"),
        (2, "blue belt"),      # 1 edit from 1
        (3, "blue bolts"),     # 1 edit from 1
        (4, "red widget"),     # singleton
        (9, "zzz unique"),     # singleton
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {r.id: r for r in golden_records(
        df, "id", "name", window=3, max_dist=2).collect()}
    assert out[1].entity_id == out[2].entity_id == out[3].entity_id
    assert out[1].is_canonical and not out[2].is_canonical
    assert out[1].entity_size == 3
    assert out[4].entity_id == 4 and out[4].is_canonical
    assert out[4].entity_size == 1
    assert out[9].entity_size == 1


def test_golden_records_covers_all_input_rows(spark, sf_dir):
    from pos_data_insertion_etl_spark.catalog import load_table

    part = load_table(spark, sf_dir, "part")
    out = golden_records(part, "p_partkey", "p_name")
    assert out.count() == part.count()
    # exactly one canonical per entity
    bad = (
        out.groupBy("entity_id")
        .agg(F.sum(F.when(F.col("is_canonical"), 1).otherwise(0)).alias("c"))
        .filter(F.col("c") != 1)
    )
    assert bad.count() == 0


# ------------------------------------------------------- min-K% prob


def test_min_k_prob_picks_lowest_tokens(spark):
    # 'rare' appears once -> lowest log-prob; doc 1's min-20% (1 of 5
    # tokens) must be exactly that token's fp
    docs = spark.createDataFrame(
        [
            (1, "common common common common rare"),
            (2, "common common common common common"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in min_k_prob_scores(
        docs, "text", "doc_id", top_v=5, k_pct=20).collect()}
    assert out[1].n_tokens == 5 and out[1].m_tokens == 1
    # doc 1's worst token (rare) is less probable than doc 2's (common)
    assert out[1].mink_mean_fp < out[2].mink_mean_fp


def test_min_k_prob_ceil_and_invariance(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e f g") for i in range(4)],
        "doc_id long, text string",
    )
    out = min_k_prob_scores(docs, "text", "doc_id", k_pct=30).collect()
    for r in out:
        assert r.m_tokens == (7 * 30 + 99) // 100  # ceil = 3
    # identical docs score identically (partitioning-invariant)
    assert len({r.mink_mean_fp for r in out}) == 1


# ------------------------------------------------------- calibration


def test_calibration_bins_exact_fixture(spark):
    rows = [
        # bin 9: two p=0.95 rows, 1 positive -> conf 950000, obs 500000
        (950_000, True), (950_000, False),
        # bin 0: one p=0.05 row, negative -> conf 50000, obs 0
        (50_000, False),
    ]
    df = spark.createDataFrame(rows, "p long, y boolean")
    out = {r.bin: r for r in calibration_bins(df, "p", "y").collect()}
    assert out[9].n == 2 and out[9].conf_fp == 950_000
    assert out[9].obs_fp == 500_000 and out[9].gap_fp == 450_000
    assert out[0].gap_fp == 50_000
    # ece = (450000*2 + 50000*1) div 3
    assert out[0].ece_fp == out[9].ece_fp == (450_000 * 2 + 50_000) // 3


def test_calibration_p_one_lands_in_top_bin(spark):
    df = spark.createDataFrame(
        [(1_000_000, True), (999_999, True)], "p long, y boolean"
    )
    out = calibration_bins(df, "p", "y").collect()
    assert [r.bin for r in out] == [9]
    assert out[0].n == 2 and out[0].gap_fp == pytest.approx(
        1_000_000 - (1_000_000 + 999_999) // 2
    )
