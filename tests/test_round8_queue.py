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


# ------------------------------------------------- Kneser-Ney bigram


def test_kneser_ney_exact_tiny_fixture(spark):
    import math

    from pos_data_insertion_etl_spark.operators.lm_score import (
        kneser_ney_bigram_scores,
    )

    # one doc "a b a b": bigram stream is (a,b), (b,a), (a,b)
    docs = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    r = kneser_ney_bigram_scores(docs, "text", "doc_id").collect()[0]
    assert r.n_bigrams == 3
    # counts: c(a,b)=2, c(b,a)=1; c_a=2, c_b=1; n1u(a)=1, n1u(b)=1;
    # n1w(b)=1, n1w(a)=1; T1=3
    def p(c, cu, n1u, n1w, t1=3):
        return (max(4 * c - 3, 0) * t1 + 3 * n1u * n1w) / (4 * cu * t1)

    fp_ab = round(math.log(p(2, 2, 1, 1)) * 1_000_000_000)
    fp_ba = round(math.log(p(1, 1, 1, 1)) * 1_000_000_000)
    expect = (-(2 * fp_ab + fp_ba)) // (1000 * 3)
    assert r.ce_micro == expect


def test_kneser_ney_orders_template_docs_lower(spark, sf_dir):
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.operators.lm_score import (
        kneser_ney_bigram_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = kneser_ney_bigram_scores(docs, "text", "doc_id")
    rows = out.collect()
    assert len(rows) == docs.filter(
        F.size(F.filter(F.split(F.lower(F.trim("text")), r"\s+"),
                        lambda x: x != "")) >= 2).count()
    assert all(r.ce_micro > 0 for r in rows)
    # determinism under a different partitioning
    again = kneser_ney_bigram_scores(
        docs.repartition(7), "text", "doc_id").collect()
    assert {(r.doc_id, r.ce_micro) for r in rows} == {
        (r.doc_id, r.ce_micro) for r in again
    }


# ------------------------------------------------- KMV intersection


def test_kmv_intersect_disjoint_and_nested(spark):
    from pos_data_insertion_etl_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_summary,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(400)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(400)], "v string")
    k = 128
    sa, sb = kmv_summary(a, "v", k=k), kmv_summary(b, "v", k=k)
    r = kmv_intersect_estimate(sa, sb, k=k).collect()[0]
    assert r.n_inter == 0 and r.intersect_est == 0
    # identical sets: jaccard exactly 1, intersection ~= set size
    r2 = kmv_intersect_estimate(sa, sa, k=k).collect()[0]
    assert r2.jaccard_fp == 1_000_000
    assert abs(r2.intersect_est - 400) < 0.25 * 400


def test_kmv_intersect_half_overlap(spark):
    from pos_data_insertion_etl_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_summary,
    )

    a = spark.createDataFrame([(f"x{i}",) for i in range(600)], "v string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(300, 900)], "v string"
    )
    k = 256
    r = kmv_intersect_estimate(
        kmv_summary(a, "v", k=k), kmv_summary(b, "v", k=k), k=k
    ).collect()[0]
    # true jaccard = 300/900 = 1/3; generous sketch envelope
    assert 180_000 < r.jaccard_fp < 500_000
    assert 150 < r.intersect_est < 500


def test_kmv_monitor_stream_e2e(spark, tmp_path):
    """Drive the STREAM flavor through a real Structured Streaming
    query (parquet source, availableNow): the checkpointed foreachBatch
    persists per-batch sketches and a restart re-ingests nothing --
    the merged estimate equals the direct single-pass sketch."""
    import pandas as pd

    from pos_data_insertion_etl_spark.operators.sketches import (
        kmv_estimate,
        kmv_summary,
    )
    from pos_data_insertion_etl_spark.streaming.jobs import (
        kmv_monitor_stream,
        load_kmv_distinct,
    )

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"v": [f"u{i}" for i in range(500)]}).to_parquet(
        src / "b0.parquet"
    )
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    k = 128

    def run_once():
        stream = spark.readStream.schema("v string").parquet(str(src))
        q = kmv_monitor_stream(stream, store, ckpt, "v", k=k).start()
        q.awaitTermination()

    run_once()
    # second file lands; restart picks up ONLY the new batch
    pd.DataFrame({"v": [f"w{i}" for i in range(300)]}).to_parquet(
        src / "b1.parquet"
    )
    run_once()
    run_once()  # no new data: restart is a no-op

    merged = load_kmv_distinct(spark, store, k=k).collect()[0]
    full = spark.createDataFrame(
        [(f"u{i}",) for i in range(500)] + [(f"w{i}",) for i in range(300)],
        "v string",
    )
    direct = kmv_estimate(kmv_summary(full, "v", k=k), k=k).collect()[0]
    assert merged.kth_hv == direct.kth_hv
    assert merged.distinct_est == direct.distinct_est


# ---------------------------------------------------------- IPF raking


def test_ipf_raking_converges_both_marginals(spark):
    from pos_data_insertion_etl_spark.operators.mixture import ipf_raking

    # 2x2 table heavily skewed; targets: rows 60/40, cols 50/50
    cells = spark.createDataFrame(
        [("en", "web", 80), ("en", "book", 10),
         ("fr", "web", 5), ("fr", "book", 5)],
        "lang string, src string, n long",
    )
    rt = spark.createDataFrame([("en", 60), ("fr", 40)], "lang string, t long")
    ct = spark.createDataFrame([("web", 50), ("book", 50)], "src string, t long")
    out = ipf_raking(cells, "lang", "src", rt, ct, iters=6)
    rows = out.collect()
    assert all(r.w_fp > 0 for r in rows)
    # weighted marginals within 2% of targets after 6 iterations
    wsum = {}
    for r in rows:
        wsum[r.row] = wsum.get(r.row, 0) + r.w_fp * r.n / 1_000_000
        wsum[r.col] = wsum.get(r.col, 0) + r.w_fp * r.n / 1_000_000
    assert abs(wsum["en"] - 60) < 2 and abs(wsum["fr"] - 40) < 2
    assert abs(wsum["web"] - 50) < 2 and abs(wsum["book"] - 50) < 2


def test_ipf_raking_identity_when_already_balanced(spark):
    from pos_data_insertion_etl_spark.operators.mixture import ipf_raking

    cells = spark.createDataFrame(
        [("a", "x", 10), ("a", "y", 10), ("b", "x", 10), ("b", "y", 10)],
        "r string, c string, n long",
    )
    rt = spark.createDataFrame([("a", 20), ("b", 20)], "r string, t long")
    ct = spark.createDataFrame([("x", 20), ("y", 20)], "c string, t long")
    out = ipf_raking(cells, "r", "c", rt, ct, iters=2).collect()
    assert all(r.w_fp == 1_000_000 for r in out)  # exact fixed point


# -------------------------------------------------------- code switch


def test_code_switch_detects_mixed_doc(spark):
    from pos_data_insertion_etl_spark.operators.quality import (
        code_switch_report,
    )

    en = "the cat is in the house and a dog " * 3          # ~30 en tokens
    fr = "le chat est un animal et les chiens des " * 3    # ~30 fr tokens
    docs = spark.createDataFrame(
        [(1, en + fr), (2, en * 2), (3, "")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in code_switch_report(
        docs, "text", "doc_id", window_tokens=10).collect()}
    assert out[1].is_code_switched and out[1].n_langs >= 2
    assert not out[2].is_code_switched
    assert out[2].majority_lang == "en"
    assert out[2].majority_share_fp == 1_000_000
    assert 3 not in out  # empty doc drops (no tokens)


def test_code_switch_window_count_and_tail(spark):
    from pos_data_insertion_etl_spark.operators.quality import (
        code_switch_report,
    )

    # 25 tokens at window 10 -> 3 windows (tail window of 5)
    docs = spark.createDataFrame(
        [(1, " ".join(["the"] * 25))], "doc_id long, text string"
    )
    r = code_switch_report(docs, "text", "doc_id", window_tokens=10).collect()[0]
    assert r.n_windows == 3 and r.majority_lang == "en"


# --------------------------------------------------- encoding advisor


def test_encoding_advisor_on_lineitem(spark, sf_dir):
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.operators.sketches import (
        encoding_advisor,
    )

    li = load_table(spark, sf_dir, "lineitem")
    out = {r.column: r for r in encoding_advisor(
        li, ["l_returnflag", "l_orderkey"], k=256).collect()}
    # 3ish flag values -> dictionary; near-unique orderkey -> plain
    assert out["l_returnflag"].recommend_dictionary
    assert out["l_returnflag"].distinct_est < 10
    assert not out["l_orderkey"].recommend_dictionary
    assert out["l_orderkey"].distinct_ratio_fp > 100_000
    assert all(r.n_rows == li.count() for r in out.values())
