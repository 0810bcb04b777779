"""Unit tests for the round-7 batch I operators (q209-q217): BFS,
Markov transitions, seasonal residuals, chi2 association, rank/AUC
evaluation, and the heavy-hitter monitor replay contract."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.graph import bfs_distances
from pos_data_insertion_etl_spark.operators.scoring import (
    auc_rank_sum,
    rank_metrics,
)
from pos_data_insertion_etl_spark.operators.text_mining import (
    chi2_token_class,
)
from pos_data_insertion_etl_spark.operators.timeseries import (
    dow_seasonal_residuals,
    markov_transitions,
)


# ------------------------------------------------------------- q212 BFS


def test_bfs_distances_path_graph(spark):
    # undirected path 1-2-3-4-5, seed {1}: dist = hops, 5 unreached
    # at max_hops=3
    und = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: (r.dist, r.reached) for r in bfs_distances(
        edges, seeds, max_hops=3).collect()}
    assert got == {
        1: (0, True), 2: (1, True), 3: (2, True), 4: (3, True),
        5: (-1, False),
    }


def test_bfs_distances_multi_source_takes_min(spark):
    und = [(1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = {r.node: r.dist for r in bfs_distances(
        edges, seeds, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 0}


def test_bfs_seed_not_in_graph_is_ignored(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {r.node: r.dist for r in bfs_distances(
        edges, seeds, max_hops=1).collect()}
    assert got == {1: 0, 2: 1}  # 99 is not a node -> no row


# ------------------------------------------------- q213 Markov transitions


def test_markov_transitions_counts_and_probs(spark):
    rows = [
        # user 1: a -> b -> a   user 2: a -> b
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 4, "a"), (2, 5, "b"),
    ]
    df = spark.createDataFrame(
        [(u, datetime(2026, 1, 1, 0, 0, s), s, t) for u, s, t in rows],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    got = {(r.from_state, r.to_state): (r.n, r.prob_fp) for r in
           markov_transitions(
               df, "user_id", "event_type", ["ts", "event_id"]
           ).collect()}
    assert got == {("a", "b"): (2, 1_000_000), ("b", "a"): (1, 1_000_000)}


def test_markov_transitions_probs_sum_to_le_one(spark):
    ev = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 0, 0, i), i,
          "x" if i % 3 else "y") for i in range(30)],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = markov_transitions(ev, "user_id", "event_type", ["ts", "event_id"])
    sums = out.groupBy("from_state").agg(
        F.sum("prob_fp").alias("s"), F.count("*").alias("k")
    ).collect()
    for r in sums:
        # integer div truncation loses < 1 unit per row
        assert 1_000_000 - r.k < r.s <= 1_000_000


# --------------------------------------------- q216 seasonal residuals


def test_dow_seasonal_residuals_exact(spark):
    # two Mondays (5, 7) and one Tuesday (6): Monday mean 6.0
    daily = spark.createDataFrame(
        [(date(2026, 1, 5), 5), (date(2026, 1, 12), 7),
         (date(2026, 1, 6), 6)],
        "day date, n long",
    )
    got = {r.day: r for r in dow_seasonal_residuals(
        daily, "day", "n", anomaly_pct=10).collect()}
    mon1, mon2 = got[date(2026, 1, 5)], got[date(2026, 1, 12)]
    assert mon1.dow == mon2.dow
    assert mon1.dow_mean_milli == 6000
    assert mon1.resid_milli == -1000 and mon2.resid_milli == 1000
    # |resid| (1000) * 100 > 10 * 6000 -> anomalous both Mondays
    assert mon1.is_anomaly and mon2.is_anomaly
    assert not got[date(2026, 1, 6)].is_anomaly  # solo day: resid 0


# ------------------------------------------------ q214 chi2 association


def test_chi2_token_class_known_value(spark):
    # 4 docs: "hot" only in class docs, "base" everywhere-but-one
    docs = spark.createDataFrame(
        [
            (1, "hot base", "en"),
            (2, "hot base", "en"),
            (3, "base cold", "fr"),
            (4, "cold", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.token: r for r in chi2_token_class(
        docs, "text", F.col("lang") == "en", min_df_pct=25).collect()}
    # hot: a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4.0
    assert out["hot"].n_class == 2 and out["hot"].n_rest == 0
    assert out["hot"].chi2 == pytest.approx(4.0)
    # cold is the mirror image
    assert out["cold"].chi2 == pytest.approx(4.0)
    # base: a=2 b=1 c=0 d=1 -> chi2 = 4*(2-0)^2/(3*1*2*2) = 4/3
    assert out["base"].chi2 == pytest.approx(round(4 / 3, 6))


def test_chi2_excludes_everywhere_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "x", "en"), (2, "x", "fr")],
        "doc_id long, text string, lang string",
    )
    assert chi2_token_class(
        docs, "text", F.col("lang") == "en").count() == 0


# ------------------------------------------------- q215 rank metrics


def test_rank_metrics_fixture(spark):
    ranked = spark.createDataFrame(
        [
            ("q1", 1, False), ("q1", 2, True), ("q1", 3, False),
            ("q2", 1, False), ("q2", 2, False),
        ],
        "query string, rk long, is_rel boolean",
    )
    totals = spark.createDataFrame(
        [("q1", 4), ("q2", 0)], "query string, n_rel long"
    )
    got = {r.query: r for r in rank_metrics(
        ranked, "query", "rk", "is_rel", totals, p_k=2, r_k=3
    ).collect()}
    q1 = got["q1"]
    assert q1.first_rel_rank == 2 and q1.mrr_fp == 500_000
    assert q1.p_at_k_fp == 500_000  # 1 hit in top2
    assert q1.r_at_k_fp == 250_000  # 1 of 4 relevant
    q2 = got["q2"]
    assert q2.first_rel_rank == -1 and q2.mrr_fp == 0
    assert q2.r_at_k_fp == 0 and q2.n_rel == 0


# ------------------------------------------------------- q217 AUC


def test_auc_rank_sum_perfect_and_reversed(spark):
    perfect = spark.createDataFrame(
        [(1, False), (2, False), (3, True), (4, True)],
        "s long, y boolean",
    )
    r = auc_rank_sum(perfect, "s", "y").collect()[0]
    assert (r.npos, r.nneg) == (2, 2)
    assert r.auc_fp == 1_000_000
    reverse = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, False)],
        "s long, y boolean",
    )
    assert auc_rank_sum(reverse, "s", "y").collect()[0].auc_fp == 0


def test_auc_rank_sum_ties_average(spark):
    # one tie group straddling the classes: AUC = 0.5 exactly
    df = spark.createDataFrame(
        [(5, True), (5, False)], "s long, y boolean"
    )
    r = auc_rank_sum(df, "s", "y").collect()[0]
    assert r.auc_fp == 500_000
    # textbook mixed case: scores pos {3, 1}, neg {2}; pairs won 1,
    # lost 1 -> AUC 0.5
    df2 = spark.createDataFrame(
        [(3, True), (1, True), (2, False)], "s long, y boolean"
    )
    assert auc_rank_sum(df2, "s", "y").collect()[0].auc_fp == 500_000


# ------------------------------------- q211 heavy-hitter replay store


def test_heavyhitter_store_envelope_and_replay(spark, tmp_path):
    from pos_data_insertion_etl_spark.streaming.jobs import (
        heavyhitter_monitor_batch,
        load_heavyhitter_counts,
    )

    vals = ["a"] * 30 + ["b"] * 20 + [f"t{i}" for i in range(40)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    store = str(tmp_path / "hh")
    # split deterministically by first char
    b0 = df.filter(F.substring("v", 1, 1) != "t")
    b1 = df.filter(F.substring("v", 1, 1) == "t")
    for bid, b in [(0, b0), (1, b1), (1, b1)]:  # batch 1 replayed
        heavyhitter_monitor_batch(b, bid, store, "v", k=4)
    merged = {r.value: r for r in
              load_heavyhitter_counts(spark, store).collect()}
    exact = {r.v: r.c for r in df.groupBy("v").agg(
        F.count("*").alias("c")).collect()}
    # envelope contains the truth for every listed candidate
    for v, row in merged.items():
        assert row.count_min <= exact[v] <= row.count_max, v
    # the two guaranteed hitters (30/90 and 20/90 > 90/5) are present
    assert "a" in merged and "b" in merged
