"""Per-operator unit tests for round-7 batch K (q227-q231) -- the
evidence the end-of-round snapshot shipped without (VERDICT r7 item 2).
Each test pins the operator's exact-integer contract on a tiny
hand-built frame where the expected output is computable by hand,
independent of the registry oracles."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.multimodal.binary_ops import (
    audio_zero_crossings,
)
from pos_data_insertion_etl_spark.multimodal.wav_codec import encode_wav
from pos_data_insertion_etl_spark.operators.graph import (
    HITS_SCALE,
    hits_scores,
    mutual_knn_pairs,
)
from pos_data_insertion_etl_spark.operators.itemsets import (
    association_rules,
)
from pos_data_insertion_etl_spark.operators.timeseries import (
    centered_moving_trend,
)

# ------------------------------------------------------------- q227 HITS


def test_hits_star_graph_hub_and_authority(spark):
    """Star 0->{1,2,3}: node 0 is the only hub, 1/2/3 split authority
    evenly; total mass stays N * HITS_SCALE per score after every
    renormalization (up to per-node truncation of the fixed-point
    factor)."""
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    rows = {r.node: r for r in hits_scores(edges, iters=2).collect()}
    assert set(rows) == {0, 1, 2, 3}
    n_mass = 4 * HITS_SCALE
    # Truncating fixed-point renormalization loses O(N) units per
    # half-step (floor of the factor + floor per node), compounding
    # over iterations -- allow that slack, nothing more.
    slack = 4 * 2 * 4  # 4 units * iters * nodes, generous
    # Node 0 holds ALL hub mass; 1/2/3 split authority three ways.
    assert n_mass - slack <= rows[0].hub_fp <= n_mass
    assert rows[0].auth_fp == 0
    assert all(rows[i].hub_fp == 0 for i in (1, 2, 3))
    auths = {rows[i].auth_fp for i in (1, 2, 3)}
    assert len(auths) == 1  # exact symmetry survives truncation
    third = auths.pop()
    assert n_mass // 3 - slack <= third <= n_mass // 3


def test_hits_mass_conservation_and_determinism(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2)], "src long, dst long"
    )
    out1 = {
        (r.node, r.hub_fp, r.auth_fp)
        for r in hits_scores(edges, iters=3).collect()
    }
    out2 = {
        (r.node, r.hub_fp, r.auth_fp)
        for r in hits_scores(edges.repartition(5), iters=3).collect()
    }
    assert out1 == out2  # partition-invariant
    n_mass = 4 * HITS_SCALE
    hub_tot = sum(h for _, h, _ in out1)
    auth_tot = sum(a for _, _, a in out1)
    # truncating renormalization loses O(N) units per half-step,
    # compounding over iterations
    slack = 4 * 3 * 4  # units * iters * nodes
    assert n_mass - slack <= hub_tot <= n_mass
    assert n_mass - slack <= auth_tot <= n_mass


# ----------------------------------------------------- q228 mutual kNN


def test_mutual_knn_keeps_only_reciprocal_pairs(spark):
    # 1->2 and 2->1 are mutual; 1->3 is one-directional; 4->4 ignored
    # (self edges never canonicalize with id_a < id_b).
    g = spark.createDataFrame(
        [
            (1, 2, 0.9),
            (2, 1, 0.9),
            (1, 3, 0.8),
            (3, 2, 0.7),
            (4, 4, 1.0),
        ],
        "src_id long, dst_id long, cos_sim double",
    )
    rows = mutual_knn_pairs(g).collect()
    assert [(r.id_a, r.id_b, r.sim_ab, r.sim_ba) for r in rows] == [
        (1, 2, 0.9, 0.9)
    ]


def test_mutual_knn_emits_each_pair_once_with_both_sims(spark):
    g = spark.createDataFrame(
        [(7, 9, 0.5), (9, 7, 0.4), (9, 8, 0.3), (8, 9, 0.2)],
        "src_id long, dst_id long, cos_sim double",
    )
    rows = sorted(
        mutual_knn_pairs(g).collect(), key=lambda r: (r.id_a, r.id_b)
    )
    assert [(r.id_a, r.id_b) for r in rows] == [(7, 9), (8, 9)]
    by_pair = {(r.id_a, r.id_b): (r.sim_ab, r.sim_ba) for r in rows}
    assert by_pair[(7, 9)] == (0.5, 0.4)  # forward edge's sim first
    assert by_pair[(8, 9)] == (0.2, 0.3)


# ----------------------------------------------- q229 association rules


def test_association_rules_exact_confidence_and_lift(spark):
    # 4 baskets: {a,b} x2, {a} x1, {b,c} x1 -> n_baskets=4,
    # c_a=3, c_b=3, c_c=1, support(a,b)=2.
    rows_in = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows_in, "b long, i string")
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df, "b", "i", min_support=2).collect()
    }
    # Only a->b and b->a clear support >= 2 ({b,c} has support 1).
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    assert (ab.support, ab.c_a, ab.c_b) == (2, 3, 3)
    assert ab.conf_fp == 2 * 1_000_000 // 3  # 666666
    assert ab.lift_fp == (2 * 1_000_000 // 3) * 4 // 3  # 888888
    ba = out[("b", "a")]
    assert ba.conf_fp == 2 * 1_000_000 // 3  # symmetric counts here
    assert ba.lift_fp == ab.lift_fp


def test_association_rules_max_basket_guard_and_dedup(spark):
    # basket 1 exceeds max_basket -> excluded entirely; duplicate
    # (basket,item) rows collapse before counting.
    rows_in = (
        [(1, f"x{i}") for i in range(5)]
        + [(2, "a"), (2, "a"), (2, "b"), (3, "a"), (3, "b")]
    )
    df = spark.createDataFrame(rows_in, "b long, i string")
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            df, "b", "i", min_support=2, max_basket=4
        ).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    # duplicates collapsed: c_a = 2 (baskets 2,3), support = 2
    assert (ab.support, ab.c_a, ab.c_b) == (2, 2, 2)
    assert ab.conf_fp == 1_000_000
    assert ab.lift_fp == 1_000_000 * 2 // 2  # n_baskets=2 after guard


# ------------------------------------------- q230 centered moving trend


def test_centered_moving_trend_exact_frames(spark):
    import datetime as dt

    days = [dt.date(2024, 1, d) for d in range(1, 6)]
    ns = [10, 20, 30, 40, 50]
    df = spark.createDataFrame(list(zip(days, ns)), "day date, n long")
    out = {
        r.day: r
        for r in centered_moving_trend(df, "day", "n", half_window=1)
        .collect()
    }
    # interior day 2024-01-03: frame {20,30,40} -> trend 30000 exactly
    mid = out[dt.date(2024, 1, 3)]
    assert (mid.n_frame, mid.trend_milli, mid.detrended_milli) == (
        3, 30_000, 0,
    )
    # edge day shrinks to the available rows: frame {10,20}
    first = out[dt.date(2024, 1, 1)]
    assert first.n_frame == 2
    assert first.trend_milli == (10 + 20) * 1000 // 2
    assert first.detrended_milli == 10 * 1000 - first.trend_milli


def test_centered_moving_trend_truncating_division(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.date(2024, 2, 1), 1), (dt.date(2024, 2, 2), 2)],
        "day date, n long",
    )
    out = {
        r.day: r
        for r in centered_moving_trend(df, "day", "n", half_window=2)
        .collect()
    }
    # both frames are {1,2}: trend = 3000 div 2 = 1500 (exact div)
    assert all(r.trend_milli == 1500 for r in out.values())
    assert out[dt.date(2024, 2, 1)].detrended_milli == 1000 - 1500


# ----------------------------------------------------- q231 audio ZCR


def _wav_df(spark, samples_by_id: dict[int, np.ndarray]):
    rows = [
        (i, bytearray(encode_wav(s.astype(np.int16), 8000)))
        for i, s in samples_by_id.items()
    ]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_audio_zero_crossings_alternating_and_constant(spark):
    alt = np.array([1, -1] * 8)  # every adjacent pair crosses
    flat = np.full(16, 5)  # never crosses
    df = _wav_df(spark, {1: alt, 2: flat})
    out = {
        (r.doc_id, r.frame_idx): r
        for r in audio_zero_crossings(df, "doc_id", "content", 8).collect()
    }
    # 16 samples, frame_len 8 -> frames 0,1 with 7 within-frame pairs
    # each (the boundary pair 7->8 belongs to neither).
    assert set(out) == {(1, 0), (1, 1), (2, 0), (2, 1)}
    for f in (0, 1):
        assert (out[(1, f)].n_pairs, out[(1, f)].crossings) == (7, 7)
        assert out[(1, f)].zcr_fp == 1_000_000
        assert (out[(2, f)].n_pairs, out[(2, f)].crossings) == (7, 0)
        assert out[(2, f)].zcr_fp == 0


def test_audio_zero_crossings_zero_sample_never_crosses(spark):
    # strict sign change: [-3, 0, 3] has NO crossing (products are 0),
    # [-3, 3] has exactly one.
    df = _wav_df(
        spark,
        {1: np.array([-3, 0, 3, -3]), 2: np.array([-3, 3, -3, 3])},
    )
    out = {
        r.doc_id: r
        for r in audio_zero_crossings(df, "doc_id", "content", 4).collect()
    }
    assert (out[1].n_pairs, out[1].crossings) == (3, 1)  # only 3->-3
    assert (out[2].n_pairs, out[2].crossings) == (3, 3)
