"""Unit tests for round-8 batch M operators (q242-q245; q240/q241's
ecdf_percentiles and categorical_kl are pinned in test_stats_ops.py):
matryoshka truncation audit, zlib compression gate, char-class
profile, Fano burstiness."""

from __future__ import annotations

import datetime as dt
import zlib

from pos_data_insertion_etl_spark.operators.projection import (
    matryoshka_truncation_report,
)
from pos_data_insertion_etl_spark.operators.quality import (
    char_class_profile,
    compression_gate,
)
from pos_data_insertion_etl_spark.operators.timeseries import (
    fano_burstiness,
)

# ------------------------------------------------- q242 matryoshka


def test_matryoshka_energy_exact(spark):
    # v1: energy entirely in the head; v2: split 1:3 head:tail.
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.1, 0.0, 0.1, 0.1]),
            (3, [0.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.vec_id: r
        for r in matryoshka_truncation_report(df, "vec_id", "embedding")
        .collect()
    }
    assert all(r.dim == 4 and r.keep_dims == 2 for r in out.values())
    r1 = out[1]
    assert r1.full_fp == 10_000**2 and r1.head_fp == 10_000**2
    assert r1.energy_ppm == 1_000_000
    r2 = out[2]
    assert r2.full_fp == 3 * 1000**2 and r2.head_fp == 1000**2
    assert r2.energy_ppm == 1_000_000 // 3
    assert out[3].full_fp == 0 and out[3].energy_ppm is None


def test_matryoshka_explicit_keep_dims(spark):
    df = spark.createDataFrame(
        [(1, [0.2, 0.2, 0.2])], "vec_id long, embedding array<float>"
    )
    r = matryoshka_truncation_report(
        df, "vec_id", "embedding", keep_dims=1
    ).collect()[0]
    assert r.keep_dims == 1
    assert r.energy_ppm == 1_000_000 // 3


# --------------------------------------------- q243 compression gate


def test_compression_gate_invariants_and_values(spark):
    redundant = "spam " * 200
    df = spark.createDataFrame(
        [(1, redundant), (2, "short"), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in compression_gate(df).collect()}
    for r in out.values():
        assert r.compressed_nonempty and r.bounded_overhead
        assert r.roundtrip_ok
    assert out[1].raw_bytes == 1000
    # value check against the library directly (level 6 default)
    assert out[1].compressed_bytes == len(
        zlib.compress(redundant.encode("utf-8"), 6)
    )
    # highly redundant text compresses far below 10%
    assert out[1].ratio_ppm < 100_000
    assert out[3].raw_bytes == 0 and out[3].ratio_ppm is None


# --------------------------------------------- q244 char-class profile


def test_char_class_profile_exact_counts(spark):
    df = spark.createDataFrame(
        [(1, "Ab1 c-2"), (2, "....")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in char_class_profile(df).collect()}
    r = out[1]  # A b 1 ' ' c - 2 -> 3 letters, 2 digits, 1 space, 1 other
    assert (r.n_chars, r.n_letters, r.n_digits, r.n_spaces, r.n_other) == (
        7, 3, 2, 1, 1,
    )
    assert r.letter_ppm == 3 * 1_000_000 // 7
    assert r.alnum_ppm == 5 * 1_000_000 // 7
    assert out[2].n_other == 4 and out[2].letter_ppm == 0


# ------------------------------------------------ q245 Fano burstiness


def test_fano_poisson_like_vs_bursty(spark):
    rows = []
    # steady: 4 events every day for 5 days -> variance 0, fano 0
    for d in range(1, 6):
        rows += [("steady", dt.datetime(2024, 5, d, 12, 0))] * 4
    # bursty: 10 on day 1, 1 on days 2-5 -> mean 2.8, var 12.96
    rows += [("bursty", dt.datetime(2024, 5, 1, 12, 0))] * 10
    for d in range(2, 6):
        rows += [("bursty", dt.datetime(2024, 5, d, 12, 0))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        r.grp: r
        for r in fano_burstiness(df, "event_type", "d", ts_col="ts")
        .collect()
    }
    s = out["steady"]
    assert (s.n_days, s.total, s.mean_milli, s.fano_ppm) == (
        5, 20, 4000, 0,
    )
    b = out["bursty"]
    assert (b.n_days, b.total) == (5, 14)
    # (n*sumsq - total^2)*1e6 div (n*total) = (5*104 - 196)*1e6 // 70
    assert b.fano_ppm == (5 * 104 - 196) * 1_000_000 // (5 * 14)
    assert b.fano_ppm > 1_000_000  # over-dispersed
