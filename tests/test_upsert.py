"""MERGE-style upsert operator (operators/upsert.py)."""

from __future__ import annotations

import pytest

from pos_data_insertion_etl_spark.operators.upsert import upsert


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_upsert_replaces_inserts_and_passes_through(spark):
    target = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    updates = _df(spark, [(2, "B"), (4, "D")])
    got = {(r.k, r.v) for r in upsert(target, updates, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_upsert_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 20)], "k int, k2 string, v int"
    )
    updates = spark.createDataFrame([(1, "y", 99)], "k int, k2 string, v int")
    got = {tuple(r) for r in upsert(target, updates, ["k", "k2"]).collect()}
    assert got == {(1, "x", 10), (1, "y", 99)}


def test_upsert_rejects_schema_mismatch(spark):
    target = _df(spark, [(1, "a")])
    updates = spark.createDataFrame([(1, "a", 0)], "k int, v string, extra int")
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert(target, updates, ["k"])


def test_upsert_rejects_unknown_key(spark):
    target = _df(spark, [(1, "a")])
    with pytest.raises(ValueError, match="keys not in schema"):
        upsert(target, target, ["nope"])
