"""values_frame: JVM-literal small frames (r10 perf fix -- a
Python-backed 1-row local relation costs ~5 s per parquet write)."""

from __future__ import annotations

import math

import pytest

from pos_data_insertion_etl_spark.smallframe import values_frame


def test_schema_matches_createdataframe(spark):
    ddl = "a long, b double, c string, d boolean, e int"
    rows = [(1, 2.5, "x", True, 7), (None, None, None, None, None)]
    vf = values_frame(spark, rows, ddl)
    cf = spark.createDataFrame(rows, ddl)
    assert vf.schema == cf.schema
    assert sorted(map(tuple, vf.collect()), key=str) == sorted(
        map(tuple, cf.collect()), key=str
    )


def test_hostile_strings_roundtrip(spark):
    rows = [
        ("it's a 'quote'", 1),
        ("back\\slash and \\n literal", 2),
        ("real\nnewline\ttab", 3),
        ("unicode 当稼動日 … •", 4),
        ("", 5),
        ("-- sql comment; DROP TABLE x; VALUES (", 6),
    ]
    got = {
        (r.s, r.n)
        for r in values_frame(spark, rows, "s string, n long").collect()
    }
    assert got == set(rows)


def test_float_specials(spark):
    rows = [(float("nan"),), (float("inf"),), (float("-inf"),), (1.5,)]
    vals = [
        r.x for r in values_frame(spark, rows, "x double").collect()
    ]
    assert any(math.isnan(v) for v in vals)
    assert float("inf") in vals and float("-inf") in vals and 1.5 in vals


def test_empty_rows(spark):
    df = values_frame(spark, [], "a long, b string")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_row_cap(spark):
    with pytest.raises(ValueError, match="cap"):
        values_frame(spark, [(i,) for i in range(100_001)], "a long")


def test_plan_is_jvm_local_relation(spark):
    """The whole point: no Python evaluation node anywhere in the plan."""
    df = values_frame(spark, [(1, "x")], "a long, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
