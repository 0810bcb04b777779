"""Round-11 guard fixes (ADVICE r10, all four items).

* make_sf1_benchdata._copy_text leaves copy 0 verbatim, so sf1.0's
  word-length/gate metrics really are 10x sf0.1 (copies 1..K-1 stay
  prefix-decorrelated and disjoint);
* smallframe.values_frame parses parameterized/nested DDL types
  (decimal(10,2), array<...>, map<k,v>) by splitting only on
  top-level commas, and rejects unbalanced brackets loudly;
* gopher_quality_flags(keep_input=True) raises when an input column
  collides with a metric/flag column instead of emitting duplicate
  names that a later drop() silently eats;
* the conftest smoke/full split can't rot: every _FULL_MODULES entry
  must still exist as a test module.
"""

from __future__ import annotations

import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.quality import (
    GOPHER_METRIC_COLS,
    gopher_quality_flags,
)
from pos_data_insertion_etl_spark.smallframe import (
    _split_top_level,
    values_frame,
)

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TESTS_DIR)


# --------------------------------------------------------------------
# sf1.0 generator: copy 0 is verbatim
# --------------------------------------------------------------------

def test_sf1_copy_zero_text_is_identity(spark):
    import sys

    sys.path.insert(0, os.path.join(_REPO_ROOT, "tools"))
    from make_sf1_benchdata import _copy_text

    df = spark.createDataFrame(
        [("the quick brown fox", ), ("a  b", ), ("", )], "text string"
    )
    got = [r.text for r in df.select(_copy_text(0)).collect()]
    assert got == ["the quick brown fox", "a  b", ""]
    # copies > 0 still prefix non-stopword tokens (disjoint shingles)
    got1 = [r.text for r in df.select(_copy_text(1)).collect()]
    assert got1 == ["the c1quick c1brown c1fox", "a  c1b", ""]
    # and distinct copies stay disjoint from each other
    got2 = [r.text for r in df.select(_copy_text(2)).collect()]
    assert got2[0] == "the c2quick c2brown c2fox"


# --------------------------------------------------------------------
# values_frame: nested / parameterized DDL types
# --------------------------------------------------------------------

def test_split_top_level_handles_nested_types():
    assert _split_top_level("a int, b decimal(10,2)") == [
        "a int",
        " b decimal(10,2)",
    ]
    assert _split_top_level(
        "x array<struct<a int, b int>>, y map<string,int>, z string"
    ) == ["x array<struct<a int, b int>>", " y map<string,int>", " z string"]


def test_split_top_level_rejects_unbalanced():
    with pytest.raises(ValueError, match="unbalanced"):
        _split_top_level("a decimal(10,2")
    with pytest.raises(ValueError, match="unbalanced"):
        _split_top_level("x array<int>>, y int")


def test_values_frame_decimal_schema(spark):
    df = values_frame(
        spark,
        [(1, 1.5, "x"), (2, None, "y")],
        "k bigint, amt decimal(10,2), tag string",
    )
    assert [f.simpleString() for f in df.schema.fields] == [
        "k:bigint",
        "amt:decimal(10,2)",
        "tag:string",
    ]
    rows = {r.k: (r.amt, r.tag) for r in df.collect()}
    assert rows[1] == (Decimal("1.50"), "x")
    assert rows[2] == (None, "y")


# --------------------------------------------------------------------
# gopher_quality_flags keep_input collision guard
# --------------------------------------------------------------------

def test_gopher_keep_input_rejects_metric_collision(spark):
    df = spark.createDataFrame(
        [(1, "some document text here", 7)],
        "doc_id bigint, text string, n_words int",
    )
    with pytest.raises(ValueError, match="n_words"):
        gopher_quality_flags(df, keep_input=True)


def test_gopher_keep_input_still_works_without_collision(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog", 42)],
        "doc_id bigint, text string, extra int",
    )
    out = gopher_quality_flags(df, keep_input=True, min_words=3)
    assert "extra" in out.columns
    assert set(GOPHER_METRIC_COLS) <= set(out.columns)
    # default (audit) path never collides: id + metrics only
    audit = gopher_quality_flags(
        df.withColumnRenamed("extra", "n_words_src")
    )
    assert audit.columns[0] == "doc_id"


def test_gopher_default_path_unaffected_by_metric_named_input(spark):
    # keep_input=False projects only id_col + metrics, so an input
    # column named like a metric is fine there.
    df = spark.createDataFrame(
        [(1, "word " * 60, 9)], "doc_id bigint, text string, n_words int"
    )
    out = gopher_quality_flags(df)
    assert out.columns.count("n_words") == 1


# --------------------------------------------------------------------
# smoke/full module set can't rot
# --------------------------------------------------------------------

def test_full_modules_all_exist():
    from tests.conftest import _FULL_MODULES

    missing = sorted(
        m for m in _FULL_MODULES
        if not os.path.exists(os.path.join(_TESTS_DIR, f"{m}.py"))
    )
    assert missing == [], (
        f"_FULL_MODULES entries with no test module: {missing}; "
        "remove stale names (and remember: NEW heavy modules must be "
        "added to _FULL_MODULES or they silently land in smoke)"
    )
