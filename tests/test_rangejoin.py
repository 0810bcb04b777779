"""Binned range join operator (operators/rangejoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.rangejoin import binned_range_join


def _brute(points, intervals):
    return {
        (p, lo, hi, tag)
        for p in points
        for (lo, hi, tag) in intervals
        if lo <= p < hi
    }


def test_binned_matches_brute_force(spark):
    points = [0.0, 4.9, 5.0, 24.99, 25.0, 49.0, 120.0, 560.0]
    intervals = [(0.0, 25.0, "a"), (25.0, 50.0, "b"), (5.0, 130.0, "c"),
                 (120.0, 1e18, "open")]
    pdf = spark.createDataFrame([(v,) for v in points], "v double")
    idf = spark.createDataFrame(intervals, "lo double, hi double, tag string")
    got = {
        (r.v, r.lo, r.hi, r.tag)
        for r in binned_range_join(pdf, "v", idf, "lo", "hi", 10.0).collect()
    }
    assert got == _brute(points, intervals)


def test_binned_plan_is_equi_join_only(spark):
    pdf = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    idf = spark.createDataFrame([(0.0, 5.0, "a")], "lo double, hi double, tag string")
    out = binned_range_join(pdf, "v", idf, "lo", "hi", 1.0, domain_max=5.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_binned_empty_points(spark):
    pdf = spark.createDataFrame([], "v double")
    idf = spark.createDataFrame([(0.0, 5.0, "a")], "lo double, hi double, tag string")
    assert binned_range_join(pdf, "v", idf, "lo", "hi", 1.0).count() == 0


def test_binned_rejects_bad_width(spark):
    pdf = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="bin_width"):
        binned_range_join(pdf, "v", pdf, "v", "v", 0.0)


def test_binned_interval_boundary_at_bin_edge(spark):
    """hi exactly on a bin edge must stay exclusive."""
    pdf = spark.createDataFrame([(10.0,)], "v double")
    idf = spark.createDataFrame([(0.0, 10.0, "a"), (10.0, 20.0, "b")],
                                "lo double, hi double, tag string")
    got = {r.tag for r in binned_range_join(pdf, "v", idf, "lo", "hi", 10.0).collect()}
    assert got == {"b"}


def test_binned_far_future_sentinel_interval(spark):
    """An interval entirely ABOVE the point max (a far-future or
    sentinel lo) must be pre-filtered, not binned: before the fix,
    clamping produced hi_clamped < lo and F.sequence generated a
    descending run replicating the interval into ~lo/width bins --
    enough to overflow Spark's array limit. With width=1.0 and
    lo=4e9 this test would fail outright without the pre-filter."""
    pdf = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    idf = spark.createDataFrame(
        [(0.0, 5.0, "live"), (4.0e9, 1.0e18, "future"), (3.0, 3.0, "empty"),
         (7.0, 2.0, "inverted")],
        "lo double, hi double, tag string",
    )
    rows = binned_range_join(pdf, "v", idf, "lo", "hi", 1.0).collect()
    assert {(r.v, r.tag) for r in rows} == {(1.0, "live"), (2.0, "live")}
