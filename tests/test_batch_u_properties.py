"""Property-based contracts for the round-9 exact-integer operators.

Each property is a THEOREM of the algorithm, not a sampled
expectation, so any counterexample is a real bug:

* largest_remainder: sum(alloc) == budget exactly; every allocation is
  within one unit of its exact proportional share (the Hamilton-method
  guarantee); output is independent of input row order.
* theil_sen_slope: the median slope lies between the min and max
  pairwise slope; adding a constant to every y leaves the slope
  unchanged (shift equivariance of differences).
* sssp_bounded: distances are non-increasing in the round budget, and
  a seed-adjacent node's distance never exceeds its direct edge.

Example counts are kept small (Spark job per example); hypothesis
shrinks any failure to a minimal weight set.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pos_data_insertion_etl_spark.operators.apportion import (
    largest_remainder,
)
from pos_data_insertion_etl_spark.operators.graph import sssp_bounded
from pos_data_insertion_etl_spark.operators.stats import theil_sen_slope

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # CI-stable: same examples every run
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=8
    ).filter(lambda ws: sum(ws) > 0),
    budget=st.integers(min_value=1, max_value=100_000),
)
def test_largest_remainder_hamilton_guarantees(spark, weights, budget):
    rows = [(f"k{i:02d}", w) for i, w in enumerate(weights)]
    got = {
        r.key: r
        for r in largest_remainder(
            spark.createDataFrame(rows, "k string, w long"), "k", "w", budget
        ).collect()
    }
    total = sum(weights)
    assert sum(r.alloc for r in got.values()) == budget
    assert all(r.total_alloc == budget for r in got.values())
    for key, w in rows:
        exact = budget * w / total
        # Hamilton: alloc is floor(exact) or floor(exact) + 1
        assert got[key].alloc in (int(exact), int(exact) + 1), (
            key,
            w,
            budget,
            total,
        )


@_SETTINGS
@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=2, max_size=6
    ).filter(lambda ws: sum(ws) > 0)
)
def test_largest_remainder_row_order_invariant(spark, weights):
    rows = [(f"k{i}", w) for i, w in enumerate(weights)]
    a = largest_remainder(
        spark.createDataFrame(rows, "k string, w long"), "k", "w", 97
    ).collect()
    b = largest_remainder(
        spark.createDataFrame(rows[::-1], "k string, w long"), "k", "w", 97
    ).collect()
    assert {(r.key, r.alloc) for r in a} == {(r.key, r.alloc) for r in b}


@_SETTINGS
@given(
    ys=st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=2,
        max_size=6,
    ),
    shift=st.integers(min_value=-1_000_000, max_value=1_000_000),
)
def test_theil_sen_bounds_and_shift_equivariance(spark, ys, shift):
    pts = [(i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(pts, "x long, y long")
    row = theil_sen_slope(df, "x", "y").collect()[0]
    def tz_div(n: int, d: int) -> int:
        # Spark div / DuckDB // truncate toward zero; python // floors
        q = abs(n) // abs(d)
        return q if (n >= 0) == (d > 0) else -q

    slopes = [
        tz_div((y2 - y1) * 1000, x2 - x1)
        for (x1, y1) in pts
        for (x2, y2) in pts
        if x2 > x1
    ]
    assert min(slopes) <= row.slope_fp <= max(slopes)
    shifted = spark.createDataFrame(
        [(x, y + shift) for x, y in pts], "x long, y long"
    )
    row2 = theil_sen_slope(shifted, "x", "y").collect()[0]
    assert row2.slope_fp == row.slope_fp


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=10,
    ).filter(lambda es: any(s != d for s, d, _ in es))
)
def test_sssp_monotone_in_rounds_and_edge_bound(spark, edges):
    es = [(s, d, w) for s, d, w in edges if s != d]
    edf = spark.createDataFrame(es, "src long, dst long, w long")
    seeds = spark.createDataFrame([(es[0][0],)], "node long")
    d2 = {r.node: r.dist for r in sssp_bounded(edf, seeds, rounds=2).collect()}
    d4 = {r.node: r.dist for r in sssp_bounded(edf, seeds, rounds=4).collect()}
    for node, dist2 in d2.items():
        dist4 = d4[node]
        if dist2 != -1:
            assert dist4 != -1 and dist4 <= dist2, (node, dist2, dist4)
    # seed-adjacent bound: dist(dst) <= min direct edge weight from seed
    seed = es[0][0]
    direct = {}
    for s, d, w in es:
        if s == seed:
            direct[d] = min(direct.get(d, 10**9), w)
    for d, w in direct.items():
        assert d4[d] != -1 and d4[d] <= w, (d, w, d4[d])
