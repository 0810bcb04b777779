"""connected_components method="auto" -- the round-12 mid-stream
jump->stars switch (VERDICT r11 item 1: make the giant-component-safe
CC the code path, not the docstring).

Pins three things:

1. the switch is CORRECT: forced early hand-offs agree exactly with
   driver union-find on random graphs and on the shape where labels
   ALONE would disconnect a component (a star whose center converges
   before its leaves -- the reason _switch_to_stars unions original
   edges with the shortcuts);
2. the switch FIRES when it should (long-diameter graph, tight knobs)
   and does NOT fire on quick-converging graphs -- observed via a
   monkeypatched _switch_to_stars, not timing;
3. method="jump" preserves the pre-r12 behavior bit for bit (including
   the non-convergence RuntimeError), so q88-style measurements remain
   reproducible.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators import graph
from pos_data_insertion_etl_spark.operators.graph import (
    _driver_union_find,
    connected_components,
    connected_components_stars,
)


def _labels(df) -> dict[int, int]:
    return {int(r.node): int(r.component) for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


@pytest.mark.parametrize("rounds", [1, 2, 3])
@pytest.mark.parametrize("seed,n_nodes,n_edges", [(3, 40, 30), (17, 60, 80)])
def test_forced_switch_matches_union_find(spark, rounds, seed, n_nodes, n_edges):
    """Hand-off after 1/2/3 jump rounds -- every switch timing must
    yield the same components (the property that makes auto-tuning the
    switch point safe)."""
    rng = random.Random(seed)
    pairs = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(n_edges)
    ]
    got = _labels(
        connected_components(
            _edges_df(spark, pairs),
            driver_threshold=0,
            skew_switch_rounds=rounds,
        )
    )
    assert got == _driver_union_find(pairs)


def test_switch_on_star_center_shape(spark):
    """After one jump round on a star 1-5, 2-5, 3-5, only the center
    holds a non-self label (5 -> 1); leaves 2 and 3 still label
    themselves. A hand-off that fed stars the label edges ALONE would
    split {1,2,3,5} into {1,5},{2},{3} -- the union with the original
    edges keeps it whole. This is the regression test for that exact
    hazard."""
    pairs = [(1, 5), (2, 5), (3, 5), (7, 8)]
    got = _labels(
        connected_components(
            _edges_df(spark, pairs),
            driver_threshold=0,
            skew_switch_rounds=1,
        )
    )
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7, 8: 7}


def test_auto_switch_fires_on_long_diameter(spark, monkeypatch):
    """A 200-node path cannot converge in 3 jump rounds, so auto with
    skew_switch_rounds=3 must hand off -- observed by wrapping
    _switch_to_stars, and the result must still be the closed form."""
    calls = []
    real = graph._switch_to_stars
    monkeypatch.setattr(
        graph, "_switch_to_stars", lambda *a: calls.append(1) or real(*a)
    )
    path = spark.range(199).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    got = _labels(
        connected_components(path, driver_threshold=0, skew_switch_rounds=3)
    )
    assert calls == [1]
    assert got == {n: 0 for n in range(200)}


def test_auto_no_switch_on_quick_convergence(spark, monkeypatch):
    """Small components converge before the default switch round; the
    probe must not route them to stars (pointer jumping stays the fast
    path for the near-dup workload)."""
    monkeypatch.setattr(
        graph,
        "_switch_to_stars",
        lambda *a: (_ for _ in ()).throw(AssertionError("switched")),
    )
    pairs = [(0, 1), (1, 2), (4, 5), (7, 7)]
    got = _labels(
        connected_components(_edges_df(spark, pairs), driver_threshold=0)
    )
    assert got == {0: 0, 1: 0, 2: 0, 4: 4, 5: 4, 7: 7}


def test_frequency_trigger_fires(spark, monkeypatch):
    """skew_switch_threshold alone (rounds knob out of reach) must
    trigger once a label's frequency exceeds it: a 64-clique converges
    toward one 64-frequency label within two rounds."""
    calls = []
    real = graph._switch_to_stars
    monkeypatch.setattr(
        graph, "_switch_to_stars", lambda *a: calls.append(1) or real(*a)
    )
    pairs = [(i, j) for i in range(64) for j in range(i + 1, 64)]
    got = _labels(
        connected_components(
            _edges_df(spark, pairs),
            driver_threshold=0,
            skew_switch_threshold=10,
            skew_switch_rounds=30,
        )
    )
    assert calls == [1]
    assert got == {n: 0 for n in range(64)}


def test_method_jump_still_raises_on_nonconvergence(spark):
    path = spark.range(63).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            path, driver_threshold=0, max_iter=2, method="jump"
        )


def test_method_auto_falls_through_to_stars_at_max_iter(spark):
    """max_iter below the switch round: auto hands the progress to
    stars instead of raising."""
    path = spark.range(63).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    got = _labels(
        connected_components(
            path,
            driver_threshold=0,
            max_iter=2,
            skew_switch_rounds=10,
        )
    )
    assert got == {n: 0 for n in range(64)}


def test_method_stars_delegates(spark):
    pairs = [(9, 4), (4, 2), (30, 31)]
    df = _edges_df(spark, pairs)
    assert _labels(connected_components(df, method="stars")) == _labels(
        connected_components_stars(df)
    )


def test_method_validation(spark):
    with pytest.raises(ValueError, match="unknown method"):
        connected_components(_edges_df(spark, [(1, 2)]), method="bogus")


def test_jump_and_auto_agree_on_q88_shape(spark):
    """The q88 topology through both methods (jump converges before
    the default switch round there, but force an early hand-off too)."""
    ids = spark.range(90)
    chain = ids.filter(F.col("id") < 59).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    cross = ids.filter((F.col("id") >= 60) & (F.col("id") % 2 == 0)).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    edges = chain.union(cross)
    jump = _labels(
        connected_components(edges, driver_threshold=0, method="jump")
    )
    auto_forced = _labels(
        connected_components(edges, driver_threshold=0, skew_switch_rounds=1)
    )
    assert jump == auto_forced
