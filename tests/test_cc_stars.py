"""connected_components_stars (alternating large-star/small-star) --
the giant-component-safe CC variant (round 11; q291).

Pinned against two independent references: the driver-side union-find
(the same ground truth the adaptive small-graph path uses) on seeded
random graphs and structured shapes, and the default pointer-jumping
implementation on the q88 topology (the two distributed algorithms
must agree exactly)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.graph import (
    _driver_union_find,
    connected_components,
    connected_components_stars,
)


def _labels(df) -> dict[int, int]:
    return {int(r.node): int(r.component) for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(7, 40, 30), (11, 60, 80)])
def test_stars_matches_union_find_on_random_graphs(
    spark, seed, n_nodes, n_edges
):
    rng = random.Random(seed)
    pairs = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(n_edges)
    ]
    got = _labels(connected_components_stars(_edges_df(spark, pairs)))
    want = _driver_union_find(pairs)
    # union-find covers nodes appearing in edges, incl. self-loop-only
    assert got == want


def test_stars_giant_path_plus_chains(spark):
    """The q291 shape at unit size: one long path + small chains."""
    ids = spark.range(120)
    path = ids.filter(F.col("id") < 99).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    chains = (
        ids.filter(F.col("id") >= 100)
        .filter((F.col("id") - 100) % 5 != 4)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    got = _labels(connected_components_stars(path.union(chains)))
    want = {k: 0 for k in range(100)}
    want.update({k: 100 + ((k - 100) // 5) * 5 for k in range(100, 120)})
    assert got == want


def test_stars_agrees_with_pointer_jumping_q88_topology(spark):
    ids = spark.range(200)
    chain = ids.filter(F.col("id") % 10 != 9).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    cross = spark.range(10).select(
        (F.col("id") * 10).alias("src"),
        (F.col("id") * 10 + 100).alias("dst"),
    )
    edges = chain.union(cross)
    stars = _labels(connected_components_stars(edges))
    jump = _labels(connected_components(edges, driver_threshold=0))
    assert stars == jump


def test_stars_self_loops_and_duplicates(spark):
    pairs = [(3, 3), (1, 2), (2, 1), (1, 2), (5, 5)]
    got = _labels(connected_components_stars(_edges_df(spark, pairs)))
    assert got == {1: 1, 2: 1, 3: 3, 5: 5}


def test_stars_single_edge_and_star_input(spark):
    assert _labels(
        connected_components_stars(_edges_df(spark, [(9, 4)]))
    ) == {4: 4, 9: 4}
    # already-stable star input converges in one checked round
    star = [(5, 1), (7, 1), (9, 1)]
    assert _labels(
        connected_components_stars(_edges_df(spark, star))
    ) == {1: 1, 5: 1, 7: 1, 9: 1}


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=25),
                st.integers(min_value=0, max_value=25),
            ),
            min_size=0,
            max_size=40,
        )
    )
    def test_stars_matches_union_find_property(spark, pairs):
        """Hypothesis contract: on ANY small graph (self loops,
        duplicates, disconnected nodes, empty), star contraction equals
        the driver union-find ground truth."""
        if not pairs:
            df = spark.createDataFrame([], "src long, dst long")
            assert connected_components_stars(df).count() == 0
            return
        got = _labels(connected_components_stars(_edges_df(spark, pairs)))
        assert got == _driver_union_find(pairs)


def test_stars_respects_reliable_checkpoint_conf(spark, tmp_path):
    """Result equality through the reliable-checkpoint path (the same
    contract pointer jumping honors -- lineage.cut_lineage routing)."""
    from pos_data_insertion_etl_spark.lineage import CONF_KEY

    pairs = [(i, i + 1) for i in range(30)] + [(50, 60), (60, 70)]
    base = _labels(connected_components_stars(_edges_df(spark, pairs)))
    spark.conf.set(CONF_KEY, str(tmp_path / "ckpt"))
    try:
        reliable = _labels(
            connected_components_stars(_edges_df(spark, pairs))
        )
    finally:
        spark.conf.set(CONF_KEY, "")
    assert reliable == base
