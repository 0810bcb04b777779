"""asof_join unit semantics: tie determinism and reserved-name guard
(the end-to-end path is oracled as q43)."""

from __future__ import annotations

import pytest

from pos_data_insertion_etl_spark.operators.asof import asof_join


def test_asof_equal_ts_peers_deterministic(spark):
    """Several right rows at the same (key, ts): the greatest carried
    tuple wins, every run."""
    left = spark.createDataFrame([(1, 10), (1, 20)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "c"), (1, 10, "b"), (1, 15, "z")],
        "k int, t int, v string",
    )
    for _ in range(3):
        out = {
            (r.k, r.t): r.v_asof
            for r in asof_join(
                left, right, ["k"], "t", "t", {"v": "v_asof"}
            ).collect()
        }
        # left t=20 sees the t=15 row; left t=10 sees the max of the ties
        assert out == {(1, 10): "c", (1, 20): "z"}


def test_asof_reserved_name_clash_raises(spark):
    left = spark.createDataFrame([(1, 10, 0)], "k int, t int, _side int")
    right = spark.createDataFrame([(1, 5, "x")], "k int, t int, v string")
    with pytest.raises(ValueError, match="_side"):
        asof_join(left, right, ["k"], "t", "t", {"v": "v_asof"})
