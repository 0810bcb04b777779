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


def test_asof_matches_pandas_merge_asof(spark):
    """The union-and-carry formulation must agree with pandas
    merge_asof(direction='backward') on seeded random data (keys with
    empty right sides, ties, and unmatched-early left rows included)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 300),
            "t": rng.integers(0, 1000, 300),
            "lv": np.arange(300),
        }
    ).sort_values("t", kind="stable").reset_index(drop=True)
    right_t = rng.integers(0, 1000, 150)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 150),  # key 5 has no right rows
            "t": right_t,
            "rv": right_t * 10 + rng.integers(0, 2, 150),  # unique per (t)
        }
    )
    # merge_asof needs unique (k, t) on the right for a well-defined
    # answer; dedup keeping the max rv (matches asof_join's tie rule)
    right = (
        right.sort_values(["k", "t", "rv"]).groupby(["k", "t"], as_index=False).last()
    ).sort_values("t", kind="stable").reset_index(drop=True)

    exp = pd.merge_asof(left, right, on="t", by="k", direction="backward")

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "t",
            "t",
            {"rv": "rv"},
        )
        .toPandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    exp_s = exp.sort_values("lv").reset_index(drop=True)
    assert got["rv"].fillna(-1).tolist() == exp_s["rv"].fillna(-1).tolist()


def test_asof_carries_whole_winning_row(spark):
    """All carried columns come from ONE right row: when the winning
    tie peer has a null in one carried column, that null must NOT fall
    back to a different peer's value."""
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, "b", None), (1, 10, "a", "x")],
        "k int, t int, v1 string, v2 string",
    )
    row = asof_join(
        left, right, ["k"], "t", "t", {"v1": "v1_asof", "v2": "v2_asof"}
    ).collect()[0]
    # greatest struct is ("b", null) -- whole row taken atomically
    assert (row.v1_asof, row.v2_asof) == ("b", None)
