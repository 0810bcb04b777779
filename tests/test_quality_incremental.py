"""Quality-report and incremental-rollup operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.incremental import (
    merge_rollups,
    partial_rollup,
)
from pos_data_insertion_etl_spark.operators.quality import quality_report


def test_quality_report_counts_injected_violations(spark):
    df = spark.createDataFrame(
        [(1, 10, "A"), (2, -5, "A"), (3, 200, "Z"), (None, 10, "A")],
        "k int, qty int, flag string",
    )
    dim = spark.createDataFrame([(1,), (2,)], "dim_k int")
    rep = quality_report(
        df,
        scan_rules=[
            ("k_not_null", F.col("k").isNull()),
            ("qty_range", (F.col("qty") < 0) | (F.col("qty") > 100)),
            ("flag_domain", ~F.col("flag").isin("A", "B")),
        ],
        ref_rules=[("k_in_dim", F.col("k") == F.col("dim_k"), dim)],
    )
    got = {r.rule: (r.n_violations, r.n_rows) for r in rep.collect()}
    assert got == {
        "k_not_null": (1, 4),
        "qty_range": (2, 4),
        "flag_domain": (1, 4),
        # null key + key 3 have no dim match
        "k_in_dim": (2, 4),
    }


def test_quality_report_requires_scan_rules(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="at least one scan rule"):
        quality_report(df, scan_rules=[])


def test_incremental_merge_equals_full_recompute(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.5), ("a", 2, 2.5), ("b", 3, 3.5), ("b", 4, 4.5)],
        "g string, part int, x double",
    )
    keys = ["g"]
    measures = {
        "cnt": F.count(F.lit(1)),
        "sx": F.sum(F.col("x").cast("decimal(18,2)")),
    }
    full = partial_rollup(df, keys, measures)
    parts = [
        partial_rollup(df.filter(F.col("part") <= 2), keys, measures),
        partial_rollup(df.filter(F.col("part") > 2), keys, measures),
    ]
    merged = merge_rollups(parts, keys, ["cnt", "sx"])
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_incremental_merge_handles_key_only_in_one_partial(spark):
    p1 = spark.createDataFrame([("a", 2)], "g string, cnt long")
    p2 = spark.createDataFrame([("b", 3)], "g string, cnt long")
    got = {tuple(r) for r in merge_rollups([p1, p2], ["g"], ["cnt"]).collect()}
    assert got == {("a", 2), ("b", 3)}


def test_merge_rollups_rejects_empty(spark):
    with pytest.raises(ValueError, match="nothing to merge"):
        merge_rollups([], ["g"], ["cnt"])


def test_quality_report_rule_names_are_data_not_sql(spark):
    """A quote (or any SQL metacharacter) in a rule name must not break
    or inject into the report query -- names are data, never SQL text."""
    df = spark.createDataFrame([(1,), (None,)], "k int")
    hostile = "k_isn't_null', r0) --"
    rep = quality_report(df, scan_rules=[(hostile, F.col("k").isNull())])
    got = {r.rule: (r.n_violations, r.n_rows) for r in rep.collect()}
    assert got == {hostile: (1, 2)}
