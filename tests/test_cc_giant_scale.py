"""The round-11 giant-component DNF shape, through the PUBLIC default
API (VERDICT r11 item 1 "done" criterion).

A 3M-node single path through plain ``connected_components(edges,
driver_threshold=0)`` -- the exact shape and call that measurably DNF'd
(>550 s, (31+1)/32 straggler per stage) when pointer jumping ran to
convergence. With the round-12 auto-route the loop hands off to star
contraction after ``skew_switch_rounds`` unconverged rounds and the
whole run completes in ~150 s on this box (measured 2026-08-15,
local[32]; stars-direct is ~124 s, so the 8 jump rounds cost ~26 s and
their shortcuts are carried, not discarded).

The wall bound is deliberately loose (2.8x the measured value) -- it is
a DNF tripwire, not a benchmark; BENCH_DETAIL tracks real timings.
Full-marked via conftest._FULL_MODULES (~2.5 min).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.graph import connected_components

_N = int(os.environ.get("SPARK_GRAFT_CC_GIANT_N", "3000000"))
_WALL_BOUND_SEC = float(os.environ.get("SPARK_GRAFT_CC_GIANT_WALL", "420"))


def test_default_api_completes_giant_path(spark):
    path = spark.range(_N - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    t0 = time.perf_counter()
    cc = connected_components(path, driver_threshold=0)
    mislabeled = cc.filter(F.col("component") != 0).count()
    rows = cc.count()
    wall = time.perf_counter() - t0
    assert mislabeled == 0
    assert rows == _N
    assert wall < _WALL_BOUND_SEC, (
        f"giant-path CC took {wall:.0f}s (bound {_WALL_BOUND_SEC}s) -- "
        "the auto-route to star contraction may have regressed"
    )
