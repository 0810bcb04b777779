"""Round-10 batch Y: q289 watermark/late-data certification.

The oracle hash itself is covered by test_oracle_queries; these tests
pin the NON-VACUITY of the certification (the memory-rule that an
audit whose signal is absence must prove the absent thing would
otherwise appear) and the boundary margins the closed form relies on.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table
from pos_data_insertion_etl_spark.plans import all_queries


def test_late_batch_nontrivial_at_gate_sf(spark, sf_dir):
    """The first-hour (late) split must be non-empty at the driver's
    gate SF -- otherwise q289 would certify nothing about late drops."""
    ev = load_table(spark, sf_dir, "events")
    cut = ev.agg(
        (F.date_trunc("hour", F.min("ts")) + F.expr("INTERVAL 1 HOUR"))
        .alias("c")
    ).collect()[0]["c"]
    n_late = ev.filter(F.col("ts") < F.lit(cut)).count()
    assert n_late > 0


def test_late_windows_would_emit_if_leaked(spark, sf_dir):
    """The late rows' windows end far BELOW the final watermark: had
    Spark not dropped them, append mode would have emitted those
    windows -- so their absence in q289's output is a real signal."""
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    ).collect()[0]
    cut = row.mn.replace(
        minute=0, second=0, microsecond=0
    ) + dt.timedelta(hours=1)
    wm = row.mx - dt.timedelta(minutes=90)
    assert cut < wm, "events table too narrow for the q289 design"
    # and the emission boundary sits >1s from any hour edge (the
    # margin that makes ms-level watermark flooring irrelevant)
    into_hour = (wm.minute * 60 + wm.second) % 3600
    assert min(into_hour, 3600 - into_hour) > 1


def test_q289_output_has_both_horizons(spark, sf_smoke):
    """Output contains no first-hour window (late drop) and no window
    ending beyond max(ts) - 90min (emission horizon)."""
    reg = all_queries()
    out = reg["q289_watermark_late_data"].spark(spark, sf_smoke)
    ev = load_table(spark, sf_smoke, "events")
    row = ev.agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    ).collect()[0]
    cut = row.mn.replace(minute=0, second=0, microsecond=0) + dt.timedelta(
        hours=1
    )
    wm = row.mx - dt.timedelta(minutes=90)
    starts = [r.window_start for r in out.select("window_start").collect()]
    assert starts, "empty emission"
    assert all(s >= cut for s in starts)
    assert all(s + dt.timedelta(hours=1) <= wm for s in starts)
