"""Round-10 batch Y: the streaming watermark/late-data path as a
DRIVER-CERTIFIED oracle row (VERDICT r9 item 4 -- the last §2.2
category whose evidence was pytest-only).

q289 replays the events table through a REAL Structured Streaming
query (file source -> watermarked tumbling window -> append-mode
memory sink) in two deterministic micro-batches:

* batch 1 = every event from the second hour onward. Its max event
  time advances the watermark to ``max(ts) - 90 minutes``.
* batch 2 = the FIRST HOUR of events only -- every row now sits far
  behind the watermark, so Spark must drop all of them (their windows
  were already finalized/evictable: ``window_end <= watermark``).

The certified output is the append-mode emission at stream end. Its
closed form -- windows over batch-1 rows whose ``window_end <=
max(ts) - 90min`` -- is replayed exactly by the DuckDB oracle, so the
driver's hash certifies BOTH late-data semantics (a leaked batch-2 row
would surface the first-hour window, whose end is far below the
watermark and would therefore be emitted -> extra rows) AND the
append-mode emission horizon (an off-by-one watermark shifts which
top-of-range windows appear). The emission comparator was pinned
empirically before registration: a window whose end EQUALS the
watermark is emitted (<=, not <); the 90-minute delay keeps the
boundary ~27+ minutes away from any hour edge at every test SF, so
millisecond watermark flooring cannot flip a window.

Scale shape: the streamed plan is the engine's real ingest topology --
per-batch shuffle on (window, event_type) with partial aggregation
map-side and watermark-bounded state (only open windows live in the
state store, so state is O(windows-in-horizon x types), independent of
history length). The two-batch replay materializes the split to local
parquet once (bounded by the events table, bench-measured); a real
deployment reads files as they land and pays none of that.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ._helpers import dsum, sql_dsum
from .registry import query

_WM_LATE_ORACLE = f"""
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) + INTERVAL 1 HOUR AS cut,
         max(ts) - INTERVAL 90 MINUTE AS wm
  FROM events
)
SELECT date_trunc('hour', e.ts) AS window_start,
       e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('e.value')} AS total_value
FROM events e, bounds b
WHERE e.ts >= b.cut
  AND date_trunc('hour', e.ts) + INTERVAL 1 HOUR <= b.wm
GROUP BY 1, 2
"""


@query(
    "q289_watermark_late_data",
    oracle=_WM_LATE_ORACLE,
    tags=("streaming", "watermark", "late-data", "window_agg"),
)
def q289_watermark_late_data(spark, sf_dir):
    """Watermarked streaming aggregation with certified late-data
    drop: see module docstring for the two-batch replay design and
    what the oracle hash certifies."""
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"graft_wm_replay_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    stream_dir = os.path.join(root, "in")
    late_stage = os.path.join(root, "late")
    ckpt = os.path.join(root, "ckpt")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # One bounded scalar collect anchors the deterministic batch split.
    cut = ev.agg(
        (F.date_trunc("hour", F.min("ts")) + F.expr("INTERVAL 1 HOUR"))
        .alias("cut")
    ).collect()[0]["cut"]

    ev.filter(F.col("ts") >= F.lit(cut)).write.mode("overwrite").parquet(
        stream_dir
    )
    ev.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(late_stage)

    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "part-*.parquet")
        .parquet(stream_dir)
    )
    agg = (
        stream.withWatermark("ts", "90 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    sink = f"wm_late_{tag}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # batch 1: all on-time files in one trigger (no
        # maxFilesPerTrigger), advancing the watermark to max - 90min
        q.processAllAvailable()
        # batch 2: the first-hour file appears; every row is late
        for i, f in enumerate(os.listdir(late_stage)):
            if f.startswith("part-") and f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(late_stage, f),
                    os.path.join(stream_dir, f"part-late{i}.parquet"),
                )
        q.processAllAvailable()
    finally:
        q.stop()
    result = spark.table(sink).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return result
