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


# ---------------------------------------------------------------------------
# q290: AQE hot-band skew split, driver-certified (plan-asserting)
# ---------------------------------------------------------------------------

_AQE_SKEW_ORACLE = """
WITH h AS (
  SELECT COUNT(*) AS n FROM documents WHERE doc_id % 5 <> 0
)
SELECT CAST(n AS BIGINT) AS n_hot,
       CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs
FROM h
"""


@query(
    "q290_aqe_skew_split",
    oracle=_AQE_SKEW_ORACLE,
    tags=("dedup", "lsh", "skew", "aqe", "plan-certified"),
)
def q290_aqe_skew_split(spark, sf_dir):
    """AQE skew-join splitting on a degenerate hot LSH band,
    DRIVER-CERTIFIED (the registered form of tests/test_lsh_skew.py;
    q275/q276/q277's plan-assertion pattern): 80% of documents share
    one band key -- the near-universal-shingle worst case -- and the
    band self-join must (a) produce exactly C(n_hot, 2) candidate
    pairs and (b) execute with `skew=true` on the final adaptive
    sort-merge join, with AQE's size thresholds scaled to test-data
    volume (the MECHANISM is identical at production sizes; only the
    byte thresholds differ). The function raises if the split did not
    engage, so the driver's green row certifies the adaptive plan
    shape, not just the values. Session confs are restored in a
    finally block; the returned frame is a JVM literal of the counted
    aggregate (the ~n^2/2 pair rows never leave the executors)."""
    from ..operators.dedup import lsh_candidate_pairs
    from ..smallframe import values_frame

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hot = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.lit("hotband-a").alias("h00"),
        F.lit("hotband-b").alias("h01"),
    )
    cold = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.concat(F.lit("cold0-"), F.col("doc_id")).alias("h00"),
        F.concat(F.lit("cold1-"), F.col("doc_id")).alias("h01"),
    )
    # Spread the signatures over many map tasks first: AQE splits a
    # skewed reduce partition along MAPPER boundaries, and the tiny
    # test parquet reads as 1-2 input splits, which would leave the hot
    # partition unsplittable however skewed it is. At production scale
    # the map side is naturally thousands of tasks; the repartition
    # reproduces that topology at test volume.
    sigs = hot.unionByName(cold).repartition(32)
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # scale AQE's skew thresholds to test volume; production keeps
        # the defaults -- the mechanism under test is identical
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # keep the self-join sort-merge: broadcast has no skew problem
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=2, band_size=2)
        total = pairs.agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs")
        )
        n_pairs = total.collect()[0].n_pairs
        plan = total._jdf.queryExecution().executedPlan().toString()
        if "isFinalPlan=true" not in plan or "skew=true" not in plan:
            raise AssertionError(
                "AQE skew split did not engage on the hot band:\n" + plan
            )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    n_hot = hot.count()  # bounded scalar; avoids a C(n,2) inversion
    # cross-check inside the engine: the pair count must BE C(n_hot, 2)
    if n_pairs != n_hot * (n_hot - 1) // 2:
        raise AssertionError(
            f"band self-join produced {n_pairs} pairs for {n_hot} hot "
            "docs -- the skew split changed values"
        )
    return values_frame(
        spark, [(int(n_hot), int(n_pairs))], "n_hot long, n_pairs long"
    )
