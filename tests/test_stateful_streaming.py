"""applyInPandasWithState: state carries across micro-batches."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pos_data_insertion_etl_spark.session import apply_runtime_confs
from pos_data_insertion_etl_spark.catalog import normalize_event_ts
from pos_data_insertion_etl_spark.streaming.jobs import running_user_totals


def test_running_totals_across_batches(spark, sf_smoke, tmp_path):
    """Two copies of the events file with maxFilesPerTrigger=1 => two
    micro-batches; the final state must be 2x the single-pass totals."""
    d = tmp_path / "events2"
    d.mkdir()
    shutil.copy(f"{sf_smoke}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_smoke}/events.parquet", d / "b.parquet")

    apply_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_smoke}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    stream = normalize_event_ts(stream)

    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode appends one row per (user, batch); keep the final state
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) AS rn FROM running_out)
               WHERE rn = 1"""
        ).collect()
    }
    q.stop()

    single = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    )
    exp = {r.user_id: (2 * r.n, round(2 * r.v, 2)) for r in single}
    assert got == exp


def test_running_totals_v2_across_batches(spark, sf_smoke, tmp_path):
    """transformWithStateInPandas (stateful v2) carries ValueState
    across micro-batches and matches the v1 operator's final state.

    The v2 driver-worker protocol needs google.protobuf; this container
    ships no protobuf distribution (and installs are off-limits), so
    compat.ensure_protobuf() activates the vendored cloudsdk redirect
    shim (conftest runs it before the session starts, as the workers
    need it on PYTHONPATH). Skips only if neither a real protobuf nor
    the shim is available."""
    import pytest

    from pos_data_insertion_etl_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("google.protobuf unavailable: v2 state runner cannot start")
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2 as _M
    except ImportError as exc:  # pragma: no cover - shim regression guard
        pytest.skip(f"StateMessage_pb2 import failed under protobuf shim: {exc}")
    # Wire-level sanity before paying for a streaming query: the 4.23
    # runtime must round-trip the 6.33-gencode messages.
    probe = _M.StateRequest(version=2)
    echo = _M.StateRequest()
    echo.ParseFromString(probe.SerializeToString())
    assert echo.version == 2
    from pos_data_insertion_etl_spark.streaming.jobs import (
        running_user_totals_v2,
    )

    # v2 state requires the RocksDB state store provider
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    d = tmp_path / "events_v2"
    d.mkdir()
    shutil.copy(f"{sf_smoke}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_smoke}/events.parquet", d / "b.parquet")

    apply_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_smoke}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    stream = normalize_event_ts(stream)

    q = (
        running_user_totals_v2(stream)
        .writeStream.format("memory")
        .queryName("running_v2_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) AS rn FROM running_v2_out)
               WHERE rn = 1"""
        ).collect()
    }
    q.stop()

    single = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    )
    exp = {r.user_id: (2 * r.n, round(2 * r.v, 2)) for r in single}
    if prior is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
    assert got == exp


def test_accumulate_user_totals_unit():
    """The state transition shared by v1 and v2 (accumulate_user_totals)
    is pure pandas, so its logic is verified even in environments where
    the v2 runtime (protobuf) cannot start: fresh key, carried state,
    multi-frame batches, empty batch, float accumulation."""
    import pandas as pd

    from pos_data_insertion_etl_spark.streaming.jobs import (
        accumulate_user_totals,
    )

    def frame(values):
        return pd.DataFrame({"user_id": [7] * len(values), "value": values})

    # fresh key: no prior state
    state, out = accumulate_user_totals((7,), None, [frame([1.5, 2.5])])
    assert state == (2, 4.0)
    assert out.to_dict("records") == [
        {"user_id": 7, "n_events": 2, "total_value": 4.0}
    ]

    # carried state + several frames in one micro-batch
    state, out = accumulate_user_totals(
        (7,), state, [frame([1.0]), frame([2.0, 3.0])]
    )
    assert state == (5, 10.0)
    assert out.to_dict("records") == [
        {"user_id": 7, "n_events": 5, "total_value": 10.0}
    ]

    # empty micro-batch: state unchanged but still emitted
    state, out = accumulate_user_totals((7,), state, [])
    assert state == (5, 10.0)
    assert out.loc[0, "n_events"] == 5


def test_inactive_sessions_v2_timers(spark, sf_smoke, tmp_path):
    """Event-time timers close sessions exactly once: batch 1 is the
    real events file, batches 2 and 3 are the same rows shifted +60 and
    +120 days (fresh state epochs that also advance the watermark far
    past every batch-1 session's last_ts + gap). Every batch-1 per-user
    session from a batch gaps-and-islands recomputation must be emitted
    with identical (start, end, count, total), with no duplicates."""
    import pytest

    from pos_data_insertion_etl_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("google.protobuf unavailable: v2 state runner cannot start")
    from pos_data_insertion_etl_spark.streaming.jobs import (
        inactive_user_sessions_v2,
    )

    gap_min = 30
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    apply_runtime_confs(spark)

    base = normalize_event_ts(spark.read.parquet(f"{sf_smoke}/events.parquet"))
    d = tmp_path / "sess_events"
    d.mkdir()
    # The file stream source needs plain FILES (a .write.parquet
    # directory-per-batch is not picked up); write each batch through a
    # scratch dir and copy out its single part file.
    import glob as globmod

    for i, days in enumerate((0, 60, 120), start=1):
        df = (
            base
            if days == 0
            else base.withColumn(
                "ts", F.col("ts") + F.expr(f"interval {days} days")
            )
        )
        scratch = tmp_path / f"scratch{i}"
        df.repartition(1).write.parquet(str(scratch))
        shutil.copy(
            globmod.glob(str(scratch / "part-*.parquet"))[0],
            d / f"b{i}.parquet",
        )

    schema = spark.read.parquet(str(d / "b1.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        inactive_user_sessions_v2(stream, gap_minutes=gap_min)
        .writeStream.format("memory")
        .queryName("sessions_v2_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    emitted = spark.sql("SELECT * FROM sessions_v2_out").collect()
    q.stop()
    if prior is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)

    got = {}
    for r in emitted:
        key = (r.user_id, r.session_start)
        assert key not in got, f"duplicate session emission: {key}"
        got[key] = (r.session_end, r.n_events, round(r.total_value, 2))

    # Batch recomputation of batch-1 sessions (gaps and islands).
    sess = (
        base.select("user_id", "ts", "value")
        .withColumn(
            "prev",
            F.lag("ts").over(
                W.partitionBy("user_id").orderBy("ts")
            ),
        )
        .withColumn(
            "new_s",
            (
                F.col("prev").isNull()
                | (
                    F.col("ts").cast("long") - F.col("prev").cast("long")
                    > gap_min * 60
                )
            ).cast("int"),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                W.partitionBy("user_id").orderBy("ts")
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    )
    assert sess, "batch recomputation produced no sessions"
    for r in sess:
        key = (r.user_id, r.session_start)
        assert key in got, f"missing session {key}"
        end, n, tot = got[key]
        assert (end, n, tot) == (
            r.session_end,
            r.n_events,
            round(r.total_value, 2),
        ), key


def test_inactive_sessions_v2_late_data_boundaries(spark, tmp_path):
    """ADVICE r5: in-watermark late events must reshape the carried
    session correctly. Batch 2 delivers (a) an event 1 minute BEFORE
    the carried session's start -> session_start must move DOWN, and
    (b) an event far before the open session (but inside the watermark)
    that is more than `gap` away on both sides -> it must close as its
    OWN session, not merge. The old sweep got both wrong (start never
    lowered; gap-before events folded in)."""
    import glob as globmod
    import shutil

    import pytest

    from pos_data_insertion_etl_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("google.protobuf unavailable: v2 state runner cannot start")
    from pos_data_insertion_etl_spark.streaming.jobs import (
        inactive_user_sessions_v2,
    )

    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def ts(minute):
        return f"2024-01-01 {minute // 60:02d}:{minute % 60:02d}:00"

    batches = [
        # batch 1: open session at minute 100
        [(1, ts(100), 1.0)],
        # batch 2: minute 99 (merge, lowers start), minute 50 (own
        # closed session; > gap before the carried one, inside the
        # 60-minute watermark: wm after batch 1 = 100 - 60 = 40)
        [(1, ts(99), 2.0), (1, ts(50), 4.0)],
        # batch 3: far future event advances the watermark past
        # 100 + gap so the carried [99,100] session closes via timer
        [(1, ts(1000), 8.0)],
    ]
    d = tmp_path / "late_events"
    d.mkdir()
    for i, rows in enumerate(batches, start=1):
        df = spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).select(
            "user_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "value",
        )
        scratch = tmp_path / f"late_scratch{i}"
        df.repartition(1).write.parquet(str(scratch))
        shutil.copy(
            globmod.glob(str(scratch / "part-*.parquet"))[0],
            d / f"b{i}.parquet",
        )

    schema = spark.read.parquet(str(d / "b1.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        inactive_user_sessions_v2(
            stream, gap_minutes=5, watermark="60 minutes"
        )
        .writeStream.format("memory")
        .queryName("sessions_v2_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    q.stop()
    if prior is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)

    got = {
        (r.session_start.minute + 60 * r.session_start.hour,
         r.session_end.minute + 60 * r.session_end.hour): (
            r.n_events, r.total_value,
        )
        for r in spark.sql("SELECT * FROM sessions_v2_late").collect()
    }
    assert got[(50, 50)] == (1, 4.0), got      # own session, not merged
    assert got[(99, 100)] == (2, 3.0), got     # start lowered to 99
