"""Streaming tier: windowed aggregates must equal their batch
recomputation (SURVEY.md §5); checkpointed ingest is exactly-once
across restarts."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table, normalize_event_ts
from pos_data_insertion_etl_spark.streaming.jobs import (
    hourly_event_counts,
    pos_stream_ingest,
    read_events_stream,
    session_event_stats,
    read_events_stream as _res,  # noqa: F401
    streaming_dedup,
)

from .pos_fixture import build_fixture, write_zip


def _run_to_memory(stream_df, name, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_hourly_window_matches_batch(spark, sf_smoke):
    ev_stream = read_events_stream(spark, sf_smoke)
    q = _run_to_memory(
        hourly_event_counts(ev_stream), "hourly_out", output_mode="complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 2))
        for r in spark.sql("SELECT * FROM hourly_out").collect()
    }
    q.stop()

    ev = load_table(spark, sf_smoke, "events")
    exp = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 2))
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events",
            "total_value",
        )
        .collect()
    }
    assert got == exp


def test_session_window_matches_gaps_islands(spark, sf_smoke):
    ev_stream = read_events_stream(spark, sf_smoke)
    q = _run_to_memory(
        session_event_stats(ev_stream), "session_out", output_mode="complete"
    )
    got = collections.Counter()
    for r in spark.sql("SELECT * FROM session_out").collect():
        got[r.user_id] += 1
    q.stop()

    # batch gaps-and-islands session count per user (q40 logic)
    from pos_data_insertion_etl_spark.plans.pos_ops import q40_sessionize

    exp = collections.Counter()
    for r in q40_sessionize(spark, sf_smoke).collect():
        exp[r.user_id] = max(exp[r.user_id], r.session_id)
    assert got == dict(exp)


def test_streaming_dedup(spark, sf_smoke, tmp_path):
    """Duplicate the source file -> dropDuplicatesWithinWatermark keeps
    one copy of each event_id."""
    import shutil

    d = tmp_path / "dup_events"
    d.mkdir()
    shutil.copy(f"{sf_smoke}/events.parquet", d / "events.parquet")
    shutil.copy(f"{sf_smoke}/events.parquet", d / "events_copy.parquet")

    from pos_data_insertion_etl_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_smoke}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(str(d))
    stream = normalize_event_ts(stream)
    q = _run_to_memory(streaming_dedup(stream), "dedup_out")
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0].n
    n_src = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    q.stop()
    assert n == n_src


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream self-join (click -> purchase
    attribution) over two micro-batches equals its batch recomputation;
    a cross-batch pair proves buffered-state matching and an
    out-of-bound purchase proves the range constraint."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pos_data_insertion_etl_spark.streaming.jobs import attributed_purchases

    def write_batch(rows, path):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pq.write_table(pa.Table.from_pandas(pdf), path, coerce_timestamps="us")

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    d = tmp_path / "ss_events"
    d.mkdir()
    # batch 1: in-batch match (1->2) and a click (3) whose purchase
    # arrives in the NEXT micro-batch
    write_batch(
        [
            (1, base, 1, "click", 0.0),
            (2, base + dt.timedelta(minutes=10), 1, "purchase", 9.99),
            (3, base, 2, "click", 0.0),
        ],
        str(d / "b1.parquet"),
    )
    # batch 2: cross-batch match (3->4); purchase 5 is outside the
    # 30-minute bound of click 1 and must not attribute
    write_batch(
        [
            (4, base + dt.timedelta(minutes=20), 2, "purchase", 5.00),
            (5, base + dt.timedelta(minutes=90), 1, "purchase", 1.00),
        ],
        str(d / "b2.parquet"),
    )

    schema = spark.read.parquet(str(d / "b1.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        attributed_purchases(stream)
        .writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.click_id, r.purchase_id, r.user_id)
            for r in spark.sql("SELECT * FROM ss_join_out").collect()
        }
    finally:
        q.stop()

    assert got == {(1, 2, 1), (3, 4, 2)}

    # batch recomputation of the identical plan over the same files
    batch = spark.read.parquet(str(d)).withColumn("ts", F.col("ts").cast("timestamp"))
    exp = {
        (r.click_id, r.purchase_id, r.user_id)
        for r in attributed_purchases(batch).collect()
    }
    assert got == exp


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """leftOuter stream-stream join: a click with no purchase in its
    bound is emitted with null purchase columns ONCE the watermark
    proves no match can still arrive -- not before (no speculative
    outer rows), and matched clicks never produce a null row."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pos_data_insertion_etl_spark.streaming.jobs import attributed_purchases

    def write_batch(rows, path):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pq.write_table(pa.Table.from_pandas(pdf), path, coerce_timestamps="us")

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    d = tmp_path / "lo_events"
    d.mkdir()
    # click 1 converts (purchase 2); click 3 never converts
    write_batch(
        [
            (1, base, 1, "click", 0.0),
            (2, base + dt.timedelta(minutes=5), 1, "purchase", 9.99),
            (3, base, 2, "click", 0.0),
        ],
        str(d / "b1.parquet"),
    )

    schema = spark.read.parquet(str(d / "b1.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        attributed_purchases(stream, how="leftOuter")
        .writeStream.format("memory")
        .queryName("lo_join_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        early = {
            (r.click_id, r.purchase_id)
            for r in spark.sql("SELECT * FROM lo_join_out").collect()
        }
        # watermark has not passed click 3's bound yet: no null row
        assert (3, None) not in early

        # far-future events advance the watermark past click_ts + bound
        write_batch(
            [
                (4, base + dt.timedelta(hours=3), 1, "click", 0.0),
                (5, base + dt.timedelta(hours=3), 2, "purchase", 1.0),
            ],
            str(d / "b2.parquet"),
        )
        q.processAllAvailable()
        got = {
            (r.click_id, r.purchase_id)
            for r in spark.sql("SELECT * FROM lo_join_out").collect()
        }
    finally:
        q.stop()

    assert (1, 2) in got  # matched pair
    assert (3, None) in got  # unmatched click emitted after horizon
    assert (1, None) not in got  # matched click has no null row


def test_pos_stream_ingest_exactly_once(spark, tmp_path):
    """availableNow + checkpoint: a restart with no new files writes
    nothing new; a new day's file is picked up incrementally."""
    records, rows = build_fixture(n_days=2)
    land = tmp_path / "landing"
    land.mkdir()
    write_zip(records, str(land / "R520.20240301_214500.zip"))
    out = str(tmp_path / "marts")
    ckpt = str(tmp_path / "ckpt")

    q = pos_stream_ingest(spark, str(land), out, ckpt)
    q.awaitTermination(180)
    sku_path = f"{out}/t_day_pos_daily_sku_data"
    n1 = spark.read.parquet(sku_path).count()
    assert n1 == len(rows)

    # restart, no new files -> no duplicate appends
    q = pos_stream_ingest(spark, str(land), out, ckpt)
    q.awaitTermination(180)
    assert spark.read.parquet(sku_path).count() == n1

    # drop a second file -> only its records are appended
    records2, rows2 = build_fixture(n_days=1, seed=99)
    write_zip(records2, str(land / "R520.20240302_214500.zip"))
    q = pos_stream_ingest(spark, str(land), out, ckpt)
    q.awaitTermination(180)
    assert spark.read.parquet(sku_path).count() == n1 + len(rows2)

    # re-deliver the SAME records in a new file -> the cross-batch keyed
    # merge inserts nothing (reference's idempotent re-merge semantics)
    write_zip(records2, str(land / "R520.20240303_214500.zip"))
    q = pos_stream_ingest(spark, str(land), out, ckpt)
    q.awaitTermination(180)
    assert spark.read.parquet(sku_path).count() == n1 + len(rows2)

    # derived marts equal a full recompute from the merged SKU mart --
    # they are per-date overwrites, not at-least-once appends, so
    # non-additive aggregates (distinct txn counts) stay correct
    from pos_data_insertion_etl_spark.pipeline.marts import daily_sales_mart

    sku_final = spark.read.parquet(sku_path)
    exp_df = daily_sales_mart(sku_final)
    got_sales = {
        tuple(r)
        for r in spark.read.parquet(f"{out}/t_day_sales")
        .select(*exp_df.columns)  # partition col reads back last; realign
        .collect()
    }
    exp_sales = {tuple(r) for r in exp_df.collect()}
    assert got_sales == exp_sales


def test_dedup_ingest_stream(spark, tmp_path):
    """Cross-batch streaming dedup: batch 2 re-sends half of batch 1
    plus fresh docs; the corpus must hold each distinct content once,
    and replaying both batches through a FRESH checkpoint against the
    same output directory must add nothing (exactly-once table state
    from idempotent batch application)."""
    import glob as g
    import shutil as sh

    from pos_data_insertion_etl_spark.streaming.jobs import (
        dedup_ingest_stream,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    out = tmp_path / "curated"
    b1 = [(i, f"doc text number {i}") for i in range(20)]
    b2 = [(100 + i, f"doc text number {i}") for i in range(10)] + [
        (200 + i, f"fresh content {i}") for i in range(5)
    ]

    def write_batch(rows, name):
        scratch = tmp_path / f"scratch_{name}"
        spark.createDataFrame(rows, "doc_id long, text string").repartition(
            1
        ).write.parquet(str(scratch))
        sh.copy(g.glob(str(scratch / "part-*.parquet"))[0], src / name)

    write_batch(b1, "b1.parquet")
    write_batch(b2, "b2.parquet")

    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = dedup_ingest_stream(
        stream, str(out), str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(180)
    q.stop()

    corpus = spark.read.parquet(str(out / "corpus"))
    texts = [r.text for r in corpus.collect()]
    assert len(texts) == len(set(texts)) == 25  # 20 + 5 fresh
    digests = spark.read.parquet(str(out / "digests"))
    assert digests.count() == 25

    # full replay: fresh checkpoint, same output dir -> no growth
    q2 = dedup_ingest_stream(
        stream, str(out), str(tmp_path / "ckpt2")
    ).start()
    q2.awaitTermination(180)
    q2.stop()
    assert spark.read.parquet(str(out / "corpus")).count() == 25
    assert spark.read.parquet(str(out / "digests")).count() == 25


def test_dedup_ingest_mid_batch_crash_replay(spark, tmp_path, monkeypatch):
    """ADVICE r5 crash window: kill the batch BETWEEN the corpus write
    and the digest publish, then replay it. The batch-id-keyed
    overwrite must leave the corpus duplicate-free (the old append-mode
    write doubled the batch's docs on exactly this replay)."""
    from pos_data_insertion_etl_spark.streaming import jobs
    from pos_data_insertion_etl_spark.streaming.jobs import (
        dedup_ingest_batch,
    )

    out = tmp_path / "curated"
    b1 = spark.createDataFrame(
        [(i, f"doc text number {i}") for i in range(10)],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(100 + i, f"doc text number {i}") for i in range(5)]
        + [(200 + i, f"fresh content {i}") for i in range(4)],
        "doc_id long, text string",
    )
    dedup_ingest_batch(b1, 0, str(out))

    real_publish = jobs._publish_digest_dir

    def crashing_publish(spark_, tmp, dest):
        raise RuntimeError(
            "injected crash between corpus write and digest publish"
        )

    monkeypatch.setattr(jobs, "_publish_digest_dir", crashing_publish)
    try:
        dedup_ingest_batch(b2, 1, str(out))
        raise AssertionError("crash injection did not fire")
    except RuntimeError:
        pass
    # corpus already holds batch 1's novel docs, digests are still OLD
    assert spark.read.parquet(str(out / "corpus")).count() == 14
    assert spark.read.parquet(str(out / "digests")).count() == 10

    # replay the batch with the crash healed
    monkeypatch.setattr(jobs, "_publish_digest_dir", real_publish)
    dedup_ingest_batch(b2, 1, str(out))
    corpus = spark.read.parquet(str(out / "corpus"))
    texts = [r.text for r in corpus.collect()]
    assert len(texts) == len(set(texts)) == 14, "replay duplicated docs"
    assert spark.read.parquet(str(out / "digests")).count() == 14

    # and a second replay (crash after swap) is a full no-op
    dedup_ingest_batch(b2, 1, str(out))
    assert spark.read.parquet(str(out / "corpus")).count() == 14
    assert spark.read.parquet(str(out / "digests")).count() == 14
