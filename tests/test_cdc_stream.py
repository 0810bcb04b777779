"""CDC-apply streaming sink: micro-batches of key-changes merged into a
parquet target via upsert + rename-aside swap (streaming/jobs.py)."""

from __future__ import annotations

import os
import time

from pos_data_insertion_etl_spark.streaming.jobs import apply_cdc_stream


def _write_updates(spark, rows, path):
    spark.createDataFrame(rows, "k int, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_cdc_stream_applies_batches_in_order(spark, tmp_path):
    target = str(tmp_path / "target")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    ).write.parquet(target)

    stream_dir = tmp_path / "updates"
    stream_dir.mkdir()
    # batch 1 updates key 2 and inserts key 4; batch 2 re-updates key 2
    # (later trigger must win) and inserts key 5. Distinct mtimes pin
    # the file-source trigger order.
    _write_updates(spark, [(2, "B1"), (4, "D")], str(stream_dir / "b1"))
    time.sleep(1.1)
    _write_updates(spark, [(2, "B2"), (5, "E")], str(stream_dir / "b2"))
    now = time.time()
    for sub, age in (("b1", 60), ("b2", 30)):
        for f in (stream_dir / sub).iterdir():
            os.utime(f, (now - age, now - age))

    schema = spark.read.parquet(str(stream_dir / "b1")).schema
    updates = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir / "*"))
    )
    q = apply_cdc_stream(
        updates, target, ["k"], checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    got = {(r.k, r.v) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "D"), (5, "E")}


def test_cdc_stream_restart_is_noop(spark, tmp_path):
    """availableNow + checkpoint: restarting with no new update files
    leaves the target unchanged (no re-application)."""
    target = str(tmp_path / "target")
    spark.createDataFrame([(1, "a")], "k int, v string").write.parquet(target)
    stream_dir = tmp_path / "updates"
    stream_dir.mkdir()
    _write_updates(spark, [(1, "A")], str(stream_dir / "b1"))

    schema = spark.read.parquet(str(stream_dir / "b1")).schema

    def run():
        updates = spark.readStream.schema(schema).parquet(str(stream_dir / "*"))
        q = apply_cdc_stream(
            updates, target, ["k"], checkpoint_dir=str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)

    run()
    first = {(r.k, r.v) for r in spark.read.parquet(target).collect()}
    run()  # restart: checkpoint says b1 is done; no batch fires
    second = {(r.k, r.v) for r in spark.read.parquet(target).collect()}
    assert first == second == {(1, "A")}
