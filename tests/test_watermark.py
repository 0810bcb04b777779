"""Watermark late-data semantics: a row older than the watermark horizon
arriving in a later micro-batch is dropped from append-mode windowed
aggregation (SURVEY.md §2.2 streaming row)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.streaming.jobs import hourly_event_counts


def _write_batch(rows, path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pq.write_table(pa.Table.from_pandas(pdf), path, coerce_timestamps="us")


def test_late_row_dropped(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    d = tmp_path / "late_events"
    d.mkdir()
    # batch 1: events at 10:00-12:59 -> watermark advances to ~12:49
    _write_batch(
        [
            (1, base, 1, "click", 1.0),
            (2, base + dt.timedelta(hours=1), 1, "click", 1.0),
            (3, base + dt.timedelta(hours=2, minutes=59), 1, "click", 1.0),
        ],
        str(d / "b1.parquet"),
    )

    schema = spark.read.parquet(str(d / "b1.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        # pyarrow writes tz-naive -> NTZ; watermarks need TIMESTAMP (LTZ)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        hourly_event_counts(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one LATE row (10:30, far behind the watermark) plus a
        # fresh row that advances the stream
        _write_batch(
            [
                (4, base + dt.timedelta(minutes=30), 1, "click", 1.0),
                (5, base + dt.timedelta(hours=4), 1, "click", 1.0),
            ],
            str(d / "b2.parquet"),
        )
        q.processAllAvailable()
        rows = {
            (r.window_start.hour, r.n_events)
            for r in spark.sql("SELECT * FROM late_out").collect()
        }
    finally:
        q.stop()

    # the 10:00 window closed with ONE event when the watermark passed it;
    # late event-4 must not have been added (no (10, 2) emission)
    assert (10, 1) in rows
    assert (10, 2) not in rows
