"""End-to-end daily jobs: ingest entry point, cleanup entry point,
filename-date scalar parity."""

from __future__ import annotations

import datetime
import pathlib

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.functions.dates import (
    archive_path,
    filename_business_date,
)
from pos_data_insertion_etl_spark.pipeline.jobs import (
    get_daily_file,
    run_daily_cleanup,
    run_daily_ingest,
)
from pos_data_insertion_etl_spark.pipeline.marts import BUSINESS_DATE

from .pos_fixture import build_fixture, write_zip


def test_filename_date_and_archive_path(spark):
    df = spark.createDataFrame(
        [("R520.20240301_214500.20240301214501.zip",), ("garbage.zip",)],
        "source_file string",
    )
    rows = df.select(
        filename_business_date("source_file").alias("d"),
        archive_path("source_file").alias("p"),
    ).collect()
    assert rows[0].d == datetime.date(2024, 3, 1)
    assert rows[0].p == (
        "Daily/2024/20240301/R520.20240301_214500.20240301214501.zip"
    )
    assert rows[1].d is None  # malformed name -> NULL, not a crash


def test_daily_ingest_and_cleanup(spark, tmp_path):
    records, rows = build_fixture(n_days=8)
    land = tmp_path / "landing"
    land.mkdir()
    write_zip(records, str(land / "R520.20240301_214500.zip"))

    assert get_daily_file(str(land), "20240301") is not None
    assert get_daily_file(str(land), "19990101") is None

    reports = []
    out = str(tmp_path / "marts")
    result = run_daily_ingest(
        spark, str(land), "20240301", out_dir=out, report_sink=reports.append
    )
    assert result["metrics"]["is_file_failed"] is False
    assert reports and "SUCCESS" in reports[-1]["subject"]

    sku_path = f"{out}/t_day_pos_daily_sku_data"
    before = spark.read.parquet(sku_path).count()
    assert before == len(rows)

    # cleanup: fixture spans 8 days; anchored on the last business day the
    # cutoff is max-4d -> the 4 older day-partitions are dropped.
    days = sorted({r["business_date"] for r in rows})
    cutoff = max(days) - datetime.timedelta(days=4)
    surviving_dirs = [
        p
        for p in pathlib.Path(sku_path).iterdir()
        if p.name.startswith(f"{BUSINESS_DATE}=")
        and p.name[len(BUSINESS_DATE) + 1 :] >= cutoff.isoformat()
    ]
    mtimes_before = {
        str(f): f.stat().st_mtime_ns
        for d in surviving_dirs
        for f in d.rglob("*")
        if f.is_file()
    }
    cleanup = run_daily_cleanup(
        spark,
        sku_path,
        keep_days=4,
        target_date=max(days),
        report_sink=reports.append,
    )
    exp_kept = sum(1 for r in rows if r["business_date"] >= cutoff)
    assert cleanup["deleted_rows"] == before - exp_kept
    assert cleanup["deleted_partitions"] == [
        d.isoformat() for d in days if d < cutoff
    ]
    kept = spark.read.parquet(sku_path)
    assert kept.count() == exp_kept
    assert kept.filter(F.col(BUSINESS_DATE) < F.lit(cutoff)).count() == 0
    # metadata-only drop: surviving partitions' files are byte-for-byte
    # untouched (no full-table rewrite happened)
    mtimes_after = {
        str(f): f.stat().st_mtime_ns
        for d in surviving_dirs
        for f in d.rglob("*")
        if f.is_file()
    }
    assert mtimes_after == mtimes_before
    assert "SUCCESS" in reports[-1]["subject"]

    # idempotent + stalled-ingest semantics: anchored on a later run date,
    # yesterday's data keeps expiring even though no new data arrived
    cleanup2 = run_daily_cleanup(
        spark,
        sku_path,
        keep_days=4,
        target_date=max(days) + datetime.timedelta(days=1),
    )
    assert cleanup2["deleted_partitions"] == [cutoff.isoformat()]


def test_daily_ingest_missing_file_reports_failure(spark, tmp_path):
    reports = []
    result = run_daily_ingest(
        spark, str(tmp_path), "20240301", report_sink=reports.append
    )
    assert result["metrics"]["is_file_failed"] is True
    assert "FAILURE" in reports[-1]["subject"]
