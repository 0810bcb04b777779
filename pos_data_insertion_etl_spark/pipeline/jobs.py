"""The reference's two entry points as engine jobs (SURVEY.md §3).

Entry point 1 (daily ingest, cron 21:45 -> ETLProcessor.process,
/root/reference/main.py:425-636): locate today's file by prefix, ingest
-> marts, report, leave archival to the streaming source (or the batch
helper here).

Entry point 2 (daily cleanup, cron 00:30 -> delete_old_data,
daily_cleanup.py:19-79): retention rewrite + report.

Scheduling itself stays external (cron/Airflow invoking spark-submit),
or use streaming.pos_stream_ingest with trigger(availableNow) for the
continuous form.
"""

from __future__ import annotations

import datetime as _dt
import glob as _glob
import logging
import os

from pyspark.sql import SparkSession

from ..operators.retention import drop_expired_partitions
from .marts import BUSINESS_DATE, run_pos_pipeline
from .report import send_report

log = logging.getLogger(__name__)


def get_daily_file(landing_dir: str, target_date: str) -> str | None:
    """Locate the day's zip by prefix `R520.<YYYYMMDD>` (main.py:273-287):
    first match wins; 0 or >1 matches logged like the reference warns."""
    pattern = os.path.join(landing_dir, f"R520.{target_date}*.zip")
    matches = sorted(_glob.glob(pattern))
    if not matches:
        log.warning("no daily file for %s under %s", target_date, landing_dir)
        return None
    if len(matches) > 1:
        log.warning("multiple daily files for %s: %s", target_date, matches)
    return matches[0]


def run_daily_ingest(
    spark: SparkSession,
    landing_dir: str,
    target_date: str,
    out_dir: str | None = None,
    stage_dir: str | None = None,
    report_sink=None,
) -> dict:
    """Entry point 1: one day's file end-to-end. Failure paths send the
    failure report and re-raise (the reference's eight error funnels ->
    send_mail, but failing loudly instead of swallowing). Pass
    ``stage_dir`` when the daily file is huge: ingest then goes through
    the two-stage splittable path so parsing fans out past the single
    zip-decompression task."""
    path = get_daily_file(landing_dir, target_date)
    if path is None:
        metrics = {
            "is_file_failed": True,
            "file_name": f"R520.{target_date}*",
            "error_message": "daily file not found",
        }
        send_report(metrics, report_sink)
        return {"marts": {}, "metrics": metrics}
    try:
        result = run_pos_pipeline(spark, path, out_dir=out_dir, stage_dir=stage_dir)
    except Exception as exc:  # report, then fail loudly
        send_report(
            {
                "is_file_failed": True,
                "file_name": path,
                "error_message": str(exc)[:500],
            },
            report_sink,
        )
        raise
    send_report(result["metrics"], report_sink)
    return result


def run_daily_cleanup(
    spark: SparkSession,
    mart_path: str,
    keep_days: int = 4,
    target_date: str | _dt.date | None = None,
    report_sink=None,
) -> dict:
    """Entry point 2: 4-day retention on the day-partitioned SKU mart
    (daily_cleanup.py:22-33), reporting the deleted row count like the
    reference's success email (daily_cleanup.py:35-49).

    The cutoff is anchored on ``target_date`` (the job's run date;
    defaults to today, matching the reference's `today - 4 days`) -- NOT
    on max(date) in the data, so a stalled ingest cannot stop expired
    data from being deleted. The delete itself is a metadata-only
    partition drop: no scan of surviving data, no table rewrite.
    """
    if target_date is None:
        target_date = _dt.date.today()
    elif isinstance(target_date, str):
        target_date = _dt.date.fromisoformat(target_date)
    cutoff = target_date - _dt.timedelta(days=keep_days)
    result = drop_expired_partitions(spark, mart_path, BUSINESS_DATE, cutoff)
    metrics = {
        "is_file_failed": False,
        "file_name": mart_path,
        "error_message": "",
        "total_rows_processed": str(result["deleted_rows"]),
    }
    send_report(metrics, report_sink)
    return {
        "deleted_rows": result["deleted_rows"],
        "deleted_partitions": result["deleted_partitions"],
    }
