"""Retention (filtered delete) operator.

Re-expresses the reference's cleanup job -- `DELETE FROM
T_DAY_POS_DAILY_SKU_DATA WHERE [当稼動日] < today - 4 days`
(/root/reference/daily_cleanup.py:19-38) -- two ways:

* `retention_filter`: the predicate form (partition-prunable filter),
  used by q37 and by callers that want a logical view.
* `drop_expired_partitions`: the production delete. On a
  day-partitioned Parquet mart the cutoff is resolved WITHOUT scanning
  data (it comes from the job's target date), expired `col=value`
  partition directories are enumerated from the filesystem listing, their
  row counts read from a metadata-only scan, and the directories removed
  via the Hadoop FileSystem API (object-store safe -- no local-only
  shutil/os calls). At 100 TB with a 4-day horizon this touches only the
  expired partitions' footers + a few metadata ops, vs. a full-table
  rewrite.
"""

from __future__ import annotations

import datetime as _dt
import urllib.parse
import warnings

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def retention_filter(
    df: DataFrame,
    ts_col: str,
    keep_days: int = 4,
    now: Column | None = None,
) -> DataFrame:
    """Rows newer than `now - keep_days`. ``now`` defaults to max(ts) in
    the data (deterministic for tests; pass current_timestamp() in prod).
    """
    if now is None:
        mx = df.agg(F.max(ts_col).alias("_retention_now"))
        return (
            df.crossJoin(F.broadcast(mx))
            .filter(
                F.col(ts_col)
                >= F.col("_retention_now") - F.expr(f"INTERVAL {keep_days} DAYS")
            )
            .drop("_retention_now")
        )
    return df.filter(F.col(ts_col) >= now - F.expr(f"INTERVAL {keep_days} DAYS"))


def drop_expired_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    cutoff: str | _dt.date,
) -> dict:
    """Metadata-only retention delete on a `partition_col=value`-laid-out
    parquet table: drop every partition directory whose value sorts below
    ``cutoff`` (ISO date string). No data rewrite, no full scan.

    Returns {"deleted_rows", "deleted_partitions": [values...]}. Row
    counts come from a count over only the expired directories -- Spark
    satisfies a parquet count() from footer metadata, so nothing beyond
    footers is read. All filesystem ops go through the Hadoop FileSystem
    API so the same code works on HDFS/object stores, not just local FS.
    """
    if isinstance(cutoff, _dt.date):
        cutoff = cutoff.isoformat()
    _dt.date.fromisoformat(cutoff)  # reject non-ISO cutoffs up front
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    prefix = partition_col + "="
    expired = []
    for status in fs.listStatus(hpath):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        if not name.startswith(prefix):
            continue
        value = urllib.parse.unquote(name[len(prefix):])
        # the lexicographic comparison below is only meaningful for
        # zero-padded ISO dates -- validate, skip-and-warn anything else
        # (including __HIVE_DEFAULT_PARTITION__, i.e. null dates)
        try:
            _dt.date.fromisoformat(value)
        except ValueError:
            warnings.warn(
                f"retention: partition {name!r} is not an ISO date; "
                "skipping (not deleted)",
                stacklevel=2,
            )
            continue
        if value < cutoff:
            expired.append((value, status.getPath()))
    if not expired:
        return {"deleted_rows": 0, "deleted_partitions": []}
    deleted_rows = (
        spark.read.option("basePath", path)
        .parquet(*[p.toString() for _, p in expired])
        .count()
    )
    for _, p in expired:
        fs.delete(p, True)
    return {
        "deleted_rows": deleted_rows,
        "deleted_partitions": sorted(v for v, _ in expired),
    }


def apply_retention_delete(
    df: DataFrame, ts_col: str, keep_days: int, path: str, partition_col: str
) -> None:
    """Materialized form: rewrite only surviving partitions (overwrite).

    With `spark.sql.sources.partitionOverwriteMode=dynamic` and a
    day-partitioned layout this is the idiomatic vanilla-Spark stand-in
    for a Delta `DELETE WHERE day < cutoff`.
    """
    kept = retention_filter(df, ts_col, keep_days)
    kept.write.mode("overwrite").partitionBy(partition_col).parquet(path)
