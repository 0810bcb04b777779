"""Small-file compaction for parquet tables.

Streaming ingest (foreachBatch appends, one file per task per batch)
accretes small files; at 100 TB the resulting footer/open overhead
dominates scan time long before data volume does. This operator rewrites
a table (or its day partitions) into right-sized files:

* `maxRecordsPerFile` bounds file size without a shuffle -- each task
  rolls to a new file at the limit;
* `coalesce` shrinks the task count when the input is mostly tiny files
  (no shuffle, narrow dependency);
* optional `sort_by` clusters rows inside each output file so parquet
  min/max column stats become selective (cheap data-skipping, the
  vanilla-Spark stand-in for Z-ordering);
* the swap follows the rename-aside pattern: old -> `__old`, new ->
  live, then delete `__old`. A full copy of the data exists on disk at
  every step, but there IS a window (after the live path moves to
  `__old`, before the compacted copy moves in) where the live path does
  not exist: a crash there strands the table at `__old`, and a reader
  that resolves the path during the window sees FileNotFound. Run
  `restore_crashed_swap` at job startup (compact_table does this
  automatically) to recover the stranded copy, and treat compaction as
  a maintenance-window operation for concurrent readers -- or have
  readers retry on FileNotFound, since the window is two renames wide.
  Renames go through the Hadoop FileSystem API; note they are only
  atomic on real filesystems (HDFS, local) -- object stores like S3
  implement rename as copy+delete, so prefer a manifest/table format
  (Iceberg/Delta) there.

Row-count parity is validated BEFORE the swap; a mismatch aborts and
leaves the live table untouched.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _count_data_files(spark: SparkSession, path: str) -> int:
    fs, jvm = _fs(spark, path)
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(path), True)
    n = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
    return n


def restore_crashed_swap(spark: SparkSession, path: str) -> bool:
    """Recover from a crash inside a previous compaction swap: if the
    live ``path`` is missing but ``path__old`` exists, move the stranded
    copy back into place. Returns True if a restore happened. Safe to
    call unconditionally at job startup."""
    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    old = path.rstrip("/") + "__old"
    if not fs.exists(P(path)) and fs.exists(P(old)):
        if not fs.rename(P(old), P(path)):
            raise RuntimeError(f"could not restore {old} to {path}")
        return True
    return False


def swap_table(spark: SparkSession, path: str, tmp: str) -> None:
    """Rename-aside swap: move the live ``path`` to ``path__old``, move
    ``tmp`` into place, delete ``__old``. A crash at any point leaves
    old or new intact (recoverable via `restore_crashed_swap`); see the
    module docstring for the two-renames visibility window and the
    object-store caveat."""
    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    old = path.rstrip("/") + "__old"
    fs.delete(P(old), True)  # clear any prior crashed attempt
    if not fs.rename(P(path), P(old)):
        raise RuntimeError(f"could not move {path} aside to {old}")
    if not fs.rename(P(tmp), P(path)):
        fs.rename(P(old), P(path))  # roll back
        raise RuntimeError(f"could not move {tmp} into place; rolled back")
    fs.delete(P(old), True)


def compact_table(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    records_per_file: int = 1_000_000,
    n_tasks: int | None = None,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the table at ``path`` into compacted files; returns
    {"files_before", "files_after", "rows"}."""
    restore_crashed_swap(spark, path)
    df = spark.read.parquet(path)
    rows_before = df.count()
    files_before = _count_data_files(spark, path)

    out = df
    if n_tasks:
        out = out.coalesce(n_tasks)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    tmp = path.rstrip("/") + "__compact"
    writer = out.write.mode("overwrite").option(
        "maxRecordsPerFile", records_per_file
    )
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)

    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    rows_after = spark.read.parquet(tmp).count()
    if rows_after != rows_before:
        fs.delete(P(tmp), True)
        raise RuntimeError(
            f"compaction row mismatch ({rows_before} -> {rows_after}); "
            f"aborted, {path} untouched"
        )
    swap_table(spark, path, tmp)
    return {
        "files_before": files_before,
        "files_after": _count_data_files(spark, path),
        "rows": rows_after,
    }
