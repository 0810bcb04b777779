"""Retention (filtered delete) operator.

Re-expresses the reference's cleanup job -- `DELETE FROM
T_DAY_POS_DAILY_SKU_DATA WHERE [当稼動日] < today - 4 days`
(/root/reference/daily_cleanup.py:19-38) -- as a partition-prunable
filter. On day-partitioned Parquet the rewrite touches only expired
partitions (a metadata-cheap operation at 100 TB); the filter itself is
the same predicate either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
