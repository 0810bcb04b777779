"""Bucketing: pre-shuffle tables on their join key so repeated joins are
shuffle-free (co-located). The 100 TB pattern for fact-fact joins that
run every day: pay the shuffle once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], n_buckets: int = 32
) -> None:
    """Persist as a bucketed managed table (sorted within buckets on the
    same keys so merge joins skip the sort too)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables: Catalyst sees compatible output
    partitionings and plans a SortMergeJoin with NO Exchange on either
    side (verify via explain -- tested in tests/test_scale_patterns.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
