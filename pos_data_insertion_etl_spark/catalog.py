"""Table registry over the parquet test tables.

The reference's only "catalog" is a blob prefix + hard-coded SQL table
names (/root/reference/main.py:51-52, main.py:273-287). Here: explicit
named tables backed by parquet, loaded lazily so Catalyst sees a plain
parquet relation (pushdown + pruning work).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-local TIMESTAMP (LTZ),
    whatever the parquet generation encoded:

    * TIMESTAMP(NANOS) -- Spark's vectorized reader rejects it; with
      ``nanosAsLong`` (session.RUNTIME_CONFS) it arrives as
      nanos-since-epoch BIGINT, converted here to microseconds (the same
      truncation DuckDB applies casting TIMESTAMP_NS to TIMESTAMP).
    * tz-naive TIMESTAMP(MICROS) -- arrives as TIMESTAMP_NTZ (Spark's
      ``inferTimestampNTZ`` default); cast to TIMESTAMP, which under the
      UTC session timezone preserves the wall-clock value and therefore
      matches DuckDB's naive reading. Watermarks/windows require LTZ.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame (event-time normalized: see
    normalize_event_ts)."""
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_event_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register the tables as temp views for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
