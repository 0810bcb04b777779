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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as nanos-since-epoch (long) and
    convert to a microsecond timestamp (same truncation DuckDB applies
    when casting TIMESTAMP_NS to TIMESTAMP).
    """
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register the tables as temp views for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
