"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from the engine's declared
query registry (pos_data_insertion_etl_spark.plans) -- one entry per
implemented operator family from SURVEY.md §2, each paired with ANSI SQL
the DuckDB oracle can run on the same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Robust against being loaded by file path from any cwd: the engine
# package lives next to this file.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pos_data_insertion_etl_spark.plans import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from pos_data_insertion_etl_spark.plans.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle-expressible query."""
    return {
        name: spec.oracle
        for name, spec in sorted(all_queries().items())
        if spec.oracle is not None
    }
