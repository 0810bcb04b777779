"""Shared column helpers for the declared-query inventory."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(c, scale: int = 2) -> Column:
    """Exact decimal view of a double column (inputs have <= `scale` dp).

    Decimal arithmetic is associative -> aggregation results do not depend
    on Spark's partial-aggregate / shuffle order, so they hash-match a
    single-threaded oracle bit-for-bit once cast back to double.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


def dsum(c, scale: int = 2) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return F.sum(dec(c, scale)).cast("double")


def davg(c, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    return F.sum(dec(c, scale)).cast("double") / F.count(F.lit(1))


# The same patterns as SQL snippets for the DuckDB oracle.
def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*))"
