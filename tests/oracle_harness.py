"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL side by side, compare row count + column names +
order-insensitive canonicalized values. Stricter than a hash: exact cell
equality, so any float nondeterminism shows up as a readable diff."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}"
    if isinstance(v, Decimal):
        return f"{float(v):.17g}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in idx) for r in rows)


def compare(spark_df, con, oracle_sql: str):
    """Returns (ok, message)."""
    srows = spark_df.collect()
    scols = spark_df.columns
    res = con.execute(oracle_sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    if sorted(scols) != sorted(ocols):
        return False, f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"row count differs: spark={len(srows)} oracle={len(orows)}"
    s = canon_rows(scols, [tuple(r) for r in srows])
    o = canon_rows(ocols, orows)
    if s != o:
        diffs = [(a, b) for a, b in zip(s, o) if a != b][:5]
        return False, f"values differ; first diffs (spark vs oracle): {diffs}"
    return True, f"ok ({len(srows)} rows)"
