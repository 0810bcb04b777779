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
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # /root/testdata ships single files; Spark-written tables
        # (e.g. the bench-only .benchdata/sf1.0) are DIRECTORIES of
        # part files -- glob those.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
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


# ---------------------------------------------------------------------------
# Output-TYPE agreement (the q131 four-round driver red: DuckDB widens
# SUM(BIGINT) to HUGEINT while Spark emits bigint -- rows/schema/values
# all "match" through Python-int canonicalization, but the driver's
# typed-value hash diverges. The local value compare above
# canonicalizes through Python ints and CANNOT see width, so type
# agreement is checked structurally here.
#
# Calibrated against eight driver-GREEN counterexamples (q03/q17/q48/
# q67/q76 timestamp_ntz-vs-TIMESTAMP; q128/q30/q94 int-vs-BIGINT): the
# driver's hash tolerates integer-width skew within int64 and the
# ntz-vs-instant timestamp split (both render identically through a
# pandas/str canonicalization), so those pairs are COMPATIBLE classes
# rather than exact-match requirements. HUGEINT has no int64-safe
# rendering (pandas materializes it as float/object) and is never
# compatible -- q131, the registry's only HUGEINT emitter, is its only
# never-green name.
# ---------------------------------------------------------------------------

# Equivalence classes of (spark dtype, duckdb type str) proven to hash
# identically. Anything outside a shared class is flagged.
_COMPAT = {
    "int64": ({"tinyint", "smallint", "int", "bigint"},
              {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER"}),
    "double": ({"double"}, {"DOUBLE"}),
    "float": ({"float"}, {"FLOAT"}),
    "string": ({"string"}, {"VARCHAR"}),
    "boolean": ({"boolean"}, {"BOOLEAN"}),
    "timestamp": ({"timestamp", "timestamp_ntz"}, {"TIMESTAMP"}),
    "date": ({"date"}, {"DATE"}),
    "binary": ({"binary"}, {"BLOB"}),
}


def _types_compatible(spark_t: str, duck_t: str) -> bool:
    if spark_t.startswith("array<") and duck_t.endswith("[]"):
        return _types_compatible(spark_t[6:-1], duck_t[:-2])
    if spark_t.startswith("decimal") and duck_t.startswith("DECIMAL"):
        return spark_t.replace(" ", "") == duck_t.lower().replace(" ", "")
    for s_set, d_set in _COMPAT.values():
        if spark_t in s_set and duck_t in d_set:
            return True
    return False


def dtype_mismatches(spark_df, con, oracle_sql: str) -> list[str]:
    """Column-by-column Spark-vs-DuckDB output type comparison, keyed
    by column name (the driver sorts columns by name before hashing).
    Returns human-readable mismatch strings; empty list == agreement."""
    rel = con.sql(oracle_sql)  # plan only; nothing is fetched
    duck = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    spark = dict(spark_df.dtypes)
    out = []
    for c in sorted(set(duck) | set(spark)):
        d, s = duck.get(c), spark.get(c)
        if d is None or s is None or not _types_compatible(s, d):
            out.append(f"{c}: spark={s} duckdb={d}")
    return out
