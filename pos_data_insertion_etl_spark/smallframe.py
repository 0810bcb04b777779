"""JVM-literal construction of small driver-side DataFrames.

``spark.createDataFrame(rows, ...)`` builds a PYTHON-backed local
relation: every downstream job that touches it spins up Python worker
plumbing, and a parquet WRITE of even a 1-row frame costs ~5 s
(measured r10, local[32]) versus ~0.2 s for the identical frame built
JVM-side. That fixed cost is invisible in one-off queries but
dominates per-micro-batch sinks -- the q274 curation replay spent
more time writing its four 1-row funnel records than running the
actual gate + dedup.

:func:`values_frame` renders the rows as a SQL ``VALUES`` literal
instead, producing a pure-JVM LocalRelation with the same schema.
Strings are shipped base64-encoded through ``unbase64``/``decode`` so
no quoting/escaping rule of the SQL parser is ever trusted with data.

Intended for DRIVER-SIZED row lists only (sketch summaries, funnel
records, offset tables -- things already bounded by design); the row
cap exists to make accidental misuse loud, not to enable large
transfers. Arbitrary Python objects are out of scope -- supported cell
types are int / float / bool / str / None, which covers every
driver-built frame in this engine.
"""

from __future__ import annotations

import base64
import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

#: values_frame is for driver-bounded metadata, not data movement.
MAX_ROWS = 100_000


def _lit(v, kind: str) -> str:
    # An inline table column must hold ONE literal type (Spark 4), so
    # the DECLARED type picks the encoding for every cell:
    #   str   -> parser-safe base64 TEXT, decoded in the outer SELECT
    #            (no quoting/escape rule is ever trusted with data)
    #   float -> numeric TEXT ('1.5', 'NaN', '-Infinity'), CAST parses
    #            it; shortest-repr doubles roundtrip exactly
    #   other -> bare numeric/boolean literals
    if v is None:
        return "NULL"
    if kind == "str":
        if not isinstance(v, str):
            raise TypeError(
                f"values_frame: string column got {type(v).__name__}"
            )
        return "'" + base64.b64encode(v.encode("utf-8")).decode("ascii") + "'"
    if kind == "float":
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise TypeError(
                f"values_frame: float column got {type(v).__name__}"
            )
        v = float(v)
        if math.isnan(v):
            return "'NaN'"
        if math.isinf(v):
            return f"'{'-' if v < 0 else ''}Infinity'"
        return f"'{v!r}'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    raise TypeError(f"values_frame: unsupported cell type {type(v)!r}")


def _split_top_level(schema_ddl: str) -> list[str]:
    """Split a DDL field list on TOP-LEVEL commas only, so
    parameterized and nested types (``decimal(10,2)``,
    ``array<struct<a int, b int>>``, ``map<string,int>``) parse as one
    field instead of mis-splitting on their inner commas (ADVICE r10)."""
    fields: list[str] = []
    stack: list[str] = []
    start = 0
    closer = {">": "<", ")": "("}
    for i, ch in enumerate(schema_ddl):
        if ch in "<(":
            stack.append(ch)
        elif ch in ">)":
            # Brackets must close with their own kind (ADVICE r11):
            # 'decimal(10,2>' fails HERE with a clear error instead of
            # deep inside Spark's DDL parser.
            if not stack or stack.pop() != closer[ch]:
                raise ValueError(
                    f"values_frame: unbalanced type brackets in {schema_ddl!r}"
                )
        elif ch == "," and not stack:
            fields.append(schema_ddl[start:i])
            start = i + 1
    if stack:
        raise ValueError(
            f"values_frame: unbalanced type brackets in {schema_ddl!r}"
        )
    fields.append(schema_ddl[start:])
    return fields


def values_frame(
    spark: SparkSession, rows: Sequence[tuple], schema_ddl: str
) -> DataFrame:
    """A small DataFrame built as a JVM ``VALUES`` literal.

    ``schema_ddl`` is the usual ``"name type, name type"`` DDL; every
    column is CAST to its declared type, so the result's schema is
    identical to ``spark.createDataFrame(rows, schema_ddl)``.
    """
    cols = []
    for field in _split_top_level(schema_ddl):
        name, _, typ = field.strip().partition(" ")
        if not name or not typ.strip():
            raise ValueError(f"values_frame: bad schema field {field!r}")
        cols.append((name, typ.strip()))
    if len(rows) > MAX_ROWS:
        raise ValueError(
            f"values_frame: {len(rows)} rows exceeds the driver-metadata "
            f"cap ({MAX_ROWS}) -- this helper is for sketch/funnel-sized "
            "frames, not data"
        )
    if not rows:
        return spark.createDataFrame([], schema_ddl)
    def _kind(typ: str) -> str:
        t = typ.lower()
        if t.startswith(("string", "varchar", "char")):
            return "str"
        if t.startswith(("double", "float", "decimal", "real")):
            return "float"
        return "other"

    kinds = [_kind(typ) for _, typ in cols]
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    values = ", ".join(
        "("
        + ", ".join(_lit(v, kinds[i]) for i, v in enumerate(row))
        + ")"
        for row in rows
    )
    select = ", ".join(
        (
            f"CAST(decode(unbase64(c{i}), 'UTF-8') AS {typ}) AS {name}"
            if kinds[i] == "str"
            else f"CAST(c{i} AS {typ}) AS {name}"
        )
        for i, (name, typ) in enumerate(cols)
    )
    return spark.sql(f"SELECT {select} FROM VALUES {values} AS t({names})")
