"""Fixed-width record projector -- the engine's first-class "parse" operator.

The reference's logical record is 520 characters of a decoded UTF-8 stream
(/root/reference/main.py:56, slicing at main.py:409-412, main.py:482);
field layout lives in opaque stored procedures. Here a declarative field
spec compiles into `substring` + `cast` column projections, so parsing is
pure Catalyst-optimizable expression work (whole-stage codegen, column
pruning: unreferenced fields are never materialized).

Offsets are CHARACTER offsets on the decoded string -- matching the
reference, which slices post-decode (main.py:482) -- so multi-byte UTF-8
never drifts the layout.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FixedWidthField:
    """One field of a fixed-width layout. ``start`` is 1-based, in chars."""

    name: str
    start: int
    length: int
    dtype: str = "string"  # any Spark cast target, or "date:<fmt>"
    trim: bool = False

    def expr(self, col: str) -> Column:
        raw = F.substring(F.col(col), self.start, self.length)
        if self.trim:
            raw = F.trim(raw)
        # try_* variants: malformed/partial records parse to NULL (and get
        # filtered downstream) instead of failing the job under ANSI mode.
        if self.dtype == "string":
            out = raw
        elif self.dtype.startswith("date:"):
            fmt = self.dtype.split(":", 1)[1]
            out = F.try_to_timestamp(raw, F.lit(fmt)).cast("date")
        elif self.dtype.startswith("timestamp:"):
            fmt = self.dtype.split(":", 1)[1]
            out = F.try_to_timestamp(raw, F.lit(fmt))
        else:
            out = raw.try_cast(self.dtype)
        return out.alias(self.name)


def parse_fixed_width(
    df: DataFrame,
    record_col: str,
    fields: list[FixedWidthField],
    keep: list[str] | None = None,
) -> DataFrame:
    """Project a DataFrame[record_col: string] into typed columns."""
    extra = [F.col(c) for c in (keep or [])]
    return df.select(*extra, *[f.expr(record_col) for f in fields])


def parse_fixed_width_quarantine(
    df: DataFrame,
    record_col: str,
    fields: list[FixedWidthField],
    expected_width: int | None = None,
    keep: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Parse with malformed-record routing: returns (valid, quarantine).

    A record is quarantined when it is the wrong width (``expected_width``
    given) or when any NON-string field try_-casts to NULL from non-blank
    input (blank input = a legitimately missing value and stays valid;
    garbage that fails the cast is corruption). Quarantined rows carry
    the raw record plus a ``_reject_reason`` naming the first failing
    field, so reprocessing after a layout fix loses nothing -- the
    missing piece in silently-inserting fixed-width loaders (the
    reference inserts every slice unchecked, main.py:482, main.py:561).

    One scan feeds both outputs; Spark computes the reject predicate
    twice (once per filter) but the inputs stay a single pass each --
    cache the parsed frame if both sides are consumed eagerly.
    """
    extra = [F.col(c) for c in (keep or [])]
    parsed = df.select(
        *extra, F.col(record_col), *[f.expr(record_col) for f in fields]
    )
    reasons: list[Column] = []
    if expected_width is not None:
        reasons.append(
            F.when(
                F.length(F.col(record_col)) != expected_width,
                F.concat(
                    F.lit(f"bad_width(expected={expected_width},got="),
                    F.length(F.col(record_col)).cast("string"),
                    F.lit(")"),
                ),
            )
        )
    for f in fields:
        if f.dtype == "string":
            continue
        raw = F.trim(F.substring(F.col(record_col), f.start, f.length))
        reasons.append(
            F.when(
                F.col(f.name).isNull() & (raw != ""),
                F.lit(f"bad_field({f.name})"),
            )
        )
    reason = F.coalesce(*reasons) if reasons else F.lit(None).cast("string")
    tagged = parsed.withColumn("_reject_reason", reason)
    valid = tagged.filter(F.col("_reject_reason").isNull()).drop(
        "_reject_reason", record_col
    )
    quarantine = tagged.filter(F.col("_reject_reason").isNotNull()).select(
        *(keep or []), F.col(record_col), F.col("_reject_reason")
    )
    return valid, quarantine


def fixed_width_record(
    parts: list[Column], total_width: int | None = None
) -> Column:
    """Inverse operator: pack already-padded columns into one record
    (used by tests and fixtures to synthesize R520-style data)."""
    rec = F.concat(*parts)
    if total_width is not None:
        rec = F.rpad(rec, total_width, " ")
    return rec
