"""Declarative data-quality checks compiled into ONE scan.

The reference validates inputs imperatively (record-length and
emptiness guards, /root/reference/main.py:216,318,558-565) and aborts
the run on surprise. At warehouse scale the useful contract is a
REPORT: every rule evaluated over the whole batch in a single pass,
violations counted, the load/quarantine decision made downstream (see
operators/fixedwidth.py's quarantine channel for the row-level analog).

Two rule kinds:

* scan rules -- a boolean violation predicate per row (nullness, range,
  domain). All of them compile into one aggregate over one scan:
  SUM(CASE WHEN violated THEN 1 END) per rule, so adding a rule costs
  one column, never another pass.
* referential rules -- an anti join against a dimension counts rows
  whose key has no match (orphans). One equi join per rule; the
  dimension side broadcasts when small.

Output is long-form [rule, n_violations, n_rows] so reports union and
store uniformly regardless of rule count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("rule", "n_violations", "n_rows")


def quality_report(
    df: DataFrame,
    scan_rules: Sequence[tuple[str, Column]],
    ref_rules: Sequence[tuple[str, Column, DataFrame]] = (),
) -> DataFrame:
    """Evaluate rules over `df`; return [rule, n_violations, n_rows].

    `scan_rules`: (name, violation_predicate) pairs -- the predicate is
    True for BAD rows. `ref_rules`: (name, join_condition, dimension)
    triples counting `df` rows with no dimension match.
    """
    if not scan_rules:
        raise ValueError("at least one scan rule is required")
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"r{i}")
        for i, (_, cond) in enumerate(scan_rules)
    ]
    one_row = df.agg(*aggs)
    # Long-form via explode(array(struct...)), not a stack() SQL string:
    # rule names are data, and interpolating them into selectExpr would
    # let a quote inside a name break (or inject into) the expression.
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"r{i}").alias("n_violations"),
            )
            for i, (name, _) in enumerate(scan_rules)
        ]
    )
    report = one_row.select(
        F.explode(pairs).alias("_p"), "n_rows"
    ).select("_p.rule", "_p.n_violations", "n_rows")
    for name, cond, dim in ref_rules:
        orphans = df.join(F.broadcast(dim), cond, "left_anti").agg(
            F.count(F.lit(1)).alias("n_violations")
        )
        row = (
            orphans.crossJoin(F.broadcast(one_row.select("n_rows")))
            .select(F.lit(name).alias("rule"), "n_violations", "n_rows")
        )
        report = report.unionByName(row)
    return report
