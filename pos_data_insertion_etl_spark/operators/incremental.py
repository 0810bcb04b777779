"""Incremental (partial-aggregate) rollup maintenance.

The 100 TB pattern for a daily mart: never re-aggregate history. Store
ALGEBRAIC partials (counts and exact decimal sums -- anything where
merge(sum_a, sum_b) = sum_a + sum_b) per grain, and on each batch
aggregate ONLY the new day, then merge:

    merged = (stored_partials UNION new_day_partials)
             GROUP BY grain -> SUM each measure

Merging is associative and commutative, so the result is bit-identical
to a full recompute (q111's oracle IS the full recompute -- the hash
match is the proof), while the daily cost is O(new day) + a shuffle of
the tiny partial table. Derived measures (averages, ratios) are
computed from the merged sums at read time, never stored -- storing
them would break mergeability.

This mirrors what the reference's daily stored-proc marts imply
(per-day runs appending to cumulative tables, /root/reference/main.py
SP calls) and what Spark does internally for partial+final hash
aggregation -- lifted to a cross-run, persisted contract.
"""

from __future__ import annotations

import functools
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_rollup(
    df: DataFrame, keys: Sequence[str], measures: Mapping[str, Column]
) -> DataFrame:
    """Aggregate `df` to per-key partials. Every measure must be
    algebraic (SUM/COUNT shaped) so partials merge by addition."""
    return df.groupBy(*keys).agg(
        *[m.alias(name) for name, m in measures.items()]
    )


def merge_rollups(
    partials: Sequence[DataFrame], keys: Sequence[str], measure_names: Sequence[str]
) -> DataFrame:
    """Merge partial rollups (same schema) into one: union + re-sum.
    Decimal sums stay decimal through the merge, so the result equals a
    single-pass aggregation exactly, not approximately."""
    if not partials:
        raise ValueError("nothing to merge")
    u = functools.reduce(lambda a, b: a.unionByName(b), partials)
    return u.groupBy(*keys).agg(
        *[F.sum(n).alias(n) for n in measure_names]
    )
