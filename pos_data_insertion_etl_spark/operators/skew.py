"""Skew-handling: salted two-phase aggregation.

AQE's skew-join splitting covers joins; for aggregations over heavily
skewed keys (one key owning most rows), pre-splitting each key into
`n_salts` subkeys spreads the partial aggregation across tasks, then a
cheap second aggregation merges the per-salt partials. Only valid for
associative aggregates -- which is also exactly what makes the result
deterministic (decimal sums / counts / min / max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    merges: dict[str, Column],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``   phase-1 aggregates (per key+salt), name -> aggregate column
    ``merges`` phase-2 merge of the phase-1 columns, name -> aggregate
    ``salt_source`` deterministic salt basis (default: spark_partition_id,
    which is fast but non-deterministic across runs; pass a column like
    pmod(hash(id), n) when the PHASE-1 grouping itself must be stable --
    final results are identical either way for associative aggregates).
    """
    salt = (
        F.pmod(salt_source, F.lit(n_salts))
        if salt_source is not None
        else F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merges.items()]
    )
