"""Exact integer apportionment: largest-remainder (Hamilton) method.

Distributes an integer ``budget`` across groups proportionally to a
non-negative integer weight so that the allocations sum to the budget
EXACTLY -- the property floor-division proration (q271's Neyman floor)
deliberately gives up. The classic shape for sampling quotas, shard
counts, and token-budget splits where "within one of proportional" and
"sums exactly" both matter.

Algorithm (all integer, cross-engine exact):

1. collapse to one row per group with its BIGINT weight ``w``;
2. ``base  = (budget * w) div total_w``   (floor share)
3. ``rem   = (budget * w) %  total_w``    (the remainder)
4. ``leftover = budget - sum(base)``      (< number of groups)
5. hand one extra unit to the ``leftover`` groups with the largest
   remainders, ties broken by group key ascending (a TOTAL order, so
   both engines pick the same winners).

Shape at 100 TB: the corpus collapses in the first groupBy; every
window runs over the GROUP table (one row per group -- sources,
shards, strata), never over raw rows. The unpartitioned windows are
k-row by construction.

Overflow contract: ``budget * total_w`` must stay under 2^63 --
budget 1e6 against a 9.2e12 total weight, or budget 1e9 against 9.2e9.
Callers with larger products should pre-scale the weight (the shares
only depend on weight RATIOS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def largest_remainder(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Apportion ``budget`` over ``key_col`` proportional to the group
    sum of ``weight_col``; returns [key, w, alloc, total_alloc] with
    ``sum(alloc) == budget`` exactly (``total_alloc`` repeats the
    certified total on every row so an oracle can hash-check it).
    """
    groups = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(F.col(weight_col).cast("long")).cast("long").alias("w")
    )
    full = W.partitionBy()
    # Enforce the documented overflow contract (budget * total_w < 2^63)
    # at the point _tot exists: raise_error with a named reason beats an
    # anonymous ANSI overflow on Spark -- and engines that silently widen
    # (DuckDB HUGEINT) would otherwise diverge without any signal
    # (ADVICE r9). One CASE over the k-row group table; free at scale.
    tot_limit = (2**63 - 1) // max(int(budget), 1)
    with_tot = groups.withColumn(
        "_tot",
        F.when(
            F.sum("w").over(full) > F.lit(tot_limit),
            F.expr(
                "raise_error('largest_remainder: budget * total_w "
                "exceeds 2^63 -- pre-scale the weights (shares depend "
                "only on weight ratios)')"
            ).cast("long"),
        ).otherwise(F.sum("w").over(full).cast("long")),
    )
    # nullif guard (the q271 lesson): an all-zero weight total would
    # ANSI-error on Spark's integer div where DuckDB // returns NULL;
    # both sides must take the NULL path explicitly.
    scored = with_tot.select(
        "key",
        "w",
        F.expr(f"({budget} * w) div nullif(_tot, 0)")
        .cast("long")
        .alias("base"),
        F.expr(f"({budget} * w) % nullif(_tot, 0)")
        .cast("long")
        .alias("rem"),
    )
    ranked = scored.select(
        "key",
        "w",
        "base",
        (
            F.lit(budget) - F.sum("base").over(full).cast("long")
        ).alias("_leftover"),
        F.row_number()
        .over(W.orderBy(F.desc("rem"), F.asc("key")))
        .cast("long")
        .alias("_rk"),
    )
    alloc = ranked.select(
        "key",
        "w",
        (
            F.col("base")
            + F.when(F.col("_rk") <= F.col("_leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )
    return alloc.select(
        "key",
        "w",
        "alloc",
        F.sum("alloc").over(full).cast("long").alias("total_alloc"),
    )
