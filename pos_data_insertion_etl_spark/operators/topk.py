"""Top-k per group: window + row_number <= k.

Scale note: Catalyst plans this as a single shuffle on the partition
keys; no global sort. For heavily skewed groups, pre-aggregate or salt
before ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Deterministic iff ``order_by`` is a total order (add a unique
    tiebreaker column)."""
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w).cast("long")).filter(
        F.col(rank_col) <= k
    )
