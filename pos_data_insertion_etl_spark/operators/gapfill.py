"""Time-series gap fill: densify a keyed daily series to one row per
(key, day) and fill the holes -- forward-fill or linear interpolation.

The TimescaleDB `time_bucket_gapfill` / Flink temporal-densify shape,
expressed relationally:

1. SPINE -- per key, `sequence(min_day, max_day)` exploded to one row
   per calendar day. The sequence is generated from the key's own
   aggregate bounds, so no driver-side date loop and no cross join
   against a global calendar (which would densify every key to the
   global range and explode sparse keys).
2. LEFT JOIN the observations back on (key, day).
3. FILL with window functions: forward-fill is `last(value,
   ignorenulls=True)` over the unbounded-preceding window; linear
   interpolation additionally takes the NEXT observation via `first(
   value, ignorenulls=True)` over the following window and the distance
   between the bracketing observed days.

Everything is one shuffle on the key (all three windows share the
(key x day-order) partitioning, so Catalyst plans ONE Exchange+Sort)
plus the spine explode, which is map-side. At 100 TB the spine is
bounded by keys x days -- never rows x rows.

Determinism: interpolation is computed from exact integer day
distances; values round to 1e-6 like every ratio in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def gapfill_daily(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    method: str = "ffill",
) -> DataFrame:
    """Densify (key, day) and fill missing ``value_col``.

    Returns [key, day, value, observed]: ``observed`` marks real rows.
    ``method='ffill'`` carries the last observation forward (leading
    gaps stay NULL); ``method='linear'`` interpolates between the
    bracketing observations (leading/trailing gaps fall back to the
    one-sided neighbor, i.e. ffill/bfill at the edges).
    """
    if method not in ("ffill", "linear"):
        raise ValueError(f"method must be 'ffill' or 'linear', got {method!r}")
    obs = df.select(
        F.col(key_col).alias("key"),
        F.col(date_col).cast("date").alias("day"),
        F.col(value_col).cast("double").alias("value"),
    )
    spine = (
        obs.groupBy("key")
        .agg(F.min("day").alias("_lo"), F.max("day").alias("_hi"))
        .select(
            "key",
            F.explode(F.sequence("_lo", "_hi")).alias("day"),
        )
    )
    dense = spine.join(obs, ["key", "day"], "left").withColumn(
        "observed", F.col("value").isNotNull()
    )
    w_prev = (
        W.partitionBy("key")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_val = F.last("value", ignorenulls=True).over(w_prev)
    if method == "ffill":
        filled = prev_val
    else:
        w_next = (
            W.partitionBy("key")
            .orderBy("day")
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        next_val = F.first("value", ignorenulls=True).over(w_next)
        prev_day = F.last(
            F.when(F.col("observed"), F.col("day")), ignorenulls=True
        ).over(w_prev)
        next_day = F.first(
            F.when(F.col("observed"), F.col("day")), ignorenulls=True
        ).over(w_next)
        span = F.datediff(next_day, prev_day)
        pos = F.datediff(F.col("day"), prev_day)
        interp = F.round(
            prev_val
            + (next_val - prev_val)
            * pos.cast("double")
            / span.cast("double"),
            6,
        )
        filled = (
            F.when(F.col("observed"), F.col("value"))
            .when(prev_val.isNull(), next_val)  # leading gap -> bfill
            .when(next_val.isNull(), prev_val)  # trailing gap -> ffill
            .otherwise(interp)
        )
    return dense.select(
        F.col("key").alias(key_col),
        F.col("day"),
        filled.alias(value_col),
        "observed",
    )
