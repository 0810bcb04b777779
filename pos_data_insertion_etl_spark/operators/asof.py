"""As-of join: for each left row, the latest right row with
right.ts <= left.ts on the same key.

Spark has no native ASOF JOIN; the scalable formulation is the
union-and-carry trick: tag both sides, union on a common schema, and
carry the last non-null right value forward with a window over
(key ORDER BY ts, side) -- right rows sort before left rows at equal
timestamps, so "at-or-before" includes exact ties.

One shuffle on the key (the window partition), no per-key Python, no
range explosion -- this is the plan you want at 100 TB, vs. a
merge_asof-per-group applyInPandas which pays Arrow serialization for
the whole fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    carry: dict[str, str],
) -> DataFrame:
    """``carry`` maps right-side column -> output name. Left rows keep all
    their columns; each carried output holds the right side's value as of
    the left timestamp (null if no prior right row).

    Determinism: when several right rows share the same (key, ts), the
    one with the greatest carried-value tuple wins -- an explicit total
    order, not whichever peer the shuffle happened to place last. All
    carried columns come from that ONE winning row: the carries travel
    as a single struct and F.last is applied to the struct once, so a
    null in one carried column of the winner stays null rather than
    falling back per-column to a different peer row.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    reserved = {"_ts", "_side", "_c"}
    clash = reserved & set(lcols) | reserved & set(right.columns)
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(clash)}; rename them first"
        )
    carry_type = StructType(
        [StructField(out, right.schema[src].dataType) for src, out in carry.items()]
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(carry_type).alias("_c"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            *[F.col(src).alias(out) for src, out in carry.items()]
        ).alias("_c"),
    ).select(l.columns)  # align column order
    # total order among right rows at equal (key, ts): the carried struct
    # itself (left rows sort after all right peers via _side anyway)
    w = (
        W.partitionBy(*on)
        .orderBy("_ts", "_side", "_c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        l.unionByName(r)
        # right rows always have a non-null struct (even if its fields are
        # null), so one ignorenulls-last takes the whole winning row
        .withColumn("_w", F.last("_c", ignorenulls=True).over(w))
    )
    out_df = carried.filter(F.col("_side") == 1)
    for _src, out in carry.items():
        out_df = out_df.withColumn(out, F.col("_w").getField(out))
    return out_df.drop("_ts", "_side", "_c", "_w")
