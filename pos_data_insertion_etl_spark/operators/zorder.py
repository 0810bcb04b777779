"""Z-order (Morton) clustering keys for data-skipping layouts.

Writing a table range-partitioned and sorted by a Z-order key over two
correlated filter columns gives every file a TIGHT min/max envelope on
BOTH columns, so parquet row-group / file pruning works for predicates
on either column -- the standard lakehouse clustering trick (Delta/
Iceberg `OPTIMIZE ZORDER BY`), expressed here with nothing but
DataFrame expressions + repartitionByRange.

Everything is exact integer arithmetic: columns are scaled into
2^bits buckets from their global min/max (scalar broadcast -- one tiny
agg, never a collect of data rows), and the Morton key interleaves the
bucket bits with shift/mask expressions inside whole-stage codegen.
At 100 TB the cost is one extra range shuffle at write time, repaid on
every pruned read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(xb: Column, yb: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two bucket ids: x's bit i
    lands at position 2i+1, y's at 2i (x-major Morton order)."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(xb.cast("long"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(yb.cast("long"), i).bitwiseAND(F.lit(1))
        key = key + F.shiftleft(xbit, 2 * i + 1) + F.shiftleft(ybit, 2 * i)
    return key


def _bucket(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Scale v into [0, 2^bits - 1] from the global [vmin, vmax].
    Integer-exact for ranges where (v-min)*(2^bits-1) < 2^53 (floor of
    an exactly-representable double); degenerate single-value ranges
    map to bucket 0."""
    top = F.lit((1 << bits) - 1)
    span = (vmax - vmin).cast("double")
    return (
        F.when(span > 0,
               F.floor((v - vmin).cast("double") * top / span))
        .otherwise(F.lit(0))
        .cast("long")
    )


def with_zorder_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
) -> DataFrame:
    """Append [xb, yb, zkey]: bucket ids and the Morton key computed
    against the columns' GLOBAL min/max (broadcast scalars)."""
    if not 1 <= bits <= 20:
        raise ValueError(f"bits must be in [1, 20], got {bits}")
    bounds = df.agg(
        F.min(x_col).cast("long").alias("_xmin"),
        F.max(x_col).cast("long").alias("_xmax"),
        F.min(y_col).cast("long").alias("_ymin"),
        F.max(y_col).cast("long").alias("_ymax"),
    )
    staged = df.crossJoin(F.broadcast(bounds))
    xb = _bucket(
        F.col(x_col).cast("long"), F.col("_xmin"), F.col("_xmax"), bits
    )
    yb = _bucket(
        F.col(y_col).cast("long"), F.col("_ymin"), F.col("_ymax"), bits
    )
    return (
        staged.withColumn("xb", xb)
        .withColumn("yb", yb)
        .withColumn("zkey", morton_interleave(F.col("xb"), F.col("yb"), bits))
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
    )


def zorder_cluster(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster rows for writing: range-partition on the Z-order key and
    sort within partitions, so each output file covers a contiguous,
    non-overlapping zkey range (= a tight 2-D tile of the key space).
    Write the result with any parquet writer; file stats then prune on
    both columns."""
    keyed = with_zorder_key(df, x_col, y_col, bits)
    parts = (
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    return keyed.repartitionByRange(parts, "zkey").sortWithinPartitions(
        "zkey"
    )
