"""Record combiner: N consecutive records -> one row.

Parity operator for the reference's `generate_combined_chunks`
(/root/reference/main.py:414-423: 1000 x 520-char records concatenated
into one 520,000-char insert row). In Spark this physical-layout trick is
obsolete (Parquet/JDBC batching replaces it), but the semantic operator is
still exposed: a deterministic, order-preserving grouped concatenation.

Scale design: the naive global `row_number()` window funnels the whole
dataset through ONE task. Instead the global sequence is built in two
phases -- range-partition on the ordering keys, rank locally per
partition, then add cumulative partition offsets (a tiny driver-side
prefix sum over partition counts). Every stage is parallel; the only
driver data is one count per partition. `order_by` must be a total
order (include a unique tiebreaker) for the output to be deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..smallframe import values_frame
from pyspark.sql.window import Window as W


def with_global_sequence(
    df: DataFrame, order_by: list[str | Column], seq_col: str = "_seq"
) -> DataFrame:
    """0-based dense global sequence by ``order_by``, fully parallel."""
    seq, _total = global_sequence_with_total(df, order_by, seq_col)
    return seq


def global_sequence_with_total(
    df: DataFrame, order_by: list[str | Column], seq_col: str = "_seq"
) -> tuple[DataFrame, int]:
    """`with_global_sequence` plus the TOTAL row count, for free: the
    driver already collects one count per range partition to build the
    offsets, so their sum is the exact global count -- consumers that
    need it (ntile_bins' tile arithmetic) fold it in as a literal
    instead of paying a separate count job + a crossJoin per call (r15
    optimization round)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parallelism, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = W.partitionBy("_pid").orderBy(*order_by)
    # localCheckpoint: the counts job and the downstream consumer must see
    # the SAME physical partitioning; without it AQE may re-plan the range
    # shuffle differently per action and the offsets go stale.
    local = (
        ranged.withColumn("_lrn", F.row_number().over(w_local))
        .localCheckpoint(eager=False)
    )
    # One count per range partition -> cumulative offsets (tiny:
    # O(partitions), never O(rows)). The guard keeps the driver honest if
    # someone wires in an absurd partition count.
    if parallelism > 100_000:
        raise ValueError(
            f"with_global_sequence: {parallelism} range partitions would "
            "collect too many per-partition counts on the driver; "
            "coalesce the input or raise the guard deliberately"
        )
    counts = {
        r["_pid"]: r["n"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = values_frame(
        df.sparkSession,
        [(int(pid), int(off)) for pid, off in offsets.items()],
        "_pid int, _offset long",
    )  # JVM literal: keeps the broadcast join Python-free (smallframe)
    seq = (
        local.join(F.broadcast(offset_df), "_pid")
        .withColumn(seq_col, (F.col("_offset") + F.col("_lrn") - 1).cast("long"))
        .drop("_pid", "_lrn", "_offset")
    )
    return seq, acc


def combine_records(
    df: DataFrame,
    record_col: str,
    order_by: list[str | Column],
    n: int = 1000,
    out_col: str = "combined",
) -> DataFrame:
    """Concatenate every `n` consecutive records (by `order_by`) into one.

    Deterministic under shuffles: rows are re-sorted inside each group by
    their sequence number before concatenation (sort_array over structs),
    so the result does not depend on collect_list arrival order.
    """
    seq = with_global_sequence(df, order_by)
    return (
        seq.withColumn("_grp", F.expr(f"_seq div {n}"))
        .groupBy(F.col("_grp").alias("group_id"))
        .agg(
            F.expr(
                f"concat_ws('', transform(sort_array(collect_list(struct(_seq, {record_col}))),"
                f" x -> x.{record_col}))"
            ).alias(out_col),
            F.count(F.lit(1)).alias("n_records"),
        )
    )
