"""Record combiner: N consecutive records -> one row.

Parity operator for the reference's `generate_combined_chunks`
(/root/reference/main.py:414-423: 1000 x 520-char records concatenated
into one 520,000-char insert row). In Spark this physical-layout trick is
obsolete (Parquet/JDBC batching replaces it), but the semantic operator is
still exposed: a deterministic, order-preserving grouped concatenation.

Scale note: each output group is built by one task from ~N consecutive
records; grouping keys are dense integers so the shuffle is balanced.
The global row_number over a single ordering is the one inherently
serial step -- for 100 TB you would instead derive `seq` from a
per-file/per-partition offset (see sources.zipsource), which keeps this
operator fully parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


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
    w = W.orderBy(*order_by)
    seq = df.withColumn("_seq", F.row_number().over(w) - 1)
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
