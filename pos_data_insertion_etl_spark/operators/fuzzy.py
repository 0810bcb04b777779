"""Blocked fuzzy matching (edit-distance similarity join).

The record-linkage / entity-resolution staple the set-based dedup
family cannot serve: 'blue bolt' vs 'blue belt' share almost no
trigram SETS but are one edit apart. Standard practice is BLOCKED
comparison -- a cheap equi-key (size class, zip code, sorted
neighborhood key) bounds the candidate pairs, then the quadratic
edit-distance check runs only within blocks. The blocking column is
the caller's lever: this operator makes the block explicit and guards
it (`max_block`), exactly like itemsets.copurchase_pairs guards
basket size -- an unblocked fuzzy join IS all-pairs and no engine
saves you.

Determinism: levenshtein() is unit-cost edit distance in both Spark
and DuckDB (probed identical, including empty-string cases); the
length-difference prefilter (|len(a)-len(b)| <= d, a lower bound on
edit distance) is exact integer logic that prunes most of each block
before the DP runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    block_col: str,
    max_dist: int = 2,
    max_block: int = 1000,
) -> DataFrame:
    """All within-block pairs (id_a < id_b) with edit distance
    <= max_dist. Output: [id_a, id_b, name_a, name_b, dist]."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.col(block_col).alias("_blk"),
    )
    sized = (
        base.withColumn(
            "_bsz", F.count(F.lit(1)).over(W.partitionBy("_blk"))
        )
        .filter(F.col("_bsz") <= max_block)
        .drop("_bsz")
        .localCheckpoint(eager=False)
    )  # both self-join sides from one scan
    a = sized.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("name_a"), "_blk"
    )
    b = sized.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("name_b"), "_blk"
    )
    return (
        a.join(b, "_blk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b"))
                <= F.lit(max_dist)
            )
        )
        .withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("dist") <= F.lit(max_dist))
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            F.col("dist").cast("long").alias("dist"),
        )
    )
