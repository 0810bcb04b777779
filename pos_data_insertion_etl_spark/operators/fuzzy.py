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


def sorted_neighborhood_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    window: int = 5,
    max_dist: int = 2,
) -> DataFrame:
    """Sorted-neighborhood fuzzy matching, the other classic record-
    linkage blocking: globally order records by the string key and
    compare each record only to its `window` successors. Catches
    near-matches an attribute block splits apart (the 'blue bolt' in
    size 5 vs size 9 problem of edit_distance_join) at the cost of
    missing pairs whose keys sort far apart.

    Scale: the global sort materializes as a TWO-PHASE sequence, not
    one partition -- rank = per-partition row_number + a driver-side
    prefix-sum of partition counts (operators/combine.py's q39
    pattern); neighbors then pair via a block equi-join on
    rank div window (same/adjacent blocks), never a theta join.

    Output: [id_a, id_b, name_a, name_b, dist] with dist <= max_dist,
    id_a/id_b ordered by the SORT (a precedes b), pairs within
    `window` positions.
    """
    from pyspark.sql.window import Window as W

    # deterministic global rank with a two-phase sequence
    part_rank = F.row_number().over(
        W.partitionBy(F.spark_partition_id()).orderBy("_s", "_id")
    )
    base = (
        df.select(
            F.col(id_col).alias("_id"), F.col(str_col).alias("_s")
        )
        .repartitionByRange(F.col("_s"), F.col("_id"))
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_pr", part_rank)
        .localCheckpoint(eager=False)
    )
    counts = {
        r._pid: r.c
        for r in base.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }  # O(partitions) driver payload
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    ranked = base.select(
        "_id", "_s", (off_expr[F.col("_pid")] + F.col("_pr")).alias("_rk")
    )
    a = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_s").alias("name_a"),
        F.col("_rk").alias("_ra"),
    ).withColumn(
        "_blk",
        F.explode(
            F.array(
                F.expr(f"_ra div {window}"), F.expr(f"_ra div {window} + 1")
            )
        ),
    )
    b = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_s").alias("name_b"),
        F.col("_rk").alias("_rb"),
    ).withColumn("_blk", F.expr(f"_rb div {window}"))
    return (
        a.join(b, "_blk")
        .filter(
            (F.col("_rb") > F.col("_ra"))
            & (F.col("_rb") - F.col("_ra") <= window)
            & (
                F.abs(F.length("name_a") - F.length("name_b"))
                <= F.lit(max_dist)
            )
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b",
                F.col("dist").cast("long").alias("dist"))
    )  # no distinct needed: b carries ONE block key and a's two
    #    exploded keys differ, so each pair matches in at most one block


def golden_records(
    df: DataFrame,
    id_col: str,
    str_col: str,
    window: int = 4,
    max_dist: int = 2,
) -> DataFrame:
    """End-to-end entity resolution: sorted-neighborhood candidate
    pairs -> connected-component entity clusters -> one canonical
    ("golden") record per entity. The survivorship rule is the
    deterministic minimum id within the cluster (swap in a
    completeness score upstream by re-keying the id).

    Scale composition: the pair stage is sorted_neighborhood_join's
    block equi-join (never all-pairs); the match graph is tiny
    relative to the input (pairs ~ duplicates), so clustering uses
    connected_components' adaptive driver/pointer-jumping path;
    singletons never enter the graph and join back as their own
    entity (left join + coalesce).

    Output: [id, name, entity_id, is_canonical, entity_size].
    """
    from .graph import connected_components

    pairs = sorted_neighborhood_join(
        df, id_col, str_col, window=window, max_dist=max_dist
    )
    comp = connected_components(
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
    )
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(str_col).alias("name"),
    )
    labeled = base.join(
        comp.select(F.col("node").alias("id"), "component"),
        "id",
        "left",
    ).select(
        "id",
        "name",
        F.coalesce("component", F.col("id")).alias("entity_id"),
    )
    sizes = labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("entity_size"),
        F.min("id").alias("_canon"),
    )
    return labeled.join(sizes, "entity_id").select(
        "id",
        "name",
        "entity_id",
        (F.col("id") == F.col("_canon")).alias("is_canonical"),
        "entity_size",
    )
