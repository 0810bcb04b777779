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
    if "_salt" in df.columns:
        raise ValueError(
            "salted_agg: input already has a '_salt' column; rename it "
            "before salting"
        )
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


def join_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """EXACT join-key skew diagnosis: the table an engineer consults
    before choosing broadcast/salting/AQE settings for a join on
    ``key_col``. Complements the Misra-Gries sketch
    (operators/heavyhitters.py): the sketch is the streaming-scale
    estimate; this is the exact report when one aggregation pass is
    affordable.

    Per heavy key (top ``top_k`` by count, key tiebreak): its count,
    share of all rows, and cumulative share -- plus the global key
    count and row total on every row so the report is self-contained.

    Shape: one groupBy(key) shuffle (map-side combine absorbs the hot
    keys), then windows over the TINY top-k frame against broadcast
    scalar totals. Key cardinality never lands on the driver.
    """
    from pyspark.sql.window import Window as W

    counts = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
    )
    # orderBy+limit plans TakeOrderedAndProject (per-partition top-k,
    # merged on the driver) -- never a single-partition window over the
    # full key cardinality; the rank window then runs on <= top_k rows.
    top_small = counts.orderBy(F.desc("cnt"), key_col).limit(top_k)
    w_rank = W.orderBy(F.desc("cnt"), key_col)
    top = top_small.withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    )
    w_cum = W.orderBy("rank").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "rank",
            F.col(key_col),
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.col("cnt").cast("double") / F.col("total_rows"), 6)
            .alias("share"),
            F.round(
                F.sum("cnt").over(w_cum).cast("double")
                / F.col("total_rows"),
                6,
            ).alias("cum_share"),
            "n_keys",
            "total_rows",
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: Column | None = None,
    join_hint: str | None = None,
) -> DataFrame:
    """Skew-safe equi join: salt the BIG side, replicate the SMALL side.

    When the join key is heavily skewed (a handful of values owning most
    rows) and the small side is too large -- or contractually forbidden --
    to broadcast, a plain shuffle join lands every hot key in one task.
    Salting splits each hot key across ``n_salts`` shuffle partitions:

    * big side gains ``_salt = pmod(salt_source, n_salts)`` -- a pure
      projection, no extra pass;
    * small side is exploded once per salt value (an ``n_salts``-way
      row multiply of the SMALL side only);
    * the join runs on ``(key, _salt)``, so a key that owned 1/k of the
      data now spreads over ``n_salts`` tasks.

    Result is row-identical to the plain join (every big row meets its
    small match exactly once, at its own salt). ``salt_source`` must be
    a deterministic per-row column (e.g. a unique id); it defaults to
    ``spark_partition_id()`` which is fast but not stable across runs --
    fine for the values (identical either way), not for debugging.

    At 100 TB: the small side's replication cost is n_salts * |small|
    rows shuffled -- choose n_salts ~ (hot-key rows / target task rows),
    not larger. AQE's skew-join handles sort-merge cases adaptively;
    this operator is the explicit form that also covers hash joins and
    pre-AQE plan pinning.

    ``join_hint`` (e.g. ``"shuffle_hash"`` / ``"merge"``) pins the
    physical strategy on the replicated side. Salting only pays off
    when the join SHUFFLES the big side -- if the small side fits the
    broadcast threshold, Catalyst broadcasts it and the salt is inert
    (a broadcast join has no skew problem to begin with). Pass a
    shuffle hint when demonstrating or testing the salted path at
    sizes Catalyst would otherwise broadcast.
    """
    for side, cols in (("big", big.columns), ("small", small.columns)):
        if "_salt" in cols:
            # withColumn would silently REPLACE the caller's column and
            # the final drop would erase it -- fail loudly instead.
            raise ValueError(
                f"salted_join: {side} input already has a '_salt' column; "
                "rename it before salting"
            )
    salt = (
        F.pmod(salt_source, F.lit(n_salts))
        if salt_source is not None
        else F.pmod(F.spark_partition_id(), F.lit(n_salts))
    ).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt",
        F.explode(
            F.array(*[F.lit(i).cast("int") for i in range(n_salts)])
        ),
    )
    if join_hint is not None:
        small_s = small_s.hint(join_hint)
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
