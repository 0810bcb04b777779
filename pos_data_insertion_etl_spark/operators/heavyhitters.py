"""Approximate frequent items (heavy hitters) in ONE pass with bounded
memory: distributed Misra-Gries summaries.

The exact `groupBy(col).count()` answer shuffles every distinct value;
when the value space is huge (URLs, shingles, user agents at 100 TB)
and only the head matters, a Misra-Gries summary of size k per
partition bounds BOTH memory and shuffle: each partition ships at most
k (value, count, decrement) triples regardless of row count, and
summaries merge associatively (counter-wise add, then the standard
re-decrement to k entries).

Guarantees (the textbook ones, partition-layout-independent even
though the intermediate summaries are not):

* every value with true frequency > n/(k+1) IS in the result
  (no false negatives above the threshold);
* each reported lower-bound count underestimates the true count by at
  most the summary's total decrement, which the operator REPORTS, so
  callers can certify `count_lb <= true <= count_lb + max_err`.

The final merge happens on the driver over at most
(n_partitions x k) triples -- metadata-sized, like the codebook
collects in operators/similarity. For an exact head afterwards,
re-count just the candidates with one semi-join (provided here as
``exact_recount=True``), turning the sketch into a two-pass exact
top-k whose first pass never shuffles the tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..smallframe import values_frame


def _mg_reduce(pairs, k: int):
    """Classic Misra-Gries over an iterable of (value, count) pairs.
    Returns (counters dict, total_decrement)."""
    counters: dict = {}
    dec_total = 0
    for v, c in pairs:
        if v in counters:
            counters[v] += c
        elif len(counters) < k:
            counters[v] = c
        else:
            # decrement all by the min of (c, current min) repeatedly;
            # batch form: d = min(c, min(counters.values()))
            d = min(c, min(counters.values()))
            dec_total += d
            c2 = c - d
            for key in list(counters):
                counters[key] -= d
                if counters[key] == 0:
                    del counters[key]
            if c2 > 0:
                if v in counters:
                    counters[v] += c2
                elif len(counters) < k:
                    counters[v] = c2
                # else: value fully decremented away this round
    return counters, dec_total


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    exact_recount: bool = False,
) -> DataFrame:
    """[value, count_lb, max_err] (plus ``count_exact`` when
    ``exact_recount``): candidate heavy hitters with certified bounds.

    One `mapInPandas` pass builds a k-entry Misra-Gries summary per
    partition (Arrow batches, value_counts per batch -- the Python cost
    is per DISTINCT value per batch, not per row); the driver merges
    the <= partitions x k triples. With ``exact_recount`` a second
    scan counts ONLY the candidates (broadcast semi-join) -- exact head
    counts with the tail never shuffled.
    """

    def partial(iterator):
        import pandas as pd

        counters: dict = {}
        dec = 0

        for pdf in iterator:
            vc = pdf[value_col].value_counts()
            counters, d = _mg_reduce(
                list(counters.items()) + list(zip(vc.index, vc.values)), k
            )
            dec += d
        if counters:
            yield pd.DataFrame(
                {
                    "value": list(counters.keys()),
                    "c": [int(x) for x in counters.values()],
                    "dec": [dec] + [0] * (len(counters) - 1),
                }
            )

    partials = df.select(F.col(value_col).alias(value_col)).mapInPandas(
        partial, schema="value string, c long, dec long"
    )
    rows = partials.collect()
    merged, merge_dec = _mg_reduce(((r.value, r.c) for r in rows), k)
    total_dec = merge_dec + sum(r.dec for r in rows)

    spark = df.sparkSession
    # values_frame: the merged sketch feeds per-batch monitor writes
    # (q211); a Python-backed local relation costs ~5 s per write.
    out = values_frame(
        spark,
        [(str(v), int(c), int(total_dec)) for v, c in sorted(merged.items())],
        "value string, count_lb long, max_err long",
    )
    if not exact_recount:
        return out
    exact = (
        df.select(F.col(value_col).cast("string").alias("value"))
        .join(F.broadcast(out.select("value")), "value")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("count_exact"))
    )
    return out.join(exact, "value")


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency estimates for EVERY value.


def countmin_sketch(
    df: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> list[list[int]]:
    """Build a depth x width Count-Min sketch of the column, fully
    engine-side: each (row, depth) pair increments one bucket, computed
    with seeded md5 hashes -- deterministic, so the sketch (integer
    sums, associative) is bit-identical under any partitioning, unlike
    the Misra-Gries intermediates above.

    The heavy work is ONE groupBy over (depth, bucket) -- at most
    depth x width groups regardless of cardinality -- with map-side
    combine; the depth x width ints (driver-side result) are the whole
    sketch, mergeable across corpora by element-wise add.

    Estimates: `countmin_estimate(sketch, value)` >= true count always
    (no under-count), over-count bounded by ~ 2n/width per the standard
    analysis.
    """
    rows = (
        df.select(F.col(value_col).cast("string").alias("v"))
        .select(
            *[
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"cm{d}|"), F.col("v"))), 1, 15),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias(f"b{d}")
                for d in range(depth)
            ]
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).cast("int").alias("d"),
                            F.col(f"b{d}").alias("b"),
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("s")
        )
        .groupBy("s.d", "s.b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    sketch = [[0] * width for _ in range(depth)]
    for r in rows:
        sketch[r.d][r.b] = r.c
    return sketch


def countmin_estimate(sketch: list[list[int]], value: str) -> int:
    """Point-query the sketch with the same seeded hashes."""
    import hashlib

    width = len(sketch[0])
    est = None
    for d, row in enumerate(sketch):
        h = int(
            hashlib.md5(f"cm{d}|{value}".encode()).hexdigest()[:15], 16
        ) % width
        est = row[h] if est is None else min(est, row[h])
    return int(est)
