#!/usr/bin/env python3
"""Deterministic BENCH-ONLY sf1.0 dataset (VERDICT r9 item 1).

/root/testdata tops out at sf0.1, leaving the scaling probe one decade
short of the question that matters (does any heavy entry go
super-linear at the next decade?). This generator synthesizes a ~10x
dataset by KEY-REMAPPED REPLICATION of sf0.1 -- ten copies of every
fact table with disjoint key spaces -- so every distribution the
operators care about (group sizes, join fan-outs, text lengths, graph
degree structure) is preserved exactly while row counts scale 10x.

Bench-only, NOT oracle data: the driver's correctness gate stays at
sf0.01 against /root/testdata; this dataset exists solely so
tools/scaling_probe.py can measure the fourth decade. It is written
under .benchdata/ (gitignored) and regenerated on demand -- every
transformation below is deterministic (no rand(), no time), so two
generations are bit-identical modulo parquet file layout.

Copy-decorrelation (the part plain UNION ALL would get wrong):

* ``documents.text``: copy c > 0 prefixes every non-gate-stopword,
  non-empty token with ``c{c}`` -- token counts, word lengths, and
  the curation gate's stopword hits ("the"/"a") are preserved, but
  shingle sets across copies are disjoint, so near-dup/setsim answers
  scale LINEARLY (10 independent corpora) instead of exploding
  quadratically on 10 identical clones, which would corrupt the slope
  this dataset exists to measure. ``n_chars`` is recomputed.
* ``embeddings.embedding``: copy c flips component signs by the bit
  pattern of c (component i negated when bit (i mod 4) of c is set),
  decorrelating cosine structure across copies while preserving norms
  and within-copy geometry exactly.
* keys: every key column shifts by copy * 10^9 (BIGINT-safe), so
  foreign-key joins stay consistent within a copy and never cross
  copies.

region/nation stay as-is (dimensions shared by all copies -- exactly
how a 10x-bigger TPC-H behaves: nation count does not grow with SF).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF1_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get(
    "SPARK_GRAFT_SF1_OUT",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata",
        "sf1.0",
    ),
)
K = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))
STRIDE = 1_000_000_000

#: exactly the tokens the curation gate counts (streaming/jobs +
#: bench_curation use stopwords=("the", "a")); kept verbatim so gate
#: pass rates match sf0.1 per copy.
_GATE_STOPWORDS = ("the", "a")


def _shift(col: str, c: int):
    return (F.col(col) + F.lit(c * STRIDE)).alias(col)


def _copy_text(c: int):
    # Copy 0 is the sf0.1 corpus verbatim -- prefixing it too (the
    # ADVICE r10 bug) grew every non-stopword token by 2 chars, so
    # mean_word_len/alpha metrics and Gopher gate selectivity at sf1.0
    # silently diverged from "10x sf0.1". Copies 1..K-1 stay prefixed:
    # their shingle sets are disjoint from copy 0 and from each other.
    if c == 0:
        return F.col("text").alias("text")
    sw = ", ".join(f"'{w}'" for w in _GATE_STOPWORDS)
    return F.expr(
        "array_join(transform(split(text, ' '), x -> "
        f"CASE WHEN x = '' OR x IN ({sw}) THEN x "
        f"ELSE concat('c{c}', x) END), ' ')"
    ).alias("text")


def _copy_embedding(c: int):
    # sign_i = 1 - 2 * bit(c, i mod 4): copy 0 is all +1 (identity)
    return F.expr(
        "transform(embedding, (v, i) -> "
        f"v * (1 - 2 * ((int({c}) >> (i % 4)) & 1)))"
    ).cast("array<float>").alias("embedding")


def _replicate(df: DataFrame, per_copy) -> DataFrame:
    out = per_copy(df, 0)
    for c in range(1, K):
        out = out.unionByName(per_copy(df, c))
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count() or 4)}]"
        )
        .appName("make-sf1-benchdata")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    os.makedirs(OUT, exist_ok=True)

    from pos_data_insertion_etl_spark.catalog import load_table

    def read(t):
        return load_table(spark, SRC, t)

    plans = {
        "customer": lambda df, c: df.select(
            _shift("c_custkey", c),
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        ),
        "supplier": lambda df, c: df.select(
            _shift("s_suppkey", c), "s_name", "s_nationkey", "s_acctbal"
        ),
        "part": lambda df, c: df.select(
            _shift("p_partkey", c),
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        ),
        "orders": lambda df, c: df.select(
            _shift("o_orderkey", c),
            _shift("o_custkey", c),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ),
        "lineitem": lambda df, c: df.select(
            _shift("l_orderkey", c),
            _shift("l_partkey", c),
            _shift("l_suppkey", c),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ),
        "events": lambda df, c: df.select(
            _shift("event_id", c),
            "ts",
            _shift("user_id", c),
            "event_type",
            "value",
            "props",
        ),
        "documents": lambda df, c: df.select(
            _shift("doc_id", c),
            _copy_text(c),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text").cast("long")),
        "embeddings": lambda df, c: df.select(
            _shift("vec_id", c), _copy_embedding(c), "label"
        ),
    }

    for t in ("region", "nation"):
        read(t).write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))
        print(f"{t}: copied", file=sys.stderr)
    for t, per_copy in plans.items():
        df = _replicate(read(t), per_copy)
        df.write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))
        print(f"{t}: x{K} written", file=sys.stderr)
    spark.stop()
    print(OUT)


if __name__ == "__main__":
    main()
