"""Round-10 guard fixes (ADVICE r9, all four items).

* salted_join / salted_agg refuse inputs that already carry a `_salt`
  column (silent replace-then-drop would corrupt caller data);
* largest_remainder enforces its documented overflow contract
  (budget * total_w < 2^63) with a named raise_error instead of an
  anonymous ANSI overflow;
* q274's corpus read falls back to an empty frame when every batch
  gated/deduped to zero (exercised at the curation_ingest_batch level:
  no corpus/ directory is ever created);
* scaling_probe slopes survive sub-millisecond medians (unit-tested
  via the same formula on epsilon-clamped values).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.apportion import (
    largest_remainder,
)
from pos_data_insertion_etl_spark.operators.skew import (
    salted_agg,
    salted_join,
)


def test_salted_join_rejects_existing_salt_column(spark):
    big = spark.range(10).select("id", F.lit(0).alias("_salt"))
    small = spark.range(3).select("id")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(big, small, "id")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(small, big, "id")


def test_salted_agg_rejects_existing_salt_column(spark):
    df = spark.range(10).select("id", F.lit(0).alias("_salt"))
    with pytest.raises(ValueError, match="_salt"):
        salted_agg(
            df,
            ["id"],
            {"c": F.count(F.lit(1))},
            {"c": F.sum("c")},
        )


def test_salted_join_still_correct_without_collision(spark):
    big = spark.range(100).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(3).select(F.col("id").alias("k"))
    got = salted_join(big, small, "k", n_salts=4, join_hint="shuffle_hash")
    assert got.count() == 100


def test_largest_remainder_overflow_contract_raises(spark):
    df = spark.createDataFrame(
        [("a", 2**40), ("b", 2**40)], "key string, w long"
    )
    # budget * total_w = 2^30 * 2^41 = 2^71 > 2^63: named contract error
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(
        (SparkRuntimeException, Exception), match="largest_remainder"
    ):
        largest_remainder(df, "key", "w", budget=2**30).collect()


def test_largest_remainder_within_contract_unchanged(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "key string, w long"
    )
    rows = {
        r.key: r.alloc
        for r in largest_remainder(df, "key", "w", budget=10).collect()
    }
    assert sum(rows.values()) == 10
    assert sorted(rows.values()) == [3, 3, 4]


def test_curation_ingest_all_gated_creates_no_corpus(spark, tmp_path):
    """Every batch gates to zero -> corpus/ never exists; the q274
    fallback path (empty kept frame) must report n_kept=0."""
    import os

    from pos_data_insertion_etl_spark.streaming.jobs import (
        curation_ingest_batch,
    )

    out_dir = str(tmp_path / "curation")
    docs = spark.createDataFrame(
        [(0, "too short"), (1, "also short")], "doc_id long, text string"
    )
    curation_ingest_batch(
        docs, 0, out_dir, min_words=10,
        stopwords=("the", "a"), min_stopword_hits=1,
    )
    assert not os.path.isdir(os.path.join(out_dir, "corpus"))
    funnel = spark.read.parquet(os.path.join(out_dir, "funnel"))
    row = funnel.collect()[0]
    assert (row.n_raw, row.n_gated) == (2, 0)


def test_scaling_slope_formula_survives_zero_median():
    # the probe's epsilon-clamped slope formula: a 0.0 median must not
    # crash (log10(0)) -- it degrades to a large-magnitude finite slope
    lo, hi = 0.0, 0.004
    slope = math.log10(max(hi, 1e-9) / max(lo, 1e-9)) / math.log10(10.0)
    assert math.isfinite(slope)
