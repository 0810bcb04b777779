"""Per-operator unit tests for round-9 batch X (q287-q288): the
Spark 4 VariantType extraction path and collation-aware grouping.
Hand frames pinning the semantics the registered queries rely on."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_variant_get_typed_extraction_and_missing_path(spark):
    """variant_get returns a TYPED value for present paths and NULL
    for absent ones (no error) -- the contract q287 leans on."""
    df = spark.createDataFrame(
        [('{"k": 7, "s": "x"}',), ('{"s": "y"}',), ('{"k": -3}',)],
        "props string",
    )
    got = (
        df.select(F.parse_json("props").alias("v"))
        .select(F.expr("variant_get(v, '$.k', 'bigint')").alias("k"))
        .collect()
    )
    assert [r.k for r in got] == [7, None, -3]
    # and the dtype is plain bigint (no variant leaks out)
    out = df.select(F.parse_json("props").alias("v")).select(
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k")
    )
    assert out.dtypes == [("k", "bigint")]


def test_collated_group_merges_case_variants(spark):
    """UTF8_LCASE grouping merges case variants exactly like
    GROUP BY lower(...); the output cast strips the collation from
    the dtype (it must never reach a typed hash)."""
    df = spark.createDataFrame(
        [("Apple", 1), ("APPLE", 2), ("apple", 4), ("Banana", 8)],
        "w string, x int",
    )
    g = (
        df.groupBy(F.collate(F.col("w"), "UTF8_LCASE").alias("_ci"))
        .agg(F.sum("x").alias("sx"))
        .select(
            F.expr("CAST(lower(_ci) AS STRING COLLATE UTF8_BINARY)").alias(
                "w"
            ),
            "sx",
        )
    )
    assert g.dtypes[0] == ("w", "string")
    got = {r.w: r.sx for r in g.collect()}
    assert got == {"apple": 7, "banana": 8}


def test_collated_filter_equality(spark):
    """Equality under UTF8_LCASE is case-insensitive -- the filter
    form of the same collation surface."""
    df = spark.createDataFrame([("MiXeD",), ("other",)], "w string")
    n = df.filter(
        F.collate(F.col("w"), "UTF8_LCASE") == F.lit("mixed")
    ).count()
    assert n == 1
