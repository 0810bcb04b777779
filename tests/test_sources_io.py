"""Format matrix roundtrips + the UDTF table-function surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table
from pos_data_insertion_etl_spark.sources.io import FORMATS, read_table, write_table
from pos_data_insertion_etl_spark.sources.udtf_source import register_udtfs


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip(spark, sf_smoke, tmp_path, fmt):
    src = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    path = str(tmp_path / f"orders_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.count() == src.count()
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b, fmt


def test_udtf_fixed_width_explode(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "AAAABBBBCC"), (2, "")], "id long, blob string"
    ).createOrReplaceTempView("blobs")
    rows = spark.sql(
        """SELECT id, t.record_idx, t.record
           FROM blobs, LATERAL fixed_width_explode(blob, 4) t
           ORDER BY id, t.record_idx"""
    ).collect()
    assert [(r.id, r.record_idx, r.record) for r in rows] == [
        (1, 0, "AAAA"),
        (1, 1, "BBBB"),
        (1, 2, "CC"),
    ]


def test_jdbc_options_assembly():
    """JDBC option assembly is testable without a DB/driver jar: default
    batchsize carries the reference's 150-row batching knob."""
    from pos_data_insertion_etl_spark.sources.io import jdbc_options

    opts = jdbc_options("jdbc:postgresql://h/db", "t_day_pos_daily_sku_data")
    assert opts == {
        "url": "jdbc:postgresql://h/db",
        "dbtable": "t_day_pos_daily_sku_data",
        "batchsize": "150",
    }
    opts = jdbc_options(
        "jdbc:x://h/db", "t", batchsize=500, isolationLevel="READ_COMMITTED",
        numPartitions=8,
    )
    assert opts["batchsize"] == "500"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert opts["numPartitions"] == "8"  # stringified for the writer


def test_schema_evolution_merge(spark, sf_smoke, tmp_path):
    """Appended files may add columns: mergeSchema reads old+new files as
    one table with NULLs for the missing column in old files."""
    base = load_table(spark, sf_smoke, "region")
    path = str(tmp_path / "evolving")
    base.write.parquet(path)
    base.withColumn("r_tier", F.lit("gold")).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "r_tier" in merged.columns
    n = base.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("r_tier").isNull()).count() == n
    assert merged.filter(F.col("r_tier") == "gold").count() == n


def test_parse_fixed_width_quarantine(spark):
    """Malformed records route to the quarantine with a reason; blank
    fields are missing values (valid), garbage casts are corruption."""
    from pos_data_insertion_etl_spark.operators.fixedwidth import (
        FixedWidthField,
        parse_fixed_width_quarantine,
    )

    fields = [
        FixedWidthField("qty", 1, 4, "int"),
        FixedWidthField("code", 5, 3),
        FixedWidthField("day", 8, 8, "date:yyyyMMdd"),
    ]
    rows = [
        ("0042ABC20240301", "ok"),
        ("    XYZ20240301", "ok_blank_qty"),      # blank int = missing, valid
        ("00x1ABC20240301", "bad_qty"),           # garbage int
        ("0042ABC2024ZZ01", "bad_day"),           # garbage date
        ("0042AB", "bad_width"),                  # truncated record
    ]
    df = spark.createDataFrame(rows, "rec string, label string")
    valid, quar = parse_fixed_width_quarantine(
        df, "rec", fields, expected_width=15, keep=["label"]
    )
    v = {r.label: r for r in valid.collect()}
    q = {r.label: r for r in quar.collect()}
    assert set(v) == {"ok", "ok_blank_qty"}
    assert v["ok"].qty == 42 and v["ok"].code == "ABC"
    assert v["ok_blank_qty"].qty is None
    assert set(q) == {"bad_qty", "bad_day", "bad_width"}
    assert q["bad_qty"]._reject_reason == "bad_field(qty)"
    assert q["bad_day"]._reject_reason == "bad_field(day)"
    assert q["bad_width"]._reject_reason.startswith("bad_width(")
    assert q["bad_width"].rec == "0042AB"  # raw record preserved


def test_jdbc_round_trip_embedded_derby(spark, tmp_path):
    """EXECUTED JDBC round-trip (not just option assembly): Spark
    bundles Derby for the Hive metastore, so the embedded driver gives
    a real database without any sandbox install. Write through
    write_jdbc with the reference's batchsize=150 knob (500 rows ->
    multiple batches per task), read back through the JDBC source, and
    check values and append semantics -- the closest executable parity
    to the reference's pyodbc fast_executemany sink
    (/root/reference/main.py:213-262)."""
    from pos_data_insertion_etl_spark.sources.io import write_jdbc

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    opts = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.range(500).selectExpr(
        "id", "cast(id * 1.5 as double) AS v", "concat('r', id) AS s"
    )
    write_jdbc(df, url, "POS_SINK", batchsize=150, **opts)

    def read_back():
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", "POS_SINK")
            .options(**opts)
            .load()
        )

    got = {(r.id, r.v, r.s) for r in read_back().collect()}
    assert got == {(i, i * 1.5, f"r{i}") for i in range(500)}

    # append mode: a second write adds, never truncates
    write_jdbc(df.filter("id < 10"), url, "POS_SINK", batchsize=150, **opts)
    assert read_back().count() == 510
    assert read_back().filter("id = 3").count() == 2
