"""Mart pipeline parity: the five stored-proc contracts re-derived in
pure Python over the fixture must equal the Spark pipeline's output
(SURVEY.md §5 pipeline-parity strategy)."""

from __future__ import annotations

import collections
import datetime

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.retention import retention_filter
from pos_data_insertion_etl_spark.pipeline.marts import (
    BUSINESS_DATE,
    run_pos_pipeline,
    sku_merge,
    sku_temp,
)
from pos_data_insertion_etl_spark.sources.zipsource import read_zip_fixed_width

from .pos_fixture import build_fixture, write_zip


@pytest.fixture(scope="module")
def pipeline_result(spark, tmp_path_factory):
    records, rows = build_fixture()
    path = tmp_path_factory.mktemp("pos") / "R520.20240301_214500.zip"
    write_zip(records, str(path), partial_tail="X" * 100)
    result = run_pos_pipeline(spark, str(path))
    return result, rows, str(path)


def test_sku_mart_dedups_exactly(pipeline_result):
    result, rows, _ = pipeline_result
    sku = result["marts"]["t_day_pos_daily_sku_data"]
    got = sku.count()
    # fixture emits exact duplicates; keyed merge keeps one per key
    assert got == len(rows)


def test_sku_mart_values(pipeline_result):
    result, rows, _ = pipeline_result
    sku = result["marts"]["t_day_pos_daily_sku_data"]
    got = {
        (r[BUSINESS_DATE], r["store_id"], r["txn_id"], r["sku"]): (
            r["quantity"],
            int(r["unit_price"]),
            int(r["sales_amount"]),
            int(r["discount_amount"]),
            r["customer_count_flag"],
            r["payment_code"],
        )
        for r in sku.collect()
    }
    exp = {
        (r["business_date"], r["store_id"], r["txn_id"], r["sku"]): (
            r["quantity"],
            r["unit_price"],
            r["sales_amount"],
            r["discount_amount"],
            r["customer_count_flag"],
            r["payment_code"],
        )
        for r in rows
    }
    assert got == exp


def test_customer_count_mart(pipeline_result):
    result, rows, _ = pipeline_result
    mart = result["marts"]["t_day_ten_kyakusu_data"]
    exp = collections.Counter()
    for r in rows:
        exp[(r["business_date"], r["store_id"])] += r["customer_count_flag"]
    got = {
        (r[BUSINESS_DATE], r["store_id"]): r["customer_count"]
        for r in mart.collect()
    }
    assert got == dict(exp)


def test_daily_sales_mart(pipeline_result):
    result, rows, _ = pipeline_result
    mart = result["marts"]["t_day_sales"]
    sales = collections.Counter()
    qty = collections.Counter()
    txns = collections.defaultdict(set)
    for r in rows:
        k = (r["business_date"], r["store_id"], r["dept_code"])
        sales[k] += r["sales_amount"]
        qty[k] += r["quantity"]
        txns[k].add(r["txn_id"])
    for row in mart.collect():
        k = (row[BUSINESS_DATE], row["store_id"], row["dept_code"])
        assert int(row["sales_amount"]) == sales[k]
        assert row["quantity"] == qty[k]
        assert row["txn_count"] == len(txns[k])
    assert mart.count() == len(sales)


def test_sales_front_mart(pipeline_result):
    result, rows, _ = pipeline_result
    mart = result["marts"]["t_day_ten_sales_front_data_daily"]
    sales = collections.Counter()
    txns = collections.defaultdict(set)
    for r in rows:
        k = (r["business_date"], r["store_id"])
        sales[k] += r["sales_amount"]
        txns[k].add(r["txn_id"])
    for row in mart.collect():
        k = (row[BUSINESS_DATE], row["store_id"])
        assert int(row["sales_amount"]) == sales[k]
        assert row["txn_count"] == len(txns[k])


def test_merge_idempotent(spark, pipeline_result):
    """SP_Process_Daily_SKU_Data re-runs per batch (main.py:509-514):
    merging the temp table twice must equal merging it once."""
    _, _, path = pipeline_result
    temp = sku_temp(read_zip_fixed_width(spark, path))
    once = sku_merge(temp)
    twice = sku_merge(temp.unionAll(temp))
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_run_metrics(pipeline_result):
    result, rows, _ = pipeline_result
    m = result["metrics"]
    assert m["is_file_failed"] is False
    assert isinstance(m["total_rows_processed"], str)  # reference emits str
    # records = keyed rows + duplicates + 1 partial tail
    assert int(m["total_rows_processed"]) > len(rows)
    assert m["total_data_processed_mb"] > 0
    assert m["total_time_seconds"] > 0


def test_retention_on_mart(pipeline_result):
    """daily_cleanup.py:19-38 semantics: keep rows >= max_day - 4d."""
    result, rows, _ = pipeline_result
    sku = result["marts"]["t_day_pos_daily_sku_data"]
    kept = retention_filter(
        sku.withColumn("_d", F.col(BUSINESS_DATE).cast("timestamp")), "_d", 4
    )
    days = sorted({r["business_date"] for r in rows})
    cutoff = max(days) - datetime.timedelta(days=4)
    exp = sum(1 for r in rows if r["business_date"] >= cutoff)
    assert kept.count() == exp


def test_nonascii_partition_roundtrip(spark, tmp_path, pipeline_result):
    """当稼動日 must survive a day-partitioned parquet round-trip
    (FIXTURES.md A4)."""
    result, _, _ = pipeline_result
    mart = result["marts"]["t_day_ten_kyakusu_data"]
    out = str(tmp_path / "kyakusu")
    mart.write.mode("overwrite").partitionBy(BUSINESS_DATE).parquet(out)
    back = spark.read.parquet(out)
    assert BUSINESS_DATE in back.columns
    assert back.count() == mart.count()
    # partition column comes back as the same values
    a = {tuple(r) for r in mart.select(BUSINESS_DATE, "store_id").collect()}
    b = {tuple(r) for r in back.select(BUSINESS_DATE, "store_id").collect()}
    assert a == b
