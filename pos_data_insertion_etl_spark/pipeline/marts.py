"""The POS mart pipeline: the reference's five opaque stored procedures
(SURVEY.md §2.3, invoked at /root/reference/main.py:509-514 and
main.py:590-596) re-derived as named DataFrame transformations over the
pinned R520 record layout (FIXTURES.md A2).

Contract notes:
* Column `当稼動日` (business date) keeps its literal Japanese
  identifier end-to-end -- the only column name the reference exposes
  (daily_cleanup.py:30) -- exercising non-ASCII schema round-trips.
* `sku_merge` is idempotent (the reference re-runs
  SP_Process_Daily_SKU_Data after every batch, main.py:509-514): keyed
  dedup with a deterministic keeper, so merge(temp ++ temp) == merge(temp).
* Money columns are DecimalType (JPY, no minor units); quantities are
  integers -- per FIXTURES.md A2.

Scale: the marts are plain shuffles on (day, store[, dept]) -- low
cardinality, heavy map-side partial aggregation; the final tables are
day-partitioned so the 4-day retention delete prunes partitions.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation
from pyspark.sql.window import Window as W

from ..operators.fixedwidth import FixedWidthField, parse_fixed_width
from ..sources.zipsource import read_zip_fixed_width, read_zip_fixed_width_staged

BUSINESS_DATE = "当稼動日"

# FIXTURES.md A2: the pinned 520-char R520 record layout (1-based char
# offsets; the reference slices decoded characters, main.py:482).
R520_FIELDS = [
    FixedWidthField("record_type", 1, 4),
    FixedWidthField(BUSINESS_DATE, 5, 12 - 5 + 1, "date:yyyyMMdd"),
    FixedWidthField("store_id", 13, 6),
    FixedWidthField("register_id", 19, 4),
    FixedWidthField("txn_id", 23, 10),
    FixedWidthField("txn_time", 33, 6),
    FixedWidthField("sku", 39, 13),
    FixedWidthField("dept_code", 52, 4),
    FixedWidthField("quantity", 56, 6, "int", trim=True),
    FixedWidthField("unit_price", 62, 10, "decimal(10,0)", trim=True),
    FixedWidthField("sales_amount", 72, 12, "decimal(12,0)", trim=True),
    FixedWidthField("discount_amount", 84, 10, "decimal(10,0)", trim=True),
    FixedWidthField("customer_count_flag", 94, 1, "int"),
    FixedWidthField("payment_code", 95, 2),
]

SKU_KEY = [BUSINESS_DATE, "store_id", "txn_id", "sku"]


def write_day_partitioned(
    df: DataFrame, path: str, files_per_day: int = 4, mode: str = "overwrite"
) -> None:
    """Day-partitioned parquet write without the small-files explosion.

    A naive `partitionBy(day)` write makes every task emit one file per
    day it happens to hold -- up to tasks x days tiny files. Clustering
    by (day, salt) first bounds output at ``files_per_day`` files per day
    while still spreading a big day across that many tasks (one
    repartition shuffle; salt = hash(store) so rows of a store stay
    together for downstream store-grain reads)."""
    clustered = df.repartition(
        F.col(BUSINESS_DATE), F.pmod(F.hash("store_id"), F.lit(files_per_day))
    )
    clustered.write.mode(mode).partitionBy(BUSINESS_DATE).parquet(path)


def sku_temp(records: DataFrame, record_col: str = "record") -> DataFrame:
    """SP_Process_Daily_SKU_Data_Temp (main.py:510): parse raw fixed-width
    records into the typed SKU temp table. Partial trailing records
    (shorter than the layout) parse to nulls and are dropped here, like
    the stored-proc tier would reject malformed rows."""
    keep = [c for c in ("source_file", "record_idx") if c in records.columns]
    parsed = parse_fixed_width(records, record_col, R520_FIELDS, keep=keep)
    return parsed.filter(
        F.col(BUSINESS_DATE).isNotNull() & (F.col("record_type") == "R520")
    )


def sku_merge(temp: DataFrame) -> DataFrame:
    """SP_Process_Daily_SKU_Data (main.py:512): merge temp into the final
    SKU mart, idempotently. Keyed dedup with a deterministic keeper
    (lowest record_idx / register order) so per-batch re-runs converge."""
    # source_file leads the keeper order: record_idx restarts per source
    # file, so (source_file, record_idx) is the total order that makes the
    # keeper deterministic when the same key appears in two daily files.
    order_cols = [
        c
        for c in ("source_file", "record_idx", "register_id", "txn_time")
        if c in temp.columns
    ]
    w = W.partitionBy(*SKU_KEY).orderBy(*order_cols) if order_cols else W.partitionBy(
        *SKU_KEY
    ).orderBy("quantity")
    return (
        temp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def customer_count_mart(sku: DataFrame) -> DataFrame:
    """SP_T_DAY_TEN_KYAKUSU_DATA (main.py:511): store customer counts
    (店=store, 客数=customer count) per business day."""
    return sku.groupBy(BUSINESS_DATE, "store_id").agg(
        F.sum("customer_count_flag").cast("long").alias("customer_count")
    )


def daily_sales_mart(sku: DataFrame) -> DataFrame:
    """SP_Process_Daily_Sales_Data (main.py:592): daily sales rollup per
    (day, store, dept)."""
    return sku.groupBy(BUSINESS_DATE, "store_id", "dept_code").agg(
        F.sum("sales_amount").cast("decimal(14,0)").alias("sales_amount"),
        F.sum("discount_amount").cast("decimal(12,0)").alias("discount_amount"),
        F.sum("quantity").cast("long").alias("quantity"),
        F.countDistinct("txn_id").alias("txn_count"),
    )


def sales_front_mart(daily_sales: DataFrame, sku: DataFrame) -> DataFrame:
    """SP_T_DAY_TEN_SALES_FRONT_DATA_DAILY (main.py:593): store-front
    presentation rollup to (day, store). txn_count is recomputed from the
    SKU grain (distinct transactions aren't additive across depts)."""
    per_store = daily_sales.groupBy(BUSINESS_DATE, "store_id").agg(
        F.sum("sales_amount").cast("decimal(14,0)").alias("sales_amount"),
        F.sum("discount_amount").cast("decimal(12,0)").alias("discount_amount"),
        F.sum("quantity").cast("long").alias("quantity"),
    )
    txns = sku.groupBy(BUSINESS_DATE, "store_id").agg(
        F.countDistinct("txn_id").alias("txn_count")
    )
    return per_store.join(txns, [BUSINESS_DATE, "store_id"])


def run_pos_pipeline(
    spark: SparkSession,
    zip_glob: str,
    out_dir: str | None = None,
    stage_dir: str | None = None,
) -> dict:
    """End-to-end daily ingest (the reference's ETLProcessor.process,
    main.py:425-636): zip scan -> fixed-width parse -> marts, with run
    metrics observed in-plan (replaces the hand-rolled counters at
    main.py:466-469, main.py:602-619).

    Returns {"marts": {name: DataFrame}, "metrics": run-report dict
    (FIXTURES.md A8 schema)}. When ``out_dir`` is set, marts are written
    as parquet, day-partitioned on 当稼動日. When ``stage_dir`` is set,
    ingest goes through the two-stage splittable path
    (`read_zip_fixed_width_staged`) so one huge daily zip fans out past
    its single decompression task.
    """
    t0 = time.time()
    if stage_dir:
        records = read_zip_fixed_width_staged(spark, zip_glob, stage_dir)
    else:
        records = read_zip_fixed_width(spark, zip_glob)

    obs = Observation("ingest_metrics")
    records = records.observe(
        obs,
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.length("record")).alias("n_chars"),
    )

    temp = sku_temp(records)
    sku = sku_merge(temp)
    # Materialize the SKU grain once; every downstream mart reuses it.
    sku = sku.persist()
    daily_sales = daily_sales_mart(sku)
    marts = {
        "t_day_pos_daily_sku_data": sku,
        "t_day_ten_kyakusu_data": customer_count_mart(sku),
        "t_day_sales": daily_sales,
        "t_day_ten_sales_front_data_daily": sales_front_mart(daily_sales, sku),
    }
    try:
        if out_dir:
            # Write the SKU grain FIRST (fills the persist cache and
            # fires the ingest observation exactly once), then overlap
            # the three aggregate-mart writes from a small thread pool
            # (guide §2.6 "overlap independent jobs"): they are
            # independent rollups over the now-cached SKU rows writing
            # to disjoint directories, and each is a many-small-files
            # day-partitioned write whose tail (output commit, FS
            # renames) otherwise leaves the executors idle. Results and
            # file layout are identical to the sequential loop; only
            # the driver's submission order changes.
            from concurrent.futures import ThreadPoolExecutor

            from pyspark import inheritable_thread_target

            write_day_partitioned(
                marts["t_day_pos_daily_sku_data"],
                f"{out_dir}/t_day_pos_daily_sku_data",
            )
            # Persist the shared daily_sales rollup for the overlap
            # window (ADVICE r15): two of the three writes consume it
            # (its own write + sales_front_mart), and without the
            # persist each pool thread recomputes the aggregation from
            # the cached SKU rows.
            daily_sales.persist()
            rest = [
                (name, df)
                for name, df in marts.items()
                if name != "t_day_pos_daily_sku_data"
            ]
            try:
                # inheritable_thread_target copies this thread's
                # JVM-local properties (job group/description) into the
                # pool threads so cancellation reaches in-flight writes.
                with ThreadPoolExecutor(max_workers=3) as pool:
                    list(
                        pool.map(
                            inheritable_thread_target(
                                lambda kv: write_day_partitioned(
                                    kv[1], f"{out_dir}/{kv[0]}"
                                )
                            ),
                            rest,
                        )
                    )
            finally:
                daily_sales.unpersist()
        else:
            sku.count()  # trigger the observation
        got = obs.get
        metrics = {
            "is_file_failed": False,
            "file_name": zip_glob,
            "error_message": "",
            "total_time_seconds": round(time.time() - t0, 3),
            # reference emits the row count as a string (main.py:617)
            "total_rows_processed": str(got["n_records"]),
            "total_data_processed_mb": round(
                (got["n_chars"] or 0) / (1024 * 1024), 3
            ),
        }
        return {"marts": marts, "metrics": metrics}
    finally:
        if out_dir:
            # everything is materialized on disk; the cache is done
            sku.unpersist()
        # else: the returned marts are lazy views over `sku` -- the cache
        # must outlive this call, so the CALLER owns the unpersist (e.g.
        # `result["marts"]["t_day_pos_daily_sku_data"].unpersist()`).
        # Unpersisting here would silently recompute parse+merge per mart.
