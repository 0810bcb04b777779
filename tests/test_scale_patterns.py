"""Scale-pattern operators: bucketed co-located joins (no Exchange),
salted aggregation, retention partition rewrite, run reports."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table
from pos_data_insertion_etl_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from pos_data_insertion_etl_spark.operators.retention import (
    apply_retention_delete,
)
from pos_data_insertion_etl_spark.pipeline.report import render_run_report, send_report


def test_bucketed_join_has_no_exchange(spark, sf_smoke, tmp_path):
    """Same-bucketed tables join without a shuffle: the physical plan
    must contain no Exchange under the SortMergeJoin."""
    # spark.sql.warehouse.dir is static; managed tables land in the
    # default warehouse and are dropped (files removed) in the finally.
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8)
    # disable auto-broadcast so the join strategy is SMJ over buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        n = joined.count()
        expected = (
            load_table(spark, sf_smoke, "lineitem")
            .join(
                load_table(spark, sf_smoke, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_retention_delete_rewrites_partitions(spark, sf_smoke, tmp_path):
    """apply_retention_delete keeps only rows within the horizon in the
    rewritten day-partitioned table."""
    ev = load_table(spark, sf_smoke, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "events_retained")
    apply_retention_delete(ev, "ts", keep_days=4, path=out, partition_col="day")
    kept = spark.read.parquet(out)
    mx = ev.agg(F.max("ts")).first()[0]
    import datetime

    cutoff = mx - datetime.timedelta(days=4)
    exp = ev.filter(F.col("ts") >= cutoff).count()
    assert kept.count() == exp
    assert kept.filter(F.col("ts") < cutoff).count() == 0
    # partition layout on disk
    import os

    days = [d for d in os.listdir(out) if d.startswith("day=")]
    assert len(days) >= 4


def test_run_report_success_failure():
    ok = render_run_report(
        {
            "is_file_failed": False,
            "file_name": "R520.20240301.zip",
            "error_message": "",
            "total_time_seconds": 12.5,
            "total_rows_processed": "1000",
            "total_data_processed_mb": 51.2,
        }
    )
    assert "SUCCESS" in ok["subject"]
    assert "R520.20240301.zip" in ok["html"]
    assert "51.2" in ok["html"]

    captured = []
    bad = send_report(
        {"is_file_failed": True, "error_message": "boom"}, sink=captured.append
    )
    assert "FAILURE" in bad["subject"]
    assert captured and captured[0] == bad
    assert "boom" in bad["html"]


def test_salted_agg_matches_naive_on_90pct_skew(spark):
    """90% of rows share one key: the salted two-phase aggregation must
    (a) equal the naive groupBy exactly and (b) actually spread the hot
    key across multiple phase-1 subkeys (the whole point of salting)."""
    from pos_data_insertion_etl_spark.operators.skew import salted_agg

    n_salts = 16
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), F.col("id")))
        .alias("k"),
        (F.col("id") % 97).cast("long").alias("v"),
        "id",
    )
    got = salted_agg(
        df,
        ["k"],
        aggs={"s": F.sum("v"), "c": F.count(F.lit(1))},
        merges={"total": F.sum("s"), "n_rows": F.sum("c")},
        n_salts=n_salts,
        salt_source=F.hash("id"),
    )
    exp = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_rows")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))

    # phase-1 spread: the hot key's rows land in >1 (key, salt) subgroup,
    # so its partial aggregation is not funneled through one task
    hot_salts = (
        df.filter(F.col("k") == "hot")
        .select(F.pmod(F.hash("id"), F.lit(n_salts)).alias("salt"))
        .distinct()
        .count()
    )
    assert hot_salts > 1


def test_compact_table_shrinks_files_preserves_data(spark, sf_smoke, tmp_path):
    """64 tiny files -> few right-sized files; identical rows; partition
    layout preserved; the __old/__compact staging dirs are cleaned up."""
    import pathlib

    from pos_data_insertion_etl_spark.operators.compaction import compact_table

    orders = load_table(spark, sf_smoke, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_fragmented")
    orders.repartition(64).write.partitionBy("o_year").parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    stats = compact_table(
        spark,
        path,
        partition_col="o_year",
        records_per_file=1_000_000,
        n_tasks=2,
        sort_by=["o_custkey"],
    )
    assert stats["files_after"] < stats["files_before"] / 4
    assert stats["rows"] == len(before)
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    # partitioned layout survives the rewrite
    assert any(
        p.name.startswith("o_year=") for p in pathlib.Path(path).iterdir()
    )
    # staging/backup dirs are gone
    assert not pathlib.Path(path + "__compact").exists()
    assert not pathlib.Path(path + "__old").exists()


def test_partition_pruning_on_business_date(spark, sf_smoke, tmp_path):
    """A filter on the partition column must prune the scan to matching
    partition directories -- the property the 4-day retention and the
    per-date mart recompute rely on at 100 TB."""
    orders = load_table(spark, sf_smoke, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    orders.write.partitionBy("o_year").parquet(path)

    pruned = spark.read.parquet(path).filter(F.col("o_year") == 1996)
    # inputFiles() lists the pre-pruning file index; the proof that the
    # scan skips other years is the PartitionFilters entry on the
    # FileScan node of the physical plan.
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    filters_part = plan.split("PartitionFilters", 1)[1][:200]
    assert "o_year" in filters_part and "1996" in filters_part, filters_part
    # and the pruned scan reads strictly fewer rows than the full table
    assert 0 < pruned.count() < spark.read.parquet(path).count()


def test_connected_components_edge_cases(spark):
    from pos_data_insertion_etl_spark.operators.graph import (
        connected_components,
    )

    # self-loops and duplicate/reversed edges must not confuse labels --
    # on BOTH strategies (driver union-find and distributed iteration)
    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (3, 4), (4, 5), (9, 9)],
        "src long, dst long",
    )
    for thr in (100_000, 0):
        got = {
            r.node: r.component
            for r in connected_components(edges, driver_threshold=thr).collect()
        }
        assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 3, 9: 9}, f"threshold={thr}"

    # a long chain converges via pointer jumping well under the bound
    # (driver_threshold=0 forces the distributed loop)
    chain = spark.range(64).selectExpr("id AS src", "id + 1 AS dst")
    got = {
        r.node: r.component
        for r in connected_components(
            chain, max_iter=12, driver_threshold=0
        ).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_retention_skips_non_iso_partitions(spark, tmp_path):
    """Non-date partition values (incl. the Hive null-partition dir) are
    skipped with a warning, never deleted by the lexicographic cutoff."""
    import warnings as _warnings

    from pos_data_insertion_etl_spark.operators.retention import (
        drop_expired_partitions,
    )

    path = str(tmp_path / "mart")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-05"), (3, "not-a-date")],
        "v int, day string",
    )
    df.write.partitionBy("day").parquet(path)
    import pathlib

    (pathlib.Path(path) / "day=__HIVE_DEFAULT_PARTITION__").mkdir()
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        stats = drop_expired_partitions(spark, path, "day", "2024-01-03")
    assert stats["deleted_partitions"] == ["2024-01-01"]
    assert stats["deleted_rows"] == 1
    skipped = [str(w.message) for w in rec if "not an ISO date" in str(w.message)]
    assert len(skipped) == 2  # not-a-date + __HIVE_DEFAULT_PARTITION__
    # survivors intact
    left = {r.day for r in spark.read.parquet(path).collect()}
    assert left == {"2024-01-05", "not-a-date"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        drop_expired_partitions(spark, path, "day", "03/01/2024")


def test_compaction_crashed_swap_restores_and_reads(spark, tmp_path):
    """A crash inside the swap window (live path gone, data at __old)
    is recovered by restore_crashed_swap -- and compact_table runs it
    automatically, so a rerun after the crash succeeds end-to-end."""
    import pathlib

    from pos_data_insertion_etl_spark.operators.compaction import (
        compact_table,
        restore_crashed_swap,
    )

    path = str(tmp_path / "t")
    spark.range(1000).withColumn("v", F.col("id") * 2).repartition(16).write.parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    # simulate the crash: path moved aside, compacted copy never landed
    pathlib.Path(path).rename(path + "__old")
    assert restore_crashed_swap(spark, path) is True
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before
    assert restore_crashed_swap(spark, path) is False  # idempotent

    # crash again; the next compact_table self-heals then compacts
    pathlib.Path(path).rename(path + "__old")
    stats = compact_table(spark, path, n_tasks=1)
    assert stats["rows"] == 1000
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before
    assert not pathlib.Path(path + "__old").exists()


def test_compaction_reader_across_swap(spark, tmp_path):
    """The documented concurrent-reader contract of the rename-aside
    swap (operators/compaction.py module docstring): a plan resolved
    BEFORE the swap holds the pre-swap file listing and fails loudly
    with FILE_NOT_EXIST after it -- it never silently returns partial
    or doubled data -- and re-resolving the path (the documented
    retry) sees the full compacted table."""
    import pytest as _pytest

    from pos_data_insertion_etl_spark.operators.compaction import (
        compact_table,
    )

    path = str(tmp_path / "t")
    spark.range(100).repartition(8).write.parquet(path)
    pre_swap = spark.read.parquet(path)  # file listing resolved here
    assert pre_swap.count() == 100

    stats = compact_table(spark, path, n_tasks=1)
    assert stats["rows"] == 100 and stats["files_after"] < stats["files_before"]

    # stale plan: loud failure, not silent wrong results
    with _pytest.raises(Exception, match="FILE_NOT_EXIST|FileNotFound"):
        pre_swap.count()

    # the retry the contract prescribes: re-resolve and read everything
    assert spark.read.parquet(path).count() == 100


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_smoke):
    """Spark's runtime bloom-filter join pruning -- the 100 TB pattern
    where a selective dimension predicate builds a bloom filter that
    drops fact rows BEFORE the join shuffle. Thresholds are scaled to
    test volume (the application-side default demands a 10 GiB scan);
    the assert is on the mechanism: a might_contain() filter fed by a
    bloom_filter_agg over the dimension keys appears on the fact side,
    and results match the unfiltered plan."""
    from pos_data_insertion_etl_spark.catalog import load_table

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_smoke, "lineitem")
        o = load_table(spark, sf_smoke, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = {(r.o_orderpriority, r.n) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # same answer without the runtime filter
    li = load_table(spark, sf_smoke, "lineitem")
    o = load_table(spark, sf_smoke, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.o_orderpriority, r.n) for r in plain.collect()} == rows
