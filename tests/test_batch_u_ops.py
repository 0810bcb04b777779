"""Per-operator unit tests for round-9 batch U (q276-q281): the
storage/shuffle strategy certifications (partition pruning, salted
join, Bloom prefilter) and the two new estimator shapes
(largest-remainder apportionment, Theil-Sen slope), plus the phrase
join. Hand-built frames with hand-computable expectations; the
strategy shapes additionally pin RESULT EQUALITY against their plain
(unoptimized) forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.apportion import (
    largest_remainder,
)
from pos_data_insertion_etl_spark.operators.skew import salted_join
from pos_data_insertion_etl_spark.operators.stats import theil_sen_slope

# ------------------------------------------------- q277 salted join


def test_salted_join_row_identical_to_plain(spark):
    """Salting must be a pure rewrite: same rows, same multiplicities,
    for a skewed big side (one key owns 80% of rows)."""
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 < 8 else f"cold{i % 10}") for i in range(200)],
        "id long, k string",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("cold8", 2), ("cold9", 3)], "k string, v int"
    )
    got = salted_join(
        big, small, "k", n_salts=4, salt_source=F.col("id")
    )
    plain = big.join(small, "k")
    assert got.count() == plain.count() == 200
    assert (
        got.exceptAll(plain).count() == 0
        and plain.exceptAll(got).count() == 0
    )


def test_salted_join_unmatched_big_rows_drop(spark):
    """Inner-join semantics survive the rewrite: big rows with no dim
    match vanish, matched ones appear exactly once per dim row."""
    big = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "zz")], "id long, k string"
    )
    small = spark.createDataFrame([("a", 10)], "k string, v int")
    rows = salted_join(
        big, small, "k", n_salts=3, salt_source=F.col("id")
    ).collect()
    assert sorted((r.id, r.v) for r in rows) == [(1, 10), (2, 10)]


# ------------------------------------------- q279 largest remainder


def test_largest_remainder_exact_total_and_ranking(spark):
    """Classic Hamilton case where floors under-shoot: weights 5/3/2,
    budget 7 -> bases 3/2/1 (sum 6), remainders 5/1/4 -> the one
    leftover unit goes to key 'a' (largest remainder)."""
    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2)], "k string, w long"
    )
    got = {r.key: r for r in largest_remainder(df, "k", "w", budget=7).collect()}
    assert {k: r.alloc for k, r in got.items()} == {"a": 4, "b": 2, "c": 1}
    assert all(r.total_alloc == 7 for r in got.values())


def test_largest_remainder_tie_breaks_by_key(spark):
    """Equal remainders: the extra units go to the lexicographically
    smallest keys -- a total order both engines replay."""
    # weights 1/1/1, budget 4: bases 1 each, remainders all equal (1);
    # one leftover -> key 'a'.
    df = spark.createDataFrame(
        [("c", 1), ("a", 1), ("b", 1)], "k string, w long"
    )
    got = {r.key: r.alloc for r in largest_remainder(df, "k", "w", budget=4).collect()}
    assert got == {"a": 2, "b": 1, "c": 1}


def test_largest_remainder_rows_pre_aggregate(spark):
    """Raw rows collapse to group weights before any window."""
    rows = [("s1", 10)] * 3 + [("s2", 15)] * 2  # weights 30 / 30
    df = spark.createDataFrame(rows, "k string, w long")
    got = {r.key: r for r in largest_remainder(df, "k", "w", budget=10).collect()}
    assert got["s1"].w == 30 and got["s2"].w == 30
    assert got["s1"].alloc + got["s2"].alloc == 10


# ---------------------------------------------- q280 Theil-Sen slope


def test_theil_sen_median_slope_exact(spark):
    """y = 2x except one wild outlier: OLS moves, Theil-Sen stays 2.
    Points (0,0),(1,2),(2,4),(3,6),(4,1000): 10 pairwise slopes, the
    median is still 2.000 (fp 2000)."""
    pts = [(0, 0), (1, 2), (2, 4), (3, 6), (4, 1000)]
    df = spark.createDataFrame(pts, "x long, y long")
    row = theil_sen_slope(df, "x", "y", scale=1000).collect()[0]
    assert row.n_points == 5 and row.n_pairs == 10
    assert row.slope_fp == 2000 and row.slope == 2.0


def test_theil_sen_negative_slope_truncation(spark):
    """Negative slopes divide toward zero on both engines: points
    (0,0),(2,-3) give slope_fp = (-3000) div 2 = -1500."""
    df = spark.createDataFrame([(0, 0), (2, -3)], "x long, y long")
    row = theil_sen_slope(df, "x", "y", scale=1000).collect()[0]
    assert row.n_pairs == 1 and row.slope_fp == -1500


def test_theil_sen_even_pairs_lower_median(spark):
    """Even pair count picks the LOWER median (rank (n+1) div 2):
    3 points -> 3 pairs is odd; use 4 collinear-ish points -> 6 pairs,
    rank 3 of the sorted slope list."""
    pts = [(0, 0), (1, 1), (2, 4), (3, 9)]
    # pairwise fp slopes: (0,1)=1000 (0,2)=2000 (0,3)=3000
    #                     (1,2)=3000 (1,3)=4000 (2,3)=5000
    # sorted: 1000,2000,3000,3000,4000,5000 -> rank 3 -> 3000
    df = spark.createDataFrame(pts, "x long, y long")
    row = theil_sen_slope(df, "x", "y", scale=1000).collect()[0]
    assert row.n_pairs == 6 and row.slope_fp == 3000


def test_theil_sen_partition_invariance(spark):
    """Result independent of input partitioning (rank windows are
    totally ordered)."""
    pts = [(i, 3 * i + (7 if i == 5 else 0)) for i in range(8)]
    df1 = spark.createDataFrame(pts, "x long, y long").repartition(1)
    df7 = spark.createDataFrame(pts, "x long, y long").repartition(7)
    r1 = theil_sen_slope(df1, "x", "y").collect()[0]
    r7 = theil_sen_slope(df7, "x", "y").collect()[0]
    assert r1 == r7


# --------------------------------- q276 / q278 strategy certifications


def test_partition_pruned_mart_raises_without_pruning(spark, sf_dir):
    """The registered query certifies plan shape: its scan must carry a
    non-empty PartitionFilters. Run it and sanity-check values against
    a direct computation (2 smallest months)."""
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.plans import all_queries

    got = {
        r.ym: r
        for r in all_queries()["q276_partition_pruned_mart"]
        .spark(spark, sf_dir)
        .collect()
    }
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym")
    )
    months = sorted(r.ym for r in orders.distinct().collect())[:2]
    assert sorted(got) == months
    direct = (
        orders.filter(F.col("ym").isin(months)).groupBy("ym").count().collect()
    )
    for r in direct:
        assert got[r.ym].n_orders == r["count"]


def test_bloom_prefilter_equals_exact_semijoin(spark, sf_dir):
    """No false negatives: the bloom-prefiltered + verified result must
    equal the exact semi-join aggregate."""
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.plans import all_queries

    got = (
        all_queries()["q278_bloom_semijoin_prefilter"]
        .spark(spark, sf_dir)
        .collect()
    )
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select("c_custkey")
    )
    exact = (
        orders.join(
            keys, orders["o_custkey"] == keys["c_custkey"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    want = {r.o_orderpriority: r["count"] for r in exact}
    assert {r.o_orderpriority: r.n_orders for r in got} == want


# ----------------------------------------------- q281 phrase match


def test_phrase_match_counts_adjacent_only(spark):
    """'table scan' must match adjacency, not co-occurrence, and count
    every occurrence."""
    docs = spark.createDataFrame(
        [
            (0, "table scan merge table scan"),  # 2 hits
            (1, "scan table"),  # reversed -> 0
            (2, "table big scan"),  # gap -> 0
            (3, "a table scan b"),  # 1 hit
        ],
        "doc_id long, text string",
    )
    from pos_data_insertion_etl_spark.functions.text import tokens

    toks = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("p0", "tok")
    )
    w1 = toks.filter(F.col("tok") == "table").select(
        "doc_id", (F.col("p0") + 1).alias("p")
    )
    w2 = toks.filter(F.col("tok") == "scan").select(
        "doc_id", F.col("p0").alias("p")
    )
    got = {
        r.doc_id: r.n
        for r in w1.join(w2, ["doc_id", "p"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {0: 2, 3: 1}


def test_largest_remainder_all_zero_weights_null_path(spark):
    """All-zero weight total: allocations must take the NULL path in
    BOTH engines (Spark ANSI would error on integer div-by-zero where
    DuckDB // returns NULL -- the nullif guard aligns them, same class
    as the q271 fix)."""
    df = spark.createDataFrame(
        [("a", 0), ("b", 0)], "k string, w long"
    )
    rows = largest_remainder(df, "k", "w", budget=5).collect()
    assert all(r.alloc is None for r in rows)


def test_salted_join_single_salt_degenerates_to_plain(spark):
    """n_salts=1 is exactly the plain join (salt constant 0)."""
    big = spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
    small = spark.createDataFrame([("a", 9)], "k string, v int")
    rows = salted_join(big, small, "k", n_salts=1, salt_source=F.col("id")).collect()
    assert [(r.id, r.v) for r in rows] == [(1, 9)]


def test_theil_sen_single_point_empty(spark):
    """One point -> zero pairs -> empty result (no median exists)."""
    df = spark.createDataFrame([(3, 7)], "x long, y long")
    assert theil_sen_slope(df, "x", "y").count() == 0


def test_largest_remainder_zero_leftover(spark):
    """Weights that divide the budget exactly: no top-up row changes
    (leftover 0), floors are final."""
    df = spark.createDataFrame([("a", 1), ("b", 3)], "k string, w long")
    got = {r.key: r.alloc for r in largest_remainder(df, "k", "w", budget=8).collect()}
    assert got == {"a": 2, "b": 6}
