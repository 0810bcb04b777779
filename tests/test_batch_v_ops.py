"""Per-operator unit tests for round-9 batch V (q282-q285): weighted
K-round SSSP, conjunctive boolean retrieval, the ordered-step funnel,
and last-touch attribution. Hand graphs / event logs with
hand-computed expectations, including the order-semantics cases a
naive implementation gets wrong."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.graph import sssp_bounded

# ---------------------------------------------------- q282 sssp_bounded


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_sssp_weighted_path_beats_direct_edge(spark):
    """1 -> 3 direct costs 10; 1 -> 2 -> 3 costs 2 + 3 = 5: Bellman-Ford
    must take the two-hop path once rounds >= 2."""
    edges = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 2), (2, 3, 3)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in sssp_bounded(edges, seeds, rounds=2).collect()}
    assert got == {1: 0, 2: 2, 3: 5}


def test_sssp_round_bound_is_the_contract(spark):
    """With rounds=1 the cheaper two-hop path is NOT visible yet --
    the K-edge bound is semantics, not approximation."""
    edges = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 2), (2, 3, 3)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in sssp_bounded(edges, seeds, rounds=1).collect()}
    assert got[3] == 10


def test_sssp_unreached_and_parallel_edges(spark):
    """Disconnected nodes report -1 / reached=false; parallel edges
    keep the cheapest."""
    edges = spark.createDataFrame(
        [(1, 2, 7), (1, 2, 4), (8, 9, 1)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    rows = {r.node: r for r in sssp_bounded(edges, seeds, rounds=3).collect()}
    assert rows[2].dist == 4 and rows[2].reached
    assert rows[8].dist == -1 and not rows[8].reached
    assert rows[9].dist == -1 and not rows[9].reached


# --------------------------------------------------- q284 funnel order


def test_funnel_requires_strict_order(spark, sf_dir):
    """A user who clicked BEFORE ever viewing must not reach stage 2;
    purchases before the qualifying click don't count as stage 3."""
    from pos_data_insertion_etl_spark.plans import all_queries

    rows = [
        # u1: full ordered funnel
        (1, 1, "view", _ts(1)),
        (2, 1, "click", _ts(2)),
        (3, 1, "purchase", _ts(3)),
        # u2: click precedes first view -> stalls at stage 1
        (4, 2, "click", _ts(1)),
        (5, 2, "view", _ts(2)),
        (6, 2, "purchase", _ts(3)),
        # u3: purchase precedes click -> stage 2 only
        (7, 3, "view", _ts(1)),
        (8, 3, "purchase", _ts(2)),
        (9, 3, "click", _ts(3)),
        # u4: never views
        (10, 4, "click", _ts(1)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)))
    )
    assert sorted(r.user_id for r in v.collect()) == [1, 2, 3]
    assert sorted(r.user_id for r in c.collect()) == [1, 3]
    assert sorted(r.user_id for r in p.collect()) == [1]
    # and the registered single-row report runs
    row = all_queries()["q284_session_funnel"].spark(spark, sf_dir).collect()[0]
    assert row.n_users >= row.n_view >= row.n_view_click >= row.n_full_funnel


# ------------------------------------------------ q285 attribution


def test_last_touch_attribution_window(spark):
    """Purchases credit the latest preceding non-purchase event;
    back-to-back purchases share the same touch; a leading purchase is
    'none'."""
    rows = [
        (1, 1, "purchase", _ts(1)),  # no prior -> none
        (2, 1, "view", _ts(2)),
        (3, 1, "click", _ts(3)),
        (4, 1, "purchase", _ts(4)),  # click
        (5, 1, "purchase", _ts(5)),  # still click (prior purchase skipped)
        (6, 2, "error", _ts(1)),
        (7, 2, "purchase", _ts(2)),  # error
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    got = {
        (r.touch, r.n)
        for r in ev.select(
            "event_type",
            F.last(
                F.when(F.col("event_type") != "purchase", F.col("event_type")),
                ignorenulls=True,
            )
            .over(w)
            .alias("touch"),
        )
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {("none", 1), ("click", 2), ("error", 1)}


# ------------------------------------------- q283 boolean retrieval


def test_boolean_retrieval_requires_all_terms(spark):
    """Docs missing any term drop; ranking is total tf desc then id."""
    docs = spark.createDataFrame(
        [
            (0, "table scan merge table"),  # all 3, tf=4
            (1, "table scan scan table scan merge"),  # all 3, tf=6
            (2, "table table table"),  # missing 2 terms
            (3, "scan merge"),  # missing 'table'
        ],
        "doc_id long, text string",
    )
    from pos_data_insertion_etl_spark.functions.text import tokens

    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok").isin("table", "scan", "merge"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    hits = (
        tf.groupBy("doc_id")
        .agg(F.sum("tf").alias("tf_total"), F.count(F.lit(1)).alias("nt"))
        .filter(F.col("nt") == 3)
        .orderBy(F.desc("tf_total"), "doc_id")
        .collect()
    )
    assert [(r.doc_id, r.tf_total) for r in hits] == [(1, 6), (0, 4)]


# ---------------------------------------- q286 split leakage (batch W)


def test_split_leakage_semantics(spark):
    """A duplicate cluster counts as leaked ONLY when its members
    straddle >= 2 splits; singleton fingerprints never leak even if a
    split holds many of them."""
    docs = spark.createDataFrame(
        [
            # same token set "a b", different order -> one cluster
            ("train", "a b"),
            ("test", "b a a"),
            # same-set pair entirely inside train -> dup but NOT leaked
            ("train", "c d"),
            ("train", "d c"),
            # singleton
            ("val", "e f"),
        ],
        "split string, text string",
    )
    from pos_data_insertion_etl_spark.functions.text import tokens

    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " ")
    )
    d = docs.select("split", fp.alias("fp"))
    clusters = d.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_docs_c"),
        F.countDistinct("split").alias("n_splits"),
    )
    leaked = clusters.filter(
        (F.col("n_docs_c") >= 2) & (F.col("n_splits") >= 2)
    ).select("fp", F.lit(True).alias("_leaked"))
    got = {
        r.split: (r.n, r.nl)
        for r in d.join(leaked, "fp", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("_leaked"), 1).otherwise(0)).alias("nl"),
        )
        .collect()
    }
    assert got == {"train": (3, 1), "test": (1, 1), "val": (1, 0)}


# ----------------------------------------- boundary contracts (r9)


def test_sssp_zero_rounds_returns_init(spark):
    """rounds=0 is the degenerate contract: seeds at 0, everything
    else unreached."""
    edges = spark.createDataFrame([(1, 2, 5)], "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in sssp_bounded(edges, seeds, rounds=0).collect()}
    assert got == {1: 0, 2: -1}


def test_sssp_no_relax_off_unreached(spark):
    """A node reachable only THROUGH an unreached node stays
    unreached: sentinel distances never propagate as real costs."""
    edges = spark.createDataFrame(
        [(5, 6, 1)], "src long, dst long, w long"  # 5 is not a seed
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in sssp_bounded(edges, seeds, rounds=3).collect()}
    assert got == {5: -1, 6: -1}
