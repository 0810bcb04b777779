"""Certified-bound tests for the mergeable quantile summary
(operators/quantiles.py): every estimate's EXACT rank must sit inside
the bound the summary itself certifies, through build, merge, and
compress."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table
from pos_data_insertion_etl_spark.operators.quantiles import (
    compress,
    estimate_quantiles,
    merge_summaries,
    quantile_summary,
    rank_error_bound,
)

QS = (0.01, 0.25, 0.5, 0.75, 0.99)


def _rank_interval(df, col, v) -> tuple[int, int]:
    """[count(< v), count(<= v)] -- a tied value occupies a rank
    INTERVAL, and the epsilon-quantile contract is interval-based."""
    lo = df.filter(F.col(col) < v).count()
    hi = df.filter(F.col(col) <= v).count()
    return lo, hi


def _assert_within_bound(df, col, summary, qs=QS):
    n = df.filter(F.col(col).isNotNull()).count()
    bound = rank_error_bound(summary)
    assert bound < n / 10, f"bound {bound} uselessly large for n={n}"
    for q, est in estimate_quantiles(summary, qs):
        lo, hi = _rank_interval(df, col, est)
        target = q * n
        # standard tie-aware contract: the target rank must fall inside
        # the value's rank interval widened by the certified bound
        assert lo - bound <= target <= hi + bound + 1, (
            q, est, lo, hi, target, bound,
        )


def test_summary_bound_holds_on_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = quantile_summary(li, "l_extendedprice", k=256)
    _assert_within_bound(li, "l_extendedprice", s)
    # summary is genuinely small: <= k rows per Arrow batch
    n_batches = s.select("batch_id").distinct().count()
    assert s.count() <= 256 * n_batches + n_batches


def test_merge_is_union_and_bounds_add(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 == 1)
    sa = quantile_summary(a, "l_quantity", k=128)
    sb = quantile_summary(b, "l_quantity", k=128)
    merged = merge_summaries(sa, sb)
    assert rank_error_bound(merged) == (
        rank_error_bound(sa) + rank_error_bound(sb)
    )
    _assert_within_bound(li, "l_quantity", merged)


def test_compress_folds_error_and_stays_valid(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = quantile_summary(li, "l_extendedprice", k=512)
    c = compress(s, k=64)
    assert c.count() <= 65
    assert rank_error_bound(c) >= rank_error_bound(s)  # error only grows
    _assert_within_bound(li, "l_extendedprice", c)
    # chain: merge two compressed summaries and compress again
    c2 = compress(merge_summaries(c, c), k=64)
    assert c2.count() <= 65
    # doubled data (self-merge) => bound still certified vs the
    # doubled multiset: ranks scale by 2
    n = li.count()
    bound = rank_error_bound(c2)
    for q, est in estimate_quantiles(c2, QS):
        lo, hi = _rank_interval(li, "l_extendedprice", est)
        target = q * 2 * n
        assert 2 * lo - bound <= target <= 2 * hi + bound + 2


def test_exact_on_tiny_input(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    s = quantile_summary(df.coalesce(1), "v", k=200)
    # k >= n: stride 1, zero certified error, exact quantiles
    assert rank_error_bound(s) == 0
    got = dict(estimate_quantiles(s, (0.25, 0.5, 1.0)))
    assert got[0.25] == 25.0
    assert got[0.5] == 50.0
    assert got[1.0] == 100.0


def test_guards(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        quantile_summary(df, "v", k=1)
    s = quantile_summary(df, "v", k=4)
    with pytest.raises(ValueError):
        estimate_quantiles(s, (1.5,))
    with pytest.raises(ValueError):
        compress(s, k=1)


def test_streaming_monitor_batches_and_replay(spark, sf_dir, tmp_path):
    """The per-batch summary store: three micro-batches cover the
    table, the loaded union estimates within its certified bound, and
    REPLAYING a batch (foreachBatch at-least-once) changes nothing --
    idempotent overwrite, no double-counted weight."""
    from pos_data_insertion_etl_spark.operators.quantiles import (
        rank_error_bound,
    )
    from pos_data_insertion_etl_spark.streaming.jobs import (
        load_quantile_summary,
        quantile_monitor_batch,
    )

    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "qmon")
    for bid in range(3):
        quantile_monitor_batch(
            li.filter(F.col("l_orderkey") % 3 == bid),
            bid,
            out,
            "l_extendedprice",
            k=128,
        )
    s = load_quantile_summary(spark, out)
    total_weight = s.agg(F.sum("weight")).collect()[0][0]
    assert total_weight == li.count()
    _assert_within_bound(li, "l_extendedprice", s)
    before = sorted(
        (r.value, r.weight, r.err, r.batch_id) for r in s.collect()
    )
    bound_before = rank_error_bound(s)
    # replay batch 1 with identical content: bit-for-bit no-op
    quantile_monitor_batch(
        li.filter(F.col("l_orderkey") % 3 == 1),
        1,
        out,
        "l_extendedprice",
        k=128,
    )
    s2 = load_quantile_summary(spark, out)
    after = sorted(
        (r.value, r.weight, r.err, r.batch_id) for r in s2.collect()
    )
    assert after == before
    assert rank_error_bound(s2) == bound_before


def test_drift_report_direction_and_self_null(spark, sf_dir):
    from pos_data_insertion_etl_spark.operators.quantiles import (
        quantile_drift_report,
        quantile_summary,
    )

    li = load_table(spark, sf_dir, "lineitem")
    base = quantile_summary(li, "l_extendedprice", k=256)
    shifted = quantile_summary(
        li.select((F.col("l_extendedprice") * 2).alias("v")), "v", k=256
    )
    report = quantile_drift_report(base, shifted)
    # doubling the scale: every quantile must drift upward, conclusively
    for row in report:
        assert row["delta"] > 0, row
        assert row["conclusive"], row
    # self-comparison: zero delta everywhere, nothing conclusive
    selfr = quantile_drift_report(base, base)
    for row in selfr:
        assert row["delta"] == 0, row
        assert not row["conclusive"], row


def test_categorical_drift_exact(spark, sf_dir):
    from pos_data_insertion_etl_spark.operators.quantiles import (
        categorical_drift,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs
    new = docs.filter(F.col("lang") != "fr")  # drop one language
    rows = {r.category: r for r in categorical_drift(old, new, "lang").collect()}
    assert rows["fr"].n_new == 0
    assert rows["fr"].share_new == 0.0
    assert rows["fr"].share_delta < 0
    others = [c for c in rows if c != "fr"]
    assert all(rows[c].share_delta > 0 for c in others)  # mass moved
    tv = {r.tv_distance for r in rows.values()}
    assert len(tv) == 1  # same scalar on every row
    fr_share_old = rows["fr"].share_old
    # TV distance of dropping a class: exactly that class's old share
    assert abs(tv.pop() - fr_share_old) < 2e-6
    # self-drift: zero everywhere
    selfr = categorical_drift(old, old, "lang").collect()
    assert all(r.share_delta == 0.0 and r.tv_distance == 0.0 for r in selfr)


def test_category_monitor_and_counts_drift(spark, sf_dir, tmp_path):
    """Streaming categorical mix: batch counts persist idempotently,
    the loader sums to the exact table counts, and the counts-based
    drift equals the raw-DataFrame drift row-for-row."""
    from pos_data_insertion_etl_spark.operators.quantiles import (
        categorical_drift,
        categorical_drift_from_counts,
    )
    from pos_data_insertion_etl_spark.streaming.jobs import (
        category_monitor_batch,
        load_category_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "cmon")
    for bid in range(3):
        category_monitor_batch(
            docs.filter(F.col("doc_id") % 3 == bid), bid, out, "lang"
        )
    counts = load_category_counts(spark, out)
    want = {
        r.lang: r["count"] for r in docs.groupBy("lang").count().collect()
    }
    got = {r.category: r.n for r in counts.collect()}
    assert got == want
    # replay a batch: unchanged (reload: the overwrite swapped files,
    # so the pre-replay lazy plan must not be reused)
    category_monitor_batch(
        docs.filter(F.col("doc_id") % 3 == 1), 1, out, "lang"
    )
    counts = load_category_counts(spark, out)
    assert {r.category: r.n for r in counts.collect()} == want
    # counts-core drift == raw drift
    new = docs.filter(F.col("lang") != "fr")
    raw = {
        r.category: (r.share_delta, r.tv_distance)
        for r in categorical_drift(docs, new, "lang").collect()
    }
    new_counts = (
        new.groupBy(F.col("lang").alias("category"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    via_counts = {
        r.category: (r.share_delta, r.tv_distance)
        for r in categorical_drift_from_counts(
            counts, new_counts
        ).collect()
    }
    assert via_counts == raw


def test_compact_quantile_store_roundtrip(spark, sf_dir, tmp_path):
    """Store compaction: the folded store stays certified (bound only
    grows), estimates stay inside it, and further batches append after
    compaction as if nothing happened."""
    from pos_data_insertion_etl_spark.streaming.jobs import (
        compact_quantile_store,
        load_quantile_summary,
        quantile_monitor_batch,
    )

    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "qstore")
    for bid in range(3):
        quantile_monitor_batch(
            li.filter(F.col("l_orderkey") % 3 == bid),
            bid, out, "l_extendedprice", k=128,
        )
    before = rank_error_bound(load_quantile_summary(spark, out))
    compact_quantile_store(spark, out, k=64)
    s = load_quantile_summary(spark, out)
    assert s.count() <= 65
    assert rank_error_bound(s) >= before
    _assert_within_bound(li, "l_extendedprice", s)
    # the store keeps working: append another batch post-compaction
    quantile_monitor_batch(
        li.filter(F.col("l_orderkey") % 3 == 1),
        7, out, "l_extendedprice", k=128,
    )
    s2 = load_quantile_summary(spark, out)
    total = s2.agg(F.sum("weight")).collect()[0][0]
    n = li.count()
    assert total == n + li.filter(F.col("l_orderkey") % 3 == 1).count()
