"""AQE skew-join splitting engages on a degenerate hot LSH band.

The one real skew risk in the dedup tier at 100 TB: a near-universal
shingle puts a large fraction of the corpus into ONE band bucket, so the
band self-join's shuffle lands those rows in one partition. The engine's
answer is AQE skew-join splitting (enabled session-wide in
session.RUNTIME_CONFS); this test proves the mechanism actually fires on
that shape -- with AQE's size thresholds scaled down to test-data volume,
since the defaults are sized for 256 MB partitions -- by asserting the
final adaptive plan marks the band join `SortMergeJoin(skew=true)`, and
that the split changes no results.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.dedup import lsh_candidate_pairs

N_HOT, N_COLD = 4000, 800


@contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _hot_band_signatures(spark):
    """Synthetic 2-hash signatures (one band): `N_HOT` docs share both
    hash values -- one degenerate band key, the near-universal-shingle
    case -- while cold docs hash uniquely and pair with nothing."""
    hot = spark.range(N_HOT).select(
        F.col("id"), F.lit("aaaa").alias("h00"), F.lit("bbbb").alias("h01")
    )
    cold = spark.range(N_HOT, N_HOT + N_COLD).select(
        F.col("id"),
        *[
            F.concat(F.lit(f"c{i}-"), F.col("id")).alias(f"h{i:02d}")
            for i in range(2)
        ],
    )
    return hot.unionByName(cold)


def _count_pairs(spark, skew_enabled: bool):
    """(n_pairs, final adaptive plan) for the band self-join, counted
    with an aggregate so the hot block's ~8M pair rows never reach the
    driver; collect() runs THIS DataFrame's plan (count() would build a
    separate one), letting AdaptiveSparkPlan reach its final shape."""
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.skewJoin.enabled": str(skew_enabled).lower(),
            # scale AQE's skew thresholds down to test volume; production
            # keeps the defaults -- the MECHANISM under test is identical
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # keep the self-join a sort-merge join: broadcast has no skew
            # problem (and no skew handling) so it would bypass the test
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        sigs = _hot_band_signatures(spark)
        pairs = lsh_candidate_pairs(sigs, "id", n_hashes=2, band_size=2)
        total = pairs.agg(F.count(F.lit(1)).alias("n"))
        n = total.collect()[0].n
        plan = total._jdf.queryExecution().executedPlan().toString()
        return n, plan


def test_hot_band_join_is_skew_split_and_correct(spark):
    n_pairs, plan = _count_pairs(spark, skew_enabled=True)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, f"AQE skew split did not engage:\n{plan}"
    assert n_pairs == N_HOT * (N_HOT - 1) // 2

    # and the split changes no values: same count with splitting off
    n_plain, plan_plain = _count_pairs(spark, skew_enabled=False)
    assert "skew=true" not in plan_plain
    assert n_plain == n_pairs
