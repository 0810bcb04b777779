"""Partitioning invariance: a representative slice of the registry must
produce BIT-IDENTICAL results when the physical execution changes
underneath it -- different shuffle-partition counts and different file
split sizes. This is the determinism contract the 100 TB design leans
on (fixed-point integer aggregates, total orderings, hash-derived
keys): if any operator secretly depended on partition count, task
order, or split boundaries, this sweep catches it at sf0.001.

The sample deliberately spans the risky shapes: associative decimal
aggregation, global windows, the two-phase global sequence (NTILE),
LSH banding, the sequential-fold operators (CDC chunking, no-split
packing), applyInPandas grouping (MMR), connected components'
pointer-jumping, and the scalar-broadcast mixture math.
"""

from __future__ import annotations

import pytest

from pos_data_insertion_etl_spark.plans import all_queries

from .oracle_harness import canon_rows

SF = "/root/testdata/sf0.001"

SAMPLE = [
    "q01_pricing_summary",         # decimal-exact aggregation
    "q16_topk_per_group",          # window + ranking
    "q39_combine_chunks",          # two-phase global sequence
    "q55_minhash_lsh",             # LSH band joins
    "q88_connected_components",    # iterative pointer-jumping
    "q90_neardup_pipeline",        # full dedup composition
    "q131_mixture_budget_sample",  # budget fold over windows
    "q146_cdc_chunks",             # sequential HOF fold
    "q148_mmr_diversified_topk",   # applyInPandas greedy
    "q151_ce_decile_bins",         # distributed NTILE + LM model
    "q152_epoch_shard_shuffle",    # hash-derived permutation
    "q160_pack_nosplit",           # sequential per-shard fold
    "q164_trigram_lm_ce",          # three broadcast LM heads + int sums
    "q167_table_profile",          # one-pass multi-column aggregate
    "q169_knn_graph_bounded",      # bucket self-join + md5 cap window
    "q171_quantile_summary_bounds",  # batching-dependent summary, but
                                     # the emitted invariants must not be
    "q176_quantile_monitor_replay",  # persisted-store replay analog
    "q179_duplicate_spans",          # gaps-and-islands span merge
    "q182_kmeans_lloyd",             # iterative collect-broadcast loop
    "q189_setsim_prefix_join",       # freq-ordered prefix candidate join
    "q196_token_entropy",            # per-term fixed-point ln sums
    "q198_dsir_weights",             # hashed-bucket model + int weights
    "q199_dedup_ingest_replay",      # persist-path replay analog
    # round-8 risky shapes
    "q232_ks_two_sample",            # single-window running + full frame
    "q234_gini_revenue",             # global-sequence weighted sum
    "q237_rfm_segments",             # three chained two-phase NTILEs
    "q250_heaps_law",                # checkpointed explode + bucket window
    "q251_rbo_rankings",             # global row_number + bounded theta
    "q254_ks_monitor_replay",        # persisted count-store replay
    "q263_woe_iv_screen",            # global row_number equal-depth bins
    "q264_permutation_entropy",      # ordered window, two lags
]

#: (shuffle partitions, file split bytes) -- deliberately awkward:
#: a prime partition count, and splits small enough to shred the
#: sf0.001 parquet files into many fragments.
CONFIGS = [(3, str(512 * 1024)), (17, str(64 * 1024))]


def _run(spark, name: str):
    df = all_queries()[name].spark(spark, SF)
    return canon_rows(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", SAMPLE)
def test_result_invariant_under_partitioning(name, spark):
    baseline_conf = {
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
    }
    try:
        results = []
        for parts, split in CONFIGS:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            spark.conf.set("spark.sql.files.maxPartitionBytes", split)
            results.append(_run(spark, name))
        assert results[0] == results[1], (
            f"{name}: result depends on physical partitioning"
        )
    finally:
        for k, v in baseline_conf.items():
            spark.conf.set(k, v)
