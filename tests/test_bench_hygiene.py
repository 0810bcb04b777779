"""bench._clear_block_pool: the round-12 storage-pool hygiene between
headline entries (BRACKET_q39_r12.json measured later entries paying
~0.7 s for earlier entries' leftover localCheckpoint blocks).

Pins the two properties the bench harness relies on: leftover
persistent RDDs are actually dropped, and clearing is safe to call on
an empty pool (every entry calls it unconditionally).
"""

from __future__ import annotations


def _pool_size(spark) -> int:
    return len(list(spark.sparkContext._jsc.getPersistentRDDs().keys()))


def test_clear_block_pool_drops_localcheckpoint_blocks(spark):
    import bench

    df = spark.range(50_000).localCheckpoint()
    df.count()
    assert _pool_size(spark) >= 1
    bench._clear_block_pool(spark)
    assert _pool_size(spark) == 0


def test_clear_block_pool_safe_on_empty_pool(spark):
    import bench

    bench._clear_block_pool(spark)
    bench._clear_block_pool(spark)  # idempotent
    assert _pool_size(spark) == 0
