"""Multi-batch CHAOS replay for the streamed curation ingest
(VERDICT r11 item 6): round 11 proved each crash window in isolation;
this composes them -- a 10-batch run with seeded-random fault
injection at random points in random batches (including repeated
crashes of the same batch and at-least-once re-deliveries after
success), restarting after every crash -- and asserts the final
corpus, digest table, and funnel are EQUAL to a fault-free run of the
same batches.

Full-marked via conftest._FULL_MODULES (~1-2 min).
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.streaming import jobs
from pos_data_insertion_etl_spark.streaming.jobs import (
    curation_ingest_batch,
)

_GATE = dict(min_words=10, stopwords=("the", "a"), min_stopword_hits=1)

#: Texts that pass the gate; reused across batches to exercise
#: cross-batch dedup under replay.
_POOL = [
    f"the quick brown fox jumps over a lazy dog repeatedly today v{i}"
    for i in range(12)
]
_JUNK = "tiny"

_POINTS = ("after_funnel_write", "after_digest_tmp_write", "after_corpus_write")


class _Boom(RuntimeError):
    pass


def _batches(rng: random.Random, n_batches: int = 10):
    """(batch_id, rows) with cross-batch duplicate texts, junk rows,
    and at least one batch that gates out entirely."""
    out = []
    next_id = 0
    for b in range(n_batches):
        rows = []
        if b == 4:  # everything gated out: the no-corpus-write path
            for _ in range(3):
                rows.append((next_id, _JUNK))
                next_id += 1
        else:
            for _ in range(rng.randint(2, 6)):
                rows.append((next_id, rng.choice(_POOL)))
                next_id += 1
            if rng.random() < 0.5:
                rows.append((next_id, _JUNK))
                next_id += 1
        out.append((b, rows))
    return out


def _crash_at(point: str):
    def hook(p: str) -> None:
        if p == point:
            raise _Boom(p)

    return hook


def _drive_with_chaos(spark, batches, out_dir, rng: random.Random) -> int:
    """Drive every batch to success, injecting seeded crashes (possibly
    several per batch) and re-driving after each -- the foreachBatch
    restart contract. A planned fault point can be UNREACHABLE for a
    batch's content (an all-duplicate or gated-out batch early-returns
    before the digest/corpus points); that attempt then simply
    completes, which is itself part of the chaos surface. Returns the
    number of crashes that actually fired."""
    crashes = 0
    for bid, rows in batches:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # 0-2 crash attempts before this batch finally succeeds
        planned = [rng.choice(_POINTS) for _ in range(rng.randint(0, 2))]
        done = False
        for point in planned:
            jobs.FAULT_HOOK = _crash_at(point)
            try:
                curation_ingest_batch(df, bid, out_dir, **_GATE)
                done = True  # fault point unreachable for this content
            except _Boom:
                crashes += 1
            finally:
                jobs.FAULT_HOOK = None
            if done:
                break
        if not done:
            curation_ingest_batch(df, bid, out_dir, **_GATE)
        # at-least-once: sometimes the successful batch replays anyway
        if rng.random() < 0.3:
            curation_ingest_batch(df, bid, out_dir, **_GATE)
    return crashes


def _drive_clean(spark, batches, out_dir) -> None:
    for bid, rows in batches:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        curation_ingest_batch(df, bid, out_dir, **_GATE)


def _state(spark, out_dir):
    funnel = sorted(
        (int(r.batch), int(r.n_raw), int(r.n_gated))
        for r in spark.read.parquet(os.path.join(out_dir, "funnel"))
        .select(
            F.col("batch").cast("long").alias("batch"), "n_raw", "n_gated"
        )
        .collect()
    )
    corpus = sorted(
        (int(r.batch), int(r.doc_id))
        for r in spark.read.parquet(os.path.join(out_dir, "corpus"))
        .select(F.col("batch").cast("long").alias("batch"), "doc_id")
        .collect()
    )
    digests = sorted(
        r.digest
        for r in spark.read.parquet(os.path.join(out_dir, "digests")).collect()
    )
    return funnel, corpus, digests


@pytest.mark.parametrize("seed", [101, 202])
def test_chaos_replay_equals_fault_free_run(spark, seed):
    rng = random.Random(seed)
    batches = _batches(rng)
    chaos_dir = tempfile.mkdtemp(prefix="graft_chaos_")
    clean_dir = tempfile.mkdtemp(prefix="graft_chaos_ref_")
    shutil.rmtree(chaos_dir, ignore_errors=True)
    shutil.rmtree(clean_dir, ignore_errors=True)
    try:
        crashes = _drive_with_chaos(spark, batches, chaos_dir, rng)
        _drive_clean(spark, batches, clean_dir)
        assert crashes >= 3, "seed produced too little chaos to certify"
        got = _state(spark, chaos_dir)
        want = _state(spark, clean_dir)
        assert got == want
        # one corpus row per distinct kept text == one digest per row
        assert len(set(got[2])) == len(got[2])  # digests distinct
        assert len(got[2]) == len(got[1])  # and 1:1 with corpus rows
    finally:
        shutil.rmtree(chaos_dir, ignore_errors=True)
        shutil.rmtree(clean_dir, ignore_errors=True)
