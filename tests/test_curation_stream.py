"""streaming/jobs.curation_ingest_batch -- the streamed curation
funnel's per-batch unit (q274): gate-then-dedup with exactly-once
funnel accounting under at-least-once replay."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.streaming.jobs import (
    curation_ingest_batch,
)

#: Ten+ words with stopword hits so the Gopher gate passes; short junk
#: rows fail the min_words=10 rule.
_GOOD = "the quick brown fox jumps over a lazy dog repeatedly today"
_JUNK = "tiny"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _read_report(spark, out):
    funnel = spark.read.parquet(os.path.join(out, "funnel"))
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    kept = {
        r.batch: r.n
        for r in corpus.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    return {
        int(r.batch): (r.n_raw, r.n_gated, kept.get(r.batch, 0))
        for r in funnel.collect()
    }, sorted(map(tuple, corpus.select("doc_id").collect()))


def test_curation_ingest_gate_dedup_and_replay(spark):
    out = tempfile.mkdtemp(prefix="graft_cur_test_")
    shutil.rmtree(out, ignore_errors=True)
    try:
        b0 = _docs(spark, [(0, _GOOD), (1, _JUNK), (2, _GOOD + " x")])
        b1 = _docs(spark, [(3, _GOOD), (4, _GOOD + " y"), (5, _JUNK)])
        kw = dict(min_words=10, stopwords=("the", "a"), min_stopword_hits=1)
        curation_ingest_batch(b0, 0, out, **kw)
        curation_ingest_batch(b1, 1, out, **kw)
        report, ids = _read_report(spark, out)
        # batch 0: 3 raw, 2 gated (junk fails), both novel
        assert report[0] == (3, 2, 2)
        # batch 1: doc 3 duplicates doc 0's text -> only doc 4 is new
        assert report[1] == (3, 2, 1)
        assert ids == [(0,), (2,), (4,)]

        # REPLAY batch 1: funnel rewrites identical values, corpus and
        # digest state unchanged -- exactly-once table state.
        curation_ingest_batch(b1, 1, out, **kw)
        report2, ids2 = _read_report(spark, out)
        assert report2 == report and ids2 == ids
    finally:
        shutil.rmtree(out, ignore_errors=True)


class _Boom(RuntimeError):
    pass


def _crash_at(point: str):
    def hook(p: str) -> None:
        if p == point:
            raise _Boom(p)

    return hook


def test_curation_ingest_crash_between_corpus_and_digests(spark):
    """VERDICT r10 item 6: kill the batch BETWEEN the corpus write and
    the digest publish (the window ADVICE r5 originally flagged),
    restart it, and assert exactly-once state -- the replay recomputes
    the same novel set against the OLD digests and overwrites the same
    directories bit-for-bit."""
    from pos_data_insertion_etl_spark.streaming import jobs

    out = tempfile.mkdtemp(prefix="graft_cur_crash_")
    shutil.rmtree(out, ignore_errors=True)
    kw = dict(min_words=10, stopwords=("the", "a"), min_stopword_hits=1)
    try:
        b0 = _docs(spark, [(0, _GOOD), (1, _JUNK), (2, _GOOD + " x")])
        b1 = _docs(spark, [(3, _GOOD), (4, _GOOD + " y"), (5, _JUNK)])
        curation_ingest_batch(b0, 0, out, **kw)
        jobs.FAULT_HOOK = _crash_at("after_corpus_write")
        try:
            with pytest.raises(_Boom):
                curation_ingest_batch(b1, 1, out, **kw)
        finally:
            jobs.FAULT_HOOK = None
        # Crashed state: corpus/batch=1 exists; the digest state is
        # still OLD (batch 0 only -- neither the batch-1 temp dir nor
        # digests/batch=1 was written yet).
        assert os.path.isdir(os.path.join(out, "corpus", "batch=1"))
        assert not os.path.isdir(os.path.join(out, "digests__new1"))
        assert not os.path.isdir(os.path.join(out, "digests", "batch=1"))
        digests_before = {
            r.digest
            for r in spark.read.parquet(os.path.join(out, "digests")).collect()
        }
        assert len(digests_before) == 2  # batch 0 only

        # Restart: re-drive the batch with no hook.
        curation_ingest_batch(b1, 1, out, **kw)
        report, ids = _read_report(spark, out)
        assert report[0] == (3, 2, 2)
        assert report[1] == (3, 2, 1)  # doc 3 dups doc 0; only doc 4 new
        assert ids == [(0,), (2,), (4,)]
        digests_after = spark.read.parquet(os.path.join(out, "digests"))
        assert digests_after.count() == digests_after.distinct().count() == 3
        # And a THIRD drive (pure replay) is a no-op fast path.
        curation_ingest_batch(b1, 1, out, **kw)
        report3, ids3 = _read_report(spark, out)
        assert report3 == report and ids3 == ids
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_curation_ingest_crash_after_digest_tmp_write(spark):
    """Crash after the digests__new<id> temp write but BEFORE the
    atomic publish rename: the corpus directory is already durable
    (corpus commits first), but the digest STATE is unchanged -- the
    temp dir lives outside digests/ so the partitioned state read
    cannot see it. The restart recomputes the same novel set,
    overwrites both the corpus dir and the stale temp, and publishes."""
    from pos_data_insertion_etl_spark.streaming import jobs

    out = tempfile.mkdtemp(prefix="graft_cur_crash_")
    shutil.rmtree(out, ignore_errors=True)
    kw = dict(min_words=10, stopwords=("the", "a"), min_stopword_hits=1)
    try:
        curation_ingest_batch(
            _docs(spark, [(0, _GOOD)]), 0, out, **kw
        )
        b1 = _docs(spark, [(4, _GOOD + " y")])
        jobs.FAULT_HOOK = _crash_at("after_digest_tmp_write")
        try:
            with pytest.raises(_Boom):
                curation_ingest_batch(b1, 1, out, **kw)
        finally:
            jobs.FAULT_HOOK = None
        # corpus committed, digest state old, stale temp invisible to it
        assert os.path.isdir(os.path.join(out, "corpus", "batch=1"))
        assert os.path.isdir(os.path.join(out, "digests__new1"))
        assert not os.path.isdir(os.path.join(out, "digests", "batch=1"))
        assert (
            spark.read.parquet(os.path.join(out, "digests")).count() == 1
        )  # batch 0 only
        curation_ingest_batch(b1, 1, out, **kw)
        # publish moved the temp aside
        assert not os.path.isdir(os.path.join(out, "digests__new1"))
        assert os.path.isdir(os.path.join(out, "digests", "batch=1"))
        report, ids = _read_report(spark, out)
        assert report[1] == (1, 1, 1)
        assert ids == [(0,), (4,)]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_curation_ingest_crash_after_funnel_write(spark):
    """Crash after the funnel record but before any dedup work: the
    funnel row is a pure function of batch content, so the restart
    rewrites identical values and completes the rest exactly-once."""
    from pos_data_insertion_etl_spark.streaming import jobs

    out = tempfile.mkdtemp(prefix="graft_cur_crash_")
    shutil.rmtree(out, ignore_errors=True)
    kw = dict(min_words=10, stopwords=("the", "a"), min_stopword_hits=1)
    try:
        b0 = _docs(spark, [(0, _GOOD), (1, _JUNK)])
        jobs.FAULT_HOOK = _crash_at("after_funnel_write")
        try:
            with pytest.raises(_Boom):
                curation_ingest_batch(b0, 0, out, **kw)
        finally:
            jobs.FAULT_HOOK = None
        # Funnel row landed; corpus/digests never created.
        assert os.path.isdir(os.path.join(out, "funnel", "batch=0"))
        assert not os.path.isdir(os.path.join(out, "digests"))
        curation_ingest_batch(b0, 0, out, **kw)
        report, ids = _read_report(spark, out)
        assert report[0] == (2, 1, 1)
        assert ids == [(0,)]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_curation_ingest_all_gated_out_still_records_funnel(spark):
    """A batch whose documents all fail the gate must still land its
    funnel row (raw counted, gated 0) and leave no corpus directory."""
    out = tempfile.mkdtemp(prefix="graft_cur_test_")
    shutil.rmtree(out, ignore_errors=True)
    try:
        kw = dict(min_words=10, stopwords=("the", "a"), min_stopword_hits=1)
        curation_ingest_batch(
            _docs(spark, [(0, _GOOD)]), 0, out, **kw
        )
        curation_ingest_batch(
            _docs(spark, [(1, _JUNK), (2, _JUNK + " two")]), 1, out, **kw
        )
        report, ids = _read_report(spark, out)
        assert report[1] == (2, 0, 0)
        assert ids == [(0,)]
    finally:
        shutil.rmtree(out, ignore_errors=True)
