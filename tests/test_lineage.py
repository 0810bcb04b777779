"""Reliable-checkpoint escape hatch (VERDICT r9 item 2).

cut_lineage must (a) stay on localCheckpoint when the session conf is
unset -- round-9-identical behavior -- and (b) route every iterative
lineage cut through reliable checkpoint() files under
spark.pos_etl.reliableCheckpointDir when set, with identical results.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.lineage import CONF_KEY, cut_lineage
from pos_data_insertion_etl_spark.operators.graph import (
    connected_components,
)
from pos_data_insertion_etl_spark.operators.setsim import (
    prefix_filter_jaccard_join,
)


@contextmanager
def _reliable_dir(spark, path):
    spark.conf.set(CONF_KEY, str(path))
    try:
        yield
    finally:
        spark.conf.unset(CONF_KEY)


def _checkpoint_files(path) -> int:
    return sum(len(files) for _, _, files in os.walk(path))


def _edges(spark):
    # two components: a 5-node path (0-1-2-3-4) and a triangle (10,11,12)
    rows = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_cut_lineage_local_by_default(spark, tmp_path):
    df = cut_lineage(spark.range(5), eager=True)
    assert df.count() == 5
    assert _checkpoint_files(tmp_path) == 0


def test_connected_components_reliable_dir_identical(spark, tmp_path):
    # distributed path (driver_threshold=0) is the one that iterates
    base = {
        (r.node, r.component)
        for r in connected_components(
            _edges(spark), driver_threshold=0
        ).collect()
    }
    ckpt = tmp_path / "ckpt"
    with _reliable_dir(spark, ckpt):
        rel = {
            (r.node, r.component)
            for r in connected_components(
                _edges(spark), driver_threshold=0
            ).collect()
        }
    assert rel == base
    assert _checkpoint_files(ckpt) > 0, "no reliable checkpoint written"


def test_setsim_prefix_join_reliable_dir_identical(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "completely different text with no overlap at all"),
            (3, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    key = lambda r: (r.id_a, r.id_b, r.n_common, r.jaccard)  # noqa: E731
    base = sorted(
        map(key, prefix_filter_jaccard_join(docs, n=2).collect())
    )
    ckpt = tmp_path / "ckpt189"
    with _reliable_dir(spark, ckpt):
        rel = sorted(
            map(key, prefix_filter_jaccard_join(docs, n=2).collect())
        )
    assert rel == base and len(base) > 0
    # the q189 cuts are eager=False (materialize on first action):
    # reliable files appear once the job has run
    assert _checkpoint_files(ckpt) > 0


def test_reliable_dir_set_once_per_target(spark, tmp_path):
    """setCheckpointDir creates a UUID subdir per call; cut_lineage
    must configure once per (context, target), not once per cut."""
    ckpt = tmp_path / "once"
    with _reliable_dir(spark, ckpt):
        cut_lineage(spark.range(3), eager=True).count()
        cut_lineage(spark.range(4), eager=True).count()
        subdirs = [
            d
            for d in os.listdir(ckpt)
            if os.path.isdir(os.path.join(ckpt, d))
        ]
        assert len(subdirs) == 1
    # and a DIFFERENT target re-configures
    ckpt2 = tmp_path / "other"
    with _reliable_dir(spark, ckpt2):
        cut_lineage(spark.range(3), eager=True).count()
        assert _checkpoint_files(ckpt2) > 0


def test_pagerank_reliable_dir_identical(spark, tmp_path):
    from pos_data_insertion_etl_spark.operators.graph import pagerank

    base = {
        (r.node, r.rank_fp)
        for r in pagerank(_edges(spark), iters=3).collect()
    }
    with _reliable_dir(spark, tmp_path / "pr"):
        rel = {
            (r.node, r.rank_fp)
            for r in pagerank(_edges(spark), iters=3).collect()
        }
    assert rel == base
