"""Round-15 fixes, one test per ADVICE r14 item (the standing
discipline: every advisory lands with a named test here) plus the new
q294 backend-triangle registration (VERDICT r14 item 7):

1. (high, jobs.py:690 + medium, jobs.py:378) The parquet-table
   existence probes in ``dedup_ingest_batch`` and
   ``pos_stream_ingest`` no longer route through the archive-oriented
   fs seam (whose wildcard-free probe is FILE-only, so a parquet
   DIRECTORY on an object-store scheme probed permanently false and
   cross-batch dedup was silently skipped; and whose pyarrow /
   GRAFT_FS_MAP stack is a different credential world than the Hadoop
   FS the reads use). They go through ``_table_exists`` -- the SAME
   Hadoop FileSystem API the reads/writes/renames use.
2. (low, fs.py) The wildcard-free probe rule is now uniform across
   the seam's three backends: a directory named ``x.tar`` is NOT
   returned as if it were an archive by LocalFileSystem or
   MappedFileSystem any more than by ArrowFileSystem.
3. (low, jobs.py glob metachars) The probe is immune to glob
   metacharacters in the out_dir ('[', '?' are legal POSIX name
   characters; the old glob-based probe silently returned false).
4. (low, session.py) ``release_block_pool`` no longer clears the
   session's SQL cache by default -- that is strictly broader than
   the checkpoint-block pool it documents and evicted caches an
   embedding application created intentionally; ``clear_sql_cache=
   True`` opts in.
5. (VERDICT r14 item 7) ``q294_tar_mapped_fs`` drives listing AND
   executor-side opens through MappedFileSystem, completing the
   local/arrow/mapped backend triangle at the registry level; the
   GRAFT_FS_MAP install merges with pre-existing entries instead of
   clobbering them.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.sources import fs


# --------------------------------------------------------------------
# 1. table-existence probes route through Hadoop FS, not the fs seam
# --------------------------------------------------------------------

def test_table_exists_is_hadoop_fs_and_directory_true(spark, tmp_path):
    from pos_data_insertion_etl_spark.streaming.jobs import _table_exists

    d = tmp_path / "digests"
    assert _table_exists(spark, str(d)) is False
    d.mkdir()
    # a DIRECTORY probes true -- exactly what the fs seam's file-only
    # rule forbids, and what a parquet table needs (ADVICE r14 high)
    assert _table_exists(spark, str(d)) is True
    # ... and the seam would answer the opposite for the same path on
    # every backend, which is why it must not be used here:
    assert fs.expand_glob(str(d)) == []


def test_table_exists_immune_to_glob_metachars(spark, tmp_path):
    """ADVICE r14 low: '[', '?' are legal POSIX directory characters;
    the old glob.glob-based probe silently returned false for them."""
    from pos_data_insertion_etl_spark.streaming.jobs import _table_exists

    d = tmp_path / "out[1]"
    d.mkdir()
    assert _table_exists(spark, str(d)) is True


def test_streaming_jobs_no_longer_probe_via_seam():
    """Source-level pin: no fs-seam glob call remains anywhere in
    streaming/jobs.py -- every existence probe in the module runs
    through the Hadoop FileSystem stack the reads/writes/swaps use."""
    import inspect

    from pos_data_insertion_etl_spark.streaming import jobs

    src = inspect.getsource(jobs)
    assert "expand_glob" not in src
    assert "_table_exists" in src


def test_dedup_ingest_dedupes_without_touching_the_seam(
    spark, tmp_path, monkeypatch
):
    """Behavioral proof of the high fix: dedup across batches works
    with the fs seam completely disabled. Before the fix, batch 2's
    probe called fs.expand_glob -- on an ArrowFileSystem out_dir the
    [] answer skipped the anti-join and appended duplicates on a
    green run."""
    from pos_data_insertion_etl_spark.streaming.jobs import (
        dedup_ingest_batch,
    )

    def _boom(pattern):  # pragma: no cover - failure path
        raise AssertionError(
            f"streaming probe reached the fs seam for {pattern!r}"
        )

    monkeypatch.setattr(fs, "expand_glob", _boom)
    out_dir = str(tmp_path / "ingest_state")
    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), (F.col("id") % 5).cast("string")).alias(
            "text"
        ),
    )
    dedup_ingest_batch(docs, 0, out_dir)
    # batch 1 repeats the same texts: the probe must HIT (directory
    # exists) and the anti-join must drop every row
    dedup_ingest_batch(docs, 1, out_dir)
    corpus = spark.read.parquet(os.path.join(out_dir, "corpus"))
    assert corpus.count() == 5
    digests = spark.read.parquet(os.path.join(out_dir, "digests"))
    assert digests.count() == 5


# --------------------------------------------------------------------
# 2. wildcard-free probes are file-only on ALL backends
# --------------------------------------------------------------------

def test_local_wildcard_free_probe_is_file_only(tmp_path):
    (tmp_path / "notatar.tar").mkdir()
    real = tmp_path / "real.tar"
    real.write_bytes(b"x")
    # bare path and file:// URI, directory vs file
    assert fs.expand_glob(str(tmp_path / "notatar.tar")) == []
    assert fs.expand_glob(f"file://{tmp_path}/notatar.tar") == []
    assert fs.expand_glob(str(real)) == [str(real)]
    # URI form is preserved on a hit
    assert fs.expand_glob(f"file://{real}") == [f"file://{real}"]
    # wildcarded listings are file-only too, like the FileSelector
    # walk on the pyarrow backend: the directory stays out
    assert fs.expand_glob(str(tmp_path / "*.tar")) == [str(real)]


def test_mapped_wildcard_free_probe_is_file_only(tmp_path, monkeypatch):
    root = tmp_path / "fakestore"
    (root / "bucket").mkdir(parents=True)
    (root / "bucket" / "notatar.tar").mkdir()
    (root / "bucket" / "real.tar").write_bytes(b"x")
    monkeypatch.setenv("GRAFT_FS_MAP", f"s3mock={root}")
    assert fs.expand_glob("s3mock://bucket/notatar.tar") == []
    assert fs.expand_glob("s3mock://bucket/real.tar") == [
        "s3mock://bucket/real.tar"
    ]


def test_all_three_backends_agree_on_directory_probe(
    tmp_path, monkeypatch
):
    """The r13 x.tar-directory bug, certified fixed on every backend
    with the SAME layout: a directory named like an archive probes []
    everywhere (ADVICE r14 low: previously only on pyarrow)."""
    root = tmp_path / "store"
    (root / "b").mkdir(parents=True)
    (root / "b" / "x.tar").mkdir()
    monkeypatch.setenv("GRAFT_FS_MAP", f"m={root}")
    local = fs.expand_glob(str(root / "b" / "x.tar"))
    mapped = fs.expand_glob("m://b/x.tar")
    arrow = fs.expand_glob(f"arrowfile://{root}/b/x.tar")
    assert local == mapped == arrow == []


# --------------------------------------------------------------------
# 4. release_block_pool leaves the SQL cache alone by default
# --------------------------------------------------------------------

def test_release_block_pool_keeps_sql_cache_unless_opted_in(spark):
    from pos_data_insertion_etl_spark.session import release_block_pool

    spark.range(100).createOrReplaceTempView("r15_cache_probe")
    spark.catalog.cacheTable("r15_cache_probe")
    try:
        assert spark.catalog.isCached("r15_cache_probe")
        release_block_pool(spark)
        assert spark.catalog.isCached("r15_cache_probe"), (
            "default release_block_pool dropped an application SQL "
            "cache -- ADVICE r14: that must be opt-in"
        )
        release_block_pool(spark, clear_sql_cache=True)
        assert not spark.catalog.isCached("r15_cache_probe")
        doc = release_block_pool.__doc__
        assert "clear_sql_cache" in doc and "opt-in" in doc
    finally:
        spark.catalog.dropTempView("r15_cache_probe")


# --------------------------------------------------------------------
# 5. q294: MappedFileSystem driven end-to-end; env install merges
# --------------------------------------------------------------------

def test_q294_routes_through_mapped_filesystem(spark, sf_smoke):
    from pos_data_insertion_etl_spark.plans import all_queries

    spec = all_queries()["q294_tar_mapped_fs"]
    rows = spec.spark(spark, sf_smoke).collect()
    assert len(rows) == 12
    assert {r.member for r in rows} and all(r.n_records > 0 for r in rows)
    # worker-side channel installed (runtime spark.executorEnv twin)
    env = spark.sparkContext.environment.get("GRAFT_FS_MAP", "")
    assert "s3graft=" in env


def test_q294_registered_with_oracle_and_tags():
    from pos_data_insertion_etl_spark.plans import all_queries

    spec = all_queries()["q294_tar_mapped_fs"]
    assert spec.oracle is not None
    assert "mapped" in spec.tags and "fs" in spec.tags


# --------------------------------------------------------------------
# VERDICT r14 item 4: the three new closed-form witnesses hold at tiny
# scale inside the suite (same guard pattern as round 14's five).
# --------------------------------------------------------------------

@pytest.mark.parametrize(
    "witness",
    [
        "w_kcore",
        "w_sessionize",
        "w_watermark_late",
        "w_sssp_tree",
        "w_triangles",
        "w_asof",
    ],
)
def test_new_closed_form_witnesses_tiny(spark, monkeypatch, witness):
    import importlib.util
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "closed_form_scale_under_test_r15",
        os.path.join(repo, "tools", "closed_form_scale.py"),
    )
    cfs = importlib.util.module_from_spec(spec)
    _sys.modules[spec.name] = spec.loader.exec_module(cfs) or cfs
    monkeypatch.setattr(cfs, "SCALE", 0.003)
    rec = getattr(cfs, witness)(spark)
    assert rec["ok"], rec


def test_q294_fs_map_install_merges_not_clobbers(spark, monkeypatch):
    from pos_data_insertion_etl_spark.plans.llm_ops32 import (
        _install_fs_map,
    )

    monkeypatch.setenv("GRAFT_FS_MAP", "keepme=/some/root")
    _install_fs_map(spark)
    merged = os.environ["GRAFT_FS_MAP"]
    assert "keepme=/some/root" in merged and "s3graft=" in merged
    # idempotent: a second install does not duplicate the entry
    _install_fs_map(spark)
    assert os.environ["GRAFT_FS_MAP"].count("s3graft=") == 1
