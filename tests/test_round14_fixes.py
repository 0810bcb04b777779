"""Round-14 fixes, one test per ADVICE r13 item (the standing
discipline: every advisory lands with a named test here) plus the
VERDICT r13 "what's wrong" item:

1. (medium, fs.py glob) ArrowFileSystem matches PER PATH COMPONENT:
   ``*`` no longer crosses ``/``, so ``bucket/daily/*.zip`` cannot
   silently ingest ``bucket/daily/sub/deep.zip`` on a real object
   store -- and the pyarrow path now agrees with the local/mapped
   backends' python-glob semantics (dotfile rule included).
2. (low, fs.py urlparse) Glob PATTERNS carrying ``?`` (a legal
   single-char wildcard) are no longer misparsed as URI query strings:
   Local/Mapped list them correctly, ArrowFileSystem lists them via
   the wildcard-free-prefix resolution, and ``#`` raises loudly on the
   Arrow backend instead of listing nothing.
3. (low, fs.py probe) A wildcard-free Arrow path naming a DIRECTORY is
   not returned as if it were an archive file.
4. (low, relational2.py q97) The eager-localCheckpoint contract is
   documented and ``session.release_block_pool`` actually releases the
   blocks a long-lived harness would otherwise accumulate.
5. (low, session.py scoped_conf) The session-visibility contract is
   documented, and the documented isolation recipe works: a scoped
   override on ``spark.newSession()`` never leaks into the parent.
6. (VERDICT "what's wrong") The streamed-ingest first-batch path
   issues NO read of a nonexistent digests/mart path -- the
   fs-seam existence probe runs first, so no failed analysis ever
   reaches ExecutionListenerBus as a green-run ERROR stack.
"""

from __future__ import annotations

import os

import pytest

from pos_data_insertion_etl_spark.sources import fs

from .test_fs_seam import _FakeArrowFs, _patch_from_uri


# --------------------------------------------------------------------
# 1. per-component glob matching on the Arrow backend
# --------------------------------------------------------------------

def test_arrow_glob_star_does_not_cross_slash(monkeypatch):
    """The ADVICE r13 divergence itself: a nested file under the
    matched directory must NOT match a single-level pattern."""
    fake = _FakeArrowFs(
        [
            "bucket/daily/R520.zip",
            "bucket/daily/sub/deep.zip",          # the silent extra
            "bucket/daily/sub/deeper/x.zip",
        ]
    )
    _patch_from_uri(monkeypatch, fake, "s3")
    assert fs.expand_glob("s3://bucket/daily/*.zip") == [
        "s3://bucket/daily/R520.zip"
    ]
    # depth-pinned wildcards still reach exactly their level
    assert fs.expand_glob("s3://bucket/daily/*/*.zip") == [
        "s3://bucket/daily/sub/deep.zip"
    ]


def test_arrow_glob_dotfile_rule_matches_local(monkeypatch, tmp_path):
    """All three backends agree: '*' skips dot-led names (python glob
    semantics), an explicit dot-led pattern matches them."""
    fake = _FakeArrowFs(["bucket/d/a.zip", "bucket/d/.hidden.zip"])
    _patch_from_uri(monkeypatch, fake, "s3")
    assert fs.expand_glob("s3://bucket/d/*.zip") == ["s3://bucket/d/a.zip"]
    assert fs.expand_glob("s3://bucket/d/.*.zip") == [
        "s3://bucket/d/.hidden.zip"
    ]
    # the local backend's reference behavior (python glob)
    (tmp_path / "a.zip").write_bytes(b"x")
    (tmp_path / ".hidden.zip").write_bytes(b"y")
    assert fs.expand_glob(f"{tmp_path}/*.zip") == [f"{tmp_path}/a.zip"]


def test_arrow_glob_real_pyarrow_local_nested(tmp_path):
    """Same property through the REAL pyarrow backend (arrowfile://):
    no fake, no monkeypatch -- the adapter an s3:// URI uses."""
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.tar").write_bytes(b"x")
    (tmp_path / "sub" / "nested.tar").write_bytes(b"y")
    impl = fs.filesystem_for(f"arrowfile://{tmp_path}/*.tar")
    assert isinstance(impl, fs.ArrowFileSystem)
    assert fs.expand_glob(f"arrowfile://{tmp_path}/*.tar") == [
        f"arrowfile://{tmp_path}/a.tar"
    ]
    assert fs.expand_glob(f"arrowfile://{tmp_path}/*/*.tar") == [
        f"arrowfile://{tmp_path}/sub/nested.tar"
    ]
    with fs.open_seekable(f"arrowfile://{tmp_path}/a.tar") as fh:
        assert type(fh).__module__.startswith("pyarrow")
        assert fh.read() == b"x"


# --------------------------------------------------------------------
# 2. '?' is a wildcard, not a query string; '#' raises loudly on Arrow
# --------------------------------------------------------------------

def test_question_mark_pattern_local_and_mapped(tmp_path, monkeypatch):
    (tmp_path / "R520.zip").write_bytes(b"x")
    (tmp_path / "R52a.zip").write_bytes(b"y")
    (tmp_path / "R5200.zip").write_bytes(b"z")  # '?' is single-char
    got = fs.expand_glob(f"file://{tmp_path}/R52?.zip")
    assert got == [
        f"file://{tmp_path}/R520.zip",
        f"file://{tmp_path}/R52a.zip",
    ]
    root = tmp_path / "store"
    (root / "b" / "d").mkdir(parents=True)
    (root / "b" / "d" / "R521.bin").write_bytes(b"p")
    (root / "b" / "d" / "R5210.bin").write_bytes(b"q")
    monkeypatch.setenv("GRAFT_FS_MAP", f"s3mock={root}")
    assert fs.expand_glob("s3mock://b/d/R52?.bin") == [
        "s3mock://b/d/R521.bin"
    ]


def test_question_mark_pattern_real_arrow(tmp_path):
    (tmp_path / "R521.tar").write_bytes(b"p")
    (tmp_path / "R5210.tar").write_bytes(b"q")
    assert fs.expand_glob(f"arrowfile://{tmp_path}/R52?.tar") == [
        f"arrowfile://{tmp_path}/R521.tar"
    ]


def test_hash_raises_loudly_on_arrow_backend(tmp_path):
    with pytest.raises(ValueError, match="#"):
        fs.expand_glob(f"arrowfile://{tmp_path}/data#1.tar")
    with pytest.raises(ValueError, match="#"):
        fs.open_seekable(f"arrowfile://{tmp_path}/data#1.tar")
    # ...but '#' stays a plain character on the local backend
    (tmp_path / "data#1.tar").write_bytes(b"x")
    assert fs.expand_glob(f"file://{tmp_path}/data#1.tar") == [
        f"file://{tmp_path}/data#1.tar"
    ]


# --------------------------------------------------------------------
# 3. wildcard-free probe: a Directory is not an archive hit
# --------------------------------------------------------------------

def test_arrow_probe_requires_file(monkeypatch):
    import pyarrow.fs as pafs

    class _DirFake(_FakeArrowFs):
        def get_file_info(self, sel):
            if isinstance(sel, str) and sel == "bucket/daily":
                from .test_fs_seam import _FakeInfo

                return _FakeInfo(sel, pafs.FileType.Directory)
            return super().get_file_info(sel)

    _patch_from_uri(monkeypatch, _DirFake(["bucket/daily/R520.zip"]), "s3")
    # the directory itself probes to NOTHING; the file inside still hits
    assert fs.expand_glob("s3://bucket/daily") == []
    assert fs.expand_glob("s3://bucket/daily/R520.zip") == [
        "s3://bucket/daily/R520.zip"
    ]


def test_arrow_probe_requires_file_real_pyarrow(tmp_path):
    (tmp_path / "notatar.tar").mkdir()
    assert fs.expand_glob(f"arrowfile://{tmp_path}/notatar.tar") == []


# --------------------------------------------------------------------
# 4. q97 checkpoint contract: documented + releasable
# --------------------------------------------------------------------

def test_q97_contract_documented_and_pool_releasable(spark, sf_smoke):
    from pos_data_insertion_etl_spark.plans import all_queries
    from pos_data_insertion_etl_spark.session import release_block_pool

    q97 = all_queries()["q97_recursive_order_chain"].spark
    doc = q97.__doc__
    assert "release_block_pool" in doc and "NON-RELIABLE" in doc

    release_block_pool(spark)  # start from a clean pool
    df = q97(spark, sf_smoke)
    assert df.count() > 0
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert len(list(jmap.keys())) > 0, (
        "q97's eager localCheckpoint should have left blocks to release"
    )
    released = release_block_pool(spark)
    assert released > 0
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert len(list(jmap.keys())) == 0


# --------------------------------------------------------------------
# 5. scoped_conf: contract documented; newSession isolation works
# --------------------------------------------------------------------

def test_scoped_conf_documents_threading_and_isolates(spark):
    from pos_data_insertion_etl_spark.session import scoped_conf

    doc = scoped_conf.__doc__
    assert "single-threaded" in doc and "newSession" in doc

    key = "spark.sql.cteRecursionRowLimit"
    parent_before = spark.conf.get(key)
    child = spark.newSession()
    with scoped_conf(child, key, "123456789"):
        assert child.conf.get(key) == "123456789"
        # the parent session NEVER sees the override (the documented
        # multi-threaded-driver recipe)
        assert spark.conf.get(key) == parent_before
    assert child.conf.get(key) == parent_before
    assert spark.conf.get(key) == parent_before


def test_scoped_conf_restores_on_exception(spark):
    from pos_data_insertion_etl_spark.session import scoped_conf

    key = "spark.sql.cteRecursionRowLimit"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError, match="boom"):
        with scoped_conf(spark, key, "424242"):
            assert spark.conf.get(key) == "424242"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before


# --------------------------------------------------------------------
# VERDICT r13 item 5: the three new closed-form witnesses hold at tiny
# scale inside the suite (the tool runs them at 2M+ rows per round;
# this guards the closed forms themselves against regressions between
# rounds -- same functions, same exactness, smaller n).
# --------------------------------------------------------------------

@pytest.mark.parametrize(
    "witness",
    [
        "w_setsim",
        "w_curation_stream",
        "w_lsh_buckets",
        "w_pagerank_ring",
        "w_bfs_tree",
    ],
)
def test_new_closed_form_witnesses_tiny(spark, monkeypatch, witness):
    import importlib.util
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "closed_form_scale_under_test",
        os.path.join(repo, "tools", "closed_form_scale.py"),
    )
    cfs = importlib.util.module_from_spec(spec)
    _sys.modules[spec.name] = spec.loader.exec_module(cfs) or cfs
    monkeypatch.setattr(cfs, "SCALE", 0.003)
    rec = getattr(cfs, witness)(spark)
    assert rec["ok"], rec


# --------------------------------------------------------------------
# VERDICT r13 item 4: the bench box-regime calibration probe
# --------------------------------------------------------------------

def test_bench_calibration_probe_shape(spark):
    import bench

    cal = bench._calibration_probe(spark)
    assert sorted(cal) == ["median", "reps"]
    assert len(cal["reps"]) == 3
    assert all(r > 0 for r in cal["reps"])
    assert min(cal["reps"]) <= cal["median"] <= max(cal["reps"])


# --------------------------------------------------------------------
# 6. first-batch ingest: no read of a nonexistent state path
# --------------------------------------------------------------------

def _spy_parquet_reads(monkeypatch):
    """Record (path, existed_at_read_time) for every DataFrameReader
    .parquet call -- a legitimate post-write re-read of the same path
    (the derived marts recompute from the merged SKU mart) must not
    count as a phantom read."""
    from pyspark.sql.readwriter import DataFrameReader

    calls: list[tuple[str, bool]] = []
    orig = DataFrameReader.parquet

    def spy(self, *paths, **kw):
        calls.extend((p, os.path.exists(p)) for p in paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    return calls


def test_first_batch_issues_no_phantom_digest_read(
    spark, tmp_path, monkeypatch
):
    from pyspark.sql import functions as F

    from pos_data_insertion_etl_spark.streaming.jobs import (
        dedup_ingest_batch,
    )

    out_dir = str(tmp_path / "ingest_state")
    digests_path = os.path.join(out_dir, "digests")
    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), (F.col("id") % 7).cast("string")).alias(
            "text"
        ),
    )
    calls = _spy_parquet_reads(monkeypatch)
    dedup_ingest_batch(docs, 0, out_dir)
    assert (digests_path, False) not in calls, (
        "first batch read a digests path that does not exist -- the "
        "failed analysis surfaces as an ExecutionListenerBus ERROR "
        "stack on a green run (VERDICT r13)"
    )
    # second batch: the table now exists, the carried state MUST load
    calls.clear()
    dedup_ingest_batch(docs, 1, out_dir)
    assert (digests_path, True) in calls
    # replay exactness is untouched: 7 distinct texts kept once
    corpus = spark.read.parquet(os.path.join(out_dir, "corpus"))
    assert corpus.count() == 7


def test_first_mart_batch_issues_no_phantom_read(tmp_path, monkeypatch):
    """The sibling probe in the POS mart stream's foreachBatch: drive
    one availableNow micro-batch from a fresh checkpoint and assert no
    read of the not-yet-existing mart path was issued."""
    import tests.pos_fixture as fx
    from pos_data_insertion_etl_spark.session import get_session
    from pos_data_insertion_etl_spark.streaming import jobs as sj

    spark = get_session("r14-mart-probe", shuffle_partitions=8)
    records, _ = fx.build_fixture(
        n_days=2, stores=2, txns_per_store_day=2, lines_per_txn=2
    )
    zdir = tmp_path / "zips"
    zdir.mkdir()
    fx.write_zip(records, str(zdir / "R520.20240301_214500.zip"))
    out = str(tmp_path / "marts")
    calls = _spy_parquet_reads(monkeypatch)
    q = sj.pos_stream_ingest(
        spark,
        str(zdir),
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    sku_path = os.path.join(out, "t_day_pos_daily_sku_data")
    phantom = [p for p, existed in calls if p == sku_path and not existed]
    assert not phantom, (
        "first mart batch read the mart path before it existed"
    )
    assert spark.read.parquet(sku_path).count() > 0
