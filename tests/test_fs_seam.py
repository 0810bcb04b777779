"""The filesystem seam under the archive sources (VERDICT r12 item 7).

At 100 TB the archive source is an object store; these tests prove the
zip/tar sources list AND open through ONE scheme-routed seam
(sources/fs.py), so an s3/abfs implementation is a config entry, not a
rewrite:

* scheme-prefixed local URIs (file://) flow through the full Spark
  read path end-to-end;
* an object-store test double (GRAFT_FS_MAP: scheme://bucket/key ->
  localroot/bucket/key) serves BOTH plan-time listing and
  executor-side opens -- exercised in a fresh subprocess so the env
  var is captured at JVM launch, exactly how spark.executorEnv ships
  it on a real cluster;
* in-process register_filesystem() installs a custom adapter for
  driver-side planning.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tarfile
import textwrap
import zipfile

import pytest

from pos_data_insertion_etl_spark.sources import fs

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TESTS_DIR)

REC = 520  # reference record width (main.py:409-412)


def _write_zip(path: str, n_records: int) -> None:
    body = "".join(
        chr(ord("A") + (i % 26)) * REC for i in range(n_records)
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("data.txt", body)


# --------------------------------------------------------------------
# unit: the seam's routing + the mapped object-store double
# --------------------------------------------------------------------

def test_local_glob_preserves_scheme(tmp_path):
    (tmp_path / "a.zip").write_bytes(b"x")
    (tmp_path / "b.zip").write_bytes(b"y")
    got = fs.expand_glob(f"file://{tmp_path}/*.zip")
    assert got == [f"file://{tmp_path}/a.zip", f"file://{tmp_path}/b.zip"]
    with fs.open_seekable(got[0]) as fh:
        assert fh.read() == b"x"


def test_mapped_scheme_lists_and_opens(tmp_path, monkeypatch):
    root = tmp_path / "mock_store"
    (root / "bucket" / "daily").mkdir(parents=True)
    (root / "bucket" / "daily" / "one.bin").write_bytes(b"payload-1")
    (root / "bucket" / "daily" / "two.bin").write_bytes(b"payload-2")
    (root / "other" / "daily").mkdir(parents=True)
    (root / "other" / "daily" / "three.bin").write_bytes(b"x")
    monkeypatch.setenv("GRAFT_FS_MAP", f"s3mock={root}")

    got = fs.expand_glob("s3mock://bucket/daily/*.bin")
    assert got == [
        "s3mock://bucket/daily/one.bin",
        "s3mock://bucket/daily/two.bin",
    ]
    with fs.open_seekable(got[1]) as fh:
        assert fh.read() == b"payload-2"
    # bucket isolation: the other bucket's file never leaks in
    assert fs.expand_glob("s3mock://other/*/*.bin") == [
        "s3mock://other/daily/three.bin"
    ]


def test_registered_filesystem_wins(tmp_path):
    class Double:
        def glob(self, pattern):
            return [pattern.replace("*", "resolved")]

        def open_input(self, path):  # pragma: no cover - not exercised
            raise AssertionError

    fs.register_filesystem("graftcustom", Double)
    try:
        assert fs.expand_glob("graftcustom://b/*.zip") == [
            "graftcustom://b/resolved.zip"
        ]
    finally:
        fs.unregister_filesystem("graftcustom")
    # after unregistration the scheme falls through to pyarrow routing
    assert isinstance(
        fs.filesystem_for("graftcustom://b/x"), fs.ArrowFileSystem
    )


def test_unresolvable_scheme_raises_at_plan_time():
    # pyarrow knows no 'bogus' filesystem: listing must raise, never
    # return a silent empty partition list.
    with pytest.raises(Exception, match="[Bb]ogus|[Uu]nrecognized|URI"):
        fs.expand_glob("bogus://bucket/*.zip")


# --------------------------------------------------------------------
# e2e: file:// through the registered Spark data source
# --------------------------------------------------------------------

def test_zip_datasource_reads_file_scheme(spark, tmp_path):
    from pos_data_insertion_etl_spark.sources.zip_datasource import register

    _write_zip(str(tmp_path / "R520.zip"), 7)
    register(spark)
    plain = (
        spark.read.format("zip_fixed_width")
        .load(str(tmp_path / "*.zip"))
        .orderBy("record_idx")
        .collect()
    )
    via_uri = (
        spark.read.format("zip_fixed_width")
        .load(f"file://{tmp_path}/*.zip")
        .orderBy("record_idx")
        .collect()
    )
    assert len(plain) == 7
    assert [r.record for r in plain] == [r.record for r in via_uri]
    assert {r.source_file for r in via_uri} == {"R520.zip"}


# --------------------------------------------------------------------
# e2e: the object-store double through zip DataSource + tar source,
# in a fresh process so GRAFT_FS_MAP is captured at JVM launch (the
# spark.executorEnv path on a real cluster).
# --------------------------------------------------------------------

def test_mapped_scheme_end_to_end_fresh_jvm(tmp_path):
    root = tmp_path / "store"
    (root / "pos" / "daily").mkdir(parents=True)
    _write_zip(str(root / "pos" / "daily" / "R520.zip"), 5)
    body = ("Z" * REC) * 3
    with tarfile.open(root / "pos" / "daily" / "R521.tar.gz", "w:gz") as tf:
        import io

        data = body.encode()
        info = tarfile.TarInfo("data.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))

    code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {_REPO_ROOT!r})
        from pos_data_insertion_etl_spark.session import get_session
        from pos_data_insertion_etl_spark.sources.zip_datasource import register
        from pos_data_insertion_etl_spark.sources.tarsource import (
            records_from_tar_paths,
        )

        spark = get_session("fs-seam-e2e", shuffle_partitions=4)
        register(spark)
        rows = (
            spark.read.format("zip_fixed_width")
            .load("s3mock://pos/daily/*.zip")
            .collect()
        )
        assert len(rows) == 5, rows
        assert all(len(r.record) == {REC} for r in rows)
        assert {{r.source_file for r in rows}} == {{"R520.zip"}}, rows

        paths = spark.createDataFrame(
            [("s3mock://pos/daily/R521.tar.gz",)], "path string"
        )
        trows = records_from_tar_paths(paths).collect()
        assert len(trows) == 3, trows
        assert all(r.record == "Z" * {REC} for r in trows)
        print("FS_SEAM_E2E_OK")
        spark.stop()
        """
    )
    env = dict(os.environ, GRAFT_FS_MAP=f"s3mock={root}")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=_REPO_ROOT,
    )
    assert "FS_SEAM_E2E_OK" in proc.stdout, (
        proc.stdout[-2000:],
        proc.stderr[-2000:],
    )


# --------------------------------------------------------------------
# unit: ArrowFileSystem listing logic (FileSelector + fnmatch over the
# wildcard-free prefix) against a FAKE pyarrow filesystem -- the
# sandbox has no object store, so the glob algebra is what we can pin:
# prefix preservation (including s3a alias length math), recursive
# match, wildcard-free existence probe.
# --------------------------------------------------------------------

class _FakeInfo:
    def __init__(self, path, type_):
        self.path = path
        self.type = type_


class _FakeArrowFs:
    """Mimics pyarrow.fs semantics for S3-style paths: from_uri strips
    'scheme://' and returns 'bucket/key' rels; listings return
    bucket-prefixed paths; directories appear as Directory infos."""

    def __init__(self, files):
        self._files = files  # rel paths like 'bucket/daily/a.zip'

    def get_file_info(self, sel):
        import pyarrow.fs as pafs

        if isinstance(sel, pafs.FileSelector):
            base = sel.base_dir.rstrip("/")
            out = []
            dirs = set()
            for f in self._files:
                if f.startswith(base + "/"):
                    out.append(_FakeInfo(f, pafs.FileType.File))
                    parent = f.rsplit("/", 1)[0]
                    if parent != base:
                        dirs.add(parent)
            out.extend(_FakeInfo(d, pafs.FileType.Directory) for d in dirs)
            return out
        # single-path probe
        t = (
            pafs.FileType.File
            if sel in self._files
            else pafs.FileType.NotFound
        )
        return _FakeInfo(sel, t)

    def open_input_file(self, rel):  # pragma: no cover - not exercised
        raise AssertionError


def _patch_from_uri(monkeypatch, fake, expect_scheme):
    # pyarrow._fs.FileSystem is an immutable C type; patch the MODULE
    # binding the seam resolves through (`pafs.FileSystem.from_uri`).
    import pyarrow.fs as pafs

    class _FakeFSClass:
        @staticmethod
        def from_uri(uri):
            scheme, _, rest = uri.partition("://")
            assert scheme == expect_scheme, (scheme, expect_scheme)
            return fake, rest

    monkeypatch.setattr(pafs, "FileSystem", _FakeFSClass)


def test_arrow_glob_prefix_and_fnmatch(monkeypatch):
    fake = _FakeArrowFs(
        [
            "bucket/daily/R520.zip",
            "bucket/daily/R521.zip",
            "bucket/daily/notes.txt",
            "bucket/deep/sub/R9.zip",
            "other/daily/R522.zip",
        ]
    )
    _patch_from_uri(monkeypatch, fake, "s3")
    got = fs.expand_glob("s3://bucket/daily/*.zip")
    assert got == [
        "s3://bucket/daily/R520.zip",
        "s3://bucket/daily/R521.zip",
    ]
    # recursive wildcard walks subdirectories under the static prefix
    assert fs.expand_glob("s3://bucket/*/sub/*.zip") == [
        "s3://bucket/deep/sub/R9.zip"
    ]


def test_arrow_glob_alias_scheme_preserved(monkeypatch):
    """s3a:// is aliased to s3 for pyarrow but the RESULTS must carry
    the caller's original scheme (Spark's binaryFile emits s3a:// on
    S3 deployments, and downstream opens re-route through the same
    alias)."""
    fake = _FakeArrowFs(["bucket/daily/R520.zip"])
    _patch_from_uri(monkeypatch, fake, "s3")
    got = fs.expand_glob("s3a://bucket/daily/*.zip")
    assert got == ["s3a://bucket/daily/R520.zip"]


def test_arrow_glob_wildcard_free_probe(monkeypatch):
    fake = _FakeArrowFs(["bucket/daily/R520.zip"])
    _patch_from_uri(monkeypatch, fake, "s3")
    assert fs.expand_glob("s3://bucket/daily/R520.zip") == [
        "s3://bucket/daily/R520.zip"
    ]
    assert fs.expand_glob("s3://bucket/daily/missing.zip") == []
