"""Zip source: decompress + decode + fixed-width split parity with the
reference's chunked reader semantics (incl. multibyte leftover-carry)."""

from __future__ import annotations

import io

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.sources.zipsource import (
    _record_stream,
    read_zip_fixed_width,
)

from .pos_fixture import RECORD_WIDTH, build_fixture, write_zip


def test_record_stream_multibyte_carry():
    """Tiny read windows force UTF-8 splits mid-character and records
    spanning windows -- the leftover-carry path (main.py:477-485)."""
    recs = ["あいう" + "x" * 7, "0123456789", "ワンツー" + "y" * 6]
    data = "".join(recs).encode("utf-8")
    for window in (1, 3, 7, 64):
        got = list(_record_stream(io.BytesIO(data), 10, read_bytes=window))
        assert got == recs, f"window={window}"


def test_record_stream_partial_tail():
    data = ("A" * 10 + "B" * 4).encode()
    got = list(_record_stream(io.BytesIO(data), 10))
    assert got == ["A" * 10, "B" * 4]


@pytest.fixture(scope="module")
def fixture_zip(tmp_path_factory):
    records, rows = build_fixture()
    path = tmp_path_factory.mktemp("pos") / "R520.20240301_214500.zip"
    write_zip(records, str(path), partial_tail="PARTIAL")
    return str(path), records


def test_read_zip_fixed_width(spark, fixture_zip):
    path, records = fixture_zip
    df = read_zip_fixed_width(spark, path).orderBy("record_idx")
    got = [r.record for r in df.collect()]
    assert got[:-1] == records
    assert got[-1] == "PARTIAL"  # trailing partial record kept (main.py:561-565)
    assert all(len(r) == RECORD_WIDTH for r in got[:-1])


def test_first_member_only(spark, tmp_path):
    """The reference reads only the first zip member (main.py:323)."""
    import zipfile

    p = tmp_path / "two_members.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("first.txt", "A" * 20)
        zf.writestr("second.txt", "B" * 20)
    df = read_zip_fixed_width(spark, str(p), chunk_chars=10)
    got = sorted(r.record for r in df.collect())
    assert got == ["A" * 10, "A" * 10]


def test_scan_ships_paths_not_content(spark, fixture_zip):
    """The input side is streamed: the binaryFile scan must be pruned to
    `path` -- no `content` column anywhere in the physical plan, so the
    JVM never materializes the archive (the old 2 GiB byte-array cap)."""
    path, _ = fixture_zip
    df = read_zip_fixed_width(spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan, plan
    assert "path" in plan


def test_extraction_memory_is_bounded(tmp_path):
    """A task never holds the whole archive: extract a 96 MB STORED
    (uncompressible by design) member through the real task-side code
    path and assert Python peak allocation stays far below the member
    size (bounded by read window + one output batch)."""
    import tracemalloc
    import zipfile

    from pos_data_insertion_etl_spark.sources.zipsource import _extract_records

    member_mb = 96
    rec = ("R" * 519 + "\n").encode()
    n_recs = member_mb * (1 << 20) // len(rec)
    p = tmp_path / "big_stored.zip"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("daily.txt", rec * n_recs)
    del rec

    tracemalloc.start()
    total_rows = 0
    for pdf in _extract_records(str(p), 520, batch_records=2_000):
        total_rows += len(pdf)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    assert total_rows == n_recs
    # whole-archive buffering would peak >= 96 MB; the streamed path is
    # bounded by the 8 MB read window + decode buffer + a 2k-row batch
    assert peak < 48 * (1 << 20), f"peak={peak / (1 << 20):.1f} MiB"


def test_remote_scheme_uses_pyarrow_fs(monkeypatch, tmp_path):
    """Non-local URIs route through pyarrow.fs as a seekable stream (no
    full-file read). Exercised via a mock filesystem so the test needs
    no object store."""
    import zipfile

    from pos_data_insertion_etl_spark.sources import zipsource

    p = tmp_path / "r.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("m.txt", "A" * 20)

    opened = {}

    class FakeFS:
        @staticmethod
        def from_uri(uri):
            opened["uri"] = uri

            class FS:
                def open_input_file(self, rel):
                    opened["rel"] = rel
                    return open(p, "rb")

            return FS(), "bucket/r.zip"

    import pyarrow.fs as pafs

    monkeypatch.setattr(pafs, "FileSystem", FakeFS)
    out = list(
        zipsource._extract_records("s3://bucket/r.zip", 10, batch_records=100)
    )
    assert opened == {"uri": "s3://bucket/r.zip", "rel": "bucket/r.zip"}
    assert list(out[0]["record"]) == ["A" * 10, "A" * 10]


def test_staged_ingest_splits_one_zip(spark, tmp_path):
    """One zip on a multicore session: the staged path must expose >1
    parse-stage task (multiple chunk files) and produce marts identical
    to the direct single-task path."""
    from pos_data_insertion_etl_spark.pipeline.marts import run_pos_pipeline
    from pos_data_insertion_etl_spark.sources.zipsource import (
        read_zip_fixed_width_staged,
    )

    records, _rows = build_fixture(n_days=4)
    zpath = str(tmp_path / "R520.20240301_214500.zip")
    write_zip(records, zpath)

    stage = str(tmp_path / "stage")
    staged = read_zip_fixed_width_staged(
        spark, zpath, stage, records_per_file=50
    )
    # intra-file parallelism restored: one zip -> many splittable chunks,
    # so the parse stage gets >1 task even for a single input file
    assert len(staged.inputFiles()) > 1
    direct = read_zip_fixed_width(spark, zpath)
    assert sorted(map(tuple, staged.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # end-to-end: marts from the staged pipeline == marts from the direct
    out_a = run_pos_pipeline(spark, zpath, out_dir=str(tmp_path / "m_direct"))
    out_b = run_pos_pipeline(
        spark,
        zpath,
        out_dir=str(tmp_path / "m_staged"),
        stage_dir=str(tmp_path / "stage2"),
    )
    for name in out_a["marts"]:
        a = sorted(map(tuple, out_a["marts"][name].collect()))
        b = sorted(map(tuple, out_b["marts"][name].collect()))
        assert a == b, name


def test_zip_datasource_format_matches_function_path(spark, fixture_zip):
    """The registered Spark 4 Python Data Source
    (format('zip_fixed_width')) returns byte-identical records to
    read_zip_fixed_width, with one partition per archive."""
    from pos_data_insertion_etl_spark.sources import zip_datasource

    path, _records = fixture_zip
    zip_datasource.register(spark)
    via_format = (
        spark.read.format("zip_fixed_width").load(path).orderBy("record_idx")
    )
    via_fn = read_zip_fixed_width(spark, path).orderBy("record_idx")
    assert via_format.columns == via_fn.columns
    assert [tuple(r) for r in via_format.collect()] == [
        tuple(r) for r in via_fn.collect()
    ]
    assert via_format.rdd.getNumPartitions() == 1  # one archive -> one task


def test_zip_datasource_requires_path(spark):
    from pos_data_insertion_etl_spark.sources.zip_datasource import (
        ZipFixedWidthReader,
    )

    with pytest.raises(ValueError, match="requires a path"):
        ZipFixedWidthReader({})


def test_zip_datasource_streaming_exactly_once(spark, tmp_path):
    """spark.readStream.format('zip_fixed_width'): first run ingests the
    existing archive; a restart with a NEW archive processes only the
    new one (checkpointed file-level offsets)."""
    from pos_data_insertion_etl_spark.sources import zip_datasource

    zip_datasource.register(spark)
    d = tmp_path / "zips"
    d.mkdir()
    records, _rows = build_fixture()
    write_zip(records, str(d / "day1.zip"))
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("zip_fixed_width")
            .load(str(d / "*.zip"))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    def counts():
        return {
            (r.source_file, r.n)
            for r in spark.read.parquet(out)
            .groupBy("source_file")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }

    run()
    assert counts() == {("day1.zip", len(records))}

    write_zip(records[:3], str(d / "day2.zip"))
    run()
    # day1 must NOT be re-ingested; day2 arrives once
    assert counts() == {("day1.zip", len(records)), ("day2.zip", 3)}


def test_records_from_paths_on_error_skip(spark, tmp_path, fixture_zip):
    """A corrupt archive fails the job under the default policy but is
    skipped (others ingested, failure observable via anti-join) under
    on_error='skip'."""
    import shutil as _sh

    from pos_data_insertion_etl_spark.sources.zipsource import (
        records_from_paths,
    )

    good, records = fixture_zip
    d = tmp_path / "mixed"
    d.mkdir()
    _sh.copy(good, d / "good.zip")
    (d / "corrupt.zip").write_bytes(b"this is not a zip archive")

    paths = spark.read.format("binaryFile").load(str(d / "*.zip")).select("path")

    with pytest.raises(Exception):
        records_from_paths(paths).count()  # default: corrupt archive fails

    out = records_from_paths(paths, on_error="skip")
    got_files = {r.source_file for r in out.select("source_file").distinct().collect()}
    assert got_files == {"good.zip"}
    assert out.count() == len(records) + 1  # + partial tail in the fixture

    listed = paths.select(
        F.element_at(F.split("path", "/"), -1).alias("source_file")
    )
    missing = listed.join(
        out.select("source_file").distinct(), "source_file", "left_anti"
    )
    assert [r.source_file for r in missing.collect()] == ["corrupt.zip"]


def test_on_error_skip_lets_transient_io_errors_propagate(spark, tmp_path, fixture_zip):
    """'skip' means corrupt-CONTENT skip, not swallow-everything: a
    missing file (OSError -- the shape of a transient read failure or a
    misconfigured filesystem) must still fail the task so Spark's retry
    and the operator see it, instead of being silently classified as
    corrupt."""
    from pos_data_insertion_etl_spark.sources.zipsource import (
        records_from_paths,
    )

    paths = spark.createDataFrame(
        [(str(tmp_path / "never_written.zip"),)], "path string"
    )
    with pytest.raises(Exception) as ei:
        records_from_paths(paths, on_error="skip").count()
    assert "FileNotFoundError" in str(ei.value) or "No such file" in str(ei.value)


def test_on_error_skip_eats_corrupt_deflate_member(spark, tmp_path, fixture_zip):
    """A zip with a VALID central directory but a corrupt DEFLATE member
    stream raises zlib.error mid-read (not BadZipFile at open); 'skip'
    must classify that as corrupt-content too, or one rotted archive
    kills an hours-long fleet run (ADVICE r4)."""
    import io as _io
    import shutil as _sh
    import zipfile as _zf

    from pos_data_insertion_etl_spark.sources.zipsource import (
        records_from_paths,
    )

    good, records = fixture_zip
    d = tmp_path / "mixed"
    d.mkdir()
    _sh.copy(good, d / "good.zip")

    buf = _io.BytesIO()
    with _zf.ZipFile(buf, "w", _zf.ZIP_DEFLATED) as zf:
        zf.writestr("member.txt", "abcdefgh" * 4000)
    data = bytearray(buf.getvalue())
    # local header = 30 bytes + len('member.txt'); flip bytes inside the
    # compressed stream, leaving the directory intact
    for i in range(45, 60):
        data[i] ^= 0xFF
    (d / "rotted.zip").write_bytes(bytes(data))

    paths = spark.read.format("binaryFile").load(str(d / "*.zip")).select("path")
    out = records_from_paths(paths, on_error="skip")
    got = {r.source_file for r in out.select("source_file").distinct().collect()}
    assert got == {"good.zip"}
    assert out.count() == len(records) + 1


def test_truncated_member_counts_as_corrupt_content():
    """zipfile raises EOFError when a member's data ends short of its
    declared length; the skip policy must treat that as THIS-archive
    corruption, not an environmental failure."""
    from pos_data_insertion_etl_spark.sources.zipsource import (
        _CORRUPT_ARCHIVE_ERRORS,
    )

    assert EOFError in _CORRUPT_ARCHIVE_ERRORS
    import zlib as _zlib

    assert _zlib.error in _CORRUPT_ARCHIVE_ERRORS
    # environmental errors stay OUT: propagation is the contract
    assert OSError not in _CORRUPT_ARCHIVE_ERRORS


def test_zip_datasource_routes_remote_glob(spark):
    """A remote pattern no longer raises at plan time (round 13, the
    fs seam): it routes to the pyarrow-backed filesystem. Routing only
    -- no network listing in the sandbox; scheme aliasing (s3a -> s3)
    is the seam's job now."""
    from pos_data_insertion_etl_spark.sources import fs

    impl = fs.filesystem_for("s3a://bucket/daily/*.zip")
    assert isinstance(impl, fs.ArrowFileSystem)
    assert impl.scheme == "s3a"
    assert fs.SCHEME_ALIASES["s3a"] == "s3"


def test_zip_datasource_glob_uri_edge_cases(tmp_path):
    """file:// with a remote host must raise (globbing parsed.path would
    silently read the wrong local tree), file:///abs and file://localhost
    work AND PRESERVE their scheme (partitions carry URIs so the
    executor-side open routes through the seam), and a local pattern
    containing ':' is NOT misread as a URI."""
    from pos_data_insertion_etl_spark.sources.zip_datasource import (
        _expand_glob,
    )

    d = tmp_path / "dir:with:colons"
    d.mkdir()
    (d / "a.zip").write_bytes(b"x")

    assert _expand_glob(str(d / "*.zip")) == [str(d / "a.zip")]
    assert _expand_glob(f"file://{d}/*.zip") == [f"file://{d}/a.zip"]
    assert _expand_glob(f"file://localhost{d}/*.zip") == [
        f"file://localhost{d}/a.zip"
    ]
    with pytest.raises(ValueError, match="remote host 'fileserver'"):
        _expand_glob("file://fileserver/share/*.zip")


@pytest.mark.slow
def test_large_archive_rss_stays_bounded(tmp_path):
    """Regression guard for the streamed-input contract at realistic
    size: a 400 MB STORED (compression=0, incompressible layout) member
    runs through the extraction kernel in a FRESH subprocess and the
    process's peak RSS above its post-import baseline must stay far
    below the member size. tracemalloc (the fast test above) only sees
    Python allocations; ru_maxrss also catches native/pyarrow buffering
    regressions."""
    import json
    import os
    import subprocess
    import sys
    import zipfile

    member_mb = 400
    rec = ("R" * 519 + "\n").encode()
    per_block = 16 << 20
    block = rec * (per_block // len(rec))
    n_blocks = member_mb * (1 << 20) // len(block)
    p = tmp_path / "huge_stored.zip"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_STORED) as zf:
        with zf.open("daily.txt", "w", force_zip64=True) as m:
            for _ in range(n_blocks):
                m.write(block)
    n_recs = n_blocks * (len(block) // len(rec))

    script = """
import json, resource, sys
from pos_data_insertion_etl_spark.sources.zipsource import _extract_records
baseline = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
rows = 0
for pdf in _extract_records(sys.argv[1], 520, 20_000):
    rows += len(pdf)
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(json.dumps({"rows": rows, "delta_kib": peak - baseline}))
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", script, str(p)],
        capture_output=True,
        text=True,
        cwd=repo,
        timeout=600,
        check=True,
    )
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["rows"] == n_recs
    # whole-member buffering would add >= 400 MiB over baseline; the
    # streamed path is bounded by read window + decode buffer + batch
    assert got["delta_kib"] < 200 * 1024, f"RSS delta {got['delta_kib']} KiB"
