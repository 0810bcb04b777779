"""Zip source: decompress + decode + fixed-width split parity with the
reference's chunked reader semantics (incl. multibyte leftover-carry)."""

from __future__ import annotations

import io

import pytest

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
