"""TAR archive source (sources/tarsource.py): round-trips, multi-member
ingest, compression variants, member filtering, corrupt-skip policy,
and trailing-partial-record parity with the zip path."""

from __future__ import annotations

import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.sources.tarsource import (
    read_tar_fixed_width,
    records_from_tar_paths,
)

REC = 20  # short fixed width keeps fixtures readable


def _mkrecords(prefix: str, n: int) -> str:
    return "".join(f"{prefix}{i:04d}".ljust(REC, ".") for i in range(n))


def _write_tar(path: str, members: dict[str, str], mode: str = "w") -> None:
    with tarfile.open(path, mode) as tf:
        for name, text in members.items():
            data = text.encode()
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


@pytest.fixture()
def tar_dir(tmp_path):
    d = tmp_path / "tars"
    d.mkdir()
    return str(d)


def _collect(df):
    return {
        (r.source_file, r.member, r.record_idx): r.record
        for r in df.collect()
    }


def test_tar_roundtrip_multi_member(spark, tar_dir):
    members = {
        "day1/a.txt": _mkrecords("A", 7),
        "day1/b.txt": _mkrecords("B", 3),
    }
    _write_tar(os.path.join(tar_dir, "x.tar"), members)
    out = read_tar_fixed_width(spark, tar_dir, chunk_chars=REC)
    got = _collect(out)
    assert len(got) == 10
    assert got[("x.tar", "day1/a.txt", 0)].startswith("A0000")
    assert got[("x.tar", "day1/a.txt", 6)].startswith("A0006")
    assert got[("x.tar", "day1/b.txt", 2)].startswith("B0002")


def test_tar_gz_and_member_glob(spark, tar_dir):
    members = {
        "data/a.dat": _mkrecords("G", 4),
        "meta/readme.md": "not fixed width at all",
    }
    _write_tar(os.path.join(tar_dir, "y.tar.gz"), members, mode="w:gz")
    out = read_tar_fixed_width(
        spark, tar_dir, chunk_chars=REC, member_glob="data/*"
    )
    rows = out.collect()
    assert {r.member for r in rows} == {"data/a.dat"}
    assert len(rows) == 4


def test_tar_trailing_partial_record_kept(spark, tar_dir):
    text = _mkrecords("P", 2) + "SHORT"  # 5-char trailing fragment
    _write_tar(os.path.join(tar_dir, "p.tar"), {"p.txt": text})
    out = read_tar_fixed_width(spark, tar_dir, chunk_chars=REC)
    recs = {r.record_idx: r.record for r in out.collect()}
    assert len(recs) == 3
    assert recs[2] == "SHORT"  # reference keeps the leftover


def test_tar_corrupt_skip_vs_fail(spark, tar_dir):
    _write_tar(
        os.path.join(tar_dir, "good.tar"), {"g.txt": _mkrecords("O", 2)}
    )
    with open(os.path.join(tar_dir, "bad.tar"), "wb") as fh:
        fh.write(b"definitely not a tar archive" * 40)
    paths = (
        spark.read.format("binaryFile").load(tar_dir).select("path")
    )
    ok = records_from_tar_paths(
        paths, chunk_chars=REC, on_error="skip"
    ).collect()
    assert {r.source_file for r in ok} == {"good.tar"}
    assert len(ok) == 2
    with pytest.raises(Exception):
        records_from_tar_paths(
            paths, chunk_chars=REC, on_error="fail"
        ).collect()


def test_tar_rejects_bad_on_error(spark, tar_dir):
    _write_tar(
        os.path.join(tar_dir, "z.tar"), {"z.txt": _mkrecords("Z", 1)}
    )
    paths = spark.read.format("binaryFile").load(tar_dir).select("path")
    with pytest.raises(ValueError):
        records_from_tar_paths(paths, on_error="maybe")


def test_tar_matches_zip_ingest_on_same_payload(spark, tar_dir, tmp_path):
    """Parity: the same fixed-width payload through the tar path and
    the zip path yields identical (record_idx, record) streams."""
    import zipfile

    from pos_data_insertion_etl_spark.sources.zipsource import (
        read_zip_fixed_width,
    )

    payload = _mkrecords("S", 9)
    _write_tar(os.path.join(tar_dir, "s.tar"), {"s.txt": payload})
    zdir = tmp_path / "zips"
    zdir.mkdir()
    with zipfile.ZipFile(str(zdir / "s.zip"), "w") as zf:
        zf.writestr("s.txt", payload)
    tar_rows = {
        r.record_idx: r.record
        for r in read_tar_fixed_width(
            spark, tar_dir, chunk_chars=REC
        ).collect()
    }
    zip_rows = {
        r.record_idx: r.record
        for r in read_zip_fixed_width(
            spark, str(zdir), chunk_chars=REC
        ).collect()
    }
    assert tar_rows == zip_rows
