"""Round-14 batch AB: the pyarrow filesystem adapter as a DATA PATH.

Round 13 landed the scheme-routed filesystem seam (sources/fs.py) and
unit-tested ArrowFileSystem's glob algebra against a fake pyarrow
filesystem -- but no registered query drove a scan through the REAL
pyarrow backend (VERDICT r13 item 3). q293 closes that: the q170 tar
fixture is listed AND opened through ``arrowfile://`` URIs, the
explicit alias that routes local paths through
``pyarrow.fs.FileSystem.from_uri`` -- byte-for-byte the code path an
``s3://`` URI takes (FileSelector listing with per-component glob
matching, random-access ``open_input_file`` range reads), minus only
the network. The callable raises unless the scheme actually resolves
to ArrowFileSystem and the open actually returns a pyarrow NativeFile,
so the driver's green oracle row certifies the routing, not just the
values (the q275 raise-on-Exchange pattern).

Scale shape: identical to q170 -- listing is one driver-side metadata
walk of the fixture directory, the archive streams member-by-member in
an executor task, and everything downstream is the q38 fixed-width
parse + aggregate. On a real deployment the same query text works with
``s3://bucket/...`` after credentials: that is the seam's contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..sources import fs as _seam
from .llm_ops9 import _TAR_ORACLE, _TAR_REC_CHARS, _tar_fixture_path
from .registry import query


def _arrow_tar_dir(spark, sf_dir: str) -> str:
    """A private one-archive directory for the arrowfile listing walk
    (FileSelector is recursive under the wildcard-free prefix, so the
    fixture gets its own directory rather than all of /tmp). Atomic
    copy; concurrent callers converge on the same file."""
    import hashlib

    src = _tar_fixture_path(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"graft_tarfix_arrow_{tag}")
    os.makedirs(d, exist_ok=True)
    dst = os.path.join(d, os.path.basename(src))
    if not os.path.exists(dst):
        tmp = f"{dst}.tmp.{os.getpid()}"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
    return d


@query(
    "q293_tar_arrow_fs",
    oracle=_TAR_ORACLE,
    tags=("source", "tar", "fs", "arrow"),
)
def q293_tar_arrow_fs(spark, sf_dir):
    """q170's TAR fixed-width parse with listing and opens routed
    through the REAL pyarrow filesystem backend: the ``arrowfile://``
    scheme resolves to sources/fs.ArrowFileSystem (sources/fs.py
    SCHEME_ALIASES), whose glob walks a recursive FileSelector with
    per-component matching (the pattern carries both ``*`` and ``?``
    deliberately -- the two wildcards ADVICE r13 found mishandled) and
    whose open range-reads via ``open_input_file``. Raises unless the
    routing provably happened; the record values, member attribution,
    and per-member order are under the oracle hash exactly as in
    q170."""
    from ..sources.tarsource import records_from_tar_paths

    d = _arrow_tar_dir(spark, sf_dir)
    pattern = f"arrowfile://{d}/graft_tarfix_*.t?r"
    impl = _seam.filesystem_for(pattern)
    if not isinstance(impl, _seam.ArrowFileSystem):
        raise RuntimeError(
            f"arrowfile:// resolved to {type(impl).__name__}, not "
            "ArrowFileSystem -- the routing this query certifies is gone"
        )
    uris = _seam.expand_glob(pattern)
    if len(uris) != 1 or not uris[0].startswith("arrowfile://"):
        raise RuntimeError(
            f"arrowfile listing returned {uris!r}; expected exactly the "
            "one scheme-prefixed fixture URI"
        )
    # The open must be pyarrow's NativeFile (range-reading), not a
    # builtin file: certify driver-side once; executors repeat the
    # same scheme-routed open inside records_from_tar_paths.
    probe = _seam.open_seekable(uris[0])
    try:
        if not type(probe).__module__.startswith("pyarrow"):
            raise RuntimeError(
                f"arrowfile open returned {type(probe)!r}, not a "
                "pyarrow NativeFile"
            )
    finally:
        probe.close()
    paths = spark.createDataFrame([(u,) for u in uris], "path string")
    recs = records_from_tar_paths(
        paths, chunk_chars=_TAR_REC_CHARS, batch_records=5_000
    )
    parsed = recs.select(
        "member",
        "record_idx",
        F.substring("record", 1, 12).cast("long").alias("orderkey"),
        F.substring("record", 17, 1).alias("returnflag"),
        F.substring("record", 18, 1).alias("linestatus"),
        F.to_date(F.substring("record", 19, 8), "yyyyMMdd").alias(
            "shipdate"
        ),
    )
    return parsed.groupBy("member", "returnflag", "linestatus").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("orderkey").alias("sum_orderkey"),
        F.sum("record_idx").alias("sum_idx"),
        F.min("shipdate").alias("first_ship"),
        F.max("shipdate").alias("last_ship"),
    )
