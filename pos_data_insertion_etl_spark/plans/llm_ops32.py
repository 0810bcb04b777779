"""Round-15 batch AC: the object-store DOUBLE as a data path.

q293 (llm_ops31) certified the seam's REAL pyarrow backend end-to-end;
this module closes the backend triangle at the registry level (VERDICT
r14 item 7): the same tar listing + open driven through
``MappedFileSystem`` -- the ``GRAFT_FS_MAP`` object-store test double
(``scheme://bucket/key`` -> ``root/bucket/key``) that stands in for
s3/abfs wherever real credentials are untestable. All three seam
backends (local / arrow / mapped) are now each exercised by a
registered, oracle-checked query, so a semantics drift between a
double and the backend it doubles for fails a driver round, not a
deployment (exactly the divergence ADVICE r14 found in the
wildcard-free probe rule, fixed this round in sources/fs.py).

Worker propagation: ``GRAFT_FS_MAP`` is env-resolved lazily at every
call (sources/fs.py:_env_map) precisely so executors need no driver
handshake -- but an env var set in the DRIVER python process after
the JVM launched is invisible to worker processes. The worker-safe
channel at runtime is ``SparkContext.environment``: its entries ship
with every Python function and are applied to the worker pool (pools
are keyed by their env, so a change creates a fresh pool rather than
reusing a stale one). The callable sets both -- ``os.environ`` for
driver-side planning, ``sc.environment`` for executor-side opens --
merging with any pre-existing map rather than clobbering it. On a
real cluster the same knob is ``spark.executorEnv.GRAFT_FS_MAP``.

Scale shape: identical to q170/q293 -- one driver-side listing, the
archive streamed member-by-member in an executor task, fixed-width
parse + aggregate downstream.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..sources import fs as _seam
from .llm_ops9 import _TAR_ORACLE, _TAR_REC_CHARS, _tar_fixture_path
from .registry import query

#: Private scheme for this query's double; root is the TEMPDIR itself
#: (constant across sf dirs), the "bucket" is a per-sf fixture
#: directory -- so the env mapping is set-once/idempotent and two sf
#: dirs in one session never race on the map value.
_SCHEME = "s3graft"


def _mapped_tar_bucket(spark, sf_dir: str) -> str:
    """Copy the tar fixture into ``<tempdir>/<bucket>/`` and return the
    bucket name. Atomic copy; concurrent callers converge."""
    import hashlib

    src = _tar_fixture_path(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    bucket = f"graft_tarfix_mapped_{tag}"
    d = os.path.join(tempfile.gettempdir(), bucket)
    os.makedirs(d, exist_ok=True)
    dst = os.path.join(d, os.path.basename(src))
    if not os.path.exists(dst):
        tmp = f"{dst}.tmp.{os.getpid()}"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
    return bucket


def _install_fs_map(spark) -> str:
    """Merge ``s3graft=<tempdir>`` into GRAFT_FS_MAP on BOTH channels:
    ``os.environ`` (driver-side expand_glob) and
    ``SparkContext.environment`` (shipped to executor Python workers
    with each job -- the runtime equivalent of
    ``spark.executorEnv.GRAFT_FS_MAP``). Pre-existing entries for
    other schemes are preserved."""
    root = tempfile.gettempdir()
    raw = os.environ.get("GRAFT_FS_MAP", "")
    entries = [
        e.strip()
        for e in raw.split(",")
        if e.strip() and not e.strip().lower().startswith(f"{_SCHEME}=")
    ]
    entries.append(f"{_SCHEME}={root}")
    merged = ",".join(entries)
    os.environ["GRAFT_FS_MAP"] = merged
    spark.sparkContext.environment["GRAFT_FS_MAP"] = merged
    return root


@query(
    "q294_tar_mapped_fs",
    oracle=_TAR_ORACLE,
    tags=("source", "tar", "fs", "mapped"),
)
def q294_tar_mapped_fs(spark, sf_dir):
    """q170's TAR fixed-width parse with listing and opens routed
    through ``MappedFileSystem`` -- the GRAFT_FS_MAP object-store
    double (sources/fs.py:177). The pattern carries both ``*`` and
    ``?`` wildcards (the q293 discipline) so the double's glob algebra
    is under the oracle hash, and the callable raises unless the
    routing provably happened: the scheme must resolve to
    MappedFileSystem rooted at the installed tempdir, the listing must
    return exactly one scheme-prefixed URI, and the driver-side open
    must read the tar magic through the bucket mapping (a literal
    ``s3graft://...`` local path cannot exist, so a successful read IS
    the mapping). Executor-side opens repeat the same resolution from
    the worker env shipped via SparkContext.environment; record
    values, member attribution, and per-member order match q170's
    oracle exactly."""
    from ..sources.tarsource import records_from_tar_paths

    root = _install_fs_map(spark)
    bucket = _mapped_tar_bucket(spark, sf_dir)
    pattern = f"{_SCHEME}://{bucket}/graft_tarfix_*.t?r"
    impl = _seam.filesystem_for(pattern)
    if not isinstance(impl, _seam.MappedFileSystem) or impl.root != root:
        raise RuntimeError(
            f"{_SCHEME}:// resolved to {type(impl).__name__} "
            f"(root={getattr(impl, 'root', None)!r}), not the "
            f"MappedFileSystem rooted at {root!r} -- the routing this "
            "query certifies is gone"
        )
    uris = _seam.expand_glob(pattern)
    if len(uris) != 1 or not uris[0].startswith(f"{_SCHEME}://{bucket}/"):
        raise RuntimeError(
            f"mapped listing returned {uris!r}; expected exactly the "
            "one scheme-prefixed fixture URI"
        )
    # Driver-side routing witness: read the tar magic through the
    # bucket mapping (ustar at offset 257).
    probe = _seam.open_seekable(uris[0])
    try:
        probe.seek(257)
        magic = probe.read(5)
        if magic != b"ustar":
            raise RuntimeError(
                f"mapped open read {magic!r} at the tar magic offset; "
                "the bucket->local mapping did not land on the fixture"
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
