"""Zip-of-fixed-width-text source.

Spark has no native zip codec, so this is the engine's one genuinely
custom source (SURVEY.md §4): a path-only file listing + an
Arrow-batched mapInPandas decompressor that OPENS each archive as a
seekable stream inside the task. Re-expresses the reference's
download -> unzip -> decode -> 520-char-split chain
(/root/reference/main.py:289-351, main.py:409-412):

* first zip member only, like the reference (main.py:323);
* incremental UTF-8 decode so multi-byte characters never split across
  read windows (the reference decodes whole 100 MB windows, main.py:334);
* records are CHARACTER-sliced post-decode (main.py:482 semantics);
* the leftover-carry across read windows (main.py:477-485) happens
  inside the generator -- callers see whole records only, plus one
  trailing partial record if the file doesn't divide evenly
  (reference inserts the partial tail too, main.py:561-565).

Memory contract: the task NEVER materializes the archive. The driver
plan ships only file paths (the `binaryFile` scan is pruned to its
`path` column -- no content read); each task opens its path as a
seekable stream (local `open`, else `pyarrow.fs` range reads for
s3/hdfs/gcs) and `zipfile` walks the central directory and inflates
the member incrementally. Peak memory is O(read_bytes + batch_records
* chunk_chars) regardless of archive size -- this restores the
reference's unbounded-daily-file contract (its 100 MB windows,
main.py:289-351) and lifts the former whole-archive buffering (a
`binaryFile` content row is one JVM byte array, hard-capped at 2 GiB).

Scale: zip is not splittable (DEFLATE + central directory), so the
DECOMPRESSION of one zip is one task; a daily-file workload parallelizes
across files/days. For one huge daily file, `read_zip_fixed_width_staged`
restores intra-file parallelism with a two-stage plan: stage 1 is the
unavoidable serial decompress, but it does nothing else -- records are
written straight to splittable parquet chunks (`maxRecordsPerFile`, no
shuffle); stage 2 and everything downstream (fixed-width parse, mart
aggregation -- all the CPU) is a normal parallel scan of those chunks.
A 100 GB zip costs one pass of cheap I/O serially, then fans out.

Each emitted Arrow batch is ``batch_records`` rows. Record provenance =
(source_file, record_idx), which also gives combine/batching a parallel,
pre-computed sequence number (no global row_number needed at scale).
"""

from __future__ import annotations

import codecs
import logging
import os
import zipfile
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import fs as _fs

logger = logging.getLogger(__name__)

RECORD_SCHEMA = "source_file string, record_idx long, record string"

# Hadoop connector scheme -> the scheme pyarrow.fs.FileSystem.from_uri
# understands. Spark's binaryFile listing returns s3a:// paths on S3
# deployments; without the translation from_uri raises ArrowInvalid on
# every archive, which an over-broad skip handler would silently eat as
# "corrupt" -- total data loss with a green job. (Lives in sources.fs
# since round 13; kept as an alias for existing importers.)
_SCHEME_ALIASES = _fs.SCHEME_ALIASES

#: Errors that mean THIS ARCHIVE is bad -- the only ones
#: ``on_error='skip'`` may eat:
#:   * zipfile.BadZipFile  -- not a zip / broken central directory;
#:   * zlib.error          -- valid central directory but a corrupt
#:                            DEFLATE member stream (raised mid-read);
#:   * EOFError            -- member truncated short of its declared
#:                            length (zipfile raises on the final read);
#:   * UnicodeDecodeError  -- member content is not the declared UTF-8.
#: Transient I/O (OSError) and filesystem/config errors (ArrowInvalid
#: etc.) propagate so Spark's task retry / the operator can handle them
#: loudly.
_CORRUPT_ARCHIVE_ERRORS = (
    zipfile.BadZipFile,
    zlib.error,
    EOFError,
    UnicodeDecodeError,
)


def _record_stream(
    fobj, chunk_chars: int, read_bytes: int = 8 << 20
) -> Iterator[str]:
    """Yield fixed-width character records from a binary file object,
    carrying the decode buffer and the sub-record leftover across read
    windows."""
    decoder = codecs.getincrementaldecoder("utf-8")()
    buf = ""
    while True:
        chunk = fobj.read(read_bytes)
        if not chunk:
            buf += decoder.decode(b"", final=True)
            break
        buf += decoder.decode(chunk)
        n_full = len(buf) // chunk_chars
        for k in range(n_full):
            yield buf[k * chunk_chars : (k + 1) * chunk_chars]
        buf = buf[n_full * chunk_chars :]
    if buf:
        yield buf  # trailing partial record (reference main.py:561-565)


def _open_seekable(path: str):
    """Open a Spark file URI (or plain path) as a seekable binary stream
    WITHOUT materializing the file: builtin `open` for local paths,
    `pyarrow.fs` (range-reading random-access file) for remote schemes
    (s3/hdfs/gcs...), or whatever sources.fs resolves for the scheme
    (GRAFT_FS_MAP doubles, registered adapters). `zipfile` then seeks
    the central directory and inflates members incrementally from the
    stream. Thin delegate kept for its import surface; the routing
    logic is the single seam in sources/fs.py (VERDICT r12 item 7)."""
    return _fs.open_seekable(path)


def _extract_records(
    path: str, chunk_chars: int, batch_records: int
) -> Iterator[pd.DataFrame]:
    """Decompress + decode + split ONE archive into record batches.
    Streams end-to-end: never holds the archive, the member, or more
    than one output batch in memory (see module docstring)."""
    name = os.path.basename(path)
    with _open_seekable(path) as fobj:
        with zipfile.ZipFile(fobj) as zf:
            members = zf.namelist()
            if not members:
                return
            with zf.open(members[0]) as member:  # first member only
                recs: list[str] = []
                idx0 = 0
                for rec in _record_stream(member, chunk_chars):
                    recs.append(rec)
                    if len(recs) >= batch_records:
                        yield pd.DataFrame(
                            {
                                "source_file": name,
                                "record_idx": range(idx0, idx0 + len(recs)),
                                "record": recs,
                            }
                        )
                        idx0 += len(recs)
                        recs = []
                if recs:
                    yield pd.DataFrame(
                        {
                            "source_file": name,
                            "record_idx": range(idx0, idx0 + len(recs)),
                            "record": recs,
                        }
                    )


def records_from_paths(
    paths_df: DataFrame,
    chunk_chars: int = 520,
    batch_records: int = 20_000,
    on_error: str = "fail",
) -> DataFrame:
    """Unzip + decode + split a DataFrame bearing a `path` column (a
    pruned binaryFile scan, batch or a foreachBatch micro-batch) into
    [source_file, record_idx, record]. Only paths cross the JVM->Python
    boundary; each task opens its archive as a stream.

    ``on_error``: "fail" (default) propagates a corrupt archive and
    fails the job -- the reference's abort-and-notify behavior. "skip"
    drops archives whose CONTENT is bad (`_CORRUPT_ARCHIVE_ERRORS`:
    bad zip, corrupt DEFLATE stream, truncated member, mojibake
    member) and ingests the rest: at fleet scale one bad
    file among thousands must not kill an hours-long run. Transient or
    environmental errors -- an `OSError` from a flaky read, an
    `ArrowInvalid` from a misconfigured filesystem -- still PROPAGATE so
    Spark's task retry gets its chance and misconfiguration fails
    loudly instead of silently dropping every file. Each skip is logged
    with its path; skipped archives are also observable as
    discovered-but-absent `source_file`s (anti-join the input listing
    against the output's distinct source_file) -- the same
    detect-then-requeue pattern as the parse quarantine
    (operators/fixedwidth.py)."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                if on_error == "skip":
                    try:
                        yield from _extract_records(
                            path, chunk_chars, batch_records
                        )
                    except _CORRUPT_ARCHIVE_ERRORS as exc:
                        # corrupt archive: skip it, keep the job
                        logger.warning(
                            "zip ingest: skipping corrupt archive %s: %s",
                            path,
                            exc,
                        )
                        continue
                else:
                    yield from _extract_records(path, chunk_chars, batch_records)

    return paths_df.select("path").mapInPandas(extract, RECORD_SCHEMA)


def read_zip_fixed_width(
    spark: SparkSession,
    path: str,
    chunk_chars: int = 520,
    batch_records: int = 20_000,
) -> DataFrame:
    """DataFrame[source_file, record_idx, record] over a glob of zips.

    The binaryFile scan is pruned to `path` (ReadSchema carries no
    `content`), so listing cost is metadata-only and archives of any
    size ingest without the 2 GiB byte-array cap."""
    binary = spark.read.format("binaryFile").load(path).select("path")
    return records_from_paths(binary, chunk_chars, batch_records)


def read_zip_fixed_width_staged(
    spark: SparkSession,
    path: str,
    stage_dir: str,
    chunk_chars: int = 520,
    batch_records: int = 20_000,
    records_per_file: int = 50_000,
) -> DataFrame:
    """Two-stage splittable ingest for arbitrarily large zips.

    Stage 1 (serial per zip, cheap): decompress + decode + split, write
    the records DataFrame to ``stage_dir`` as parquet with
    ``maxRecordsPerFile`` -- one extraction task fans its output into
    many small chunk files WITHOUT a shuffle. Stage 2 (parallel): return
    a plain scan of the staged chunks; every downstream stage (the
    fixed-width parse, the mart shuffles -- all the CPU-bound work) now
    runs one task per chunk instead of one task per zip.

    Same schema and contents as `read_zip_fixed_width` (and the same
    streamed-input memory contract, since stage 1 IS that path); the
    staged copy is the price of intra-file parallelism (the reference
    pays the analogous cost by re-reading its 100 MB windows,
    main.py:289-351).
    """
    records = read_zip_fixed_width(spark, path, chunk_chars, batch_records)
    (
        records.write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_file)
        .parquet(stage_dir)
    )
    return spark.read.parquet(stage_dir)
