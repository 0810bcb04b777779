"""TAR archive source: the tar/tar.gz sibling of the zip ingest path
(sources/zipsource.py). The reference ingests zip-of-fixed-width only
(/root/reference/main.py:289-351); warehouse fleets also deliver
`.tar`, `.tar.gz`, `.tgz` bundles, and a tar member list -- unlike a
zip central directory -- reads SEQUENTIALLY, so this source streams
the archive front-to-back (`tarfile` mode ``r|*``): no seeks at all,
which also makes it the right shape for non-seekable remote streams.

Reuses the zip path's building blocks: `_record_stream` (incremental
UTF-8 decode + fixed-width split with sub-record carry) and
`_open_seekable` (local file / pyarrow.fs remote). Tasks receive only
PATHS across the JVM->Python boundary (mapInPandas); each task opens
its archive as a stream and never materializes it.

Unlike the zip source's first-member-only contract (the reference's
behavior), a tar bundle routinely carries MANY data files, so every
regular-file member is ingested (optionally filtered by
``member_glob``) and the member name rides in the output.
"""

from __future__ import annotations

import fnmatch
import logging
import os
import tarfile
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .zipsource import _open_seekable, _record_stream

logger = logging.getLogger(__name__)

TAR_RECORD_SCHEMA = (
    "source_file string, member string, record_idx long, record string"
)

#: Errors meaning the archive CONTENT is bad (skippable under
#: on_error='skip'); transient/environment errors still propagate so
#: task retry gets its chance (same policy as zipsource).
_CORRUPT_TAR_ERRORS = (
    tarfile.ReadError,
    EOFError,
    zlib.error,
    UnicodeDecodeError,
)


def _extract_tar_records(
    path: str,
    chunk_chars: int,
    batch_records: int,
    member_glob: str | None,
) -> Iterator[pd.DataFrame]:
    """Stream ONE tar(.gz/.bz2/.xz) archive into record batches:
    sequential member walk, incremental decode, bounded batches."""
    name = os.path.basename(path)
    with _open_seekable(path) as fobj:
        # r|* = pure streaming read with transparent compression:
        # members are visited in archive order, nothing is seeked,
        # nothing is materialized.
        with tarfile.open(fileobj=fobj, mode="r|*") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                if member_glob and not fnmatch.fnmatch(
                    member.name, member_glob
                ):
                    continue
                mf = tf.extractfile(member)
                if mf is None:
                    continue
                recs: list[str] = []
                idx0 = 0
                for rec in _record_stream(mf, chunk_chars):
                    recs.append(rec)
                    if len(recs) >= batch_records:
                        yield pd.DataFrame(
                            {
                                "source_file": name,
                                "member": member.name,
                                "record_idx": range(
                                    idx0, idx0 + len(recs)
                                ),
                                "record": recs,
                            }
                        )
                        idx0 += len(recs)
                        recs = []
                if recs:
                    yield pd.DataFrame(
                        {
                            "source_file": name,
                            "member": member.name,
                            "record_idx": range(idx0, idx0 + len(recs)),
                            "record": recs,
                        }
                    )


def records_from_tar_paths(
    paths_df: DataFrame,
    chunk_chars: int = 520,
    batch_records: int = 20_000,
    on_error: str = "fail",
    member_glob: str | None = None,
) -> DataFrame:
    """Untar + decode + split a DataFrame bearing a `path` column into
    [source_file, member, record_idx, record]. ``on_error`` follows the
    zip source's policy: 'fail' propagates (abort-and-notify), 'skip'
    drops archives whose CONTENT is corrupt and logs each skip;
    transient errors always propagate for task retry."""
    if on_error not in ("fail", "skip"):
        raise ValueError(
            f"on_error must be 'fail' or 'skip', got {on_error!r}"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                if on_error == "skip":
                    try:
                        yield from _extract_tar_records(
                            path, chunk_chars, batch_records, member_glob
                        )
                    except _CORRUPT_TAR_ERRORS as exc:
                        logger.warning(
                            "tar ingest: skipping corrupt archive %s: %s",
                            path,
                            exc,
                        )
                        continue
                else:
                    yield from _extract_tar_records(
                        path, chunk_chars, batch_records, member_glob
                    )

    return paths_df.select("path").mapInPandas(extract, TAR_RECORD_SCHEMA)


def read_tar_fixed_width(
    spark: SparkSession,
    path: str,
    chunk_chars: int = 520,
    batch_records: int = 20_000,
    on_error: str = "fail",
    member_glob: str | None = None,
) -> DataFrame:
    """DataFrame[source_file, member, record_idx, record] over a glob
    of tar archives; the binaryFile listing is pruned to `path` only
    (metadata cost, archives never loaded by the scan)."""
    paths = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.t*")
        .load(path)
        .select("path")
    )
    return records_from_tar_paths(
        paths,
        chunk_chars=chunk_chars,
        batch_records=batch_records,
        on_error=on_error,
        member_glob=member_glob,
    )
