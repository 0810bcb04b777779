"""The zip-of-fixed-width source as a REGISTERED Spark 4 Python Data
Source: ``spark.read.format("zip_fixed_width").load(glob)``.

Same extraction kernel as sources/zipsource.py (streamed open, no
whole-archive buffering -- see that module's memory contract); this
wrapper adds the idiomatic Spark 4 packaging on top of it:

* one `InputPartition` PER ARCHIVE -- the natural parallel unit, since
  DEFLATE + a central directory make one zip non-splittable. Spark
  schedules archives across executors; `read` yields Arrow
  RecordBatches (the mapInPandas path ships pandas frames; batch shape
  is identical).
* file listing happens at planning time on the driver (glob expansion
  only -- no archive is opened), so `partitions()` is metadata-cheap
  like a binaryFile listing.
* options: `chunk_chars` (record width, default 520 like the
  reference's records, /root/reference/main.py:409-412),
  `batch_records` (rows per Arrow batch).

Use this form when the consumer wants a format string (SQL
`CREATE TABLE ... USING`, config-driven readers); `records_from_paths`
remains the composition-friendly form (streaming foreachBatch feeds it
micro-batch file lists, which a batch DataSource cannot express).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from . import fs
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

RECORD_SCHEMA_DDL = "source_file string, record_idx long, record string"


def _expand_glob(pattern: str) -> list[str]:
    """Planning-time file listing, scheme-routed through the single
    filesystem seam (sources/fs.py, round 13): plain/``file://``
    patterns glob locally, ``GRAFT_FS_MAP`` schemes hit their mapped
    test double, anything else lists via ``pyarrow.fs`` (s3/hdfs/
    gcs...). Results preserve the pattern's scheme, so each
    ``_ZipPartition`` carries a URI the executor-side open routes
    through the same seam. A scheme nothing can resolve raises at plan
    time (pyarrow's from_uri) -- never a silent empty DataFrame."""
    return fs.expand_glob(pattern)


class _ZipPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ZipFixedWidthReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("zip_fixed_width requires a path")
        self.paths = _expand_glob(path)
        self.chunk_chars = int(options.get("chunk_chars", 520))
        self.batch_records = int(options.get("batch_records", 20_000))

    def partitions(self) -> Sequence[InputPartition]:
        # one task per archive: the decompression unit of parallelism
        return [_ZipPartition(p) for p in self.paths]

    def read(self, partition: _ZipPartition) -> Iterator:
        import pyarrow as pa

        # late import: runs on executors, after addPyFile shipping
        from pos_data_insertion_etl_spark.sources.zipsource import (
            _extract_records,
        )

        for pdf in _extract_records(
            partition.path, self.chunk_chars, self.batch_records
        ):
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)


class ZipFixedWidthStreamReader(DataSourceStreamReader):
    """Streaming flavor: each micro-batch processes the archives that
    appeared since the last committed offset -- the reference's
    daily-file arrival loop as a first-class stream.

    The offset is the sorted list of discovered archive paths (the same
    bookkeeping Spark's own file source keeps in its file log; it grows
    with the archive count, which for daily files is ~365 entries/year
    -- fine). `partitions` hands each NEW archive to one executor task;
    `read` reuses the streamed extraction kernel. The checkpoint's
    offset log makes redelivery exactly-once at the file level, which is
    strictly stronger than the reference's byte-offset resume (a crash
    redoes at most one archive, never corrupts mid-record)."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("zip_fixed_width requires a path")
        self.glob_pattern = path
        _expand_glob(path)  # validate the scheme at plan time
        self.chunk_chars = int(options.get("chunk_chars", 520))
        self.batch_records = int(options.get("batch_records", 20_000))

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": _expand_glob(self.glob_pattern)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        new = sorted(set(end["seen"]) - set(start["seen"]))
        return [_ZipPartition(p) for p in new]

    def read(self, partition: _ZipPartition) -> Iterator:
        import pyarrow as pa

        from pos_data_insertion_etl_spark.sources.zipsource import (
            _extract_records,
        )

        for pdf in _extract_records(
            partition.path, self.chunk_chars, self.batch_records
        ):
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)

    def commit(self, end: dict) -> None:
        pass  # offset log in the checkpoint is the source of truth


class ZipFixedWidthDataSource(DataSource):
    """``spark.read.format(ZipFixedWidthDataSource.name()).load(...)``
    (batch) and ``spark.readStream.format(...)`` (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "zip_fixed_width"

    def schema(self) -> str:
        return RECORD_SCHEMA_DDL

    def reader(self, schema) -> ZipFixedWidthReader:
        return ZipFixedWidthReader(self.options)

    def streamReader(self, schema) -> ZipFixedWidthStreamReader:
        return ZipFixedWidthStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the format on a session."""
    spark.dataSource.register(ZipFixedWidthDataSource)
