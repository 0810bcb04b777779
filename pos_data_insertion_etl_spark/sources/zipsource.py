"""Zip-of-fixed-width-text source.

Spark has no native zip codec, so this is the engine's one genuinely
custom source (SURVEY.md §4): `binaryFile` scan + an Arrow-batched
mapInPandas decompressor. Re-expresses the reference's
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

Scale: one zip file = one task (zip is not splittable); a daily-file
workload parallelizes across files/days. Memory is bounded by
``read_bytes`` regardless of member size. Each emitted Arrow batch is
``batch_records`` rows. Record provenance = (source_file, record_idx),
which also gives combine/batching a parallel, pre-computed sequence
number (no global row_number needed at scale).
"""

from __future__ import annotations

import codecs
import io
import os
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

RECORD_SCHEMA = "source_file string, record_idx long, record string"


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


def records_from_binary(
    binary_df: DataFrame,
    chunk_chars: int = 520,
    batch_records: int = 20_000,
) -> DataFrame:
    """Unzip + decode + split a binaryFile DataFrame (batch or a
    foreachBatch micro-batch) into [source_file, record_idx, record]."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                name = os.path.basename(row["path"])
                with zipfile.ZipFile(io.BytesIO(row["content"])) as zf:
                    members = zf.namelist()
                    if not members:
                        continue
                    with zf.open(members[0]) as member:  # first member only
                        recs: list[str] = []
                        idx0 = 0
                        for rec in _record_stream(member, chunk_chars):
                            recs.append(rec)
                            if len(recs) >= batch_records:
                                yield pd.DataFrame(
                                    {
                                        "source_file": name,
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
                                    "record_idx": range(idx0, idx0 + len(recs)),
                                    "record": recs,
                                }
                            )

    return binary_df.select("path", "content").mapInPandas(extract, RECORD_SCHEMA)


def read_zip_fixed_width(
    spark: SparkSession,
    path: str,
    chunk_chars: int = 520,
    batch_records: int = 20_000,
) -> DataFrame:
    """DataFrame[source_file, record_idx, record] over a glob of zips."""
    binary = spark.read.format("binaryFile").load(path)
    return records_from_binary(binary, chunk_chars, batch_records)
