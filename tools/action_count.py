#!/usr/bin/env python3
"""Per-micro-batch Spark ACTION (job) counts for the foreachBatch
paths (VERDICT r11 item 7): the only local-cluster ratios >1.1x in
round 11 were the per-batch multi-action paths (mart_pipeline 1.16x,
q274 1.15x) -- an IPC tax proportional to jobs-per-batch, so the fix
is fewer jobs, not faster jobs.

Counts jobs via the driver's AppStatusStore before/after each batch:

* curation_ingest_batch (the q274 path): fresh batch, novel batch,
  REPLAYED batch (the fast path), empty-gate batch;
* pos_stream_ingest's process_batch (the mart_pipeline path): first
  file, idempotent re-delivery.

Usage: python tools/action_count.py [--out ACTIONCOUNT_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from pos_data_insertion_etl_spark.compat import ensure_protobuf  # noqa: E402

ensure_protobuf()

from pyspark.sql import functions as F  # noqa: E402

from pos_data_insertion_etl_spark.catalog import load_table  # noqa: E402
from pos_data_insertion_etl_spark.session import get_session  # noqa: E402


def _n_jobs(spark) -> int:
    return spark._jsparkSession.sparkContext().statusStore().jobsList(None).size()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO, "ACTIONCOUNT_r12.json"))
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    args = ap.parse_args()

    spark = get_session("pos-etl-action-count", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    from pos_data_insertion_etl_spark.streaming.jobs import (
        curation_ingest_batch,
    )

    work = tempfile.mkdtemp(prefix="graft_actioncount_")
    try:
        # ---------------- curation ingest (q274 path) ----------------
        cur_dir = os.path.join(work, "curation")
        docs = load_table(spark, args.sf, "documents")
        n = docs.count()
        s1 = n // 3
        b0 = docs.filter(F.col("doc_id") < s1)
        b1 = docs.filter(F.col("doc_id") >= s1)
        gate = dict(min_words=10, stopwords=("the", "a"), min_stopword_hits=1)
        rec: dict = {}
        for label, bid, frame in [
            ("batch0_fresh", 0, b0),
            ("batch1_novel", 1, b1),
            ("batch1_replay", 1, b1),
            ("batch2_empty_gate", 2, docs.filter(F.lit(False))),
        ]:
            before = _n_jobs(spark)
            curation_ingest_batch(frame, bid, cur_dir, **gate)
            rec[label] = _n_jobs(spark) - before
        out["curation_ingest_batch"] = rec

        # ---------------- mart ingest (mart_pipeline path) ----------------
        from pos_fixture import build_fixture, write_zip

        from pos_data_insertion_etl_spark.streaming.jobs import (
            pos_stream_ingest,
        )

        land = os.path.join(work, "landing")
        os.makedirs(land)
        marts = os.path.join(work, "marts")
        ckpt = os.path.join(work, "ckpt")
        records, _rows = build_fixture(n_days=2)
        write_zip(records, os.path.join(land, "R520.20240301_214500.zip"))
        rec = {}
        before = _n_jobs(spark)
        q = pos_stream_ingest(spark, land, marts, ckpt)
        q.awaitTermination(180)
        rec["first_file"] = _n_jobs(spark) - before
        # idempotent re-delivery: same records, new file
        write_zip(records, os.path.join(land, "R520.20240302_214500.zip"))
        before = _n_jobs(spark)
        q = pos_stream_ingest(spark, land, marts, ckpt)
        q.awaitTermination(180)
        rec["redelivered_file"] = _n_jobs(spark) - before
        out["pos_stream_ingest"] = rec
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(out, indent=1, sort_keys=True))
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
