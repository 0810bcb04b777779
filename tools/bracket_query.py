#!/usr/bin/env python3
"""Bench-excursion bracketing probe (the q182 protocol, VERDICT r10
item 3 / r11 item 2): for one HEADLINE entry, measure

* ISOLATED-session medians x3 -- a fresh bench-pinned process each
  (local[$SPARK_GRAFT_CPUS], shuffle=cpus, same warm-up as bench.py),
  warm-up + 5 reps per session;
* IN-CONTEXT median -- one session that first replays the HEADLINE
  prefix ahead of the target (1 rep each), then times the target.

If the flagged driver value sits inside the union of observed
single-rep ranges, the excursion is host noise; record the expectation
band in PLANS.md. A value outside every observed range is a real
regression to chase.

Usage: python tools/bracket_query.py q39_combine_chunks \
           [--out BRACKET_q39_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_CHILD = r"""
import json, os, statistics, sys, time
sys.path.insert(0, @REPO@)
from pos_data_insertion_etl_spark.compat import ensure_protobuf
ensure_protobuf()
from pyspark.sql import functions as F
from pos_data_insertion_etl_spark.session import get_session
from pos_data_insertion_etl_spark.plans import all_queries
from pos_data_insertion_etl_spark.catalog import TABLES, load_table

name = @NAME@
sf_dir = @SFDIR@
mode = @MODE@
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
spark = get_session("bracket-probe", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
# bench.py's exact warm-up
spark.range(1_000_000).selectExpr("sum(id)").collect()
for t in TABLES:
    load_table(spark, sf_dir, t).select(F.lit(1)).limit(1).collect()
registry = all_queries()

import bench

# The three e2e entries are bench-level callables, not registry
# queries (round 15: VERDICT r14 item 2 asks for bands on every >4 s
# entry, and curation_e2e / mart_pipeline_e2e are two of them). Their
# internal timer already excludes fixture setup, so the probe uses
# the returned float instead of wrapping collect().
_E2E = {
    "mart_pipeline_e2e": lambda: bench.bench_mart_pipeline(spark),
    "staged_ingest_e2e": lambda: bench.bench_staged_ingest(spark),
    "curation_e2e": lambda: bench.bench_curation(spark, sf_dir),
}

if mode == "context":
    if name in _E2E:
        # e2e entries run after the whole HEADLINE list (bench.py
        # order), then after any e2e entries ahead of them.
        prefix = list(bench.HEADLINE)
        e2e_order = ["mart_pipeline_e2e", "staged_ingest_e2e",
                     "curation_e2e"]
        prefix_e2e = e2e_order[: e2e_order.index(name)]
    else:
        prefix = bench.HEADLINE[: bench.HEADLINE.index(name)]
        prefix_e2e = []
    for p in prefix:
        registry[p].spark(spark, sf_dir).collect()
        bench._clear_block_pool(spark)
    for p in prefix_e2e:
        _E2E[p]()
        bench._clear_block_pool(spark)
    # bench.py clears the storage pool between entries (round 12); the
    # replay must too, or it measures a context the driver bench no
    # longer has.
    bench._clear_block_pool(spark)

if name in _E2E:
    fn = _E2E[name]
    fn()  # warm-up, as bench's e2e loop does
    reps = [round(fn(), 3) for _ in range(5)]
else:
    spec = registry[name]
    spec.spark(spark, sf_dir).collect()  # per-entry warm-up, as bench does
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).collect()
        reps.append(round(time.perf_counter() - t0, 3))
print("BRACKETJSON:" + json.dumps(
    {"median": round(statistics.median(reps), 3), "reps": reps}))
"""


def _run_child(name: str, sf_dir: str, mode: str) -> dict:
    code = (
        _CHILD.replace("@REPO@", repr(_REPO))
        .replace("@NAME@", repr(name))
        .replace("@SFDIR@", repr(sf_dir))
        .replace("@MODE@", repr(mode))
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=_REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("BRACKETJSON:"):
            return json.loads(line[len("BRACKETJSON:"):])
    raise RuntimeError(
        f"probe child produced no result; stderr tail: {proc.stderr[-1500:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    out = {"name": args.name, "sf_dir": args.sf, "isolated": [], "context": None}
    for i in range(3):
        rec = _run_child(args.name, args.sf, "isolated")
        print(f"isolated #{i + 1}: {rec}", flush=True)
        out["isolated"].append(rec)
    rec = _run_child(args.name, args.sf, "context")
    print(f"in-context: {rec}", flush=True)
    out["context"] = rec
    all_reps = [r for rec in out["isolated"] for r in rec["reps"]]
    all_reps += out["context"]["reps"]
    out["single_rep_range"] = [min(all_reps), max(all_reps)]
    import re

    rounds = [
        int(m.group(1))
        for f in os.listdir(_REPO)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    ]
    nxt = (max(rounds) + 1) if rounds else 1
    path = args.out or os.path.join(
        _REPO, f"BRACKET_{args.name.split('_')[0]}_r{nxt:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in ("single_rep_range",)}))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
