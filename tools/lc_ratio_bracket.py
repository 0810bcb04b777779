#!/usr/bin/env python3
"""Bracket the local-cluster/local[32] RATIO for the two foreachBatch
bench entries (VERDICT r12 item 2).

Round 12 measured mart_pipeline_e2e at 1.34x and q274 at 1.31x under
local-cluster vs 1.16x/1.15x in round 11, AFTER an action shave that
measurably removed 2 jobs/batch (ACTIONCOUNT_r12.json: curation 11->9,
mart 23->21). The builder attributed the elevation to box state; this
tool settles it with a bracket instead of a narrative: >=3 INTERLEAVED
(local[32], local-cluster[4,8,8192]) pairs on a quiet box, each mode in
a fresh process (master is a launch-time setting), same entry bodies
the bench and localcluster_check time. The per-pair ratio controls for
slow-box regimes (both sides of a pair see the same box); the spread of
ratios across pairs IS the noise band.

Writes LCRATIO_r{N}.json. Run ONLY on an idle box (measurement-hygiene
rule; pytest or a concurrent Spark job inflates walls 10-15% and, worse,
asymmetrically).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import textwrap
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAIRS = int(os.environ.get("SPARK_GRAFT_LCRATIO_PAIRS", "3"))
LC_MASTER = os.environ.get("SPARK_GRAFT_LC_MASTER", "local-cluster[4,8,8192]")

_CHILD = """
import json, os, statistics, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tests"))
from pos_data_insertion_etl_spark.compat import ensure_protobuf
ensure_protobuf()
import bench as benchmod
from pos_data_insertion_etl_spark.plans import all_queries
from pos_data_insertion_etl_spark.session import get_session

master = {master!r}
extra = {{}}
if master.startswith("local-cluster"):
    extra = {{
        "spark.executor.memory": "4g",
        "spark.scheduler.minRegisteredResourcesRatio": "1.0",
        "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
    }}
spark = get_session("lc-ratio-bracket", master=master,
                    shuffle_partitions=32, extra_confs=extra)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
q274 = all_queries()["q274_streamed_curation_replay"].spark
out = {{}}
# same shapes localcluster_check times: warm-up + 3 reps, median
for name, fn in (
    ("mart_pipeline_e2e", lambda: benchmod.bench_mart_pipeline(spark)),
    ("q274_streamed_curation_replay",
     lambda: (lambda t0: (q274(spark, sf).collect(),
                          time.perf_counter() - t0)[1])(time.perf_counter())),
):
    fn()  # warm-up
    out[name] = round(statistics.median([fn() for _ in range(3)]), 3)
print("LCRATIO_JSON=" + json.dumps(out))
spark.stop()
"""


def _run_child(master: str) -> dict:
    code = _CHILD.format(repo=_REPO, master=master)
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=_REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("LCRATIO_JSON="):
            return json.loads(line[len("LCRATIO_JSON="):])
    raise RuntimeError(
        f"child ({master}) produced no result:\n"
        f"stdout: {proc.stdout[-1500:]}\nstderr: {proc.stderr[-1500:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(_REPO, "LCRATIO_r13.json")
    )
    args = ap.parse_args()
    pairs = []
    for i in range(PAIRS):
        local = _run_child(f"local[{os.cpu_count() or 32}]")
        lc = _run_child(LC_MASTER)
        rec = {"pair": i, "local32": local, "localcluster": lc}
        rec["ratios"] = {
            k: round(lc[k] / local[k], 3) for k in local if local[k]
        }
        pairs.append(rec)
        print(f"pair {i}: {rec['ratios']} "
              f"(local {local}, lc {lc})", flush=True)
    summary = {}
    for k in pairs[0]["ratios"]:
        rs = [p["ratios"][k] for p in pairs]
        summary[k] = {
            "ratios": rs,
            "median": round(statistics.median(rs), 3),
            "min": min(rs),
            "max": max(rs),
        }
    out = {
        "pairs": pairs,
        "summary": summary,
        "lc_master": LC_MASTER,
        "protocol": "interleaved fresh-process pairs, warm-up + 3-rep "
                    "medians per side, idle box",
    }
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
