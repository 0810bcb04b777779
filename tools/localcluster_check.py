#!/usr/bin/env python3
"""Distribution proof: the certification window + heaviest bench
entries under ``local-cluster[4,8,8192]`` (VERDICT r10 item 1).

Every result to date ran on local[N] -- ONE JVM, where broadcast is a
pointer hand-off, "shuffles" never cross a process boundary, Python
workers all fork from the driver's environment, and a driver-local
temp file is visible to every "executor". local-cluster mode spawns 4
REAL Worker JVMs (separate processes, real serialization, real
broadcast transport, executor-side Python workers that must import the
engine from the shipped zip, executor-local temp/work dirs), which is
the closest a single box gets to a real cluster. What it certifies:

* the engine package reaches executor Python workers via the
  ``addPyFile`` zip (session.ensure_package_shipped) -- no reliance on
  the driver's cwd/sys.path;
* the pbshim PYTHONPATH export survives into executor workers (they
  inherit the env captured at WORKER launch, not the driver's);
* every mapInPandas / Pandas-UDF closure, values_frame literal, and
  task-side temp-dir assumption survives real process isolation.

Phases (both written to LOCALCLUSTER_r{N}.json at the repo root):

1. window -- the EXACT first-50 certification window of
   ``__spark_entry__.queries()`` (what the driver will certify this
   round), hash-compared against the DuckDB oracles at sf0.01 with the
   same canonicalization the local harness uses.
2. bench -- the top-K heaviest entries of the newest committed
   BENCH_DETAIL_r*.json, re-timed at sf0.1 (1 warm-up + 3 reps,
   median) with the r10 local[32] medians recorded alongside. Expect
   local-cluster to be SLOWER on tiny data (real IPC + 4-way broadcast
   instead of one shared heap); the claim is completion + same
   answers, with the ratio recorded honestly.

Usage: python tools/localcluster_check.py [--phase window|bench|all]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from pos_data_insertion_etl_spark.compat import ensure_protobuf  # noqa: E402

# Must precede the session: worker subprocesses inherit the env
# captured at JVM launch, and executor-side stateful v2 needs the shim.
ensure_protobuf()

from pos_data_insertion_etl_spark.plans import all_queries  # noqa: E402
from pos_data_insertion_etl_spark.session import (  # noqa: E402
    get_session,
    write_log4j_file_config,
)

MASTER = os.environ.get("SPARK_GRAFT_LC_MASTER", "local-cluster[4,8,8192]")
SF_WINDOW = os.environ.get("SPARK_GRAFT_LC_SF", "/root/testdata/sf0.01")
SF_BENCH = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TOP_K = int(os.environ.get("SPARK_GRAFT_LC_TOPK", "10"))
#: executor heap; shrink together with the master's memoryPerWorker for
#: the r12 memory-pressure proof (e.g. local-cluster[4,4,2048] + 2g).
EXEC_MEM = os.environ.get("SPARK_GRAFT_LC_EXECMEM", "6g")


def _session():
    import tempfile

    log = os.path.join(tempfile.gettempdir(), "localcluster_jvm.log")
    spark = get_session(
        "pos-etl-localcluster",
        master=MASTER,
        shuffle_partitions=32,
        log4j_config=write_log4j_file_config(log),
        extra_confs={
            "spark.executor.memory": EXEC_MEM,
            # 4 workers x 8 cores: the executors must all register
            # before scheduling or early stages run on 1 executor.
            "spark.scheduler.minRegisteredResourcesRatio": "1.0",
            "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _window_names() -> list[str]:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_entry_lc", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries())[:50]


#: Named distribution hazards from VERDICT r10 item 1 that sit OUTSIDE
#: this round's certification window (they went green in r10, so the
#: staleness rotation parks them at the tail): the streamed replay
#: queries with task/driver-side temp dirs (q274, q289), the
#: plan-asserting ones (q275 zero-Exchange bucketed join, q290 AQE skew
#: split -- plan shape can differ across schedulers), the salted-join
#: strategy demo (q277), and the heaviest iterative op (q189).
RISK_NAMES = [
    "q274_streamed_curation_replay",
    "q289_watermark_late_data",
    "q290_aqe_skew_split",
    "q275_bucketed_mart_join",
    "q277_salted_skew_join",
    "q189_setsim_prefix_join",
]


def run_window(spark, out: dict) -> None:
    from oracle_harness import compare, duck_connection

    registry = all_queries()
    con = duck_connection(SF_WINDOW)
    results: dict[str, dict] = {}
    window = _window_names()
    for name in window + [n for n in RISK_NAMES if n not in window]:
        spec = registry[name]
        t0 = time.perf_counter()
        try:
            df = spec.spark(spark, SF_WINDOW)
            if spec.oracle is None:
                n = df.count()
                results[name] = {"ok": True, "rows_only": n}
            else:
                ok, msg = compare(df, con, spec.oracle)
                results[name] = {"ok": bool(ok)}
                if not ok:
                    results[name]["err"] = str(msg)[:500]
        except Exception as exc:  # noqa: BLE001 -- survey, don't abort
            results[name] = {"ok": False, "err": repr(exc)[:500]}
        results[name]["sec"] = round(time.perf_counter() - t0, 3)
        status = "GREEN" if results[name]["ok"] else "RED"
        print(f"  {name}: {status} ({results[name]['sec']}s)", flush=True)
    out["window"] = {
        "sf_dir": SF_WINDOW,
        "green": sum(1 for r in results.values() if r["ok"]),
        "total": len(results),
        "results": results,
    }


def run_full(spark, out: dict) -> None:
    """FULL-registry distribution certification (round 12): every
    registered query, not just the 50-name window + named hazards,
    oracle-compared at the driver's gate SF under real multi-process
    isolation. The r10/r11 proofs sampled 56 names; this removes the
    sampling caveat -- any operator whose closure, literal plan, or
    temp-dir assumption silently depends on single-JVM local[N]
    semantics fails here instead of on a real cluster."""
    from oracle_harness import compare, duck_connection

    registry = all_queries()
    con = duck_connection(SF_WINDOW)
    results: dict[str, dict] = {}
    for name in sorted(registry):
        spec = registry[name]
        t0 = time.perf_counter()
        try:
            df = spec.spark(spark, SF_WINDOW)
            if spec.oracle is None:
                n = df.count()
                results[name] = {"ok": True, "rows_only": n}
            else:
                ok, msg = compare(df, con, spec.oracle)
                results[name] = {"ok": bool(ok)}
                if not ok:
                    results[name]["err"] = str(msg)[:500]
        except Exception as exc:  # noqa: BLE001 -- survey, don't abort
            results[name] = {"ok": False, "err": repr(exc)[:500]}
        results[name]["sec"] = round(time.perf_counter() - t0, 3)
        status = "GREEN" if results[name]["ok"] else "RED"
        print(f"  {name}: {status} ({results[name]['sec']}s)", flush=True)
    out["full"] = {
        "sf_dir": SF_WINDOW,
        "green": sum(1 for r in results.values() if r["ok"]),
        "total": len(results),
        "results": results,
    }


def _latest_bench_detail() -> tuple[str, dict]:
    best = None
    for f in os.listdir(_REPO):
        m = re.match(r"BENCH_DETAIL_r(\d+)\.json$", f)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), f)
    assert best, "no committed BENCH_DETAIL_r*.json"
    with open(os.path.join(_REPO, best[1])) as fh:
        return best[1], json.load(fh)


def run_bench(spark, out: dict) -> None:
    import bench as benchmod

    detail_name, detail = _latest_bench_detail()
    heaviest = sorted(
        detail["queries"].items(), key=lambda kv: -kv[1]
    )[:TOP_K]
    registry = all_queries()
    timings: dict[str, dict] = {}
    for name, r10_sec in heaviest:
        if name in registry:
            fn = lambda: registry[name].spark(spark, SF_BENCH).collect()  # noqa: E731
            fn()  # warm-up
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                runs.append(time.perf_counter() - t0)
        else:  # e2e entries time their own pipeline body
            e2e = {
                "mart_pipeline_e2e": lambda: benchmod.bench_mart_pipeline(spark),
                "staged_ingest_e2e": lambda: benchmod.bench_staged_ingest(spark),
                "curation_e2e": lambda: benchmod.bench_curation(spark, SF_BENCH),
            }[name]
            e2e()  # warm-up
            runs = [e2e() for _ in range(3)]
        med = round(statistics.median(runs), 3)
        timings[name] = {
            "localcluster_sec": med,
            "local32_r_sec": r10_sec,
            "ratio": round(med / r10_sec, 2) if r10_sec else None,
        }
        print(f"  {name}: {med}s (local[32] was {r10_sec}s)", flush=True)
    out["bench"] = {
        "sf_dir": SF_BENCH,
        "baseline_detail": detail_name,
        "top_k": TOP_K,
        "queries": timings,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--phase", default="all", choices=["window", "bench", "all", "full"]
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out: dict = {"master": MASTER}
    spark = _session()
    n_exec = spark.sparkContext.parallelize(range(256), 256).map(
        lambda _: __import__("os").getpid()
    ).distinct().count()
    out["executor_python_pids"] = n_exec
    print(f"master={MASTER}, distinct executor python pids={n_exec}", flush=True)
    t0 = time.perf_counter()
    if args.phase in ("window", "all"):
        print("== window (sf0.01 oracle compare) ==", flush=True)
        run_window(spark, out)
    if args.phase in ("bench", "all"):
        print(f"== bench (top {TOP_K} at sf0.1) ==", flush=True)
        run_bench(spark, out)
    if args.phase == "full":
        print("== full registry (sf0.01 oracle compare) ==", flush=True)
        run_full(spark, out)
    out["wall_sec"] = round(time.perf_counter() - t0, 1)
    spark.stop()

    path = args.out or os.path.join(_REPO, "LOCALCLUSTER_r12.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}", flush=True)
    for phase in ("window", "full"):
        if phase in out:
            w = out[phase]
            print(f"{phase}: {w['green']}/{w['total']} green", flush=True)


if __name__ == "__main__":
    main()
