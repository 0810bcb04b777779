#!/usr/bin/env python3
"""Executor-loss durability proof for the STREAMED ingest paths
(round 12; extends EXECUTORKILL_r11 from the iterative-graph family to
the foreachBatch family). Two scenarios: the curation ingest (digest
swap + funnel accounting) and the POS mart ingest (checkpointed
binaryFile source, SKU anti-join append, dynamic partition overwrite
of the derived marts) -- each crash-window family under a REAL kill.
Round 13 adds the third foreachBatch path: the CDC apply stream
(MERGE upsert + rename-aside swap of the applied table), closing the
coverage gap VERDICT r12 item 4 named.

Round 11 proved the ingest's crash windows replay-safe with INJECTED
faults -- exceptions raised at chosen safe points (`_fault` hooks).
A real executor loss is strictly nastier: SIGKILL lands at an
arbitrary instant, including mid-parquet-task-write (torn task files
under `_temporary/`), mid-shuffle, or after a localCheckpoint
materialized blocks only the dead JVM held. This script runs the
multi-batch ingest under ``local-cluster[4,8,8192]`` (4 real worker
JVMs) and SIGKILLs one CoarseGrainedExecutorBackend mid-batch, then
follows the foreachBatch restart contract (re-drive the failed batch).
The durability claim it certifies:

* every kill is either ABSORBED (Spark task retry recomputes the lost
  work from lineage within the same batch attempt) or surfaces as a
  batch FAILURE whose replay converges -- and in both cases the final
  corpus + digest table + funnel are byte-equal to a fault-free run;
* a kill during an at-least-once RE-DELIVERY of an already-committed
  batch leaves the state untouched (the replay-overwrite protocol
  tolerates dying mid-overwrite);
* no torn executor-side task file leaks into any store (equality of
  the stores IS that assertion -- a leaked `part-*` would change a
  row count or digest checksum).

Kill realism: os.kill(SIGKILL) on an executor JVM pid found via ps;
workers and the driver are never touched, and each scenario asserts
the kill actually preceded batch end (re-delivering the same batch --
idempotent by contract -- until one kill lands mid-run).

Usage: python tools/streaming_kill_check.py [--out STREAMKILL_r12.json]
(also driven, smaller, by tests/test_streaming_kill.py)
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

from pos_data_insertion_etl_spark.session import get_session  # noqa: E402
from pos_data_insertion_etl_spark.streaming.jobs import (  # noqa: E402
    curation_ingest_batch,
)

MASTER = os.environ.get("SPARK_GRAFT_LC_MASTER", "local-cluster[4,8,8192]")
_GATE = dict(min_words=10, stopwords=("the", "a"), min_stopword_hits=1)

#: rows per batch / distinct text universe. Texts are unique WITHIN a
#: batch (N <= D) and overlap ~50% ACROSS consecutive batches, so the
#: cross-batch dedup anti-join and the digest swap both carry real
#: work in every batch -- the kill has many distinct jobs to land in.
N_ROWS = int(os.environ.get("SPARK_GRAFT_SKILL_N", "400000"))
D_TEXTS = int(os.environ.get("SPARK_GRAFT_SKILL_D", "600000"))
N_BATCHES = 6
_SHIFT = 200000  # novel-text offset per batch


def _session():
    spark = get_session(
        "pos-etl-streaming-kill",
        master=MASTER,
        shuffle_partitions=32,
        extra_confs={
            "spark.executor.memory": "4g",
            "spark.scheduler.minRegisteredResourcesRatio": "1.0",
            "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _batch_df(spark, bid: int):
    """Deterministic batch content: gate-passing 12-word texts, unique
    in-batch, ~(N - SHIFT) of them already ingested by batch bid-1."""
    variant = (F.col("id") + F.lit(bid * _SHIFT)) % D_TEXTS
    return (
        spark.range(N_ROWS)
        .repartition(32)
        .select(
            (F.col("id") + bid * N_ROWS).alias("doc_id"),
            F.concat(
                F.lit("the quick brown fox jumps over a lazy dog variant x"),
                variant.cast("string"),
            ).alias("text"),
        )
    )


def _executor_pids(app_id: str, ps_output: str | None = None) -> list[int]:
    """Executor JVM pids belonging to THIS application only.

    CoarseGrainedExecutorBackend is launched with ``--app-id <app_id>``
    on its command line; filtering on it keeps the SIGKILL from landing
    on an executor of a concurrently running Spark application on the
    same host (ADVICE r12 -- a foreign kill would corrupt that run and
    make this proof non-probative). ``ps_output`` is injectable so the
    filter is unit-testable without a cluster."""
    if ps_output is None:
        ps_output = subprocess.run(
            ["ps", "-eo", "pid,args"], capture_output=True, text=True
        ).stdout
    return sorted(
        int(line.strip().split(None, 1)[0])
        for line in ps_output.splitlines()
        if "CoarseGrainedExecutorBackend" in line
        and "java" in line
        and app_id in line
    )


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
        os.kill(pids[0], signal.SIGKILL)
        record["killed_pid"] = pids[0]
        record["kill_time"] = time.perf_counter()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def _alive_executors(spark) -> int:
    """Live executor JVMs registered with the driver: block-manager
    count minus the driver's own. NOT distinct Python worker pids
    (ADVICE r12): one surviving 8-core executor can host >=4 distinct
    python workers across a 128-task probe, satisfying want=4 while
    killed executors are still respawning -- the next kill would then
    run under-provisioned and skew the kill-window calibration."""
    return (
        int(spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()) - 1
    )


def _wait_executors(spark, want: int, timeout: float = 90.0) -> int:
    """Block until `want` executor JVMs are registered, then run one
    tiny probe job so the scheduler has actually placed tasks on the
    respawned executors before the caller proceeds."""
    deadline = time.monotonic() + timeout
    seen = 0
    while time.monotonic() < deadline:
        seen = _alive_executors(spark)
        if seen >= want:
            spark.sparkContext.parallelize(range(want * 2), want * 2).count()
            return seen
        time.sleep(3)
    return seen


def _state(spark, out_dir: str) -> dict:
    """Order-free checksums of the three stores; equality of these IS
    the durability assertion (a torn task file, lost row, or doubled
    replay row changes a count or a checksum)."""

    def sig(path: str, cols: list[str]) -> list[int]:
        df = spark.read.parquet(os.path.join(out_dir, path))
        casted = [F.col(c).cast("string").alias(c) for c in cols]
        row = (
            df.select(F.xxhash64(*casted).alias("h"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                # decimal(38,0) sum: exact and overflow-free under ANSI
                # (a plain long sum of ~1M xxhash64 values overflows)
                F.coalesce(
                    F.sum(F.col("h").cast("decimal(38,0)")),
                    F.lit(0).cast("decimal(38,0)"),
                ).alias("s"),
            )
            .collect()[0]
        )
        return [int(row.n), str(row.s)]

    return {
        "funnel": sig("funnel", ["batch", "n_raw", "n_gated"]),
        "corpus": sig("corpus", ["batch", "doc_id", "text"]),
        "digests": sig("digests", ["digest"]),
    }


def _drive(spark, out_dir: str, bid: int) -> None:
    curation_ingest_batch(_batch_df(spark, bid), bid, out_dir, **_GATE)


def _drive_with_kill(
    spark, out_dir: str, bid: int, kill_after: float, attempts: int = 4
) -> dict:
    """Deliver batch `bid` with a mid-run SIGKILL, then follow the
    restart contract until the batch has committed. Re-deliveries are
    idempotent, so a kill that raced batch end just retries with a
    fresh kill. Returns the per-kill record."""
    rec: dict = {"bid": bid, "kills": []}
    for attempt in range(attempts):
        kill: dict = {}
        th = _kill_one_executor_after(spark, kill_after, kill)
        t0 = time.perf_counter()
        err = ""
        try:
            _drive(spark, out_dir, bid)
            outcome = "absorbed"
        except Exception as exc:  # noqa: BLE001 -- the restart contract
            outcome = "failed"
            err = repr(exc)[:400]
        t_end = time.perf_counter()
        th.join(timeout=kill_after + 10)
        probative = (
            kill.get("killed_pid") is not None
            and kill.get("kill_time", t_end + 1) < t_end
        )
        rec["kills"].append(
            {
                "attempt": attempt,
                "killed_pid": kill.get("killed_pid"),
                "kill_before_batch_end": probative,
                "outcome": outcome,
                "wall_sec": round(t_end - t0, 2),
                "error": err,
            }
        )
        print(f"  batch {bid} kill[{attempt}]: {rec['kills'][-1]}", flush=True)
        _wait_executors(spark, want=4)
        if outcome == "failed":
            # restart contract: re-drive until the batch commits
            for _ in range(3):
                try:
                    _drive(spark, out_dir, bid)
                    break
                except Exception:  # noqa: BLE001 -- respawn race
                    time.sleep(5)
                    _wait_executors(spark, want=4)
            else:
                raise RuntimeError(f"batch {bid} never committed after kill")
        if probative:
            return rec
    return rec


def _mart_state(spark, out_dir: str) -> dict:
    """Order-free checksums of the four POS mart stores."""
    out = {}
    for store in (
        "t_day_pos_daily_sku_data",
        "t_day_ten_kyakusu_data",
        "t_day_sales",
        "t_day_ten_sales_front_data_daily",
    ):
        df = spark.read.parquet(os.path.join(out_dir, store))
        casted = [
            F.col(c).cast("string").alias(c) for c in sorted(df.columns)
        ]
        row = (
            df.select(F.xxhash64(*casted).alias("h"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.sum(F.col("h").cast("decimal(38,0)")),
                    F.lit(0).cast("decimal(38,0)"),
                ).alias("s"),
            )
            .collect()[0]
        )
        out[store] = [int(row.n), str(row.s)]
    return out


def _mart_zips(tmp: str) -> list[str]:
    """Three POS archive fixtures with DIFFERENT seeds: every batch
    carries novel keys, so the cross-batch anti-join does real work in
    every run. Batch boundaries are pinned by construction (one zip is
    added to the landing dir per stream run), so first-committed-wins
    is deterministic even when a killed run is re-driven."""
    sys.path.insert(0, os.path.join(_REPO, "tests"))
    from pos_fixture import build_fixture, write_zip

    paths = []
    for i, seed in enumerate((7, 8, 9)):
        records, _ = build_fixture(
            n_days=20, stores=10, txns_per_store_day=10,
            lines_per_txn=5, seed=seed,
        )
        path = os.path.join(tmp, f"R52{i}.2024030{i + 1}_214500.zip")
        write_zip(records, path)
        paths.append(path)
    return paths


def _adaptive_kill_after(records, base_kill_after, want=2, floor=0.3):
    """Kill delay for the NEXT run: None once ``want`` probative kills
    have landed; otherwise the calibrated delay, shrunk toward 60% of
    the fastest killed-but-late run wall observed so far. The static
    first-two-runs-take-a-kill policy flaked on a warm box (r14: the
    reference walls include cold-start, so the calibrated 1.0 s floor
    exceeded the ~0.9 s warm batch walls and BOTH kills landed after
    stream end -> zero probative kills). Adapting from the kill run's
    OWN measured walls converges onto mid-run within a batch or two."""
    n_probative = sum(1 for r in records if r["kill_before_stream_end"])
    if n_probative >= want:
        return None
    late_walls = [
        r["wall_sec"]
        for r in records
        if r["killed_pid"] is not None and not r["kill_before_stream_end"]
    ]
    if late_walls:
        return min(base_kill_after, max(floor, 0.6 * min(late_walls)))
    return base_kill_after


def _run_mart_stream(spark, zip_dir, out_dir, ckpt, kill_after, rec_list):
    """One availableNow run over the landing dir, optionally with a
    mid-run SIGKILL; re-driven (the stream restart contract) until it
    terminates cleanly. Appends one record per attempt."""
    from pos_data_insertion_etl_spark.streaming.jobs import pos_stream_ingest

    for attempt in range(5):
        kill: dict = {}
        th = None
        if kill_after is not None:
            th = _kill_one_executor_after(spark, kill_after, kill)
        t0 = time.perf_counter()
        err = ""
        try:
            q = pos_stream_ingest(spark, zip_dir, out_dir, ckpt)
            q.awaitTermination()
            outcome = "completed"
        except Exception as exc:  # noqa: BLE001 -- the restart contract
            outcome = "failed"
            err = repr(exc)[:400]
        t_end = time.perf_counter()
        if th is not None:
            th.join(timeout=kill_after + 10)
        probative = (
            kill.get("killed_pid") is not None
            and kill.get("kill_time", t_end + 1) < t_end
        )
        rec_list.append(
            {
                "attempt": attempt,
                "killed_pid": kill.get("killed_pid"),
                "kill_before_stream_end": probative,
                "outcome": outcome,
                "wall_sec": round(t_end - t0, 2),
                "error": err,
            }
        )
        print(f"  mart run attempt {attempt}: {rec_list[-1]}", flush=True)
        _wait_executors(spark, want=4)
        kill_after = None  # restart attempts run kill-free to completion
        if outcome == "completed":
            return
    raise RuntimeError("mart stream never completed after kill")


def scenario_mart(spark, out: dict) -> None:
    """Executor kill mid-batch of the POS mart ingest: the crash
    windows here are the SKU append (anti-join insert) and the dynamic
    partition OVERWRITE of the three derived marts -- different
    idempotence mechanisms from curation's digest swap. One zip is
    added to the landing dir per availableNow run; runs 1 and 2 take a
    mid-stream SIGKILL and are re-driven until clean."""
    import shutil

    ztmp = tempfile.mkdtemp(prefix="graft_skill_mart_zips_")
    dirs = {
        "clean": tempfile.mkdtemp(prefix="graft_skill_mart_ref_"),
        "kill": tempfile.mkdtemp(prefix="graft_skill_mart_"),
    }
    try:
        zips = _mart_zips(ztmp)
        landing = {}
        for mode, base in dirs.items():
            landing[mode] = os.path.join(base, "landing")
            os.makedirs(landing[mode])
        # Fault-free reference: one zip per run, no kills.
        walls = []
        for i, z in enumerate(zips):
            shutil.copy(z, landing["clean"])
            recs: list = []
            t0 = time.perf_counter()
            _run_mart_stream(
                spark, landing["clean"], os.path.join(dirs["clean"], "marts"),
                os.path.join(dirs["clean"], "ckpt"), None, recs,
            )
            walls.append(round(time.perf_counter() - t0, 2))
        out["mart_reference_walls"] = walls
        kill_after = max(1.5, 0.4 * sorted(walls)[1])
        out["mart_kill_after_sec"] = kill_after
        # Kill run: keep taking mid-stream SIGKILLs (delay adapted from
        # this run's own walls) until 2 probative kills land or the
        # batches run out -- see _adaptive_kill_after.
        records: list = []
        for i, z in enumerate(zips):
            shutil.copy(z, landing["kill"])
            _run_mart_stream(
                spark, landing["kill"], os.path.join(dirs["kill"], "marts"),
                os.path.join(dirs["kill"], "ckpt"),
                _adaptive_kill_after(records, kill_after), records,
            )
        out["mart_kill_records"] = records
        out["mart_probative_kills"] = sum(
            1 for r in records if r["kill_before_stream_end"]
        )
        out["mart_state_clean"] = _mart_state(
            spark, os.path.join(dirs["clean"], "marts")
        )
        out["mart_state_kill"] = _mart_state(
            spark, os.path.join(dirs["kill"], "marts")
        )
        out["mart_states_equal"] = (
            out["mart_state_clean"] == out["mart_state_kill"]
        )
        print(
            f"mart probative kills: {out['mart_probative_kills']}; "
            f"states equal: {out['mart_states_equal']}",
            flush=True,
        )
        assert out["mart_probative_kills"] >= 1, out
        assert out["mart_states_equal"], out
    finally:
        shutil.rmtree(ztmp, ignore_errors=True)
        for base in dirs.values():
            shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------
# CDC apply-stream kill scenario (VERDICT r12 item 4): apply_cdc_stream
# has the same rename-aside swap window as the curation digest swap but
# had no executor-kill witness. Crash windows here: mid-MERGE-rewrite
# (torn __cdc tmp dir), mid-swap (restore_crashed_swap must heal on the
# re-drive), and a kill during an at-least-once re-delivery of an
# already-committed batch (upsert idempotence).
# --------------------------------------------------------------------

CDC_TARGET_ROWS = int(os.environ.get("SPARK_GRAFT_CDC_N", "1500000"))
CDC_BATCH_ROWS = int(os.environ.get("SPARK_GRAFT_CDC_B", "600000"))


def _cdc_batch_df(spark, bid: int):
    """Deterministic update batch: keys 3*id+bid are unique in-batch
    (upsert's documented contract) and disjoint ACROSS batches (mod-3
    residues), spanning both existing target keys (updates) and novel
    ones (inserts), so the MERGE's matched and not-matched branches
    both carry real work in every batch."""
    return (
        spark.range(CDC_BATCH_ROWS)
        .repartition(16)
        .select(
            (F.col("id") * 3 + bid).alias("k"),
            (F.lit(10_000_000 * (bid + 1)) + F.col("id") % 9973).alias("val"),
        )
    )


def _cdc_state(spark, target: str) -> list:
    df = spark.read.parquet(target)
    row = (
        df.select(
            F.xxhash64(
                F.col("k").cast("string"), F.col("val").cast("string")
            ).alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.col("h").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("s"),
        )
        .collect()[0]
    )
    return [int(row.n), str(row.s)]


def _run_cdc_stream(spark, landing, target, ckpt, kill_after, rec_list):
    """One availableNow CDC apply run, optionally with a mid-run
    SIGKILL; re-driven (the stream restart contract) until clean."""
    from pos_data_insertion_etl_spark.streaming.jobs import apply_cdc_stream

    for attempt in range(5):
        kill: dict = {}
        th = None
        if kill_after is not None:
            th = _kill_one_executor_after(spark, kill_after, kill)
        t0 = time.perf_counter()
        err = ""
        try:
            updates = (
                spark.readStream.schema("k long, val long")
                .parquet(landing)
            )
            q = apply_cdc_stream(updates, target, ["k"], ckpt)
            q.awaitTermination()
            outcome = "completed"
        except Exception as exc:  # noqa: BLE001 -- the restart contract
            outcome = "failed"
            err = repr(exc)[:400]
        t_end = time.perf_counter()
        if th is not None:
            th.join(timeout=kill_after + 10)
        probative = (
            kill.get("killed_pid") is not None
            and kill.get("kill_time", t_end + 1) < t_end
        )
        rec_list.append(
            {
                "attempt": attempt,
                "killed_pid": kill.get("killed_pid"),
                "kill_before_stream_end": probative,
                "outcome": outcome,
                "wall_sec": round(t_end - t0, 2),
                "error": err,
            }
        )
        print(f"  cdc run attempt {attempt}: {rec_list[-1]}", flush=True)
        _wait_executors(spark, want=4)
        kill_after = None  # restart attempts run kill-free to completion
        if outcome == "completed":
            return
    raise RuntimeError("cdc stream never completed after kill")


def scenario_cdc(spark, out: dict) -> None:
    """Executor kill mid-batch of the CDC apply stream; final applied
    table must checksum-equal a fault-free run."""
    import shutil

    stage = tempfile.mkdtemp(prefix="graft_skill_cdc_stage_")
    dirs = {
        "clean": tempfile.mkdtemp(prefix="graft_skill_cdc_ref_"),
        "kill": tempfile.mkdtemp(prefix="graft_skill_cdc_"),
    }
    n_batches = 3
    try:
        for bid in range(n_batches):
            _cdc_batch_df(spark, bid).write.parquet(
                os.path.join(stage, f"b{bid}")
            )
        landing, target = {}, {}
        for mode, base in dirs.items():
            landing[mode] = os.path.join(base, "landing")
            target[mode] = os.path.join(base, "target")
            os.makedirs(landing[mode])
            # identical deterministic seed table in both modes
            (
                spark.range(CDC_TARGET_ROWS)
                .repartition(16)
                .select(F.col("id").alias("k"), F.lit(0).alias("val"))
                .write.parquet(target[mode])
            )

        def add_batch(mode: str, bid: int) -> None:
            src = os.path.join(stage, f"b{bid}")
            for j, fname in enumerate(sorted(os.listdir(src))):
                if fname.endswith(".parquet"):
                    shutil.copy(
                        os.path.join(src, fname),
                        os.path.join(landing[mode], f"b{bid}_{j}.parquet"),
                    )

        # Fault-free reference: one batch per availableNow run.
        walls = []
        for bid in range(n_batches):
            add_batch("clean", bid)
            recs: list = []
            t0 = time.perf_counter()
            _run_cdc_stream(
                spark, landing["clean"], target["clean"],
                os.path.join(dirs["clean"], "ckpt"), None, recs,
            )
            walls.append(round(time.perf_counter() - t0, 2))
        out["cdc_reference_walls"] = walls
        kill_after = max(1.0, 0.4 * sorted(walls)[1])
        out["cdc_kill_after_sec"] = kill_after
        # Kill run: keep taking mid-stream SIGKILLs (delay adapted from
        # this run's own walls) until 2 probative kills land or the
        # batches run out -- see _adaptive_kill_after.
        records: list = []
        for bid in range(n_batches):
            add_batch("kill", bid)
            _run_cdc_stream(
                spark, landing["kill"], target["kill"],
                os.path.join(dirs["kill"], "ckpt"),
                _adaptive_kill_after(records, kill_after), records,
            )
        out["cdc_kill_records"] = records
        out["cdc_probative_kills"] = sum(
            1 for r in records if r["kill_before_stream_end"]
        )
        out["cdc_state_clean"] = _cdc_state(spark, target["clean"])
        out["cdc_state_kill"] = _cdc_state(spark, target["kill"])
        out["cdc_states_equal"] = (
            out["cdc_state_clean"] == out["cdc_state_kill"]
        )
        print(
            f"cdc probative kills: {out['cdc_probative_kills']}; "
            f"states equal: {out['cdc_states_equal']}",
            flush=True,
        )
        assert out["cdc_probative_kills"] >= 1, out
        assert out["cdc_states_equal"], out
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        for base in dirs.values():
            shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO, "STREAMKILL_r13.json"))
    ap.add_argument(
        "--scenario",
        default="all",
        choices=["curation", "mart", "cdc", "all"],
    )
    args = ap.parse_args()

    out: dict = {
        "master": MASTER,
        "n_rows": N_ROWS,
        "d_texts": D_TEXTS,
        "n_batches": N_BATCHES,
    }
    spark = _session()
    out["executor_python_pids"] = _wait_executors(spark, want=4)

    clean_dir = tempfile.mkdtemp(prefix="graft_skill_ref_")
    kill_dir = tempfile.mkdtemp(prefix="graft_skill_")
    import shutil

    shutil.rmtree(clean_dir, ignore_errors=True)
    shutil.rmtree(kill_dir, ignore_errors=True)
    try:
        if args.scenario in ("cdc", "all"):
            print("== cdc apply-stream kill scenario ==", flush=True)
            scenario_cdc(spark, out)
        if args.scenario in ("mart", "all"):
            print("== mart ingest kill scenario ==", flush=True)
            scenario_mart(spark, out)
        if args.scenario in ("curation", "all"):
            print("== curation ingest kill scenario ==", flush=True)
            # Fault-free reference run; per-batch walls calibrate the kill.
            walls = []
            for bid in range(N_BATCHES):
                t0 = time.perf_counter()
                _drive(spark, clean_dir, bid)
                walls.append(round(time.perf_counter() - t0, 2))
            out["reference_batch_walls"] = walls
            print(f"reference walls: {walls}", flush=True)
            typical = sorted(walls[1:])[len(walls[1:]) // 2]
            kill_after = max(1.0, 0.4 * typical)
            out["kill_after_sec"] = kill_after

            # Kill run: batches 1 and 3 take a mid-batch SIGKILL; batch
            # 2 commits cleanly, then an at-least-once RE-DELIVERY of it
            # takes another kill (the replay-overwrite crash window).
            records = []
            for bid in range(N_BATCHES):
                if bid in (1, 3):
                    records.append(
                        _drive_with_kill(spark, kill_dir, bid, kill_after)
                    )
                else:
                    _drive(spark, kill_dir, bid)
                    if bid == 2:
                        rec = _drive_with_kill(
                            spark, kill_dir, bid, kill_after
                        )
                        rec["redelivery"] = True
                        records.append(rec)
            out["kill_records"] = records

            probative = sum(
                1
                for r in records
                for k in r["kills"]
                if k["kill_before_batch_end"]
            )
            out["probative_kills"] = probative
            out["state_clean"] = _state(spark, clean_dir)
            out["state_kill"] = _state(spark, kill_dir)
            out["states_equal"] = out["state_clean"] == out["state_kill"]
            print(
                f"probative kills: {probative}; states equal: "
                f"{out['states_equal']}",
                flush=True,
            )
            assert probative >= 2, out
            assert out["states_equal"], out
    finally:
        spark.stop()
        shutil.rmtree(clean_dir, ignore_errors=True)
        shutil.rmtree(kill_dir, ignore_errors=True)

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}", flush=True)
    print("STREAMING KILL CHECK OK", flush=True)


if __name__ == "__main__":
    main()
