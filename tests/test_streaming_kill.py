"""Executor-loss durability of the STREAMED curation ingest (round 12;
extends the r11 executor-kill proof from the iterative-graph family to
the foreachBatch family).

Runs tools/streaming_kill_check.py in a subprocess (it needs its own
local-cluster[4,8,8192] session -- incompatible with the shared
local[8] fixture): SIGKILL one executor JVM mid-micro-batch of the
multi-batch curation ingest, follow the foreachBatch restart contract
(re-drive the failed batch), and assert the final corpus + digest
table + funnel checksums EQUAL a fault-free run -- including a kill
during an at-least-once re-delivery of an already-committed batch.
Unlike the r11 crash-window tests (exceptions injected at chosen safe
points), the SIGKILL lands at an arbitrary instant: mid-parquet-task-
write, mid-shuffle, or post-localCheckpoint.

Heavy (~3-5 min) and full-marked via conftest._FULL_MODULES.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_REPO, "tools", "streaming_kill_check.py")


def test_streaming_kill_replay_converges(tmp_path):
    out = tmp_path / "streamkill.json"
    env = dict(os.environ)
    # Smaller batches than the standalone artifact run; the script
    # calibrates its kill window from measured per-batch walls.
    env["SPARK_GRAFT_SKILL_N"] = env.get("SPARK_GRAFT_SKILL_N", "200000")
    env["SPARK_GRAFT_SKILL_D"] = env.get("SPARK_GRAFT_SKILL_D", "300000")
    proc = subprocess.run(
        # curation scenario only: the mart scenario (fixed-size POS
        # fixture, ~6 stream runs) belongs to the standalone artifact
        # run; one scenario keeps this inside the suite's time budget.
        [sys.executable, _TOOL, "--out", str(out), "--scenario", "curation"],
        capture_output=True,
        text=True,
        timeout=850,
        env=env,
    )
    assert proc.returncode == 0, (
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    rec = json.loads(out.read_text())
    assert rec["states_equal"]
    assert rec["probative_kills"] >= 2
    # every kill either absorbed by task retry or recovered by replay
    for r in rec["kill_records"]:
        for k in r["kills"]:
            assert k["outcome"] in ("absorbed", "failed")
