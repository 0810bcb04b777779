"""Executor-loss durability of lineage.cut_lineage (VERDICT r10
item 2), driven end-to-end in a REAL multi-process cluster.

Runs tools/executor_kill_check.py in a subprocess (it needs its own
local-cluster[4,8,8192] session -- incompatible with the shared
local[8] fixture): SIGKILL one executor JVM mid-iteration of
connected_components; with spark.pos_etl.reliableCheckpointDir set the
job must complete with the closed-form answer, and with the default
localCheckpoint it must fail -- proving the hatch is load-bearing.

Heavy (~3-5 min) and full-marked via conftest._FULL_MODULES.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOL = os.path.join(_REPO, "tools", "executor_kill_check.py")


def test_executor_kill_reliable_survives_default_fails(tmp_path):
    out = tmp_path / "killcheck.json"
    env = dict(os.environ)
    # Smaller graph than the standalone artifact run: the kill windows
    # scale with the baseline, which the script calibrates itself.
    env["SPARK_GRAFT_KILL_N"] = env.get("SPARK_GRAFT_KILL_N", "1500000")
    proc = subprocess.run(
        [sys.executable, _TOOL, "--out", str(out)],
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
    assert rec["reliable"]["correct"]
    assert rec["reliable"]["kill_before_job_end"]
    assert rec["reliable"]["killed_pid"]
    assert rec["default"]["job_failed"]
    assert rec["default"]["kill_before_job_end"]
