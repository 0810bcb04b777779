"""Round-12 guard fixes (ADVICE r11, all four items).

* smallframe._split_top_level tracks bracket KINDS with a stack, so
  mismatched pairs ('decimal(10,2>') fail loudly in our parser instead
  of deep inside Spark's DDL parser;
* __spark_entry__'s three evidence readers share ONE artifact-filename
  contract (CORRECTNESS_r<digits>.json): a green row in an
  off-contract file can no longer be "green" without a "latest round";
* tools/executor_kill_check.scenario_reliable records an in-flight
  exception instead of letting it escape main()'s retry loop;
* session.get_session raises when launch-time settings (master,
  extra_confs) are requested while a mismatched session is already
  active, instead of silently returning it with none applied.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import threading

import pytest

from pos_data_insertion_etl_spark.session import get_session
from pos_data_insertion_etl_spark.smallframe import _split_top_level

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TESTS_DIR)


def _load_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------
# smallframe: bracket kinds must match
# --------------------------------------------------------------------

@pytest.mark.parametrize(
    "bad",
    [
        "a decimal(10,2>",
        "m map<string,int)",
        "a int>",
        "a struct<x int, b decimal(10,2)",
    ],
)
def test_split_top_level_rejects_mismatched_bracket_kinds(bad):
    with pytest.raises(ValueError, match="unbalanced"):
        _split_top_level(bad)


def test_split_top_level_nested_types_still_parse():
    got = _split_top_level(
        "a array<struct<x int,y decimal(10,2)>>, b map<string,int>, c int"
    )
    assert [f.strip() for f in got] == [
        "a array<struct<x int,y decimal(10,2)>>",
        "b map<string,int>",
        "c int",
    ]


# --------------------------------------------------------------------
# __spark_entry__: one filename contract for all evidence readers
# --------------------------------------------------------------------

def test_evidence_readers_share_filename_contract(tmp_path):
    mod = _load_module(
        "_entry_r12_fixes", os.path.join(_REPO_ROOT, "__spark_entry__.py")
    )
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_a": {"hash_match": True}, "q_c": {"hash_match": False}})
    )
    # Off-contract filename: must be invisible to ALL three readers.
    (tmp_path / "CORRECTNESS_r11b.json").write_text(
        json.dumps({"q_b": {"hash_match": True}})
    )
    mod._REPO_ROOT = str(tmp_path)
    assert mod.driver_certified_names() == {"q_a", "q_c"}
    assert mod.driver_green_names() == {"q_a"}
    assert mod.driver_green_latest_round() == {"q_a": 1}


# --------------------------------------------------------------------
# executor_kill_check: transient failures stay inside the scenario
# --------------------------------------------------------------------

def test_scenario_reliable_contains_transient_failure(spark, monkeypatch):
    kill = _load_module(
        "_killcheck_r12_fixes",
        os.path.join(_REPO_ROOT, "tools", "executor_kill_check.py"),
    )

    def boom(_spark, _n):
        raise RuntimeError("checkpoint write raced the kill")

    def fake_kill(_spark, after, rec):
        rec["killed_pid"] = 4242
        rec["kill_time"] = 0.0
        th = threading.Thread(target=lambda: None)
        th.start()
        return th

    monkeypatch.setattr(kill, "_run_cc", boom)
    monkeypatch.setattr(kill, "_kill_one_executor_after", fake_kill)
    out: dict = {}
    # Must RECORD the failure and return False (retry), not raise.
    assert kill.scenario_reliable(spark, 100, 0.1, out) is False
    rec = out["reliable"]
    assert rec["correct"] is False
    assert "checkpoint write raced" in rec["error"]
    assert rec["kill_before_job_end"] is True
    # the conf is reset even on the failure path
    assert spark.conf.get(kill.CONF_KEY, "") == ""


def test_scenario_reliable_wrong_result_not_ok(spark, monkeypatch):
    kill = _load_module(
        "_killcheck_r12_fixes2",
        os.path.join(_REPO_ROOT, "tools", "executor_kill_check.py"),
    )

    def fake_kill(_spark, after, rec):
        rec["killed_pid"] = 4242
        rec["kill_time"] = 0.0
        th = threading.Thread(target=lambda: None)
        th.start()
        return th

    monkeypatch.setattr(kill, "_run_cc", lambda _s, _n: (0, 0, 0))
    monkeypatch.setattr(kill, "_kill_one_executor_after", fake_kill)
    out: dict = {}
    assert kill.scenario_reliable(spark, 100, 0.1, out) is False
    assert out["reliable"]["correct"] is False
    assert out["reliable"]["error"] == ""


# --------------------------------------------------------------------
# get_session: launch-time settings vs an already-active session
# --------------------------------------------------------------------

def test_get_session_rejects_mismatched_master(spark):
    with pytest.raises(RuntimeError, match="launch-time"):
        get_session("r12-fixes", master="local-cluster[2,4,1024]")


def test_get_session_rejects_droppable_extra_confs(spark):
    with pytest.raises(RuntimeError, match="extra_confs"):
        get_session(
            "r12-fixes", extra_confs={"spark.executor.memory": "123g"}
        )


def test_get_session_accepts_matching_request(spark):
    active_master = spark.conf.get("spark.master")
    got = get_session(
        "r12-fixes",
        master=active_master,
        extra_confs={"spark.master": active_master},
    )
    assert got is spark
