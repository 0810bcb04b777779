"""Round-13 guard fixes (ADVICE r12, all four items).

* session: ``spark.sql.cteRecursionRowLimit`` is no longer raised
  engine-wide to 1e9; the one plan that legitimately needs more than
  the 1M default (q97's order chain at sf1.0+) raises it locally via
  ``session.scoped_conf``, sized from its actual input, and restores
  the default before returning -- a buggy recursive CTE elsewhere
  still trips the stock guard;
* tools/streaming_kill_check._wait_executors counts executor JVMs
  registered with the driver (block managers minus the driver), not
  distinct Python worker pids -- one surviving 8-core executor can
  host >=4 python workers and fake a full respawn;
* tools/*_kill_check._executor_pids filters ``ps`` output by THIS
  application's id (CoarseGrainedExecutorBackend carries
  ``--app-id``), so the SIGKILL can never land on a concurrently
  running Spark app's executor;
* bench._clear_block_pool warns once and records pool_cleared=false
  in the detail JSON instead of silently disabling the storage-pool
  hygiene when the private py4j surface drifts.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from pos_data_insertion_etl_spark.session import scoped_conf

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TESTS_DIR)


def _load_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------
# item 1: recursion row cap is scoped to q97, not engine-wide
# --------------------------------------------------------------------

_CAP_KEY = "spark.sql.cteRecursionRowLimit"


def test_runtime_confs_no_longer_weaken_recursion_guard():
    from pos_data_insertion_etl_spark.session import RUNTIME_CONFS

    assert _CAP_KEY not in RUNTIME_CONFS


def test_session_default_recursion_cap_is_stock(spark):
    # The engine-wide guard is Spark's stock 1M again.
    assert spark.conf.get(_CAP_KEY) == "1000000"


def test_scoped_conf_sets_and_restores(spark):
    before = spark.conf.get(_CAP_KEY)
    with scoped_conf(spark, _CAP_KEY, "12345678"):
        assert spark.conf.get(_CAP_KEY) == "12345678"
    assert spark.conf.get(_CAP_KEY) == before


def test_scoped_conf_restores_on_exception(spark):
    before = spark.conf.get(_CAP_KEY)
    with pytest.raises(RuntimeError, match="boom"):
        with scoped_conf(spark, _CAP_KEY, "7777777"):
            raise RuntimeError("boom")
    assert spark.conf.get(_CAP_KEY) == before


def test_q97_materializes_inside_scope_and_restores(spark, sf_dir):
    """q97 must (a) leave the session cap at its prior value after the
    callable returns, and (b) return a plan that survives a later
    collect under the STOCK cap -- i.e. the recursion was materialized
    inside the scope, not deferred to collect time."""
    import __spark_entry__ as entry

    before = spark.conf.get(_CAP_KEY)
    df = entry.queries()["q97_recursive_order_chain"](spark, sf_dir)
    assert spark.conf.get(_CAP_KEY) == before
    # Collect AFTER the scope closed: must not re-run the recursion
    # against the stock cap (and at sf0.01 would pass anyway -- the
    # real assertion is the conf value above plus the sf1.0 sweep).
    assert df.count() > 0
    assert spark.conf.get(_CAP_KEY) == before


# --------------------------------------------------------------------
# items 2+3: kill tools -- executor-JVM counting and app-id filtering
# --------------------------------------------------------------------

_PS_FIXTURE = """\
  101 /usr/bin/java -cp ... org.apache.spark.executor.CoarseGrainedExecutorBackend --driver-url spark://CoarseGrainedScheduler@host:35001 --executor-id 0 --app-id app-20260816000000-0000 --hostname host
  102 /usr/bin/java -cp ... org.apache.spark.executor.CoarseGrainedExecutorBackend --driver-url spark://CoarseGrainedScheduler@host:35002 --executor-id 1 --app-id app-20260816000000-0000 --hostname host
  201 /usr/bin/java -cp ... org.apache.spark.executor.CoarseGrainedExecutorBackend --driver-url spark://CoarseGrainedScheduler@host:36001 --executor-id 0 --app-id app-20260816111111-0007 --hostname host
  301 python3 some_unrelated_process CoarseGrainedExecutorBackend app-20260816000000-0000
  401 bash -c java CoarseGrainedExecutorBackend
"""


@pytest.mark.parametrize(
    "tool", ["streaming_kill_check", "executor_kill_check"]
)
def test_executor_pids_filter_by_app_id(tool):
    mod = _load_module(
        f"_r13_{tool}", os.path.join(_REPO_ROOT, "tools", f"{tool}.py")
    )
    # Only THIS app's java backends match; the other app's executor
    # (pid 201), a non-java line mentioning the class (301), and a
    # java line without the app id (401) are all excluded.
    assert mod._executor_pids(
        "app-20260816000000-0000", ps_output=_PS_FIXTURE
    ) == [101, 102]
    assert mod._executor_pids(
        "app-20260816111111-0007", ps_output=_PS_FIXTURE
    ) == [201]
    assert mod._executor_pids(
        "app-20260816999999-0042", ps_output=_PS_FIXTURE
    ) == []


def test_alive_executors_counts_jvms_not_python_workers(spark):
    mod = _load_module(
        "_r13_skc",
        os.path.join(_REPO_ROOT, "tools", "streaming_kill_check.py"),
    )
    # On local[N] there are no executor JVMs -- only the driver's own
    # block manager -- so the JVM count is 0 no matter how many Python
    # workers a probe job would spawn. The old pid-count probe returned
    # >=8 here; that inflation is exactly the ADVICE r12 bug.
    assert mod._alive_executors(spark) == 0


@pytest.mark.slow
def test_alive_executors_local_cluster():
    """Under a real 2-worker local-cluster the JVM count is exactly 2
    (block managers minus the driver), proving the counter tracks
    executor JVMs, not python workers (each executor has 2 cores, so a
    worker-pid probe could legally report up to 4)."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import importlib.util, os, sys
        sys.path.insert(0, %r)
        from pos_data_insertion_etl_spark.session import get_session
        spec = importlib.util.spec_from_file_location(
            "skc", os.path.join(%r, "tools", "streaming_kill_check.py"))
        skc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(skc)
        spark = get_session(
            "r13-alive-exec", master="local-cluster[2,2,2048]",
            shuffle_partitions=4,
            extra_confs={
                "spark.executor.memory": "1g",
                "spark.scheduler.minRegisteredResourcesRatio": "1.0",
                "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
            })
        n = skc._wait_executors(spark, want=2, timeout=120)
        print("ALIVE=%%d" %% n)
        spark.stop()
        """
        % (_REPO_ROOT, _REPO_ROOT)
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=_REPO_ROOT,
    )
    assert "ALIVE=2" in proc.stdout, (proc.stdout[-2000:], proc.stderr[-2000:])


# --------------------------------------------------------------------
# item 4: bench pool-clear failure is visible, not silent
# --------------------------------------------------------------------

class _BrokenJsc:
    def getPersistentRDDs(self):  # pragma: no cover - trivial
        raise RuntimeError("py4j surface drifted")


class _BrokenSc:
    _jsc = _BrokenJsc()


class _BrokenSpark:
    sparkContext = _BrokenSc()


def test_clear_block_pool_flags_failure(capsys):
    bench = _load_module("_r13_bench", os.path.join(_REPO_ROOT, "bench.py"))
    assert bench._POOL_CLEAR_OK is True
    bench._clear_block_pool(_BrokenSpark())
    assert bench._POOL_CLEAR_OK is False
    err = capsys.readouterr().err
    assert "pool_cleared=false" in err
    # Warn ONCE: a second failure stays quiet (the flag already flew).
    bench._clear_block_pool(_BrokenSpark())
    assert capsys.readouterr().err == ""


def test_clear_block_pool_succeeds_on_real_session(spark):
    bench = _load_module("_r13_bench2", os.path.join(_REPO_ROOT, "bench.py"))
    df = spark.range(10).localCheckpoint(eager=True)
    df.count()
    bench._clear_block_pool(spark)
    assert bench._POOL_CLEAR_OK is True
