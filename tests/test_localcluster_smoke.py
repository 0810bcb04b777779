"""Durable distribution smoke: a representative query slice under
``local-cluster[2,4,4096]`` (real Worker JVMs, executor-side Python
workers importing the engine from the shipped zip).

The full 56-name certification sweep lives in
tools/localcluster_check.py (LOCALCLUSTER_r11.json); this module keeps
the distribution axis covered ON EVERY FULL SUITE RUN with one
small-cluster session and six queries chosen to cross the risky
boundaries:

* a mapInPandas codec path (q60: PNG decode on executors),
* a streamed exactly-once replay with task-side temp dirs (q274),
* a plan-shape assertion that must hold under a real scheduler (q290
  AQE skew split),
* the salted-join strategy assertion (q277),
* a stateful aggregation (q36 event-time windows), and
* a values_frame-backed write path inside q274's funnel.

Runs in a subprocess: a second SparkContext (different master) cannot
coexist with the session fixture's. Full-marked (~2-3 min).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_NAMES = [
    "q36_hourly_events",
    "q60_image_decode_stats",
    "q274_streamed_curation_replay",
    "q277_salted_skew_join",
    "q290_aqe_skew_split",
    "q51_dedup_fingerprint",
]

_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {tests!r})
    from pos_data_insertion_etl_spark.compat import ensure_protobuf
    ensure_protobuf()
    from pos_data_insertion_etl_spark.plans import all_queries
    from pos_data_insertion_etl_spark.session import get_session
    from oracle_harness import compare, duck_connection

    spark = get_session(
        "pos-etl-lc-smoke",
        master="local-cluster[2,4,4096]",
        shuffle_partitions=8,
        extra_confs={{
            "spark.executor.memory": "3g",
            "spark.scheduler.minRegisteredResourcesRatio": "1.0",
            "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
        }},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Prove we really are multi-process: executor python pids differ
    # from the driver's.
    import os as _os
    driver_pid = _os.getpid()
    pids = set(
        spark.sparkContext.parallelize(range(16), 16)
        .map(lambda _: __import__("os").getpid())
        .collect()
    )
    assert driver_pid not in pids and len(pids) >= 2, (driver_pid, pids)

    sf = "/root/testdata/sf0.01"
    con = duck_connection(sf)
    registry = all_queries()
    for name in {names!r}:
        spec = registry[name]
        df = spec.spark(spark, sf)
        if spec.oracle is None:
            assert df.count() >= 0
            print(name, "ROWS-ONLY OK", flush=True)
            continue
        ok, msg = compare(df, con, spec.oracle)
        assert ok, (name, msg)
        print(name, "GREEN", flush=True)
    spark.stop()
    print("LC SMOKE OK", flush=True)
    """
)


def test_representative_queries_green_under_local_cluster():
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            _SCRIPT.format(
                repo=_REPO,
                tests=os.path.join(_REPO, "tests"),
                names=_NAMES,
            ),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=_REPO,
    )
    assert proc.returncode == 0 and "LC SMOKE OK" in proc.stdout, (
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-3000:]}"
    )
