"""Memory-pressure proof, pinned as a test (VERDICT r11 item 4): the
100 TB design point never grants local[32]'s 128 GiB/JVM comfort, so
the heaviest end-to-end entry must SPILL rather than OOM when executor
memory shrinks 4x below the distribution-proof config.

Runs the r11 bench's worst entry (curation_e2e: Gopher gate -> LM gate
-> exact + LSH dedup -> packing, both output actions) at sf0.1 under
``local-cluster[2,4,2048]`` with 2g executors -- separate worker JVMs,
real serialization, a quarter of the LOCALCLUSTER_r11 heap -- and
asserts completion with the same funnel the roomy config produces.
The full top-10 sweep artifact is MEMPRESSURE_r12.json
(tools/localcluster_check.py with SPARK_GRAFT_LC_MASTER/EXECMEM).

Full-marked via conftest._FULL_MODULES (~2-3 min: worker JVM spin-up
dominates).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from pos_data_insertion_etl_spark.compat import ensure_protobuf
    ensure_protobuf()
    from pos_data_insertion_etl_spark.session import get_session
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.pipeline.curation import curate_corpus

    spark = get_session(
        "pos-etl-mempressure",
        master="local-cluster[2,4,2048]",
        shuffle_partitions=16,
        extra_confs={{
            "spark.executor.memory": "2g",
            "spark.scheduler.minRegisteredResourcesRatio": "1.0",
            "spark.scheduler.maxRegisteredResourcesWaitingTime": "60s",
        }},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, {sf!r}, "documents")
    packed, funnel = curate_corpus(
        docs,
        min_words=10,
        stopwords=("the", "a"),
        min_stopword_hits=1,
        max_cross_entropy=4.0,
    )
    n_packed = packed.count()
    rows = sorted(
        (int(r.stage_order), r.stage, int(r.n_docs))
        for r in funnel.collect()
    )
    assert n_packed > 0 and rows, (n_packed, rows)
    # funnel must be monotone non-increasing through the gates
    counts = [n for _, _, n in rows]
    assert counts == sorted(counts, reverse=True), rows
    print("MEMPRESSURE OK", n_packed, rows, flush=True)
    spark.stop()
    """
)


def test_worst_bench_entry_completes_under_2g_executors():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=_REPO, sf=sf)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=_REPO,
    )
    assert proc.returncode == 0 and "MEMPRESSURE OK" in proc.stdout, (
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-3000:]}"
    )
