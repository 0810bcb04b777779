#!/usr/bin/env python3
"""Scaling-slope probe (VERDICT r8 item 6): time the heaviest bench
entries at sf0.001 / sf0.01 / sf0.1 (10x data per step) and report the
per-decade scaling exponent

    slope = log10(t_hi / t_lo)   per 10x data step

slope 1.0 = linear in data, < 1 = fixed overhead still dominates,
> 1 = super-linear (a shuffle/join growing faster than the corpus --
the 100 TB red flag this probe exists to catch). Writes
SCALING_r{N}{TAG}.json next to the repo root; round derivation follows
bench.py (max BENCH_r* + 1), tag from SPARK_GRAFT_BENCH_TAG.

Methodology matches bench.py: one untimed warm-up then median of
$SPARK_GRAFT_BENCH_REPS (default 3) timed runs per (query, sf).
"""

from __future__ import annotations

import json
import math
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import bench_curation
from pos_data_insertion_etl_spark.plans import all_queries
from pos_data_insertion_etl_spark.session import (
    get_session,
    write_log4j_file_config,
)

#: The 5 heaviest round-8 bench entries plus the round-9 shapes
#: (batch T storage entries, then the batch U headline additions and
#: the weighted-SSSP iterative loop).
PROBE = [
    "q189_setsim_prefix_join",
    "q212_bfs_distances",
    "q237_rfm_segments",
    "q274_streamed_curation_replay",
    "q275_bucketed_mart_join",
    "q277_salted_skew_join",
    "q278_bloom_semijoin_prefilter",
    "q282_weighted_sssp",
]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: sf1.0 is the bench-only synthesized decade (tools/make_sf1_benchdata
#: .py: key-remapped x10 replication of sf0.1, copy-decorrelated text/
#: embeddings); generated on demand, never used for oracle checks.
SF1_DIR = os.path.join(_REPO, ".benchdata", "sf1.0")

SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    SF1_DIR,
]


def _ensure_sf1() -> None:
    if os.path.isdir(os.path.join(SF1_DIR, "lineitem.parquet")):
        return
    import subprocess

    print("generating bench-only sf1.0 dataset ...", file=sys.stderr)
    subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "make_sf1_benchdata.py")],
        check=True,
    )


def _median_time(fn, reps: int) -> float:
    fn()  # warm-up
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def main() -> None:
    import tempfile

    _ensure_sf1()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_session(
        "pos-etl-scaling",
        shuffle_partitions=cpus,
        log4j_config=write_log4j_file_config(
            os.path.join(tempfile.gettempdir(), "scaling_spark_jvm.log")
        ),
    )
    registry = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict[str, float]] = {}
    for sf_dir in SFS:
        sf = sf_dir.rsplit("sf", 1)[-1]
        from pos_data_insertion_etl_spark.catalog import TABLES, load_table

        for t in TABLES:
            load_table(spark, sf_dir, t).select(F.lit(1)).limit(1).collect()
        for name in PROBE:
            spec = registry[name]
            m = _median_time(
                lambda: spec.spark(spark, sf_dir).collect(), reps
            )
            results.setdefault(name, {})[sf] = m
            print(f"{name} @ sf{sf}: {m:.3f}s", file=sys.stderr)
        m = _median_time(lambda: bench_curation(spark, sf_dir), reps)
        results.setdefault("curation_e2e", {})[sf] = m
        print(f"curation_e2e @ sf{sf}: {m:.3f}s", file=sys.stderr)

    # Slopes from the UNROUNDED medians (ADVICE r9: a sub-millisecond
    # entry rounded to 0.0 crashes log10 after all the timing work);
    # the epsilon clamp covers a true-zero perf_counter fluke too.
    slopes: dict[str, dict[str, float]] = {}
    for name, by_sf in results.items():
        sfs = sorted(by_sf, key=float)
        slopes[name] = {
            f"sf{a}->sf{b}": round(
                math.log10(max(by_sf[b], 1e-9) / max(by_sf[a], 1e-9))
                / math.log10(float(b) / float(a)),
                3,
            )
            for a, b in zip(sfs, sfs[1:])
        }
    results = {
        name: {sf: round(t, 3) for sf, t in by_sf.items()}
        for name, by_sf in results.items()
    }

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for f in os.listdir(here)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    ]
    nxt = (max(rounds) + 1) if rounds else 1
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "")
    out = os.path.join(here, f"SCALING_r{nxt:02d}{tag}.json")
    with open(out, "w") as fh:
        json.dump(
            {
                "times_sec": results,
                "slope_per_decade": slopes,
                "reps": reps,
                "config": {"master": f"local[{cpus}]",
                           "shuffle_partitions": cpus},
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    spark.stop()
    print(out)


if __name__ == "__main__":
    main()
