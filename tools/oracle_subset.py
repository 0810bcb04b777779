#!/usr/bin/env python3
"""Targeted oracle probe: verify a named subset of registry queries
against the DuckDB oracle at one or more sf dirs, on a plain session.

Usage: python tools/oracle_subset.py q274_streamed_curation_replay \
           q199_dedup_ingest_replay [--sf /root/testdata/sf0.01 ...]

The per-batch/per-change oracle re-check discipline from the r15/r16
optimization rounds, packaged so each edit batch can be certified
without a full-registry sweep.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf",
        action="append",
        default=None,
        help="sf dir (repeatable); default sf0.01 + sf0.001",
    )
    args = ap.parse_args()
    sf_dirs = args.sf or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.001",
    ]

    from oracle_harness import compare, duck_connection

    from pos_data_insertion_etl_spark.plans import all_queries
    from pos_data_insertion_etl_spark.session import get_session

    spark = get_session("oracle-subset")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    bad = 0
    for sf_dir in sf_dirs:
        con = duck_connection(sf_dir)
        for name in args.names:
            spec = registry[name]
            df = spec.spark(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                status = "ROWS-ONLY" if n > 0 else "EMPTY"
                if n == 0:
                    bad += 1
                print(f"{sf_dir.rsplit('/',1)[-1]} {name}: {status} ({n})")
                continue
            ok, msg = compare(df, con, spec.oracle)
            if not ok:
                bad += 1
            print(
                f"{sf_dir.rsplit('/', 1)[-1]} {name}: "
                f"{'GREEN' if ok else 'RED  ' + str(msg)[:300]}"
            )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
