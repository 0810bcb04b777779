#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named registry queries to
plans/<dir>/<query>_<tag>.txt (the optimization-round before/after
evidence files).

Run: python tools/dump_plan.py r16 before q189_setsim_prefix_join [...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pos_data_insertion_etl_spark.plans import all_queries
    from pos_data_insertion_etl_spark.session import get_session

    spark = get_session("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    dest = os.path.join(REPO, "plans", out_dir)
    os.makedirs(dest, exist_ok=True)
    for name in names:
        df = registry[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(dest, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        txt = buf.getvalue()
        print(
            f"{name}: Exchanges={txt.count('Exchange')} "
            f"Generates={txt.count('Generate')} -> {path}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
