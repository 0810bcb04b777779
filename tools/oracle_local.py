#!/usr/bin/env python3
"""Generate ORACLE_LOCAL_r{N}.json: a committed, per-query
machine-readable record of the LOCAL oracle replica over the FULL query
registry (the driver's CORRECTNESS file caps at the first 50
insertion-order entries of queries(), so the registry tail would
otherwise ride on pytest alone). Same shape as the driver artifact:
rows/schema/hash matches per query; rows-only queries (no oracle SQL)
record a non-empty row count.

Run: python tools/oracle_local.py <round> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from oracle_harness import canon_rows, duck_connection  # noqa: E402

from pos_data_insertion_etl_spark.plans import all_queries  # noqa: E402
from pos_data_insertion_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_session("oracle-local")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    out: dict[str, dict] = {}
    for name, spec in sorted(all_queries().items()):
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = spec.spark(spark, sf_dir)
            srows = df.collect()
            rec["spark_rows"] = len(srows)
            if spec.oracle is None:
                # rows-only check (driver's weaker gate); structural
                # invariants live in tests/test_oracle_queries.py
                rec["rows_match"] = len(srows) > 0
                rec["schema_match"] = None
                rec["hash_match"] = None
            else:
                res = con.execute(spec.oracle)
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(df.columns) == sorted(ocols)
                if rec["rows_match"] and rec["schema_match"]:
                    s = canon_rows(df.columns, [tuple(r) for r in srows])
                    o = canon_rows(ocols, orows)
                    rec["hash_match"] = s == o
        except Exception as e:  # record, don't abort the sweep
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        out[name] = rec
        tag = (
            "OK"
            if rec["hash_match"]
            else ("rows-only OK" if rec["rows_match"] and rec["hash_match"] is None else "FAIL")
        )
        print(f"{name}: {tag}", file=sys.stderr)

    path = os.path.join(REPO, f"ORACLE_LOCAL_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    n_hash = sum(1 for r in out.values() if r["hash_match"])
    n_rows_only = sum(1 for r in out.values() if r["hash_match"] is None and r["rows_match"])
    n_fail = len(out) - n_hash - n_rows_only
    print(f"wrote {path}: {n_hash} hash-green, {n_rows_only} rows-only green, {n_fail} failing")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
