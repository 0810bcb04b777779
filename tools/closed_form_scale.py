#!/usr/bin/env python3
"""Closed-form at-scale exactness PAST sf1.0 (VERDICT r12 item 1).

The sf1.0 sweep (tools/scale_correctness.py) is bounded by DuckDB
oracle cost; these witnesses are not -- each generates a synthetic
shape whose EXACT answer is known in closed form, at >=10x the current
bench scale (sf10-equivalent row counts: orders 15M, lineitem-ish 60M,
events 10M, plus 10-30M-node graphs), and asserts bit-exact equality.
Any mismatch is a bug by definition: the r12 pattern that caught q97's
recursion row cap and q212's exponential oracle, pushed a decade
further.

Witnesses (all exact, no tolerance):

* cc_forest_30m   -- 30.72M-node path forest (1024-node segments)
                     through the public connected_components default:
                     row count, component count, sum of labels.
* cc_giant_path_10m -- a SINGLE 10M-node path through the default API
                     (the r11 DNF shape at 3.3x the regression test's
                     size): every node must label 0.
* recursive_chain_15m -- the REAL q97 callable over a synthetic
                     15M-row orders table (500k customers x 30 orders,
                     10x sf1.0): exercises the data-sized scoped
                     recursion cap at 15x Spark's stock 1M limit;
                     count / sum(depth) / max(depth) closed forms.
* global_sequence_60m -- with_global_sequence over 60M reverse-keyed
                     rows: the dense sequence must equal n-1-id on
                     EVERY row (per-row closed form, zero violations).
* packing_2m      -- greedy_pack_no_split over 2M uniform 7-token docs
                     at budget 35: pack_id/pos_in_pack have per-row
                     closed forms ((id div shards) div 5, % 5).
* hourly_windows_10m -- the REAL q36 callable over synthetic events at
                     1 Hz (10.08M rows, 10x sf1.0): every (hour, type)
                     cell holds exactly 900 events / 450.00 value /
                     900 users.
* dedup_60m       -- exact_dedup over 60M rows with 6M distinct texts:
                     keeper histogram is exactly {10: 6M} and keeper
                     ids are exactly 0..6M-1 (sum closed form).

Fixed-data-size-cap audit (the sibling hunt the item prescribes) is
recorded in the artifact: the only engine conf cap was q97's recursion
row limit (now input-sized + scoped, round 13); the remaining numeric
guards are O(partitions) / summary-sized driver guards or loud-raise
iteration bounds -- none silently truncates data.

Merges results into SCALE_CORRECTNESS_r13.json under
``closed_form_10x`` (run tools/scale_correctness.py first if you want
the sf1.0 exact section in the same artifact).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from pos_data_insertion_etl_spark.operators.combine import (  # noqa: E402
    with_global_sequence,
)
from pos_data_insertion_etl_spark.operators.dedup import exact_dedup  # noqa: E402
from pos_data_insertion_etl_spark.operators.graph import (  # noqa: E402
    connected_components,
)
from pos_data_insertion_etl_spark.operators.packing import (  # noqa: E402
    greedy_pack_no_split,
)
from pos_data_insertion_etl_spark.plans import all_queries  # noqa: E402
from pos_data_insertion_etl_spark.session import get_session  # noqa: E402

OUT = os.environ.get(
    "SPARK_GRAFT_CLOSED_OUT", os.path.join(_REPO, "SCALE_CORRECTNESS_r13.json")
)
#: Scale knob for quick smoke runs (tests use 0.01); 1.0 = the real
#: sf10-equivalent witness sizes.
SCALE = float(os.environ.get("SPARK_GRAFT_CLOSED_SCALE", "1.0"))

SEG = 1024  # nodes per path segment (executor_kill_check's shape)


def _snap(n: float, mult: int) -> int:
    return max(mult, int(n) // mult * mult)


def w_cc_forest(spark) -> dict:
    n = _snap(30_720_000 * SCALE, SEG)
    m = n // SEG
    edges = (
        spark.range(n)
        .filter((F.col("id") % SEG) != SEG - 1)
        .repartition(64)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    cc = connected_components(edges, driver_threshold=0)
    row = cc.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("component").alias("ncomp"),
        F.sum("component").alias("sumcomp"),
    ).collect()[0]
    got = [int(row.rows), int(row.ncomp), int(row.sumcomp)]
    exp = [n, m, SEG * SEG * m * (m - 1) // 2]
    return {"n_rows": n, "expected": exp, "got": got, "ok": got == exp}


def w_cc_giant_path(spark) -> dict:
    n = _snap(10_000_000 * SCALE, 1000)
    path = (
        spark.range(n - 1)
        .repartition(64)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    cc = connected_components(path, driver_threshold=0)
    row = cc.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("component") != 0, 1).otherwise(0)).alias("bad"),
    ).collect()[0]
    got = [int(row.rows), int(row.bad)]
    exp = [n, 0]
    return {"n_rows": n, "expected": exp, "got": got, "ok": got == exp}


def w_recursive_chain(spark) -> dict:
    C = _snap(500_000 * SCALE, 100)
    K = 30
    n = C * K
    tmp = tempfile.mkdtemp(prefix="graft_cf_orders_")
    try:
        # Interleaved custkeys (id % C) so the chain join shuffles like
        # real data; order-in-chain is the date index (id // C).
        orders = (
            spark.range(n)
            .repartition(64)
            .select(
                F.col("id").alias("o_orderkey"),
                (F.col("id") % C).alias("o_custkey"),
                F.lit("O").alias("o_orderstatus"),
                F.lit(100.0).alias("o_totalprice"),
                F.timestamp_seconds(
                    F.lit(1704067200) + (F.col("id") / C).cast("long") * 86400
                ).alias("o_orderdate"),
                F.lit("1-URGENT").alias("o_orderpriority"),
            )
        )
        orders.write.mode("overwrite").parquet(
            os.path.join(tmp, "orders.parquet")
        )
        q97 = all_queries()["q97_recursive_order_chain"].spark
        df = q97(spark, tmp)
        row = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("depth").alias("sdepth"),
            F.max("depth").alias("mdepth"),
            F.countDistinct("custkey").alias("ncust"),
        ).collect()[0]
        got = [int(row.rows), int(row.sdepth), int(row.mdepth), int(row.ncust)]
        exp = [n, C * K * (K + 1) // 2, K, C]
        # The scoped cap must be GONE again after the callable ran.
        cap = spark.conf.get("spark.sql.cteRecursionRowLimit")
        return {
            "n_rows": n,
            "expected": exp,
            "got": got,
            "cap_after": cap,
            "ok": got == exp and cap == "1000000",
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def w_global_sequence(spark) -> dict:
    n = _snap(60_000_000 * SCALE, 1000)
    df = (
        spark.range(n)
        .repartition(64)
        .select("id", (F.lit(n - 1) - F.col("id")).alias("key"))
    )
    seq = with_global_sequence(df, ["key"])
    row = seq.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(F.col("_seq") != F.lit(n - 1) - F.col("id"), 1).otherwise(0)
        ).alias("bad"),
    ).collect()[0]
    got = [int(row.rows), int(row.bad)]
    exp = [n, 0]
    return {"n_rows": n, "expected": exp, "got": got, "ok": got == exp}


def w_packing(spark) -> dict:
    n = _snap(2_000_000 * SCALE, 64 * 5)
    shards = 64
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta").alias("text"),
    )
    packed = greedy_pack_no_split(
        docs, pack_budget=35, n_shards=shards
    )  # 7 tokens, budget 35 -> exactly 5 docs per pack
    j = F.expr(f"doc_id div {shards}")
    row = packed.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.when(
                (F.col("pack_id") != (j / 5).cast("long"))
                | (F.col("pos_in_pack") != j % 5)
                | (F.col("n_tokens") != 7),
                1,
            ).otherwise(0)
        ).alias("bad"),
    ).collect()[0]
    got = [int(row.rows), int(row.bad)]
    exp = [n, 0]
    return {"n_rows": n, "expected": exp, "got": got, "ok": got == exp}


def w_hourly_windows(spark) -> dict:
    hours = _snap(2800 * SCALE, 4)
    n = 3600 * hours
    tmp = tempfile.mkdtemp(prefix="graft_cf_events_")
    try:
        ev = (
            spark.range(n)
            .repartition(64)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias(
                    "ts"
                ),
                F.col("id").alias("user_id"),
                F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias(
                    "event_type"
                ),
                F.lit(0.5).alias("value"),
                F.lit("{}").alias("props"),
            )
        )
        ev.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
        q36 = all_queries()["q36_hourly_events"].spark
        df = q36(spark, tmp)
        row = df.agg(
            F.count(F.lit(1)).alias("cells"),
            F.min("n_events").alias("mn"),
            F.max("n_events").alias("mx"),
            F.sum("n_events").alias("tot"),
            F.min("total_value").alias("vmn"),
            F.max("total_value").alias("vmx"),
            F.min("n_users").alias("umn"),
            F.max("n_users").alias("umx"),
        ).collect()[0]
        got = [
            int(row.cells), int(row.mn), int(row.mx), int(row.tot),
            float(row.vmn), float(row.vmx), int(row.umn), int(row.umx),
        ]
        exp = [hours * 4, 900, 900, n, 450.0, 450.0, 900, 900]
        return {"n_rows": n, "expected": exp, "got": got, "ok": got == exp}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def w_dedup(spark) -> dict:
    n = _snap(60_000_000 * SCALE, 1000)
    d = n // 10
    df = (
        spark.range(n)
        .repartition(64)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("the quick brown fox document "),
                (F.col("id") % d).cast("string"),
            ).alias("text"),
        )
    )
    kept = exact_dedup(df, "text", "doc_id")
    row = kept.agg(
        F.count(F.lit(1)).alias("groups"),
        F.min("n_copies").alias("mn"),
        F.max("n_copies").alias("mx"),
        F.sum("n_copies").alias("tot"),
        F.sum("keeper_id").alias("ksum"),
    ).collect()[0]
    got = [
        int(row.groups), int(row.mn), int(row.mx),
        int(row.tot), int(row.ksum),
    ]
    # keepers are min-id per text = ids 0..d-1 exactly
    exp = [d, 10, 10, n, d * (d - 1) // 2]
    return {"n_rows": n, "expected": exp, "got": got, "ok": got == exp}


WITNESSES = [
    ("cc_forest_30m", w_cc_forest),
    ("cc_giant_path_10m", w_cc_giant_path),
    ("recursive_chain_15m", w_recursive_chain),
    ("global_sequence_60m", w_global_sequence),
    ("packing_2m", w_packing),
    ("hourly_windows_10m", w_hourly_windows),
    ("dedup_60m", w_dedup),
]

CAPS_AUDIT = (
    "grep sweep over session confs + operator knobs (round 13): the only "
    "engine-conf data-size cap was spark.sql.cteRecursionRowLimit (q97), "
    "now input-sized and plan-scoped; remaining numeric guards are "
    "O(partitions) driver guards (combine.with_global_sequence), "
    "summary-sized guards (quantiles._DRIVER_GUARD on compressed "
    "summaries), loud-raise iteration bounds (graph max_iter), or "
    "semantic top-k limits -- none silently truncates data at scale."
)


def main() -> None:
    spark = get_session("closed-form-scale", shuffle_partitions=64)
    results: dict = {}
    for name, fn in WITNESSES:
        t0 = time.perf_counter()
        rec = fn(spark)
        rec["wall_sec"] = round(time.perf_counter() - t0, 1)
        results[name] = rec
        print(f"{name}: ok={rec['ok']} n={rec['n_rows']} "
              f"wall={rec['wall_sec']}s got={rec['got']}", flush=True)
    n_ok = sum(1 for r in results.values() if r["ok"])
    merged = {}
    if os.path.exists(OUT):
        try:
            with open(OUT, encoding="utf-8") as fh:
                merged = json.load(fh)
        except ValueError:
            merged = {}
    merged["closed_form_10x"] = {
        "scale": SCALE,
        "witnesses": results,
        "n_ok": n_ok,
        "n_total": len(results),
        "caps_audit": CAPS_AUDIT,
    }
    with open(OUT, "w", encoding="utf-8") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(f"{n_ok}/{len(results)} closed-form witnesses ok -> {OUT}",
          flush=True)
    spark.stop()
    if n_ok != len(results):
        sys.exit(1)


if __name__ == "__main__":
    main()
