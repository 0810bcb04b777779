#!/usr/bin/env python3
"""Correctness at the BENCH scale, not just speed (VERDICT r10 item 5).

The driver's oracle gate runs at sf0.01; sf1.0 (``.benchdata/sf1.0``,
tools/make_sf1_benchdata.py) has only ever been timed. This script
certifies the heavy dedup/similarity answers AT sf1.0 two independent
ways:

1. **Exact oracle equality at sf1.0** -- the five names VERDICT r10
   called out (q50, q119, q135, q189, q90) run through the SAME
   DuckDB-oracle comparison the local harness uses at sf0.01, but on
   the sf1.0 parquet. An at-scale bug the sf0.01 gate cannot see
   (overflow past a threshold, a cap silently truncating, a skew path
   activating incorrectly) breaks exact equality here.
2. **Designed x10 closed forms** -- the generator replicates sf0.1 ten
   key-remapped, text-decorrelated ways, so for copy-local answers the
   sf1.0 summary MUST be exactly 10x the sf0.1 summary: q50's
   n_copies histogram, q90's cluster-size histogram, q189's pair
   count + jaccard histogram, q119's total paragraph count. A
   prerequisite check proves the design's premise on the actual data:
   ZERO sf0.1 texts are fixed points of the copy transform (all
   tokens stopword/empty), so no cross-copy text ever collides.
   (q135 is exact-checked only: its batch-1 split is ``doc_id < 250``,
   which at sf1.0 is copy 0 only -- structurally not a x10 shape.)

Round 12 (VERDICT r11 item 3) widens axis 1 to the ITERATIVE/STATEFUL
family -- the operators whose BEHAVIOR changes with scale (round
counts, convergence, per-batch state): q212 (iterative BFS over the
co-purchase graph), q182 (Lloyd k-means over embeddings), q274
(streamed curation replay with carried digest state), q141 (fixed-
point PageRank), q192 (k-core peeling). Each runs exact DuckDB-oracle
equality at sf1.0 -- their oracles unroll the same number of rounds by
contract, so any scale-dependent divergence (an extra iteration, a
skew path changing results, replay instability at 10x state) breaks
the hash.

Writes SCALE_CORRECTNESS_r{N}.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from collections import Counter  # noqa: E402

from pos_data_insertion_etl_spark.plans import all_queries  # noqa: E402
from pos_data_insertion_etl_spark.session import get_session  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get(
    "SPARK_GRAFT_SF1_OUT", os.path.join(_REPO, ".benchdata", "sf1.0")
)
OUT = os.environ.get(
    "SPARK_GRAFT_SCALE_OUT", os.path.join(_REPO, "SCALE_CORRECTNESS_r15.json")
)

EXACT_NAMES = [
    "q50_dedup_exact",
    "q119_paragraph_dedup",
    "q135_incremental_exact_dedup",
    "q189_setsim_prefix_join",
    "q90_neardup_pipeline",
    # r12: the iterative/stateful family (exact-only -- their outputs
    # are not copy-local, so no x10 closed form applies; see _summaries)
    "q212_bfs_distances",
    "q182_kmeans_lloyd",
    "q274_streamed_curation_replay",
    "q141_pagerank",
    "q192_kcore",
    # r12 widening 2: the remaining heavy bench families with
    # linear-cost oracles -- sketch/signature (q55), n-gram explode
    # (q154, q246), window-cascade analytics (q237), and the
    # retrieval-eval join stack (q215). Exact-only, same rationale.
    "q55_minhash_lsh",
    "q154_dup_ngram_fraction",
    "q237_rfm_segments",
    "q246_vocab_stats",
    "q215_retrieval_eval",
    # r12 widening 3: the multimodal mapInPandas codec path (real PNG
    # encode->decode->resize->dHash over 10x the documents) -- the one
    # Python/Arrow family the at-scale gate had not yet touched.
    "q98_image_phash_dedup",
    "q60_image_decode_stats",
    # r12 widening 4: the streaming/windowing/chunking family -- q289
    # is a REAL two-batch watermark replay whose append-mode emission
    # must hash-match the closed form at 10x state; q40's session
    # windows and q146's recursive-CTE chunk oracle stress DuckDB as
    # much as Spark.
    "q289_watermark_late_data",
    "q36_hourly_events",
    "q40_sessionize",
    "q146_cdc_chunks",
    "q179_duplicate_spans",
    # r12 widening 5: the warehouse-ETL family -- MERGE upsert, SCD2
    # interval build, incremental rollup merge (oracle = full
    # recompute, the merge-algebra proof at 10x), snapshot-diff CDC
    # classes, and the as-of join.
    "q108_upsert_merge",
    "q110_scd2_dimension",
    "q111_incremental_rollup",
    "q113_snapshot_diff",
    "q43_asof_join",
    # r12 widening 6: relational + Spark-4 surfaces. q97's recursive
    # CTE is the sweep's second real catch: it hit Spark's default 1M
    # recursion ROW cap at sf1.0 (RECURSION_ROW_LIMIT_EXCEEDED); the
    # cap is a data-size guard that cannot scale, so session.py now
    # raises it to 1e9 and keeps the LEVEL limit as the runaway guard.
    # q01 is deliberately EXCLUDED: at sf1.0 its double-typed sums
    # diverge from DuckDB by one ULP (addition-order associativity at
    # 10x rows) -- a measured boundary of hash-exact comparison for
    # float aggregates, not an engine defect; the fixed-point/integer
    # operators the engine uses for its own exactness claims are
    # unaffected.
    "q67_big_customers",
    "q97_recursive_order_chain",
    "q287_variant_json_stats",
    "q288_collated_group",
    # r14 widening (VERDICT r13 item 6): the thinly-sampled families --
    # stats/drift (rank-correlation, concentration, changepoint),
    # blocking/heavy-hitter replay, the wav mapInPandas codec, and both
    # packing shapes.
    "q233_spearman_daily",
    "q234_gini_revenue",
    "q239_cusum_drift",
    "q210_sorted_neighborhood",
    "q211_heavyhitter_monitor_replay",
    "q99_audio_fingerprint_dedup",
    "q160_pack_nosplit",
    "q161_pack_efficiency",
    # r15 widening (VERDICT r14 item 5): the families the sweep still
    # sampled thinly -- survival and timeseries (first sf1.0 names for
    # operators/survival.py and timeseries.py), itemsets and exact
    # heavy-hitters beyond the q211 replay, the PNG resize codec path,
    # fuzzy blocking join, and PII scrubbing.
    "q268_kaplan_meier",
    "q264_permutation_entropy",
    "q185_ewma_dyadic",
    "q188_copurchase_pairs",
    "q138_heavy_hitters",
    "q61_image_resize_stats",
    "q204_fuzzy_name_join",
    "q117_pii_scrub",
]

#: space-separated subset override for iterating on new names without
#: re-running the whole (expensive) list.
if os.environ.get("SPARK_GRAFT_SCALE_NAMES"):
    EXACT_NAMES = os.environ["SPARK_GRAFT_SCALE_NAMES"].split()

_GATE_STOPWORDS = ("the", "a")


def _invariant_text_count(con) -> int:
    """sf0.1 texts fixed by the copy transform (every single-space
    token empty or a gate stopword): the cross-copy collision mass.
    Must be 0 for the x10 closed forms to be exact."""
    sw = ", ".join(f"'{w}'" for w in _GATE_STOPWORDS)
    return con.execute(
        "SELECT COUNT(*) FROM documents WHERE len(list_filter("
        f"string_split(text, ' '), x -> x != '' AND x NOT IN ({sw}))) = 0"
    ).fetchone()[0]


def _hist(rows, keyfn) -> dict:
    return dict(Counter(keyfn(r) for r in rows))


def _summaries(name: str, rows) -> dict:
    """Copy-invariant summaries whose sf1.0 value must be exactly 10x
    the sf0.1 value (keeper/doc ids differ per copy; these don't)."""
    if name == "q50_dedup_exact":
        return {"n_copies_hist": _hist(rows, lambda r: int(r.n_copies))}
    if name == "q90_neardup_pipeline":
        sizes = Counter(r.keeper_id for r in rows)
        return {"cluster_size_hist": dict(Counter(sizes.values()))}
    if name == "q189_setsim_prefix_join":
        return {
            "n_pairs": len(rows),
            "jaccard_hist": _hist(rows, lambda r: float(r.jaccard)),
        }
    if name == "q119_paragraph_dedup":
        return {
            "n_docs": len(rows),
            "total_paras": sum(int(r.n_paras) for r in rows),
        }
    return {}


def _times_ten(sf01: dict, sf1: dict) -> list[str]:
    """Mismatch descriptions; empty = every summary is exactly 10x."""
    errs = []
    for key, v01 in sf01.items():
        v1 = sf1.get(key)
        if isinstance(v01, dict):
            want = {k: 10 * v for k, v in v01.items()}
            if v1 != want:
                errs.append(f"{key}: sf1={v1} != 10x sf0.1={want}")
        else:
            if v1 != 10 * v01:
                errs.append(f"{key}: sf1={v1} != 10*{v01}")
    return errs


def main() -> None:
    from oracle_harness import compare, duck_connection

    assert os.path.isdir(SF1), (
        f"{SF1} missing -- run tools/make_sf1_benchdata.py first"
    )
    registry = all_queries()
    spark = get_session("pos-etl-scale-correctness", shuffle_partitions=32)
    out: dict = {"sf01": SF01, "sf1": SF1, "exact": {}, "times10": {}}

    con01 = duck_connection(SF01)
    con1 = duck_connection(SF1)
    # Fail fast instead of filling the disk: the un-hinted q212 oracle
    # (pre-MATERIALIZED, r12) spilled >79 GB of DuckDB temp and took
    # the box down mid-run. Any oracle needing more than this at sf1.0
    # is a bug to fix, not a spill to absorb.
    con1.execute("SET max_temp_directory_size='40GiB'")

    inv = _invariant_text_count(duck_connection(SF01))
    out["invariant_texts_sf01"] = inv
    print(f"copy-transform fixed-point texts at sf0.1: {inv}", flush=True)
    assert inv == 0, "x10 closed forms need zero cross-copy collisions"

    for name in EXACT_NAMES:
        spec = registry[name]
        t0 = time.perf_counter()
        # 1. exact oracle equality at sf1.0 (the at-scale gate)
        ok, msg = compare(spec.spark(spark, SF1), con1, spec.oracle)
        sec = round(time.perf_counter() - t0, 1)
        out["exact"][name] = {"ok": bool(ok), "sec": sec}
        if not ok:
            out["exact"][name]["err"] = str(msg)[:500]
        print(
            f"  exact@sf1.0 {name}: {'GREEN' if ok else 'RED ' + str(msg)[:200]}"
            f" ({sec}s)",
            flush=True,
        )
        # 2. designed x10 closed form (only where the output is
        # copy-local: q135 and the iterative/stateful family are
        # exact-checked only -- _summaries returns {} for them)
        if not _summaries(name, []):
            continue
        s01 = _summaries(name, spec.spark(spark, SF01).collect())
        s1 = _summaries(name, spec.spark(spark, SF1).collect())
        errs = _times_ten(s01, s1)
        out["times10"][name] = {
            "ok": not errs,
            "sf01": {k: (v if not isinstance(v, dict) else len(v))
                     for k, v in s01.items()},
        }
        if errs:
            out["times10"][name]["errs"] = errs
        print(
            f"  x10 {name}: {'GREEN' if not errs else 'RED ' + '; '.join(errs)[:300]}",
            flush=True,
        )

    spark.stop()
    # MERGE into the artifact: the closed-form >=10x witnesses
    # (tools/closed_form_scale.py) share the same file since round 13.
    merged = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as fh:
                merged = json.load(fh)
        except ValueError:
            merged = {}
    merged.update(out)
    with open(OUT, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(f"wrote {OUT}", flush=True)
    bad = [n for n, r in out["exact"].items() if not r["ok"]] + [
        n for n, r in out["times10"].items() if not r["ok"]
    ]
    if bad:
        print(f"FAILURES: {bad}", flush=True)
        sys.exit(1)
    print("SCALE CORRECTNESS OK", flush=True)


if __name__ == "__main__":
    main()
