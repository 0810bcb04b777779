#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Noise discipline (round 4, tightened round 5): each headline query gets
ONE untimed warm-up execution (plan compilation, codegen, shuffle-file
and page-cache warming) followed by $SPARK_GRAFT_BENCH_REPS (default 3)
timed executions. When the observed spread exceeds 30% of the median
(the r4 q57/mart_pipeline failure mode), up to $SPARK_GRAFT_BENCH_MAX_EXTRA
(default 4) EXTRA reps are run so the median settles. `queries` reports
the per-query MEDIAN; `spread` is the max-min of the three
median-adjacent reps (identical to plain max-min at 3 reps) -- the
uncertainty OF THE MEDIAN, immune to a single straggler rep that
max-min over 7 reps would pin forever. `value` is the summed medians.
Session config is pinned explicitly (shuffle partitions =
$SPARK_GRAFT_CPUS) and echoed in the output. Regression criterion
across rounds: a shared query's MEDIAN >1.25x the prior round's median
is a regression; anything inside the larger of the two spreads is noise.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.plans import all_queries
from pos_data_insertion_etl_spark.session import get_session

# Representative mix: scan+agg, multiway join, window, fixed-width,
# dedup/LSH, similarity, event-time ops; widened in round 2 with shingle
# dedup, embedding near-dup, IVF ANN, two TPC-H shapes, and the real PNG
# codec path; round 3 adds the iterative clustering queries (q88
# synthetic topology, q90 full bands->verify->cluster pipeline) and the
# staged splittable zip ingest. Keep ordering stable across rounds for
# regression diffs.
HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_region_nation_revenue",
    "q06_revenue_forecast",
    "q16_topk_per_group",
    "q36_hourly_events",
    "q38_fixed_width_parse",
    "q39_combine_chunks",
    "q40_sessionize",
    "q50_dedup_exact",
    "q55_minhash_lsh",
    "q57_cosine_topk",
    "q54_ngram_jaccard",
    "q65_embedding_neardup",
    "q75_ann_ivf",
    "q67_big_customers",
    "q71_volume_by_year",
    "q60_image_decode_stats",
    # round 3 additions
    "q88_connected_components",
    "q90_neardup_pipeline",
    # round 3 continuation: TPC-H star profit + the equi-only range join
    "q101_product_profit",
    "q115_binned_range_join",
    # round 4 additions: the shuffling corpus-hygiene ops
    "q118_boilerplate_blocks",
    "q119_paragraph_dedup",
    # round 5 additions: seeded-plane LSH (JVM HOF fold per plane),
    # window-group-limit source cap, explode + map-side-combine int8 report
    "q124_ann_lsh_seeded",
    "q126_source_cap_sample",
    "q127_int8_quantize_error",
    # round 6 additions: HOF-heavy content-defined chunking, the
    # Arrow-batched MMR custom op, the two-phase global-sequence NTILE,
    # and the digest-keyed duplicate-n-gram shuffle
    "q146_cdc_chunks",
    "q148_mmr_diversified_topk",
    "q151_ce_decile_bins",
    "q154_dup_ngram_fraction",
    # round 7 additions: the bounded corpus-wide kNN graph (bucket
    # self-join + md5 candidate cap), the streaming TAR source, the
    # single-scan ExactSubstr duplicate-span extractor, the iterative
    # Lloyd k-means, the exact prefix-filter similarity join, and the
    # DSIR bucket-model scorer
    "q169_knn_graph_bounded",
    "q170_tar_fixed_width",
    "q179_duplicate_spans",
    "q182_kmeans_lloyd",
    "q189_setsim_prefix_join",
    "q198_dsir_weights",
    # round 7 batch I: the checkpointed-edge-list iterative BFS over the
    # 1.8M-edge co-purchase graph, and the explode + window + broadcast
    # retrieval-evaluation harness
    "q212_bfs_distances",
    "q215_retrieval_eval",
    # round 8 additions: the single-scan exact KS (distinct-value
    # window), the triple-NTILE RFM segmentation (three two-phase
    # global sequences), and the explode-heavy vocabulary profile
    "q232_ks_two_sample",
    "q237_rfm_segments",
    "q246_vocab_stats",
    # round 9 addition: the bucketed mart join (write-time shuffle,
    # zero-Exchange join+agg). q274 (streamed curation replay) was
    # excluded in r9 (~25 s FLAT of fixed multi-action replay
    # overhead); the r10 values_frame + observe() + shuffle-free-gate
    # rewrite collapsed that to ~5 s with a real data term
    # (SCALING_r10b slope 0.12, 7.1 s at sf1.0), so it is re-admitted
    # per VERDICT r9 item 5 -- the headline now covers the streamed
    # exactly-once ingest path too.
    "q274_streamed_curation_replay",
    "q275_bucketed_mart_join",
    # round 9 batch U: the two shuffle-strategy rewrites whose cost IS
    # the data path -- the salted skew join (events x replicated dim on
    # (key, salt)) and the Bloom semi-join prefilter (distributed
    # filter build + expression prefilter + broadcast verify). q276
    # (partition pruning) is NOT headline for the same reason as q274:
    # its wall-clock is the 80-directory temp partitioned WRITE of
    # orders (fixture build), not the pruned read being certified.
    "q277_salted_skew_join",
    "q278_bloom_semijoin_prefilter",
]


def _central_spread(runs: list[float]) -> float:
    """Max-min of the three median-adjacent values: the median's own
    uncertainty. Equals plain max-min for 3 reps."""
    s = sorted(runs)
    mid = len(s) // 2
    lo = max(0, mid - 1)
    window = s[lo : lo + 3] if len(s) >= 3 else s
    return max(window) - min(window)


def _timed_reps(fn, reps: int, max_extra: int) -> list[float]:
    """One untimed warm-up + `reps` timed runs; widen by up to
    `max_extra` reps while the spread exceeds 30% of the median."""
    fn()  # warm-up: compile + cache effects excluded from timing
    out = []

    def one() -> None:
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)

    for _ in range(reps):
        one()
    while (
        len(out) < reps + max_extra
        and _central_spread(out) > 0.3 * statistics.median(out)
    ):
        one()
    return out


#: Flips False the first time a pool clear fails (ADVICE r12): the
#: hygiene pass rides the private _jsc.getPersistentRDDs() surface, and
#: a silent failure after a Spark upgrade would quietly re-introduce
#: the measured ~0.7 s storage-pool tax and invalidate cross-round band
#: comparisons. The flag lands in the detail JSON as `pool_cleared`.
_POOL_CLEAR_OK = True


def _clear_block_pool(spark) -> None:
    """Unpersist every RDD still in the storage pool before timing the
    next entry. Entries that localCheckpoint (the two-phase global
    sequences, curation's lazy reuse cuts) leave their blocks behind
    until Python GC + the async ContextCleaner get around to them, so
    later entries pay a real, reproducible storage-pool tax that is
    NOT part of their own cost -- the round-12 q39 bracket measured it
    at ~0.7 s (isolated median 2.34 s vs 3.05 s after replaying the
    7-entry headline prefix, BRACKET_q39_r12.json). A real deployment
    runs one job per app and never inherits another query's blocks;
    clearing between entries times what the entry actually costs."""
    global _POOL_CLEAR_OK
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd_id in list(jmap.keys()):
            try:
                jmap[rdd_id].unpersist(False)
            except Exception:
                pass  # cleaner raced us; the block is gone either way
        spark.catalog.clearCache()
    except Exception as exc:
        # Hygiene only -- never fail the bench over it -- but never
        # fail SILENTLY either: warn once and flag the artifact.
        if _POOL_CLEAR_OK:
            print(
                "WARNING: storage-pool clear failed "
                f"({type(exc).__name__}: {exc}); timings include any "
                "inherited localCheckpoint blocks (~0.7 s tax measured "
                "in BRACKET_q39_r12.json). pool_cleared=false recorded.",
                file=sys.stderr,
            )
        _POOL_CLEAR_OK = False


def _calibration_probe(spark) -> dict:
    """Box-regime probe (VERDICT r13 item 4): 3 timed reps of a
    CONSTANT-shape query -- a 20M-row range -> hash-agg that touches no
    input data, no Python workers, and no disk -- run at bench start
    and end. Its wall-clock depends only on JVM/CPU/scheduler state, so
    a slow-box regime (the r13 64.7->77.7 s head-fake: ~1.2-1.5x
    uniform elevation across unrelated entries) shows up INSIDE the
    artifact as an elevated calibration median instead of costing a
    full bracket analysis to dismiss. Consumers ANNOTATE with it (see
    PLANS.md: compare calibration_{pre,post} medians against the
    recorded quiet-box band before reading per-entry bands); nothing is
    silently rescaled."""

    def one() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) as s", "count(1) as c"
        ).collect()
        return time.perf_counter() - t0

    one()  # warm-up, excluded
    reps = [round(one(), 4) for _ in range(3)]
    return {"reps": reps, "median": round(statistics.median(reps), 4)}


def bench_mart_pipeline(spark) -> float:
    """End-to-end POS mart pipeline (zip -> parse -> merged marts written
    as day-partitioned parquet), timed separately from fixture setup."""
    import shutil
    import tempfile

    from pos_data_insertion_etl_spark.pipeline.marts import run_pos_pipeline
    from tests.pos_fixture import build_fixture, write_zip

    tmp = tempfile.mkdtemp(prefix="bench_marts_")
    try:
        records, _ = build_fixture(
            n_days=20, stores=10, txns_per_store_day=10, lines_per_txn=5
        )
        zpath = os.path.join(tmp, "R520.20240301_214500.zip")
        write_zip(records, zpath)
        t0 = time.perf_counter()
        run_pos_pipeline(spark, zpath, out_dir=os.path.join(tmp, "marts"))
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_staged_ingest(spark) -> float:
    """Staged splittable zip ingest (serial decompress -> parquet chunk
    fan-out -> parallel scan), timed end to end including the staged
    copy -- the scale mechanism for one huge daily archive."""
    import shutil
    import tempfile

    from pos_data_insertion_etl_spark.sources.zipsource import (
        read_zip_fixed_width_staged,
    )
    from tests.pos_fixture import build_fixture, write_zip

    tmp = tempfile.mkdtemp(prefix="bench_staged_")
    try:
        records, _ = build_fixture(
            n_days=20, stores=10, txns_per_store_day=10, lines_per_txn=5
        )
        zpath = os.path.join(tmp, "R520.20240301_214500.zip")
        write_zip(records, zpath)
        t0 = time.perf_counter()
        staged = read_zip_fixed_width_staged(
            spark, zpath, os.path.join(tmp, "stage"), records_per_file=20_000
        )
        staged.count()
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_curation(spark, sf_dir: str) -> float:
    """End-to-end LLM curation funnel (Gopher gate -> unigram-LM gate ->
    exact + LSH near-dup dedup -> per-shard packing + funnel report) on
    the documents table -- the north-star composition, timed as a user
    would run it (both output actions)."""
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.pipeline.curation import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    packed, funnel = curate_corpus(
        docs,
        min_words=10,
        stopwords=("the", "a"),
        min_stopword_hits=1,
        max_cross_entropy=4.0,
    )
    packed.count()
    funnel.collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    max_extra = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA", "4"))
    # Route ALL Spark JVM logging to a file (VERDICT r7 item 5): the
    # driver parses the LAST ~2000 stdout bytes as the metric line, and
    # r7's capture opened with a DAGScheduler updateAccumulators stack
    # trace (a finished localCheckpoint stage reporting into a
    # cancelled SQL-metrics accumulator -- benign, but it races the
    # capture window). With a file appender nothing but this script
    # writes to stdout.
    import tempfile

    from pos_data_insertion_etl_spark.session import write_log4j_file_config

    spark_log = os.path.join(tempfile.gettempdir(), "bench_spark_jvm.log")
    # Pinned session config: shuffle partitions explicit, not inherited
    # from whatever session a prior tool left behind.
    spark = get_session(
        "pos-etl-bench",
        shuffle_partitions=cpus,
        log4j_config=write_log4j_file_config(spark_log),
    )
    # Console progress bars write to stderr, but suppress them anyway:
    # a bar racing JVM teardown is the one remaining writer that could
    # interleave with the final line on a combined-stream capture.
    try:
        spark.conf.set("spark.ui.showConsoleProgress", "false")
    except Exception:
        pass  # core conf not runtime-settable on this build

    registry = all_queries()

    # Warm the executor path and the parquet reader stack (footer reads,
    # filesystem metadata, codegen infra) before any timing.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pos_data_insertion_etl_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).select(F.lit(1)).limit(1).collect()

    bench_t0 = time.perf_counter()
    calibration_pre = _calibration_probe(spark)
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    # Mid-run box-regime visibility (VERDICT r14 item 3): the r14 run
    # had calibration_pre 0.233 -> post 0.117, so a regime change
    # DURING the run (exactly when q169's 8x excursion happened) was
    # only inferable, never measured. Two additions: (a) every entry
    # records its start offset from bench start (`t_start`, seconds),
    # so an excursion can be located against (b) an interleaved
    # calibration probe every CAL_EVERY headline entries
    # (`calibration_mid`: list of {after, offset_sec, reps, median}).
    # Consumption rule in PLANS.md: bracket an excursion only when the
    # nearest calibration median is inside the quiet band.
    CAL_EVERY = 12
    calibration_mid: list[dict] = []
    t_start: dict[str, float] = {}
    for i, name in enumerate(HEADLINE):
        if i and i % CAL_EVERY == 0:
            probe = _calibration_probe(spark)
            probe.update(
                after=HEADLINE[i - 1],
                offset_sec=round(time.perf_counter() - bench_t0, 1),
            )
            calibration_mid.append(probe)
        spec = registry[name]
        _clear_block_pool(spark)
        t_start[name] = round(time.perf_counter() - bench_t0, 1)
        runs = _timed_reps(
            lambda: spec.spark(spark, sf_dir).collect(), reps, max_extra
        )
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = round(_central_spread(runs), 3)
    for name, fn in (
        ("mart_pipeline_e2e", lambda: bench_mart_pipeline(spark)),
        ("staged_ingest_e2e", lambda: bench_staged_ingest(spark)),
        # round 5: the curation-funnel composition
        ("curation_e2e", lambda: bench_curation(spark, sf_dir)),
    ):
        # e2e benches time only their pipeline body (fixture setup is
        # outside their internal timer), so run them reps+1 times, first
        # run as warm-up, widening like the query reps while noisy.
        _clear_block_pool(spark)
        t_start[name] = round(time.perf_counter() - bench_t0, 1)
        runs = [fn() for _ in range(reps + 1)][1:]
        while (
            len(runs) < reps + max_extra
            and _central_spread(runs) > 0.3 * statistics.median(runs)
        ):
            runs.append(fn())
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = round(_central_spread(runs), 3)

    calibration_post = _calibration_probe(spark)
    total = round(sum(timings.values()), 3)
    # The driver captures only the LAST ~2000 bytes of stdout (VERDICT
    # r6: the r6 line with per-query spreads + config outgrew that and
    # BENCH_r06.json came back unparsed). Print a COMPACT line --
    # metric/value/queries/sf only, tight separators, 2-dp timings --
    # and write the full detail (spreads, config, reps) to a committed
    # BENCH_DETAIL_r{N}.json next to this file.
    line = json.dumps(
        {
            "metric": "headline_queries_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in timings.items()},
            "sf": sf_val,
        },
        separators=(",", ":"),
    )
    detail = {
        "value": total,
        "queries": timings,
        "spread": spread,
        "calibration_pre": calibration_pre,
        "calibration_mid": calibration_mid,
        "calibration_post": calibration_post,
        "t_start": t_start,
        "pool_cleared": _POOL_CLEAR_OK,
        "reps": reps,
        "config": {
            "master": f"local[{cpus}]",
            "shuffle_partitions": cpus,
            "aqe": True,
        },
        "sf": sf_val,
        "printed_line_bytes": len(line),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    # Round label (VERDICT r8 item 3 correction): derive from BENCH_r*
    # files, NOT CORRECTNESS_r* -- the driver writes CORRECTNESS before
    # it benches, so a CORRECTNESS-derived label runs one round ahead
    # (the committed BENCH_DETAIL_r09.json actually holds the round-8
    # driver bench; see PLANS.md provenance note). The driver records
    # its parsed bench as BENCH_r{N}.json AFTER this process exits, so
    # max(BENCH_r*)+1 is exactly the round this run belongs to.
    rounds = [
        int(m.group(1))
        for f in os.listdir(here)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    ]
    nxt = (max(rounds) + 1) if rounds else 1
    # Provenance naming (VERDICT r7 item 6): the driver's own run owns
    # the bare BENCH_DETAIL_r{N}; builder-side interim runs must set
    # SPARK_GRAFT_BENCH_TAG (e.g. "b") so their detail file never
    # shadows or post-dates the driver artifact of the same round.
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "")
    with open(
        os.path.join(here, f"BENCH_DETAIL_r{nxt:02d}{tag}.json"), "w"
    ) as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    if len(line) > 1800:  # keep headroom under the 2000-byte window
        print(
            f"WARNING: bench line is {len(line)} bytes; trim HEADLINE "
            "or shorten keys before the driver capture truncates it.",
            file=sys.stderr,
        )
    # Tear the JVM down BEFORE printing: any shutdown-time log noise
    # (executor reaper, accumulator warnings) lands ahead of -- never
    # after -- the metric line, so the driver's tail capture always
    # ends with parseable JSON.
    spark.stop()
    sys.stdout.flush()
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
