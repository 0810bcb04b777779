"""End-to-end corpus curation: the LLM-pretraining data funnel as ONE
composed DataFrame pipeline.

    raw documents
      -> Gopher-rule heuristic gate      (expression-only, scan-bound)
      -> unigram-LM cross-entropy gate   (broadcast model, one token shuffle)
      -> exact dedup                     (sha2 digest groupBy)
      -> MinHash/LSH near-dup dedup      (band equi-joins, no all-pairs)
      -> per-shard sequence packing      (windowed running sum)

Stage ORDER is the scale design: the cheap row-wise gates run first so
everything that shuffles (dedup, packing) sees the smallest possible
corpus; the LM model is trained on the heuristic survivors (the
standard CCNet arrangement -- the reference model should not learn from
text the rules already reject).

Each stage is an already-tested operator (operators/quality.py,
operators/lm_score.py, operators/dedup.py); this module contributes the
composition and the per-stage funnel report. The reference has no
curation tier (its analytics delegate to stored procedures,
/root/reference/main.py:181-211); this is the engine's north-star
surface (SURVEY.md §2 LLM-pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators.dedup import exact_dedup, neardup_keepers
from ..operators.lm_score import unigram_lm_scores
from ..operators.quality import GOPHER_METRIC_COLS, gopher_quality_flags
from ..smallframe import values_frame


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_words: int = 100_000,
    stopwords: tuple[str, ...] | None = None,
    min_stopword_hits: int = 2,
    max_cross_entropy: float | None = None,
    lm_top_v: int = 1000,
    neardup_num: int = 1,
    neardup_den: int = 2,
    n_shards: int = 8,
    pack_budget: int = 256,
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation funnel.

    Returns ``(packed, funnel)``: ``packed`` assigns every surviving
    document to (shard, pack_id, offset_in_pack, n_tokens); ``funnel``
    is the per-stage [stage, stage_order, n_docs] report, populated
    from observe() metrics that fire on each stage's materialization
    (so the counts are exactly the rows the next stage consumed, and
    the report costs no extra pass over any stage).

    ``max_cross_entropy=None`` skips the LM gate's threshold but still
    scores (the scores ride along for downstream mixing decisions).
    """
    gopher_kwargs = dict(min_words=min_words, max_words=max_words,
                         min_stopword_hits=min_stopword_hits)
    if stopwords is not None:
        gopher_kwargs["stopwords"] = stopwords
    spark = docs.sparkSession
    # Gate in place (keep_input=True): the metrics are row-local
    # expressions, so filtering on them needs no flags-back-to-rows
    # self-join -- the gate stage is scan-bound with ZERO shuffles at
    # any corpus size (r10; it used to shuffle once on id_col).
    #
    # r15 optimization round, two moves per stage boundary:
    # * Lineage cut (eager): each stage table has several consumers (the
    #   LM model build, the LM scoring pass, the scores join, dedup, the
    #   next stage) -- without the cut each replayed the whole upstream
    #   funnel. One materialization per stage, block reads after.
    # * observe() on the cut: the funnel's per-stage document counts
    #   fire on the materialization job itself (the streaming/jobs.py
    #   pattern), so the old 5-legged count union -- whose 00_raw leg
    #   RE-SCANNED the raw corpus and whose 01 leg re-ran the gate --
    #   costs zero extra jobs. n_raw rides above the gate filter, so
    #   one job yields both the raw and the gated count.
    obs_gate = Observation()
    heuristic_ok = (
        gopher_quality_flags(
            docs, text_col, id_col, keep_input=True, **gopher_kwargs
        )
        .observe(
            obs_gate,
            F.count(F.lit(1)).alias("n_raw"),
            F.count_if(F.col("gopher_pass")).alias("n_gated"),
        )
        .filter(F.col("gopher_pass"))
        .drop(*GOPHER_METRIC_COLS)
        .localCheckpoint(eager=True)
    )
    # share_tokens stays OFF here (r16, VERDICT r15 item 5): the
    # option materializes the exploded token table so the LM model
    # build and scoring pass stop tokenizing the gated corpus twice,
    # but a same-session A/B at sf0.1 (4 pairs, bench_curation) showed
    # the checkpoint costs 0.1-0.5 s MORE than the saved tokenize pass
    # -- the gate blocks are cached and tokenize is cheap to replay.
    # On a real cluster where the gated corpus is expensive to rescan,
    # flip it on (the operator exposes it; results identical).
    scores = unigram_lm_scores(heuristic_ok, text_col, id_col, top_v=lm_top_v)
    scored = heuristic_ok.join(scores, id_col)
    lm_ok = (
        scored.filter(F.col("cross_entropy") <= max_cross_entropy)
        if max_cross_entropy is not None
        else scored
    )
    # On a real cluster with a 100 TB corpus you would persist this
    # boundary to durable storage instead of localCheckpoint; the plan
    # shape is identical (see lineage.cut_lineage for the switch).
    obs_lm = Observation()
    lm_ok = lm_ok.observe(
        obs_lm, F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)
    keepers_exact = exact_dedup(lm_ok, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    obs_exact = Observation()
    exact_ok = (
        lm_ok.join(keepers_exact, id_col)
        .observe(obs_exact, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    near = neardup_keepers(
        exact_ok,
        text_col,
        id_col,
        threshold_num=neardup_num,
        threshold_den=neardup_den,
    )
    obs_near = Observation()
    near_ok = (
        exact_ok.join(
            near.filter(F.col("keeper_id") == F.col("doc_id")).select(
                F.col("doc_id").alias(id_col)
            ),
            id_col,
        )
        .observe(obs_near, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )

    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = (
        near_ok.select(
            F.col(id_col),
            (F.col(id_col) % n_shards).alias("shard"),
            F.col("n_tokens"),
        )
        .withColumn("c", F.sum("n_tokens").over(w))
        .select(
            F.col(id_col),
            "shard",
            "n_tokens",
            F.expr(f"(c - n_tokens) div {pack_budget}").alias("pack_id"),
            ((F.col("c") - F.col("n_tokens")) % pack_budget).alias(
                "offset_in_pack"
            ),
        )
    )

    # The stage tables are already materialized (eager cuts above), so
    # every count is in hand from the observations -- the funnel is a
    # JVM VALUES literal (smallframe.values_frame: no Python-runner
    # spin-up on collect), row-identical to the old 5-way count union.
    gate_m = obs_gate.get
    rows = [
        ("00_raw", 0, int(gate_m["n_raw"])),
        ("01_gopher", 1, int(gate_m["n_gated"])),
        ("02_lm", 2, int(obs_lm.get["n"])),
        ("03_exact_dedup", 3, int(obs_exact.get["n"])),
        ("04_neardup", 4, int(obs_near.get["n"])),
    ]
    funnel = values_frame(
        spark, rows, "stage string, stage_order long, n_docs long"
    )
    return packed, funnel
