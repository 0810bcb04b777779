"""Physical-plan invariants as CI assertions (not just PLANS.md
evidence): join strategies, pushdown, and pruning regressions fail tests
instead of needing a judge to read explain output.

Three contracts:
* no nested-loop join anywhere in the registry except an explicit,
  reasoned allow-list (tiny-broadcast scalars, deliberate cross joins,
  documented oracle stand-ins);
* filtered parquet scans carry non-empty PushedFilters (predicates reach
  the scan, they are not evaluated post-materialization);
* projection pruning reaches the scan (ReadSchema excludes untouched
  wide columns).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pos_data_insertion_etl_spark.plans import all_queries

QUERIES = all_queries()

# Queries whose executed plan legitimately contains a
# BroadcastNestedLoopJoin, each with the reason it is the RIGHT plan.
ALLOWED_BNLJ = {
    # a deliberate cross join of two broadcast-small dimensions
    "q12_cross_join": "cross join is the query's semantics",
    # single-row scalar (retention cutoff) broadcast against the table
    "q37_retention_filter": "1-row cutoff scalar broadcast",
    # pure range predicate with a broadcast-small build side -- the
    # intended plan for a non-equi range join
    "q42_range_join": "range join, small side broadcast",
    # tiny query set (10 vectors) broadcast against one corpus scan
    "q57_cosine_topk": "broadcast query set x corpus scan by design",
    # documented id-gap oracle stand-in; the scale pair source is the
    # LSH band equi-join (q55 / q90_neardup_pipeline)
    "q74_minhash_estimate": "id-gap stand-in, see q90 for scale path",
    # broadcast centroid table for cluster assignment
    "q75_ann_ivf": "broadcast centroids for assignment",
    # same broadcast-centroid ranking, probing nprobe cells per query
    "q125_ann_ivf_nprobe": "broadcast centroids for assignment + probe",
    # single-row corpus-size scalar broadcast into the tf-idf weights
    "q81_tfidf_topterms": "1-row corpus scalar broadcast",
    # single-row global-total scalar broadcast into the HAVING filter
    # (q104's argmax equality, by contrast, collapses to an equi join)
    "q102_value_concentration": "1-row global-total scalar broadcast",
    # referential rule row: 1-row total-count scalar broadcast
    "q109_quality_report": "1-row total-count scalar broadcast",
    # unigram LM: 1-row (N, V) totals + OOV log-prob scalar broadcasts
    "q129_unigram_lm_ce": "1-row model-totals scalar broadcasts",
    # bigram LM: vocab-size + global-OOV scalar broadcasts (4 sites:
    # context floor, model, global floor, scoring)
    "q130_bigram_lm_ce": "1-row vocab/global-floor scalar broadcasts",
    # 1-row corpus-total scalar broadcast into the n/(k+1) threshold
    "q138_heavy_hitters": "1-row total-count scalar broadcast",
    # two 1-row captured-energy scalars x 1-row total-energy scalar
    "q140_pca_invariants": "1-row energy scalar broadcasts",
    # (q148's broadcast-query BNLJ sits behind the candidate-pool
    # localCheckpoint, so it no longer appears in the outer plan)
    # 1-row corpus-token-total and shaped-weight-total scalar broadcasts
    # against the tiny per-source aggregate
    "q149_temperature_mixture": "1-row mixture-total scalar broadcasts",
    # (q151's NTILE count crossJoin became integer literals in the r15
    # optimization round -- ntile_bins folds the global count from the
    # sequence build's partition counts, so no BNLJ remains)
    # 1-row global min/max bounds scalar broadcast for bucket scaling
    "q158_zorder_key": "1-row min/max bounds scalar broadcast",
    # 1-row (n, v) totals scalar broadcast into all three LM orders
    "q164_trigram_lm_ce": "1-row model-totals scalar broadcast",
    # two 1-row per-side total-count scalar broadcasts
    "q168_categorical_drift": "1-row side-total scalar broadcasts",
    # 1-row key/row-total scalar broadcast under the top-k report
    "q159_join_skew_report": "1-row totals scalar broadcast",
    # three 1-row census scalars (nodes/edges/triangles) cross-joined
    "q184_triangle_count": "1-row census scalar broadcasts",
    # 1-row total-bigram-count scalar broadcast into the lift
    "q187_bigram_collocations": "1-row bigram-total scalar broadcast",
    # 1-row basket-count scalar broadcast into the lift
    "q188_copurchase_pairs": "1-row basket-total scalar broadcast",
    # 1-row (N, T, avgdl) corpus-stats scalar broadcast into the score
    "q190_bm25_topk": "1-row corpus-stats scalar broadcast",
    # same corpus-stats scalar inside the fused BM25 leg
    "q191_rrf_fusion": "1-row corpus-stats scalar broadcast (BM25 leg)",
    # 1-row (tt, tr) feature-total scalar broadcast into the 64-row model
    "q198_dsir_weights": "1-row feature-totals scalar broadcast",
    # 1-row digit-total scalar broadcast into the expected counts
    "q206_benford_audit": "1-row total-count scalar broadcast",
    # same counts core as q168: two 1-row side-total scalar broadcasts
    "q175_category_monitor_replay": "1-row side-total scalar broadcasts",
    # 1-row token-total (guarantee threshold) + 1-row merged-error
    # envelope scalar broadcasts
    "q211_heavyhitter_monitor_replay": "1-row total/error scalar broadcasts",
    # 1-row (n_docs, n_class) contingency-totals scalar broadcast
    "q214_chi2_token_class": "1-row class-totals scalar broadcast",
    # q129's unigram model: 1-row OOV-floor scalar broadcast
    "q220_min_k_prob": "1-row OOV-scalar broadcast (q129 model shape)",
    # 1-row (total, gap-sum) ECE scalar broadcast back onto the bins
    "q221_calibration_ece": "1-row ECE-totals scalar broadcast",
    # 1-row bigram-type-count scalar broadcast into every probability
    "q222_kneser_ney_ce": "1-row type-count scalar broadcast",
    # 1-row union-estimate x 1-row intersection-count scalar cross
    "q225_kmv_overlap": "1-row sketch-scalar broadcasts",
    # 1-row corpus-count scalar broadcast into the rank weights
    "q234_gini_revenue": "1-row count scalar broadcast",
    # (q237's three ntile_bins count broadcasts became literals in the
    # r15 optimization round, same as q151)
    # 1-row (total, days) mean scalar broadcast into the deviations
    "q239_cusum_drift": "1-row mean scalar broadcast",
    # 1-row corpus-count scalar broadcast into every KL log-ratio
    "q241_lang_kl_divergence": "1-row corpus-total scalar broadcast",
    # 1-row chance-agreement numerator x 1-row (n, agree) scalar cross
    "q248_cohens_kappa": "1-row agreement-scalar broadcasts",
    # bounded k x k depth theta-join (m <= d) over two <= 20-row tables
    "q251_rbo_rankings": "k x k depth theta-join, both sides <= k rows",
    # 1-row (n, total) scalar broadcast into every Theil log-ratio
    "q255_theil_index": "1-row totals scalar broadcast",
    # 1-row (n_groups, n_rows) scalar broadcast into the share entropy
    "q258_source_diversity": "1-row totals scalar broadcast",
    # bounded days^2 theta self-join over the daily aggregate
    "q260_mann_kendall": "days x days pair join, series-sized sides",
    # r x c category cross (marginal tables) + 1-row totals broadcast
    "q261_cramers_v": "category-cross + 1-row totals broadcasts",
    # bounded B^2 interval-means theta-joins (j >= i, b >= i) over the
    # <= 10-row bin prefix table -- the isotonic max-min identity
    "q273_isotonic_calibration": "B x B interval theta-joins, B <= 10",
    # months x months pair join over the collapsed series (80 rows at
    # every sf -- the q260 Mann-Kendall shape carrying an estimator)
    "q280_theil_sen_slope": "month x month pair join, series-sized sides",
    # the four funnel-stage counts combine via 1-row scalar crosses
    "q284_session_funnel": "1-row stage-count scalar broadcasts",
}

# Filtered TPC-H-shaped queries whose every parquet scan must push at
# least one predicate.
PUSHDOWN_QUERIES = [
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_top_revenue_orders",
    "q05_region_nation_revenue",
    "q67_big_customers",
    "q71_volume_by_year",
    "q85_returned_revenue",
    "q86_promo_revenue",
    "q87_market_share",
]


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unexpected_nested_loop_join(name, spark, sf_dir):
    """Every registry query plans with hash/sort-merge equi-joins unless
    allow-listed above; a new BNLJ or CartesianProduct is a regression."""
    plan = _executed_plan(QUERIES[name].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan, name
    if name not in ALLOWED_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected BroadcastNestedLoopJoin; if intended, "
            "allow-list it with a reason in test_plans.ALLOWED_BNLJ"
        )


def test_allowed_bnlj_list_is_tight(spark, sf_dir):
    """The allow-list must not rot: every entry still actually plans a
    BNLJ (otherwise the exemption is stale and should be removed)."""
    for name in ALLOWED_BNLJ:
        plan = _executed_plan(QUERIES[name].spark(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" in plan, f"stale allow-list entry: {name}"


@pytest.mark.parametrize("name", PUSHDOWN_QUERIES)
def test_filtered_scans_push_predicates(name, spark, sf_dir):
    """Every parquet scan in these filtered queries must carry a
    non-empty PushedFilters -- proof the predicate reaches the reader."""
    plan = _formatted_plan(QUERIES[name].spark(spark, sf_dir))
    pushed = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("PushedFilters")
    ]
    assert pushed, f"{name}: no parquet scans found in formatted plan"
    empty = [p for p in pushed if p.endswith("[]")]
    assert not empty, f"{name}: scans with empty PushedFilters: {empty}"


def test_projection_pruning_reaches_scan(spark, sf_dir):
    """q02 projects 2 columns + filters 1: the scan's ReadSchema must
    exclude the table's wide untouched columns (l_comment etc.)."""
    plan = _formatted_plan(QUERIES["q02_filter_project"].spark(spark, sf_dir))
    schemas = [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("ReadSchema")
    ]
    assert schemas
    for s in schemas:
        assert "l_comment" not in s, s
        assert "l_shipinstruct" not in s, s


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """The three join-strategy knobs a tuner reaches for must actually
    steer the planner: BROADCAST, MERGE, and SHUFFLE_HASH hints each
    produce their strategy on the same join."""
    from pos_data_insertion_etl_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cases = {
        "broadcast": "BroadcastHashJoin",
        "merge": "SortMergeJoin",
        "shuffle_hash": "ShuffledHashJoin",
    }
    for hint, node in cases.items():
        plan = _executed_plan(
            orders.join(
                customer.hint(hint), orders.o_custkey == customer.c_custkey
            )
        )
        assert node in plan, f"hint {hint!r} did not produce {node}"


def test_neardup_pipeline_joins_are_equi_only(spark, sf_dir):
    """The q90 verification stage (bands -> candidates -> Jaccard) must
    plan equi-joins only -- the whole point of replacing the id-gap
    nested-loop stand-in. Checked on the pre-clustering subplan because
    connected_components' localCheckpoint truncates lineage."""
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.operators.dedup import lsh_verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    plan = _executed_plan(lsh_verified_pairs(docs, "text", "doc_id"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_duplicate_spans_plan_is_single_scan_no_join(spark, sf_dir):
    """q179's scale contract as a plan assertion: occurrence counting
    rides a window over the digest exchange, so the plan contains NO
    join and exactly ONE parquet scan (the groupBy+join-back form
    would re-explode the corpus twice)."""
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.operators.dedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    plan = _executed_plan(duplicate_spans(docs))
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_knn_graph_candidate_cap_is_in_the_plan(spark, sf_dir):
    """q169's output-cardinality bound must be real in the physical
    plan: a WindowGroupLimit/Window rank filter on the candidate side
    before the bucket join (not a post-join filter AQE could not
    shrink)."""
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.operators.similarity import (
        lsh_knn_graph,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    g = lsh_knn_graph(
        emb, "vec_id", "embedding", k=5, n_planes=6, seed=7, dim=64,
        max_bucket_width=6,
    )
    plan = _executed_plan(g)
    # two windows: the candidate cap (bucket) and the top-k (src_id)
    assert plan.count("Window") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_kmeans_final_assignment_is_pure_projection(spark, sf_dir):
    """q182's scale contract: with centroids shipped as literals, the
    FINAL assignment plan is one scan with zero joins and zero
    exchanges (the iterative work happens in bounded collect jobs
    during construction, not in this plan). Since the r15 optimization
    round the scanned source is the lineage-cut quantized frame
    (Scan ExistingRDD) -- quantization runs once for init + all rounds
    + this assignment, instead of once per consumer."""
    plan = _executed_plan(QUERIES["q182_kmeans_lloyd"].spark(spark, sf_dir))
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    n_scans = plan.count("Scan parquet") + plan.count("Scan ExistingRDD")
    assert n_scans == 1, plan
