"""Evidence ordering in `__spark_entry__` (round-5 corrected mechanism).

The driver certifies the first 50 entries of ``queries()`` in dict
*insertion order* -- proven by CORRECTNESS_r04.json, whose keys are
exactly the first 50 insertion-order entries of the round-4 dict.
Round 5 drops the alias-prefix rotation (ADVICE r4: canonical names
only) and instead orders the dict with every never-driver-certified
canonical name first, so the first-50 window IS the evidence gap.

These tests pin three things:
1. the predicted r4 window matches the observed CORRECTNESS_r04 keys
   (so a future driver selection-rule surprise fails a test, not a
   round);
2. the current dict's insertion-order prefix covers the whole
   never-certified set (when it fits in 50);
3. all keys are canonical registry names mapping to the registry's own
   callables/SQL -- no aliases, no API drift.
"""

from __future__ import annotations

import importlib.util
import itertools
import json
import os
import re

from pos_data_insertion_etl_spark.plans import all_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ENTRY = os.path.join(_REPO, "__spark_entry__.py")
_ALIAS = re.compile(r"^00r\d+_")

#: Registry names introduced after round 4 (keep in sync as operators
#: land): excluded when reconstructing the round-4 export ordering.
_NEW_SINCE_R4: frozenset[str] = frozenset(
    {
        "q124_ann_lsh_seeded",
        "q125_ann_ivf_nprobe",
        "q126_source_cap_sample",
        "q127_int8_quantize_error",
    }
)

#: Registry names introduced in round 6 (can't appear in the r5 dict).
_NEW_SINCE_R5: frozenset[str] = frozenset(
    {
        "q128_gopher_quality",
        "q129_unigram_lm_ce",
        "q130_bigram_lm_ce",
        "q131_mixture_budget_sample",
        "q132_weighted_sample_wor",
        "q133_pq_encode",
        "q134_pq_adc_topk",
        "q135_incremental_exact_dedup",
        "q136_incremental_neardup",
        "q137_bloom_decontaminate",
        "q138_heavy_hitters",
        "q139_countmin_estimates",
        "q140_pca_invariants",
        "q141_pagerank",
        "q142_gapfill_ffill",
        "q143_lsh_multiprobe",
        "q144_curation_funnel",
        "q145_ist_jst_dates",
        "q146_cdc_chunks",
        "q147_simhash_hamming_pairs",
        "q148_mmr_diversified_topk",
        "q149_temperature_mixture",
        "q150_html_text_extract",
        "q151_ce_decile_bins",
        "q152_epoch_shard_shuffle",
        "q153_badword_filter",
        "q154_dup_ngram_fraction",
        "q155_langid_confusion",
        "q156_gate_threshold_sweep",
        "q157_canonical_text",
        "q158_zorder_key",
        "q159_join_skew_report",
        "q160_pack_nosplit",
        "q161_pack_efficiency",
        "q162_neardup_cluster_sizes",
        "q163_balanced_label_sample",
        "q164_trigram_lm_ce",
        "q165_url_normalize",
        "q166_page_metadata",
        "q167_table_profile",
        "q168_categorical_drift",
    }
)

#: Registry names introduced in round 7 (can't appear in r4/r5 dicts).
_NEW_SINCE_R6: frozenset[str] = frozenset(
    {
        "q169_knn_graph_bounded",
        "q170_tar_fixed_width",
        "q171_quantile_summary_bounds",
        "q172_quantile_drift_report",
        "q173_robots_allowed",
        "q174_sitemap_urls",
        "q175_category_monitor_replay",
        "q176_quantile_monitor_replay",
        "q177_embedding_centroid_drift",
        "q178_grouped_quantile_bounds",
        "q179_duplicate_spans",
        "q180_contamination_spans",
        "q181_apply_span_cuts",
        "q182_kmeans_lloyd",
        "q183_label_propagation",
        "q184_triangle_count",
        "q185_ewma_dyadic",
        "q186_ngram_novelty",
        "q187_bigram_collocations",
        "q188_copurchase_pairs",
        "q189_setsim_prefix_join",
        "q190_bm25_topk",
        "q191_rrf_fusion",
        "q192_kcore",
        "q193_source_overlap",
        "q194_knn_outliers",
        "q195_random_projection",
        "q196_token_entropy",
        "q197_scene_cuts",
        "q198_dsir_weights",
        "q199_dedup_ingest_replay",
        "q200_quality_logistic",
        "q201_group_split",
        "q202_winsorize",
        "q203_crawl_frontier",
        "q204_fuzzy_name_join",
        "q205_mad_outliers",
        "q206_benford_audit",
        "q207_interval_overlap",
        "q208_audio_frame_energy",
        "q209_personalized_pagerank",
        "q210_sorted_neighborhood",
        "q211_heavyhitter_monitor_replay",
        "q212_bfs_distances",
        "q213_markov_transitions",
        "q214_chi2_token_class",
        "q215_retrieval_eval",
        "q216_dow_seasonality",
        "q217_score_auc",
        "q218_kmv_distinct_replay",
        "q219_golden_records",
        "q220_min_k_prob",
        "q221_calibration_ece",
        "q222_kneser_ney_ce",
        "q223_ipf_raking",
        "q224_code_switch",
        "q225_kmv_overlap",
        "q226_encoding_advisor",
    }
)

#: Batch K: registered at round-7 CLOSE (end-of-round snapshot commit,
#: after the last full-suite run) -- its own bookkeeping set per
#: VERDICT r7 item 2, so the r4/r5 reconstructions exclude it and the
#: meta-test below pins every future registration to exactly one set.
_NEW_SINCE_R7: frozenset[str] = frozenset(
    {
        "q227_hits",
        "q228_mutual_knn",
        "q229_association_rules",
        "q230_trend_ma",
        "q231_audio_zcr",
    }
)

#: Round-8 registrations (keep in sync as batches land).
_NEW_SINCE_R8: frozenset[str] = frozenset(
    {
        # batch L: exact-statistics suite (plans/llm_ops15.py)
        "q232_ks_two_sample",
        "q233_spearman_daily",
        "q234_gini_revenue",
        "q235_grouped_ols",
        "q236_pareto_frontier",
        "q237_rfm_segments",
        "q238_acf_daily",
        "q239_cusum_drift",
        # batch M: curation depth (plans/llm_ops16.py)
        "q240_ecdf_normalize",
        "q241_lang_kl_divergence",
        "q242_matryoshka_truncation",
        "q243_compression_gate",
        "q244_char_class_profile",
        "q245_fano_burstiness",
        # batch N: corpus forensics (plans/llm_ops17.py)
        "q246_vocab_stats",
        "q247_zipf_slope",
        "q248_cohens_kappa",
        "q249_image_entropy",
        "q250_heaps_law",
        # batch O: ranking agreement + robust centers (plans/llm_ops18.py)
        "q251_rbo_rankings",
        "q252_weighted_median",
        "q253_iqr_outliers",
        "q254_ks_monitor_replay",
        # batch P: concentration & diversity suite (plans/llm_ops19.py)
        "q255_theil_index",
        "q256_herfindahl",
        "q257_topk_share",
        "q258_source_diversity",
        # batch Q: drift / trend / association panels (plans/llm_ops20.py)
        "q259_page_hinkley",
        "q260_mann_kendall",
        "q261_cramers_v",
        # batch R: PII / WOE / complexity / A-B / Chao1 (plans/llm_ops21.py)
        "q262_pii_scrub",
        "q263_woe_iv_screen",
        "q264_permutation_entropy",
        "q265_ab_ztest",
        "q266_chao1_richness",
    }
)

#: Round-9 registrations (keep in sync as batches land).
_NEW_SINCE_R9: frozenset[str] = frozenset(
    {
        # batch S: q131 control twin + the six round-8 snapshot
        # operators, registered with oracles per VERDICT r8 items 1/3
        # (plans/llm_ops22.py)
        "q267_mixture_budget_v2",
        "q268_kaplan_meier",
        "q269_anova_source_length",
        "q270_wilson_en_share",
        "q271_neyman_allocation",
        "q272_clustering_coefficient",
        "q273_isotonic_calibration",
        # batch T: new plan shapes (plans/llm_ops23.py)
        "q274_streamed_curation_replay",
        "q275_bucketed_mart_join",
        # batch U: storage/shuffle strategy certifications + two new
        # estimator shapes (plans/llm_ops24.py)
        "q276_partition_pruned_mart",
        "q277_salted_skew_join",
        "q278_bloom_semijoin_prefilter",
        "q279_largest_remainder",
        "q280_theil_sen_slope",
        "q281_phrase_match",
        # batch V: event-pipeline + weighted-graph shapes
        # (plans/llm_ops25.py)
        "q282_weighted_sssp",
        "q283_boolean_retrieval",
        "q284_session_funnel",
        "q285_last_touch_attribution",
        # batch W: split-leakage audit (plans/llm_ops26.py)
        "q286_split_leakage_audit",
        # batch X: Spark 4 API surfaces -- variant + collation
        # (plans/llm_ops27.py)
        "q287_variant_json_stats",
        "q288_collated_group",
    }
)

_NEW_SINCE_R10: frozenset[str] = frozenset(
    {
        # batch Y: streaming watermark/late-data certification +
        # driver-certified AQE hot-band skew split
        # (plans/llm_ops28.py, VERDICT r9 items 3/4)
        "q289_watermark_late_data",
        "q290_aqe_skew_split",
    }
)

_NEW_SINCE_R11: frozenset[str] = frozenset(
    {
        # batch Z: giant-component-safe star-contraction CC
        # (plans/llm_ops29.py, the round-11 pointer-jump skew finding)
        "q291_cc_giant_star",
    }
)

_NEW_SINCE_R12: frozenset[str] = frozenset(
    {
        # batch AA: giant-component auto-route (jump->stars mid-stream
        # switch) as the default code path (plans/llm_ops30.py,
        # VERDICT r11 item 1)
        "q292_cc_autoroute_switch",
    }
)

_NEW_SINCE_R13: frozenset[str] = frozenset(
    {
        # batch AB: the pyarrow filesystem adapter as a data path --
        # arrowfile://-routed tar listing+open (plans/llm_ops31.py,
        # VERDICT r13 item 3); registered in round 14.
        "q293_tar_arrow_fs",
    }
)

_NEW_SINCE_R14: frozenset[str] = frozenset(
    {
        # batch AC: the GRAFT_FS_MAP object-store double as a data
        # path -- s3graft://-routed tar listing+open through
        # MappedFileSystem (plans/llm_ops32.py, VERDICT r14 item 7);
        # registered in round 15.
        "q294_tar_mapped_fs",
    }
)

#: Every post-r4 bookkeeping set, for the reconstruction filters and
#: the registration meta-test. ADD NEW ROUNDS HERE.
_ALL_NEW_SINCE: dict[str, frozenset[str]] = {
    "_NEW_SINCE_R4": _NEW_SINCE_R4,
    "_NEW_SINCE_R5": _NEW_SINCE_R5,
    "_NEW_SINCE_R6": _NEW_SINCE_R6,
    "_NEW_SINCE_R7": _NEW_SINCE_R7,
    "_NEW_SINCE_R8": _NEW_SINCE_R8,
    "_NEW_SINCE_R9": _NEW_SINCE_R9,
    "_NEW_SINCE_R10": _NEW_SINCE_R10,
    "_NEW_SINCE_R11": _NEW_SINCE_R11,
    "_NEW_SINCE_R12": _NEW_SINCE_R12,
    "_NEW_SINCE_R13": _NEW_SINCE_R13,
    "_NEW_SINCE_R14": _NEW_SINCE_R14,
}

#: The round-4 registry was exactly q01..q123 -- a closed historical
#: fact, pinned by number so the meta-test needs no 123-name list.
_R4_BASE_MAX_NUM = 123


def _entry_module():
    spec = importlib.util.spec_from_file_location("_entry_under_test", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _artifact(round_no: int) -> dict:
    with open(os.path.join(_REPO, f"CORRECTNESS_r{round_no:02d}.json")) as fh:
        return json.load(fh)


def test_r4_artifact_confirms_insertion_order_selection():
    """The r4 driver window == first 50 insertion-order entries of the
    r4 dict (which was canonical-sorted over aliased export names).
    If the driver's selection rule ever changes, this pins the model
    our ordering relies on against the newest committed artifact."""
    observed = list(_artifact(4))
    # Reconstruct the r4 export dict order: canonical-sorted registry
    # with the r4 alias prefix applied to the names it rotated.
    rotated = {_ALIAS.sub("", k) for k in observed if _ALIAS.match(k)}
    r4_exports = [
        f"00r4_{n}" if n in rotated else n for n in sorted(all_queries())
    ]
    # Names added after round 4 (if any) can't appear in the r4 dict.
    post_r4 = frozenset().union(*_ALL_NEW_SINCE.values())
    r4_exports = [
        k for k in r4_exports if _ALIAS.sub("", k) not in post_r4
    ]
    assert len(observed) == 50
    assert observed == r4_exports[:50]


def test_r5_artifact_confirms_pending_first_selection():
    """The r5 driver window == the predicted first-50: every name the
    r1-r4 artifacts had never certified (within the r5 registry),
    sorted, padded from the sorted certified names. This pins the
    round-5 ordering mechanism against the newest committed artifact,
    exactly as test_r4_... pins the round-4 one (VERDICT r5 item 8)."""
    observed = list(_artifact(5))
    post_r5 = frozenset().union(
        *(v for k, v in _ALL_NEW_SINCE.items() if k != "_NEW_SINCE_R4")
    )
    r5_registry = sorted(n for n in all_queries() if n not in post_r5)
    certified_pre_r5: set[str] = set()
    for rnd in range(1, 5):
        certified_pre_r5 |= {_ALIAS.sub("", k) for k in _artifact(rnd)}
    pending = [n for n in r5_registry if n not in certified_pre_r5]
    predicted = (
        pending + [n for n in r5_registry if n in certified_pre_r5]
    )[:50]
    assert len(observed) == 50
    assert observed == predicted


def test_insertion_prefix_covers_never_green_names():
    """Round 6 orders by GREEN evidence (hash_match rows), not mere row
    presence: `err: no_oracle` rows must not retire a name from the
    window -- that is how q58/q63/q64/q124 re-enter to convert their
    r5 err rows after gaining oracles."""
    mod = _entry_module()
    exported = list(mod.queries())
    green = mod.driver_green_names()
    never = sorted(n for n in all_queries() if n not in green)
    # The never-green block leads the dict, in canonical order.
    assert exported[: len(never)] == never
    # And (while it fits) the whole gap sits inside the 50-entry window.
    if len(never) <= 50:
        assert set(never) <= set(exported[:50])
    # Remaining entries are the green names, oldest-evidence-first
    # (round 11: VERDICT r10 item 4 -- the re-cert slots rotate through
    # the STALEST names instead of re-certifying q01-ish names forever).
    latest = mod.driver_green_latest_round()
    assert exported[len(never):] == sorted(
        green & set(all_queries()), key=lambda n: (latest[n], n)
    )
    # Derived (not hardcoded -- ADVICE r6): every name whose only
    # evidence is non-green rows (err / failed compare) is still pending.
    err_only = mod.driver_certified_names() - green
    assert {n for n in err_only if n in all_queries()} <= set(never)
    # green is a strict subset of "has any row".
    assert green <= mod.driver_certified_names()


def test_green_tail_rotates_stalest_first():
    """The staleness rotation, pinned end-to-end against the committed
    artifacts: every green name has a latest-round stamp; the tail is
    non-decreasing in it; and the re-cert slots (window minus the
    pending block) hold exactly the stalest green names. With ~48
    slots/round the 290-name registry re-certifies every ~5 rounds."""
    mod = _entry_module()
    exported = list(mod.queries())
    green = mod.driver_green_names()
    latest = mod.driver_green_latest_round()
    registry = set(all_queries())
    # latest-round bookkeeping covers exactly the green set.
    assert set(latest) >= (green & registry)
    assert all(rnd >= 1 for rnd in latest.values())
    n_pending = len(registry - green)
    tail = exported[n_pending:]
    stamps = [latest[n] for n in tail]
    assert stamps == sorted(stamps), "green tail must be oldest-first"
    # The window's re-cert slots are filled by a stalest-first prefix:
    # no name OUTSIDE the window may be staler than one inside it.
    slots = tail[: max(0, 50 - n_pending)]
    if slots and len(tail) > len(slots):
        newest_in = max(latest[n] for n in slots)
        oldest_out = min(latest[n] for n in tail[len(slots):])
        assert newest_in <= oldest_out


def test_exports_are_canonical_and_identity():
    mod = _entry_module()
    exported = mod.queries()
    oracles = mod.oracle_sql()
    registry = all_queries()
    assert set(exported) == set(registry)  # canonical names only
    for name, spec in registry.items():
        assert exported[name] is spec.spark
        if spec.oracle is None:
            assert name not in oracles
        else:
            assert oracles[name] == spec.oracle
    # queries() and oracle_sql() agree on ordering for their shared keys.
    q_order = [n for n in exported if n in oracles]
    assert q_order == list(oracles)


def test_every_registration_has_bookkeeping():
    """Registration meta-test (VERDICT r7 item 3): every registry name
    belongs to EXACTLY ONE `_NEW_SINCE_R{N}` set, or to the closed
    round-4 base (q01..q123, pinned by number). A new registration
    without its bookkeeping-set update fails HERE, at registration
    time, with a message naming the missing set -- the round-6/round-7
    failure mode (work landing at round close without the test-set
    update) cannot silently recur."""
    num = re.compile(r"^q(\d+)_")
    names = set(all_queries())
    for name in sorted(names):
        m = num.match(name)
        assert m, f"registry name {name!r} is not q<num>_<slug>"
        member = sorted(k for k, v in _ALL_NEW_SINCE.items() if name in v)
        if int(m.group(1)) <= _R4_BASE_MAX_NUM:
            assert not member, (
                f"{name} is in the round-4 base (q01..q{_R4_BASE_MAX_NUM}) "
                f"but also listed in {member}"
            )
        else:
            assert len(member) == 1, (
                f"{name} must appear in exactly one _NEW_SINCE_R{{N}} set "
                f"in tests/test_entry_rotation.py; found {member or 'NONE'}"
                " -- add it to the set for the round that registered it"
                " (and _ALL_NEW_SINCE if the round is new)"
            )
    # No stale bookkeeping: every listed name still exists.
    for key, val in _ALL_NEW_SINCE.items():
        stale = sorted(val - names)
        assert not stale, f"{key} lists unregistered names: {stale}"


def test_certified_union_matches_artifacts():
    mod = _entry_module()
    names: set[str] = set()
    for rnd in itertools.count(1):
        path = os.path.join(_REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(path):
            break
        names |= {_ALIAS.sub("", k) for k in _artifact(rnd)}
    assert mod.driver_certified_names() == names
