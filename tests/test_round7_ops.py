"""Structural/invariant tests for the round-7 q182-q188 operators
(Lloyd k-means, label propagation, triangle census, dyadic EWMA,
n-gram novelty, collocations, co-purchase pairs). Value correctness is
pinned by the DuckDB oracles in test_oracle_queries; these pin the
contracts the oracles cannot see (argmin optimality, empty-cluster
carry, degree bounds, warm-up semantics, basket guards)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table
from pos_data_insertion_etl_spark.operators.clustering import lloyd_kmeans
from pos_data_insertion_etl_spark.operators.graph import (
    label_propagation_majority,
    triangle_count,
)
from pos_data_insertion_etl_spark.operators.itemsets import copurchase_pairs
from pos_data_insertion_etl_spark.operators.text_mining import (
    bigram_collocations,
    ngram_novelty,
)
from pos_data_insertion_etl_spark.operators.timeseries import ewma_dyadic

# ------------------------------------------------------------- k-means


def test_kmeans_total_cost_never_increases_with_iterations(spark, sf_dir):
    """Lloyd's invariant: total within-cluster cost after t+1 full
    rounds is <= the cost after t rounds (both assignment and update
    steps are non-increasing; integer-truncated centroids can only
    perturb by sub-quantum amounts, dominated by the improvement on
    this data). Also pins shape + determinism across runs."""
    emb = load_table(spark, sf_dir, "embeddings")
    costs = []
    for iters in (0, 1, 2):
        out = lloyd_kmeans(emb, "vec_id", "embedding", k=4, iters=iters)
        rows = out.collect()
        assert {r.cluster for r in rows} <= {1, 2, 3, 4}
        assert len(rows) == emb.count()
        costs.append(sum(r.dist for r in rows))
    assert costs[0] >= costs[1] >= costs[2], costs
    again = lloyd_kmeans(emb, "vec_id", "embedding", k=4, iters=2).collect()
    assert {r.vec_id: (r.cluster, r.dist) for r in again} == {
        r.vec_id: (r.cluster, r.dist)
        for r in lloyd_kmeans(emb, "vec_id", "embedding", k=4, iters=2).collect()
    }


def test_kmeans_iters0_assigns_against_md5_init(spark, sf_dir):
    """iters=0 must assign directly against the k md5-smallest vectors,
    and those seed vectors must each sit in their own cluster with
    dist 0."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = lloyd_kmeans(emb, "vec_id", "embedding", k=3, iters=0)
    seeds = (
        emb.select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(3)
        .collect()
    )
    got = {r.vec_id: r for r in out.collect()}
    for j, s in enumerate(seeds, start=1):
        assert got[s.vec_id].cluster == j
        assert got[s.vec_id].dist == 0


def test_kmeans_empty_cluster_carries_centroid(spark):
    """k=3 over two tight far-apart point groups: one cluster must go
    empty after the first update and the run must still complete with
    every point in a surviving cluster."""
    pts = [(i, [float(i % 2) * 10.0] * 4) for i in range(20)]
    df = spark.createDataFrame(pts, "id long, v array<double>")
    out = lloyd_kmeans(df, "id", "v", k=3, iters=2).collect()
    assert len(out) == 20
    by_parity = {0: set(), 1: set()}
    for r in out:
        by_parity[r.id % 2].add(r.cluster)
    # each parity group lands in exactly one cluster
    assert all(len(c) == 1 for c in by_parity.values())


# --------------------------------------------- graph consumers of q169


def _small_graph(spark):
    edges = [
        (1, 2), (2, 1), (2, 3), (3, 1),  # triangle 1-2-3
        (3, 4), (4, 5),                   # tail
    ]
    return spark.createDataFrame(edges, "src_id long, dst_id long")


def test_triangle_count_fixture(spark):
    g = _small_graph(spark)
    row = triangle_count(g).collect()[0]
    assert row.n_nodes == 5
    assert row.n_edges == 5  # undirected dedup of 6 directed edges
    assert row.n_triangles == 1


def test_triangle_count_clique(spark):
    clique = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    row = triangle_count(
        spark.createDataFrame(clique, "src_id long, dst_id long")
    ).collect()[0]
    assert row.n_triangles == 4  # C(4,3)


def test_label_propagation_majority_votes(spark):
    g = _small_graph(spark)
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20), (5, 20)], "node long, lab int"
    )
    out = {
        r.node: r
        for r in label_propagation_majority(g, labels, "node", "lab").collect()
    }
    # node 2 has neighbors {1,3} -> labels {10,20}, tie -> smaller label
    assert out[2].voted_label == 10
    assert out[2].n_neighbors == 2
    assert out[2].changed is False
    # node 3 has neighbors {1,4} -> {10,20} tie -> 10, changed
    assert out[3].voted_label == 10
    assert out[3].changed is True
    # every voted label came from a real neighbor
    nbrs = {1: {2}, 2: {1, 3}, 3: {1, 4}, 4: {5}}
    lab = {1: 10, 2: 10, 3: 20, 4: 20, 5: 20}
    for n, r in out.items():
        assert r.voted_label in {lab[d] for d in nbrs[n]}


# ----------------------------------------------------------------- EWMA


def test_ewma_warmup_and_constant_series(spark):
    rows = [(1, i, float(i), 5.0) for i in range(12)]
    df = spark.createDataFrame(rows, "k long, eid long, ts double, v double")
    out = ewma_dyadic(df, "k", ["ts", "eid"], "v", taps=8).collect()
    by_eid = {r.eid: r.ewma for r in out}
    # exactly taps-1 warm-up NULLs
    assert [by_eid[i] is None for i in range(12)] == [True] * 7 + [False] * 5
    # constant input -> ewma equals the constant EXACTLY (dyadic
    # weights + exact normalization)
    assert all(by_eid[i] == 5.0 for i in range(7, 12))


def test_ewma_weights_recent_heavier(spark):
    # step series: after a jump, ewma moves more than halfway to the
    # new level immediately (w0 = 1/2 of the normalized mass)
    rows = [(1, i, float(i), 0.0 if i < 10 else 100.0) for i in range(11)]
    df = spark.createDataFrame(rows, "k long, eid long, ts double, v double")
    out = {r.eid: r.ewma for r in ewma_dyadic(df, "k", ["ts", "eid"], "v").collect()}
    assert out[9] == 0.0
    assert out[10] > 50.0


# ------------------------------------------------------- corpus mining


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = ngram_novelty(docs, "doc_id", "text", n=3)
    first_id = docs.agg(F.min("doc_id")).collect()[0][0]
    first = out.filter(F.col("doc_id") == first_id).collect()[0]
    assert first.novel == first.n_grams > 0
    assert first.novelty_milli == 1000


def test_novelty_exact_duplicate_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w q")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs).collect()}
    assert out[1].novelty_milli == 1000
    assert out[2].novelty_milli == 0  # every trigram first seen in doc 1
    assert out[3].novelty_milli == 1000


def test_collocations_fixture_counts_and_lift(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c c")], "doc_id long, text string"
    )
    out = {r.bigram: r for r in bigram_collocations(docs, "text", top=10).collect()}
    # bigrams: doc1 [a b, b a, a b], doc2 [a b, b c, c c]
    assert out["a b"].c_ab == 3
    assert out["a b"].c_a == 3 and out["a b"].c_b == 3  # unigram counts
    assert out["a b"].rn == 1
    t = 6  # total bigram occurrences
    assert abs(out["a b"].lift - (3.0 * t / 3 / 3)) < 1e-12


# ---------------------------------------------------------- co-purchase


def test_copurchase_fixture_and_basket_guard(spark):
    rows = (
        [(1, i) for i in (10, 20, 30)]
        + [(2, i) for i in (10, 20)]
        + [(3, i) for i in (10, 20)]
        # oversized basket must be excluded by max_basket=3
        + [(4, i) for i in range(100, 110)]
    )
    df = spark.createDataFrame(rows, "b long, i long")
    out = {(r.item1, r.item2): r for r in
           copurchase_pairs(df, "b", "i", top=10, max_basket=3).collect()}
    assert (10, 20) in out and out[(10, 20)].support == 3
    assert out[(10, 20)].rn == 1
    # nothing from basket 4 survived the guard
    assert all(i1 < 100 for (i1, _) in out)
    # lift of the ubiquitous pair: support=3, n_baskets=3, c_a=c_b=3
    assert abs(out[(10, 20)].lift - 1.0) < 1e-12
    # pair ordering invariant
    assert all(i1 < i2 for (i1, i2) in out)


# --------------------------------------------------- prefix-filter join


def test_setsim_join_finds_planted_neardup_and_respects_threshold(spark):
    from pos_data_insertion_etl_spark.operators.setsim import (
        prefix_filter_jaccard_join,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g z"),   # 5/7 trigram overlap with 1
            (3, "p q r s t u v w"),   # disjoint
            (4, "p q r s t u v w"),   # exact dup of 3
        ],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r for r in prefix_filter_jaccard_join(
        docs, t_num=1, t_den=2).collect()}
    assert (3, 4) in out and out[(3, 4)].jaccard == 1.0
    assert (1, 2) in out and out[(1, 2)].n_common == 5
    assert (1, 3) not in out and (2, 3) not in out
    # exact threshold: J(1,2) = 5/(6+6-5) = 5/7 >= 1/2
    assert abs(out[(1, 2)].jaccard - 5 / 7) < 1e-6


def test_setsim_exact_integer_threshold_edge(spark):
    from pos_data_insertion_etl_spark.operators.setsim import (
        prefix_filter_jaccard_join,
    )

    # J exactly == t must be KEPT (>=, not >): two docs sharing 2 of
    # their 3+3 trigrams -> J = 2/4 = 1/2
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x")],  # trigrams: {abc,bcd,cde} vs {abc,bcd,cdx}
        "doc_id long, text string",
    )
    out = prefix_filter_jaccard_join(docs, t_num=1, t_den=2).collect()
    assert len(out) == 1 and out[0].n_common == 2 and out[0].jaccard == 0.5


def test_setsim_array_verify_with_noncandidate_majority(spark):
    """r16 verify internals: the element table is semi-filtered to
    candidate documents before the per-doc digest arrays are built.
    A corpus where most docs have NO candidate partner must still
    yield exact counts for the pairs that do, and the non-candidates
    must neither appear nor disturb n_a/n_b (which ride from the rank
    window, not the filtered element table)."""
    from pos_data_insertion_etl_spark.operators.setsim import (
        prefix_filter_jaccard_join,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g z"),   # near-dup of 1: 5 shared trigrams
            (3, "p q r s t u v w"),   # no partner
            (4, "m n o mm nn oo pp"), # no partner
            (5, "x y z xx yy zz"),    # no partner
        ],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r for r in prefix_filter_jaccard_join(
        docs, t_num=1, t_den=2).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert (r.n_common, r.n_a, r.n_b) == (5, 6, 6)
    assert abs(r.jaccard - 5 / 7) < 1e-6


# --------------------------------------------------------------- BM25


def test_bm25_prefers_rare_term_and_bounds_rank(spark):
    from pos_data_insertion_etl_spark.operators.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "rare common common common"),
            (2, "common common common common"),
            (3, "common rare rare common"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [("q1", "rare")], "query_id string, term string"
    )
    out = bm25_topk(docs, q, k=10).collect()
    got = {r.doc_id: r for r in out}
    assert set(got) == {1, 3}  # doc 2 has no 'rare'
    assert got[3].rank == 1  # higher tf wins
    assert got[3].score_fp > got[1].score_fp > 0
    assert all(r.rank <= 10 for r in out)


def test_rrf_fusion_rewards_agreement(spark):
    from pos_data_insertion_etl_spark.operators.bm25 import rrf_fuse

    r1 = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "query_id string, doc_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [("q", 1, 2), ("q", 3, 1)], "query_id string, doc_id long, rank long"
    )
    out = {r.doc_id: r for r in rrf_fuse([r1, r2], k=10).collect()}
    # doc 1 appears in both lists -> fused above both single-list docs
    assert out[1].n_lists == 2
    assert out[1].rank == 1
    assert out[1].rrf_fp == 1_000_000 // 61 + 1_000_000 // 62
    assert out[3].rrf_fp == 1_000_000 // 61


# --------------------------------------------------------------- k-core


def test_kcore_peels_tail_keeps_clique(spark):
    from pos_data_insertion_etl_spark.operators.graph import kcore

    # triangle 1-2-3 with a pendant chain 3-4-5
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    g = spark.createDataFrame(edges, "src_id long, dst_id long")
    out = {r.node: r.degree for r in kcore(g, k=2, iters=3).collect()}
    assert set(out) == {1, 2, 3}  # chain peeled away in two rounds
    assert all(d == 2 for d in out.values())


def test_kcore_zero_iters_is_identity_degrees(spark):
    from pos_data_insertion_etl_spark.operators.graph import kcore

    edges = [(1, 2), (2, 3)]
    g = spark.createDataFrame(edges, "src_id long, dst_id long")
    out = {r.node: r.degree for r in kcore(g, k=2, iters=0).collect()}
    assert out == {1: 1, 2: 2, 3: 1}


# ----------------------------------------------------- source overlap


def test_source_overlap_symmetric_bounds(spark, sf_dir):
    from pos_data_insertion_etl_spark.operators.text_mining import (
        source_ngram_overlap,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = source_ngram_overlap(docs).collect()
    assert rows, "expected at least one source pair"
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_common <= min(r.n_a, r.n_b)
        assert 0 <= r.jaccard_milli <= 1000
        assert r.jaccard_milli <= r.containment_milli <= 1000


def test_source_overlap_disjoint_and_contained(spark):
    from pos_data_insertion_etl_spark.operators.text_mining import (
        source_ngram_overlap,
    )

    docs = spark.createDataFrame(
        [
            (1, "s1", "a b c d e"),
            (2, "s2", "a b c d e f g"),  # s1's grams ⊂ s2's
            (3, "s3", "x y z w v"),      # disjoint from both
        ],
        "doc_id long, source string, text string",
    )
    out = {(r.source_a, r.source_b): r
           for r in source_ngram_overlap(docs, "source", "text").collect()}
    assert out[("s1", "s2")].containment_milli == 1000  # full containment
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


# ------------------------------------------------------ batch D (q194+)


def test_knn_outlier_isolated_vector_flagged(spark):
    from pos_data_insertion_etl_spark.operators.graph import (
        knn_outlier_scores,
    )

    g = spark.createDataFrame(
        [
            (1, 2, 0.9, 1), (1, 3, 0.8, 2),
            (2, 1, 0.9, 1),
            (9, 5, 0.01, 1), (9, 6, -0.2, 2),  # isolated: mean << 0.25
        ],
        "src_id long, dst_id long, cos_sim double, rn long",
    )
    out = {r.node: r for r in knn_outlier_scores(g, 250_000).collect()}
    assert out[1].is_outlier is False
    assert out[1].sum_cos_fp == 1_700_000
    assert out[9].is_outlier is True
    assert out[9].mean_cos_fp < 0


def test_random_projection_shapes_and_duplicate_pair_null_ratio(spark):
    from pos_data_insertion_etl_spark.operators.projection import (
        projection_distortion,
        random_projection,
    )

    rows = [(i, [float((i * 7 + j) % 5) / 10 for j in range(8)]) for i in range(6)]
    rows.append((6, rows[5][1]))  # exact duplicate of vec 5, adjacent id
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    proj = random_projection(df, "vec_id", "embedding", out_dim=3, dim=8)
    assert all(len(r.proj) == 3 for r in proj.collect())
    dist = {(r.id_a, r.id_b): r for r in projection_distortion(
        df, "vec_id", "embedding", out_dim=3, dim=8, max_id_gap=2
    ).collect()}
    dup = dist[(5, 6)]
    assert dup.d_orig_sq == 0 and dup.d_proj_sq == 0
    assert dup.ratio_milli is None  # zero-distance guard
    # every id-adjacent pair within the gap is present
    assert all(0 < b - a <= 2 for (a, b) in dist)
    assert (1, 2) in dist and (1, 3) in dist and (1, 4) not in dist


def test_token_entropy_extremes(spark):
    from pos_data_insertion_etl_spark.operators.text_mining import (
        token_entropy,
    )
    import math

    docs = spark.createDataFrame(
        [(1, "x x x x x x"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert out[1].entropy_fp == 0  # degenerate repetition
    assert out[1].n_distinct == 1
    # uniform over 6 tokens -> ln(6) in micro-nats (per-term rounding)
    assert abs(out[2].entropy_fp - round(math.log(6) * 1_000_000)) <= 6
    assert out[2].entropy_fp > out[1].entropy_fp


def test_scene_cut_flags_exactly_the_break(spark, sf_dir):
    from pos_data_insertion_etl_spark.plans import all_queries

    rows = all_queries()["q197_scene_cuts"].spark(spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.frame_idx] = r.is_cut
    assert len(by_doc) > 0
    for frames in by_doc.values():
        assert set(frames) == {1, 2, 3, 4, 5}
        # the only cut is at the scene break (frame 3)
        assert frames[3] is True
        assert all(frames[f] is False for f in (1, 2, 4, 5))


# ------------------------------------------------- q198-q200 (batch E)


def test_dsir_prefers_target_like_docs(spark):
    from pos_data_insertion_etl_spark.operators.dsir import dsir_weights

    target_text = "alpha beta gamma delta alpha beta"
    rows = (
        [(i, "tgt", target_text) for i in range(4)]
        + [(10 + i, "raw", target_text) for i in range(2)]  # target-like
        + [(20 + i, "raw", "zeta eta theta iota kappa mu") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in dsir_weights(
        docs, F.col("source") == "tgt").collect()}
    # raw docs that repeat the target's bigrams score above the
    # off-distribution raw docs, and are the selected ones
    assert out[10].logweight_fp > out[20].logweight_fp
    assert out[10].selected is True
    assert out[20].selected is False


def test_dedup_ingest_replay_is_idempotent_per_batch(spark, sf_dir):
    """Driving the same micro-batch twice through the real persist path
    must leave the corpus identical to driving it once."""
    import shutil

    from pos_data_insertion_etl_spark.streaming.jobs import dedup_ingest_batch

    out = "/tmp/graft_test_dedup_replay_once"
    shutil.rmtree(out, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").limit(40)
    dedup_ingest_batch(docs, 0, out, "text", "doc_id")
    once = sorted(
        r.doc_id for r in spark.read.parquet(out + "/corpus").collect()
    )
    dedup_ingest_batch(docs, 0, out, "text", "doc_id")  # replay
    twice = sorted(
        r.doc_id for r in spark.read.parquet(out + "/corpus").collect()
    )
    assert once == twice
    shutil.rmtree(out, ignore_errors=True)


def test_logistic_score_monotone_in_logit(spark):
    from pos_data_insertion_etl_spark.operators.scoring import logistic_score

    feats = spark.createDataFrame(
        [(1, "f", 1_000_000), (2, "f", 2_000_000), (3, "f", -1_000_000),
         (3, "unknown_feature", 99)],
        "id long, feature string, x_fp long",
    )
    weights = spark.createDataFrame(
        [("f", 1_000_000)], "feature string, w_fp long"
    )
    out = {r.id: r for r in logistic_score(feats, weights, "id").collect()}
    assert out[1].z_fp == 1_000_000 and out[1].p_fp > 500_000
    assert out[2].p_fp > out[1].p_fp > out[3].p_fp
    assert out[3].accepted is False and out[2].accepted is True
    # sigmoid bounds
    assert all(0 <= r.p_fp <= 1_000_000 for r in out.values())


# ------------------------------------------------- q201-q203 (batch F)


def test_group_split_never_straddles_a_group(spark, sf_dir):
    from pos_data_insertion_etl_spark.operators.mixture import (
        group_stable_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = group_stable_split(docs, "source")
    per_source = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert per_source and all(r.k == 1 for r in per_source)
    assert set(
        r.split for r in out.select("split").distinct().collect()
    ) <= {"train", "val", "test"}


def test_winsorize_bounds_and_clip_counts(spark):
    from pos_data_insertion_etl_spark.operators.quantiles import (
        grouped_winsorize_stats,
    )

    rows = [("s", v, i) for i, v in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
         19, 1000])]
    df = spark.createDataFrame(rows, "key string, v long, id long")
    out = grouped_winsorize_stats(df, "key", "v", "id", 1, 19, 20).collect()
    r = out[0]
    # n=20: lo rank ceil(20/20)=1 -> value 1; hi rank ceil(380/20)=19
    # -> value 19; the 1000 outlier is clipped high
    assert (r.n, r.lo, r.hi) == (20, 1, 19)
    assert r.n_clipped_lo == 0 and r.n_clipped_hi == 1
    assert r.winsorized_sum == sum(range(1, 20)) + 19


def test_crawl_frontier_decision_table(spark, sf_dir):
    from pos_data_insertion_etl_spark.plans import all_queries

    rows = all_queries()["q203_crawl_frontier"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.url.endswith("/a"):
            assert r.allowed is True
        elif r.url.endswith("/b"):
            assert r.allowed is False
        else:  # /blog/sitemap-tips-N
            n = r.url.rsplit("-", 1)[1]
            assert r.allowed is n.startswith("1")


# ------------------------------------------------- q204-q206 (batch G)


def test_fuzzy_join_finds_one_edit_pairs_within_blocks_only(spark):
    from pos_data_insertion_etl_spark.operators.fuzzy import (
        edit_distance_join,
    )

    rows = [
        (1, "blue bolt", 5),
        (2, "blue belt", 5),    # dist 1, same block
        (3, "blue bolt", 9),    # identical name, DIFFERENT block
        (4, "red widget", 5),   # far from everything
        (5, "blue bolts", 5),   # dist 1 via insert
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk int")
    out = {(r.id_a, r.id_b): r.dist for r in edit_distance_join(
        df, "id", "name", "blk", max_dist=2).collect()}
    assert out[(1, 2)] == 1 and out[(1, 5)] == 1 and out[(2, 5)] == 2
    assert not any(3 in pair for pair in out), "cross-block pair leaked"
    assert not any(4 in pair for pair in out)


def test_mad_outliers_fixture(spark):
    from pos_data_insertion_etl_spark.operators.quantiles import (
        grouped_mad_outlier_stats,
    )

    # values 1..9 plus an extreme outlier; median=5(rank5 of 10),
    # devs sorted: 0,1,1,2,2,3,3,4,4,995 -> mad = rank-5 dev = 2
    rows = [("s", v, i) for i, v in enumerate([1,2,3,4,5,6,7,8,9,1000])]
    df = spark.createDataFrame(rows, "key string, v long, id long")
    r = grouped_mad_outlier_stats(df, "key", "v", "id", 3).collect()[0]
    assert (r.n, r.med, r.mad) == (10, 5, 2)
    # outliers: dev > 6 -> only the 1000 (dev 995)
    assert r.n_outliers == 1


def test_benford_digits_partition_and_bound(spark, sf_dir):
    from pos_data_insertion_etl_spark.operators.audit import (
        benford_first_digit,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rows = benford_first_digit(li, "l_extendedprice").collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    total = sum(r.observed for r in rows)
    assert total == li.filter(F.abs(F.col("l_extendedprice")) >= 1).count()
    for r in rows:
        assert r.dev_milli == abs(r.observed * 1000 - r.expected_milli)


def test_first_digit_ladder_exact(spark):
    from pos_data_insertion_etl_spark.operators.audit import (
        benford_first_digit,
    )

    vals = [1.0, 9.99, 10.5, 99.0, 123456789.5, 7e13, -456.2]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = benford_first_digit(df, "x").collect()
    got = {r.digit: r.observed for r in rows}
    assert got == {1: 3, 9: 2, 7: 1, 4: 1}


# --------------------------------------------- round-8 queue operators


def test_personalized_pagerank_concentrates_on_seed_side(spark):
    from pos_data_insertion_etl_spark.operators.graph import (
        pagerank,
        personalized_pagerank,
    )

    # two triangles bridged by one edge; seeds in the left triangle
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    g = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (2,)], "node long")
    ppr = {r.node: r for r in personalized_pagerank(g, seeds, iters=10).collect()}
    assert all(ppr[n].is_seed is (n in (1, 2)) for n in ppr)
    left = sum(ppr[n].rank_fp for n in (1, 2, 3))
    right = sum(ppr[n].rank_fp for n in (4, 5, 6))
    assert left > right  # teleport pulls mass to the seed side
    # uniform pagerank on the same graph is much more balanced
    pr = {r.node: r.rank_fp for r in pagerank(g, iters=10).collect()}
    left_u = sum(pr[n] for n in (1, 2, 3))
    right_u = sum(pr[n] for n in (4, 5, 6))
    assert left / max(right, 1) > left_u / max(right_u, 1)
    # total mass conserved within truncation drift (< iters * N units)
    total = sum(r.rank_fp for r in ppr.values())
    assert abs(total - 6 * 1_000_000_000) < 10 * 6 * 100


def test_personalized_pagerank_requires_overlapping_seeds(spark):
    import pytest as _pytest

    from pos_data_insertion_etl_spark.operators.graph import (
        personalized_pagerank,
    )

    g = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "node long")
    with _pytest.raises(ValueError):
        personalized_pagerank(g, seeds)


def test_sorted_neighborhood_join_catches_cross_block_pairs(spark):
    from pos_data_insertion_etl_spark.operators.fuzzy import (
        sorted_neighborhood_join,
    )

    rows = [
        (1, "blue bolt"),
        (2, "blue belt"),     # 1 edit, sorts adjacent
        (3, "blue bolts"),    # 1 edit from #1
        (4, "red widget"),
        (5, "zzz far away"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {(r.id_a, r.id_b): r.dist for r in sorted_neighborhood_join(
        df, "id", "name", window=3, max_dist=2).collect()}
    pairs = {frozenset(p) for p in out}
    assert frozenset({1, 2}) in pairs
    assert frozenset({1, 3}) in pairs
    assert not any(5 in p for p in pairs)
    # determinism across runs (two-phase rank + sampling-independent)
    again = {(r.id_a, r.id_b): r.dist for r in sorted_neighborhood_join(
        df, "id", "name", window=3, max_dist=2).collect()}
    assert out == again


# ------------------------------------------------- q207-q208 (batch H)


def test_interval_overlap_fixture(spark):
    from datetime import date

    from pos_data_insertion_etl_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rows = [
        (1, 1, date(2026, 1, 1), date(2026, 1, 5)),
        (1, 2, date(2026, 1, 4), date(2026, 1, 8)),   # overlaps line 1
        (1, 3, date(2026, 1, 9), date(2026, 1, 10)),  # disjoint
        (2, 1, date(2026, 1, 1), date(2026, 1, 5)),   # other key
    ]
    df = spark.createDataFrame(rows, "k long, line long, lo date, hi date")
    out = interval_overlap_join(df, "k", "lo", "hi", ["line"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.k, r.line_a, r.line_b) == (1, 1, 2)
    assert r.overlap_days == 2  # Jan 4-5


def test_interval_overlap_duplicate_rows_pair_never(spark):
    from datetime import date

    from pos_data_insertion_etl_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rows = [
        (1, 7, date(2026, 1, 1), date(2026, 1, 5)),
        (1, 7, date(2026, 1, 1), date(2026, 1, 5)),  # exact duplicate
    ]
    df = spark.createDataFrame(rows, "k long, line long, lo date, hi date")
    assert interval_overlap_join(df, "k", "lo", "hi", ["line"]).count() == 0


def test_audio_frame_energy_framing(spark):
    import numpy as np

    from pos_data_insertion_etl_spark.multimodal.binary_ops import (
        audio_frame_energy,
    )
    from pos_data_insertion_etl_spark.multimodal.wav_codec import encode_wav

    samples = np.array([1, -2, 3, 0, 5], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples, 8000)))],
        "doc_id long, content binary",
    )
    rows = {r.frame_idx: r for r in
            audio_frame_energy(df, "doc_id", "content", frame_len=2).collect()}
    assert rows[0].energy == 1 + 4 and rows[0].n_samples == 2
    assert rows[1].energy == 9 + 0 and rows[1].peak == 3
    assert rows[2].energy == 25 and rows[2].n_samples == 1  # tail frame


# ----------------------------------------- self-review regression pins


def test_duplicate_spans_merges_abutting_windows(spark):
    """Two duplicated 5-gram windows at pos 1 and 6 cover tokens 1-10
    contiguously -> ONE maximal span, not two."""
    from pos_data_insertion_etl_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e a b c d e"), (2, "x y z w v u t s r q")],
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, n=5).collect()
    mine = [r for r in spans if r.doc_id == 1]
    assert len(mine) == 1
    assert (mine[0].span_start, mine[0].span_end, mine[0].span_tokens) == (
        1, 10, 10,
    )


def test_kmeans_truncates_toward_zero_on_negative_sums(spark):
    """Components <= -1.0 make centroid sums negative even after the
    shift; the update must truncate toward zero (SQL div semantics),
    not floor."""
    from pos_data_insertion_etl_spark.operators.clustering import lloyd_kmeans

    pts = [(1, [-3.0]), (2, [-3.0]), (3, [-2.9999999])]
    df = spark.createDataFrame(pts, "id long, v array<double>")
    out = {r.id: r.dist for r in lloyd_kmeans(df, "id", "v", k=1, iters=1).collect()}
    # quantized: -2e7, -2e7, -19999999; trunc mean = -19999999
    # (floor would give -20000000 and dists {1: 1, 2: 1, 3: 0} -> {0,0,1})
    assert out == {1: 1, 2: 1, 3: 0}


def test_logistic_score_keeps_out_of_vocabulary_ids(spark):
    from pos_data_insertion_etl_spark.operators.scoring import logistic_score

    feats = spark.createDataFrame(
        [(1, "known", 1_000_000), (2, "unknown", 5_000_000)],
        "id long, feature string, x_fp long",
    )
    weights = spark.createDataFrame(
        [("known", 2_000_000)], "feature string, w_fp long"
    )
    out = {r.id: r for r in logistic_score(
        feats, weights, "id", bias_fp=-500_000).collect()}
    assert set(out) == {1, 2}  # OOV doc 2 still scored
    assert out[2].z_fp == -500_000  # bias only
    assert out[1].z_fp == -500_000 + 2_000_000


def test_interval_overlap_tied_order_cols_still_pair(spark):
    from datetime import date

    from pos_data_insertion_etl_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    # duplicate (line) key but DIFFERENT windows -> must pair
    rows = [
        (1, 7, date(2026, 1, 1), date(2026, 1, 5)),
        (1, 7, date(2026, 1, 3), date(2026, 1, 9)),
    ]
    df = spark.createDataFrame(rows, "k long, line long, lo date, hi date")
    out = interval_overlap_join(df, "k", "lo", "hi", ["line"]).collect()
    assert len(out) == 1 and out[0].overlap_days == 3  # Jan 3-5


def test_benford_ladder_covers_large_magnitudes(spark):
    from pos_data_insertion_etl_spark.multimodal import binary_ops  # noqa: F401
    from pos_data_insertion_etl_spark.operators.audit import (
        benford_first_digit,
    )

    df = spark.createDataFrame(
        [(2.5e15,), (9.2e17,), (7.0,)], "x double"
    )
    got = {r.digit: r.observed for r in benford_first_digit(df, "x").collect()}
    assert got == {2: 1, 9: 1, 7: 1}  # no multi-digit fallthrough rows


def test_centroid_drift_counts_participants_not_empty_vectors(spark):
    from pos_data_insertion_etl_spark.operators.drift import (
        embedding_centroid_drift,
    )

    old = spark.createDataFrame(
        [("g", [1.0, 0.0]), ("g", [0.0, 1.0]), ("g", [])],
        "grp string, vec array<double>",
    )
    new = spark.createDataFrame(
        [("g", [1.0, 1.0])], "grp string, vec array<double>"
    )
    r = embedding_centroid_drift(old, new, "grp", "vec").collect()[0]
    assert r.n_old == 2  # the empty vector is not a participant
    assert r.n_new == 1


def test_heavyhitter_monitor_replay_and_envelope(spark, sf_dir):
    """Round-8 queue: per-batch MG summaries persist idempotently
    (duplicate batch write changes nothing) and the merged envelope
    brackets every candidate's true total count."""
    import shutil

    from pos_data_insertion_etl_spark.streaming.jobs import (
        heavyhitter_monitor_batch,
        load_heavyhitter_counts,
    )

    out = "/tmp/graft_test_hh_monitor"
    shutil.rmtree(out, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    b0 = ev.filter(F.hour("ts") < 12)
    b1 = ev.filter(F.hour("ts") >= 12)
    heavyhitter_monitor_batch(b0, 0, out, "event_type", k=8)
    heavyhitter_monitor_batch(b1, 1, out, "event_type", k=8)
    heavyhitter_monitor_batch(b0, 0, out, "event_type", k=8)  # replay
    merged = {r.value: r for r in load_heavyhitter_counts(spark, out).collect()}
    assert merged, "expected candidates"
    truth = {
        r.event_type: r.c
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for v, r in merged.items():
        assert r.count_min <= truth[v] <= r.count_max, (v, r, truth[v])
    shutil.rmtree(out, ignore_errors=True)
