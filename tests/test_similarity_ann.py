"""Invariant tests for the approximate-ANN knobs (VERDICT r4 items 7/8).

q58/q124 sign-LSH and q75/q125 IVF are approximate by design, so they
carry rows-only oracle checks; these tests pin the properties that make
the approximations trustworthy at scale:

* seeded Gaussian planes are deterministic per seed and well-spread
  (bucket balance -- a skewed bucket is a skewed equi-join at 100 TB);
* seeded LSH achieves a recall floor vs brute force (q57's exact plan);
* IVF recall grows with nprobe (the knob does what it claims) and
  nprobe=1 reproduces the probe-own-cell plan exactly.

Floors are pinned against measured values on the sf0.01 fixture (seeded
recall 4/50, IVF recall 5->9->16 of 30 for nprobe 1/2/4) with one unit
of slack for fixture regeneration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table
from pos_data_insertion_etl_spark.functions.vectors import quantize_vec
from pos_data_insertion_etl_spark.operators.similarity import (
    _plane_dot,
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
    seeded_planes,
)

from .conftest import SF_CORRECT

_DIM = 64


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_CORRECT, "embeddings")


def test_seeded_planes_deterministic_and_shaped():
    a = seeded_planes(6, _DIM, 42)
    assert a == seeded_planes(6, _DIM, 42)
    assert a != seeded_planes(6, _DIM, 43)
    assert len(a) == 6 and all(len(row) == _DIM for row in a)
    # Gaussian directions: every plane must touch many coordinates
    # (the axis-aligned substitution has exactly one nonzero)
    assert all(sum(1 for x in row if x != 0.0) > _DIM // 2 for row in a)


def test_seeded_lsh_buckets_are_balanced(spark, emb):
    """Bucket occupancy bounds: a hot bucket is a hot join key. 6
    planes -> 64 possible buckets over 500 vectors; measured: 63
    distinct, max 22."""
    planes = seeded_planes(6, _DIM, 42)
    bits = [
        F.when(_plane_dot(F.col("embedding"), row) >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        for row in planes
    ]
    occ = (
        emb.select(F.concat(*bits).alias("bucket"))
        .groupBy("bucket")
        .count()
        .agg(F.count("*").alias("nb"), F.max("count").alias("mx"))
        .collect()[0]
    )
    assert occ.nb >= 32  # most of the keyspace in use
    assert occ.mx <= 50  # no bucket holds >10% of the corpus


def test_seeded_lsh_recall_floor(spark, emb):
    """Same-bucket candidates must recover a floor of the true top-5
    (random 64-dim fixture vectors are near-orthogonal, so ~8% recall
    at 6 planes is the theory-consistent measured value; floor 3/50)."""
    queries = emb.filter(F.col("vec_id") < 10)
    truth = _pairs(cosine_topk(emb, queries, "vec_id", "embedding", k=5))
    got = _pairs(
        lsh_bucket_topk(
            emb, queries, "vec_id", "embedding",
            k=5, n_planes=6, seed=42, dim=_DIM,
        )
    )
    assert len(truth) == 50
    assert len(truth & got) >= 3
    # every reported neighbor shares the query's bucket -> cos_sim is
    # the EXACT similarity, so reported pairs are a subset of correct
    # values even when ranks differ from the global truth
    assert got  # nonempty (empty would pass the rows-only gate)


@pytest.fixture(scope="module")
def centroids(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"),
        quantize_vec(F.col("embedding")).alias("cv"),
    )


def test_ivf_nprobe_1_is_probe_own_cell(spark, emb, centroids):
    """nprobe=1 must reproduce the original plan row-for-row: the
    query's top-1 centroid IS its assignment under the same tiebreak."""
    pred = lambda c: c.between(100, 109)  # noqa: E731
    a = ivf_topk(emb, "vec_id", "embedding", centroids, pred, k=3, nprobe=1)
    rows = {tuple(r) for r in a.collect()}
    # q75 is the registry form of the nprobe=1 plan
    from pos_data_insertion_etl_spark.plans.llm_ops import q75_ann_ivf

    assert rows == {tuple(r) for r in q75_ann_ivf(spark, SF_CORRECT).collect()}


def test_ivf_recall_grows_with_nprobe(spark, emb, centroids):
    """The recall-vs-candidates knob: measured recall@3 = 5/9/16 of 30
    for nprobe=1/2/4 on the fixture; assert strict improvement with a
    unit of slack, and that candidate quality is monotone per query
    (probing more cells can only raise the similarity floor of the
    reported top-k)."""
    pred = lambda c: c.between(100, 109)  # noqa: E731
    truth = _pairs(
        cosine_topk(
            emb, emb.filter(F.col("vec_id").between(100, 109)),
            "vec_id", "embedding", k=3,
        )
    )
    recalls = {}
    results = {}
    for nprobe in (1, 2, 4):
        df = ivf_topk(
            emb, "vec_id", "embedding", centroids, pred, k=3, nprobe=nprobe
        )
        results[nprobe] = df.collect()
        recalls[nprobe] = len(truth & {(r.query_id, r.neighbor_id) for r in results[nprobe]})
    assert recalls[1] <= recalls[2] <= recalls[4]
    assert recalls[2] >= recalls[1] + 1  # measured 5 -> 9
    assert recalls[4] >= recalls[2] + 1  # measured 9 -> 16
    # per-query top-1 similarity is monotone in nprobe
    for lo, hi in ((1, 2), (2, 4)):
        best_lo = {}
        for r in results[lo]:
            best_lo[r.query_id] = max(best_lo.get(r.query_id, -2.0), r.cos_sim)
        best_hi = {}
        for r in results[hi]:
            best_hi[r.query_id] = max(best_hi.get(r.query_id, -2.0), r.cos_sim)
        for qid, s in best_lo.items():
            assert best_hi.get(qid, -2.0) >= s


def test_ivf_nprobe_validation(emb, centroids):
    with pytest.raises(ValueError, match="nprobe"):
        ivf_topk(
            emb, "vec_id", "embedding", centroids,
            lambda c: c < 10, k=3, nprobe=0,
        )


def test_seeded_lsh_requires_dim(emb):
    with pytest.raises(ValueError, match="dim"):
        lsh_bucket_topk(
            emb, emb.limit(1), "vec_id", "embedding", seed=7
        )


def test_lsh_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Multiprobe sign-LSH: flipping the lowest-margin bits can only ADD
    candidates, so recall vs exact top-k must be >= the single-probe
    run's, and n_flip=0 must reproduce single-probe exactly. All
    deterministic (seeded planes + md5-free integer math)."""
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.operators.similarity import (
        cosine_topk,
        lsh_bucket_topk,
        lsh_multiprobe_topk,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    kw = dict(k=5, n_planes=6, seed=42, dim=64)

    single = lsh_bucket_topk(emb, queries, "vec_id", "embedding", **kw)
    zero_flip = lsh_multiprobe_topk(
        emb, queries, "vec_id", "embedding", n_flip=0, **kw
    )
    key = lambda r: (r.query_id, r.neighbor_id, r.cos_sim, r.rn)  # noqa: E731
    assert sorted(map(key, zero_flip.collect())) == sorted(
        map(key, single.collect())
    )

    multi = lsh_multiprobe_topk(
        emb, queries, "vec_id", "embedding", n_flip=2, **kw
    )
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    exact_sets: dict[int, set] = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(df):
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(
            len(want & got.get(q, set())) for q, want in exact_sets.items()
        )
        return hits / sum(len(w) for w in exact_sets.values())

    r1, rm = recall(single), recall(multi)
    assert rm >= r1, (r1, rm)
    # structure: dense ranks, no self pairs
    for r in multi.collect():
        assert r.query_id != r.neighbor_id and 1 <= r.rn <= 5


def test_lsh_knn_graph_contracts(spark, sf_dir):
    """The corpus-wide kNN graph: no broadcast of a query side, edges
    only between bucket-mates, dense per-source ranks, similarity
    ordering, and every reported edge's cosine agrees with the exact
    pairwise value."""
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.operators.similarity import (
        cosine_topk,
        lsh_knn_graph,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 300
    )
    dim = len(emb.select("embedding").first()[0])
    g = lsh_knn_graph(
        emb, "vec_id", "embedding", k=5, n_planes=4, seed=7, dim=dim
    )
    rows = g.collect()
    assert rows
    by_src: dict = {}
    for r in rows:
        assert r.src_id != r.dst_id
        by_src.setdefault(r.src_id, []).append(r)
    for src, es in by_src.items():
        rns = sorted(e.rn for e in es)
        assert rns == list(range(1, len(es) + 1))
        sims = [e.cos_sim for e in sorted(es, key=lambda e: e.rn)]
        assert sims == sorted(sims, reverse=True)
    # graph edges must agree with exact cosine values: compare a
    # handful of sources against the brute-force operator
    some = sorted(by_src)[:5]
    brute = cosine_topk(
        emb,
        emb.filter(F.col("vec_id").isin(some)),
        "vec_id",
        "embedding",
        k=300,
    ).collect()
    exact = {(r.query_id, r.neighbor_id): r.cos_sim for r in brute}
    for src in some:
        for e in by_src[src]:
            assert exact[(src, e.dst_id)] == e.cos_sim


def test_lsh_knn_graph_backfill_covers_isolated(spark, sf_dir):
    """Isolated first-pass vertices gain edges from the coarser second
    pass; already-connected vertices keep their edges untouched."""
    from pos_data_insertion_etl_spark.catalog import load_table
    from pos_data_insertion_etl_spark.operators.similarity import (
        lsh_knn_graph,
        lsh_knn_graph_backfill,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 200
    )
    dim = len(emb.select("embedding").first()[0])
    # MANY planes -> tiny buckets -> isolated vertices guaranteed
    g = lsh_knn_graph(
        emb, "vec_id", "embedding", k=3, n_planes=7, seed=3, dim=dim
    )
    covered = {r.src_id for r in g.select("src_id").distinct().collect()}
    n = emb.count()
    assert len(covered) < n, "fixture must leave isolated vertices"
    full = lsh_knn_graph_backfill(
        emb, g, "vec_id", "embedding", k=3, n_planes=2, seed=11, dim=dim
    )
    covered2 = {
        r.src_id for r in full.select("src_id").distinct().collect()
    }
    assert len(covered2) > len(covered)
    # original edges survive byte-for-byte
    before = {(r.src_id, r.dst_id, r.cos_sim, r.rn) for r in g.collect()}
    after = {(r.src_id, r.dst_id, r.cos_sim, r.rn) for r in full.collect()}
    assert before <= after


def test_lsh_knn_graph_bucket_width_cap_bounds_output(spark):
    """VERDICT r6: an adversarially hot bucket (all-identical vectors)
    must NOT produce B^2 pairs. With max_bucket_width=c the candidate
    side of every bucket is a deterministic md5-ordered c-subset, so
    each source ranks at most c candidates and the join output is
    <= N * c rows regardless of skew."""
    from pos_data_insertion_etl_spark.operators.similarity import (
        lsh_knn_graph,
    )

    n, cap = 100, 10
    df = spark.createDataFrame(
        [(i, [1.0, 0.5, -0.25, 0.125]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    g = lsh_knn_graph(
        df, "vec_id", "embedding", k=n, n_planes=2, seed=7, dim=4,
        max_bucket_width=cap,
    )
    rows = g.collect()
    per_src: dict = {}
    for r in rows:
        per_src.setdefault(r.src_id, 0)
        per_src[r.src_id] += 1
    # every source sees at most `cap` candidates (cap-1 when the source
    # itself is inside the capped subset); with k=n the window keeps
    # them all, so the per-source edge count IS the candidate count.
    assert per_src and max(per_src.values()) <= cap
    assert len(rows) <= n * cap
    # identical vectors: every vector lands in ONE bucket, so without
    # the cap each source would rank n-1 = 99 candidates.
    assert max(per_src.values()) < n - 1
    # the capped subset is deterministic: same call, same edges.
    again = lsh_knn_graph(
        df, "vec_id", "embedding", k=n, n_planes=2, seed=7, dim=4,
        max_bucket_width=cap,
    ).collect()
    assert {(r.src_id, r.dst_id, r.rn) for r in again} == {
        (r.src_id, r.dst_id, r.rn) for r in rows
    }


def test_lsh_knn_graph_auto_planes_tracks_corpus_size():
    """n_planes=None scales the plane count with N so the expected
    bucket width stays near bucket_target as the corpus grows."""
    from pos_data_insertion_etl_spark.operators.similarity import (
        knn_graph_planes_for,
    )

    assert knn_graph_planes_for(100, bucket_target=128) == 1
    assert knn_graph_planes_for(256, bucket_target=128) == 1
    assert knn_graph_planes_for(257, bucket_target=128) == 2
    assert knn_graph_planes_for(1_000_000, bucket_target=128) == 13
    # 100 TB scale: ~1e9 vectors -> 23 planes, expected width ~128
    assert knn_graph_planes_for(1_000_000_000, bucket_target=128) == 23
    # clamped so the key stays a short string even at absurd N
    assert knn_graph_planes_for(10**15, bucket_target=1) == 24
