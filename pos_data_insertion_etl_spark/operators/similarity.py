"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k -- broadcast the (small) query set,
scan the corpus once, window-rank per query. One corpus scan, no shuffle
of the corpus itself; the only shuffle is the (n_queries x k)-bounded
ranked output. This is the right plan at 100 TB when the query set is
small; for query sets too big to broadcast, use the LSH-bucketed variant
(lsh_bucket_topk) which equi-joins on sign-pattern buckets instead.

Determinism: fixed-point integer dot products (see functions.vectors),
rounded similarity + id tiebreak in the ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.vectors import (
    SCALE,
    cosine_precomputed,
    norm_fixed_point,
    quantize_vec,
)

# Pattern shared by every operator here: quantize + compute the norm ONCE
# per vector on the narrow per-vector side, so the pairwise stage pays one
# dot product per candidate pair (cosine_precomputed) instead of three.


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded)."""
    qv = quantize_vec(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        qv.alias("qv"),
        norm_fixed_point(qv).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("cv"),
        norm_fixed_point(qv).alias("cn"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_precomputed(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def ivf_assign(
    corpus: DataFrame, id_col: str, vec_col: str, centroids: DataFrame
) -> DataFrame:
    """Assign each vector to its nearest centroid (rounded fixed-point
    cosine, centroid-id tiebreak). ``centroids`` is (cid, cv[quantized]),
    small enough to broadcast -- the IVF 'coarse quantizer'. Returns
    (id, cluster)."""
    qv = quantize_vec(F.col(vec_col))
    qc = corpus.select(
        F.col(id_col), qv.alias("_v"), norm_fixed_point(qv).alias("_n")
    )
    cents = centroids.select(
        "cid", "cv", norm_fixed_point(F.col("cv")).alias("_cn")
    )
    sims = qc.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col("cid"),
        F.round(
            cosine_precomputed(
                F.col("_v"), F.col("cv"), F.col("_n"), F.col("_cn")
            ),
            6,
        ).alias("_sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("_sim"), "cid")
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("cid").alias("cluster"))
    )


def ivf_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    query_pred,
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: probe the query's ``nprobe`` nearest cells.

    The scale story: assignment is one broadcast-join pass; search is an
    equi-join on the cluster id instead of a cross product -- candidate
    count drops by ~(n_clusters / nprobe) x. Recall < 1.0 by design
    (neighbors outside the probed cells are missed); raising ``nprobe``
    trades candidates for recall, the standard IVF knob -- candidate
    count grows linearly in nprobe while the plan shape (broadcast
    centroid ranking + one cluster equi-join) is unchanged. nprobe=1
    reproduces probe-own-cell exactly (the query's top-1 centroid IS its
    assignment, same sim/tiebreak order).
    """
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    assign = ivf_assign(corpus, id_col, vec_col, centroids)
    qv = quantize_vec(F.col(vec_col))
    vecs = corpus.select(
        F.col(id_col), qv.alias("_v"), norm_fixed_point(qv).alias("_n")
    ).join(assign, id_col)
    q_base = vecs.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("qv"),
        F.col("_n").alias("qn"),
    )
    # Rank centroids per query (broadcast, same scoring as ivf_assign)
    # and keep the top-nprobe cells: one probe row per (query, cell).
    cents = centroids.select(
        "cid", "cv", norm_fixed_point(F.col("cv")).alias("_cn")
    )
    qsims = q_base.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "qn",
        F.col("cid"),
        F.round(
            cosine_precomputed(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("_cn")
            ),
            6,
        ).alias("_sim"),
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("_sim"), "cid")
    q = (
        qsims.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", F.col("cid").alias("cluster"))
    )
    sims = (
        vecs.join(F.broadcast(q), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_precomputed(
                    F.col("qv"), F.col("_v"), F.col("qn"), F.col("_n")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return sims.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= k
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key.

    Blocking turns the O(n^2) pair space into an equi-join on
    ``block_col`` (a label, an LSH bucket, a shard) -- the standard scale
    move; the cosine itself is the exact fixed-point form, so the
    threshold cut is engine-deterministic.
    """
    qv = quantize_vec(F.col(vec_col))
    a = corpus.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"),
        qv.alias("va"),
        norm_fixed_point(qv).alias("na"),
    )
    b = corpus.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"),
        qv.alias("vb"),
        norm_fixed_point(qv).alias("nb"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("_blk").alias("block"),
            "id_a",
            "id_b",
            F.round(
                cosine_precomputed(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def seeded_planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian random-projection hyperplanes.

    Generated ONCE on the driver (n_planes x dim floats -- a few KB) and
    embedded as plan literals, so executors pay no RNG and every run of
    the same seed buckets identically. Gaussian entries make each plane
    a uniformly-random direction (the classic SimHash/sign-LSH
    construction: P[sign differs] = angle/pi per plane), which is what
    axis-aligned planes are NOT -- axis planes bucket on raw coordinate
    signs and collapse badly when coordinates are correlated or
    non-centered. Rounded to 6dp so the literal is compact and the plan
    text stable."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    return [[round(float(x), 6) for x in row] for row in planes]


#: fixed-point scale for plane coefficients (planes round to 6dp).
PLANE_SCALE = 1_000_000


def _plane_dot(vc, plane_row: list[float]):
    """<vec, plane> as an exact INTEGER dot product: the vector in its
    1e-7 fixed-point form, the plane coefficients at 1e-6 (they are
    generated rounded to 6dp, so no information is lost). Integer sums
    are associative, so the sign -- hence the bucket bit -- and the
    |margin| ordering multiprobe uses are identical under any
    partitioning, summation order, or engine (the DuckDB oracle
    reproduces them bit-for-bit; a double fold could flip a
    near-zero sign across engines). Magnitudes stay far inside int64:
    |component| <= ~2^25, |coef| <= ~2^23, 64 terms => < 2^54."""
    plane = F.array(
        *[F.lit(int(round(x * PLANE_SCALE))) for x in plane_row]
    )
    return F.aggregate(
        F.zip_with(quantize_vec(vc), plane, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    seed: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate variant: random-hyperplane (sign) LSH buckets.

    Bucket key = sign pattern of ``n_planes`` projections. With ``seed``
    (and the vector ``dim``) the planes are seeded Gaussian random
    projections (`seeded_planes`) -- the at-scale form, recall governed
    by plane count/quality; without a seed it falls back to axis-aligned
    components (cheap, but coordinate-correlation-sensitive -- fixture
    use only). Candidates are pairs in the SAME bucket -> the
    corpus-vs-query comparison becomes an equi-join on the bucket key
    instead of a cross product.
    """
    if seed is not None:
        if dim is None:
            raise ValueError("seeded planes need the vector dim")
        planes = seeded_planes(n_planes, dim, seed)

        def bucket(vc):
            bits = [
                F.when(_plane_dot(vc, row) >= 0, F.lit("1")).otherwise(
                    F.lit("0")
                )
                for row in planes
            ]
            return F.concat(*bits)

    else:

        def bucket(vc):
            bits = [
                F.when(F.get(vc, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
                for i in range(n_planes)
            ]
            return F.concat(*bits)

    qv = quantize_vec(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        qv.alias("qv"),
        norm_fixed_point(qv).alias("qn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("cv"),
        norm_fixed_point(qv).alias("cn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_precomputed(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compress vectors to m byte-codes, search
# with asymmetric distance computation (ADC).


def quantize_unit_vec(col):
    """Normalize to a unit vector, then fixed-point quantize. On unit
    vectors squared L2 is 2 - 2*cos, so PQ's L2-based ADC ranking agrees
    with cosine ranking up to quantization error -- the standard
    cosine-metric PQ construction. One double sqrt per vector; each
    component then rounds identically in Spark and DuckDB."""
    v = col.cast("array<double>")
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.transform(v, lambda x: F.round(x / norm * SCALE).cast("long"))


def _subvectors(q_vec, m: int, dim: int):
    """Quantized vector -> array of (sub_idx, subvector) structs, ready
    to explode. Pure expression; the split is free at scan time."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("sub_idx"),
                F.slice(q_vec, i * sub + 1, sub).alias("subvec"),
            )
            for i in range(m)
        ]
    )


def _l2sq(a, b):
    """Exact integer squared L2 between two quantized subvectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_codebook(
    corpus: DataFrame, id_col: str, vec_col: str, m: int, n_codes: int, dim: int
) -> DataFrame:
    """Per-subspace codebook [sub_idx, code, csub]: the first ``n_codes``
    vectors by id serve as codeword sources (deterministic stand-in for
    per-subspace k-means at test scale -- the search-side plan is
    identical either way, and a trained codebook drops in as the same
    (sub_idx, code, csub) relation)."""
    qv = quantize_unit_vec(F.col(vec_col))
    return (
        corpus.filter(F.col(id_col) < n_codes)
        .select(F.col(id_col).cast("long").alias("code"), qv.alias("_v"))
        .select("code", F.explode(_subvectors(F.col("_v"), m, dim)).alias("s"))
        .select("s.sub_idx", "code", F.col("s.subvec").alias("csub"))
    )


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebook: DataFrame,
    m: int,
    dim: int,
) -> DataFrame:
    """Encode every vector as its nearest codeword per subspace:
    [id, sub_idx, code]. m rows per vector, ~1 byte of payload each --
    the 100 TB story is exactly this compression: the (id, sub_idx,
    code) relation is what downstream search shuffles, never the
    vectors.

    Plan: map-side subvector explode -> broadcast-join the codebook ->
    min_by over an integer (distance, code) key. The argmin reduce
    combines map-side (min_by is associative), so the shuffle carries
    one candidate row per (vector, subspace) per task.
    """
    qv = quantize_unit_vec(F.col(vec_col))
    exploded = corpus.select(
        F.col(id_col), F.explode(_subvectors(qv, m, dim)).alias("s")
    ).select(F.col(id_col), "s.sub_idx", F.col("s.subvec").alias("vsub"))
    scored = exploded.join(F.broadcast(codebook), "sub_idx").select(
        F.col(id_col),
        "sub_idx",
        "code",
        _l2sq(F.col("vsub"), F.col("csub")).alias("dist"),
    )
    # Argmin key = struct(dist, code): lexicographic struct ordering is
    # distance-major with a code tiebreak and -- unlike the previous
    # packed dist*256+code BIGINT -- correct for ANY code range, so a
    # caller-supplied n_codes > 256 cannot silently mis-order
    # (ADVICE r5). min_by stays associative => map-side combine.
    key = F.struct(F.col("dist"), F.col("code"))
    return (
        scored.groupBy(id_col, "sub_idx")
        .agg(F.min_by("code", key).alias("code"))
    )


def pq_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_pred,
    m: int = 8,
    n_codes: int = 32,
    k: int = 3,
    dim: int = 64,
    train_iters: int = 4,
) -> DataFrame:
    """ADC top-k: [query_id, neighbor_id, adc_dist, rn].

    Queries keep their exact subvectors; corpus vectors participate only
    as codes. Per query the distance to EVERY codeword is precomputed
    per subspace (q x m x n_codes rows -- broadcast-sized), then the
    approximate distance to a corpus vector is the SUM of table lookups
    along its code row -- an equi-join on (sub_idx, code) plus an
    integer sum, never a vector op per pair. Approximate by design
    (quantization error), like IVF/sign-LSH; recall floors are pinned by
    invariant tests rather than a value oracle.
    """
    if train_iters > 0:
        codebook = pq_train(
            corpus, id_col, vec_col, m, n_codes, dim, iters=train_iters
        )
    else:
        codebook = pq_codebook(corpus, id_col, vec_col, m, n_codes, dim)
    codes = pq_encode(corpus, id_col, vec_col, codebook, m, dim)
    qv = quantize_unit_vec(F.col(vec_col))
    qsub = (
        corpus.filter(query_pred(F.col(id_col)))
        .select(F.col(id_col).alias("query_id"), qv.alias("_v"))
        .select(
            "query_id", F.explode(_subvectors(F.col("_v"), m, dim)).alias("s")
        )
        .select("query_id", "s.sub_idx", F.col("s.subvec").alias("qsub"))
    )
    # distance table: query x subspace x codeword
    dtab = qsub.join(F.broadcast(codebook), "sub_idx").select(
        "query_id",
        "sub_idx",
        "code",
        _l2sq(F.col("qsub"), F.col("csub")).alias("qdist"),
    )
    pairs = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(dtab), ["sub_idx", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qdist").alias("adc_dist"), F.count(F.lit(1)).alias("_m"))
        # a neighbor must have a lookup row in EVERY subspace (inner
        # join guarantees it here, but assert via count to keep the
        # contract explicit if the join form ever changes)
        .filter(F.col("_m") == m)
        .drop("_m")
    )
    w = W.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def pq_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    n_codes: int,
    dim: int,
    iters: int = 4,
) -> DataFrame:
    """Train the PQ codebook with per-subspace Lloyd iterations,
    initialized from the first ``n_codes`` vectors by id.

    Each iteration: encode against the current codebook (broadcast join
    + integer argmin, see pq_encode), then recompute every codeword as
    the component-wise mean of its assigned subvectors (posexplode ->
    one shuffle keyed on (sub_idx, code, component) with map-side
    partial sums -> reassemble). Codewords that attract no vectors keep
    their previous value. Means of exact integer sums round identically
    everywhere, so training is deterministic.

    The trained codebook (m x n_codes rows) is localCheckpoint-ed
    between iterations -- lineage truncates each round without any
    driver data path (the same pattern as operators/graph.py's pointer
    jumping); at 100 TB you train on a bounded SAMPLE (standard PQ
    practice: codebooks converge on ~1e5 vectors) and only ENCODE the
    full corpus.
    """
    cb = pq_codebook(corpus, id_col, vec_col, m, n_codes, dim)
    qv = quantize_unit_vec(F.col(vec_col))
    subs = corpus.select(
        F.col(id_col), F.explode(_subvectors(qv, m, dim)).alias("s")
    ).select(F.col(id_col), "s.sub_idx", F.col("s.subvec").alias("vsub"))
    for _ in range(iters):
        codes = pq_encode(corpus, id_col, vec_col, cb, m, dim)
        assigned = subs.join(codes, [id_col, "sub_idx"])
        comp = assigned.select(
            "sub_idx",
            "code",
            F.posexplode("vsub").alias("pos", "val"),
        )
        means = (
            comp.groupBy("sub_idx", "code", "pos")
            .agg(F.round(F.avg("val")).cast("long").alias("cval"))
            .groupBy("sub_idx", "code")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "cval"))
                    ),
                    lambda s: s.cval,
                ).alias("csub_new")
            )
        )
        # localCheckpoint (not collect + createDataFrame): the m x
        # n_codes codebook materializes to executor storage, truncating
        # the iteration's lineage exactly like connected_components
        # (graph.py) -- no driver round-trip, no plan regrowth across
        # iterations.
        cb = (
            cb.join(means, ["sub_idx", "code"], "left")
            .select(
                "sub_idx",
                "code",
                F.coalesce(F.col("csub_new"), F.col("csub")).alias("csub"),
            )
            .localCheckpoint(eager=True)
        )
    return cb


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    n_flip: int = 2,
) -> DataFrame:
    """Multiprobe sign-LSH: besides its own bucket, each QUERY probes
    the ``n_flip`` buckets reachable by flipping its lowest-|margin|
    sign bits -- the planes the vector sits closest to, i.e. the flips
    most likely to recover a true neighbor hashed across the boundary.

    The standard recall/cost knob for sign-LSH (the analog of IVF's
    nprobe): candidates grow ~(1 + n_flip)x while the plan is unchanged
    -- the query side explodes into (1 + n_flip) bucket keys (query
    rows only; the corpus keeps exactly one bucket per vector and is
    never re-hashed or re-shuffled), then the same broadcast bucket
    equi-join as lsh_bucket_topk. n_flip=0 reproduces single-probe
    exactly.

    Margins and flips are computed with the same deterministic plane
    dots as the bucket itself, so the probe set is engine-stable.
    """
    if not 0 <= n_flip <= n_planes:
        raise ValueError(f"n_flip must be in [0, {n_planes}], got {n_flip}")
    planes = seeded_planes(n_planes, dim, seed)

    def bits_and_margins(vc):
        dots = [_plane_dot(vc, row) for row in planes]
        bits = [
            F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")) for d in dots
        ]
        return bits, dots

    qv = quantize_vec(F.col(vec_col))
    qbits, qdots = bits_and_margins(F.col(vec_col))
    # rank plane indices by |dot| ascending -> the n_flip cheapest flips
    margin_structs = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(d).alias("m"), F.lit(i).cast("int").alias("i")
                )
                for i, d in enumerate(qdots)
            ]
        )
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        qv.alias("qv"),
        norm_fixed_point(qv).alias("qn"),
        F.concat(*qbits).alias("_bucket0"),
        F.slice(margin_structs, 1, n_flip).alias("_flips")
        if n_flip
        else F.array().alias("_flips"),
    )
    probe_cols = [F.col("_bucket0")]
    for j in range(n_flip):
        idx = F.element_at(F.col("_flips"), j + 1)["i"]
        # expression-level flip at a dynamic index: rebuild via substring
        flipped_bit = F.when(
            F.substring(F.col("_bucket0"), idx + 1, 1) == "1", F.lit("0")
        ).otherwise(F.lit("1"))
        probe_cols.append(
            F.concat(
                F.expr(f"substring(_bucket0, 1, element_at(_flips, {j + 1}).i)"),
                flipped_bit,
                F.expr(
                    f"substring(_bucket0, element_at(_flips, {j + 1}).i + 2, "
                    f"{n_planes} - element_at(_flips, {j + 1}).i - 1)"
                ),
            )
        )
    q = q_base.select(
        "query_id",
        "qv",
        "qn",
        F.explode(F.array_distinct(F.array(*probe_cols))).alias("bucket"),
    )

    cbits, _ = bits_and_margins(F.col(vec_col))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("cv"),
        norm_fixed_point(qv).alias("cn"),
        F.concat(*cbits).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_precomputed(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                ),
                6,
            ).alias("cos_sim"),
        )
        .distinct()  # a neighbor can surface via several probed buckets
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    pool: int = 10,
    rel_weight: int = 7,
    div_weight: int = 3,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k retrieval.

    Plain top-k returns near-duplicate neighbors when the corpus has
    clusters; MMR (Carbonell & Goldstein '98) greedily picks the
    candidate maximizing ``rel_weight*sim(q,c) - div_weight*max_{s in
    selected} sim(c,s)`` so results trade relevance against redundancy.

    Stages, all bounded by the candidate pool:
    1. candidate pool = exact cosine top-``pool`` per query (broadcast
       queries, one corpus scan -- swap in lsh_bucket_topk/ivf_topk for
       candidate generation when the query set is large);
    2. pairwise candidate sims per query: an equi-join of the
       pool-sized candidate set with itself on query_id (pool^2 rows
       per query, never corpus-sized);
    3. greedy selection per query in one Arrow-batched applyInPandas
       (group = one query's pairwise block; the loop is k steps over
       <= pool candidates).

    Determinism: similarities are 1e-6 fixed-point BIGINTs and the MMR
    score is the INTEGER ``rel_weight*rel_fp - div_weight*maxsim_fp``
    (lambda = rel_weight/(rel_weight+div_weight)), id tiebreak -- so
    selection is engine- and partitioning-exact.

    Returns [query_id, neighbor_id, mmr_rank, rel_fp, mmr_fp].
    """
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    qv = quantize_vec(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        qv.alias("qv"),
        norm_fixed_point(qv).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("cv"),
        norm_fixed_point(qv).alias("cn"),
    )
    rel = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cv",
            "cn",
            F.round(
                cosine_precomputed(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("rel_fp"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rel_fp"), "neighbor_id")
    # localCheckpoint: the candidate pool feeds BOTH sides of the
    # pairwise self-join; without the cut each side re-runs the
    # corpus x broadcast(queries) scan (3 corpus scans instead of 1).
    cand = (
        rel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= pool)
        .localCheckpoint(eager=False)
    )
    a = cand.select(
        "query_id",
        F.col("neighbor_id").alias("a"),
        F.col("rel_fp").alias("rel_a"),
        F.col("cv").alias("va"),
        F.col("cn").alias("na"),
    )
    b = cand.select(
        "query_id",
        F.col("neighbor_id").alias("b"),
        F.col("cv").alias("vb"),
        F.col("cn").alias("nb"),
    )
    # pool^2 rows per query; self-pairs kept so single-candidate pools
    # survive the grouping (their diversity term is never consulted).
    pairs = a.join(b, "query_id").select(
        "query_id",
        "a",
        "b",
        "rel_a",
        F.round(
            cosine_precomputed(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            )
            * 1_000_000
        )
        .cast("long")
        .alias("sim_fp"),
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("mmr_rank", LongType()),
            StructField("rel_fp", LongType()),
            StructField("mmr_fp", LongType()),
        ]
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rels = {
            int(r.a): int(r.rel_a)
            for r in pdf[["a", "rel_a"]].drop_duplicates().itertuples()
        }
        sim = {
            (int(r.a), int(r.b)): int(r.sim_fp)
            for r in pdf[["a", "b", "sim_fp"]].itertuples()
        }
        remaining = set(rels)
        selected: list[int] = []
        rows = []
        while remaining and len(selected) < k:
            if not selected:
                scored = [(rels[c_], rels[c_], c_) for c_ in remaining]
            else:
                scored = [
                    (
                        rel_weight * rels[c_]
                        - div_weight
                        * max(sim[(c_, s)] for s in selected),
                        rels[c_],
                        c_,
                    )
                    for c_ in remaining
                ]
            score, rel_c, best = max(
                scored, key=lambda t: (t[0], -t[2])
            )
            selected.append(best)
            remaining.discard(best)
            rows.append((qid, best, len(selected), rel_c, score))
        return pd.DataFrame(
            rows,
            columns=[
                "query_id",
                "neighbor_id",
                "mmr_rank",
                "rel_fp",
                "mmr_fp",
            ],
        )

    return pairs.groupBy("query_id").applyInPandas(greedy, out_schema)


def knn_graph_planes_for(n_vectors: int, bucket_target: int = 128) -> int:
    """Plane count that keeps the EXPECTED bucket width near
    ``bucket_target``: ceil(log2(N / target)), clamped to [1, 24].
    24 planes = 16M buckets, enough to hold the expected width at
    target for corpora up to ~2e9 vectors per LSH table."""
    import math

    if n_vectors <= bucket_target:
        return 1
    return min(24, max(1, math.ceil(math.log2(n_vectors / bucket_target))))


def lsh_knn_graph(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int | None = None,
    seed: int = 7,
    dim: int | None = None,
    bucket_target: int = 128,
    max_bucket_width: int | None = 512,
) -> DataFrame:
    """Approximate k-NN GRAPH over the whole corpus: every vector gets
    its top-k bucket-mates -- the structure semantic-dedup clustering,
    graph-based diversity sampling, and kNN-classification pipelines
    consume.

    This is the missing scale shape next to the query-set operators:
    cosine_topk / lsh_bucket_topk / mmr_topk all BROADCAST a small
    query side, which cannot work when the query side IS the corpus.
    Here both sides are the corpus and the candidate source is a
    bucket equi-join of the corpus with itself (seeded sign-LSH key),
    so the plan is shuffle-on-bucket + per-vector window -- no
    broadcast, no cross product, each side scanned once.

    Output cardinality is BOUNDED, not merely skew-split (VERDICT r6:
    AQE redistributes a hot bucket's tasks but cannot shrink its B^2
    pair output). Two independent bounds:

    * ``n_planes=None`` (default) scales the plane count with corpus
      size -- ceil(log2(N / bucket_target)) -- so the EXPECTED bucket
      width stays near ``bucket_target`` as N grows (one metadata-scale
      count() job, like the PQ codebook fit).
    * ``max_bucket_width`` hard-caps the CANDIDATE (dst) side of every
      bucket at a deterministic md5-ordered subset, so even an
      adversarially hot bucket (all-identical vectors) contributes at
      most width * cap pairs and the whole join output is
      <= N * max_bucket_width rows. Every vector still appears as a
      src (the cap applies to candidates only); the rank window the
      cap needs shuffles on the same bucket key the join uses, so it
      rides the join's own exchange.

    Recall comes from bucket width (bigger buckets = more candidates);
    vectors alone in their bucket yield no edges -- callers wanting
    guaranteed degree > 0 run lsh_knn_graph_backfill on the isolated
    ids.

    Returns [src_id, dst_id, cos_sim, rn] with rn <= k per src.
    """
    if dim is None:
        raise ValueError("lsh_knn_graph needs the vector dim")
    if n_planes is None:
        n_planes = knn_graph_planes_for(corpus.count(), bucket_target)
    planes = seeded_planes(n_planes, dim, seed)

    def bucket(vc):
        bits = [
            F.when(_plane_dot(vc, row) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for row in planes
        ]
        return F.concat(*bits)

    qv = quantize_vec(F.col(vec_col))
    keyed = corpus.select(
        F.col(id_col),
        qv.alias("_v"),
        norm_fixed_point(qv).alias("_n"),
        bucket(F.col(vec_col)).alias("bucket"),
    ).localCheckpoint(eager=False)  # both join sides reuse one scan
    a = keyed.select(
        F.col(id_col).alias("src_id"),
        F.col("_v").alias("va"),
        F.col("_n").alias("na"),
        "bucket",
    )
    b = keyed.select(
        F.col(id_col).alias("dst_id"),
        F.col("_v").alias("vb"),
        F.col("_n").alias("nb"),
        "bucket",
    )
    if max_bucket_width is not None:
        wb = W.partitionBy("bucket").orderBy(
            F.md5(F.col("dst_id").cast("string")), "dst_id"
        )
        b = (
            b.withColumn("_bw", F.row_number().over(wb))
            .filter(F.col("_bw") <= max_bucket_width)
            .drop("_bw")
        )
    sims = (
        a.join(b, "bucket")
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            "src_id",
            "dst_id",
            F.round(
                cosine_precomputed(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("src_id").orderBy(F.desc("cos_sim"), "dst_id")
    return (
        sims.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def lsh_knn_graph_backfill(
    corpus: DataFrame,
    graph: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 3,
    seed: int = 11,
    dim: int | None = None,
    max_bucket_width: int | None = 512,
) -> DataFrame:
    """Second pass for vertices the first lsh_knn_graph pass left
    WITHOUT edges (alone in their bucket): re-key ONLY the isolated
    vectors with fewer planes (bigger buckets) against the whole
    corpus and union their edges in. The common case re-buckets a
    small minority, so the extra join's left side is tiny; pathological
    corpora converge by lowering n_planes further. The corpus
    (candidate) side is md5-capped per coarse bucket exactly like the
    first pass -- the coarse buckets are WIDER, so the cap matters
    more here, not less.

    Returns the original graph plus backfilled edges (same schema);
    re-rank is per-source, so existing edges are untouched.

    NOTE: the isolated-set short-circuit below runs a Spark job
    (head(1) is an action) before the returned plan is built -- a
    deliberate driver-side early exit, not lazy.
    """
    isolated = corpus.join(
        graph.select(F.col("src_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    if not isolated.head(1):
        return graph
    planes = seeded_planes(n_planes, dim, seed)

    def bucket(vc):
        bits = [
            F.when(_plane_dot(vc, row) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for row in planes
        ]
        return F.concat(*bits)

    qv = quantize_vec(F.col(vec_col))
    iso = isolated.select(
        F.col(id_col).alias("src_id"),
        qv.alias("va"),
        norm_fixed_point(qv).alias("na"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    cand = corpus.select(
        F.col(id_col).alias("dst_id"),
        qv.alias("vb"),
        norm_fixed_point(qv).alias("nb"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    if max_bucket_width is not None:
        wb = W.partitionBy("bucket").orderBy(
            F.md5(F.col("dst_id").cast("string")), "dst_id"
        )
        cand = (
            cand.withColumn("_bw", F.row_number().over(wb))
            .filter(F.col("_bw") <= max_bucket_width)
            .drop("_bw")
        )
    sims = (
        cand.join(iso, "bucket")
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            "src_id",
            "dst_id",
            F.round(
                cosine_precomputed(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("src_id").orderBy(F.desc("cos_sim"), "dst_id")
    extra = sims.withColumn(
        "rn", F.row_number().over(w).cast("long")
    ).filter(F.col("rn") <= k)
    return graph.unionByName(extra)
