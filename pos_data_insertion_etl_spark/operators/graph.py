"""Connected components over an edge list (iterative min-label
propagation).

The missing last step of every near-dup pipeline: LSH/banding produces
PAIRS (q54/q55/q65), but deduplication needs CLUSTERS -- the connected
components of the pair graph -- so each group keeps one canonical
document. This is the engine's template for genuinely iterative
algorithms on Spark:

* state is a (node, label) DataFrame, label = min node id seen so far;
* one iteration = propagate labels across edges (join + min-aggregate,
  one shuffle) THEN pointer-jump (label := label(label), a self-join) --
  the jump roughly doubles the distance a label travels per round, so
  convergence is O(log diameter) shuffles instead of O(diameter), the
  same trick as the small-star/large-star MapReduce formulation;
* a lineage cut after each iteration (lineage.cut_lineage:
  localCheckpoint by default; reliable checkpoint() to shared storage
  when the session sets spark.pos_etl.reliableCheckpointDir, so an
  executor loss mid-iteration on a real cluster doesn't lose every
  completed round) keeps the plan from growing exponentially;
* convergence is an exact driver-side check (count of changed labels ==
  0) -- one cheap aggregate per iteration, not a data collect.

The operator raises after ``max_iter`` rather than silently returning
half-propagated labels; with jumping, 30 rounds covers any graph a
dedup pipeline can produce (diameter up to ~2^30).

GIANT components: the jump's label-keyed join degenerates once labels
converge (every member carries the root id -- one heavy key per giant
component; measured round-11, PLANS.md). Since round 12 the routing is
CODE, not a docstring: the default ``method="auto"`` folds a
max-label-frequency probe into each round's convergence aggregate and
switches mid-stream to :func:`connected_components_stars` (alternating
large-star/small-star; node-keyed joins, combinable mins) the moment
the probe sees a heavy label -- carrying the jump rounds' progress as
shortcut edges, so no work is thrown away. q291 certifies stars on
exactly the adversarial shape; q292 certifies the mid-stream switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..lineage import cut_lineage


def _driver_union_find(pairs: list[tuple]) -> dict:
    """Classic union-find with path halving; component = min node id."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    driver_threshold: int = 100_000,
    method: str = "auto",
    skew_switch_threshold: int = 200_000,
    skew_switch_rounds: int = 8,
) -> DataFrame:
    """DataFrame[node, component] for the undirected graph of ``edges``;
    component = min node id in the component.

    Adaptive strategy, same spirit as broadcast-vs-shuffle joins: an
    edge set at or below ``driver_threshold`` is collected and solved
    with union-find on the driver (one count job + one collect of two
    int columns -- bounded by the threshold), because log-diameter
    rounds of three-shuffle iterations are pure overhead for a graph
    that fits in one task. Larger graphs run the distributed
    pointer-jumping loop below. ``driver_threshold=0`` forces the
    distributed path (tests use it to pin the iteration's own
    correctness; q88 runs with it as the convergence proof).

    ``method`` selects the distributed algorithm:

    * ``"auto"`` (default) -- pointer jumping with a per-round skew
      probe: the convergence check is ONE aggregation job that also
      yields the max label frequency (groupBy(label) with map-side
      combine -- no extra job vs the old plain count, though one extra
      SHUFFLE STAGE inside it; an upfront node count therefore gates
      the probe off entirely when n_nodes <= skew_switch_threshold,
      where the skew trigger is unreachable). The moment any
      label's frequency exceeds ``skew_switch_threshold``, or the loop
      is still unconverged after ``skew_switch_rounds`` rounds (a
      diameter that long means star contraction is competitive anyway),
      the operator switches MID-STREAM to
      :func:`connected_components_stars`, feeding it the original edges
      PLUS the (node, label) shortcut edges accumulated so far --
      shortcuts are always within-component, so correctness is
      unaffected and the jump rounds' progress shrinks the effective
      diameter stars has to contract. This closes the round-11 hazard
      (VERDICT r11): a giant component's converged labels collapse the
      jump's label-keyed join onto one heavy key (measured DNF >550 s
      on a 3M-node path that stars finishes in ~124 s), and previously
      the routing advice lived only in a docstring.
    * ``"jump"`` -- pure pointer jumping, no probe, no switch (pins the
      r11 behavior for tests and measurements).
    * ``"stars"`` -- delegate directly to
      :func:`connected_components_stars`.

    Near-dup pair graphs are almost always tiny relative to the corpus
    (pairs ~ duplicates, not documents), so at 100 TB the driver path
    is usually still the right plan for the CLUSTERING stage even when
    every upstream stage is huge; raise the threshold knowingly if the
    driver has the memory.
    """
    if method not in ("auto", "jump", "stars"):
        raise ValueError(f"unknown method {method!r}")
    if method == "stars":
        return connected_components_stars(edges, src=src, dst=dst)
    if driver_threshold:
        # One job decides the path AND, when small, delivers the pairs:
        # take(threshold+1) instead of count()-then-collect(), which would
        # execute the upstream DAG (in q90 the whole MinHash->LSH->verify
        # pipeline) twice.
        probe = edges.select(src, dst).take(driver_threshold + 1)
        if len(probe) <= driver_threshold:
            pairs = [(r[0], r[1]) for r in probe]
            labels = _driver_union_find(pairs)
            id_type = dict(edges.dtypes)[src]
            return edges.sparkSession.createDataFrame(
                list(labels.items()),
                f"node {id_type}, component {id_type}",
            )
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .transform(cut_lineage, eager=True)
    )
    sym = sym.transform(cut_lineage, eager=True)
    # Probe gate (round 12): max label frequency can never exceed the
    # node count, so on a graph with n_nodes <= skew_switch_threshold
    # the skew trigger is mathematically unreachable and the per-round
    # groupBy(label) probe is a pure extra shuffle stage -- measured
    # +0.15 s/round of fixed overhead on the 200-node q88 proof graph.
    # One count job on the checkpointed labels frame buys it back; the
    # round-count switch trigger below stays active either way.
    probe_needed = method == "auto" and labels.count() > skew_switch_threshold
    for round_idx in range(max_iter):
        # min neighbor label per node, one shuffle
        nbr = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        merged = labels.join(nbr, "node", "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
        )
        # pointer jump: label := min(label, label(label))
        jmap = merged.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        updated = merged.join(jmap, merged.label == jmap.jnode, "left").select(
            "node",
            "old_label",
            F.least(
                F.col("label"), F.coalesce("jlabel", F.col("label"))
            ).alias("label"),
        )
        if method == "jump" or not probe_needed:
            # Convergence check folded into the checkpoint job (r15
            # optimization round): the observe() metric fires on the
            # lineage-cut materialization itself, so the old separate
            # changed-rows count job per round disappears -- 1/3 of the
            # per-round driver actions on the no-probe path (the same
            # Observation-on-checkpoint pattern streaming/jobs.py uses).
            #
            # CAVEAT (ADVICE r15): under a reliable checkpoint dir
            # (spark.pos_etl.reliableCheckpointDir) Dataset.checkpoint
            # can recompute the plan in the checkpoint-write job, so
            # the metric may double-count. That is safe here ONLY
            # because `changed` is compared to zero (2x0 == 0); do not
            # use it quantitatively (logging, thresholds) without
            # normalizing first.
            obs = Observation()
            updated = updated.observe(
                obs,
                F.sum(
                    (F.col("label") != F.col("old_label")).cast("long")
                ).alias("chg"),
            ).transform(cut_lineage, eager=True)
            changed = int(obs.get["chg"] or 0)
            max_cnt = 0
        else:
            updated = updated.transform(cut_lineage, eager=True)
            # Convergence + skew probe in ONE job: per-label partials
            # are map-side combinable, so even a fully-converged giant
            # component contributes one row per map partition here --
            # the probe never suffers the skew it is detecting.
            stats = (
                updated.groupBy("label")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum(
                        (F.col("label") != F.col("old_label")).cast("long")
                    ).alias("chg"),
                )
                .agg(
                    F.max("cnt").alias("max_cnt"),
                    F.sum("chg").alias("changed"),
                )
                .first()
            )
            max_cnt, changed = stats["max_cnt"], stats["changed"]
        labels = updated.select("node", "label")
        if changed == 0:
            return labels.withColumnRenamed("label", "component")
        if method == "auto" and (
            max_cnt > skew_switch_threshold
            or round_idx + 1 >= skew_switch_rounds
        ):
            return _switch_to_stars(sym, labels)
    if method == "auto":
        # Unconverged at max_iter (only reachable when max_iter <
        # skew_switch_rounds): hand the accumulated progress to stars
        # rather than raising -- stars' own max_iter is the backstop.
        return _switch_to_stars(sym, labels)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations; "
        "graph diameter exceeds the bound -- raise max_iter or use "
        "pointer doubling"
    )


def _switch_to_stars(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """Mid-stream hand-off from pointer jumping to star contraction:
    original (symmetric) edges PLUS the current (node, label) shortcut
    edges. Labels alone are NOT a valid star input mid-stream -- a node
    whose label is still itself has no shortcut edge, so the label
    graph can disconnect a component -- but labels are always min ids
    seen along a path WITHIN the node's component, so the union keeps
    connectivity exactly while shrinking the effective diameter by the
    distance the jump rounds already covered."""
    shortcuts = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("a"), F.col("label").alias("b")
    )
    return connected_components_stars(sym.union(shortcuts), src="a", dst="b")


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round over a SYMMETRIC edge set [a, b]: every
    node's strictly-larger neighbors re-attach to the minimum of its
    closed neighborhood. The min is a groupBy aggregate (map-side
    combinable -- a component-sized group costs one partial row per
    partition, never a one-key shuffle of the membership)."""
    mins = sym.groupBy("a").agg(F.min("b").alias("mb")).select(
        "a", F.least("mb", "a").alias("m")
    )
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient every edge toward the smaller id,
    then re-attach each node's smaller-or-equal neighbors (and itself)
    to the minimum among them."""
    oriented = edges.filter(F.col("a") != F.col("b")).select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
    return (
        oriented.join(mins, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(mins.select(F.col("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components_stars(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """DataFrame[node, component] via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) -- the GIANT-COMPONENT-safe alternative to
    :func:`connected_components`'s pointer jumping.

    Why a second algorithm: pointer jumping's jump step joins on the
    LABEL column (`label == jnode`), and once labels converge every
    member of a component carries the root's id -- the join key
    distribution degenerates to one heavy key per giant component, and
    one reduce task drags every remaining round (measured: a 3M-node
    single path crawls with a (31+1)/32 straggler per stage; see
    PLANS.md round-11). Star contraction never joins on labels: both
    phases join on NODE ids (key frequency == current degree, which
    AQE's skew split can partition) and their min-aggregations are
    map-side combinable, so a component-sized group costs one partial
    row per partition per round. Rounds are O(log n) w.h.p.

    For the engine's documented near-dup workload (many SMALL
    components) the default pointer jumping is equal-or-faster at low
    round counts and stays the default; route giant-component graphs
    (social/web-scale link data) here. Results are identical:
    component = min node id.

    Iterates until the edge set reaches the stable star form (both
    phases fixpoints), checked exactly via a symmetric-difference
    count; each phase output runs through lineage.cut_lineage, so a
    cluster run with spark.pos_etl.reliableCheckpointDir set survives
    executor loss mid-iteration (same contract as pointer jumping).
    """
    sym0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    nodes = (
        sym0.select("a")
        .union(sym0.select(F.col("b").alias("a")))
        .distinct()
        .select(F.col("a").alias("node"))
        .transform(cut_lineage, eager=True)
    )
    e = (
        sym0.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        grown = _large_star(sym)
        grown = grown.transform(cut_lineage, eager=True)
        nxt = _small_star(grown).transform(cut_lineage, eager=True)
        # Exact fixpoint test: small-star output is canonically oriented
        # (a > b) and distinct, so set equality == zero symmetric diff.
        changed = (
            nxt.exceptAll(e).select(F.lit(1)).union(
                e.exceptAll(nxt).select(F.lit(1))
            )
        ).count()
        e = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_stars did not converge in {max_iter} "
            "rounds -- raise max_iter"
        )
    # Stable star: e holds (member, root) for every non-root member.
    return nodes.join(
        e.select(F.col("a").alias("node"), F.col("b").alias("component")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


#: fixed-point scale for PageRank mass (1.0 == 10^9).
PR_SCALE = 1_000_000_000


def pagerank(
    edges: DataFrame,
    damping_num: int = 85,
    damping_den: int = 100,
    iters: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list [src, dst], EXACT integer
    arithmetic end to end.

    Rank mass is a fixed-point long (PR_SCALE == 1.0). Each node splits
    its mass by integer division across its out-edges and keeps the
    remainder for itself (so no mass is lost to truncation); dangling
    nodes keep all their damped mass. Per iteration:

        contrib  = rank div out_degree            (per out-edge)
        keep     = rank - out_degree * contrib    (division remainder)
        rank'    = (1-d)/N + d * (keep + sum of in-neighbor contribs)

    with the damping factor applied as the exact rational
    damping_num/damping_den via integer `div`. Each div truncates at
    most 1 fixed-point unit (1e-9) per node per iteration, so total
    mass drifts by < iters * N units -- the invariant test bounds it --
    while every operation being integer add/mul/div makes the result
    bit-identical under any partitioning, shuffle order, or engine.

    One shuffle per iteration (the contribution aggregate; degrees and
    ranks co-partition on node id), lineage truncated per round like
    connected_components. Fixed ``iters`` rather than a convergence
    test: integer ranks converge geometrically and 10 rounds puts the
    residual below 1e-3 of mass for any graph a dedup/link pipeline
    produces; callers needing tighter residuals raise ``iters``.

    Returns [node, rank_fp, rank] -- the exact fixed-point rank and its
    double rendering (rank_fp / PR_SCALE / N normalizes to a
    probability; kept raw so the invariant stays integer-exact).
    """
    sym = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    n_nodes = nodes.count()
    out_deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = nodes.join(out_deg, nodes.node == out_deg.src, "left").select(
        "node", F.coalesce("deg", F.lit(0)).alias("deg")
    ).transform(cut_lineage, eager=True)

    teleport = (damping_den - damping_num) * PR_SCALE // (damping_den)
    ranks = base.select("node", F.lit(PR_SCALE).cast("long").alias("rank_fp"))
    for _ in range(iters):
        state = base.join(ranks, "node").select(
            "node",
            "deg",
            "rank_fp",
            F.expr(
                "CASE WHEN deg > 0 THEN rank_fp div deg ELSE 0 END"
            ).alias("contrib"),
        )
        kept = state.select(
            "node",
            (F.col("rank_fp") - F.col("deg") * F.col("contrib")).alias(
                "kept_fp"
            ),
        )
        inflow = (
            sym.join(
                state.select(F.col("node").alias("src"), "contrib"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("in_fp"))
        )
        ranks = (
            kept.join(inflow, "node", "left")
            .select(
                "node",
                F.expr(
                    f"{teleport} + ((kept_fp + coalesce(in_fp, 0))"
                    f" * {damping_num}) div {damping_den}"
                ).alias("rank_fp"),
            )
            .transform(cut_lineage, eager=True)
        )
    return ranks.select(
        "node",
        "rank_fp",
        (F.col("rank_fp").cast("double") / PR_SCALE).alias("rank"),
    )


def label_propagation_majority(
    graph: DataFrame,
    labels: DataFrame,
    node_col: str,
    label_col: str,
) -> DataFrame:
    """One hop of majority-vote label propagation over a directed kNN
    graph: every src node adopts the most common label among its
    dst neighbors (ties -> smallest label), the semi-supervised
    cleanup/weak-labeling step a kNN graph feeds
    (similarity.lsh_knn_graph provides the [src_id, dst_id, ...] edges).

    Output: [node, own_label, voted_label, votes, n_neighbors,
    changed]. Deterministic: counts are exact, the argmax window
    orders (votes DESC, label ASC).

    Scale: two equi-joins on node keys (labels onto dst, own label
    back on) + one groupBy(src, label) with map-side combine + one
    per-src window. Degree is bounded by the graph's k, so every
    intermediate is O(N * k).
    """
    from pyspark.sql.window import Window as W

    votes = (
        graph.select("src_id", "dst_id")
        .join(
            labels.select(
                F.col(node_col).alias("dst_id"),
                F.col(label_col).alias("nb_label"),
            ),
            "dst_id",
        )
        .groupBy("src_id", "nb_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = W.partitionBy("src_id").orderBy(F.desc("votes"), F.asc("nb_label"))
    best = (
        votes.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_neighbors",
            F.sum("votes").over(W.partitionBy("src_id")).cast("long"),
        )
        .filter(F.col("_rn") == 1)
    )
    return (
        best.join(
            labels.select(
                F.col(node_col).alias("src_id"),
                F.col(label_col).alias("own_label"),
            ),
            "src_id",
        )
        .select(
            F.col("src_id").alias("node"),
            "own_label",
            F.col("nb_label").alias("voted_label"),
            F.col("votes").cast("long").alias("votes"),
            "n_neighbors",
            (F.col("nb_label") != F.col("own_label")).alias("changed"),
        )
    )


def triangle_count(edges: DataFrame, src: str = "src_id", dst: str = "dst_id") -> DataFrame:
    """Exact triangle census of the UNDIRECTED version of an edge list:
    canonicalize each edge to (a < b), dedup, then enumerate each
    triangle once as a < b < c via one edge-edge equi-join plus a
    closing-edge semi-join. The standard distributed formulation --
    join keys are node ids, so the join output before the closing check
    is sum(deg_out^2) over the canonical orientation, which the
    degree bound of a kNN graph keeps O(N * k^2).

    Output: one row [n_nodes, n_edges, n_triangles] (bigints).
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .transform(cut_lineage, eager=False)
    )  # five consumers (two wedge sides, closing check, node union,
    #    edge count): one canonicalize+dedup instead of five graph
    #    recomputations -- essential when `edges` is itself a kNN-graph
    #    pipeline ending in a window
    wedge = (
        und.select(F.col("a"), F.col("b"))
        .join(
            und.select(F.col("a").alias("b"), F.col("b").alias("c")),
            "b",
        )
    )  # a < b < c by construction
    tri = wedge.join(
        und.select(F.col("a"), F.col("b").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    nodes = und.select(F.col("a").alias("n")).union(
        und.select(F.col("b").alias("n"))
    ).distinct()
    return (
        nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(
            F.broadcast(
                und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
            )
        )
        .crossJoin(
            F.broadcast(
                tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
            )
        )
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    iters: int = 3,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """`iters` peeling rounds toward the k-core of the UNDIRECTED
    version of an edge list: repeatedly drop vertices with degree < k
    and the edges touching them. (Full k-core runs to a fixed point;
    a FIXED peel count keeps the operator oracle-replayable -- the
    same determinism deal as lloyd_kmeans -- and each extra round is
    one more pair of semi-joins, so callers pick the depth.)

    Output: [node, degree] for vertices surviving all rounds, with
    their degree in the surviving subgraph.

    Scale: per round, one degree groupBy (map-side combined) and two
    left-semi joins on the node key; the edge set only shrinks. The
    per-round localCheckpoint cuts lineage so `iters` rounds cost
    iters plans, not one exponentially nested one.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .transform(cut_lineage, eager=False)
    )
    for _ in range(iters):
        deg = (
            und.select(F.col("a").alias("n"))
            .unionByName(und.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("n")
        und = (
            und.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .transform(cut_lineage, eager=False)
        )
    return (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def knn_outlier_scores(
    graph: DataFrame, threshold_fp: int = 250_000
) -> DataFrame:
    """Embedding-space outlier scoring from a kNN graph: a vector whose
    nearest neighbors are all far away is isolated -- the curation
    filter that drops mis-embedded / off-distribution documents before
    semantic dedup trusts their neighborhoods.

    Input is similarity.lsh_knn_graph's [src_id, dst_id, cos_sim, rn].
    Per source: sum of neighbor cosines in exact 1e-6 fixed point
    (cos_sim is already ROUND(x, 6), so scaling by 1e6 is exact-int
    and the sum is partitioning-invariant), neighbor count, mean_fp =
    sum div n, and is_outlier = mean_fp < threshold_fp.

    Scale: one groupBy(src) over the degree-capped graph -- O(N * k)
    in, O(N) out.
    """
    return (
        graph.select(
            "src_id",
            F.round(F.col("cos_sim") * 1_000_000)
            .cast("long")
            .alias("_cfp"),
        )
        .groupBy("src_id")
        .agg(
            F.sum("_cfp").cast("long").alias("sum_cos_fp"),
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        )
        .select(
            F.col("src_id").alias("node"),
            "sum_cos_fp",
            "n_neighbors",
            F.expr("sum_cos_fp div n_neighbors").cast("long").alias(
                "mean_cos_fp"
            ),
            (
                F.expr("sum_cos_fp div n_neighbors") < F.lit(threshold_fp)
            ).alias("is_outlier"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping_num: int = 85,
    damping_den: int = 100,
    iters: int = 10,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns to a SEED set
    instead of uniformly -- the seed-expansion primitive ("find
    documents/pages relevant to this trusted set") that turns a link
    or kNN graph into a curation signal, the way DSIR turns n-gram
    statistics into one.

    Same exact-integer fixed-point contract as ``pagerank`` (per-node
    integer division with remainder kept, damping as a rational via
    integer div, one contribution shuffle per iteration, lineage cut
    per round); the only change is the teleport term:
    (1-d) * PR_SCALE * N / den div |S| on seed nodes, 0 elsewhere
    (total teleport mass matches the uniform variant, so ranks stay
    comparable across the two operators).

    ``seeds``: one column [node]. Returns [node, rank_fp, rank,
    is_seed].
    """
    sym = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    n_nodes = nodes.count()
    seed_nodes = (
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("node"))
        .join(nodes, "node", "left_semi")
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("seed set shares no node with the graph")
    out_deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = (
        nodes.join(out_deg, nodes.node == out_deg.src, "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"))
        .join(
            seed_nodes.withColumn("_is_seed", F.lit(True)), "node", "left"
        )
        .select(
            "node", "deg", F.coalesce("_is_seed", F.lit(False)).alias(
                "is_seed"
            )
        )
        .transform(cut_lineage, eager=True)
    )
    # total teleport mass = N * (1-d)/den * PR_SCALE, split across seeds
    teleport_seed = (
        (damping_den - damping_num) * PR_SCALE * n_nodes
    ) // (damping_den * n_seeds)
    ranks = base.select(
        "node", F.lit(PR_SCALE).cast("long").alias("rank_fp")
    )
    for _ in range(iters):
        state = base.join(ranks, "node").select(
            "node",
            "deg",
            "rank_fp",
            F.expr(
                "CASE WHEN deg > 0 THEN rank_fp div deg ELSE 0 END"
            ).alias("contrib"),
        )
        kept = state.select(
            "node",
            (F.col("rank_fp") - F.col("deg") * F.col("contrib")).alias(
                "kept_fp"
            ),
        )
        inflow = (
            sym.join(
                state.select(F.col("node").alias("src"), "contrib"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("in_fp"))
        )
        ranks = (
            base.select("node", "is_seed")
            .join(kept, "node")
            .join(inflow, "node", "left")
            .select(
                "node",
                F.expr(
                    f"(CASE WHEN is_seed THEN {teleport_seed} ELSE 0 END)"
                    f" + ((kept_fp + coalesce(in_fp, 0))"
                    f" * {damping_num}) div {damping_den}"
                ).alias("rank_fp"),
            )
            .transform(cut_lineage, eager=True)
        )
    return (
        base.select("node", "is_seed")
        .join(ranks, "node")
        .select(
            "node",
            "rank_fp",
            (F.col("rank_fp").cast("double") / PR_SCALE).alias("rank"),
            "is_seed",
        )
    )


#: BFS sentinel: "not yet reached" (any real hop count is far below).
BFS_UNREACHED = 1 << 20


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    prepared: bool = False,
) -> DataFrame:
    """Multi-source BFS hop distances, the graph primitive behind
    "how far is every page/document from a trusted seed set" (crawl
    frontier depth, citation distance, kNN-graph locality audits).

    Exact integer relaxation: dist starts 0 on seeds and a sentinel
    elsewhere; each round does ONE contribution shuffle
    (edges join dist on src, min(dist+1) per dst) and a keyed min
    merge -- the q141 pagerank loop shape with min() instead of sum().
    After `max_hops` rounds every node within that radius holds its
    true hop count (BFS layers are monotone), so the result is
    engine-portable and an unrolled-CTE oracle replays it exactly.

    Scale: per-round cost is one equi-join + one groupBy on dst --
    both map-side combinable; lineage cut per round (localCheckpoint)
    keeps the plan linear in rounds, not exponential. Unreached nodes
    report dist = -1, reached = false.

    ``edges``: [src, dst] (direct the edges both ways upstream for an
    undirected graph). ``seeds``: one column of node ids.

    ``prepared=True`` is the caller contract that ``edges`` is ALREADY
    long-typed [src, dst], duplicate-free, and materialized (lineage
    cut): the internal cast + distinct + cut is skipped, so a caller
    that needs the edge table for its own work (seed derivation,
    reporting) materializes it exactly once instead of twice (r15
    optimization round; results identical either way).
    """
    # The edge list is scanned once per relaxation round: cut its
    # construction lineage (often a self-join) so rounds rescan a
    # materialized table instead of replaying the build N times.
    if prepared:
        # Trust-but-verify (ADVICE r15): the contract is long-typed
        # [src, dst]. An un-cast caller would silently change the join
        # and least() semantics against the long-cast seeds; a schema
        # check costs nothing and fails loudly instead.
        dtypes = dict(edges.dtypes)
        if dtypes.get("src") != "bigint" or dtypes.get("dst") != "bigint":
            raise TypeError(
                "bfs_distances(prepared=True) requires long-typed "
                f"[src, dst]; got {edges.dtypes}"
            )
        sym = edges
    else:
        sym = (
            edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
            .distinct()
            .transform(cut_lineage, eager=True)
        )
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    seed_nodes = seeds.select(
        F.col(seeds.columns[0]).cast("long").alias("node")
    ).distinct()
    dist = nodes.join(
        seed_nodes.withColumn("_seed", F.lit(True)), "node", "left"
    ).select(
        "node",
        F.when(F.col("_seed"), F.lit(0))
        .otherwise(F.lit(BFS_UNREACHED))
        .cast("long")
        .alias("dist"),
    )
    # FRONTIER relaxation (r15 optimization round, guide §2.3 "shuffle
    # fewer bytes"): at hop h only nodes at dist == h can improve a
    # neighbor -- any node settled at d < h already contributed at hop
    # d (giving its neighbors dist <= d + 1, which min() keeps), and an
    # unreached node's contribution (sentinel + 1) can never win a
    # least() against the sentinel itself. Joining the edge table
    # against the FRONTIER instead of the whole dist table is therefore
    # result-identical while shrinking the per-hop join probe side from
    # |V| rows to one BFS layer -- the standard frontier BFS bound, and
    # exactly the rows AQE needs small to keep the edge side unshuffled
    # (broadcast) at scale.
    for hop in range(max_hops):
        frontier = dist.filter(F.col("dist") == hop)
        relaxed = (
            sym.join(
                frontier.select(F.col("node").alias("src"), "dist"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + 1).alias("md"))
        )
        dist = (
            dist.join(relaxed, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("dist"),
                    F.coalesce("md", F.lit(BFS_UNREACHED)),
                ).alias("dist"),
            )
            .transform(cut_lineage, eager=True)
        )
    return dist.select(
        "node",
        F.when(F.col("dist") >= BFS_UNREACHED, F.lit(-1))
        .otherwise(F.col("dist"))
        .cast("long")
        .alias("dist"),
        (F.col("dist") < BFS_UNREACHED).alias("reached"),
    )


HITS_SCALE = 1_000_000


def hits_scores(edges: DataFrame, iters: int = 2) -> DataFrame:
    """HITS hubs-and-authorities over a directed edge list -- the
    link-analysis complement to PageRank (a node can matter as a
    POINTER to good content without being pointed at): crawl-seed
    selection uses hubs, content ranking uses authorities.

    Integer-portable variant: scores live in 1e-6 fixed point; each
    half-step aggregates neighbor scores exactly, then renormalizes
    the total mass back to N * HITS_SCALE through a 1e-6 fixed-point
    factor (two integer divisions -- truncating but deterministic, so
    an unrolled-CTE oracle replays it). Overflow-safe for any graph:
    raw(v) <= total, so raw * factor <= N * HITS_SCALE * 1e6 ~ 2.5e19
    / N ... bounded by total * (N*SCALE*1e6/total) = N * SCALE * 1e6
    < 2^63 whenever N * 1e12 < 2^63 (N < 9e6 nodes per connected
    normalization scope; shard larger graphs by component).

    One contribution shuffle per half-step; lineage cut per round.
    Output: [node, hub_fp, auth_fp].
    """
    sym = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    n_nodes = nodes.count()
    mass = n_nodes * HITS_SCALE

    def normalize(raw: DataFrame, col: str) -> DataFrame:
        # The scaled-mass literal is pre-multiplied in Python: written
        # as `mass * 1000000` Spark parses two INT literals and ANSI-
        # overflows in 32-bit; a single >2^31 literal parses as BIGINT.
        total = raw.agg(F.sum(col).alias("_t"))
        return raw.crossJoin(F.broadcast(total)).select(
            "node",
            F.expr(
                f"({col} * ({mass * 1_000_000} div _t)) div 1000000"
            )
            .cast("long")
            .alias(col),
        )

    hub = nodes.select("node", F.lit(HITS_SCALE).cast("long").alias("hub"))
    auth = None
    for _ in range(iters):
        a_raw = (
            sym.join(hub.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = normalize(
            nodes.join(a_raw, "node", "left").select(
                "node", F.coalesce("auth", F.lit(0)).alias("auth")
            ),
            "auth",
        ).transform(cut_lineage, eager=True)
        h_raw = (
            sym.join(auth.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("hub"))
        )
        hub = normalize(
            nodes.join(h_raw, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0)).alias("hub")
            ),
            "hub",
        ).transform(cut_lineage, eager=True)
    return (
        nodes.join(hub, "node")
        .join(auth, "node")
        .select(
            "node",
            F.col("hub").alias("hub_fp"),
            F.col("auth").alias("auth_fp"),
        )
    )


def mutual_knn_pairs(
    graph: DataFrame,
    src: str = "src_id",
    dst: str = "dst_id",
    sim: str = "cos_sim",
) -> DataFrame:
    """Reciprocal (mutual) kNN filter over a directed kNN edge list:
    keep only pairs where EACH side ranks the other in its own top-k
    -- the standard high-precision cut before semantic-dedup merges
    (one-directional neighbors are asymmetric-density artifacts).

    One self-equi-join on the reversed key; pairs canonicalize as
    id_a < id_b so each mutual pair emits exactly once, with both
    directed similarities (equal for cosine, kept as a sanity
    column). Output: [id_a, id_b, sim_ab, sim_ba].
    """
    fwd = graph.select(
        F.col(src).alias("id_a"),
        F.col(dst).alias("id_b"),
        F.col(sim).alias("sim_ab"),
    )
    rev = graph.select(
        F.col(dst).alias("id_a"),
        F.col(src).alias("id_b"),
        F.col(sim).alias("sim_ba"),
    )
    return fwd.join(rev, ["id_a", "id_b"]).filter(
        F.col("id_a") < F.col("id_b")
    )


def local_clustering_coefficient(
    edges: DataFrame, src: str = "src_id", dst: str = "dst_id"
) -> DataFrame:
    """Per-node local clustering coefficient of the undirected graph:
    lcc(v) = 2 * tri(v) / (deg(v) * (deg(v) - 1)) -- "how close is
    each node's neighborhood to a clique?" The node-level companion to
    triangle_count's global census: in a kNN document graph, high-LCC
    nodes sit inside tight near-duplicate clusters while low-LCC
    high-degree nodes are hubs bridging unrelated content.

    Exact-integer output: [node, deg, n_tri, lcc_ppm] with
    lcc_ppm = (2 * n_tri * 1e6) div (deg * (deg - 1)), NULL for
    deg < 2 (undefined). Overflow contract: 2e6 * n_tri < 2^63 =>
    ~4.6e12 triangles per node, unreachable under a kNN degree cap.

    Scale: same bounded shape as triangle_count -- canonicalize once,
    one wedge equi-join (O(sum deg^2) bounded by the kNN degree cap),
    one closing-edge semi-join; each triangle then contributes one
    count to each of its three corners via an explode over a 3-element
    literal array, never a row-multiplying join. Degree comes from one
    groupBy over the exploded edge endpoints.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .transform(cut_lineage, eager=False)
    )  # four consumers: two wedge sides, the closing check, degrees
    wedge = und.select("a", "b").join(
        und.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )
    tri = wedge.join(
        und.select(F.col("a"), F.col("b").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    tri_per_node = (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return (
        deg.join(tri_per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.expr(
                "(2 * coalesce(n_tri, 0) * 1000000)"
                " div nullif(deg * (deg - 1), 0)"
            )
            .cast("long")
            .alias("lcc_ppm"),
        )
        .orderBy("node")
    )


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
) -> DataFrame:
    """K-round Bellman-Ford: multi-source WEIGHTED shortest distances
    restricted to paths of at most ``rounds`` edges -- the weighted
    sibling of :func:`bfs_distances` (min-plus relaxation instead of
    min(dist+1)).

    The K-hop bound is part of the CONTRACT, not an approximation
    knob: "cheapest cost reachable within K edges" is a well-defined
    quantity both engines replay exactly (an unrolled-CTE oracle runs
    the same K relaxations), with no convergence test whose iteration
    count could differ by engine. Callers wanting the true SSSP set
    ``rounds`` >= the graph's weighted-path hop diameter.

    Exact integer arithmetic throughout: weights are BIGINT >= 1 (a
    zero or negative weight would break the bounded-path monotonicity
    argument and is the caller's bug). Per round: ONE contribution
    shuffle (edges join dist on src, min(dist + w) per dst) and a
    keyed min merge; lineage cut per round. At 100 TB this is the
    q141/q212 loop shape -- per-round cost is an equi-join plus a
    map-side-combinable groupBy, rounds small and fixed.

    ``edges``: [src, dst, w]; direct both ways upstream if undirected.
    ``seeds``: one column of node ids. Unreached -> dist -1.
    """
    sym = (
        edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("w").cast("long"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))  # parallel edges: keep the cheapest
        .transform(cut_lineage, eager=True)
    )
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    seed_nodes = seeds.select(
        F.col(seeds.columns[0]).cast("long").alias("node")
    ).distinct()
    dist = nodes.join(
        seed_nodes.withColumn("_seed", F.lit(True)), "node", "left"
    ).select(
        "node",
        F.when(F.col("_seed"), F.lit(0))
        .otherwise(F.lit(BFS_UNREACHED))
        .cast("long")
        .alias("dist"),
    )
    for _ in range(rounds):
        relaxed = (
            sym.join(
                dist.select(F.col("node").alias("src"), "dist"), "src"
            )
            .filter(F.col("dist") < BFS_UNREACHED)  # no relax off sentinel
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("md"))
        )
        dist = (
            dist.join(relaxed, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("dist"),
                    F.coalesce("md", F.lit(BFS_UNREACHED)),
                ).alias("dist"),
            )
            .transform(cut_lineage, eager=True)
        )
    return dist.select(
        "node",
        F.when(F.col("dist") >= BFS_UNREACHED, F.lit(-1))
        .otherwise(F.col("dist"))
        .cast("long")
        .alias("dist"),
        (F.col("dist") < BFS_UNREACHED).alias("reached"),
    )
