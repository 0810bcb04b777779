"""Budgeted data mixing: fill per-source token budgets derived from
target mixture weights, selecting documents deterministically.

The last stage of a curation pipeline before packing: given "the
training run wants 50% src0 / 30% src1 / 20% src2 and a total budget of
N tokens", select documents per source until that source's budget is
full. Selection order within a source is either uniform-deterministic
(md5 of the id -- an unbiased shuffle both engines can reproduce, the
q126 source-cap idiom) or quality-first when a score column is given
(take the best documents, id tiebreak).

Scale design: one window per source partition (running token sum over
the selection order) -- the parallel unit is the source, like
q91_sequence_packing's shard. No collect, no driver loop; the weight
table rides as a literal CASE expression (mixtures are a handful of
sources by construction). Documents from sources without a weight are
dropped (weight 0).

A document is selected while its tokens START inside the budget (the
same strict-prefix rule as sequence packing), so every budget is filled
to at least its target minus one document and the cut is
order-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import tokens


def budgeted_mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    score_col: str | None = None,
    size_col: str | None = None,
) -> DataFrame:
    """Select documents to fill per-source token budgets.

    Returns [id, source, n_tokens, sel_rank, cum_before, source_budget]
    for every SELECTED document. ``weights`` need not sum to 1 -- each
    source's budget is round(weight * total_tokens) independently, so
    callers can oversample a source without renormalizing the rest.

    ``size_col`` selects the budget unit: when given, document size is
    that precomputed integer column (chars, bytes, pre-tokenized
    counts) and ``text_col`` is never read; when None, size is the
    library's whitespace token count of ``text_col``. Budget math is
    unit-agnostic -- `n_tokens` in the output is "size in the chosen
    unit". Certified-path note: cross-engine checks should prefer a
    precomputed ``size_col`` -- regex tokenization is engine-version-
    sensitive at the boundary level (`\\s` class membership differs
    across RE2/JVM builds), which three rounds of driver evidence on
    q131 established cannot be patched from inside the regex.
    """
    if not weights:
        raise ValueError("weights must name at least one source")
    budget = F.lit(None).cast("long")
    for src, wgt in sorted(weights.items()):
        budget = (
            F.when(F.col(source_col) == src, F.lit(int(round(wgt * total_tokens))))
            .otherwise(budget)
        )
    order: list[Column] = (
        [F.desc(score_col), F.col(id_col)]
        if score_col is not None
        else [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    )
    w_rank = W.partitionBy(source_col).orderBy(*order)
    w_sum = w_rank.rowsBetween(W.unboundedPreceding, W.currentRow)
    size = (
        F.col(size_col).cast("long")
        if size_col is not None
        # Count NON-EMPTY tokens explicitly: bare size(split(..))
        # counts the empty fragments regex engines emit for
        # leading/trailing whitespace, and those edge semantics are
        # engine-version-sensitive (the q131 r6 driver mismatch).
        # Filtering empties makes the count portable across Spark
        # and DuckDB builds -- the q144 funnel-oracle convention.
        else F.size(
            F.filter(tokens(text_col), lambda x: x != F.lit(""))
        ).cast("long")
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(source_col),
            size.alias("n_tokens"),
            *( [F.col(score_col)] if score_col is not None else [] ),
        )
        .withColumn("source_budget", budget)
        .filter(F.col("source_budget").isNotNull())
        .withColumn("sel_rank", F.row_number().over(w_rank).cast("long"))
        .withColumn(
            "cum_before", F.sum("n_tokens").over(w_sum) - F.col("n_tokens")
        )
        .filter(F.col("cum_before") < F.col("source_budget"))
        .select(
            id_col,
            source_col,
            "n_tokens",
            "sel_rank",
            "cum_before",
            "source_budget",
        )
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Efraimidis-Spirakis A-ES weighted sampling WITHOUT replacement,
    one pass, deterministic: item i gets key u_i^(1/w_i) with u_i a
    hashed-uniform from md5(id) -- no RNG state, so the sample is a
    pure function of (ids, weights) and reproducible on any cluster --
    and the k largest keys per stratum are the sample (inclusion
    probability proportional to weight, the classic A-ES result).

    Plan shape: one window per stratum (global stratum when
    ``stratum_col`` is None -- then the single-partition window is the
    bottleneck and callers should stratify, which is also the
    statistically better design). Keys are log-transformed
    (ln(u)/w, order-equivalent) for numeric stability and ROUNDED to
    1e-9 with an id tiebreak so the rank order is engine-portable.

    Returns the sampled rows with [es_key, sample_rank] appended.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    # u in [0, 1): nudge 0 up to avoid ln(0); 1e-13 << 16^-13 grid
    key = F.round(
        F.log(u + F.lit(1e-300)) / F.col(weight_col).cast("double"), 9
    )
    part = [stratum_col] if stratum_col else []
    # maximizing u^(1/w) == maximizing ln(u)/w (keys are negative, the
    # largest sit closest to zero) -> descending order
    w = W.partitionBy(*part).orderBy(F.desc("es_key"), F.col(id_col))
    return (
        df.withColumn("es_key", key)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def temperature_mixture_weights(
    docs: DataFrame,
    budget_tokens: int,
    sqrt_passes: int = 1,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-flattened mixture weights per source (the XLM-R /
    mC4 sampling rule): upweight small sources, downweight the head,
    with sampling probability proportional to share^alpha.

    ``alpha = 0.5 ** sqrt_passes`` -- alpha is restricted to powers of
    1/2 so the shaping is repeated IEEE sqrt (correctly rounded,
    engine-portable); an arbitrary pow() differs in the last ulp across
    libm implementations and would break exact cross-engine checks.

    Per source: token share (exact integer token counts), the shaped
    weight (1e-9 fixed point, normalized against the exact integer sum
    of shaped weights), and the per-source token budget
    round(budget_tokens * weight).

    One groupBy(source) -- sources are few by construction, so the agg
    output is tiny; the shaping math runs on that tiny frame against a
    broadcast scalar total. Scan-bound at any corpus size.

    Returns [source, n_docs, n_tokens, token_share, q_fp, weight,
    budget] sorted by source.
    """
    if sqrt_passes < 1:
        raise ValueError("sqrt_passes must be >= 1 (alpha < 1)")
    per_src = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(text_col))).cast("long").alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").cast("long").alias("_tot_tokens")
    )
    shaped = F.col("n_tokens").cast("double") / F.col("_tot_tokens").cast(
        "double"
    )
    for _ in range(sqrt_passes):
        shaped = F.sqrt(shaped)
    staged = (
        per_src.crossJoin(F.broadcast(tot))
        .withColumn(
            "q_fp", F.round(shaped * 1_000_000_000).cast("long")
        )
    )
    qtot = staged.agg(F.sum("q_fp").cast("long").alias("_qtot"))
    return (
        staged.crossJoin(F.broadcast(qtot))
        .select(
            F.col(source_col).alias("source"),
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("_tot_tokens"), 6
            ).alias("token_share"),
            "q_fp",
            F.round(
                F.col("q_fp").cast("double") / F.col("_qtot"), 6
            ).alias("weight"),
            F.round(
                F.lit(budget_tokens)
                * F.col("q_fp").cast("double")
                / F.col("_qtot")
            )
            .cast("long")
            .alias("budget"),
        )
        .orderBy("source")
    )


def epoch_shard_shuffle(
    df: DataFrame,
    n_epochs: int = 2,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch reshuffle + shard assignment -- the training
    dataloader contract: each epoch is an independent reproducible
    pseudo-random permutation of the corpus, split into n_shards
    contiguous per-worker streams.

    shard = md5(epoch:id) mod n_shards (a hash partition, NOT a global
    row_number -- so assignment is shuffle-free), and the position
    within a shard is a window ordered by the same md5 key: per-shard
    windows, parallel in n_epochs * n_shards, never a single-partition
    global sort. Epochs are generated by an explode, so one scan
    produces every epoch's assignment.

    Returns [id, epoch, shard, pos] -- pos is the 0-based position of
    the document in its (epoch, shard) stream.
    """
    keyed = df.select(F.col(id_col)).select(
        id_col,
        F.explode(
            F.array(*[F.lit(e) for e in range(n_epochs)])
        ).alias("epoch"),
    )
    h = F.md5(
        F.concat_ws(":", F.col("epoch").cast("string"), F.col(id_col))
    )
    w = W.partitionBy("epoch", "shard").orderBy("_h", id_col)
    return (
        keyed.withColumn("_h", h)
        .withColumn(
            "shard",
            (F.conv(F.substring("_h", 1, 8), 16, 10).cast("long")
             % n_shards).cast("long"),
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(
            id_col,
            F.col("epoch").cast("long").alias("epoch"),
            "shard",
            "pos",
        )
    )


def ntile_bins(
    df: DataFrame,
    order_by: list[str | Column],
    k: int,
    bin_col: str = "bin",
) -> DataFrame:
    """Exact NTILE(k) over a GLOBAL order without a single-partition
    window: global rank via the two-phase range-partition sequence
    (operators/combine.with_global_sequence), then the SQL-standard
    tile arithmetic (first n%k tiles get one extra row) as pure integer
    expressions against a broadcast scalar count.

    Matches NTILE(k) OVER (ORDER BY ...) row-for-row -- the scale-safe
    form of quantile binning (curriculum buckets, difficulty tiers)
    when the order must be exact rather than approximate.
    """
    from .combine import global_sequence_with_total

    # The global count falls out of the sequence build's per-partition
    # counts (r15 optimization round): fold it in as integer literals
    # instead of a separate count job + broadcast crossJoin per call --
    # q237 chains three of these, so that was three extra jobs over the
    # same rows. Tile arithmetic and null semantics (base == 0 when
    # n < k) are unchanged.
    seq, n = global_sequence_with_total(df, order_by, seq_col="_seq")
    rank = F.col("_seq") + 1
    base = n // k                                          # rows per small tile
    extra = n - base * k                                   # tiles with +1 row
    cut = extra * (base + 1)                               # rows in big tiles
    in_big = rank <= F.lit(cut)
    tile = F.when(
        in_big, F.ceil(rank / F.lit(base + 1))
    ).otherwise(
        F.lit(extra)
        + F.ceil((rank - F.lit(cut)) / F.when(F.lit(base) > 0, F.lit(base)))
    )
    return (
        seq.withColumn(bin_col, tile.cast("long"))
        .drop("_seq")
    )


def group_stable_split(
    df: DataFrame,
    group_col: str,
    val_hex: str = "cc",
    test_hex: str = "e6",
) -> DataFrame:
    """Leakage-correct train/val/test assignment: the split key is the
    md5 of the GROUP (source/domain/site), so every row of a group
    lands in the same split -- the property q47's per-document hash
    split cannot give (near-duplicate documents from one site straddle
    a doc-level split and leak train content into eval).

    Thresholds compare the first two md5 hex digits as strings
    ('cc' ~ 80%, 'e6' ~ 90% -- q47's published constants), which is
    engine-portable without any hex parsing. Adds a `split` column;
    a pure projection, no shuffle.
    """
    h2 = F.substring(F.md5(F.col(group_col).cast("string")), 1, 2)
    return df.withColumn(
        "split",
        F.when(h2 < F.lit(val_hex), F.lit("train"))
        .when(h2 < F.lit(test_hex), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def ipf_raking(
    cells: DataFrame,
    row_col: str,
    col_col: str,
    row_targets: DataFrame,
    col_targets: DataFrame,
    iters: int = 3,
) -> DataFrame:
    """Iterative proportional fitting (raking): reweight a two-way
    contingency table (e.g. language x source document counts) so its
    weighted marginals approach BOTH target profiles -- the classic
    survey-statistics balancer, and the principled way to hit a
    curation spec like "40% en / uniform sources" simultaneously
    instead of per-axis quota sampling.

    Exact-integer contract: weights are 1e6 fixed point; each
    half-iteration computes per-group factors target*1e6 div
    current_sum and applies w*factor div 1e6 -- truncating but
    deterministic, so an unrolled-CTE oracle replays every iteration
    bit-for-bit (the q141/q182 convention). Weighted sums use
    w*n products (bounded by 1e6 * cell totals; size targets so
    tgt*1e6*n stays under 2^63 -- at 1e12-row cells switch the scale
    to 1e3).

    Scale: ``cells`` is already the AGGREGATED contingency table
    (|rows| x |cols| cells -- build it with one groupBy upstream);
    every iteration is two tiny groupBys + two broadcast joins back.
    Never applied per-document: apply the final cell weights to the
    corpus with one broadcast join on (row, col).

    Output: [row, col, n, w_fp] after ``iters`` full iterations
    (row pass then column pass each).
    """
    w = cells.select(
        F.col(row_col).alias("row"),
        F.col(col_col).alias("col"),
        F.col("n").cast("long").alias("n"),
        F.lit(1_000_000).cast("long").alias("w_fp"),
    )
    rt = F.broadcast(
        row_targets.select(
            F.col(row_targets.columns[0]).alias("row"),
            F.col(row_targets.columns[1]).cast("long").alias("tgt"),
        )
    )
    ct = F.broadcast(
        col_targets.select(
            F.col(col_targets.columns[0]).alias("col"),
            F.col(col_targets.columns[1]).cast("long").alias("tgt"),
        )
    )
    for _ in range(iters):
        rsum = w.groupBy("row").agg(
            F.sum(F.expr("(w_fp * n) div 1000000")).alias("cur")
        )
        w = (
            w.join(F.broadcast(rsum), "row")
            .join(rt, "row")
            .select(
                "row",
                "col",
                "n",
                F.expr(
                    "(w_fp * ((tgt * 1000000) div cur)) div 1000000"
                )
                .cast("long")
                .alias("w_fp"),
            )
        )
        csum = w.groupBy("col").agg(
            F.sum(F.expr("(w_fp * n) div 1000000")).alias("cur")
        )
        w = (
            w.join(F.broadcast(csum), "col")
            .join(ct, "col")
            .select(
                "row",
                "col",
                "n",
                F.expr(
                    "(w_fp * ((tgt * 1000000) div cur)) div 1000000"
                )
                .cast("long")
                .alias("w_fp"),
            )
            # lineage cut per iteration (the pagerank/k-means loop
            # convention): 2*iters chained joins otherwise blow up
            # Catalyst analysis time exponentially
            .localCheckpoint(eager=True)
        )
    return w
