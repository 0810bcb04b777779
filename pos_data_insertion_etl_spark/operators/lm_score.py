"""Unigram language-model scoring: per-document cross-entropy against a
corpus-trained add-one-smoothed unigram model (the CCNet-style
"perplexity filter" stage of an LLM-data pipeline, minus the external
KenLM binary -- the model is trained on the corpus itself, in-engine).

Scale design (100 TB):

* Tokenization + explode are map-side (no shuffle of text).
* The vocabulary count is ONE shuffle keyed on token -- partial
  aggregation absorbs the Zipf head ("the" combines map-side), so the
  hot keys ship one partial row per task, not one row per occurrence.
* The model is capped to the top ``top_v`` tokens and BROADCAST; rare
  tail tokens score as OOV. The scoring join is therefore map-side.
* The per-document reduce ships (doc_id, partial_sum, partial_count)
  pairs -- integer fixed-point log-probs, so partial sums are exact and
  associative regardless of partitioning.

Determinism across engines: each token's log-prob is computed ONCE, in
the (small) model table, from exact integer counts, then rounded to
1e-6 and held as a fixed-point BIGINT. Document sums are integer sums
of those fixed-point values (associative -- any shuffle order gives the
same bits); the final division and rounding are single IEEE ops on
identical operands in Spark and DuckDB.

The reference has no text-quality tier at all (its analytics are
delegated to SQL Server stored procedures, /root/reference/main.py:
181-211); this operator is part of the engine's LLM-curation surface
(SURVEY.md north star), alongside operators/quality.py and
plans/llm_ops*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: fixed-point scale for per-token log-probabilities.
LP_SCALE = 1_000_000


def tokenize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) pairs: lowercase, whitespace-split, empty-text rows
    dropped (same tokenization the DuckDB oracle applies)."""
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("tok"),
        )
    )


def unigram_model(
    tokens: DataFrame, top_v: int
) -> tuple[DataFrame, DataFrame]:
    """Train the capped unigram model.

    Returns (model, scalars): ``model`` is the top-``top_v`` tokens with
    their fixed-point add-one log-probs (broadcast-sized by
    construction); ``scalars`` is one row carrying the OOV log-prob.
    Denominator is N + V + 1 (corpus tokens + distinct vocabulary + one
    OOV class), so probabilities sum to < 1 with mass reserved for
    unseen tokens.
    """
    vocab = tokens.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    # Top-k via orderBy + limit, NOT a global row_number window (r15
    # optimization round): the unpartitioned window forced the whole
    # vocabulary through ONE task's sort; TakeOrdered keeps the per-
    # partition top-k parallel and merges only k rows per partition on
    # the driver. Same total order (count desc, token asc -- a total
    # order, so ties are deterministic), identical k survivors.
    top = vocab.orderBy(F.desc("c"), "tok").limit(top_v)
    denom = F.col("n") + F.col("v") + F.lit(1)
    model = top.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.round(
            F.log((F.col("c") + F.lit(1)).cast("double") / denom.cast("double"))
            * LP_SCALE
        )
        .cast("long")
        .alias("lp_fp"),
    )
    scalars = totals.select(
        F.round(F.log(F.lit(1.0) / denom.cast("double")) * LP_SCALE)
        .cast("long")
        .alias("oov_fp")
    )
    return model, scalars


def unigram_lm_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_v: int = 20,
    share_tokens: bool = False,
) -> DataFrame:
    """Per-document [id, n_tokens, cross_entropy, ppl_proxy].

    ``cross_entropy`` is mean negative log-prob (nats/token) under the
    corpus-trained model; ``ppl_proxy`` its exponential. High values =
    unusual token distribution = curation candidates.

    ``share_tokens=True`` materializes the exploded token table once
    (lazy localCheckpoint) so the model build and the scoring pass stop
    tokenizing the corpus twice (r16 optimization round, guide §5:
    trades executor storage -- one row per token occurrence -- for the
    second tokenize+explode pass). Results identical. Measured at
    sf0.1 the checkpoint LOSES 0.1-0.5 s (the input is cached gate
    blocks, cheap to re-tokenize), so every local caller keeps the
    default; the switch exists for deployments where the scored corpus
    is expensive to rescan.
    """
    toks = tokenize(df, text_col, id_col)
    if share_tokens:
        toks = toks.localCheckpoint(eager=False)
    model, scalars = unigram_model(toks, top_v)
    scored = (
        toks.join(F.broadcast(model), "tok", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            F.col(id_col),
            F.coalesce(F.col("lp_fp"), F.col("oov_fp")).alias("fp"),
        )
    )
    ce = (
        -F.col("sum_fp").cast("double")
        / F.lit(LP_SCALE)
        / F.col("n_tokens").cast("double")
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("fp").alias("sum_fp"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.round(ce, 6).alias("cross_entropy"),
            F.round(F.exp(F.round(ce, 6)), 4).alias("ppl_proxy"),
        )
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str, id_col: str, top_b: int = 200
) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained add-one BIGRAM
    model: mean -ln P(tok | prev) over the document's adjacent pairs.
    Documents with fewer than two tokens drop out (no bigrams to score).

    Model shape: the top ``top_b`` bigrams ride with exact conditional
    log-probs; an unseen bigram whose CONTEXT was seen backs off to the
    context's add-one floor 1/(c(prev) + V + 1) (per-context, so the
    floor is tight for rare contexts); an unseen context backs off to
    the global 1/(V + 1). Both fallback tables are broadcast alongside
    the model -- contexts are vocabulary-sized, not corpus-sized.

    Same determinism scheme as the unigram scorer: every log-prob is
    computed once in a small table from exact integer counts, rounded
    to 1e-6 fixed point; document sums are associative integer sums.
    """
    arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    bigrams = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), arr.alias("_a"))
        .filter(F.size(F.col("_a")) >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_a"), 1, F.size(F.col("_a")) - 1).alias(
                        "prev"
                    ),
                    F.slice(F.col("_a"), 2, F.size(F.col("_a")) - 1).alias(
                        "tok"
                    ),
                )
            ).alias("_bg"),
        )
        .select(F.col(id_col), F.col("_bg.prev"), F.col("_bg.tok"))
    )
    counts = bigrams.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("c"))
    ctx = counts.groupBy("prev").agg(F.sum("c").alias("c_prev"))
    vocab_n = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.explode(arr).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    denom = F.col("c_prev") + F.col("v") + F.lit(1)
    ctx_fp = ctx.crossJoin(F.broadcast(vocab_n)).select(
        "prev",
        "c_prev",
        F.round(F.log(F.lit(1.0) / denom.cast("double")) * LP_SCALE)
        .cast("long")
        .alias("ctx_oov_fp"),
    )
    # TakeOrdered top-k, not a single-task global window (see
    # unigram_model): (count desc, prev, tok) is a total order.
    model = (
        counts.orderBy(F.desc("c"), "prev", "tok").limit(top_b)
        .join(ctx_fp.select("prev", "c_prev"), "prev")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "prev",
            "tok",
            F.round(
                F.log(
                    (F.col("c") + F.lit(1)).cast("double") / denom.cast("double")
                )
                * LP_SCALE
            )
            .cast("long")
            .alias("lp_fp"),
        )
    )
    global_fp = vocab_n.select(
        F.round(
            F.log(F.lit(1.0) / (F.col("v") + F.lit(1)).cast("double"))
            * LP_SCALE
        )
        .cast("long")
        .alias("global_oov_fp")
    )
    scored = (
        bigrams.join(F.broadcast(model), ["prev", "tok"], "left")
        .join(F.broadcast(ctx_fp.select("prev", "ctx_oov_fp")), "prev", "left")
        .crossJoin(F.broadcast(global_fp))
        .select(
            F.col(id_col),
            F.coalesce(
                F.col("lp_fp"), F.col("ctx_oov_fp"), F.col("global_oov_fp")
            ).alias("fp"),
        )
    )
    ce = (
        -F.col("sum_fp").cast("double")
        / F.lit(LP_SCALE)
        / F.col("n_bigrams").cast("double")
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("fp").alias("sum_fp"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            F.round(ce, 6).alias("cross_entropy"),
        )
    )


def trigram_lm_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_t: int = 200,
    top_b: int = 200,
    top_v: int = 200,
    lambdas: tuple[int, int, int] = (5, 3, 2),
) -> DataFrame:
    """Per-document cross-entropy under a Jelinek-Mercer INTERPOLATED
    trigram model: for each trigram position,

        P(tok | p2, p1) = (l3*P3 + l2*P2 + l1*P1) / (l3+l2+l1)

    with P3/P2/P1 the add-one trigram/bigram/unigram estimates from
    exact integer corpus counts, and the lambda weights given as
    INTEGERS (the division by their sum happens once, inside the same
    expression in both engines). Interpolation -- rather than the
    bigram scorer's backoff -- is the standard fix for the trigram
    sparsity cliff: every position blends all three orders instead of
    falling off a per-context floor.

    Scale shape mirrors the other scorers: three count shuffles build
    three CAPPED broadcast tables (top_t trigrams, top_b bigrams,
    top_v unigrams -- the Zipf head carries the mass), and the context
    denominators are semi-joined down to the heads' own contexts
    (<= top_t and top_b rows) before broadcasting -- contexts outside
    the head score with the count-0 floor. Scoring is then pure
    map-side broadcast joins over the trigram stream; the per-document
    reduce sums 1e-9 fixed-point log-probs (each rounded ONCE per
    position from identically-derived doubles, so the integer sums are
    associative and engine-portable).

    Returns [id, n_trigrams, cross_entropy].
    """
    l3, l2, l1 = lambdas
    lsum = l3 + l2 + l1
    arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), arr.alias("_a"))
        .filter(F.size("_a") >= 3)
    )
    tri = base.select(
        F.col(id_col),
        F.explode_outer(
            F.zip_with(
                F.slice(F.col("_a"), 1, F.size("_a") - 2),
                F.zip_with(
                    F.slice(F.col("_a"), 2, F.size("_a") - 2),
                    F.slice(F.col("_a"), 3, F.size("_a") - 2),
                    lambda b, c: F.struct(b.alias("p1"), c.alias("tok")),
                ),
                lambda a, bc: F.struct(
                    a.alias("p2"), bc["p1"].alias("p1"), bc["tok"].alias("tok")
                ),
            )
        ).alias("_t"),
    ).select(
        F.col(id_col), F.col("_t.p2"), F.col("_t.p1"), F.col("_t.tok")
    )

    toks = base.select(F.explode_outer(F.col("_a")).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    uni_tot = uni.agg(
        F.sum("c1").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    # TakeOrdered top-k, not single-task global windows (see
    # unigram_model): each ordering is total, rows identical.
    uni_top = uni.orderBy(F.desc("c1"), "tok").limit(top_v)

    # P2's counts come from REAL adjacent pairs (the trigram stream
    # would double-count interior positions)
    pairs = base.select(
        F.explode_outer(
            F.zip_with(
                F.slice(F.col("_a"), 1, F.size("_a") - 1),
                F.slice(F.col("_a"), 2, F.size("_a") - 1),
                lambda a, b: F.struct(a.alias("p1"), b.alias("tok")),
            )
        ).alias("_p")
    ).select(F.col("_p.p1"), F.col("_p.tok"))
    bi = pairs.groupBy("p1", "tok").agg(F.count(F.lit(1)).alias("c2"))
    bctx = bi.groupBy("p1").agg(F.sum("c2").cast("long").alias("c2ctx"))
    bi_top = bi.orderBy(F.desc("c2"), "p1", "tok").limit(top_b)

    tcnt = tri.groupBy("p2", "p1", "tok").agg(F.count(F.lit(1)).alias("c3"))
    tctx = tcnt.groupBy("p2", "p1").agg(
        F.sum("c3").cast("long").alias("c3ctx")
    )
    tri_top = tcnt.orderBy(F.desc("c3"), "p2", "p1", "tok").limit(top_t)

    # The context denominators ship ONLY for contexts the capped heads
    # retain (<= top_t / top_b rows by construction): the raw tctx is
    # one row per distinct (p2,p1) bigram context -- vocabulary-squared
    # at corpus scale, an OOM broadcast (ADVICE r6). A position whose
    # context fell outside the head scores with the count-0 add-one
    # floor, exactly like a position whose n-gram did.
    tctx_top = tctx.join(
        tri_top.select("p2", "p1").distinct(), ["p2", "p1"], "left_semi"
    )
    bctx_top = bctx.join(bi_top.select("p1").distinct(), ["p1"], "left_semi")

    # P components per position, all from exact integer counts; a
    # missing head entry contributes its add-one floor with count 0.
    scored = (
        tri.join(F.broadcast(tri_top), ["p2", "p1", "tok"], "left")
        .join(F.broadcast(tctx_top), ["p2", "p1"], "left")
        .join(F.broadcast(bi_top), ["p1", "tok"], "left")
        .join(F.broadcast(bctx_top), "p1", "left")
        .join(F.broadcast(uni_top), "tok", "left")
        .crossJoin(F.broadcast(uni_tot))
    )
    p3 = (
        (F.coalesce(F.col("c3"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c3ctx"), F.lit(0)) + F.col("v") + 1).cast(
            "double"
        )
    )
    p2 = (
        (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c2ctx"), F.lit(0)) + F.col("v") + 1).cast(
            "double"
        )
    )
    p1 = (
        (F.coalesce(F.col("c1"), F.lit(0)) + 1).cast("double")
        / (F.col("n") + F.col("v") + 1).cast("double")
    )
    mix = (
        F.lit(l3) * p3 + F.lit(l2) * p2 + F.lit(l1) * p1
    ) / F.lit(lsum)
    # 1e-9 per-position fixed point (finer than the 1e-6 scorers): the
    # mix double is bit-identical across engines (exact-integer ratios
    # through IEEE ops) but ln() is only 1-ulp-accurate in any libm, so
    # a 1e-6 per-position round can flip at a half boundary. At 1e-9 a
    # single-ulp ln flip shifts the DOCUMENT sum by ~1e-9/n -- invisible
    # in the final 1e-6 rounding.
    fp = F.round(F.log(mix) * F.lit(1_000_000_000)).cast("long")
    ce = (
        -F.col("sum_fp").cast("double")
        / F.lit(1_000_000_000)
        / F.col("n_trigrams").cast("double")
    )
    return (
        scored.select(F.col(id_col), fp.alias("fp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("fp").alias("sum_fp"),
        )
        .select(
            F.col(id_col),
            "n_trigrams",
            F.round(ce, 6).alias("cross_entropy"),
        )
    )


def min_k_prob_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_v: int = 20,
    k_pct: int = 20,
) -> DataFrame:
    """Min-K% prob membership score: per document, the mean log-prob of
    its k% LEAST-probable tokens under the corpus unigram model -- the
    published membership-inference / contamination heuristic (a
    memorized or template document has suspiciously few low-probability
    tokens, so its min-k%% mean sits far above the corpus norm).

    Exactness contract: token log-probs are the unigram_model 1e-6
    fixed-point integers; the per-doc cut keeps the m =
    ceil(n_tokens * k_pct / 100) smallest by (fp, tok) -- ties share
    one fp value, so the SUM over any tie-breaking choice of m rows is
    identical and the result is partitioning-invariant; the mean is
    one integer division. An oracle replays it with the same window.

    Scale: the model join is broadcast (top_v-capped); the only
    per-doc state is a window partitioned by doc (same envelope as
    any per-document sort); output is one row per doc.

    Output: [id, n_tokens, m_tokens, mink_mean_fp].
    """
    toks = tokenize(df, text_col, id_col)
    model, scalars = unigram_model(toks, top_v)
    scored = (
        toks.join(F.broadcast(model), "tok", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            F.col(id_col),
            F.col("tok"),
            F.coalesce(F.col("lp_fp"), F.col("oov_fp")).alias("fp"),
        )
    )
    w = W.partitionBy(id_col)
    ranked = scored.select(
        F.col(id_col),
        "fp",
        F.row_number().over(w.orderBy("fp", "tok")).alias("_rn"),
        F.count(F.lit(1)).over(w).alias("n_tokens"),
    )
    kept = ranked.withColumn(
        "_m", F.expr(f"(n_tokens * {k_pct} + 99) div 100")
    ).filter(F.col("_rn") <= F.col("_m"))
    return kept.groupBy(id_col).agg(
        F.max("n_tokens").cast("long").alias("n_tokens"),
        F.max("_m").cast("long").alias("m_tokens"),
        F.expr("CAST(sum(fp) div max(_m) AS BIGINT)").alias(
            "mink_mean_fp"
        ),
    )


def kneser_ney_bigram_scores(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document cross-entropy under an (interpolated) KNESER-NEY
    bigram model with absolute discount d = 3/4 -- the smoothing that
    actually wins LM evaluations, next to q130's add-one baseline:

        P(w|u) = max(c(u,w) - d, 0)/c(u) + lam(u) * Pcont(w)
        lam(u) = d * N1+(u,.) / c(u)
        Pcont(w) = N1+(., w) / (T + 1)

    (T = distinct bigram types; the +1 reserves one continuation class
    for unseen words, keeping every probability > 0.)

    Determinism: with the rational discount the probability collapses
    to one exact fraction of integer counts --
    p = (max(4c - 3, 0) * T1 + 3 * n1u * n1w) / (4 * c_u * T1) --
    evaluated as one fixed-order IEEE division (numerator terms are
    exact in doubles at oracle scale), then ln rounded PER TERM at
    1e-9 -- the finer scale the repo reserves for operators where a
    libm ulp difference once landed a 1e-6 term on a .5 rounding
    boundary (this one did, at sf0.01). The per-document mean is then
    an EXACT integer division to micro-nats, so no double ever leaves
    the operator. A SQL oracle replays it bit-for-bit.

    Scale: the three count lookups are ORDINARY SHUFFLE equi-joins on
    (prev,tok) / prev / tok -- the bigram-count table is corpus-
    vocabulary-sized and deliberately NOT broadcast (the r6 trigram
    advice); only the 1-row type-count scalar broadcasts. The
    head-capped broadcast serving shape stays available via
    bigram_lm_scores.

    Output: [id, n_bigrams, ce_micro] (mean -ln P in micro-nats,
    exact integer).
    """
    arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    bigrams = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), arr.alias("_a"))
        .filter(F.size(F.col("_a")) >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_a"), 1, F.size(F.col("_a")) - 1).alias(
                        "prev"
                    ),
                    F.slice(F.col("_a"), 2, F.size(F.col("_a")) - 1).alias(
                        "tok"
                    ),
                )
            ).alias("_bg"),
        )
        .select(F.col(id_col), F.col("_bg.prev"), F.col("_bg.tok"))
    )
    counts = bigrams.groupBy("prev", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    ctx = counts.groupBy("prev").agg(
        F.sum("c").alias("c_u"),
        F.count(F.lit(1)).alias("n1u"),  # N1+(u, .)
    )
    cont = counts.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n1w")  # N1+(., w)
    )
    types = counts.agg(
        (F.count(F.lit(1)) + F.lit(1)).alias("t1")  # T + 1
    )
    p = (
        (
            F.greatest(F.lit(0), 4 * F.col("c") - 3).cast("double")
            * F.col("t1").cast("double")
            + F.lit(3.0)
            * F.col("n1u").cast("double")
            * F.col("n1w").cast("double")
        )
        / (
            F.lit(4.0)
            * F.col("c_u").cast("double")
            * F.col("t1").cast("double")
        )
    )
    scored = (
        bigrams.join(counts, ["prev", "tok"])
        .join(ctx, "prev")
        .join(cont, "tok")
        .crossJoin(F.broadcast(types))
        .select(
            F.col(id_col),
            F.round(F.log(p) * 1_000_000_000).cast("long").alias("fp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("fp").alias("sum_fp"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            F.expr("(-sum_fp) div (1000 * n_bigrams)")
            .cast("long")
            .alias("ce_micro"),
        )
    )
