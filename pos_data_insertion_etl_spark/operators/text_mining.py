"""Corpus-mining operators: n-gram novelty and collocation detection.

LLM-pipeline additions next to operators/quality.py's per-document
gates: these two need CORPUS-level statistics (first-occurrence order,
global unigram/bigram counts), so their scale shape is "explode to
digest-keyed rows, aggregate with map-side combine, join the small
statistic back" -- text itself is never a shuffle key (the q154
dup-ngram convention: md5 digests shuffle, raw grams do not).

Determinism: all scores are exact integers or single IEEE expressions
over exact-integer operands evaluated in one fixed order, so a DuckDB
oracle reproduces them bit-for-bit (plans/llm_ops10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import shingles, tokens


def ngram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty in corpus order: the fraction of the
    doc's DISTINCT n-grams whose first corpus occurrence (min id over
    all docs) is this doc. Documents late in the corpus that repeat
    earlier content score low -- the streaming-ingest view of
    memorization/duplication (complements q154's symmetric dup-ngram
    fraction, which has no order).

    Output: [id, n_grams, novel, novelty_milli] where novelty_milli =
    (novel * 1000) div n_grams, NULL for docs with < n tokens.

    Scale: grams shuffle as md5 digests (16 bytes, never text); the
    first-occurrence id rides a WINDOW over the digest exchange (a
    groupBy+join-back would re-explode the corpus a second time --
    same single-scan argument as duplicate_spans' occurrence count),
    then one groupBy(id). Nothing corpus-sized is collected.
    """
    grams = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(shingles(tokens(F.lower(F.col(text_col))), n))
        ).alias("_g"),
    ).select("_id", F.md5(F.col("_g")).alias("_d"))
    per_doc = (
        grams.withColumn(
            "_first", F.min("_id").over(W.partitionBy("_d"))
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("_first") == F.col("_id"), 1).otherwise(0)
            ).alias("novel"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("_id"), "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("novel", F.lit(0)).cast("long").alias("novel"),
            F.expr("(novel * 1000) div n_grams").cast("long").alias(
                "novelty_milli"
            ),
        )
    )


def bigram_collocations(
    docs: DataFrame,
    text_col: str = "text",
    top: int = 50,
) -> DataFrame:
    """Collocation mining: the `top` most frequent adjacent token pairs
    with their lift = P(ab) / (P(a)P(b)) ~ (c_ab * T) / (c_a * c_b),
    T = total bigram occurrences.

    Ranking is by EXACT integers (c_ab DESC, bigram ASC); lift is one
    fixed-order IEEE expression over exact counts
    (double(c_ab) * T / c_a / c_b), so both rank and value replay in
    any engine. At corpora where c_ab * T would overflow a double's
    53-bit integer range (~9e15 bigrams), lift becomes approximate but
    the ranking stays exact -- upgrade the lift operands to DECIMAL if
    certified digits matter at that scale.

    Scale: two token-keyed groupBys (map-side combined), one join of
    bigram counts to the two unigram-count sides, one broadcast scalar
    T, and a driver-sized top-k.
    """
    toks = tokens(F.lower(F.col(text_col)))
    bigrams = docs.select(
        F.explode(shingles(toks, 2)).alias("bigram")
    )
    # both count tables feed two consumers (join sides / the scalar
    # total): cut lineage once instead of re-exploding the corpus
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
        .localCheckpoint(eager=False)
    )
    bi = (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    t_total = bi.agg(F.sum("c_ab").cast("long").alias("t_total"))
    split = F.split(F.col("bigram"), " ", 2)
    scored = (
        bi.withColumn("w1", split.getItem(0))
        .withColumn("w2", split.getItem(1))
        .join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .crossJoin(F.broadcast(t_total))
        .select(
            "bigram",
            "c_ab",
            "c_a",
            "c_b",
            (
                F.col("c_ab").cast("double")
                * F.col("t_total")
                / F.col("c_a")
                / F.col("c_b")
            ).alias("lift"),
        )
    )
    # distributed top-k first (TakeOrderedAndProject), THEN the rank
    # window over the `top`-row remainder -- a global row_number before
    # the cut would funnel every bigram through one partition
    head = scored.orderBy(F.desc("c_ab"), "bigram").limit(top)
    w = W.orderBy(F.desc("c_ab"), "bigram")
    return head.withColumn("rn", F.row_number().over(w).cast("long"))


def source_ngram_overlap(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    sources, the exact overlap of their distinct n-gram sets -- the
    leakage audit run before treating subcorpora as independent
    (train-vs-benchmark, crawl-vs-licensed, epoch-vs-epoch).

    Output: [source_a, source_b, n_common, n_a, n_b, jaccard_milli,
    containment_milli] for source_a < source_b; containment uses the
    smaller side (the asymmetric "is one inside the other" signal).

    Scale: distinct (source, digest) pairs shuffle as md5 digests; the
    pair join fans out per digest by at most S^2 where S is the number
    of SOURCES (tens, not documents), so even a universally shared
    n-gram contributes S^2 rows, not corpus^2.
    """
    sd = (
        docs.select(
            F.col(source_col).alias("_s"),
            F.explode(
                F.array_distinct(
                    shingles(tokens(F.lower(F.col(text_col))), n)
                )
            ).alias("_g"),
        )
        .select("_s", F.md5(F.col("_g")).alias("_d"))
        .distinct()
        .localCheckpoint(eager=False)
    )  # three consumers: sizes + both pair sides
    sizes = sd.groupBy("_s").agg(F.count(F.lit(1)).alias("_n"))
    pairs = (
        sd.select(F.col("_s").alias("source_a"), "_d")
        .join(sd.select(F.col("_s").alias("source_b"), "_d"), "_d")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.join(
            sizes.select(F.col("_s").alias("source_a"), F.col("_n").alias("n_a")),
            "source_a",
        )
        .join(
            sizes.select(F.col("_s").alias("source_b"), F.col("_n").alias("n_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("(n_common * 1000) div (n_a + n_b - n_common)")
            .cast("long")
            .alias("jaccard_milli"),
            F.expr("(n_common * 1000) div least(n_a, n_b)")
            .cast("long")
            .alias("containment_milli"),
        )
    )


def token_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token-distribution Shannon entropy, the lexical-
    diversity / degenerate-repetition signal (a doc that repeats one
    token has H=0; uniform vocabulary maximizes H).

    Portability follows operators/lm_score.py's convention: each
    distinct token contributes c * round(ln(c/n) * 1e6) -- the ln is
    rounded to fixed point PER TERM, so the cross-token sum is exact
    integer arithmetic and partitioning-invariant; entropy_fp =
    -(sum div n) (micro-nats).

    Scale: one (id, token) groupBy + one per-id groupBy, both
    map-side combined; token text is a shuffle key only at the
    per-doc level where it is already bounded by doc length.
    """
    tf = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"),
        )
        .groupBy("_id", "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wn = W.partitionBy("_id")
    per_tok = tf.withColumn("_n", F.sum("_c").over(wn)).select(
        "_id",
        "_n",
        (
            F.col("_c")
            * F.round(
                F.log(F.col("_c").cast("double") / F.col("_n").cast("double"))
                * 1_000_000
            ).cast("long")
        ).alias("_term_fp"),
    )
    return (
        per_tok.groupBy("_id")
        .agg(
            F.max("_n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum("_term_fp").cast("long").alias("_s"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "n_distinct",
            F.expr("-(_s div n_tokens)").cast("long").alias("entropy_fp"),
        )
    )


def chi2_token_class(
    docs: DataFrame,
    text_col: str,
    label_col,
    min_df_pct: int = 5,
) -> DataFrame:
    """Chi-squared token/class association: which tokens are over- or
    under-represented in a document class -- the classic feature-
    selection signal for quality/contamination classifiers and the
    fastest way to surface class-leaking shortcuts in training data.

    Per token the 2x2 contingency (a = class docs containing it,
    b = other docs containing it, c/d = the complements) is built from
    ONE distinct-(doc,token) explode + one groupBy; the class totals
    are a 1-row broadcast. chi2 = n*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    is evaluated in doubles cast from exact integers in one fixed
    expression order -- at oracle scale every sub-product is below
    2^53 so the value is exact; at corpus scale it stays deterministic
    IEEE (identical operands, identical order) even once products
    round. Integer arithmetic would ANSI-overflow first (counts^4).

    Tokens must appear in >= min_df_pct% of docs (relative threshold
    -- scale-free) and NOT in every doc (degenerate (c+d)=0 row).

    Output: [token, n_class, n_rest, chi2] with chi2 rounded 1e-6.
    """
    lab = docs.select(
        F.col("doc_id"),
        label_col.alias("_is_class"),
        F.col(text_col).alias("_text"),
    )
    tok_docs = (
        lab.select(
            "doc_id",
            "_is_class",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.trim(F.col("_text"))), r"\s+"),
                        lambda x: x != "",
                    )
                )
            ).alias("token"),
        )
    )
    totals = lab.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum(F.when(F.col("_is_class"), 1).otherwise(0)).alias(
            "_n_class"
        ),
    )
    counts = tok_docs.groupBy("token").agg(
        F.sum(F.when(F.col("_is_class"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("_is_class"), 0).otherwise(1))
        .cast("long")
        .alias("b"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter(
            ((F.col("a") + F.col("b")) * 100 >= F.lit(min_df_pct) * F.col("_n_docs"))
            & (F.col("a") + F.col("b") < F.col("_n_docs"))
        )
        .select(
            "token",
            F.col("a").alias("n_class"),
            F.col("b").alias("n_rest"),
            F.round(
                F.expr(
                    "CAST(_n_docs AS DOUBLE)"
                    " * (CAST(a AS DOUBLE) * CAST(_n_docs - _n_class - b AS DOUBLE)"
                    "    - CAST(b AS DOUBLE) * CAST(_n_class - a AS DOUBLE))"
                    " * (CAST(a AS DOUBLE) * CAST(_n_docs - _n_class - b AS DOUBLE)"
                    "    - CAST(b AS DOUBLE) * CAST(_n_class - a AS DOUBLE))"
                    " / (CAST(a + b AS DOUBLE)"
                    "    * CAST(_n_docs - a - b AS DOUBLE)"
                    "    * CAST(_n_class AS DOUBLE)"
                    "    * CAST(_n_docs - _n_class AS DOUBLE))"
                ),
                6,
            ).alias("chi2"),
        )
    )


#: ln fixed point for the log-log fits below: 1e3 keeps
#: sum((ln*1e3)^2) inside BIGINT out to ~1e9-term vocabularies
#: ((ln 3e10 * 1e3)^2 * 1e9 ~ 6e17).
LN_FIT_SCALE = 1_000


def space_tokens(col) -> "F.Column":
    """LITERAL single-space tokenizer, non-empty fragments only.

    For corpus statistics that must hash-certify across engines:
    splitting on the literal ' ' has identical semantics in Spark and
    DuckDB (no regex class membership involved -- the q131 \\s lesson),
    and the non-empty filter makes runs of spaces and edge spaces
    portable too.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda x: x != F.lit(""))


def vocab_stats(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-group vocabulary profile: token count, vocabulary size,
    hapax legomena (tokens seen exactly once), type-token ratio and
    hapax share in 1e-6 fixed point -- the lexical-diversity signal
    (template spam has tiny TTR; OCR noise has a huge hapax share).

    Scale: one explode + one (group, token) groupBy with map-side
    combine, then one group-sized groupBy. Tokens shuffle as part of
    the (group, token) grouping key -- bounded by vocabulary, not
    corpus, after the combine. Output [group, n_tokens, vocab_size,
    hapax, ttr_ppm, hapax_ppm].
    """
    tok = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(space_tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    per_token = tok.groupBy("grp", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        per_token.groupBy("grp")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
        )
        .select(
            "grp",
            "n_tokens",
            "vocab_size",
            "hapax",
            F.expr("vocab_size * 1000000 div n_tokens")
            .cast("long")
            .alias("ttr_ppm"),
            F.expr("hapax * 1000000 div nullif(vocab_size, 0)")
            .cast("long")
            .alias("hapax_ppm"),
        )
    )


def zipf_points(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Rank-frequency points for a Zipf log-log fit: corpus token
    frequencies ranked descending (total order: count desc, token),
    with ln(rank) and ln(freq) quantized to LN_FIT_SCALE fixed point
    -- feed to stats.grouped_ols for the slope (Zipf exponent ~ -1 for
    natural language; far off for generator spam).

    The rank window runs over the VOCABULARY table (already collapsed
    by the groupBy), not the corpus -- single-partition but
    vocabulary-sized, the q80 shape. Each ln is ONE double op on an
    exact integer, rounded away-from-zero identically in both engines.
    Output [token, freq, rank, x_fp (ln rank), y_fp (ln freq)].
    """
    freq = (
        docs.select(
            F.explode(space_tokens(F.lower(F.col(text_col)))).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    w = W.orderBy(F.desc("freq"), F.col("token"))
    return freq.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(
        "token",
        "freq",
        "rank",
        F.round(F.log(F.col("rank").cast("double")) * LN_FIT_SCALE)
        .cast("long")
        .alias("x_fp"),
        F.round(F.log(F.col("freq").cast("double")) * LN_FIT_SCALE)
        .cast("long")
        .alias("y_fp"),
    )


def heaps_growth_points(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 16,
) -> DataFrame:
    """Vocabulary-growth curve (Heaps' law V ~ k * N^beta) sampled at
    bucket granularity: documents bucket by FIXED id ranges (doc_id
    div bucket_size -- deterministic under any partitioning, and
    preserves the corpus reading order a growth curve needs), each
    token's first occurrence charges the bucket of its minimum doc id,
    and cumulative token/type counts run over the bucket table
    (corpus_size/bucket_size rows) -- never a corpus-sized window.

    ln columns quantize to LN_FIT_SCALE for a grouped_ols fit of
    ln(cum_types) on ln(cum_tokens): the slope estimates Heaps' beta
    (~0.5 for natural text; near 1 means the corpus keeps minting new
    tokens -- ids/hashes/noise). Output [bucket, n_tokens, new_types,
    cum_tokens, cum_types, x_fp, y_fp].
    """
    bucket = F.expr(f"{id_col} div {bucket_size}").cast("long")
    tok = docs.select(
        bucket.alias("bucket"),
        F.explode(space_tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    # One (bucket, token) count feeds BOTH aggregates; the lineage cut
    # materializes the collapsed (vocabulary x buckets)-sized table so
    # the corpus explode+shuffle runs ONCE, not once per consumer
    # (Catalyst shares no subtrees across the two aggregate branches).
    bt = (
        tok.groupBy("bucket", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    per_bucket = bt.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("n_tokens")
    )
    first_seen = (
        bt.groupBy("token")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per_bucket.join(first_seen, "bucket", "left")
        .select(
            "bucket",
            "n_tokens",
            F.coalesce("new_types", F.lit(0)).cast("long").alias(
                "new_types"
            ),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .withColumn("cum_types", F.sum("new_types").over(w).cast("long"))
        .select(
            "bucket",
            "n_tokens",
            "new_types",
            "cum_tokens",
            "cum_types",
            F.round(
                F.log(F.col("cum_tokens").cast("double")) * LN_FIT_SCALE
            )
            .cast("long")
            .alias("x_fp"),
            F.round(
                F.log(F.col("cum_types").cast("double")) * LN_FIT_SCALE
            )
            .cast("long")
            .alias("y_fp"),
        )
    )


def chao1_richness(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group Chao1 vocabulary-richness estimate over word BIGRAMS:
    "how many distinct bigrams does this source's language really
    have, given what this sample showed?" -- the unseen-species
    estimator ecology uses, applied to corpus curation (a source whose
    chao1 far exceeds its observed vocabulary is under-sampled; one
    where they agree is saturated). Complements q246's observed vocab
    and q250's Heaps extrapolation with a closed-form abundance-based
    estimate.

    Bias-corrected form (always finite, no f2 > 0 requirement):

        chao1_milli = v*1000 + (f1*(f1-1)*1000) div (2*(f2+1))

    where v = observed distinct bigrams, f1/f2 = bigrams seen exactly
    once/twice. Bigrams (not unigrams) because a bounded synthetic
    vocabulary saturates unigram counts at any scale -- pair space is
    where singletons live.

    Determinism: tokenization is LITERAL single-space split with a
    non-empty filter (the engine-version-safe form; `\\s+` is not --
    the q131 lesson), so counts are exact integers end to end; no
    floats anywhere. Overflow contract: f1*(f1-1)*1000 < 2^63 =>
    f1 < ~9.6e7 distinct singleton bigrams per group (sqrt(9.2e15),
    the 1000 factor included), still beyond any real shard's pair
    vocabulary; past it, drop the milli scaling or go DECIMAL.

    Scale: explode to (group, gram) -- grams shuffle as md5 digests
    (q154 convention, raw text never a shuffle key) -- one
    (group, digest) count, one per-group conditional agg. Map-side
    combine carries both; output is one row per group.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != ""
    )
    grams = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(shingles(toks, 2)).alias("g"),
    ).select("grp", F.md5(F.col("g")).alias("d"))
    counts = grams.groupBy("grp", "d").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_group = counts.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.count(F.lit(1)).cast("long").alias("v_distinct"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    return per_group.select(
        F.col("grp").alias(group_col),
        "n_bigrams",
        "v_distinct",
        "f1",
        "f2",
        (
            F.col("v_distinct") * F.lit(1000)
            + F.expr("f1 * (f1 - 1) * 1000 div (2 * (f2 + 1))")
        ).cast("long").alias("chao1_milli"),
    ).orderBy(group_col)
