"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Engine-design notes (100 TB):
* Exact dedup = hash-groupBy on a 128-bit fingerprint -- one shuffle on
  the fingerprint, perfectly parallel, no skew (hash keys are uniform).
* MinHash signatures use min(md5(salt || shingle)) per hash function:
  md5 hex strings are fixed-length, so lexicographic MIN == numeric min
  of the unsigned value. MIN is associative -> partial aggregation
  (map-side combine) applies; signatures for a trillion docs reduce to
  one shuffle of (doc_id, 16 short strings).
* LSH banding turns O(n^2) near-dup search into an equi-join on band
  keys -- Catalyst plans a plain shuffled hash join; hot bands (common
  shingles) are handled by AQE skew-join splitting. That claim is
  CERTIFIED, not assumed: tests/test_lsh_skew.py builds a degenerate
  hot band and asserts the final adaptive plan marks the band
  self-join `skew=true` (with AQE thresholds scaled to test volume)
  and that the split changes no pair counts. The explicit manual
  remedy for hash joins / pre-AQE pinning is operators/skew.salted_join
  (driver-certified by q277).
* Everything is built-in expressions: no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, shingles, tokens
from ..lineage import cut_lineage


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct content: keeper = min id, plus multiplicity.

    Groups on ``sha2(text, 256)`` rather than the raw text so the shuffle
    key is a fixed 64-char digest: at 100 TB the full corpus never moves
    through the exchange, only (digest, id) pairs. A 256-bit collision is
    below hardware-error rates, so the result is identical to grouping on
    the text itself. See also `q51_dedup_fingerprint` (md5 of normalized
    text) for the whitespace/case-insensitive variant.
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("_fp"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_fp")
    )


def _widen(df: DataFrame) -> DataFrame:
    """Repartition a narrow source up to the session's parallelism before
    a CPU-heavy map stage. A no-op decision on a real cluster (the scan
    already exposes >= cores splits); locally a single parquet file would
    otherwise serialize the whole hashing stage onto one task.

    The width probe uses `inputFiles()` (pure metadata) rather than
    `df.rdd.getNumPartitions()`, which would force a plan-to-RDD
    conversion on every call. Conservative: big files that would split
    into enough tasks anyway still get repartitioned -- one cheap
    round-robin shuffle of narrow (id, text) rows in the rare case.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_splits = len(df.inputFiles())
    except Exception:  # non-file source: no metadata to probe
        n_splits = 0
    if n_splits < target:
        return df.repartition(target)
    return df


def doc_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Distinctness is enforced row-locally (array_distinct before explode),
    so there is no global distinct shuffle -- (id, shingle) pairs are
    already unique across docs because ids differ.
    """
    sh = F.array_distinct(shingles(tokens(text_col), n=n))
    # explode_OUTER + notNull, not plain explode: a non-outer Generate
    # gets an inferred `size(sh) > 0` filter that re-evaluates the
    # whole shingle expression a second time per row (the q146 lesson);
    # the null-row filter above the Generate is per-output-row cheap.
    return (
        _widen(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode_outer(sh).alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 8,
    n: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per doc: h_i = min over distinct shingles of
    md5('<salt_i>|' || shingle). MIN is associative, so the aggregate is
    map-side partial: one shuffle of (doc_id, n_hashes short strings).

    (A fully row-wise array_min formulation avoids even that shuffle but
    runs the shingle expression once per hash function after Catalyst's
    projection collapse -- higher-order functions don't share
    subexpressions -- which costs more than the shuffle it saves.)

    Docs with < n tokens have no shingles and drop out (they cannot be
    near-dup candidates).

    ``shingles_df``: a precomputed ``doc_shingles(docs, ...)`` frame --
    callers that also need the shingle table for verification
    (lsh_verified_pairs) pass their materialized copy so the explode
    runs once, not twice (r15 optimization round; identical results).
    """
    sh = (
        shingles_df
        if shingles_df is not None
        else doc_shingles(docs, text_col, id_col, n=n)
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"mh{i:02d}|"), F.col("shingle")))).alias(
            f"h{i:02d}"
        )
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Band the signature (rows of `band_size` hashes), hash each band,
    and equi-join docs sharing any band key. Returns distinct
    (id_a < id_b) candidate pairs with the number of colliding bands."""
    n_bands = n_hashes // band_size
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"h{b * band_size + j:02d}") for j in range(band_size)]
            )
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    banded = sig_df.select(F.col(id_col), *band_cols)
    # Unpivot to (id, band_idx, band_key) then self-join on the key.
    stack_expr = ", ".join(f"{b}, band{b}" for b in range(n_bands))
    long = banded.select(
        F.col(id_col),
        F.expr(f"stack({n_bands}, {stack_expr}) AS (band_idx, band_key)"),
    ).select(id_col, "band_idx", "band_key")
    a = long.alias("a")
    b = long.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_band_hits"))
    )


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for LSH-band candidate pairs -- the scale
    pair source (vs `ngram_jaccard_pairs`' id-gap stand-in). Every join
    is an equi-join: band self-join for candidates, then
    (id, shingle)-keyed joins to count intersections only for candidate
    pairs. No all-pairs stage anywhere; Catalyst plans shuffled/broadcast
    hash joins, never a nested loop.

    Returns [id_a, id_b, n_common, n_sh_a, n_sh_b, jaccard] with exact
    integer counts (the jaccard double is one division of identical
    integer operands -> engine-portable bit-for-bit).
    """
    # One shingle materialization for the WHOLE pipeline (r15
    # optimization round): signature build, size table, and both
    # intersection sides used to each replay the explode over raw text
    # (five Generate nodes in the physical plan); now they read one set
    # of checkpointed blocks.
    sh = doc_shingles(df, text_col, id_col, n=n).transform(
        cut_lineage, eager=False
    )
    sig = minhash_signatures(
        df, text_col, id_col, n_hashes=n_hashes, n=n, shingles_df=sh
    )
    cand = lsh_candidate_pairs(sig, id_col, n_hashes, band_size).select(
        "id_a", "id_b"
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_sh_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            "n_sh_a",
            "n_sh_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def neardup_keepers(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_num: int = 1,
    threshold_den: int = 2,
    n_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
) -> DataFrame:
    """The complete near-dup dedup pipeline, end to end: MinHash
    signatures -> LSH band candidates -> exact Jaccard verification ->
    connected components -> one keeper per cluster.

    The Jaccard threshold is the exact rational threshold_num /
    threshold_den, applied as an integer cross-multiplication (no float
    compare): keep edges with
        n_common * den >= num * (n_sh_a + n_sh_b - n_common).

    Returns [doc_id, keeper_id] for EVERY input document: members of a
    near-dup cluster map to the cluster's min id, everything else keeps
    itself. `keeper_id != doc_id` is the drop set.
    """
    from .graph import connected_components

    verified = lsh_verified_pairs(
        df, text_col, id_col, n_hashes=n_hashes, band_size=band_size, n=n
    )
    edges = verified.filter(
        F.col("n_common") * threshold_den
        >= threshold_num * (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common"))
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = connected_components(edges)
    return df.select(F.col(id_col).alias("doc_id")).join(
        labels, F.col("doc_id") == F.col("node"), "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("keeper_id"),
    )


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash from per-token md5 hex digits: bit j is the sign of
    sum(+1/-1 over tokens by whether hex digit j >= '8'). Token
    multiplicity counts (standard SimHash weighting by term frequency).

    Row-wise (no explode/shuffle): the ±1 sum for bit j equals
    2 * |tokens with a high hex digit at j| - |tokens|, both computable
    from the in-row token-hash array.
    """
    hexhi = list("89abcdef")

    def high_at(pos: int):
        return lambda h: F.substring(h, pos, 1).isin(hexhi)

    bits = [
        F.when(
            2 * F.size(F.filter(F.col("_th"), high_at(j + 1))) - F.size("_th") >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for j in range(16)
    ]
    return df.select(
        F.col(id_col), F.transform(tokens(text_col), F.md5).alias("_th")
    ).select(F.col(id_col), F.concat(*bits).alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    max_id_gap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs that share at
    least one shingle (optionally bounded to |id_a - id_b| <= max_id_gap
    to cap the candidate set; at scale you'd bound by LSH bands instead).

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), computed from exact
    integer counts -> engine-portable bit-for-bit.
    """
    # One materialization of the shingle explode (r15 optimization
    # round): four consumers read it (both self-join sides and the two
    # size attachments), and Catalyst does not share common subtrees --
    # the plan ran the shingle Generate four times over the raw text.
    sh = doc_shingles(df, text_col, id_col, n=n).transform(
        cut_lineage, eager=False
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if max_id_gap is not None:
        cond = cond & (
            (F.col(f"b.{id_col}") - F.col(f"a.{id_col}")) <= max_id_gap
        )
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_sh_a")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_sh_b")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new ingest batches against the already-kept corpus.


def incremental_exact_dedup(
    new_docs: DataFrame,
    seen_digests: DataFrame | None,
    text_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Continuous-ingestion exact dedup: drop new documents whose content
    digest is already in the corpus, keep one representative (min id) of
    any content repeated WITHIN the batch, and return the digest table
    extended with the batch's novel digests.

    Returns ``(novel_docs, updated_digests)``. ``seen_digests`` is a
    one-column [digest] frame (None for the first batch). The digest
    table is the only state carried between ingests -- 32 bytes per
    distinct document ever kept, the same sha2 keying as exact_dedup, so
    at 100 TB the anti-join ships digests, never text, and the state
    table is orders of magnitude smaller than the corpus.

    Replay-safe: re-running a batch against the PRE-batch digest table
    reproduces the same novel set; against the post-batch table it
    yields zero novels (both idempotence forms a checkpointed ingest
    needs).
    """
    digested = new_docs.withColumn(
        "_fp", F.sha2(F.col(text_col), 256)
    )
    keeper = digested.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"))
    batch_kept = digested.join(keeper, "_fp").filter(
        F.col(id_col) == F.col("_keep_id")
    )
    if seen_digests is not None:
        seen = seen_digests.select(F.col("digest").alias("_fp"))
        novel = batch_kept.join(seen, "_fp", "left_anti")
    else:
        novel = batch_kept
    novel_docs = novel.drop("_fp", "_keep_id")
    new_digests = novel.select(F.col("_fp").alias("digest"))
    updated = (
        seen_digests.unionByName(new_digests).distinct()
        if seen_digests is not None
        else new_digests.distinct()
    )
    return novel_docs, updated


def incremental_neardup_filter(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str,
    id_col: str,
    threshold_num: int = 1,
    threshold_den: int = 2,
    n_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Drop new documents that near-duplicate the EXISTING corpus: the
    asymmetric (new x corpus) form of the LSH pipeline, for continuous
    ingestion.

    Candidates come from an equi-join of the two sides' LSH band keys
    (never new x corpus all-pairs); candidates are verified with the
    exact shingle-Jaccard, thresholded by integer cross-multiplication.
    Returns ``(novel_docs, matches)`` where matches is
    [new_id, corpus_id, jaccard] for every verified near-duplicate pair
    (the provenance a curation audit wants).

    Unlike neardup_keepers there is no clustering stage: corpus docs are
    already keepers, so one verified match suffices to drop a new doc.
    New docs that near-duplicate only EACH OTHER survive here -- run the
    batch through neardup_keepers first (or feed kept batches in
    sequence) for intra-batch near-dedup.
    """

    def band_long(docs: DataFrame, side: str) -> DataFrame:
        sig = minhash_signatures(
            docs, text_col, id_col, n_hashes=n_hashes, n=n
        )
        n_bands = n_hashes // band_size
        band_cols = [
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{b * band_size + j:02d}")
                        for j in range(band_size)
                    ],
                )
            ).alias(f"band{b}")
            for b in range(n_bands)
        ]
        stack_expr = ", ".join(f"{b}, band{b}" for b in range(n_bands))
        return (
            sig.select(F.col(id_col).alias(side), *band_cols)
            .select(
                side,
                F.expr(
                    f"stack({n_bands}, {stack_expr}) AS (band_idx, band_key)"
                ),
            )
            .select(side, "band_idx", "band_key")
        )

    cand = (
        band_long(new_docs, "new_id")
        .join(band_long(corpus_docs, "corpus_id"), ["band_idx", "band_key"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    sh_new = doc_shingles(new_docs, text_col, id_col, n=n).select(
        F.col(id_col).alias("new_id"), "shingle"
    )
    sh_corpus = doc_shingles(corpus_docs, text_col, id_col, n=n).select(
        F.col(id_col).alias("corpus_id"), "shingle"
    )
    sizes_new = sh_new.groupBy("new_id").agg(F.count(F.lit(1)).alias("n_sh_new"))
    sizes_corpus = sh_corpus.groupBy("corpus_id").agg(
        F.count(F.lit(1)).alias("n_sh_corpus")
    )
    inter = (
        cand.join(sh_new, "new_id")
        .join(sh_corpus, ["corpus_id", "shingle"])
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    matches = (
        inter.join(sizes_new, "new_id")
        .join(sizes_corpus, "corpus_id")
        .filter(
            F.col("n_common") * threshold_den
            >= threshold_num
            * (F.col("n_sh_new") + F.col("n_sh_corpus") - F.col("n_common"))
        )
        .select(
            "new_id",
            "corpus_id",
            F.round(
                F.col("n_common").cast("double")
                / (
                    F.col("n_sh_new")
                    + F.col("n_sh_corpus")
                    - F.col("n_common")
                ),
                6,
            ).alias("jaccard"),
        )
    )
    novel = new_docs.join(
        matches.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    return novel, matches


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs AT SCALE: pigeonhole banding.

    Two 16-bit SimHashes within hamming distance ``max_hamming`` <
    ``n_chunks`` must agree EXACTLY on at least one of the ``n_chunks``
    equal slices of the hash -- so the candidate source is an equi-join
    on (chunk_idx, chunk_value), the SimHash analog of MinHash's LSH
    band join, never an all-pairs comparison. Candidates are then
    verified with the exact per-position hamming distance (16 character
    compares on the in-row pair; no re-tokenization).

    Returns [id_a, id_b, hamming] for verified pairs (id_a < id_b).
    Complements lsh_verified_pairs: SimHash stores 16 bits per doc vs
    8 x 32-hex MinHash signatures -- the cheaper sketch when only a
    coarse near-dup gate is needed.
    """
    if not 0 <= max_hamming < n_chunks:
        raise ValueError(
            f"pigeonhole needs max_hamming < n_chunks, got "
            f"{max_hamming} >= {n_chunks}"
        )
    if 16 % n_chunks:
        raise ValueError(f"n_chunks must divide 16, got {n_chunks}")
    width = 16 // n_chunks
    sh = simhash16(df, text_col, id_col)
    chunks = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("ci"),
                        F.substring("simhash", i * width + 1, width).alias(
                            "cv"
                        ),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("s"),
    ).select(F.col(id_col), "simhash", "s.ci", "s.cv")
    a = chunks.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("ha"),
        "ci",
        "cv",
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("hb"),
        "ci",
        "cv",
    )
    cand = (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )
    hamming = sum(
        (
            (
                F.substring("ha", j + 1, 1) != F.substring("hb", j + 1, 1)
            ).cast("int")
            for j in range(16)
        ),
        F.lit(0),
    )
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def content_defined_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    boundary_mod: int = 16,
    min_len: int = 16,
) -> DataFrame:
    """Content-defined chunking over TOKENS: chunk boundaries fall where
    the hash of the trailing ``window``-token shingle satisfies
    hash % boundary_mod == 0 -- so boundaries move WITH the content.

    Fixed-size chunking (q120) breaks chunk-level dedup the moment one
    token is inserted upstream: every later chunk shifts. Here an edit
    only disturbs the chunks overlapping it; everything after the next
    content-defined boundary realigns, so chunk-digest dedup
    (exact_dedup on the chunk text) catches shared suffixes/middles
    across revisions -- the rsync/LBFS argument, applied to documents.

    Expression-only: per-position shingle hashes (the winnowing
    machinery's shape), boundary flags, a running boundary count via
    aggregate-HOF prefix sum, then one explode to
    [id, chunk_idx, chunk_text, n_tokens]. Average chunk length is
    ~boundary_mod tokens; ``min_len`` suppresses boundaries closer than
    that to the previous one (applied left-to-right in the fold, the
    standard CDC minimum-size rule).
    """
    # Materialize the token array FIRST: every expression below sits
    # inside a HOF lambda, and a lambda body re-evaluates any captured
    # non-attribute subexpression PER ELEMENT -- referencing the raw
    # split() expression from the window-slice lambda re-tokenized the
    # whole document once per position, an O(n^2) blowup measured at
    # ~9 s for 5,000 docs / 270k tokens at sf0.1 (vs ~1 s with the
    # array bound as a column attribute, which the lambda just reads).
    staged0 = df.select(F.col(id_col), tokens(text_col).alias("_t"))
    toks = F.col("_t")
    n = F.size(toks)
    # hash of the window ENDING at position i (1-based over tokens);
    # positions < window never start a boundary
    hashes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            i >= window,
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ", F.slice(toks, i - window + 1, window)
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % boundary_mod,
        ).otherwise(F.lit(-1)),
    )
    # Candidate boundaries: zip the hash array with positions and
    # filter -- `hashes` appears ONCE as a HOF argument, so the window
    # hashing evaluates a single time per row. (Referencing it via
    # element_at inside another HOF's lambda would re-evaluate the
    # whole transform per element: higher-order functions get no
    # common-subexpression elimination, an O(n^2 * window) md5 blowup
    # measured at ~1 s/doc on 30-token rows.)
    cand = F.transform(
        F.filter(
            F.zip_with(
                hashes,
                F.sequence(F.lit(1), n),
                lambda h, i: F.struct(
                    h.alias("h"), i.cast("int").alias("i")
                ),
            ),
            lambda sp: sp["h"] == 0,
        ),
        lambda sp: sp["i"],
    )
    # min-len rule is inherently sequential -- but only over the SMALL
    # candidate array (~n_tokens / boundary_mod entries), not every
    # position
    bounds = F.aggregate(
        cand,
        F.struct(
            F.lit(0).cast("int").alias("last"),
            F.array().cast("array<int>").alias("pos"),
        ),
        lambda acc, i: F.when(
            (i - acc["last"]) >= min_len,
            F.struct(
                i.alias("last"),
                F.concat(acc["pos"], F.array(i)).alias("pos"),
            ),
        ).otherwise(acc),
        lambda acc: acc["pos"],
    )
    # chunk k spans (prev_boundary, boundary_k]; final partial chunk
    # runs to the end
    staged = staged0.select(
        F.col(id_col), F.col("_t"), bounds.alias("_b")
    )
    starts = F.concat(F.array(F.lit(0).cast("int")), F.col("_b"))
    ends = F.concat(F.col("_b"), F.array(F.size("_t").cast("int")))
    spans = F.filter(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.struct(s.alias("s"), e.alias("e")),
        ),
        lambda span: span["e"] > span["s"],
    )
    # posexplode_OUTER, deliberately: for a non-outer Generate, the
    # InferFiltersFromGenerate rule synthesizes `size(_spans) > 0` and
    # predicate pushdown clones the ENTIRE spans expression chain
    # (hash transform + fold, with the tokenizer re-inlined) into a
    # Filter at the scan -- the whole CDC computation ran twice per
    # row, measured at ~6 of the ~9 s/5k docs at sf0.1. Outer
    # generators get no inferred filter, and `_spans` is never empty
    # here (every document yields >= 1 span), so the semantics are
    # identical and the chain evaluates once.
    return (
        staged.select(F.col(id_col), F.col("_t"), spans.alias("_spans"))
        .select(
            F.col(id_col),
            F.posexplode_outer("_spans").alias("chunk_idx", "_sp"),
            F.col("_t"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("_t"),
                    F.col("_sp.s") + 1,
                    F.col("_sp.e") - F.col("_sp.s"),
                ),
            ).alias("chunk_text"),
            (F.col("_sp.e") - F.col("_sp.s")).cast("long").alias("n_tokens"),
        )
    )


def _position_grams(
    df: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """[id, n_tokens, pos, gram]: the md5 digest of every n-token
    window, with its 1-based start position. explode_outer (not
    explode): a non-outer generate invites Catalyst's
    InferFiltersFromGenerate to clone the whole digest chain into a
    scan-side filter (the q146 10x hazard, PLANS.md round-6 item 1);
    the `size >= n` filter already guarantees non-emptiness."""
    toks = tokens(text_col)
    return (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= n)
        .select(
            F.col(id_col),
            F.size("_t").alias("n_tokens"),
            F.explode_outer(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - (n - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(
                            F.concat_ws(" ", F.slice(F.col("_t"), i, n))
                        ).alias("gram"),
                    ),
                )
            ).alias("_g"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.col("_g.pos").alias("pos"),
            F.col("_g.gram").alias("gram"),
        )
    )


def _merge_position_islands(
    pos_df: DataFrame, n: int, id_col: str
) -> DataFrame:
    """Gaps-and-islands merge of overlapping OR ABUTTING [pos, pos+n)
    windows into maximal spans per document (running-max window to
    detect island starts, one per-document shuffle): a window starting
    at prev_end + 1 continues contiguous coverage, so only a true gap
    (pos > prev_end + 1) starts a new span. Input [id, n_tokens, pos];
    output [id, span_start, span_end, span_tokens, n_tokens], 1-based
    inclusive token indices."""
    from pyspark.sql.window import Window as W

    w_order = W.partitionBy(id_col).orderBy("pos")
    prev_end = (
        F.max("pos").over(w_order.rowsBetween(W.unboundedPreceding, -1))
        + (n - 1)
    )
    staged = pos_df.withColumn(
        "_new",
        (prev_end.isNull() | (F.col("pos") > prev_end + 1)).cast("int"),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        staged.groupBy(id_col, "n_tokens", "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (n - 1)).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style duplicate SPAN extraction: for every document,
    the maximal token spans covered by n-grams that occur at least
    twice in the corpus (counting a second occurrence inside the SAME
    document, like the suffix-array method it approximates) -- the
    per-document cut list substring-level dedup feeds to a trainer,
    where q154's dup_ngram_stats only reports the scalar fraction.

    Method: per-position n-gram digests (map-side HOF; text never
    leaves the row), ONE shuffle keyed on the 128-bit digest with the
    occurrence count as a window over it (single corpus scan -- the
    groupBy+join-back form would re-explode the corpus twice), then a
    per-document gaps-and-islands merge of the overlapping [pos,
    pos+n) windows (running-max window, one per-document shuffle).
    Output is bounded by the number of duplicated positions; spans are
    1-based token indices, inclusive.

    Returns [id, span_start, span_end, span_tokens, n_tokens].
    """
    from pyspark.sql.window import Window as W

    grams = _position_grams(df, n, text_col, id_col)
    # occurrence count as a WINDOW over the digest partition, not
    # groupBy + join-back: the join form scans (and re-explodes) the
    # corpus twice -- the window reuses the one gram exchange and the
    # plan stays single-scan (PLANS.md round-7 note)
    w_gram = W.partitionBy("gram")
    dup_pos = (
        grams.withColumn("_c", F.count(F.lit(1)).over(w_gram))
        .filter(F.col("_c") >= 2)
        .select(id_col, "n_tokens", "pos")
    )
    return _merge_position_islands(dup_pos, n, id_col)


def contamination_spans(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark-contamination CUT LISTS: the maximal token spans of
    each training document covered by n-grams that appear anywhere in
    the benchmark (eval) set -- the span-level complement of q92's
    scalar overlap fraction and q137's whole-document Bloom gate: a
    surgical pipeline cuts the contaminated spans instead of dropping
    the document.

    The benchmark side is SMALL by nature (eval sets), so its distinct
    gram digests broadcast and the probe is a map-side semi-join over
    the corpus gram stream -- the corpus shuffles only the surviving
    (id, pos) pairs into the per-document islands merge. Same
    gaps-and-islands machinery as duplicate_spans.

    Returns [id, span_start, span_end, span_tokens, n_tokens].
    """
    bcol = bench_text_col or text_col
    bench_grams = (
        _position_grams(benchmark, n, bcol, id_col)
        .select("gram")
        .distinct()
    )
    grams = _position_grams(df, n, text_col, id_col)
    hit_pos = grams.join(
        F.broadcast(bench_grams), "gram", "left_semi"
    ).select(id_col, "n_tokens", "pos")
    return _merge_position_islands(hit_pos, n, id_col)


def apply_span_cuts(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a span cut list (duplicate_spans / contamination_spans
    output) to the corpus: remove every token inside a cut span and
    reassemble the text -- the execution half of surgical
    substring-level dedup (detect with q179/q180, cut here).

    Spans aggregate to one array per document (collect_list after a
    groupBy on the id -- the span list per doc is small by
    construction), broadcast-joinable or shuffled on the id like any
    keyed enrichment; the cut itself is row-local HOF work (token
    filter by position against the span array). Documents without
    spans pass through byte-identical.

    Returns [id, clean_text, n_tokens, n_removed].
    """
    cuts = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("_cuts")
    )
    toks = tokens(text_col)
    staged = (
        df.select(F.col(id_col), toks.alias("_t"))
        .join(cuts, id_col, "left")
        .withColumn(
            "_cuts",
            F.coalesce(
                "_cuts",
                F.array().cast("array<struct<s:long,e:long>>"),
            ),
        )
    )
    # keep token i (1-based) unless some span covers it; zip positions
    # in (token, pos) structs so one filter pass does the cut
    kept = F.filter(
        F.zip_with(
            F.col("_t"),
            F.sequence(F.lit(1), F.size("_t")),
            lambda t, p: F.struct(t.alias("t"), p.alias("p")),
        ),
        lambda z: ~F.exists(
            F.col("_cuts"),
            lambda c: (c["s"] <= z["p"]) & (z["p"] <= c["e"]),
        ),
    )
    return staged.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda z: z["t"]), " ").alias(
            "clean_text"
        ),
        F.size("_t").cast("long").alias("n_tokens"),
        (F.size("_t") - F.size(kept)).cast("long").alias("n_removed"),
    )
