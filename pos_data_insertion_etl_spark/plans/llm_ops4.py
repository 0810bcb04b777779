"""Fourth LLM-data-pipeline batch: corpus-hygiene operators a
pretraining pipeline runs between raw ingest and tokenization -- PII
scrubbing, corpus-level boilerplate removal, paragraph-level exact
dedup, sliding-window chunking, and language-mix reweighting.

Determinism rules as elsewhere (plans/registry.py): integer-only
arithmetic feeding thresholds/groupings; every rank orders by a total
key (block text, then doc_id, then position). The synthetic documents
table is single-space word salad, so structural units ("lines",
"paragraphs") are defined as fixed-width non-overlapping token blocks --
the operator shapes (explode -> count/dedup -> join-back -> reassemble
stats) are exactly those of newline-delimited real corpora.

Scale shapes:
* PII scrub is pure row-wise JVM regex -- zero shuffle, streams at scan
  speed at any corpus size;
* boilerplate detection shuffles (block, doc) pairs once to count
  distinct docs per block; the hot-block set is tiny by construction
  (it's the point of the filter) and broadcasts back;
* paragraph dedup is one window over (block) ordered by a total key --
  the same first-occurrence-keeper shape as q50 exact dedup, one
  shuffle on the block hash, never on text;
* chunking is explode + per-row array slice -- no shuffle, and chunk
  boundaries depend only on the row, so it parallelizes per document;
* mix weights aggregate to one row per language in one corpus scan;
  totals come from an unpartitioned window over the |langs|-row
  aggregate (bounded cardinality, so the single-task window is free).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from ..functions.text import shingles, tokens
from .llm_ops import _SHINGLE_CTE, _TOKS_CTE
from .registry import query

_BS = 2          # tokens per "line"/"paragraph" block
_HOT_DOCS = 15   # blocks seen in >= this many distinct docs are boilerplate
_CHUNK = 10      # chunk size (tokens)
_STRIDE = 8      # chunk stride (tokens) -> 2-token overlap

_EMAIL_RE = r"user[0-9]+@mail\.com"
_PHONE_RE = r"[0-9]{3}-[0-9]{4}"

# Shared CTE: non-overlapping _BS-token blocks with their position.
# DuckDB cannot lateral-join generate_series on an outer-row bound, so
# the series is a constant range filtered by the doc's block count
# (500 >> max tokens/doc in the fixture tables).
_BLOCKS_CTE = rf"""
toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
),
blocks AS (
  SELECT doc_id, i,
         array_to_string(w[(i*{_BS}+1):(i*{_BS}+{_BS})], ' ') AS blk
  FROM toks CROSS JOIN range(0, 500) t(i)
  WHERE i*{_BS}+{_BS} <= len(w)
)
"""


def _doc_blocks(spark, sf_dir):
    """[doc_id, i, blk]: non-overlapping _BS-token blocks per document.
    explode first, then one per-row slice -- no higher-order function,
    so nothing is re-evaluated per element (see pyspark HOF pitfalls)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("w"))
    return (
        toks.filter(F.size("w") >= _BS)
        .select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.floor(F.size("w") / _BS) - 1).cast("long"),
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            "i",
            F.array_join(
                F.slice("w", (F.col("i") * _BS + 1).cast("int"), _BS), " "
            ).alias("blk"),
        )
    )


@query(
    "q117_pii_scrub",
    oracle=rf"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 <> 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.com'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(regexp_replace(
              regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
              '{_PHONE_RE}', '<TEL>', 'g')) AS BIGINT) AS redacted_len
FROM aug
""",
    tags=("llm", "pii", "regex"),
)
def q117_pii_scrub(spark, sf_dir):
    """PII detection + redaction: count email/phone matches per document
    and the post-redaction length. Pure row-wise JVM regex (no UDF, no
    shuffle) -- the shape scales to any corpus since every task scrubs
    its own scan split. The fixture corpus is PII-free word salad, so
    deterministic synthetic contact strings are appended per doc_id
    (2/3 of docs get an email, 1/2 a phone) to exercise both match and
    no-match paths; on a real corpus the scrub runs on `text` as-is.

    Reference analog: the record-level field validation pass
    (/root/reference/main.py:558-565) -- here as content hygiene.
    """
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 != 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@mail.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" tel 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<TEL>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


@query(
    "q118_boilerplate_blocks",
    oracle=rf"""
WITH {_BLOCKS_CTE},
hot AS (
  SELECT blk FROM (
    SELECT blk, COUNT(DISTINCT doc_id) AS c FROM blocks GROUP BY blk
  ) WHERE c >= {_HOT_DOCS}
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN blk IN (SELECT blk FROM hot) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_boiler
FROM blocks GROUP BY doc_id
""",
    tags=("llm", "boilerplate", "dedup"),
)
def q118_boilerplate_blocks(spark, sf_dir):
    """Corpus-level boilerplate detection (the C4/RefinedWeb "same line
    in many documents" rule): a block occurring in >= _HOT_DOCS distinct
    documents is boilerplate; report per-doc block and boilerplate
    counts. One shuffle counts distinct docs per block; the hot set is
    small by construction and broadcasts back onto the corpus -- at
    100 TB the block-count aggregate is map-side partial and the only
    wide exchange carries (block, doc_id) pairs, never text bodies
    beyond the 2-token blocks themselves."""
    blocks = _doc_blocks(spark, sf_dir)
    hot = (
        blocks.groupBy("blk")
        .agg(F.count_distinct("doc_id").alias("c"))
        .filter(F.col("c") >= _HOT_DOCS)
        .select("blk", F.lit(1).alias("is_hot"))
    )
    return (
        blocks.join(F.broadcast(hot), "blk", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(
                F.when(F.col("is_hot").isNotNull(), 1).otherwise(0)
            ).alias("n_boiler"),
        )
    )


@query(
    "q119_paragraph_dedup",
    oracle=rf"""
WITH {_BLOCKS_CTE},
ranked AS (
  SELECT doc_id, blk,
         ROW_NUMBER() OVER (PARTITION BY blk ORDER BY doc_id, i) AS rn
  FROM blocks
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked GROUP BY doc_id
""",
    tags=("llm", "dedup", "window"),
)
def q119_paragraph_dedup(spark, sf_dir):
    """Paragraph-level exact dedup (RefinedWeb-style): across the whole
    corpus each distinct paragraph keeps only its first occurrence in
    (doc_id, position) order; report per-doc kept/dropped counts. Same
    first-occurrence-keeper shape as q50 exact dedup, lifted from
    documents to paragraphs: ONE shuffle partitioned by the paragraph
    text's hash (2-token blocks here; sha2 the block first when
    paragraphs are long, as q50 does for documents), total-order
    tiebreak, no driver involvement."""
    blocks = _doc_blocks(spark, sf_dir)
    rn = F.row_number().over(
        W.partitionBy("blk").orderBy("doc_id", "i")
    )
    return (
        blocks.withColumn("rn", rn)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dropped"),
        )
    )


@query(
    "q120_chunk_overlap",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
)
SELECT doc_id, i AS chunk_idx,
       CAST(len(w[(i*{_STRIDE}+1):(i*{_STRIDE}+{_CHUNK})]) AS BIGINT)
         AS n_chunk_tokens,
       CAST(length(array_to_string(
              w[(i*{_STRIDE}+1):(i*{_STRIDE}+{_CHUNK})], ' ')) AS BIGINT)
         AS chunk_chars
FROM toks CROSS JOIN range(0, 500) t(i)
WHERE i <= greatest(CAST(ceil((len(w) - {_CHUNK}) / {_STRIDE}.0) AS BIGINT), 0)
""",
    tags=("llm", "chunking"),
)
def q120_chunk_overlap(spark, sf_dir):
    """Sliding-window document chunking with overlap (size {chunk},
    stride {stride}) -- the RAG/context-window prep op. Emits one row
    per chunk with its token count and character length (tail chunks
    run short). explode + per-row array slice: zero shuffle, chunk
    boundaries depend only on the row, so the op runs at scan speed on
    any number of executors.""".format(chunk=_CHUNK, stride=_STRIDE)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("w"))
    i_max = F.greatest(
        F.ceil((F.size("w") - _CHUNK) / F.lit(float(_STRIDE))).cast("long"),
        F.lit(0).cast("long"),
    )
    chunk = F.slice(
        "w", (F.col("i") * _STRIDE + 1).cast("int"), _CHUNK
    )
    return (
        toks.select(
            "doc_id",
            "w",
            F.explode(F.sequence(F.lit(0).cast("long"), i_max)).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.length(F.array_join(chunk, " ")).cast("long").alias("chunk_chars"),
        )
    )


_MH_CHUNK = 32            # tokens per minhash chunk
_MH_STRIDE = _MH_CHUNK - 2  # overlap = n-1 tokens so no 3-gram is lost


def _chunked_minhash_oracle() -> str:
    hashes = ",\n       ".join(
        f"MIN(md5('mh{i:02d}|' || shingle)) AS h{i:02d}" for i in range(8)
    )
    return f"""
WITH {_TOKS_CTE}, {_SHINGLE_CTE}
SELECT doc_id,
       {hashes}
FROM sh GROUP BY doc_id
"""


@query(
    "q123_chunked_minhash_merge",
    oracle=_chunked_minhash_oracle(),
    tags=("dedup", "minhash", "incremental"),
)
def q123_chunked_minhash_merge(spark, sf_dir):
    """MinHash signatures computed from STREAMED CHUNKS, merged per doc
    -- the identity that lets a 10 GB document be signed without ever
    materializing its full text: chunks overlap by n-1 tokens, so the
    union of chunk shingles is exactly the document's shingle set, and
    MIN is associative, so per-chunk partial signatures merged by MIN
    equal the full-document signature. The ORACLE is the full-document
    recompute (q55's signature form) -- a hash match proves the merge
    algebra, the same evidence pattern as q111 incremental rollup.

    Plan: explode chunks (row-local), per-(doc, chunk) partial MIN
    (map-side combinable), then the per-doc merge -- the second
    aggregate reuses the first's (doc_id, ci) hash partitioning, so the
    merge adds no full-width shuffle of shingles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("w"))
    i_max = F.greatest(
        F.ceil(
            (F.size("w") - _MH_CHUNK) / F.lit(float(_MH_STRIDE))
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    chunked = toks.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0).cast("long"), i_max)).alias("ci"),
    )
    chunk_sh = chunked.select(
        "doc_id",
        "ci",
        F.explode(
            F.array_distinct(
                shingles(
                    F.slice(
                        "w",
                        (F.col("ci") * _MH_STRIDE + 1).cast("int"),
                        _MH_CHUNK,
                    ),
                    n=3,
                )
            )
        ).alias("shingle"),
    )
    partial = [
        F.min(
            F.md5(F.concat(F.lit(f"mh{i:02d}|"), F.col("shingle")))
        ).alias(f"h{i:02d}")
        for i in range(8)
    ]
    chunk_sigs = chunk_sh.groupBy("doc_id", "ci").agg(*partial)
    merge = [F.min(f"h{i:02d}").alias(f"h{i:02d}") for i in range(8)]
    return chunk_sigs.groupBy("doc_id").agg(*merge)


@query(
    "q122_bpe_token_estimate",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
         AS n_alpha_tokens,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
         AS n_numeric_tokens,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT)
         AS n_symbol_tokens,
       CAST(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z]+'),
                                    w -> (length(w)+3) // 4))
            + len(regexp_extract_all(text, '[0-9]+'))
            + len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT)
         AS est_bpe_tokens
FROM documents
""",
    tags=("llm", "tokens", "regex"),
)
def q122_bpe_token_estimate(spark, sf_dir):
    """BPE-ish token-budget estimator (the cost model a training-data
    pipeline runs before tokenizing 100 TB for real): GPT-style regex
    pre-tokenization into alpha / numeric / symbol runs, then an
    integer subtoken estimate of ceil(len/4) per alpha run (~4 chars
    per merged BPE token for English) and one token per other run.
    Complements q52's whitespace counts with the class-aware estimate.
    Row-wise JVM regex + one higher-order aggregate over the per-row
    match array -- zero shuffle, integer-only arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    alpha = F.regexp_extract_all("text", F.lit("[A-Za-z]+"), 0)
    num = F.regexp_extract_all("text", F.lit("[0-9]+"), 0)
    sym = F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), 0)
    est_alpha = F.expr(
        "aggregate(regexp_extract_all(text, '[A-Za-z]+', 0), 0L, "
        "(acc, w) -> acc + (length(w)+3) div 4)"
    )
    return docs.select(
        "doc_id",
        F.size(alpha).cast("long").alias("n_alpha_tokens"),
        F.size(num).cast("long").alias("n_numeric_tokens"),
        F.size(sym).cast("long").alias("n_symbol_tokens"),
        (est_alpha + F.size(num) + F.size(sym))
        .cast("long")
        .alias("est_bpe_tokens"),
    )


@query(
    "q121_lang_mix_weights",
    oracle=r"""
WITH per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM per
)
SELECT lang, n_docs, n_tokens,
       CAST(n_docs * 1000 // total_docs AS BIGINT) AS share_milli,
       CAST(total_docs * 1000 // (n_langs * n_docs) AS BIGINT) AS weight_milli
FROM per CROSS JOIN tot
""",
    tags=("llm", "curation", "window"),
)
def q121_lang_mix_weights(spark, sf_dir):
    """Language-mix reweighting for pretraining data assembly: per
    language, observed share (milli-units) and the sampling weight that
    would equalize the mix (uniform target across the observed
    languages), in exact integer fixed-point (no float division feeds a
    result column). ONE scan + one map-side-partial aggregate to |langs|
    rows; the corpus totals come from an unpartitioned window over that
    aggregate -- a single-task window over a bounded-cardinality frame
    (languages, not documents), so unlike the q109 scalar-broadcast
    shape this never re-reads the corpus for the total."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens"),
    )
    everything = W.partitionBy()
    return (
        per.withColumn(
            "total_docs", F.sum("n_docs").over(everything).cast("long")
        )
        .withColumn("n_langs", F.count(F.lit(1)).over(everything))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.expr("n_docs * 1000 div total_docs").alias("share_milli"),
            F.expr("total_docs * 1000 div (n_langs * n_docs)").alias(
                "weight_milli"
            ),
        )
    )
