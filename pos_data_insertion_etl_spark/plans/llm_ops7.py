"""Round-6 continuation registrations: the last two library dedup
operators from COVERAGE.md's registration queue (content-defined
chunking, pigeonhole-banded SimHash pairs), registered as canonical
queries so the driver's evidence window certifies them.

Both oracles follow the repo's engine-portability rules (md5-seeded
hashing, integer arithmetic, explicit rounding; see plans/registry.py).
The reference has no analytics surface of its own
(/root/reference/main.py:181-211 delegates to stored procedures); these
belong to the engine's LLM-curation tier (SURVEY.md §2).
"""

from __future__ import annotations

from ..catalog import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Content-defined chunking (operators/dedup.content_defined_chunks):
# boundaries where the trailing 8-token shingle's md5 prefix is
# 0 mod 16, with the standard CDC min-length rule. The oracle mirrors
# the operator exactly: per-position window hashes, candidate filter,
# then the sequential min-len greedy as a recursive CTE (the first
# candidate >= last_kept + min_len is kept -- identical to the
# operator's left fold). 8 hex digits decode exactly in a double
# (< 2^32), so the hex->int conversion is bit-portable.
# ---------------------------------------------------------------------------

_CDC_WINDOW, _CDC_MOD, _CDC_MINLEN = 8, 16, 16

_CDC_ORACLE = f"""
WITH RECURSIVE tokd AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks
  FROM documents
), hashed AS (
  SELECT doc_id, toks, len(toks) AS n FROM tokd
), posh AS (
  SELECT doc_id, p.i AS pos,
         substr(md5(array_to_string(
             list_slice(toks, p.i - {_CDC_WINDOW} + 1, p.i), ' ')), 1, 8) AS h8
  FROM hashed, unnest(range({_CDC_WINDOW}, n + 1)) AS p(i)
), cand AS (
  SELECT doc_id, pos
  FROM posh
  WHERE list_sum(list_transform(range(8),
          j -> (strpos('0123456789abcdef', substr(h8, j + 1, 1)) - 1)
               * power(16, 7 - j)))::BIGINT % {_CDC_MOD} = 0
), kept AS (
  SELECT doc_id, 0 AS pos FROM hashed
  UNION ALL
  SELECT k.doc_id,
         (SELECT MIN(c.pos) FROM cand c
          WHERE c.doc_id = k.doc_id AND c.pos - k.pos >= {_CDC_MINLEN})
  FROM kept k
  WHERE (SELECT MIN(c.pos) FROM cand c
         WHERE c.doc_id = k.doc_id AND c.pos - k.pos >= {_CDC_MINLEN})
        IS NOT NULL
), spans AS (
  SELECT k.doc_id, k.pos AS s,
         COALESCE(LEAD(k.pos) OVER (PARTITION BY k.doc_id ORDER BY k.pos),
                  h.n) AS e
  FROM kept k JOIN hashed h USING (doc_id)
)
SELECT doc_id,
       (ROW_NUMBER() OVER (PARTITION BY sp.doc_id ORDER BY sp.s) - 1)::BIGINT
           AS chunk_idx,
       array_to_string(list_slice(h.toks, sp.s + 1, sp.e), ' ') AS chunk_text,
       (sp.e - sp.s)::BIGINT AS n_tokens
FROM spans sp JOIN hashed h USING (doc_id)
WHERE sp.e > sp.s
"""


@query("q146_cdc_chunks", oracle=_CDC_ORACLE, tags=("dedup", "chunking"))
def q146_cdc_chunks(spark, sf_dir):
    """Content-defined chunking: boundaries move WITH the content
    (rsync/LBFS), so chunk-digest dedup survives upstream edits that
    shift every fixed-size chunk (q120's failure mode). Expression-only
    per-row HOFs; no shuffle."""
    from ..operators.dedup import content_defined_chunks

    docs = load_table(spark, sf_dir, "documents")
    return content_defined_chunks(
        docs,
        "text",
        "doc_id",
        window=_CDC_WINDOW,
        boundary_mod=_CDC_MOD,
        min_len=_CDC_MINLEN,
    )


# ---------------------------------------------------------------------------
# Pigeonhole-banded SimHash pairs (operators/dedup.simhash_hamming_pairs):
# hamming <= 3 over 16-bit SimHashes implies exact agreement on one of
# the 4 hash slices, so candidates come from an equi-join on
# (chunk_idx, chunk_value) -- never all-pairs. The oracle recomputes
# the same 16-bit simhash per doc (per-bit +/-1 sums over token md5
# hex digits) and the same chunk-agreement candidate rule.
# ---------------------------------------------------------------------------

_SH_MAXHAM, _SH_CHUNKS = 3, 4


def _simhash_pairs_oracle(max_hamming: int, n_chunks: int) -> str:
    hexhi = "'8','9','a','b','c','d','e','f'"
    sums = ",\n         ".join(
        f"SUM(CASE WHEN substr(md5(tok), {j + 1}, 1) IN ({hexhi})"
        f" THEN 1 ELSE -1 END) AS s{j:02d}"
        for j in range(16)
    )
    bits = " || ".join(
        f"(CASE WHEN s{j:02d} >= 0 THEN '1' ELSE '0' END)" for j in range(16)
    )
    width = 16 // n_chunks
    chunk_match = " OR ".join(
        f"substr(a.simhash, {i * width + 1}, {width})"
        f" = substr(b.simhash, {i * width + 1}, {width})"
        for i in range(n_chunks)
    )
    ham = " + ".join(
        f"(CASE WHEN substr(a.simhash, {j + 1}, 1)"
        f" != substr(b.simhash, {j + 1}, 1) THEN 1 ELSE 0 END)"
        for j in range(16)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
  FROM documents
), sums AS (
  SELECT doc_id, {sums} FROM toks GROUP BY doc_id
), sh AS (
  SELECT doc_id, {bits} AS simhash FROM sums
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST({ham} AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND ({chunk_match})
WHERE {ham} <= {max_hamming}
"""


@query(
    "q147_simhash_hamming_pairs",
    oracle=_simhash_pairs_oracle(_SH_MAXHAM, _SH_CHUNKS),
    tags=("dedup", "simhash"),
)
def q147_simhash_hamming_pairs(spark, sf_dir):
    """SimHash near-dup PAIRS at scale: pigeonhole banding turns
    hamming <= 3 into a (chunk_idx, chunk_value) equi-join -- the
    SimHash analog of MinHash's LSH band join -- then verifies exact
    hamming on the in-row pair. 16 bits/doc vs 8x32-hex MinHash sigs:
    the cheap coarse near-dup gate."""
    from ..operators.dedup import simhash_hamming_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_hamming_pairs(
        docs, "text", "doc_id", max_hamming=_SH_MAXHAM, n_chunks=_SH_CHUNKS
    )


# ---------------------------------------------------------------------------
# MMR diversified retrieval (operators/similarity.mmr_topk): greedy
# maximal-marginal-relevance over a bounded candidate pool. The greedy
# selection is inherently sequential in k, so the oracle UNROLLS it:
# one CTE block per rank, each an argmax of the integer MMR score
# (rel_weight*rel_fp - div_weight*max sim to already-selected) with id
# tiebreak -- the exact integer recurrence the operator's
# applyInPandas loop computes.
# ---------------------------------------------------------------------------

_MMR_K, _MMR_POOL, _MMR_NQ = 4, 10, 8
_MMR_RELW, _MMR_DIVW = 7, 3


def _mmr_oracle(k: int, pool: int, nq: int, relw: int, divw: int) -> str:
    sql = f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT)) AS v
  FROM embeddings
),
comp AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         unnest(q.v) AS qx, unnest(c.v) AS cx
  FROM qv q JOIN qv c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {nq}
),
dots AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(qx * cx) AS BIGINT) AS dot,
         CAST(SUM(qx * qx) AS BIGINT) AS qq,
         CAST(SUM(cx * cx) AS BIGINT) AS cc
  FROM comp GROUP BY 1, 2
),
rel AS (
  SELECT query_id, neighbor_id,
         CAST(ROUND(CAST(dot AS DOUBLE)
               / (SQRT(CAST(qq AS DOUBLE)) * SQRT(CAST(cc AS DOUBLE)))
               * 1000000) AS BIGINT) AS rel_fp
  FROM dots
),
cand AS (
  SELECT query_id, neighbor_id AS nid, rel_fp FROM (
    SELECT query_id, neighbor_id, rel_fp,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rel_fp DESC, neighbor_id) AS rn
    FROM rel) t
  WHERE rn <= {pool}
),
pcomp AS (
  SELECT a.query_id, a.nid AS pa, b.nid AS pb,
         unnest(va.v) AS ax, unnest(vb.v) AS bx
  FROM cand a
  JOIN cand b ON b.query_id = a.query_id
  JOIN qv va ON va.vec_id = a.nid
  JOIN qv vb ON vb.vec_id = b.nid
),
pw AS (
  SELECT query_id, pa, pb,
         CAST(ROUND(CAST(SUM(ax * bx) AS BIGINT)
               / (SQRT(CAST(SUM(ax * ax) AS BIGINT))
                  * SQRT(CAST(SUM(bx * bx) AS BIGINT)))
               * 1000000) AS BIGINT) AS sim_fp
  FROM pcomp GROUP BY 1, 2, 3
),
sel1 AS (
  SELECT query_id, nid, rel_fp, rel_fp AS mmr_fp, 1 AS mmr_rank FROM (
    SELECT query_id, nid, rel_fp,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rel_fp DESC, nid) AS rn
    FROM cand) t
  WHERE rn = 1
),
selu1 AS (SELECT * FROM sel1)"""
    for t in range(2, k + 1):
        sql += f""",
ms{t} AS (
  SELECT c.query_id, c.nid, c.rel_fp, MAX(p.sim_fp) AS ms
  FROM cand c
  JOIN selu{t - 1} s ON s.query_id = c.query_id
  JOIN pw p ON p.query_id = c.query_id AND p.pa = c.nid AND p.pb = s.nid
  LEFT JOIN selu{t - 1} x ON x.query_id = c.query_id AND x.nid = c.nid
  WHERE x.nid IS NULL
  GROUP BY 1, 2, 3
),
sel{t} AS (
  SELECT query_id, nid, rel_fp, mmr_fp, {t} AS mmr_rank FROM (
    SELECT query_id, nid, rel_fp,
           {relw} * rel_fp - {divw} * ms AS mmr_fp,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY {relw} * rel_fp - {divw} * ms DESC,
                                       nid) AS rn
    FROM ms{t}) t
  WHERE rn = 1
),
selu{t} AS (SELECT * FROM selu{t - 1} UNION ALL SELECT * FROM sel{t})"""
    sql += f"""
SELECT query_id, nid AS neighbor_id,
       CAST(mmr_rank AS BIGINT) AS mmr_rank, rel_fp, mmr_fp
FROM selu{k}
"""
    return sql


@query(
    "q148_mmr_diversified_topk",
    oracle=_mmr_oracle(_MMR_K, _MMR_POOL, _MMR_NQ, _MMR_RELW, _MMR_DIVW),
    tags=("similarity", "ann", "mmr"),
)
def q148_mmr_diversified_topk(spark, sf_dir):
    """Maximal-marginal-relevance diversified top-k: candidate pool by
    exact cosine (broadcast queries, one corpus scan), pairwise sims by
    pool-bounded equi-join, greedy integer-MMR selection per query in
    one Arrow-batched applyInPandas group."""
    from pyspark.sql import functions as F

    from ..operators.similarity import mmr_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_topk(
        emb,
        emb.filter(F.col("vec_id") < _MMR_NQ),
        "vec_id",
        "embedding",
        k=_MMR_K,
        pool=_MMR_POOL,
        rel_weight=_MMR_RELW,
        div_weight=_MMR_DIVW,
    )


# ---------------------------------------------------------------------------
# Temperature-flattened mixture weights (operators/mixture.
# temperature_mixture_weights): share^alpha source reweighting with
# alpha = 1/2 so the shaping is one IEEE sqrt (engine-portable; an
# arbitrary pow() differs across libm implementations in the last ulp).
# ---------------------------------------------------------------------------

_TEMP_BUDGET = 100_000

_TEMP_ORACLE = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT)
             AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM per
), q AS (
  SELECT source, n_docs, n_tokens,
         ROUND(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share,
         CAST(ROUND(SQRT(CAST(n_tokens AS DOUBLE) / tt) * 1000000000)
              AS BIGINT) AS q_fp
  FROM per, tot
), qt AS (
  SELECT CAST(SUM(q_fp) AS BIGINT) AS qq FROM q
)
SELECT source, n_docs, n_tokens, token_share, q_fp,
       ROUND(CAST(q_fp AS DOUBLE) / qq, 6) AS weight,
       CAST(ROUND({_TEMP_BUDGET} * CAST(q_fp AS DOUBLE) / qq) AS BIGINT)
           AS budget
FROM q, qt
"""


@query(
    "q149_temperature_mixture",
    oracle=_TEMP_ORACLE,
    tags=("curation", "mixture"),
)
def q149_temperature_mixture(spark, sf_dir):
    """Per-source temperature (alpha=1/2) mixture weights + token
    budgets: one groupBy over the corpus, shaping math on the tiny
    per-source frame against broadcast scalar totals."""
    from ..operators.mixture import temperature_mixture_weights

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mixture_weights(
        docs, budget_tokens=_TEMP_BUDGET, sqrt_passes=1
    )


# ---------------------------------------------------------------------------
# HTML text extraction (operators/quality.html_text_extract). The
# documents table is plain text, so the query wraps each document in a
# deterministic HTML page (tags, a script block with comparison
# operators, a style block, entities, a comment) and extracts -- both
# engines build and strip the identical page, exercising every rule:
# script/style/comment removal, tag strip, entity decode order
# (&amp; last), whitespace collapse.
# ---------------------------------------------------------------------------

_HTML_ORACLE = r"""
WITH page AS (
  SELECT doc_id,
         '<html><head><title>' || source || '</title>'
         || '<style type="text/css">body { color: red; }</style></head>'
         || '<body><h1>' || source || '</h1>' || chr(10)
         || '<script type="text/javascript">var i = 1 < 2 && 3 > 2;</script>'
         || '<p>' || text || '</p>' || chr(10)
         || '<p>A &amp;&amp; B &lt;tag&gt; &quot;q&quot;'
         || ' &#39;s&#39;&nbsp;end</p>'
         || '<!-- build 42 --></body></html>' AS html
  FROM documents
), stripped AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(html,
                 '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
             '(?s)<!--.*?-->', ' ', 'g'),
           '<[^>]+>', ' ', 'g') AS t
  FROM page
), decoded AS (
  SELECT doc_id,
         replace(replace(replace(replace(replace(replace(t,
           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
           '&nbsp;', ' '), '&amp;', '&') AS t
  FROM stripped
)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '\s+', ' ', 'g'),
                      '^\s+|\s+$', '', 'g') AS clean_text,
       CAST(length(regexp_replace(regexp_replace(t, '\s+', ' ', 'g'),
                      '^\s+|\s+$', '', 'g')) AS BIGINT) AS n_chars
FROM decoded
"""


@query(
    "q150_html_text_extract",
    oracle=_HTML_ORACLE,
    tags=("curation", "text"),
)
def q150_html_text_extract(spark, sf_dir):
    """Web-crawl text extraction: wrap each document in a deterministic
    HTML page, then strip script/style/comments/tags, decode entities,
    collapse whitespace -- all JVM regex/replace expressions, zero
    shuffle."""
    from pyspark.sql import functions as F

    from ..operators.quality import html_text_extract

    docs = load_table(spark, sf_dir, "documents")
    page = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>"),
            F.col("source"),
            F.lit('</title><style type="text/css">body { color: red; }'
                  "</style></head><body><h1>"),
            F.col("source"),
            F.lit("</h1>\n<script type=\"text/javascript\">"
                  "var i = 1 < 2 && 3 > 2;</script><p>"),
            F.col("text"),
            F.lit("</p>\n<p>A &amp;&amp; B &lt;tag&gt; &quot;q&quot;"
                  " &#39;s&#39;&nbsp;end</p><!-- build 42 -->"
                  "</body></html>"),
        ).alias("html"),
    )
    clean = html_text_extract(F.col("html"))
    return page.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# Curriculum deciles over LM cross-entropy (operators/mixture.
# ntile_bins): exact NTILE(10) without a single-partition window --
# global rank via the two-phase range-partition sequence, then the
# SQL-standard tile arithmetic. The oracle IS NTILE(10) over the q129
# scoring CTE, proving the distributed form matches the SQL builtin
# row-for-row.
# ---------------------------------------------------------------------------

from .llm_ops6 import _UNIGRAM_ORACLE  # noqa: E402  (shared scoring CTE)

_DECILE_ORACLE = f"""
WITH u AS ({_UNIGRAM_ORACLE})
SELECT bin, COUNT(*) AS n_docs,
       MIN(cross_entropy) AS min_ce, MAX(cross_entropy) AS max_ce,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM (
  SELECT *,
         CAST(NTILE(10) OVER (ORDER BY cross_entropy, doc_id) AS BIGINT)
             AS bin
  FROM u) t
GROUP BY bin
"""


@query(
    "q151_ce_decile_bins",
    oracle=_DECILE_ORACLE,
    tags=("curation", "curriculum"),
)
def q151_ce_decile_bins(spark, sf_dir):
    """Curriculum buckets: exact cross-entropy deciles (scale-safe
    NTILE via the parallel global sequence) with per-bin document and
    token rollups."""
    from pyspark.sql import functions as F

    from ..operators.lm_score import unigram_lm_scores
    from ..operators.mixture import ntile_bins

    docs = load_table(spark, sf_dir, "documents")
    scores = unigram_lm_scores(docs, "text", "doc_id", top_v=20)
    binned = ntile_bins(
        scores, [F.col("cross_entropy"), F.col("doc_id")], 10
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("cross_entropy").alias("min_ce"),
        F.max("cross_entropy").alias("max_ce"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


# ---------------------------------------------------------------------------
# Epoch reshuffle + shard assignment (operators/mixture.
# epoch_shard_shuffle): md5-keyed deterministic permutation per epoch,
# hash-assigned shards, per-shard position windows -- never a global
# single-partition sort.
# ---------------------------------------------------------------------------

_EPOCHS, _SHARDS = 2, 8

_SHUFFLE_ORACLE = f"""
WITH e AS (
  SELECT doc_id, ep.epoch
  FROM documents, (VALUES (0), (1)) AS ep(epoch)
), h AS (
  SELECT doc_id, epoch,
         md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS hh
  FROM e
), s AS (
  SELECT doc_id, epoch, hh,
         CAST(list_sum(list_transform(range(8),
             j -> (strpos('0123456789abcdef', substr(hh, j + 1, 1)) - 1)
                  * power(16, 7 - j))) AS BIGINT) % {_SHARDS} AS shard
  FROM h
)
SELECT doc_id, CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard
                               ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
FROM s
"""


@query(
    "q152_epoch_shard_shuffle",
    oracle=_SHUFFLE_ORACLE,
    tags=("curation", "dataloader"),
)
def q152_epoch_shard_shuffle(spark, sf_dir):
    """Training dataloader assignment: reproducible per-epoch
    pseudo-random permutation into n_shards worker streams, one scan,
    per-shard windows."""
    from ..operators.mixture import epoch_shard_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return epoch_shard_shuffle(docs, n_epochs=_EPOCHS, n_shards=_SHARDS)


# ---------------------------------------------------------------------------
# Blocklist gate (operators/quality.badword_filter): C4-style badword
# filter in probe form (lowercase + end-punctuation strip), blocklist
# as a literal array -- expression-only.
# ---------------------------------------------------------------------------

_BLOCKLIST = ("slow", "crash", "corrupt", "forbidden")

_BADWORD_ORACLE = """
WITH probed AS (
  SELECT doc_id,
         list_transform(
           string_split_regex(
             regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'),
           x -> regexp_replace(lower(x),
                '^[!-/:-@\\[-`{-~]+|[!-/:-@\\[-`{-~]+$', '', 'g'))
             AS pw
  FROM documents
), hits AS (
  SELECT doc_id, pw,
         list_filter(pw,
           x -> list_contains(['slow', 'crash', 'corrupt', 'forbidden'], x))
             AS bad
  FROM probed
)
SELECT doc_id,
       CAST(len(bad) AS BIGINT) AS n_bad_tokens,
       CAST(len(list_filter(['slow', 'crash', 'corrupt', 'forbidden'],
                            x -> list_contains(pw, x))) AS BIGINT)
           AS n_bad_distinct,
       bad[1] AS first_bad,
       len(bad) = 0 AS clean
FROM hits
"""


@query(
    "q153_badword_filter",
    oracle=_BADWORD_ORACLE,
    tags=("curation", "quality"),
)
def q153_badword_filter(spark, sf_dir):
    """Blocklist gate: per-document badword occurrences, distinct hits,
    first offending token, and the keep decision -- zero shuffle."""
    from ..operators.quality import badword_filter

    docs = load_table(spark, sf_dir, "documents")
    return badword_filter(docs, _BLOCKLIST)


# ---------------------------------------------------------------------------
# Cross-document duplicate n-gram fraction (operators/quality.
# dup_ngram_stats): the RefinedWeb-style dedup-pressure metric. One
# digest-keyed shuffle; text itself never shuffles.
# ---------------------------------------------------------------------------

_DUPG_N = 5

_DUPG_ORACLE = f"""
WITH tokd AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
), g AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, p.i, p.i + {_DUPG_N - 1}), ' '))
             AS gram
  FROM tokd, unnest(range(1, len(t) - {_DUPG_N - 2})) AS p(i)
  WHERE len(t) >= {_DUPG_N}
), gd AS (
  SELECT gram, COUNT(*) AS nd
  FROM (SELECT DISTINCT doc_id, gram FROM g) GROUP BY gram
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_grams,
       ROUND(CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_frac
FROM g JOIN gd USING (gram)
GROUP BY doc_id
"""


@query(
    "q154_dup_ngram_fraction",
    oracle=_DUPG_ORACLE,
    tags=("dedup", "quality"),
)
def q154_dup_ngram_fraction(spark, sf_dir):
    """Per-document fraction of 5-gram occurrences that also exist in
    another document -- the corpus-redundancy signal that tunes dedup
    thresholds."""
    from ..operators.quality import dup_ngram_stats

    docs = load_table(spark, sf_dir, "documents")
    return dup_ngram_stats(docs, n=_DUPG_N)


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: the q53 stopword-overlap predictor
# evaluated against the labeled `lang` column -- per (actual,
# predicted) cell counts and within-actual shares.
# ---------------------------------------------------------------------------

from .llm_ops import _langid_oracle, q53_langid  # noqa: E402

_CONFUSION_ORACLE = f"""
WITH p AS ({_langid_oracle()})
SELECT actual_lang, pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY actual_lang), 6) AS share,
       actual_lang = pred_lang AS correct
FROM p GROUP BY actual_lang, pred_lang
"""


@query(
    "q155_langid_confusion",
    oracle=_CONFUSION_ORACLE,
    tags=("text", "langid", "eval"),
)
def q155_langid_confusion(spark, sf_dir):
    """Confusion matrix of the heuristic language identifier against
    the labeled language column: cell counts + per-actual-language
    shares (the operator-evaluation pattern: every classifier in the
    engine should be measurable in the engine)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    pred = q53_langid(spark, sf_dir)
    cells = pred.groupBy("actual_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = W.partitionBy("actual_lang")
    return cells.select(
        "actual_lang",
        "pred_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("share"),
        (F.col("actual_lang") == F.col("pred_lang")).alias("correct"),
    )


# ---------------------------------------------------------------------------
# Quality-gate threshold sweep: pass rates of the stopword rule (and
# the full Gopher gate under that rule) across candidate thresholds --
# the tuning table a curation run consults before fixing its gate.
# ---------------------------------------------------------------------------

from .llm_ops6 import _GOPHER_ORACLE  # noqa: E402

_SWEEP_MAX_T = 5

_SWEEP_ORACLE = f"""
WITH g AS ({_GOPHER_ORACLE}),
th AS (SELECT unnest(range(0, {_SWEEP_MAX_T + 1})) AS threshold)
SELECT CAST(threshold AS BIGINT) AS threshold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN stopword_hits >= threshold THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass_stopword,
       CAST(SUM(CASE WHEN flag_word_count AND flag_mean_word_len
                      AND flag_symbol_ratio AND flag_bullet_lines
                      AND flag_ellipsis_lines AND flag_alpha_words
                      AND stopword_hits >= threshold THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass_full
FROM g, th GROUP BY threshold
"""


@query(
    "q156_gate_threshold_sweep",
    oracle=_SWEEP_ORACLE,
    tags=("curation", "quality", "eval"),
)
def q156_gate_threshold_sweep(spark, sf_dir):
    """Sweep the stopword-hits threshold 0..5: per threshold, how many
    documents pass the stopword rule alone and the full Gopher gate
    with the threshold substituted -- one flags pass, one tiny
    explode."""
    from pyspark.sql import functions as F

    from ..operators.quality import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs)
    other = (
        F.col("flag_word_count")
        & F.col("flag_mean_word_len")
        & F.col("flag_symbol_ratio")
        & F.col("flag_bullet_lines")
        & F.col("flag_ellipsis_lines")
        & F.col("flag_alpha_words")
    )
    swept = flags.select(
        F.col("stopword_hits"),
        other.alias("_other"),
        F.explode(
            F.array(*[F.lit(t) for t in range(_SWEEP_MAX_T + 1)])
        ).alias("threshold"),
    )
    return swept.groupBy(F.col("threshold").cast("long").alias("threshold")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("stopword_hits") >= F.col("threshold")).cast("int"))
        .cast("long")
        .alias("n_pass_stopword"),
        F.sum(
            (F.col("_other") & (F.col("stopword_hits") >= F.col("threshold")))
            .cast("int")
        )
        .cast("long")
        .alias("n_pass_full"),
    )


# ---------------------------------------------------------------------------
# Text canonicalization (operators/quality.normalize_text): the
# documents fixture is ASCII-clean, so the query DECORATES each text
# with the exact artifacts the normalizer exists to kill (typographic
# quotes/dash, zero-width space, word joiner, NBSP, whitespace runs)
# and proves both engines canonicalize the decorated form to the same
# string + digest. translate() has PostgreSQL semantics in both
# engines (chars beyond the target string are deleted). Prefix/suffix
# and the oracle SQL are derived from the same escape constants below,
# so the Spark literal and the SQL literal are byte-identical.
# ---------------------------------------------------------------------------

#: left double quote / right double quote, zero-width space, double
#: space, en dash, NBSP, word joiner.
_CANON_PREFIX = "\u201c"
_CANON_SUFFIX = "\u201d\u200b  \u2013\u00a0fin\u2060"

_CANON_ORACLE = """
WITH deco AS (
  SELECT doc_id, '“' || text || '”​  – fin⁠' AS raw
  FROM documents
), dropped AS (
  SELECT doc_id, translate(raw, '​‌‍﻿­⁠', '') AS t
  FROM deco
), mapped AS (
  SELECT doc_id,
         translate(t, '‘’“”–— 　', '''''""--  ') AS t
  FROM dropped
)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '\\s+', ' ', 'g'),
                      '^\\s+|\\s+$', '', 'g') AS canon_text,
       md5(regexp_replace(regexp_replace(t, '\\s+', ' ', 'g'),
                      '^\\s+|\\s+$', '', 'g')) AS canon_digest
FROM mapped
"""


@query(
    "q157_canonical_text",
    oracle=_CANON_ORACLE,
    tags=("dedup", "canonicalization"),
)
def q157_canonical_text(spark, sf_dir):
    """Canonical dedup keys: decorate each document with typographic
    quotes/dashes, zero-width characters and NBSP, then normalize --
    the canonical form and md5 fingerprint must be identical in both
    engines. Pure translate/regex expressions, zero shuffle."""
    from pyspark.sql import functions as F

    from ..operators.quality import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    deco = F.concat(
        F.lit(_CANON_PREFIX), F.col("text"), F.lit(_CANON_SUFFIX)
    )
    canon = normalize_text(deco)
    return docs.select(
        "doc_id",
        canon.alias("canon_text"),
        F.md5(canon).alias("canon_digest"),
    )


# ---------------------------------------------------------------------------
# Z-order clustering key (operators/zorder): exact Morton interleave of
# min/max-scaled bucket ids -- the data-skipping layout key. The oracle
# rebuilds the identical integer bit arithmetic.
# ---------------------------------------------------------------------------

_Z_BITS = 10


def _zorder_oracle(bits: int) -> str:
    top = (1 << bits) - 1
    inter = " + ".join(
        f"(((xb >> {i}) & 1) << {2 * i + 1}) + (((yb >> {i}) & 1) << {2 * i})"
        for i in range(bits)
    )
    return f"""
WITH b AS (
  SELECT CAST(MIN(o_custkey) AS BIGINT) AS xmin,
         CAST(MAX(o_custkey) AS BIGINT) AS xmax,
         CAST(MIN(o_orderkey) AS BIGINT) AS ymin,
         CAST(MAX(o_orderkey) AS BIGINT) AS ymax
  FROM orders
), k AS (
  SELECT o_orderkey,
         CASE WHEN xmax > xmin
              THEN CAST(FLOOR((o_custkey - xmin) * {top}.0 / (xmax - xmin))
                        AS BIGINT)
              ELSE 0 END AS xb,
         CASE WHEN ymax > ymin
              THEN CAST(FLOOR((o_orderkey - ymin) * {top}.0 / (ymax - ymin))
                        AS BIGINT)
              ELSE 0 END AS yb
  FROM orders, b
)
SELECT o_orderkey, xb, yb, CAST({inter} AS BIGINT) AS zkey
FROM k
"""


@query(
    "q158_zorder_key",
    oracle=_zorder_oracle(_Z_BITS),
    tags=("layout", "zorder"),
)
def q158_zorder_key(spark, sf_dir):
    """Morton clustering key over (o_custkey, o_orderkey): global
    min/max as broadcast scalars, bucket scaling + bit interleave as
    pure integer expressions -- the key zorder_cluster range-partitions
    and sorts by at write time so file stats prune on both columns."""
    from pyspark.sql import functions as F

    from ..operators.zorder import with_zorder_key

    orders = load_table(spark, sf_dir, "orders")
    return with_zorder_key(
        orders, "o_custkey", "o_orderkey", bits=_Z_BITS
    ).select("o_orderkey", "xb", "yb", "zkey")


# ---------------------------------------------------------------------------
# Exact join-key skew diagnosis (operators/skew.join_skew_report):
# the pre-join planning table. TakeOrderedAndProject for the top-k,
# scalar-broadcast totals; key cardinality never hits the driver.
# ---------------------------------------------------------------------------

_SKEW_TOPK = 10

_SKEW_ORACLE = f"""
WITH c AS (
  SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS total_rows
  FROM c
), ranked AS (
  SELECT l_suppkey, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l_suppkey) AS BIGINT)
             AS rank
  FROM c
)
SELECT rank, l_suppkey, CAST(cnt AS BIGINT) AS cnt,
       ROUND(CAST(cnt AS DOUBLE) / total_rows, 6) AS share,
       ROUND(CAST(SUM(cnt) OVER (ORDER BY rank
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / total_rows, 6) AS cum_share,
       n_keys, total_rows
FROM ranked, t
WHERE rank <= {_SKEW_TOPK}
"""


@query(
    "q159_join_skew_report",
    oracle=_SKEW_ORACLE,
    tags=("diagnostics", "skew"),
)
def q159_join_skew_report(spark, sf_dir):
    """Exact top-10 heavy-key report for lineitem.l_suppkey: counts,
    shares, cumulative shares + global key/row totals -- the evidence a
    broadcast/salting/AQE decision reads."""
    from ..operators.skew import join_skew_report

    li = load_table(spark, sf_dir, "lineitem")
    return join_skew_report(li, "l_suppkey", top_k=_SKEW_TOPK)


# ---------------------------------------------------------------------------
# Greedy NO-SPLIT sequence packing (operators/packing): documents never
# straddle packs, so packs carry real padding waste -- the other
# standard dataloader layout next to q91's concat-then-chunk. The fold
# is sequential per shard (shard = parallel unit); the oracle walks the
# identical recurrence as a recursive CTE.
# ---------------------------------------------------------------------------

_PACK_NS_BUDGET, _PACK_NS_SHARDS = 256, 8


def _nosplit_walk_sql(budget: int, shards: int) -> str:
    close = f"w.cur > 0 AND w.cur + o.n_tokens > {budget}"
    return f"""
WITH RECURSIVE sized AS (
  SELECT doc_id, doc_id % {shards} AS shard,
         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), ordered AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM sized
), walk AS (
  SELECT doc_id, shard, n_tokens, rn,
         CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pos_in_pack,
         n_tokens AS cur
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.doc_id, o.shard, o.n_tokens, o.rn,
         CASE WHEN {close} THEN w.pack_id + 1 ELSE w.pack_id END,
         CASE WHEN {close} THEN CAST(0 AS BIGINT)
              ELSE w.pos_in_pack + 1 END,
         CASE WHEN {close} THEN o.n_tokens ELSE w.cur + o.n_tokens END
  FROM walk w JOIN ordered o ON o.shard = w.shard AND o.rn = w.rn + 1
)"""


_PACK_NS_ORACLE = (
    _nosplit_walk_sql(_PACK_NS_BUDGET, _PACK_NS_SHARDS)
    + """
SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens, pack_id,
       pos_in_pack
FROM walk
"""
)


@query(
    "q160_pack_nosplit",
    oracle=_PACK_NS_ORACLE,
    tags=("llm", "packing"),
)
def q160_pack_nosplit(spark, sf_dir):
    """Greedy no-split packing assignment: per document the (shard,
    pack, position) under the close-on-overflow rule, one Arrow
    applyInPandas group per shard."""
    from ..operators.packing import greedy_pack_no_split

    docs = load_table(spark, sf_dir, "documents")
    return greedy_pack_no_split(
        docs, pack_budget=_PACK_NS_BUDGET, n_shards=_PACK_NS_SHARDS
    )


_PACK_EFF_ORACLE = (
    _nosplit_walk_sql(_PACK_NS_BUDGET, _PACK_NS_SHARDS)
    + f"""
SELECT CAST(shard AS BIGINT) AS shard, pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / {_PACK_NS_BUDGET}, 6)
           AS fill_rate
FROM walk GROUP BY shard, pack_id
"""
)


@query(
    "q161_pack_efficiency",
    oracle=_PACK_EFF_ORACLE,
    tags=("llm", "packing", "eval"),
)
def q161_pack_efficiency(spark, sf_dir):
    """Packing tuning table: per (shard, pack) document count, token
    fill and fill rate against the budget -- the report that decides
    budget/shard settings for a training run."""
    from ..operators.packing import (
        greedy_pack_no_split,
        pack_efficiency_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    packed = greedy_pack_no_split(
        docs, pack_budget=_PACK_NS_BUDGET, n_shards=_PACK_NS_SHARDS
    )
    return pack_efficiency_report(packed, pack_budget=_PACK_NS_BUDGET)


# ---------------------------------------------------------------------------
# Near-dup cluster-size histogram: the dedup-aggressiveness tuning
# table over the FULL q90 pipeline output. The oracle nests q90's
# recursive-CTE replica as a subquery.
# ---------------------------------------------------------------------------


def _cluster_hist_oracle() -> str:
    from .llm_ops2 import _neardup_pipeline_oracle

    return f"""
WITH pipe AS ({_neardup_pipeline_oracle()}),
csize AS (
  SELECT keeper_id, COUNT(*) AS cluster_size FROM pipe GROUP BY keeper_id
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
FROM csize GROUP BY cluster_size
"""


@query(
    "q162_neardup_cluster_sizes",
    oracle=_cluster_hist_oracle(),
    tags=("dedup", "eval"),
)
def q162_neardup_cluster_sizes(spark, sf_dir):
    """Histogram of near-dup cluster sizes from the end-to-end LSH
    pipeline: how many singletons vs multi-document clusters the
    threshold produces -- the table that tunes band count and Jaccard
    threshold."""
    from pyspark.sql import functions as F

    from ..operators.dedup import neardup_keepers

    docs = load_table(spark, sf_dir, "documents")
    keepers = neardup_keepers(
        docs, "text", "doc_id", threshold_num=1, threshold_den=2
    )
    csize = keepers.groupBy("keeper_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return csize.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").cast("long").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Balanced per-label sampling over embeddings: class rebalancing for
# training -- q126's per-source cap, applied to labels, deterministic
# md5 order. One per-label window.
# ---------------------------------------------------------------------------

_LABEL_CAP = 25

_BALANCED_ORACLE = f"""
SELECT vec_id, label, sel_rank FROM (
  SELECT vec_id, label,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY label
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT)
             AS sel_rank
  FROM embeddings) t
WHERE sel_rank <= {_LABEL_CAP}
"""


@query(
    "q163_balanced_label_sample",
    oracle=_BALANCED_ORACLE,
    tags=("curation", "sampling"),
)
def q163_balanced_label_sample(spark, sf_dir):
    """Per-class balanced downsample: at most N vectors per label in
    deterministic md5 order (unbiased, reproducible on any cluster) --
    one per-label window, WindowGroupLimit pushes the cap below the
    shuffle."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    w = W.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        emb.select(
            "vec_id",
            "label",
            F.row_number().over(w).cast("long").alias("sel_rank"),
        )
        .filter(F.col("sel_rank") <= _LABEL_CAP)
    )
