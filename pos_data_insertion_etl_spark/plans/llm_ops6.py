"""Round-6 registrations: the library operators that landed in round 5
with pytest + local-DuckDB-oracle evidence but no driver CORRECTNESS
row (VERDICT r5 "Next round" item 1). Each becomes a canonical registry
query here so the driver's 50-entry evidence window certifies it.

Everything in this module is a thin declared-query wrapper over an
already-tested operator (operators/quality.py, lm_score.py, mixture.py,
similarity.py, dedup.py, bloom.py, heavyhitters.py, pca.py, graph.py,
gapfill.py, pipeline/curation.py); the oracle SQL mirrors the operator
semantics exactly -- md5-seeded hashes, fixed-point integer arithmetic
and explicit rounding make every query engine-portable bit-for-bit
(the same portability rules as plans/registry.py's module docstring).

The reference has no analytics of its own to compare against (it
delegates to stored procedures, /root/reference/main.py:181-211); these
operators are the engine's LLM-curation north-star surface
(SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Quality gates + LM scoring (expression-only / broadcast-model stages)
# ---------------------------------------------------------------------------

_GOPHER_ORACLE = """
WITH base AS (
  SELECT doc_id,
         regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS t,
         string_split_regex(
             regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS words,
         string_split(text, chr(10)) AS lines
  FROM documents
), probed AS (
  SELECT *,
         list_transform(words,
             x -> regexp_replace(lower(x),
                  '^[!-/:-@\\[-`{-~]+|[!-/:-@\\[-`{-~]+$', '', 'g'))
             AS pwords
  FROM base
), m AS (
  SELECT doc_id,
         CASE WHEN t = '' THEN 0 ELSE len(words) END AS n_words,
         length(regexp_replace(t, '\\s+', '', 'g')) AS n_word_chars,
         len(list_filter(pwords, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(lines) AS n_lines,
         len(list_filter(lines,
             x -> substr(trim(x), 1, 2) IN ('- ', '* ', '• '))) AS n_bullet,
         len(list_filter(lines, x -> rtrim(x) LIKE '%...')) AS n_ellipsis,
         (length(t) - length(replace(t, '#', '')))
           + (length(t) - length(replace(t, '…', ''))) AS n_symbols,
         (CASE WHEN list_contains(pwords, 'the') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'be') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'to') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'of') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'and') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'that') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'have') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'with') THEN 1 ELSE 0 END
         ) AS stop_hits
  FROM probed
), r AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words > 0
              THEN ROUND(CAST(n_word_chars AS DOUBLE) / n_words, 6) END
             AS mean_word_len,
         CASE WHEN n_words > 0
              THEN ROUND(CAST(n_symbols AS DOUBLE) / n_words, 6) END
             AS symbol_word_ratio,
         CASE WHEN n_lines > 0
              THEN ROUND(CAST(n_bullet AS DOUBLE) / n_lines, 6) END
             AS bullet_line_frac,
         CASE WHEN n_lines > 0
              THEN ROUND(CAST(n_ellipsis AS DOUBLE) / n_lines, 6) END
             AS ellipsis_line_frac,
         CASE WHEN n_words > 0
              THEN ROUND(CAST(n_alpha AS DOUBLE) / n_words, 6) END
             AS alpha_word_frac,
         CAST(stop_hits AS BIGINT) AS stopword_hits
  FROM m
)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
       stopword_hits,
       COALESCE(n_words BETWEEN 50 AND 100000, FALSE) AS flag_word_count,
       COALESCE(mean_word_len BETWEEN 3.0 AND 10.0, FALSE) AS flag_mean_word_len,
       COALESCE(symbol_word_ratio < 0.1, FALSE) AS flag_symbol_ratio,
       COALESCE(bullet_line_frac <= 0.9, FALSE) AS flag_bullet_lines,
       COALESCE(ellipsis_line_frac <= 0.3, FALSE) AS flag_ellipsis_lines,
       COALESCE(alpha_word_frac >= 0.8, FALSE) AS flag_alpha_words,
       COALESCE(stopword_hits >= 2, FALSE) AS flag_stopwords,
       (COALESCE(n_words BETWEEN 50 AND 100000, FALSE)
        AND COALESCE(mean_word_len BETWEEN 3.0 AND 10.0, FALSE)
        AND COALESCE(symbol_word_ratio < 0.1, FALSE)
        AND COALESCE(bullet_line_frac <= 0.9, FALSE)
        AND COALESCE(ellipsis_line_frac <= 0.3, FALSE)
        AND COALESCE(alpha_word_frac >= 0.8, FALSE)
        AND COALESCE(stopword_hits >= 2, FALSE)) AS gopher_pass
FROM r
"""


@query("q128_gopher_quality", oracle=_GOPHER_ORACLE, tags=("curation", "quality"))
def q128_gopher_quality(spark, sf_dir):
    """Gopher/C4 heuristic quality metrics + flags per document, ONE
    expression-only pass (operators/quality.gopher_quality_flags) --
    the cheap gate a curation pipeline runs before anything shuffles."""
    from ..operators.quality import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs)


_LM_TOPV = 20

_UNIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents WHERE trim(text) != ''
), vocab AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT SUM(c) AS n, COUNT(*) AS v FROM vocab
), topv AS (
  SELECT tok, c FROM (
    SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rn FROM vocab
  ) WHERE rn <= {_LM_TOPV}
), model AS (
  SELECT tok,
         CAST(ROUND(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v + 1 AS DOUBLE))
                    * 1000000) AS BIGINT) AS lp_fp
  FROM topv, tot
), oov AS (
  SELECT CAST(ROUND(ln(1.0 / CAST(n + v + 1 AS DOUBLE)) * 1000000) AS BIGINT)
             AS oov_fp
  FROM tot
), scored AS (
  SELECT t.doc_id, COALESCE(m.lp_fp, o.oov_fp) AS fp
  FROM toks t LEFT JOIN model m USING (tok) CROSS JOIN oov o
), agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(fp) AS sum_fp FROM scored
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       ROUND(-CAST(sum_fp AS DOUBLE) / 1000000 / n_tokens, 6) AS cross_entropy,
       ROUND(exp(ROUND(-CAST(sum_fp AS DOUBLE) / 1000000 / n_tokens, 6)), 4)
           AS ppl_proxy
FROM agg
"""


@query("q129_unigram_lm_ce", oracle=_UNIGRAM_ORACLE, tags=("curation", "lm"))
def q129_unigram_lm_ce(spark, sf_dir):
    """Per-document cross-entropy under a corpus-trained add-one
    unigram model (operators/lm_score.unigram_lm_scores): the
    CCNet-style perplexity filter, broadcast model + fixed-point
    integer log-prob sums so both engines agree bit-for-bit."""
    from ..operators.lm_score import unigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    return unigram_lm_scores(docs, "text", "doc_id", top_v=_LM_TOPV)


_LM_TOPB = 40

_BIGRAM_ORACLE = f"""
WITH arrs AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS a
  FROM documents WHERE trim(text) != ''
), bg AS (
  SELECT doc_id,
         unnest(a[1:len(a)-1]) AS prev,
         unnest(a[2:len(a)]) AS tok
  FROM arrs WHERE len(a) >= 2
), counts AS (
  SELECT prev, tok, COUNT(*) AS c FROM bg GROUP BY prev, tok
), ctx AS (
  SELECT prev, SUM(c) AS c_prev FROM counts GROUP BY prev
), vocab AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(a) AS tok FROM arrs)
), ctx_fp AS (
  SELECT prev, c_prev,
         CAST(ROUND(ln(1.0 / CAST(c_prev + v + 1 AS DOUBLE)) * 1000000)
              AS BIGINT) AS ctx_oov_fp
  FROM ctx, vocab
), model AS (
  SELECT prev, tok,
         CAST(ROUND(ln(CAST(c + 1 AS DOUBLE) / CAST(c_prev + v + 1 AS DOUBLE))
                    * 1000000) AS BIGINT) AS lp_fp
  FROM (
    SELECT prev, tok, c,
           ROW_NUMBER() OVER (ORDER BY c DESC, prev, tok) AS rn
    FROM counts
  ) t JOIN ctx USING (prev) CROSS JOIN vocab
  WHERE rn <= {_LM_TOPB}
), gfp AS (
  SELECT CAST(ROUND(ln(1.0 / CAST(v + 1 AS DOUBLE)) * 1000000) AS BIGINT)
             AS global_oov_fp
  FROM vocab
), scored AS (
  SELECT b.doc_id,
         COALESCE(m.lp_fp, c.ctx_oov_fp, g.global_oov_fp) AS fp
  FROM bg b
  LEFT JOIN model m USING (prev, tok)
  LEFT JOIN ctx_fp c USING (prev)
  CROSS JOIN gfp g
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(-CAST(SUM(fp) AS DOUBLE) / 1000000 / COUNT(*), 6)
           AS cross_entropy
FROM scored GROUP BY doc_id
"""


@query("q130_bigram_lm_ce", oracle=_BIGRAM_ORACLE, tags=("curation", "lm"))
def q130_bigram_lm_ce(spark, sf_dir):
    """Per-document cross-entropy under a corpus-trained add-one BIGRAM
    model (order-sensitive, unlike q129's unigram): top-B conditional
    probs + per-context and global backoff floors, all broadcast."""
    from ..operators.lm_score import bigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs, "text", "doc_id", top_b=_LM_TOPB)


# ---------------------------------------------------------------------------
# Mixture / sampling
# ---------------------------------------------------------------------------

_MIXTURE_ORACLE = """
WITH base AS (
  SELECT doc_id, source,
         CAST(n_chars AS BIGINT) AS n_tokens,
         CAST(CASE source WHEN 'src0' THEN 5000
                          WHEN 'src1' THEN 3000
                          WHEN 'src2' THEN 2000 END AS BIGINT)
             AS source_budget
  FROM documents
), ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
             AS sel_rank
  FROM base WHERE source_budget IS NOT NULL
), summed AS (
  SELECT *,
         CAST(SUM(n_tokens) OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
  FROM ranked
)
SELECT doc_id, source, n_tokens, sel_rank, cum_before, source_budget
FROM summed WHERE cum_before < source_budget
"""


@query(
    "q131_mixture_budget_sample",
    oracle=_MIXTURE_ORACLE,
    tags=("curation", "sampling", "mixture"),
)
def q131_mixture_budget_sample(spark, sf_dir):
    """Budgeted data mixing: fill 50/30/20 per-source size budgets out
    of a 10k-char total, selecting documents in deterministic md5 order
    (operators/mixture.budgeted_mixture_sample) -- the last curation
    stage before packing.

    The certified path budgets over the precomputed ``n_chars`` fixture
    column (``size_col``), not the regex tokenizer: rounds 5-7 proved
    the driver's DuckDB build tokenizes some `documents` text
    differently at the `\\s` boundary level, so the cross-engine
    contract is pinned to expressions already driver-green in
    q126/q132 (md5 order, row_number, running sum, CASE budgets over
    n_chars). The tokenizer default keeps its own unit test."""
    from ..operators.mixture import budgeted_mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    return budgeted_mixture_sample(
        docs,
        {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        total_tokens=10_000,
        size_col="n_chars",
    )


_WSAMPLE_ORACLE = """
WITH hexed AS (
  SELECT doc_id, source, n_chars,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS h
  FROM documents
), keyed AS (
  -- 13 hex digits decode exactly in a double (< 2^52)
  SELECT doc_id, source, n_chars,
         ROUND(ln((list_sum(list_transform(range(13),
                    i -> (strpos('0123456789abcdef', substr(h, i + 1, 1)) - 1)
                         * power(16, 12 - i)))
                   / 4503599627370496.0) + 1e-300)
               / CAST(n_chars AS DOUBLE), 9) AS es_key
  FROM hexed
)
SELECT doc_id, source, n_chars, es_key,
       CAST(rk AS BIGINT) AS sample_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY es_key DESC, doc_id) AS rk
  FROM keyed
) t WHERE rk <= 10
"""


@query(
    "q132_weighted_sample_wor",
    oracle=_WSAMPLE_ORACLE,
    tags=("curation", "sampling"),
)
def q132_weighted_sample_wor(spark, sf_dir):
    """Efraimidis-Spirakis A-ES weighted sampling without replacement,
    stratified by source, weight = n_chars: RNG-free hashed uniforms so
    the sample is a pure function of (ids, weights) on any cluster
    (operators/mixture.weighted_sample_without_replacement)."""
    from ..operators.mixture import weighted_sample_without_replacement

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample_without_replacement(
        docs, "n_chars", k=10, stratum_col="source"
    )


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------

_PQ_M = 8
_PQ_CODES = 16
_PQ_DIM = 64

_PQ_ENCODE_ORACLE = f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings
), q AS (
  SELECT vec_id,
         list_transform(
             vd,
             x -> CAST(ROUND(x / sqrt(list_sum(
                      list_transform(vd, y -> y * y))) * 10000000)
                  AS BIGINT)) AS v
  FROM raw
), subs AS (
  SELECT vec_id, s.i AS sub_idx,
         v[(s.i * ({_PQ_DIM} // {_PQ_M}) + 1)
           :((s.i + 1) * ({_PQ_DIM} // {_PQ_M}))] AS vsub
  FROM q CROSS JOIN (SELECT unnest(range({_PQ_M})) AS i) s
), cb AS (
  SELECT sub_idx, vec_id AS code, vsub AS csub FROM subs
  WHERE vec_id < {_PQ_CODES}
), dists AS (
  SELECT s.vec_id, s.sub_idx, c.code,
         list_sum(list_transform(
             list_zip(s.vsub, c.csub),
             p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
  FROM subs s JOIN cb c ON s.sub_idx = c.sub_idx
)
SELECT vec_id, CAST(sub_idx AS INTEGER) AS sub_idx,
       arg_min(code, dist * 256 + code) AS code
FROM dists GROUP BY vec_id, sub_idx
"""


@query(
    "q133_pq_encode",
    oracle=_PQ_ENCODE_ORACLE,
    tags=("similarity", "pq", "quantization"),
)
def q133_pq_encode(spark, sf_dir):
    """PQ encoding: every embedding compressed to 8 one-byte codes
    (nearest codeword per subspace, exact integer L2 + struct argmin,
    operators/similarity.pq_encode). The (id, sub_idx, code) relation
    is what ANN search shuffles at 100 TB, never the vectors."""
    from ..operators.similarity import pq_codebook, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding", _PQ_M, _PQ_CODES, _PQ_DIM)
    return pq_encode(emb, "vec_id", "embedding", cb, _PQ_M, _PQ_DIM)


# ---------------------------------------------------------------------------
# Time-series gap fill
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH obs AS (
  SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders WHERE o_custkey < 40 GROUP BY 1, 2
), bounds AS (
  SELECT k, MIN(d) AS lo, MAX(d) AS hi FROM obs GROUP BY k
), spine AS (
  SELECT k, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                        CAST(hi AS TIMESTAMP),
                                        INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), dense AS (
  SELECT s.k, s.day, o.v, o.v IS NOT NULL AS observed
  FROM spine s LEFT JOIN obs o ON o.k = s.k AND o.d = s.day
)
SELECT k AS o_custkey, day,
       last_value(v IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS o_totalprice,
       observed
FROM dense
"""


@query("q142_gapfill_ffill", oracle=_GAPFILL_ORACLE, tags=("timeseries",))
def q142_gapfill_ffill(spark, sf_dir):
    """Keyed daily densify + forward fill (operators/gapfill): the
    TimescaleDB time_bucket_gapfill shape -- per-key spine explode,
    left join back, one shared (key x day) window partitioning."""
    from ..operators.gapfill import gapfill_daily

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 40
    )
    daily = orders.groupBy(
        "o_custkey", F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("o_totalprice")
    )
    return gapfill_daily(daily, "o_custkey", "day", "o_totalprice", "ffill")


# ---------------------------------------------------------------------------
# PQ ADC search (full oracle: untrained id-sampled codebook is
# deterministic, so the ENTIRE approximate search pipeline -- encode,
# per-query distance table, code-lookup sum, rank -- is reproducible in
# SQL; the Lloyd-trained variant stays invariant-tested in pytest)
# ---------------------------------------------------------------------------

_PQ_ADC_ORACLE = f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings
), q AS (
  SELECT vec_id,
         list_transform(
             vd,
             x -> CAST(ROUND(x / sqrt(list_sum(
                      list_transform(vd, y -> y * y))) * 10000000)
                  AS BIGINT)) AS v
  FROM raw
), subs AS (
  SELECT vec_id, s.i AS sub_idx,
         v[(s.i * ({_PQ_DIM} // {_PQ_M}) + 1)
           :((s.i + 1) * ({_PQ_DIM} // {_PQ_M}))] AS vsub
  FROM q CROSS JOIN (SELECT unnest(range({_PQ_M})) AS i) s
), cb AS (
  SELECT sub_idx, vec_id AS code, vsub AS csub FROM subs
  WHERE vec_id < {_PQ_CODES}
), dists AS (
  SELECT s.vec_id, s.sub_idx, c.code,
         CAST(list_sum(list_transform(
             list_zip(s.vsub, c.csub),
             p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist
  FROM subs s JOIN cb c ON s.sub_idx = c.sub_idx
), codes AS (
  SELECT vec_id, sub_idx, arg_min(code, dist * 256 + code) AS code
  FROM dists GROUP BY vec_id, sub_idx
), dtab AS (
  SELECT vec_id AS query_id, sub_idx, code, dist AS qdist
  FROM dists WHERE vec_id BETWEEN 100 AND 109
), pairs AS (
  SELECT d.query_id, c.vec_id AS neighbor_id,
         CAST(SUM(d.qdist) AS BIGINT) AS adc_dist
  FROM codes c JOIN dtab d
    ON c.sub_idx = d.sub_idx AND c.code = d.code
  WHERE c.vec_id != d.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_dist, rn FROM (
  SELECT query_id, neighbor_id, adc_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, neighbor_id) AS BIGINT)
             AS rn
  FROM pairs) t
WHERE rn <= 3
"""


@query("q134_pq_adc_topk", oracle=_PQ_ADC_ORACLE, tags=("similarity", "pq", "ann"))
def q134_pq_adc_topk(spark, sf_dir):
    """ADC top-k over PQ codes (operators/similarity.pq_topk with the
    deterministic id-sampled codebook): queries keep exact subvectors,
    corpus vectors participate only as byte codes, distance = sum of
    per-subspace table lookups via a (sub_idx, code) equi-join."""
    from ..operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk(
        emb,
        "vec_id",
        "embedding",
        lambda c: c.between(100, 109),
        m=_PQ_M,
        n_codes=_PQ_CODES,
        k=3,
        dim=_PQ_DIM,
        train_iters=0,
    )


# ---------------------------------------------------------------------------
# Incremental (cross-ingest) dedup
# ---------------------------------------------------------------------------

_INCR_SPLIT = 250  # batch 1 = doc_id < _INCR_SPLIT, batch 2 = the rest

_INCR_EXACT_ORACLE = f"""
WITH b1 AS (
  SELECT DISTINCT sha256(text) AS fp FROM documents
  WHERE doc_id < {_INCR_SPLIT}
), b2 AS (
  SELECT doc_id, source, n_chars, sha256(text) AS fp FROM documents
  WHERE doc_id >= {_INCR_SPLIT}
), keep AS (
  SELECT fp, MIN(doc_id) AS keep_id FROM b2 GROUP BY fp
)
SELECT b2.doc_id, b2.source, b2.n_chars
FROM b2 JOIN keep ON b2.fp = keep.fp AND b2.doc_id = keep.keep_id
WHERE b2.fp NOT IN (SELECT fp FROM b1)
"""


@query(
    "q135_incremental_exact_dedup",
    oracle=_INCR_EXACT_ORACLE,
    tags=("dedup", "incremental"),
)
def q135_incremental_exact_dedup(spark, sf_dir):
    """Continuous-ingestion exact dedup (operators/dedup.
    incremental_exact_dedup): batch 2's novel documents after anti-
    joining batch 1's digest table -- the digest state is 32 bytes per
    kept doc, so at 100 TB the anti-join ships digests, never text."""
    from ..operators.dedup import incremental_exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    b1 = docs.filter(F.col("doc_id") < _INCR_SPLIT)
    b2 = docs.filter(F.col("doc_id") >= _INCR_SPLIT)
    _, seen = incremental_exact_dedup(b1, None, "text", "doc_id")
    novel, _ = incremental_exact_dedup(b2, seen, "text", "doc_id")
    return novel.select("doc_id", "source", "n_chars")


_NEARDUP_CORPUS = 100  # corpus = doc_id < 100, new batch = 100..199


def _incr_neardup_oracle() -> str:
    hashes = ",\n         ".join(
        f"MIN(md5('mh{i:02d}|' || shingle)) AS h{i:02d}" for i in range(8)
    )
    bands = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx,"
        f" md5(h{2*b:02d} || '|' || h{2*b+1:02d}) AS band_key FROM sig"
        for b in range(4)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '\s+')) AS tok,
         unnest(generate_series(1, len(string_split_regex(text, '\s+')))) AS i
  FROM documents WHERE doc_id < 200
),
sh0 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
sig AS (
  SELECT doc_id,
         {hashes}
  FROM sh GROUP BY doc_id
),
bands AS (
  {bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.band_idx = b.band_idx
  WHERE a.doc_id >= {_NEARDUP_CORPUS} AND b.doc_id < {_NEARDUP_CORPUS}
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.new_id, c.corpus_id, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.new_id
  JOIN sh b ON b.doc_id = c.corpus_id AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT new_id, corpus_id,
       ROUND(CAST(n_common AS DOUBLE) / (sn.n_sh + sc.n_sh - n_common), 6)
           AS jaccard
FROM inter
JOIN sizes sn ON sn.doc_id = new_id
JOIN sizes sc ON sc.doc_id = corpus_id
WHERE n_common * 2 >= (sn.n_sh + sc.n_sh - n_common)
"""


@query(
    "q136_incremental_neardup",
    oracle=_incr_neardup_oracle(),
    tags=("dedup", "incremental", "lsh"),
)
def q136_incremental_neardup(spark, sf_dir):
    """Asymmetric new-batch x corpus near-dup matches with verified
    exact Jaccard >= 1/2 (operators/dedup.incremental_neardup_filter):
    LSH band keys of the two sides equi-join for candidates (never
    all-pairs), candidates verify against exact shingle overlap -- the
    provenance relation a continuous-ingest curation audit keeps."""
    from ..operators.dedup import incremental_neardup_filter

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < _NEARDUP_CORPUS)
    new = docs.filter(
        (F.col("doc_id") >= _NEARDUP_CORPUS) & (F.col("doc_id") < 200)
    )
    _, matches = incremental_neardup_filter(
        new, corpus, "text", "doc_id", threshold_num=1, threshold_den=2
    )
    return matches


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (full oracle: seeded-md5 bit positions
# are engine-portable, so DuckDB rebuilds the SAME filter from the
# benchmark side and re-probes every corpus shingle)
# ---------------------------------------------------------------------------

_BLOOM_BENCH = 10       # benchmark = doc_id < 10
_BLOOM_K = 7
_BLOOM_BPS = 10         # bits per benchmark shingle

#: md5-hex prefix (15 digits) -> BIGINT, exactly: every 16^k is a power
#: of two, so the per-digit scale factors are exact doubles cast to
#: BIGINT and the integer sum stays < 16^15 < 2^63.
_HEX15 = (
    "CAST(list_sum(list_transform(range(15), "
    "i -> CAST(strpos('0123456789abcdef', substr({h}, i + 1, 1)) - 1 AS BIGINT)"
    " * CAST(power(16, 14 - i) AS BIGINT))) AS BIGINT)"
)


def _bloom_oracle() -> str:
    h = _HEX15.format(h="md5('bf' || k.i || '|' || {v})")
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '\s+')) AS tok,
         unnest(generate_series(1, len(string_split_regex(text, '\s+')))) AS i
  FROM documents
),
sh0 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id < {_BLOOM_BENCH}
),
mb AS (SELECT GREATEST(COUNT(*) * {_BLOOM_BPS}, 64) AS m FROM bench),
bpos AS (
  SELECT DISTINCT {h.format(v="b.shingle")} % mb.m AS p
  FROM bench b CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i) k
  CROSS JOIN mb
),
probes AS (
  SELECT s.doc_id, s.shingle, {h.format(v="s.shingle")} % mb.m AS p
  FROM sh s CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i) k
  CROSS JOIN mb
),
shingle_hits AS (
  SELECT pr.doc_id, pr.shingle,
         CASE WHEN COUNT(bp.p) = {_BLOOM_K} THEN 1 ELSE 0 END AS hit
  FROM probes pr LEFT JOIN bpos bp ON pr.p = bp.p
  GROUP BY 1, 2
)
SELECT doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(hit) AS BIGINT) AS n_hits,
       ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS hit_frac
FROM shingle_hits GROUP BY doc_id
"""


@query(
    "q137_bloom_decontaminate",
    oracle=_bloom_oracle(),
    tags=("curation", "decontamination", "bloom"),
)
def q137_bloom_decontaminate(spark, sf_dir):
    """Benchmark-contamination screen via a Bloom filter of the
    benchmark's shingles (operators/bloom.bloom_contamination_report):
    membership is a pure k-probe expression over each corpus shingle
    (no join), hit_frac is an upper bound on true contamination (the
    filter has no false negatives). The oracle rebuilds the identical
    filter from the same seeded-md5 positions and re-probes."""
    from ..operators.bloom import bloom_contamination_report

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") < _BLOOM_BENCH)
    return bloom_contamination_report(
        docs,
        benchmark,
        bits_per_shingle=_BLOOM_BPS,
        k_hashes=_BLOOM_K,
    )


# ---------------------------------------------------------------------------
# Sketches: Misra-Gries guaranteed heavy hitters, Count-Min estimates
# ---------------------------------------------------------------------------

_HH_K = 29

_HH_ORACLE = rf"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
), t AS (SELECT tok FROM toks WHERE tok != '')
SELECT tok AS value, COUNT(*) AS count_exact
FROM t GROUP BY tok
HAVING COUNT(*) * {_HH_K + 1} > (SELECT COUNT(*) FROM t)
"""


@query(
    "q138_heavy_hitters",
    oracle=_HH_ORACLE,
    tags=("sketch", "heavy_hitters"),
)
def q138_heavy_hitters(spark, sf_dir):
    """Misra-Gries heavy hitters with the textbook guarantee made into
    the checkable output: every token with true frequency > n/(k+1)
    MUST be in the k-entry summary (operators/heavyhitters), so the
    query emits the summary's exact-recounted entries filtered to that
    threshold -- if the sketch ever dropped a guaranteed value, the
    row would be missing and the oracle comparison fails."""
    from ..operators.heavyhitters import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "tok"
        )
    ).filter(F.col("tok") != "")
    hh = heavy_hitters(toks, "tok", k=_HH_K, exact_recount=True)
    tot = toks.agg(F.count(F.lit(1)).alias("_n"))
    return (
        hh.crossJoin(F.broadcast(tot))
        .filter(F.col("count_exact") * (_HH_K + 1) > F.col("_n"))
        .select("value", "count_exact")
    )


_CM_WIDTH = 256
_CM_DEPTH = 4
_CM_TOP = 20


def _cm_oracle() -> str:
    h = _HEX15.format(h="md5('cm' || d.i || '|' || {v})")
    return rf"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
), t AS (SELECT tok FROM toks WHERE tok != ''),
sketch AS (
  SELECT d.i AS d, {h.format(v="tok")} % {_CM_WIDTH} AS b, COUNT(*) AS c
  FROM t CROSS JOIN (SELECT unnest(range({_CM_DEPTH})) AS i) d
  GROUP BY 1, 2
),
top AS (
  SELECT tok, c FROM (
    SELECT tok, COUNT(*) AS c,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
    FROM t GROUP BY tok
  ) WHERE rn <= {_CM_TOP}
),
est AS (
  SELECT tp.tok, tp.c, MIN(sk.c) AS est
  FROM top tp
  CROSS JOIN (SELECT unnest(range({_CM_DEPTH})) AS i) d
  JOIN sketch sk
    ON sk.d = d.i AND sk.b = {h.format(v="tp.tok")} % {_CM_WIDTH}
  GROUP BY 1, 2
)
SELECT tok AS value, c AS count_exact, CAST(est AS BIGINT) AS cm_estimate
FROM est
"""


@query("q139_countmin_estimates", oracle=_cm_oracle(), tags=("sketch", "countmin"))
def q139_countmin_estimates(spark, sf_dir):
    """Count-Min point estimates for the corpus's top tokens: the
    sketch (depth x width integer sums, partitioning-independent,
    operators/heavyhitters.countmin_sketch) rides the plan as literal
    arrays; the estimate is the LEAST of the depth probe buckets.
    Deterministic end to end, so the oracle rebuilds the same sketch
    relationally and must agree exactly -- including the never-
    undercount property (est >= exact by construction)."""
    from ..operators.heavyhitters import countmin_sketch

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "tok"
        )
    ).filter(F.col("tok") != "")
    sketch = countmin_sketch(toks, "tok", width=_CM_WIDTH, depth=_CM_DEPTH)
    probes = [
        F.element_at(
            F.array(*[F.lit(c) for c in sketch[d]]),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"cm{d}|"), F.col("value"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % _CM_WIDTH
            ).cast("int")
            + 1,
        )
        for d in range(_CM_DEPTH)
    ]
    top = (
        toks.groupBy(F.col("tok").alias("value"))
        .agg(F.count(F.lit(1)).alias("count_exact"))
        .withColumn(
            "_rn",
            F.row_number().over(W.orderBy(F.desc("count_exact"), "value")),
        )
        .filter(F.col("_rn") <= _CM_TOP)
        .drop("_rn")
    )
    return top.select(
        "value", "count_exact", F.least(*probes).cast("long").alias("cm_estimate")
    )


# ---------------------------------------------------------------------------
# Distributed PCA (invariant oracle: eigendecomposition itself is not
# SQL-expressible, so the query emits exactly-checkable invariants
# computed DISTRIBUTIVELY -- captured "energy" of the k-dim projection
# vs the total, monotonicity in k, descending eigenvalues -- and the
# oracle pins the constant-true rendering; a violated invariant flips a
# boolean and fails the hash compare)
# ---------------------------------------------------------------------------

_PCA_KS = (4, 8)

_PCA_ORACLE = """
SELECT CAST(k AS BIGINT) AS k,
       CAST(captured_le_total AS BOOLEAN) AS captured_le_total,
       CAST(captured_monotone AS BOOLEAN) AS captured_monotone,
       CAST(var_descending AS BOOLEAN) AS var_descending
FROM (VALUES (4, TRUE, TRUE, TRUE), (8, TRUE, TRUE, TRUE))
     t(k, captured_le_total, captured_monotone, var_descending)
"""


@query("q140_pca_invariants", oracle=_PCA_ORACLE, tags=("similarity", "pca"))
def q140_pca_invariants(spark, sf_dir):
    """PCA over embeddings (operators/pca: integer Gram via one Arrow
    matmul per partition, driver eigh, JVM-side projection), certified
    through its invariants: for k in (4, 8) the projection's captured
    energy sum(|proj|^2) -- computed distributively over the corpus --
    must not exceed the total energy sum(|x|^2), must grow with k, and
    the eigenvalue list must be descending. Booleans are the query
    output, so any violation hash-mismatches the oracle."""
    from ..operators.pca import pca_components, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    sq = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0.0), lambda acc, x: acc + x * x
    )
    total = emb.agg(
        F.sum(sq(F.col("embedding").cast("array<double>"))).alias("tot")
    )
    caps = []
    var_desc_all = True
    for k in _PCA_KS:
        comps, var = pca_components(emb, "embedding", dim=64, k=k)
        var_desc_all = var_desc_all and all(
            a >= b for a, b in zip(var, var[1:])
        )
        cap = (
            pca_project(emb, "embedding", comps)
            .agg(F.sum(sq(F.col("pca"))).alias(f"cap{k}"))
        )
        caps.append(cap)
    joined = caps[0].crossJoin(F.broadcast(caps[1])).crossJoin(
        F.broadcast(total)
    )
    rows = F.array(
        F.struct(
            F.lit(_PCA_KS[0]).cast("long").alias("k"),
            (F.col(f"cap{_PCA_KS[0]}") <= F.col("tot")).alias(
                "captured_le_total"
            ),
            (F.col(f"cap{_PCA_KS[0]}") >= F.lit(0.0)).alias(
                "captured_monotone"
            ),
        ),
        F.struct(
            F.lit(_PCA_KS[1]).cast("long").alias("k"),
            (F.col(f"cap{_PCA_KS[1]}") <= F.col("tot")).alias(
                "captured_le_total"
            ),
            (
                F.col(f"cap{_PCA_KS[1]}") >= F.col(f"cap{_PCA_KS[0]}")
            ).alias("captured_monotone"),
        ),
    )
    return joined.select(F.explode(rows).alias("_r")).select(
        "_r.k",
        "_r.captured_le_total",
        "_r.captured_monotone",
        F.lit(bool(var_desc_all)).alias("var_descending"),
    )


# ---------------------------------------------------------------------------
# PageRank (full oracle: the EXACT integer fixed-point iteration is
# engine-portable, so the oracle unrolls the same 3 iterations as
# chained CTEs -- contribution split by integer div, remainder kept,
# damped rational 85/100 applied with integer div)
# ---------------------------------------------------------------------------

_PR_ITERS = 3
_PR_SCALE = 1_000_000_000
_PR_TELEPORT = (100 - 85) * _PR_SCALE // 100


def _pagerank_oracle() -> str:
    iters = []
    prev = "r0"
    for n in range(1, _PR_ITERS + 1):
        iters.append(f"""
c{n} AS (
  SELECT node, deg, rank_fp,
         CASE WHEN deg > 0 THEN rank_fp // deg ELSE 0 END AS contrib
  FROM {prev}
),
i{n} AS (
  SELECT e.dst AS node, CAST(SUM(c.contrib) AS BIGINT) AS in_fp
  FROM edges e JOIN c{n} c ON c.node = e.src GROUP BY e.dst
),
r{n} AS (
  SELECT c.node, c.deg,
         CAST({_PR_TELEPORT} + (((c.rank_fp - c.deg * c.contrib)
               + COALESCE(i.in_fp, 0)) * 85) // 100 AS BIGINT) AS rank_fp
  FROM c{n} c LEFT JOIN i{n} i ON i.node = c.node
)""")
        prev = f"r{n}"
    head = f"""
WITH edges AS (
  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
                  CAST(s.s_nationkey AS BIGINT) AS dst
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
deg0 AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (
  SELECT n.node, COALESCE(d.deg, 0) AS deg,
         CAST({_PR_SCALE} AS BIGINT) AS rank_fp
  FROM nodes n LEFT JOIN deg0 d ON d.src = n.node
),"""
    tail = f"""
SELECT node, rank_fp,
       CAST(rank_fp AS DOUBLE) / {_PR_SCALE} AS rank
FROM {prev}
"""
    return head + ",".join(iters) + tail


@query("q141_pagerank", oracle=_pagerank_oracle(), tags=("graph", "pagerank"))
def q141_pagerank(spark, sf_dir):
    """PageRank over the customer-nation -> supplier-nation trade
    graph, EXACT integer fixed-point arithmetic (operators/graph.
    pagerank): mass splits by integer div with the remainder kept, so
    the result is bit-identical under any partitioning or engine --
    the oracle replays the same 3 iterations as unrolled SQL."""
    from ..operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    edges = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
    )
    return pagerank(edges, iters=_PR_ITERS)


# ---------------------------------------------------------------------------
# Multiprobe sign-LSH (full oracle: integer plane dots make bucket bits
# AND the |margin| flip ordering engine-portable, so DuckDB replays the
# whole probe-set construction -- the recall knob itself is certified,
# not just a floor)
# ---------------------------------------------------------------------------

_MP_PLANES = 6
_MP_SEED = 42
_MP_DIM = 64
_MP_K = 5


def _multiprobe_oracle() -> str:
    from ..operators.similarity import PLANE_SCALE, seeded_planes

    planes = seeded_planes(_MP_PLANES, _MP_DIM, _MP_SEED)
    plane_lits = [
        "[" + ", ".join(str(int(round(x * PLANE_SCALE))) for x in row) + "]"
        for row in planes
    ]
    dot_selects = "\n  UNION ALL ".join(
        f"SELECT vec_id, {j} AS j,"
        f" CAST(list_sum(list_transform(list_zip(v, {lit}),"
        f" p -> p[1] * p[2])) AS BIGINT) AS d FROM qv"
        for j, lit in enumerate(plane_lits)
    )
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT)) AS v
  FROM embeddings
),
dl AS (
  {dot_selects}
),
buckets AS (
  SELECT vec_id,
         string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, ''
                    ORDER BY j) AS bucket
  FROM dl GROUP BY vec_id
),
flips AS (
  SELECT vec_id, j AS fj FROM (
    SELECT vec_id, j,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ABS(d), j) AS rn
    FROM dl) t
  WHERE rn = 1
),
qprobe AS (
  SELECT b.vec_id AS query_id, b.bucket FROM buckets b
  WHERE b.vec_id < 10
  UNION
  SELECT b.vec_id,
         substr(b.bucket, 1, f.fj)
           || (CASE WHEN substr(b.bucket, f.fj + 1, 1) = '1'
                    THEN '0' ELSE '1' END)
           || substr(b.bucket, f.fj + 2, {_MP_PLANES} - f.fj - 1)
  FROM buckets b JOIN flips f ON f.vec_id = b.vec_id
  WHERE b.vec_id < 10
),
pairs AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM qprobe q JOIN buckets c ON c.bucket = q.bucket
  WHERE c.vec_id != q.query_id
),
pc AS (SELECT p.query_id, p.neighbor_id, unnest(a.v) AS qx, unnest(b.v) AS nx
       FROM pairs p JOIN qv a ON a.vec_id = p.query_id
                    JOIN qv b ON b.vec_id = p.neighbor_id),
pd AS (SELECT query_id, neighbor_id,
              CAST(SUM(qx * nx) AS BIGINT) AS dot,
              CAST(SUM(qx * qx) AS BIGINT) AS qq,
              CAST(SUM(nx * nx) AS BIGINT) AS nn
       FROM pc GROUP BY 1, 2),
psim AS (SELECT query_id, neighbor_id,
                ROUND(CAST(dot AS DOUBLE)
                      / (SQRT(CAST(qq AS DOUBLE)) * SQRT(CAST(nn AS DOUBLE))), 6)
                    AS cos_sim
         FROM pd)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS BIGINT)
             AS rn
  FROM psim) t
WHERE rn <= {_MP_K}
"""


@query(
    "q143_lsh_multiprobe",
    oracle=_multiprobe_oracle(),
    tags=("similarity", "ann", "lsh", "multiprobe"),
)
def q143_lsh_multiprobe(spark, sf_dir):
    """Multiprobe sign-LSH ANN (operators/similarity.
    lsh_multiprobe_topk): each query also probes the bucket reached by
    flipping its lowest-|margin| plane bit -- the recall/cost knob of
    sign-LSH, query-side only (the corpus keeps one bucket per vector
    and never re-shuffles). Seeded Gaussian planes + integer dots make
    the probe set exactly reproducible in the oracle."""
    from ..operators.similarity import lsh_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_multiprobe_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        "vec_id",
        "embedding",
        k=_MP_K,
        n_planes=_MP_PLANES,
        seed=_MP_SEED,
        dim=_MP_DIM,
        n_flip=1,
    )


# ---------------------------------------------------------------------------
# End-to-end curation funnel (composition of five certified stages; no
# single-statement SQL oracle -- the driver records the rows-only check
# and the stage-level operators carry their own full oracles above)
# ---------------------------------------------------------------------------


# Round-6 (late): the funnel gained a FULL oracle -- every stage is
# SQL-expressible from already-proven patterns (the gopher pass with
# q144's parameters, the q129 LM CTE trained on the survivors with
# top_v=1000, COUNT(DISTINCT text) for the sha2-keyed exact dedup --
# same grouping, collision-free assumption shared -- and q90's
# minhash/band/verify/transitive-closure replica run over the
# stage-3 survivors). The registry therefore has ZERO rows-only
# entries: 163/163 oracle-checked.
# Gopher-gate CTE chain (gbase -> gprobe -> gm -> s1), shared verbatim
# with q274's streamed-curation oracle (plans/llm_ops23.py): s1 is the
# gated (doc_id, text) set. Extracted from _FUNNEL_ORACLE without
# changing a byte of the composed SQL (tests/test_oracle_queries.py
# pins q144's value hash either way).
_GATE_CTES = r"""gbase AS (
  SELECT doc_id, text,
         regexp_replace(text, '^\s+|\s+$', '', 'g') AS t,
         string_split_regex(
             regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS words,
         string_split(text, chr(10)) AS lines
  FROM documents
), gprobe AS (
  SELECT *,
         list_transform(words,
             x -> regexp_replace(lower(x),
                  '^[!-/:-@\[-`{-~]+|[!-/:-@\[-`{-~]+$', '', 'g')) AS pwords
  FROM gbase
), gm AS (
  SELECT doc_id, text,
         CASE WHEN t = '' THEN 0 ELSE len(words) END AS n_words,
         length(regexp_replace(t, '\s+', '', 'g')) AS n_word_chars,
         len(list_filter(pwords, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(lines) AS n_lines,
         len(list_filter(lines,
             x -> substr(trim(x), 1, 2) IN ('- ', '* ', '• '))) AS n_bullet,
         len(list_filter(lines, x -> rtrim(x) LIKE '%...')) AS n_ellipsis,
         (length(t) - length(replace(t, '#', '')))
           + (length(t) - length(replace(t, '…', ''))) AS n_symbols,
         (CASE WHEN list_contains(pwords, 'the') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'a') THEN 1 ELSE 0 END)
             AS stop_hits
  FROM gprobe
), s1 AS (
  SELECT doc_id, text FROM gm
  WHERE COALESCE(n_words BETWEEN 10 AND 100000, FALSE)
    AND COALESCE(CASE WHEN n_words > 0 THEN
          ROUND(CAST(n_word_chars AS DOUBLE) / n_words, 6) END
          BETWEEN 3.0 AND 10.0, FALSE)
    AND COALESCE(CASE WHEN n_words > 0 THEN
          ROUND(CAST(n_symbols AS DOUBLE) / n_words, 6) END < 0.1, FALSE)
    AND COALESCE(CASE WHEN n_lines > 0 THEN
          ROUND(CAST(n_bullet AS DOUBLE) / n_lines, 6) END <= 0.9, FALSE)
    AND COALESCE(CASE WHEN n_lines > 0 THEN
          ROUND(CAST(n_ellipsis AS DOUBLE) / n_lines, 6) END <= 0.3, FALSE)
    AND COALESCE(CASE WHEN n_words > 0 THEN
          ROUND(CAST(n_alpha AS DOUBLE) / n_words, 6) END >= 0.8, FALSE)
    AND COALESCE(stop_hits >= 1, FALSE)
)"""

_FUNNEL_ORACLE = "\nWITH RECURSIVE " + _GATE_CTES + r""", ltoks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM s1 WHERE trim(text) != ''
), lvocab AS (
  SELECT tok, COUNT(*) AS c FROM ltoks GROUP BY tok
), ltot AS (
  SELECT SUM(c) AS n, COUNT(*) AS v FROM lvocab
), ltopv AS (
  SELECT tok, c FROM (
    SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rn
    FROM lvocab) WHERE rn <= 1000
), lmodel AS (
  SELECT tok,
         CAST(ROUND(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v + 1 AS DOUBLE))
                    * 1000000) AS BIGINT) AS lp_fp
  FROM ltopv, ltot
), loov AS (
  SELECT CAST(ROUND(ln(1.0 / CAST(n + v + 1 AS DOUBLE)) * 1000000) AS BIGINT)
             AS oov_fp
  FROM ltot
), lscored AS (
  SELECT t.doc_id, COALESCE(m.lp_fp, o.oov_fp) AS fp
  FROM ltoks t LEFT JOIN lmodel m USING (tok) CROSS JOIN loov o
), lagg AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(fp) AS sum_fp FROM lscored
  GROUP BY doc_id
), s2 AS (
  SELECT s1.doc_id, s1.text
  FROM s1 JOIN lagg USING (doc_id)
  WHERE ROUND(-CAST(sum_fp AS DOUBLE) / 1000000 / n_tokens, 6) <= 4.0
), s3 AS (
  SELECT MIN(doc_id) AS doc_id, text FROM s2 GROUP BY text
), ntoks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '\s+')) AS tok,
         unnest(generate_series(1, len(string_split_regex(text, '\s+')))) AS i
  FROM s3
), nsh0 AS (
  SELECT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w
             AS shingle
  FROM ntoks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
), nsh AS (
  SELECT DISTINCT doc_id, shingle FROM nsh0 WHERE shingle IS NOT NULL
), nsig AS (SELECT doc_id, MIN(md5('mh00|' || shingle)) AS h00,
         MIN(md5('mh01|' || shingle)) AS h01,
         MIN(md5('mh02|' || shingle)) AS h02,
         MIN(md5('mh03|' || shingle)) AS h03,
         MIN(md5('mh04|' || shingle)) AS h04,
         MIN(md5('mh05|' || shingle)) AS h05,
         MIN(md5('mh06|' || shingle)) AS h06,
         MIN(md5('mh07|' || shingle)) AS h07 FROM nsh GROUP BY doc_id),
nbands AS (
  SELECT doc_id, 0 AS band_idx, md5(h00 || '|' || h01) AS band_key FROM nsig
  UNION ALL SELECT doc_id, 1 AS band_idx, md5(h02 || '|' || h03) AS band_key FROM nsig
  UNION ALL SELECT doc_id, 2 AS band_idx, md5(h04 || '|' || h05) AS band_key FROM nsig
  UNION ALL SELECT doc_id, 3 AS band_idx, md5(h06 || '|' || h07) AS band_key FROM nsig
), ncand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM nbands a JOIN nbands b
    ON a.band_key = b.band_key AND a.band_idx = b.band_idx
   AND a.doc_id < b.doc_id
), nsizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM nsh GROUP BY doc_id),
ninter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM ncand c
  JOIN nsh a ON a.doc_id = c.id_a
  JOIN nsh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
), nedges AS (
  SELECT i.id_a, i.id_b
  FROM ninter i
  JOIN nsizes sa ON sa.doc_id = i.id_a
  JOIN nsizes sb ON sb.doc_id = i.id_b
  WHERE i.n_common * 2 >= 1 * (sa.n_sh + sb.n_sh - i.n_common)
), ne AS (
  SELECT id_a AS a, id_b AS b FROM nedges
  UNION
  SELECT id_b AS a, id_a AS b FROM nedges
), nnodes AS (SELECT DISTINCT a AS node FROM ne),
nreach AS (
  SELECT node AS a, node AS b FROM nnodes
  UNION
  SELECT r.a, e.b FROM nreach r JOIN ne e ON r.b = e.a
), nlabels AS (SELECT a AS node, MIN(b) AS component FROM nreach GROUP BY a),
s4 AS (
  SELECT s3.doc_id
  FROM s3 LEFT JOIN nlabels l ON l.node = s3.doc_id
  WHERE COALESCE(l.component, s3.doc_id) = s3.doc_id
)
SELECT '00_raw' AS stage, CAST(0 AS BIGINT) AS stage_order,
       CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs
UNION ALL
SELECT '01_gopher', 1, (SELECT COUNT(*) FROM s1)
UNION ALL
SELECT '02_lm', 2, (SELECT COUNT(*) FROM s2)
UNION ALL
SELECT '03_exact_dedup', 3, (SELECT COUNT(*) FROM s3)
UNION ALL
SELECT '04_neardup', 4, (SELECT COUNT(*) FROM s4)
"""


@query(
    "q144_curation_funnel",
    oracle=_FUNNEL_ORACLE,
    tags=("curation", "e2e"),
)
def q144_curation_funnel(spark, sf_dir):
    """The per-stage funnel report of the full curation pipeline
    (pipeline/curation.curate_corpus): raw -> Gopher gate -> unigram-LM
    gate -> exact dedup -> LSH near-dup, [stage, stage_order, n_docs].
    Composition-deterministic; every stage count is verified exactly
    by the composed DuckDB oracle."""
    from ..pipeline.curation import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    _, funnel = curate_corpus(
        docs,
        min_words=10,
        stopwords=("the", "a"),
        min_stopword_hits=1,
        max_cross_entropy=4.0,
        pack_budget=256,
    )
    return funnel


# ---------------------------------------------------------------------------
# Reference date semantics (O18 IST business date / O19 UTC->JST) on a
# PINNED clock: the reference computes both from utcnow
# (/root/reference/main.py:444, email_sender.py:43-45); parameterizing
# the clock with the events timestamps makes them oracle-checkable
# (VERDICT r5 item 5 -- previously shape-only evidence). IST/JST have
# fixed UTC offsets (+5:30 / +9:00, no DST), so the oracle states them
# as interval arithmetic -- exactly the reference's own formula.
# ---------------------------------------------------------------------------

_DATES_ORACLE = """
SELECT event_id,
       CAST(ts + INTERVAL 330 MINUTE AS DATE) AS ist_business_date,
       ts + INTERVAL 9 HOUR AS jst_ts
FROM events WHERE event_id < 1000
"""


@query("q145_ist_jst_dates", oracle=_DATES_ORACLE, tags=("dates", "etl"))
def q145_ist_jst_dates(spark, sf_dir):
    """O18/O19 date logic on pinned timestamps: per event, the IST
    civil date (functions/dates.target_business_date with the clock
    parameterized to ts) and the JST rendering
    (functions/dates.jst_timestamp)."""
    from ..functions.dates import jst_timestamp, target_business_date

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        target_business_date(F.col("ts")).alias("ist_business_date"),
        jst_timestamp("ts").alias("jst_ts"),
    )
