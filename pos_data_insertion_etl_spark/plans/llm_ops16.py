"""Round-8 batch M (q240-q245): curation-depth operators -- per-source
distribution normalization and divergence, embedding truncation audit,
compressibility gating, alphabet profiling, and burstiness monitoring.

* q240 -- per-source exact ECDF transform of document length
  (operators/stats.ecdf_percentiles): RANGE-frame tied mass.
* q241 -- per-source KL divergence of the language mix from the
  corpus (operators/stats.categorical_kl): nano fixed-point
  log-ratios, integer weighted sum.
* q242 -- Matryoshka truncation-energy audit
  (operators/projection.matryoshka_truncation_report): exact
  fixed-point squared norms, head vs full.
* q243 -- zlib DEFLATE compressibility gate
  (operators/quality.compression_gate): invariant-form oracle -- the
  q63/q64 pattern; zlib has no SQL replica, so the certified columns
  are exact anchors + theorem-true booleans.
* q244 -- character-class composition profile
  (operators/quality.char_class_profile): explicit ASCII ranges only,
  never \\s/\\w (the q131 lesson).
* q245 -- per-event-type Fano burstiness of daily volumes
  (operators/timeseries.fano_burstiness).
"""

from __future__ import annotations

from ..catalog import load_table
from .registry import query

# ---------------------------------------------------------------------------
# q240: per-source ECDF normalization of n_chars
# ---------------------------------------------------------------------------

_ECDF_ORACLE = """
SELECT doc_id, source,
       CAST(n_chars AS BIGINT) AS value,
       CAST(COUNT(*) OVER (PARTITION BY source ORDER BY n_chars
                           RANGE BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS n_le,
       CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_group,
       CAST(COUNT(*) OVER (PARTITION BY source ORDER BY n_chars
                           RANGE BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) * 1000000
            // COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ecdf_fp
FROM documents
"""


@query(
    "q240_ecdf_normalize",
    oracle=_ECDF_ORACLE,
    tags=("stats", "curation", "normalization"),
)
def q240_ecdf_normalize(spark, sf_dir):
    """Per-source exact ECDF of document length (operators/stats.
    ecdf_percentiles): maps raw n_chars to its within-source quantile
    in 1e-6 fixed point -- the normalization that makes length
    comparable ACROSS sources before mixing. Ties take the full tied
    mass (RANGE frame), the textbook ECDF."""
    from ..operators.stats import ecdf_percentiles

    docs = load_table(spark, sf_dir, "documents")
    return ecdf_percentiles(docs, "n_chars", "source", "doc_id")


# ---------------------------------------------------------------------------
# q241: per-source language-mix KL divergence
# ---------------------------------------------------------------------------

_KL_ORACLE = """
WITH gc AS (
  SELECT source AS grp, lang AS cat, CAST(COUNT(*) AS BIGINT) AS c_gc
  FROM documents GROUP BY 1, 2
), g AS (SELECT grp, CAST(SUM(c_gc) AS BIGINT) AS n_g FROM gc GROUP BY grp),
c AS (SELECT cat, CAST(SUM(c_gc) AS BIGINT) AS c_all FROM gc GROUP BY cat),
n AS (SELECT CAST(SUM(c_gc) AS BIGINT) AS n_all FROM gc),
terms AS (
  SELECT gc.grp, g.n_g,
         gc.c_gc * CAST(round(ln(CAST(gc.c_gc * n.n_all AS DOUBLE)
                                 / CAST(g.n_g * c.c_all AS DOUBLE))
                              * 1000000000) AS BIGINT) AS term
  FROM gc JOIN g USING (grp) JOIN c USING (cat) CROSS JOIN n
)
SELECT grp, n_g AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_cats,
       CAST(SUM(term) // n_g AS BIGINT) AS kl_nano
FROM terms GROUP BY grp, n_g
"""


@query(
    "q241_lang_kl_divergence",
    oracle=_KL_ORACLE,
    tags=("stats", "drift", "curation"),
)
def q241_lang_kl_divergence(spark, sf_dir):
    """KL divergence of each source's language distribution from the
    corpus-wide mix (operators/stats.categorical_kl) -- "how unusual
    is this source": nano fixed-point log-ratios (one double quotient
    of exact integer products each), exact integer weighted sum, one
    truncating div."""
    from ..operators.stats import categorical_kl

    docs = load_table(spark, sf_dir, "documents")
    return categorical_kl(docs, "source", "lang")


# ---------------------------------------------------------------------------
# q242: Matryoshka truncation-energy audit
# ---------------------------------------------------------------------------

_MRL_ORACLE = """
WITH q AS (
  SELECT vec_id,
         CAST(len(embedding) AS BIGINT) AS dim,
         CAST(len(embedding) // 2 AS BIGINT) AS keep_dims,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS r
  FROM embeddings
), sums AS (
  SELECT vec_id, dim, keep_dims,
         CAST(list_sum(list_transform(r, v -> v * v)) AS BIGINT) AS full_fp,
         CAST(list_sum(list_transform(r[1:CAST(keep_dims AS INTEGER)],
                                      v -> v * v)) AS BIGINT) AS head_fp
  FROM q
)
SELECT vec_id, dim, keep_dims, full_fp, head_fp,
       CAST(head_fp * 1000000 // NULLIF(full_fp, 0) AS BIGINT) AS energy_ppm
FROM sums
"""


@query(
    "q242_matryoshka_truncation",
    oracle=_MRL_ORACLE,
    tags=("similarity", "embeddings", "audit"),
)
def q242_matryoshka_truncation(spark, sf_dir):
    """Matryoshka truncation audit over the embeddings table
    (operators/projection.matryoshka_truncation_report): per-vector
    retained squared-norm energy when keeping the first d/2 components
    -- exact 1e-4 fixed-point squared norms via JVM HOF folds, energy
    in ppm. The acceptance gate before serving truncated vectors."""
    from ..operators.projection import matryoshka_truncation_report

    emb = load_table(spark, sf_dir, "embeddings")
    return matryoshka_truncation_report(emb, "vec_id", "embedding")


# ---------------------------------------------------------------------------
# q243: zlib compressibility gate (invariant-form oracle)
# ---------------------------------------------------------------------------

# zlib has no SQL replica: certify exact anchors + theorem-true
# booleans (stored-block framing bounds output <= input + 64;
# compress never returns empty; decompress inverts compress). The
# measured compressed_bytes / ratio_ppm stay library-side.
_ZLIB_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS raw_bytes,
       TRUE AS compressed_nonempty,
       TRUE AS bounded_overhead,
       TRUE AS roundtrip_ok
FROM documents
"""


@query(
    "q243_compression_gate",
    oracle=_ZLIB_ORACLE,
    tags=("curation", "quality", "multimodal"),
)
def q243_compression_gate(spark, sf_dir):
    """DEFLATE-compressibility gate (operators/quality.
    compression_gate): zlib over every document in one Arrow
    mapInPandas pass -- the cheap redundancy detector. Invariant-form
    certification (q63/q64 pattern): exact anchors (doc_id, UTF-8 byte
    length) + three theorem-true booleans; the compressed size itself
    is library output, excluded from the oracle contract."""
    from ..operators.quality import compression_gate

    docs = load_table(spark, sf_dir, "documents")
    return compression_gate(docs).select(
        "doc_id",
        "raw_bytes",
        "compressed_nonempty",
        "bounded_overhead",
        "roundtrip_ok",
    )


# ---------------------------------------------------------------------------
# q244: character-class composition profile
# ---------------------------------------------------------------------------

_CHARCLASS_ORACLE = """
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text)
              - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS n_letters,
         CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digits,
         CAST(length(text)
              - length(regexp_replace(text, ' ', '', 'g'))
              AS BIGINT) AS n_spaces
  FROM documents
)
SELECT doc_id, n_chars, n_letters, n_digits, n_spaces,
       CAST(n_chars - n_letters - n_digits - n_spaces AS BIGINT) AS n_other,
       CAST(n_letters * 1000000 // NULLIF(n_chars, 0) AS BIGINT)
         AS letter_ppm,
       CAST((n_letters + n_digits) * 1000000 // NULLIF(n_chars, 0)
            AS BIGINT) AS alnum_ppm
FROM base
"""


@query(
    "q244_char_class_profile",
    oracle=_CHARCLASS_ORACLE,
    tags=("quality", "text", "curation"),
)
def q244_char_class_profile(spark, sf_dir):
    """Character-class composition per document (operators/quality.
    char_class_profile): exact letter/digit/space/other counts via
    EXPLICIT ASCII ranges and the length-difference idiom -- never
    \\s/\\w shorthand classes (the q131 lesson) -- plus 1e-6
    fixed-point ratios. Pure projection."""
    from ..operators.quality import char_class_profile

    docs = load_table(spark, sf_dir, "documents")
    return char_class_profile(docs)


# ---------------------------------------------------------------------------
# q245: per-event-type Fano burstiness
# ---------------------------------------------------------------------------

_FANO_ORACLE = """
WITH daily AS (
  SELECT event_type AS grp, CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(x) AS BIGINT) AS total,
       CAST(SUM(x) * 1000 // COUNT(*) AS BIGINT) AS mean_milli,
       CAST(CASE WHEN COUNT(*) * SUM(x) >= 1000000
                 THEN (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                      // ((COUNT(*) * SUM(x)) // 1000000)
                 ELSE ((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) * 1000000)
                      // (COUNT(*) * SUM(x)) END AS BIGINT) AS fano_ppm
FROM daily GROUP BY grp
"""


@query(
    "q245_fano_burstiness",
    oracle=_FANO_ORACLE,
    tags=("timeseries", "monitoring", "stats"),
)
def q245_fano_burstiness(spark, sf_dir):
    """Per-event-type Fano factor of daily volumes (operators/
    timeseries.fano_burstiness): variance/mean dispersion in 1e-6
    fixed point, all-integer -- the burstiness complement to q239's
    CUSUM level drift."""
    from ..operators.timeseries import fano_burstiness

    ev = load_table(spark, sf_dir, "events")
    return fano_burstiness(ev, "event_type", "d", ts_col="ts")
