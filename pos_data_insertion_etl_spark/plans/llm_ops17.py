"""Round-8 batch N (q246-q250): lexical-diversity and law-of-language
diagnostics plus agreement/entropy eval -- the corpus-forensics layer
("is this source natural language or generator output") built from
certified primitives.

* q246 -- per-source vocabulary profile (operators/text_mining.
  vocab_stats): TTR + hapax share, LITERAL-space tokens.
* q247 -- Zipf rank-frequency slope (operators/text_mining.
  zipf_points + stats.grouped_ols): log-log OLS in ln fixed point.
* q248 -- Cohen's kappa of the q53 langid vs gold labels
  (operators/scoring.cohens_kappa): chance-corrected agreement in
  exact rational form.
* q249 -- per-image byte-value Shannon entropy through the REAL PNG
  chain (multimodal/binary_ops.image_value_entropy): the q60 pixel
  formula gives a closed-form histogram oracle.
* q250 -- Heaps'-law vocabulary-growth fit (operators/text_mining.
  heaps_growth_points + grouped_ols): beta from bucketed growth.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import STOPWORDS as _STOPWORDS
from .media_ops import IMG_N, _img_pixels
from .registry import query

_ZIPF_GRP = "zipf"
_HEAPS_GRP = "heaps"
_HEAPS_BUCKET = 16
_IMGENT_DOCS = 120

# Shared SQL fragment: literal-space non-empty tokens of lower(text).
_TOK = "list_filter(string_split(lower(text), ' '), x -> x != '')"

# Shared SQL fragment: the grouped_ols derived-stat block over a
# `sums` CTE with columns [grp, n, sx, sy, sxy, sxx, syy] -- identical
# cast-then-multiply IEEE order as operators/stats.grouped_ols.
_OLS_TAIL = """
d AS (
  SELECT grp, n, sx, sy, sxy, sxx, syy,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS fnum,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS fdx,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS fdy
  FROM sums
)
SELECT grp, n, sx, sy, sxy, sxx, syy,
       fnum / NULLIF(fdx, 0.0) AS slope,
       (CAST(sy AS DOUBLE) - (fnum / NULLIF(fdx, 0.0))
          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
       fnum * fnum / NULLIF(fdx * fdy, 0.0) AS r2
FROM d
"""

# ---------------------------------------------------------------------------
# q246: per-source vocabulary profile
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT source AS grp, unnest({_TOK}) AS token FROM documents
), per_token AS (
  SELECT grp, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY grp, token
)
SELECT grp,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(COUNT(*) * 1000000 // SUM(c) AS BIGINT) AS ttr_ppm,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
            // NULLIF(COUNT(*), 0) AS BIGINT) AS hapax_ppm
FROM per_token GROUP BY grp
"""


@query(
    "q246_vocab_stats",
    oracle=_VOCAB_ORACLE,
    tags=("text", "vocabulary", "curation"),
)
def q246_vocab_stats(spark, sf_dir):
    """Per-source vocabulary profile (operators/text_mining.
    vocab_stats): type-token ratio and hapax share in exact fixed
    point -- lexical diversity as a source-quality signal. Tokens are
    LITERAL single-space splits (identical semantics both engines --
    the q131 \\s lesson applied forward)."""
    from ..operators.text_mining import vocab_stats

    docs = load_table(spark, sf_dir, "documents")
    return vocab_stats(docs, "source")


# ---------------------------------------------------------------------------
# q247: Zipf rank-frequency slope
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = f"""
WITH freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest({_TOK}) AS token FROM documents)
  GROUP BY token
), pts AS (
  SELECT CAST(round(ln(CAST(ROW_NUMBER() OVER
                  (ORDER BY freq DESC, token) AS DOUBLE)) * 1000)
              AS BIGINT) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)) * 1000) AS BIGINT) AS y
  FROM freq
), sums AS (
  SELECT '{_ZIPF_GRP}' AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pts
),
{_OLS_TAIL}
"""


@query(
    "q247_zipf_slope",
    oracle=_ZIPF_ORACLE,
    tags=("text", "stats", "curation"),
)
def q247_zipf_slope(spark, sf_dir):
    """Zipf's-law fit: OLS slope of ln(freq) on ln(rank) over the
    corpus vocabulary (operators/text_mining.zipf_points +
    operators/stats.grouped_ols) -- natural language sits near -1;
    generator spam and key-value dumps do not. Each ln is one double
    op on an exact integer, quantized to 1e-3 before the exact-integer
    regression sums."""
    from ..operators.stats import grouped_ols
    from ..operators.text_mining import zipf_points

    docs = load_table(spark, sf_dir, "documents")
    pts = zipf_points(docs).select(
        F.lit(_ZIPF_GRP).alias("g"), "x_fp", "y_fp"
    )
    return grouped_ols(pts, "x_fp", "y_fp", "g")


# ---------------------------------------------------------------------------
# q248: Cohen's kappa, langid vs gold labels
# ---------------------------------------------------------------------------

def _langid_space_oracle() -> str:
    """The q53 stopword-argmax prediction re-tokenized with the
    LITERAL single-space split -- identical semantics on both engines
    (the q131 \\s lesson): the certified q248 path must not ride on
    `string_split_regex(text, '\\s+')`, whose boundary behavior is
    engine-version-sensitive and kept q131 driver-red for three
    rounds. On this corpus (single-space separated) the predictions
    equal q53's.
    """
    from .llm_ops import _langid_case

    hits = ",\n       ".join(
        "CAST(len(list_filter(string_split(text, ' '),"
        f" x -> x IN ({', '.join(repr(w) for w in _STOPWORDS[lang])})))"
        f" AS BIGINT) AS {lang}_hits"
        for lang in _STOPWORDS
    )
    return f"""
SELECT doc_id, lang AS actual_lang,
       {_langid_case('{0}_hits')} AS pred_lang
FROM (
  SELECT doc_id, lang,
       {hits}
  FROM documents
)
"""


def _langid_space_pred(docs):
    """Spark twin of _langid_space_oracle: literal-space tokens into
    the q53 argmax CASE."""
    toks = F.split(F.col("text"), " ")

    def hits(lang: str):
        words = _STOPWORDS[lang]
        return (
            F.size(F.filter(toks, lambda x: x.isin(*words)))
            .cast("long")
            .alias(f"{lang}_hits")
        )

    scored = docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[hits(lang) for lang in _STOPWORDS],
    )
    e, s, d, f_ = (
        F.col(f"{lang}_hits") for lang in ("en", "es", "de", "fr")
    )
    pred = (
        F.when((e >= s) & (e >= d) & (e >= f_) & (e > 0), "en")
        .when((s >= d) & (s >= f_) & (s > 0), "es")
        .when((d >= f_) & (d > 0), "de")
        .when(f_ > 0, "fr")
        .otherwise("und")
    )
    return scored.select("actual_lang", pred.alias("pred_lang"))


_KAPPA_ORACLE = f"""
WITH p AS ({_langid_space_oracle()}),
cells AS (
  SELECT actual_lang AS a, pred_lang AS pr, CAST(COUNT(*) AS BIGINT) AS c
  FROM p GROUP BY 1, 2
),
am AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ca FROM cells GROUP BY a),
pm AS (SELECT pr AS a, CAST(SUM(c) AS BIGINT) AS cp FROM cells GROUP BY pr),
pe AS (
  SELECT CAST(SUM(am.ca * pm.cp) AS BIGINT) AS pe_num
  FROM am JOIN pm USING (a)
),
base AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = pr THEN c ELSE 0 END) AS BIGINT) AS agree
  FROM cells
)
SELECT n, agree, pe_num,
       CAST(CASE WHEN n * n - pe_num >= 1000000
                 THEN (n * agree - pe_num)
                      // NULLIF((n * n - pe_num) // 1000000, 0)
                 ELSE ((n * agree - pe_num) * 1000000)
                      // NULLIF(n * n - pe_num, 0) END AS BIGINT)
         AS kappa_ppm,
       (CAST(n AS DOUBLE) * CAST(agree AS DOUBLE) - CAST(pe_num AS DOUBLE))
         / NULLIF(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(pe_num AS DOUBLE), 0.0) AS kappa
FROM base CROSS JOIN pe
"""


@query(
    "q248_cohens_kappa",
    oracle=_KAPPA_ORACLE,
    tags=("eval", "stats", "langid"),
)
def q248_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between the stopword-argmax language identifier
    and the gold `lang` column (operators/scoring.cohens_kappa):
    chance-corrected agreement in exact rational form -- the
    eval-statistic complement to q155's confusion matrix and q217's
    AUC. The certified prediction re-tokenizes with the LITERAL
    single-space split (_langid_space_pred) so q248 never rides the
    engine-version-sensitive `\\s+` regex that kept q131 driver-red
    (q53's own tokens stay as the library default; on this corpus the
    predictions coincide)."""
    from ..operators.scoring import cohens_kappa

    docs = load_table(spark, sf_dir, "documents")
    pred = _langid_space_pred(docs)
    return cohens_kappa(pred, "actual_lang", "pred_lang")


# ---------------------------------------------------------------------------
# q249: image byte-value entropy (real PNG chain)
# ---------------------------------------------------------------------------

_IMGENT_ORACLE = f"""
WITH h AS (
  SELECT d.doc_id,
         (d.doc_id * 7919 + k) % 256 AS value,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents d CROSS JOIN range(0, {IMG_N}) t(k)
  WHERE d.doc_id < {_IMGENT_DOCS}
  GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bytes,
         CAST(COUNT(*) AS BIGINT) AS n_values
  FROM h GROUP BY doc_id
), terms AS (
  SELECT h.doc_id, p.n_bytes, p.n_values,
         h.cnt * CAST(round(ln(CAST(h.cnt AS DOUBLE)
                               / CAST(p.n_bytes AS DOUBLE))
                            * 1000000000) AS BIGINT) AS t
  FROM h JOIN per_doc p USING (doc_id)
)
SELECT doc_id, n_bytes, n_values,
       CAST(-(SUM(t) // n_bytes) AS BIGINT) AS entropy_nano
FROM terms GROUP BY doc_id, n_bytes, n_values
"""


@query(
    "q249_image_entropy",
    oracle=_IMGENT_ORACLE,
    tags=("multimodal", "image", "quality"),
)
def q249_image_entropy(spark, sf_dir):
    """Per-image Shannon entropy of byte values through the REAL PNG
    encode+decode chain (multimodal/binary_ops.image_value_entropy):
    the q60 pixel formula gives the oracle a closed-form histogram, so
    the hash gate certifies codec + counting + the q129-style
    fixed-point entropy. Python does decode + integer bincount only;
    every ln runs JVM-side."""
    from ..multimodal.binary_ops import image_value_entropy
    from ..multimodal.png_codec import encode_png

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < _IMGENT_DOCS)
    )

    def to_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [
                        encode_png(_img_pixels(int(d)))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    pngs = docs.mapInPandas(to_png, "doc_id long, content binary")
    return image_value_entropy(pngs, "doc_id", "content")


# ---------------------------------------------------------------------------
# q250: Heaps'-law vocabulary-growth fit
# ---------------------------------------------------------------------------

_HEAPS_ORACLE = f"""
WITH tok AS (
  SELECT CAST(doc_id // {_HEAPS_BUCKET} AS BIGINT) AS bucket,
         unnest({_TOK}) AS token
  FROM documents
), per_bucket AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM tok GROUP BY bucket
), first_seen AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types
  FROM (SELECT token, MIN(bucket) AS bucket FROM tok GROUP BY token)
  GROUP BY bucket
), pts AS (
  SELECT CAST(round(ln(CAST(SUM(p.n_tokens) OVER w AS DOUBLE)) * 1000)
              AS BIGINT) AS x,
         CAST(round(ln(CAST(SUM(COALESCE(f.new_types, 0)) OVER w
                            AS DOUBLE)) * 1000) AS BIGINT) AS y
  FROM per_bucket p LEFT JOIN first_seen f USING (bucket)
  WINDOW w AS (ORDER BY p.bucket ROWS UNBOUNDED PRECEDING)
), sums AS (
  SELECT '{_HEAPS_GRP}' AS grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pts
),
{_OLS_TAIL}
"""


@query(
    "q250_heaps_law",
    oracle=_HEAPS_ORACLE,
    tags=("text", "stats", "curation"),
)
def q250_heaps_law(spark, sf_dir):
    """Heaps'-law fit: OLS of ln(cumulative vocabulary) on
    ln(cumulative tokens) over id-bucketed growth points
    (operators/text_mining.heaps_growth_points + grouped_ols) -- the
    slope estimates beta (~0.5 for natural text; near 1 means the
    source keeps minting tokens: ids, hashes, noise). Windows run over
    the bucket table, never the corpus."""
    from ..operators.stats import grouped_ols
    from ..operators.text_mining import heaps_growth_points

    docs = load_table(spark, sf_dir, "documents")
    pts = heaps_growth_points(
        docs, bucket_size=_HEAPS_BUCKET
    ).select(F.lit(_HEAPS_GRP).alias("g"), "x_fp", "y_fp")
    return grouped_ols(pts, "x_fp", "y_fp", "g")
