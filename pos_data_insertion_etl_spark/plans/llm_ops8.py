"""Round-6 final registrations (q164-q168): the queue items whose
oracles are exactly SQL-expressible, registered while the driver's
50-entry evidence window still has room (pending 40 -> 45 of 50; the
remaining queue -- tar source, robots evaluation, quantile summaries/
monitor/drift -- is pytest-evidenced and registers in round 7).

Portability rules as everywhere: exact integer counts, fixed-point
rounding, RE2-compatible regexes, identical literal construction in
both engines (plans/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Interpolated trigram LM (operators/lm_score.trigram_lm_scores):
# Jelinek-Mercer blend of add-one trigram/bigram/unigram estimates,
# integer lambdas (5,3,2)/10, per-position fixed point at 1e-9 (libm
# ln is only 1-ulp portable; see the operator docstring).
# ---------------------------------------------------------------------------

TRIGRAM_ORACLE = r"""
WITH base AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS a
  FROM documents
  WHERE trim(text) != ''
    AND len(string_split_regex(lower(trim(text)), '\s+')) >= 3
), tri AS (
  SELECT doc_id, a[t.i] AS p2, a[t.i + 1] AS p1, a[t.i + 2] AS tok
  FROM base, unnest(range(1, len(a) - 1)) AS t(i)
), pairs AS (
  SELECT a[t.i] AS p1, a[t.i + 1] AS tok
  FROM base, unnest(range(1, len(a))) AS t(i)
), toks AS (
  SELECT unnest(a) AS tok FROM base
), uni AS (
  SELECT tok, COUNT(*) AS c1 FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM uni
), uni_top AS (
  SELECT tok, c1 FROM (
    SELECT tok, c1, ROW_NUMBER() OVER (ORDER BY c1 DESC, tok) AS rn FROM uni)
  WHERE rn <= 200
), bi AS (
  SELECT p1, tok, COUNT(*) AS c2 FROM pairs GROUP BY p1, tok
), bctx AS (
  SELECT p1, CAST(SUM(c2) AS BIGINT) AS c2ctx FROM bi GROUP BY p1
), bi_top AS (
  SELECT p1, tok, c2 FROM (
    SELECT p1, tok, c2,
           ROW_NUMBER() OVER (ORDER BY c2 DESC, p1, tok) AS rn FROM bi)
  WHERE rn <= 200
), tcnt AS (
  SELECT p2, p1, tok, COUNT(*) AS c3 FROM tri GROUP BY p2, p1, tok
), tctx AS (
  SELECT p2, p1, CAST(SUM(c3) AS BIGINT) AS c3ctx FROM tcnt GROUP BY p2, p1
), tri_top AS (
  SELECT p2, p1, tok, c3 FROM (
    SELECT p2, p1, tok, c3,
           ROW_NUMBER() OVER (ORDER BY c3 DESC, p2, p1, tok) AS rn FROM tcnt)
  WHERE rn <= 200
), tctx_top AS (
  -- context denominators ship only for head contexts (bounded
  -- broadcast; positions outside fall to the count-0 floor)
  SELECT tc.* FROM tctx tc
  WHERE EXISTS (SELECT 1 FROM tri_top h
                WHERE h.p2 = tc.p2 AND h.p1 = tc.p1)
), bctx_top AS (
  SELECT bc.* FROM bctx bc
  WHERE EXISTS (SELECT 1 FROM bi_top h WHERE h.p1 = bc.p1)
), scored AS (
  SELECT t.doc_id,
         CAST(ROUND(ln(
           (5 * (CAST(COALESCE(tt.c3, 0) + 1 AS DOUBLE)
                 / CAST(COALESCE(tc.c3ctx, 0) + o.v + 1 AS DOUBLE))
            + 3 * (CAST(COALESCE(bt.c2, 0) + 1 AS DOUBLE)
                   / CAST(COALESCE(bc.c2ctx, 0) + o.v + 1 AS DOUBLE))
            + 2 * (CAST(COALESCE(ut.c1, 0) + 1 AS DOUBLE)
                   / CAST(o.n + o.v + 1 AS DOUBLE))) / 10
         ) * 1000000000) AS BIGINT) AS fp
  FROM tri t
  LEFT JOIN tri_top tt ON tt.p2 = t.p2 AND tt.p1 = t.p1 AND tt.tok = t.tok
  LEFT JOIN tctx_top tc ON tc.p2 = t.p2 AND tc.p1 = t.p1
  LEFT JOIN bi_top bt ON bt.p1 = t.p1 AND bt.tok = t.tok
  LEFT JOIN bctx_top bc ON bc.p1 = t.p1
  LEFT JOIN uni_top ut ON ut.tok = t.tok
  CROSS JOIN tot o
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       ROUND(-CAST(SUM(fp) AS DOUBLE) / 1000000000 / COUNT(*), 6)
           AS cross_entropy
FROM scored GROUP BY doc_id
"""


@query("q164_trigram_lm_ce", oracle=TRIGRAM_ORACLE, tags=("curation", "lm"))
def q164_trigram_lm_ce(spark, sf_dir):
    """Jelinek-Mercer interpolated trigram cross-entropy per document:
    three capped broadcast head tables, map-side scoring joins, exact
    integer counts throughout."""
    from ..operators.lm_score import trigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    return trigram_lm_scores(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# URL canonicalization (operators/quality.normalize_url): the corpus
# has no URL column, so each document gets a deterministic messy URL
# (mixed-case host, default port, tracking params, unsorted query,
# fragment) that both engines construct and normalize identically.
# ---------------------------------------------------------------------------

_URL_ORACLE = r"""
WITH raw AS (
  SELECT doc_id,
         'HTTPS://Crawl-' || source || '.Example.COM:443/docs/'
         || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b='
         || CAST(doc_id % 7 AS VARCHAR) || '&a='
         || CAST(doc_id % 3 AS VARCHAR) || '&fbclid=x#frag' AS url
  FROM documents
), parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url,
             '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) AS head0,
         substr(url, length(regexp_extract(url,
             '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) + 1) AS rest0
  FROM raw
), cleaned AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(head0,
             '^(https://[^/?#]*):443$', '\1'),
             '^(http://[^/?#]*):80$', '\1') AS head,
         regexp_replace(rest0, '#.*$', '', 'g') AS rest
  FROM parts
), pq AS (
  SELECT doc_id, head,
         -- empty path canonicalizes to the explicit root '/' before
         -- the trailing-slash rule (operators/quality.normalize_url)
         regexp_replace(
             CASE WHEN regexp_extract(rest, '^([^?]*)', 1) = ''
                  THEN '/'
                  ELSE regexp_extract(rest, '^([^?]*)', 1) END,
             '(.)/$', '\1') AS path,
         array_to_string(list_sort(list_filter(
             string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
             p -> p != ''
                  AND NOT regexp_matches(p,
                          '^(utm_[^=]*|fbclid|gclid)(=|$)'))), '&') AS q
  FROM cleaned
)
SELECT doc_id,
       head || path || CASE WHEN q != '' THEN '?' || q ELSE '' END
           AS canonical_url
FROM pq
"""


@query(
    "q165_url_normalize",
    oracle=_URL_ORACLE,
    tags=("curation", "url"),
)
def q165_url_normalize(spark, sf_dir):
    """Canonical URL keys: both engines decorate each document with the
    same messy URL and must normalize it to the same canonical form --
    host lowercasing, default-port strip, fragment drop, tracking-param
    removal, sorted query."""
    from ..operators.quality import normalize_url

    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://Crawl-"),
        F.col("source"),
        F.lit(".Example.COM:443/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("/?utm_source=feed&b="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&a="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("&fbclid=x#frag"),
    )
    return docs.select(
        "doc_id", normalize_url(url).alias("canonical_url")
    )


# ---------------------------------------------------------------------------
# HTML page metadata (operators/quality.html_page_metadata) over the
# q150-style deterministic page, with robots/canonical tags derived
# from the row so noindex varies across documents.
# ---------------------------------------------------------------------------

_META_ORACLE = r"""
WITH page AS (
  SELECT doc_id,
         '<html><head><title> ' || source || ' page '
         || CAST(doc_id AS VARCHAR) || ' </title>'
         || '<meta name="robots" content="'
         || CASE WHEN doc_id % 5 = 0 THEN 'NOINDEX, nofollow'
                 ELSE 'index, follow' END || '">'
         || '<link rel="canonical" href="https://example.com/'
         || CAST(doc_id AS VARCHAR) || '">'
         || '</head><body><p>' || text || '</p></body></html>' AS html
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(
           regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1),
           '\s+', ' ', 'g'), '^\s+|\s+$', '', 'g') AS title,
       lower(regexp_extract(html,
           '(?is)<meta[^>]*name\s*=\s*["'']robots["''][^>]*content\s*=\s*["'']([^"'']*)["'']',
           1)) AS meta_robots,
       regexp_extract(html,
           '(?is)<link[^>]*rel\s*=\s*["'']canonical["''][^>]*href\s*=\s*["'']([^"'']*)["'']',
           1) AS canonical_url,
       contains(lower(regexp_extract(html,
           '(?is)<meta[^>]*name\s*=\s*["'']robots["''][^>]*content\s*=\s*["'']([^"'']*)["'']',
           1)), 'noindex') AS noindex
FROM page
"""


@query(
    "q166_page_metadata",
    oracle=_META_ORACLE,
    tags=("curation", "html"),
)
def q166_page_metadata(spark, sf_dir):
    """Crawl-control metadata extraction: title, meta robots,
    canonical link, and the noindex verdict from a deterministic page
    per document (noindex on every fifth page)."""
    from ..operators.quality import html_page_metadata

    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><head><title> "),
        F.col("source"),
        F.lit(" page "),
        F.col("doc_id").cast("string"),
        F.lit(' </title><meta name="robots" content="'),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("NOINDEX, nofollow")
        ).otherwise(F.lit("index, follow")),
        F.lit('"><link rel="canonical" href="https://example.com/'),
        F.col("doc_id").cast("string"),
        F.lit('"></head><body><p>'),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    meta = html_page_metadata(page)
    return docs.select(
        "doc_id",
        meta["title"].alias("title"),
        meta["meta_robots"].alias("meta_robots"),
        meta["canonical_url"].alias("canonical_url"),
        meta["noindex"].alias("noindex"),
    )


# ---------------------------------------------------------------------------
# One-scan table profile (operators/quality.profile_table) over the
# documents table: exact per-column facts.
# ---------------------------------------------------------------------------


def _profile_oracle() -> str:
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    parts = []
    for c in cols:
        parts.append(f"""
SELECT '{c}' AS column,
       CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_rows,
       CAST((SELECT SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
             FROM documents) AS BIGINT) AS n_nulls,
       CAST((SELECT COUNT(DISTINCT {c}) FROM documents) AS BIGINT)
           AS n_distinct,
       (SELECT CAST(MIN({c}) AS VARCHAR) FROM documents) AS min_value,
       (SELECT CAST(MAX({c}) AS VARCHAR) FROM documents) AS max_value,
       t.top_value, t.top_share
FROM (
  SELECT CAST({c} AS VARCHAR) AS top_value,
         ROUND(CAST(COUNT(*) AS DOUBLE)
               / (SELECT COUNT(*) FROM documents), 6) AS top_share
  FROM documents WHERE {c} IS NOT NULL
  GROUP BY 1 ORDER BY COUNT(*) DESC, 1 LIMIT 1) t""")
    return "\nUNION ALL\n".join(parts)


@query(
    "q167_table_profile",
    oracle=_profile_oracle(),
    tags=("quality", "profiling"),
)
def q167_table_profile(spark, sf_dir):
    """Rule-free one-scan column profile of the documents table:
    row/null/distinct counts, native-typed min/max as strings, top
    value + share per column."""
    from ..operators.quality import profile_table

    docs = load_table(spark, sf_dir, "documents")
    return profile_table(docs)


# ---------------------------------------------------------------------------
# Exact categorical drift (operators/quantiles.categorical_drift):
# documents vs documents-without-French -- per-language share deltas
# and the total-variation distance.
# ---------------------------------------------------------------------------

_CATDRIFT_ORACLE = r"""
WITH old_c AS (
  SELECT lang AS category, COUNT(*) AS n_old FROM documents GROUP BY lang
), new_c AS (
  SELECT lang AS category, COUNT(*) AS n_new FROM documents
  WHERE lang != 'fr' GROUP BY lang
), tot AS (
  SELECT (SELECT SUM(n_old) FROM old_c) AS t_old,
         (SELECT SUM(n_new) FROM new_c) AS t_new
), j AS (
  SELECT COALESCE(o.category, n.category) AS category,
         CAST(COALESCE(o.n_old, 0) AS BIGINT) AS n_old,
         CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new
  FROM old_c o FULL OUTER JOIN new_c n ON n.category = o.category
), s AS (
  SELECT category, n_old, n_new,
         ROUND(CAST(n_old AS DOUBLE) / t_old, 6) AS share_old,
         ROUND(CAST(n_new AS DOUBLE) / t_new, 6) AS share_new,
         ROUND(CAST(n_new AS DOUBLE) / t_new
               - CAST(n_old AS DOUBLE) / t_old, 6) AS share_delta,
         CAST(n_new AS DOUBLE) / t_new
             - CAST(n_old AS DOUBLE) / t_old AS raw_delta
  FROM j, tot
)
SELECT category, n_old, n_new, share_old, share_new, share_delta,
       ROUND((SELECT SUM(ABS(raw_delta)) FROM s) / 2, 6) AS tv_distance,
       CAST(ROW_NUMBER() OVER (ORDER BY n_old + n_new DESC, category)
            AS BIGINT) AS rank
FROM s
"""


@query(
    "q168_categorical_drift",
    oracle=_CATDRIFT_ORACLE,
    tags=("quality", "drift"),
)
def q168_categorical_drift(spark, sf_dir):
    """Exact language-mix drift when French is dropped: per-category
    shares/deltas plus the total-variation distance on every row."""
    from ..operators.quantiles import categorical_drift

    docs = load_table(spark, sf_dir, "documents")
    return categorical_drift(
        docs, docs.filter(F.col("lang") != "fr"), "lang"
    )
