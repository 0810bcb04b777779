"""Round-8 batch R (q262-q266): PII scrubbing, scorecard feature
screening, dynamics complexity, A/B significance, and unseen-species
vocabulary estimation -- five panels the round-8 window had headroom
for (COVERAGE.md window-capacity note: 45 pending + these 5 = exactly
the 50-slot window).

* q262 -- PII detect/redact audit (operators/pii.pii_scrub_report)
  over a deterministically constructed contact-card fixture: emails /
  dashed phones / IPv4s derived from doc_id with literal-class
  regexes only (never `\\d`/`\\s` -- the q131 lesson). DuckDB's
  regexp_replace needs the explicit 'g' flag to match Spark's
  replace-all semantics.
* q263 -- WOE / information-value screen of document length against
  the English label (operators/scoring.woe_iv_bins): explicit integer
  bin formula, Laplace-smoothed ln in micro fixed point.
* q264 -- Bandt-Pompe permutation entropy (m=3) of the daily revenue
  series (operators/timeseries.permutation_entropy): ordinal-pattern
  histogram, one p*ln(p) IEEE chain per pattern row.
* q265 -- pooled two-proportion z^2 between the user_id-parity arms'
  purchase shares (operators/stats.two_proportion_ztest): one
  conditional aggregation, one closed-form double, boolean verdict
  derived from the already-rounded integer.
* q266 -- bias-corrected Chao1 bigram-vocabulary richness per source
  (operators/text_mining.chao1_richness): literal-space tokens, md5
  digest shuffle, all-integer estimator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# ---------------------------------------------------------------------------
# q262: PII detection + redaction audit
# ---------------------------------------------------------------------------

# Literal-class patterns, shared verbatim with operators/pii.py.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PHONE_RE = "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
_IP_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

# Contact-card fixture: every doc gets one email + one IP; docs with
# doc_id % 5 = 0 get a second email; docs with doc_id % 4 = 0 get no
# phone. Match sites are space-separated and mutually exclusive by
# construction (emails have no dashed digit triples, phones no dots,
# IPs no '@'), so Java regex and RE2 find identical match sets.
_PII_FIXTURE_SQL = (
    "'meet user' || CAST(doc_id AS VARCHAR)"
    " || ' mail user' || CAST(doc_id AS VARCHAR) || '@example'"
    " || CAST(doc_id % 3 AS VARCHAR) || '.com'"
    " || CASE WHEN doc_id % 5 = 0 THEN ' alt user'"
    "         || CAST(doc_id AS VARCHAR) || '@alt.org' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN '' ELSE ' phone '"
    "         || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'"
    "         || CAST((doc_id * 3) % 800 + 200 AS VARCHAR) || '-'"
    "         || CAST((doc_id * 7) % 9000 + 1000 AS VARCHAR) END"
    " || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)"
    " || ' ' || text"
)

_PII_ORACLE = f"""
WITH card AS (
  SELECT doc_id, {_PII_FIXTURE_SQL} AS t FROM documents
), red AS (
  SELECT doc_id, t,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
             '{_PHONE_RE}', '[PHONE]', 'g'),
           '{_IP_RE}', '[IP]', 'g') AS r
  FROM card
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ip,
       CAST(length(t) AS BIGINT) AS orig_len,
       CAST(length(r) AS BIGINT) AS red_len
FROM red
"""


def _pii_fixture(docs):
    d = F.col("doc_id")

    def s(c):
        return c.cast("string")

    return docs.select(
        "doc_id",
        F.concat(
            F.lit("meet user"),
            s(d),
            F.lit(" mail user"),
            s(d),
            F.lit("@example"),
            s(d % 3),
            F.lit(".com"),
            F.when(
                d % 5 == 0,
                F.concat(F.lit(" alt user"), s(d), F.lit("@alt.org")),
            ).otherwise(F.lit("")),
            F.when(d % 4 == 0, F.lit("")).otherwise(
                F.concat(
                    F.lit(" phone "),
                    s(d % 900 + 100),
                    F.lit("-"),
                    s((d * 3) % 800 + 200),
                    F.lit("-"),
                    s((d * 7) % 9000 + 1000),
                )
            ),
            F.lit(" ip 10."),
            s(d % 256),
            F.lit("."),
            s((d * 7) % 256),
            F.lit("."),
            s((d * 13) % 256),
            F.lit(" "),
            F.col("text"),
        ).alias("text"),
    )


@query(
    "q262_pii_scrub",
    oracle=_PII_ORACLE,
    tags=("quality", "pii", "redaction"),
)
def q262_pii_scrub(spark, sf_dir):
    """PII audit over the contact-card fixture
    (operators/pii.pii_scrub_report): per-doc email/phone/IPv4 match
    counts plus exact redaction length. Map-only plan -- zero
    shuffles, literal-class regexes inside whole-stage codegen."""
    from ..operators.pii import pii_scrub_report

    docs = load_table(spark, sf_dir, "documents")
    return pii_scrub_report(_pii_fixture(docs), "doc_id", "text")


# ---------------------------------------------------------------------------
# q263: WOE / IV feature screen, document length vs English label
# ---------------------------------------------------------------------------

_WOE_ORACLE = """
WITH base AS (
  SELECT doc_id, n_chars,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), rn AS (
  SELECT y,
         CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM base
), per AS (
  SELECT (rn - 1) * 5 // n + 1 AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(y) AS BIGINT) AS good_n,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS bad_n
  FROM rn GROUP BY 1
), sm AS (
  SELECT bin, n_rows, good_n, bad_n,
         good_n + 1 AS g1, bad_n + 1 AS b1,
         SUM(good_n) OVER () + 5 AS gt,
         SUM(bad_n) OVER () + 5 AS bt
  FROM per
), sc AS (
  SELECT bin, n_rows, good_n, bad_n,
         CAST(round(ln((CAST(g1 AS DOUBLE) / CAST(gt AS DOUBLE))
                       / (CAST(b1 AS DOUBLE) / CAST(bt AS DOUBLE)))
                    * 1000000.0) AS BIGINT) AS woe_micro,
         CAST(g1 * 1000000 // gt AS BIGINT) AS pg_ppm,
         CAST(b1 * 1000000 // bt AS BIGINT) AS pb_ppm
  FROM sm
), t AS (
  SELECT bin, n_rows, good_n, bad_n, woe_micro, pg_ppm, pb_ppm,
         CAST((pg_ppm - pb_ppm) * woe_micro // 1000000 AS BIGINT)
             AS iv_term_micro
  FROM sc
)
SELECT bin, n_rows, good_n, bad_n, woe_micro, pg_ppm, pb_ppm,
       iv_term_micro,
       CAST(SUM(iv_term_micro) OVER () AS BIGINT) AS iv_micro
FROM t
"""


@query(
    "q263_woe_iv_screen",
    oracle=_WOE_ORACLE,
    tags=("scoring", "feature-screen", "eval"),
)
def q263_woe_iv_screen(spark, sf_dir):
    """Weight-of-evidence / information-value screen of document
    length (n_chars) against the lang='en' label
    (operators/scoring.woe_iv_bins, k=5): explicit equal-depth integer
    bin formula over the (n_chars, doc_id) total order, Laplace-
    smoothed WOE in micro fixed point, all-integer IV terms."""
    from ..operators.scoring import woe_iv_bins

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (F.col("lang") == "en").cast("int").alias("is_en"),
    )
    return woe_iv_bins(docs, "n_chars", "is_en", "doc_id", k=5)


# ---------------------------------------------------------------------------
# q264: permutation entropy of the daily revenue series
# ---------------------------------------------------------------------------

_PERMENT_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS v
  FROM orders GROUP BY 1
), lagged AS (
  SELECT LAG(v, 2) OVER (ORDER BY day) AS x0,
         LAG(v, 1) OVER (ORDER BY day) AS x1,
         v AS x2
  FROM daily
), coded AS (
  SELECT CAST(CASE WHEN x1 >= x0 THEN 4 ELSE 0 END
            + CASE WHEN x2 >= x0 THEN 2 ELSE 0 END
            + CASE WHEN x2 >= x1 THEN 1 ELSE 0 END AS BIGINT) AS pattern
  FROM lagged WHERE x0 IS NOT NULL
), hist AS (
  SELECT pattern, CAST(COUNT(*) AS BIGINT) AS cnt FROM coded GROUP BY 1
), tot AS (
  SELECT pattern, cnt, CAST(SUM(cnt) OVER () AS BIGINT) AS total
  FROM hist
), terms AS (
  SELECT pattern, cnt,
         CAST(cnt * 1000000 // total AS BIGINT) AS p_ppm,
         CAST(round((CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                    * ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                    * -1000000.0) AS BIGINT) AS term_micro
  FROM tot
)
SELECT pattern, cnt, p_ppm, term_micro,
       CAST(SUM(term_micro) OVER () AS BIGINT) AS h_micro
FROM terms
"""


@query(
    "q264_permutation_entropy",
    oracle=_PERMENT_ORACLE,
    tags=("timeseries", "complexity", "monitoring"),
)
def q264_permutation_entropy(spark, sf_dir):
    """Bandt-Pompe permutation entropy (m=3) of daily revenue cents
    (operators/timeseries.permutation_entropy): ordinal patterns from
    two lags over the day-ordered window, <= 6 histogram rows, one
    fixed p*ln(p) IEEE chain per row, exact integer total."""
    from ..operators.timeseries import permutation_entropy

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("v")
    )
    return permutation_entropy(daily, "day", "v")


# ---------------------------------------------------------------------------
# q265: two-proportion z-test, purchase share by user-parity arm
# ---------------------------------------------------------------------------

_ZTEST_ORACLE = """
WITH tr AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS variant,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
  FROM events
), agg AS (
  SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a,
         CAST(SUM(CASE WHEN variant = 0 THEN s ELSE 0 END) AS BIGINT)
             AS x_a,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b,
         CAST(SUM(CASE WHEN variant = 1 THEN s ELSE 0 END) AS BIGINT)
             AS x_b
  FROM tr
), sc AS (
  SELECT n_a, x_a, n_b, x_b,
         CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
         CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
         CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p
  FROM agg
), z AS (
  SELECT n_a, x_a, n_b, x_b,
         CAST(round((pa - pb) * (pa - pb)
              / nullif(p * (1.0 - p)
                       * (1.0 / CAST(n_a AS DOUBLE)
                          + 1.0 / CAST(n_b AS DOUBLE)), 0.0)
              * 1000000.0) AS BIGINT) AS z2_micro
  FROM sc
)
SELECT n_a, x_a, n_b, x_b, z2_micro,
       z2_micro > 3841459 AS significant_95
FROM z
"""


@query(
    "q265_ab_ztest",
    oracle=_ZTEST_ORACLE,
    tags=("stats", "experiment", "eval"),
)
def q265_ab_ztest(spark, sf_dir):
    """Pooled two-proportion z^2 between the user_id-parity arms'
    purchase-event shares (operators/stats.two_proportion_ztest): one
    conditional aggregation over the event stream, one closed-form
    IEEE chain rounded to micro units, significance derived from the
    rounded integer."""
    from ..operators.stats import two_proportion_ztest

    ev = load_table(spark, sf_dir, "events")
    trials = ev.select(
        (F.col("user_id") % 2).cast("long").alias("variant"),
        (F.col("event_type") == "purchase").cast("long").alias("s"),
    )
    return two_proportion_ztest(trials, "variant", "s")


# ---------------------------------------------------------------------------
# q266: Chao1 bigram-vocabulary richness per source
# ---------------------------------------------------------------------------

_CHAO1_ORACLE = """
WITH toks AS (
  SELECT source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
), grams AS (
  SELECT source, md5(g) AS d FROM (
    SELECT source,
           unnest(list_transform(range(1, len(t)),
                  i -> t[i] || ' ' || t[i+1])) AS g
    FROM toks)
), counts AS (
  SELECT source, d, CAST(COUNT(*) AS BIGINT) AS c
  FROM grams GROUP BY 1, 2
), per AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(COUNT(*) AS BIGINT) AS v_distinct,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM counts GROUP BY source
)
SELECT source, n_bigrams, v_distinct, f1, f2,
       CAST(v_distinct * 1000
            + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1)) AS BIGINT)
           AS chao1_milli
FROM per
"""


@query(
    "q266_chao1_richness",
    oracle=_CHAO1_ORACLE,
    tags=("text", "vocabulary", "estimation"),
)
def q266_chao1_richness(spark, sf_dir):
    """Bias-corrected Chao1 unseen-bigram estimate per source
    (operators/text_mining.chao1_richness): literal-space tokens, md5
    digest shuffle (q154 convention), all-integer estimator -- the
    abundance-based companion to q246's observed vocab and q250's
    Heaps extrapolation."""
    from ..operators.text_mining import chao1_richness

    docs = load_table(spark, sf_dir, "documents")
    return chao1_richness(docs, "source", "text")
