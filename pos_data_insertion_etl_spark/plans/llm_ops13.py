"""Round-7 batch J (q218-q226): the round-8 queue registered with full
oracles. These names sort AFTER q217, so they join the pending set
BEHIND the 50 names already filling the round-7 certification window
-- they ride on local-oracle + pytest evidence this round and auto-
lead the driver window next round (the rotation puts never-green names
first).

* q218 -- KMV distinct-count monitor replay (operators/sketches +
  streaming kmv_monitor_*): per-batch k-minimum-value summaries over
  the order-key stream, one batch replayed; the merged sketch is a
  pure function of the distinct set, so DuckDB recomputes the EXACT
  summary and estimate from raw data (full oracle, not bound
  booleans).
* q219 -- golden-record entity resolution (operators/fuzzy.
  golden_records): q210's sorted-neighborhood pairs -> recursive-CTE
  connected components -> min-id survivorship, singletons preserved.
* q220 -- min-K% prob membership scores (operators/lm_score.
  min_k_prob_scores): q129's fixed-point unigram model, per-doc
  ceil-cut of the least-probable tokens.
* q221 -- classifier calibration + ECE (operators/scoring.
  calibration_bins) of the q200 logistic probability against the
  is-English label; fixed-width bins, exact integer ECE.
* q222 -- Kneser-Ney bigram cross-entropy (operators/lm_score.
  kneser_ney_bigram_scores): rational discount 3/4 makes each
  probability ONE exact integer fraction; single IEEE division + ln.
* q223 -- IPF raking (operators/mixture.ipf_raking): language x source
  cell weights fitted to two target marginals, exact fixed-point
  iterations unrolled in the oracle.
* q224 -- code-switch detection (operators/quality.
  code_switch_report): windowed q53 stopword-argmax langid, majority
  share + mixed-language flag, all JVM HOFs.
* q225 -- KMV set-overlap (operators/sketches.kmv_intersect_estimate)
  of AM vs PM active users, sketch-only (raw sets untouched).
* q226 -- dictionary-encoding advisor (operators/sketches.
  encoding_advisor): per-column distinct ratios from one stacked KMV
  scan over lineitem.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_KMV_K = 256
_KMV_GROUP_K = 128
_MINK_TOPV = 20
_MINK_PCT = 20
_KN_SENTINEL = None  # (kept for symmetry; KN has no tuning constants)
_CS_WINDOW = 10
_IPF_ITERS = 2
_ADV_COLS = ("l_returnflag", "l_suppkey", "l_orderkey")

#: md5-hex prefix (13 digits = 52 bits) -> BIGINT, exactly (the
#: bloom-oracle digit expansion, shortened to the KMV hash width).
_HEX13 = (
    "CAST(list_sum(list_transform(range(13), "
    "i -> CAST(strpos('0123456789abcdef', substr({h}, i + 1, 1)) - 1 AS BIGINT)"
    " * CAST(power(16, 12 - i) AS BIGINT))) AS BIGINT)"
)

_KMV_SPACE = 1 << 52


# ---------------------------------------------------------------------------
# q218: KMV distinct-count monitor replay
# ---------------------------------------------------------------------------


def _kmv_replay_oracle() -> str:
    h = _HEX13.format(h="md5(CAST(l_orderkey AS VARCHAR))")
    return f"""
WITH hv AS (
  SELECT DISTINCT {h} AS hv FROM lineitem
),
cut AS (
  SELECT hv FROM (
    SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM hv
  ) WHERE rn <= {_KMV_K}
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(MAX(hv) AS BIGINT) AS kth_hv
  FROM cut
)
SELECT n_kept, kth_hv,
       CAST(CASE WHEN n_kept < {_KMV_K} THEN n_kept
                 ELSE (CAST({_KMV_K - 1} AS BIGINT) * {_KMV_SPACE})
                      // kth_hv END AS BIGINT) AS distinct_est
FROM agg
"""


@query(
    "q218_kmv_distinct_replay",
    oracle=_kmv_replay_oracle(),
    tags=("streaming", "sketch", "distinct", "monitor"),
)
def q218_kmv_distinct_replay(spark, sf_dir):
    """The KMV monitor's batch analog (q211 pattern, FULL oracle):
    order-key strings split into three micro-batches persist per-batch
    k-minimum-value summaries (batch 1 replayed -- union-take-k
    absorbs it exactly), the store merges at load, and because the
    merged sketch is a pure function of the distinct value set DuckDB
    recomputes the IDENTICAL k-smallest hashes and estimate from raw
    rows -- the whole persist/merge/estimate path hash-certifies."""
    from ..plans.llm_ops9 import _monitor_dir
    from ..streaming.jobs import kmv_monitor_batch, load_kmv_distinct
    import shutil

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("v"),
        (F.col("l_linenumber") % 3).alias("b"),
    )
    store = _monitor_dir(sf_dir, "kmv")
    shutil.rmtree(store, ignore_errors=True)  # fresh state per run
    for bid in (0, 1, 1, 2):  # batch 1 replayed
        kmv_monitor_batch(
            li.filter(F.col("b") == bid).select("v"),
            bid,
            store,
            "v",
            k=_KMV_K,
        )
    return load_kmv_distinct(spark, store, k=_KMV_K)


# ---------------------------------------------------------------------------
# q219: golden-record entity resolution
# ---------------------------------------------------------------------------

_GR_PAIRS = """
SELECT a.id AS id_a, b.id AS id_b
FROM ranked a
JOIN ranked b ON b.rk > a.rk AND b.rk <= a.rk + 4
WHERE levenshtein(a.name, b.name) <= 2
"""

_GR_ORACLE = f"""
WITH RECURSIVE ranked AS (
  SELECT p_partkey AS id, p_name AS name,
         ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rk
  FROM part
),
e AS (
  SELECT id_a AS a, id_b AS b FROM ({_GR_PAIRS}) p
  UNION
  SELECT id_b AS a, id_a AS b FROM ({_GR_PAIRS}) p
),
gnodes AS (SELECT DISTINCT a AS node FROM e),
reach AS (
  SELECT node AS a, node AS b FROM gnodes
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
),
comp AS (
  SELECT a AS node, CAST(MIN(b) AS BIGINT) AS component
  FROM reach GROUP BY a
),
labeled AS (
  SELECT p.p_partkey AS id, p.p_name AS name,
         CAST(COALESCE(c.component, p.p_partkey) AS BIGINT) AS entity_id
  FROM part p LEFT JOIN comp c ON c.node = p.p_partkey
),
sizes AS (
  SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS entity_size,
         MIN(id) AS canon
  FROM labeled GROUP BY entity_id
)
SELECT l.id, l.name, l.entity_id,
       l.id = s.canon AS is_canonical, s.entity_size
FROM labeled l JOIN sizes s ON s.entity_id = l.entity_id
"""


@query(
    "q219_golden_records",
    oracle=_GR_ORACLE,
    tags=("fuzzy", "record_linkage", "entity_resolution"),
)
def q219_golden_records(spark, sf_dir):
    """End-to-end entity resolution over part names (operators/fuzzy.
    golden_records): q210's sorted-neighborhood candidate pairs ->
    connected-component entities (recursive-CTE closure in the
    oracle) -> deterministic min-id golden record; singletons keep
    their own entity."""
    from ..operators.fuzzy import golden_records

    part = load_table(spark, sf_dir, "part")
    return golden_records(part, "p_partkey", "p_name", window=4, max_dist=2)


# ---------------------------------------------------------------------------
# q220: min-K% prob membership scores
# ---------------------------------------------------------------------------

_MINK_ORACLE = f"""
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
  ) WHERE rn <= {_MINK_TOPV}
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
  SELECT t.doc_id, t.tok, COALESCE(m.lp_fp, o.oov_fp) AS fp
  FROM toks t LEFT JOIN model m USING (tok) CROSS JOIN oov o
), ranked AS (
  SELECT doc_id, fp,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY fp, tok) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_tokens
  FROM scored
), kept AS (
  SELECT doc_id, fp, n_tokens,
         (n_tokens * {_MINK_PCT} + 99) // 100 AS m
  FROM ranked WHERE rn <= (n_tokens * {_MINK_PCT} + 99) // 100
)
SELECT doc_id, CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MAX(m) AS BIGINT) AS m_tokens,
       CAST(SUM(fp) // MAX(m) AS BIGINT) AS mink_mean_fp
FROM kept GROUP BY doc_id
"""


@query(
    "q220_min_k_prob",
    oracle=_MINK_ORACLE,
    tags=("curation", "lm", "contamination"),
)
def q220_min_k_prob(spark, sf_dir):
    """Min-K% prob membership/contamination scores (operators/
    lm_score.min_k_prob_scores): mean fixed-point log-prob of each
    document's 20% least-probable tokens under the q129 unigram
    model -- ties share one fp value so any tie-break cut sums
    identically, making the result partitioning-invariant and
    oracle-replayable."""
    from ..operators.lm_score import min_k_prob_scores

    docs = load_table(spark, sf_dir, "documents")
    return min_k_prob_scores(
        docs, "text", "doc_id", top_v=_MINK_TOPV, k_pct=_MINK_PCT
    )


# ---------------------------------------------------------------------------
# q221: calibration bins + ECE of the quality classifier
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    from .llm_ops11 import _q200_oracle

    return f"""
WITH q AS (
{_q200_oracle()}
),
joined AS (
  SELECT LEAST(q.p_fp * 10 // 1000000, 9) AS bin,
         q.p_fp AS p,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM q JOIN documents d ON d.doc_id = q.doc_id
),
per_bin AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(p) AS BIGINT) AS psum
  FROM joined GROUP BY bin
),
enriched AS (
  SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
         CAST(psum // n AS BIGINT) AS conf_fp,
         CAST((n_pos * 1000000) // n AS BIGINT) AS obs_fp,
         CAST(ABS(psum // n - (n_pos * 1000000) // n) AS BIGINT) AS gap_fp
  FROM per_bin
),
tot AS (
  SELECT SUM(n) AS nt, SUM(gap_fp * n) AS gsum FROM enriched
)
SELECT bin, n, n_pos, conf_fp, obs_fp, gap_fp,
       CAST(gsum // nt AS BIGINT) AS ece_fp
FROM enriched, tot
"""


@query(
    "q221_calibration_ece",
    oracle=_calibration_oracle(),
    tags=("scoring", "evaluation", "calibration"),
)
def q221_calibration_ece(spark, sf_dir):
    """Reliability diagram + expected calibration error of the q200
    logistic probability against the is-English label (operators/
    scoring.calibration_bins): fixed-width bins (no global sort),
    exact integer observed/confidence/gap columns, 1-row-broadcast
    ECE -- the companion audit that decides whether the classifier's
    probabilities can gate a corpus."""
    from ..operators.scoring import calibration_bins
    from .llm_ops11 import q200_quality_logistic

    docs = load_table(spark, sf_dir, "documents")
    scored = q200_quality_logistic(spark, sf_dir).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("_y")),
        "doc_id",
    )
    return calibration_bins(scored, "p_fp", "_y", n_bins=10)


# ---------------------------------------------------------------------------
# q222: Kneser-Ney bigram cross-entropy
# ---------------------------------------------------------------------------

_KN_ORACLE = """
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
  SELECT prev, SUM(c) AS c_u, COUNT(*) AS n1u FROM counts GROUP BY prev
), cont AS (
  SELECT tok, COUNT(*) AS n1w FROM counts GROUP BY tok
), types AS (
  SELECT COUNT(*) + 1 AS t1 FROM counts
), scored AS (
  SELECT b.doc_id,
         CAST(ROUND(ln(
           (CAST(GREATEST(4 * c.c - 3, 0) AS DOUBLE) * CAST(t.t1 AS DOUBLE)
            + 3.0 * CAST(x.n1u AS DOUBLE) * CAST(w.n1w AS DOUBLE))
           / (4.0 * CAST(x.c_u AS DOUBLE) * CAST(t.t1 AS DOUBLE))
         ) * 1000000000) AS BIGINT) AS fp
  FROM bg b
  JOIN counts c ON c.prev = b.prev AND c.tok = b.tok
  JOIN ctx x ON x.prev = b.prev
  JOIN cont w ON w.tok = b.tok
  CROSS JOIN types t
), agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(fp) AS sum_fp
  FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST((-sum_fp) // (1000 * n_bigrams) AS BIGINT) AS ce_micro
FROM agg
"""


@query(
    "q222_kneser_ney_ce",
    oracle=_KN_ORACLE,
    tags=("curation", "lm", "kneser_ney"),
)
def q222_kneser_ney_ce(spark, sf_dir):
    """Per-document cross-entropy under the interpolated KNESER-NEY
    bigram model (operators/lm_score.kneser_ney_bigram_scores): the
    rational discount 3/4 collapses each probability to one exact
    integer fraction evaluated in a single fixed-order IEEE division
    -- the oracle replays the identical expression tree."""
    from ..operators.lm_score import kneser_ney_bigram_scores

    docs = load_table(spark, sf_dir, "documents")
    return kneser_ney_bigram_scores(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# q223: IPF raking of the language x source mix
# ---------------------------------------------------------------------------

#: fixed target marginals (documents: 5 langs x 20 sources; totals
#: equal on both axes so the fit can converge).
_IPF_ROW_TGT = (("en", 150), ("de", 87), ("es", 88), ("fr", 87), ("zh", 88))
_IPF_COL_TGT = tuple((f"src{i}", 25) for i in range(20))


def _ipf_oracle() -> str:
    rt = ", ".join(f"('{r}', {t})" for r, t in _IPF_ROW_TGT)
    ct = ", ".join(f"('{c}', {t})" for c, t in _IPF_COL_TGT)
    prev = "w0"
    steps = []
    n = 0
    for _ in range(_IPF_ITERS):
        for axis, tcte in (("row", "rt"), ("col", "ct")):
            n += 1
            steps.append(f"""
s{n} AS (
  SELECT {axis}, SUM((w_fp * n) // 1000000) AS cur
  FROM {prev} GROUP BY {axis}
),
w{n} AS (
  SELECT w.row, w.col, w.n,
         CAST((w.w_fp * ((t.tgt * 1000000) // s.cur)) // 1000000
              AS BIGINT) AS w_fp
  FROM {prev} w
  JOIN s{n} s ON s.{axis} = w.{axis}
  JOIN {tcte} t ON t.{axis} = w.{axis}
)""")
            prev = f"w{n}"
    return f"""
WITH cells AS (
  SELECT lang AS row, source AS col, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
rt(row, tgt) AS (VALUES {rt}),
ct(col, tgt) AS (VALUES {ct}),
w0 AS (
  SELECT row, col, n, CAST(1000000 AS BIGINT) AS w_fp FROM cells
),{",".join(steps)}
SELECT row, col, n, w_fp FROM {prev}
"""


@query(
    "q223_ipf_raking",
    oracle=_ipf_oracle(),
    tags=("curation", "mixture", "raking"),
)
def q223_ipf_raking(spark, sf_dir):
    """IPF raking of the language x source document mix toward two
    target marginals at once (operators/mixture.ipf_raking): exact
    1e-6 fixed-point scaling factors, truncating integer division,
    per-iteration lineage cuts -- the oracle unrolls every
    half-iteration as a CTE pair (the q141/q182 convention)."""
    from ..operators.mixture import ipf_raking

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy(
        F.col("lang").alias("row"), F.col("source").alias("col")
    ).agg(F.count(F.lit(1)).alias("n"))
    rt = docs.sparkSession.createDataFrame(
        list(_IPF_ROW_TGT), "row string, tgt long"
    )
    ct = docs.sparkSession.createDataFrame(
        list(_IPF_COL_TGT), "col string, tgt long"
    )
    return ipf_raking(cells, "row", "col", rt, ct, iters=_IPF_ITERS)


# ---------------------------------------------------------------------------
# q224: code-switch / language-consistency screen
# ---------------------------------------------------------------------------


def _code_switch_oracle() -> str:
    from ..functions.text import STOPWORDS

    hits = {
        lang: (
            "len(list_filter(w, x -> x IN ("
            + ", ".join(repr(s) for s in STOPWORDS[lang])
            + ")))"
        )
        for lang in STOPWORDS
    }
    e, s, d, f_ = (hits[lang] for lang in ("en", "es", "de", "fr"))
    label = f"""CASE
  WHEN {e} >= {s} AND {e} >= {d} AND {e} >= {f_} AND {e} > 0 THEN 'en'
  WHEN {s} >= {d} AND {s} >= {f_} AND {s} > 0 THEN 'es'
  WHEN {d} >= {f_} AND {d} > 0 THEN 'de'
  WHEN {f_} > 0 THEN 'fr'
  ELSE 'und' END"""
    wlen = _CS_WINDOW
    return f"""
WITH arrs AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     x -> x != '') AS t
  FROM documents
),
nz AS (SELECT id, t FROM arrs WHERE len(t) > 0),
wins AS (
  SELECT id,
         unnest(list_transform(range((len(t) + {wlen - 1}) // {wlen}),
                i -> t[i * {wlen} + 1 : (i + 1) * {wlen}])) AS w
  FROM nz
),
labeled AS (SELECT id, {label} AS lang FROM wins),
per_lang AS (
  SELECT id, lang, COUNT(*) AS c FROM labeled GROUP BY id, lang
),
ranked AS (
  SELECT id, lang, c,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lang) AS rn
  FROM per_lang
)
SELECT id, CAST(SUM(c) AS BIGINT) AS n_windows,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       MAX(CASE WHEN rn = 1 THEN lang END) AS majority_lang,
       CAST((MAX(CASE WHEN rn = 1 THEN c END) * 1000000) // SUM(c)
            AS BIGINT) AS majority_share_fp,
       COUNT(DISTINCT CASE WHEN lang != 'und' THEN lang END) > 1
         AS is_code_switched
FROM ranked GROUP BY id
"""


@query(
    "q224_code_switch",
    oracle=_code_switch_oracle(),
    tags=("text", "langid", "quality"),
)
def q224_code_switch(spark, sf_dir):
    """Per-document code-switch screen (operators/quality.
    code_switch_report): 10-token windows language-ID'd with q53's
    stopword argmax (fixed tie order), majority share in exact 1e-6
    fixed point, mixed-language flag -- the window view catches
    bilingual pages whole-document langid passes."""
    from ..operators.quality import code_switch_report

    docs = load_table(spark, sf_dir, "documents")
    return code_switch_report(
        docs, "text", "doc_id", window_tokens=_CS_WINDOW
    )


# ---------------------------------------------------------------------------
# q225: KMV set-overlap of AM vs PM active users
# ---------------------------------------------------------------------------


def _kmv_overlap_oracle() -> str:
    h = _HEX13.format(h="md5(CAST(user_id AS VARCHAR))")
    k = _KMV_GROUP_K
    return f"""
WITH am AS (
  SELECT hv FROM (
    SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM (
      SELECT DISTINCT {h} AS hv FROM events
      WHERE EXTRACT(hour FROM ts) < 12
    )
  ) WHERE rn <= {k}
),
pm AS (
  SELECT hv FROM (
    SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM (
      SELECT DISTINCT {h} AS hv FROM events
      WHERE EXTRACT(hour FROM ts) >= 12
    )
  ) WHERE rn <= {k}
),
merged AS (
  SELECT hv FROM (
    SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM (
      SELECT hv FROM am UNION SELECT hv FROM pm
    )
  ) WHERE rn <= {k}
),
u AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(MAX(hv) AS BIGINT) AS kth,
         CAST(CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                   ELSE (CAST({k - 1} AS BIGINT) * {_KMV_SPACE})
                        // MAX(hv) END AS BIGINT) AS union_est
  FROM merged
),
i AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM merged m
  WHERE m.hv IN (SELECT hv FROM am) AND m.hv IN (SELECT hv FROM pm)
)
SELECT u.n_kept, u.union_est, i.n_inter,
       CAST((i.n_inter * 1000000) // u.n_kept AS BIGINT) AS jaccard_fp,
       CAST((u.union_est // u.n_kept) * i.n_inter
            + ((u.union_est % u.n_kept) * i.n_inter) // u.n_kept
            AS BIGINT) AS intersect_est
FROM u, i
"""


@query(
    "q225_kmv_overlap",
    oracle=_kmv_overlap_oracle(),
    tags=("sketch", "distinct", "overlap"),
)
def q225_kmv_overlap(spark, sf_dir):
    """Audience-overlap estimation from sketches alone (operators/
    sketches.kmv_intersect_estimate): AM vs PM active-user KMV
    summaries, union-k-smallest membership intersection, overflow-
    safe quotient/remainder scaling -- the raw user sets are never
    joined."""
    from ..operators.sketches import kmv_intersect_estimate, kmv_summary

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("v"),
        F.hour("ts").alias("h"),
    )
    am = kmv_summary(ev.filter(F.col("h") < 12), "v", k=_KMV_GROUP_K)
    pm = kmv_summary(ev.filter(F.col("h") >= 12), "v", k=_KMV_GROUP_K)
    return kmv_intersect_estimate(am, pm, k=_KMV_GROUP_K)


# ---------------------------------------------------------------------------
# q226: dictionary-encoding advisor
# ---------------------------------------------------------------------------


def _advisor_oracle() -> str:
    k = _KMV_K
    blocks = []
    for c in _ADV_COLS:
        h = _HEX13.format(h=f"md5(CAST({c} AS VARCHAR))")
        blocks.append(f"""
SELECT '{c}' AS column, n_kept, kth,
       CAST(CASE WHEN n_kept < {k} THEN n_kept
                 ELSE (CAST({k - 1} AS BIGINT) * {_KMV_SPACE})
                      // kth END AS BIGINT) AS est
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(MAX(hv) AS BIGINT) AS kth
  FROM (
    SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM (
      SELECT DISTINCT {h} AS hv FROM lineitem
    )
  ) WHERE rn <= {k}
)""")
        # noqa: the per-column block recomputes its own sketch exactly
    union = " UNION ALL ".join(blocks)
    return f"""
WITH nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
ests AS ({union})
SELECT "column", nr.n AS n_rows, est AS distinct_est,
       CAST((LEAST(est, nr.n) * 1000000) // nr.n AS BIGINT)
         AS distinct_ratio_fp,
       LEAST(est, nr.n) * 10 < nr.n AS recommend_dictionary
FROM ests, nr
"""


@query(
    "q226_encoding_advisor",
    oracle=_advisor_oracle(),
    tags=("maintenance", "sketch", "layout"),
)
def q226_encoding_advisor(spark, sf_dir):
    """Columnar-layout advisor over lineitem (operators/sketches.
    encoding_advisor): one stacked scan sketches three columns'
    distinct ratios (KMV per column), recommending dictionary
    encoding under the classic 10% cardinality heuristic -- the
    maintenance-time companion to the compaction/z-order operators."""
    from ..operators.sketches import encoding_advisor

    li = load_table(spark, sf_dir, "lineitem")
    return encoding_advisor(li, list(_ADV_COLS), k=_KMV_K)
