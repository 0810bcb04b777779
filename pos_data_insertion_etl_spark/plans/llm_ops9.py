"""Round-7 registrations (q169-q176): the pytest-evidenced round-7
queue converted to driver-certifiable queries (VERDICT r6 items 2/3/7).

* q169 -- the corpus-wide kNN graph, registered only after its bucket
  width was BOUNDED (auto plane scaling + md5 candidate cap,
  operators/similarity.lsh_knn_graph). Deterministic seeded planes +
  integer fixed-point plane dots + the deterministic md5 cap replay
  bit-for-bit in DuckDB, so it carries a FULL oracle like q124.
* q170 -- TAR streaming-source parity with the zip path's q38 shape:
  a deterministic two-member tar fixture is built from lineitem, read
  back through sources/tarsource (sequential stream, incremental
  decode, fixed-width split), and the typed aggregate must match
  DuckDB recomputing the same records straight from lineitem.
* q171/q172 -- mergeable quantile summaries: certified-rank-bound
  invariant oracles (the q63/q64 pattern: exact anchors + booleans the
  theorem pins TRUE; the estimates themselves are batching-dependent
  and never leave the engine).
* q173 -- RFC 9309 robots evaluation with a FIXED rule set and a
  hand-derived CASE decision table as the oracle (independent
  re-derivation, the q145 pinned-fixture pattern).
* q174 -- sitemap extraction over deterministically synthesized XML;
  the oracle constructs the expected rows in closed form without
  parsing anything.
* q175/q176 -- the streaming category/quantile monitors' batch
  analogs (VERDICT item 7, mirroring q36/q40): micro-batches are
  replayed through the monitors' own persist/load path (including a
  deliberate duplicate replay to certify idempotent overwrite), then
  checked exactly (q175) / by certified bounds (q176).

Round-7 NEW operators (built this round, not queue items):

* q177 -- embedding-centroid (semantic) drift: exact fixed-point
  centroid sums per group, DECIMAL/HUGEINT pairwise products, full
  oracle (operators/drift.py).
* q178 -- stratified per-key quantile summaries
  (operators/quantiles.grouped_quantile_summary), certified per key
  with q171's rank-bound invariants.
* q179 -- ExactSubstr-style duplicate-span extraction
  (operators/dedup.duplicate_spans): per-position n-gram digests, one
  digest-keyed count shuffle, per-document gaps-and-islands merge;
  full oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

_EMB_DIM = 64
_KNN_PLANES = 6
_KNN_SEED = 7
_KNN_K = 5
_KNN_CAP = 6  # binds at sf0.01 (500 vecs / 64 buckets ~ 8 wide)

_QS = (0.1, 0.25, 0.5, 0.75, 0.9)


# ---------------------------------------------------------------------------
# q169: bounded corpus-wide kNN graph
# ---------------------------------------------------------------------------


def _knn_graph_oracle() -> str:
    from ..operators.similarity import PLANE_SCALE, seeded_planes

    planes = seeded_planes(_KNN_PLANES, _EMB_DIM, _KNN_SEED)
    plane_lits = [
        "[" + ", ".join(str(int(round(x * PLANE_SCALE))) for x in row) + "]"
        for row in planes
    ]
    bits = " || ".join(
        f"(CASE WHEN CAST(list_sum(list_transform(list_zip(v, {lit}),"
        f" p -> p[1] * p[2])) AS BIGINT) >= 0 THEN '1' ELSE '0' END)"
        for lit in plane_lits
    )
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT)) AS v
  FROM embeddings
),
bk AS (SELECT vec_id, v, {bits} AS bucket FROM qv),
-- deterministic md5-ordered candidate cap per bucket (the output
-- cardinality bound; operators/similarity.lsh_knn_graph)
capped AS (
  SELECT vec_id, v, bucket FROM (
    SELECT vec_id, v, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket
                              ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                       vec_id) AS bw
    FROM bk) t
  WHERE bw <= {_KNN_CAP}
),
pairs AS (
  SELECT a.vec_id AS src_id, c.vec_id AS dst_id
  FROM bk a JOIN capped c ON c.bucket = a.bucket
  WHERE c.vec_id != a.vec_id
),
pc AS (SELECT p.src_id, p.dst_id, unnest(a.v) AS qx, unnest(b.v) AS nx
       FROM pairs p JOIN qv a ON a.vec_id = p.src_id
                    JOIN qv b ON b.vec_id = p.dst_id),
pd AS (SELECT src_id, dst_id,
              CAST(SUM(qx * nx) AS BIGINT) AS dot,
              CAST(SUM(qx * qx) AS BIGINT) AS qq,
              CAST(SUM(nx * nx) AS BIGINT) AS nn
       FROM pc GROUP BY 1, 2),
psim AS (SELECT src_id, dst_id,
                ROUND(CAST(dot AS DOUBLE)
                      / (SQRT(CAST(qq AS DOUBLE)) * SQRT(CAST(nn AS DOUBLE))), 6)
                    AS cos_sim
         FROM pd)
SELECT src_id, dst_id, cos_sim, rn FROM (
  SELECT src_id, dst_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY src_id
                                 ORDER BY cos_sim DESC, dst_id) AS BIGINT)
             AS rn
  FROM psim) t
WHERE rn <= {_KNN_K}
"""


@query(
    "q169_knn_graph_bounded",
    oracle=_knn_graph_oracle(),
    tags=("similarity", "ann", "graph"),
)
def q169_knn_graph_bounded(spark, sf_dir):
    """Corpus-wide approximate kNN graph with BOUNDED output
    cardinality: seeded sign-LSH bucket self-join, md5-capped
    candidate side (<= N * cap pairs even on an adversarially hot
    bucket), integer fixed-point plane dots and cosines -- fully
    deterministic, so the DuckDB oracle replays buckets, cap, and
    ranks bit-for-bit."""
    from ..operators.similarity import lsh_knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_knn_graph(
        emb,
        "vec_id",
        "embedding",
        k=_KNN_K,
        n_planes=_KNN_PLANES,
        seed=_KNN_SEED,
        dim=_EMB_DIM,
        max_bucket_width=_KNN_CAP,
    )


# ---------------------------------------------------------------------------
# q170: TAR streaming source -> fixed-width parse parity (q38 over TAR)
# ---------------------------------------------------------------------------

#: 26-char record synthesized from a deterministic lineitem subset
#: (every 37th orderkey), split into two members by orderkey parity --
#: the member attribution and per-member record_idx are part of the
#: checked output.
_TAR_SUBSET_MOD = 37
_TAR_REC_CHARS = 26

_TAR_ORACLE = f"""
WITH sub AS (
  SELECT l_orderkey, l_linenumber,
         LPAD(CAST(l_orderkey AS VARCHAR), 12, '0')
         || LPAD(CAST(l_linenumber AS VARCHAR), 4, '0')
         || l_returnflag || l_linestatus
         || STRFTIME(l_shipdate, '%Y%m%d') AS rec,
         CASE WHEN l_orderkey % 2 = 0 THEN 'even.txt'
              ELSE 'odd.txt' END AS member
  FROM lineitem WHERE l_orderkey % {_TAR_SUBSET_MOD} = 0
), idx AS (
  -- the synthetic lineitem has duplicate (orderkey, linenumber)
  -- pairs, so the record text itself is the total-order tiebreak
  -- (matching the fixture writer's sort key)
  SELECT member, rec,
         ROW_NUMBER() OVER (PARTITION BY member
                            ORDER BY l_orderkey, l_linenumber, rec) - 1
             AS record_idx
  FROM sub
), parsed AS (
  SELECT member, record_idx,
         CAST(SUBSTRING(rec, 1, 12) AS BIGINT) AS orderkey,
         SUBSTRING(rec, 17, 1) AS returnflag,
         SUBSTRING(rec, 18, 1) AS linestatus,
         CAST(STRPTIME(SUBSTRING(rec, 19, 8), '%Y%m%d') AS DATE) AS shipdate
  FROM idx
)
SELECT member, returnflag, linestatus,
       COUNT(*) AS n_records,
       CAST(SUM(orderkey) AS BIGINT) AS sum_orderkey,
       CAST(SUM(record_idx) AS BIGINT) AS sum_idx,
       MIN(shipdate) AS first_ship, MAX(shipdate) AS last_ship
FROM parsed GROUP BY member, returnflag, linestatus
"""


def _tar_fixture_path(spark, sf_dir: str) -> str:
    """Build (once per sf_dir) a deterministic two-member tar of
    fixed-width lineitem records. Driver-side FIXTURE synthesis, not a
    data path: the subset is ~n/37 records and the write is atomic
    (tmp + rename), so concurrent/bench-rep calls reuse one file.

    The full-row .collect() below builds the TEST ARCHIVE once --
    bounded by the SF fixture's subset size -- and is NOT part of the
    measured read path (q170 times tarsource's streamed member read,
    which starts from the finished file). The operator under test
    never collects."""
    import hashlib
    import io
    import tarfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"graft_tarfix_{tag}.tar"
    )
    if os.path.exists(path):
        return path
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % _TAR_SUBSET_MOD) == 0
    )
    rec = F.concat(
        F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("l_linenumber").cast("string"), 4, "0"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.date_format("l_shipdate", "yyyyMMdd"),
    )
    rows = sorted(
        (r.k, r.ln, r.rec)
        for r in li.select(
            F.col("l_orderkey").alias("k"),
            F.col("l_linenumber").alias("ln"),
            rec.alias("rec"),
        ).collect()
    )
    members = {
        "even.txt": "".join(r for k, _, r in rows if k % 2 == 0),
        "odd.txt": "".join(r for k, _, r in rows if k % 2 == 1),
    }
    tmp = f"{path}.tmp.{os.getpid()}"
    with tarfile.open(tmp, "w") as tf:
        for name in sorted(members):
            data = members[name].encode("utf-8")
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0  # deterministic archive bytes
            tf.addfile(info, io.BytesIO(data))
    os.replace(tmp, path)
    return path


@query(
    "q170_tar_fixed_width",
    oracle=_TAR_ORACLE,
    tags=("source", "tar", "fixedwidth"),
)
def q170_tar_fixed_width(spark, sf_dir):
    """TAR source parity with the zip ingest (q38 shape over TAR):
    records stream out of a two-member archive sequentially
    (sources/tarsource, tarfile r|* -- no seeks), split at 26 chars
    with sub-record carry, then parse + aggregate per member. Member
    attribution, per-member record order, and the typed fields are all
    under the hash."""
    from ..sources.tarsource import records_from_tar_paths

    path = _tar_fixture_path(spark, sf_dir)
    paths = spark.createDataFrame([(path,)], "path string")
    recs = records_from_tar_paths(
        paths, chunk_chars=_TAR_REC_CHARS, batch_records=5_000
    )
    parsed = recs.select(
        "member",
        "record_idx",
        F.substring("record", 1, 12).cast("long").alias("orderkey"),
        F.substring("record", 17, 1).alias("returnflag"),
        F.substring("record", 18, 1).alias("linestatus"),
        F.to_date(F.substring("record", 19, 8), "yyyyMMdd").alias(
            "shipdate"
        ),
    )
    return parsed.groupBy("member", "returnflag", "linestatus").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("orderkey").alias("sum_orderkey"),
        F.sum("record_idx").alias("sum_idx"),
        F.min("shipdate").alias("first_ship"),
        F.max("shipdate").alias("last_ship"),
    )


# ---------------------------------------------------------------------------
# q171/q172: mergeable quantile summaries (certified-bound invariants)
# ---------------------------------------------------------------------------

_QUANTILE_ORACLE = """
SELECT CAST(q AS DOUBLE) AS q,
       (SELECT COUNT(*) FROM lineitem) AS n_rows,
       TRUE AS rank_within_bound,
       TRUE AS value_in_range
FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) t(q)
"""


def _rank_check_rows(df, value_col, summary, qs):
    """[(q, n, rank_ok, in_range)] for a summary over df[value_col]:
    the estimate's exact rank window must sit within the summary's
    certified bound (+ one element weight of tie slack on each side)
    of q*n, and the estimate must be a real data value. TRUE by the
    Munro-Paterson certification for ANY batching -- which is exactly
    why these booleans are oracle-safe while the estimates are not."""
    from ..operators.quantiles import estimate_quantiles, rank_error_bound

    est = estimate_quantiles(summary, qs)
    bound = rank_error_bound(summary)
    maxw = summary.agg(F.max("weight")).collect()[0][0] or 0
    slack = bound + 2 * maxw
    v = F.col(value_col)
    aggs = []
    for i, (_, val) in enumerate(est):
        aggs.append(F.sum((v < F.lit(val)).cast("long")).alias(f"lo{i}"))
        aggs.append(F.sum((v <= F.lit(val)).cast("long")).alias(f"hi{i}"))
    row = df.agg(
        *aggs,
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    ).collect()[0]
    out = []
    for i, (q, val) in enumerate(est):
        target = q * row.n
        rank_ok = (
            row[f"lo{i}"] - slack <= target <= row[f"hi{i}"] + slack
        )
        out.append(
            (
                float(q),
                int(row.n),
                bool(rank_ok),
                bool(row.vmin <= val <= row.vmax),
            )
        )
    return out


@query(
    "q171_quantile_summary_bounds",
    oracle=_QUANTILE_ORACLE,
    tags=("sketch", "quantiles"),
)
def q171_quantile_summary_bounds(spark, sf_dir):
    """Mergeable one-pass quantile summary (operators/quantiles) over
    l_extendedprice, certified through its own rank-error bound: the
    query estimates five quantiles from the summary, recomputes each
    estimate's EXACT rank window against the raw data, and emits
    booleans the certification theorem pins TRUE; the oracle computes
    the exact anchors and pins the booleans (the q63/q64 invariant
    pattern -- estimates are batching-dependent and stay internal)."""
    from ..operators.quantiles import quantile_summary

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    summary = quantile_summary(li, "v", k=256).localCheckpoint(
        eager=False
    )
    rows = _rank_check_rows(li, "v", summary, _QS)
    return spark.createDataFrame(
        rows,
        "q double, n_rows long, rank_within_bound boolean, "
        "value_in_range boolean",
    )


_DRIFT_ORACLE = """
SELECT CAST(q AS DOUBLE) AS q,
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey % 2 = 0) AS n_old,
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey % 2 = 1) AS n_new,
       TRUE AS old_rank_ok,
       TRUE AS new_rank_ok,
       TRUE AS delta_consistent,
       TRUE AS merged_bound_additive
FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) t(q)
"""


@query(
    "q172_quantile_drift_report",
    oracle=_DRIFT_ORACLE,
    tags=("sketch", "quantiles", "drift"),
)
def q172_quantile_drift_report(spark, sf_dir):
    """Summary-only distribution drift (even vs odd orderkeys of
    l_extendedprice): both sides' estimates must sit inside their
    certified rank bounds, the report's delta must equal the estimate
    difference, and merging the summaries must ADD their bounds
    exactly (the bookkeeping quantile_drift_report's conclusiveness
    rests on). Exact side counts anchor the hash."""
    from ..operators.quantiles import (
        estimate_quantiles,
        merge_summaries,
        quantile_drift_report,
        quantile_summary,
        rank_error_bound,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_extendedprice").cast("double").alias("v"),
    )
    old_df = li.filter(F.col("k") % 2 == 0).select("v")
    new_df = li.filter(F.col("k") % 2 == 1).select("v")
    old_s = quantile_summary(old_df, "v", k=256).localCheckpoint(
        eager=False
    )
    new_s = quantile_summary(new_df, "v", k=256).localCheckpoint(
        eager=False
    )
    report = quantile_drift_report(old_s, new_s, _QS)
    old_est = dict(estimate_quantiles(old_s, _QS))
    new_est = dict(estimate_quantiles(new_s, _QS))
    merged_ok = rank_error_bound(
        merge_summaries(old_s, new_s)
    ) == rank_error_bound(old_s) + rank_error_bound(new_s)
    old_rows = {
        q: (n, ok)
        for q, n, ok, _ in _rank_check_rows(old_df, "v", old_s, _QS)
    }
    new_rows = {
        q: (n, ok)
        for q, n, ok, _ in _rank_check_rows(new_df, "v", new_s, _QS)
    }
    out = []
    for r in report:
        q = float(r["q"])
        out.append(
            (
                q,
                old_rows[q][0],
                new_rows[q][0],
                old_rows[q][1],
                new_rows[q][1],
                bool(abs(r["delta"] - (new_est[q] - old_est[q])) == 0.0),
                bool(merged_ok),
            )
        )
    return spark.createDataFrame(
        out,
        "q double, n_old long, n_new long, old_rank_ok boolean, "
        "new_rank_ok boolean, delta_consistent boolean, "
        "merged_bound_additive boolean",
    )


# ---------------------------------------------------------------------------
# q173: RFC 9309 robots evaluation (fixed rule set, hand-derived table)
# ---------------------------------------------------------------------------

_ROBOTS_TXT = (
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/open/\n"
    "Disallow: /*.pdf$\n"
    "Disallow: /tmp\n"
    "Allow: /tmp/keep\n"
)

#: doc_id % 7 -> (path template, expected allowed, why)
#: 0 /public/p{id}        TRUE   no rule matches
#: 1 /private/p{id}       FALSE  Disallow /private/
#: 2 /private/open/p{id}  TRUE   Allow(14 chars) beats Disallow(9)
#: 3 /d{id}.pdf           FALSE  /*.pdf$ end anchor matches
#: 4 /d{id}.pdfx          TRUE   end anchor does NOT match
#: 5 /tmp{id}             FALSE  Disallow /tmp is a pure prefix
#: 6 /tmp/keep/{id}       TRUE   Allow /tmp/keep(9) beats /tmp(4)

_ROBOTS_ORACLE = """
WITH base AS (
  SELECT doc_id,
         CASE doc_id % 7
           WHEN 0 THEN '/public/p' || CAST(doc_id AS VARCHAR)
           WHEN 1 THEN '/private/p' || CAST(doc_id AS VARCHAR)
           WHEN 2 THEN '/private/open/p' || CAST(doc_id AS VARCHAR)
           WHEN 3 THEN '/d' || CAST(doc_id AS VARCHAR) || '.pdf'
           WHEN 4 THEN '/d' || CAST(doc_id AS VARCHAR) || '.pdfx'
           WHEN 5 THEN '/tmp' || CAST(doc_id AS VARCHAR)
           ELSE '/tmp/keep/' || CAST(doc_id AS VARCHAR)
         END AS path,
         -- hand-derived RFC 9309 outcomes for the fixed rule set
         CASE doc_id % 7
           WHEN 0 THEN TRUE
           WHEN 1 THEN FALSE
           WHEN 2 THEN TRUE
           WHEN 3 THEN FALSE
           WHEN 4 THEN TRUE
           WHEN 5 THEN FALSE
           ELSE TRUE
         END AS allowed
  FROM documents
)
SELECT doc_id, path, allowed FROM base
"""


@query(
    "q173_robots_allowed",
    oracle=_ROBOTS_ORACLE,
    tags=("curation", "crawl", "robots"),
)
def q173_robots_allowed(spark, sf_dir):
    """Robots Exclusion Protocol evaluation (operators/quality
    .robots_allowed: longest-match wins, Allow beats Disallow on ties,
    * wildcards, $ end anchor) against a FIXED rule set; the oracle is
    a hand-derived decision table over the seven path shapes -- an
    independent re-derivation of the RFC semantics, not a replica of
    the parser."""
    from ..operators.quality import robots_allowed

    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    path = (
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit("/public/p"), sid))
        .when(F.col("doc_id") % 7 == 1, F.concat(F.lit("/private/p"), sid))
        .when(
            F.col("doc_id") % 7 == 2,
            F.concat(F.lit("/private/open/p"), sid),
        )
        .when(
            F.col("doc_id") % 7 == 3,
            F.concat(F.lit("/d"), sid, F.lit(".pdf")),
        )
        .when(
            F.col("doc_id") % 7 == 4,
            F.concat(F.lit("/d"), sid, F.lit(".pdfx")),
        )
        .when(F.col("doc_id") % 7 == 5, F.concat(F.lit("/tmp"), sid))
        .otherwise(F.concat(F.lit("/tmp/keep/"), sid))
    )
    staged = docs.select(
        "doc_id",
        path.alias("path"),
        F.lit(_ROBOTS_TXT).alias("robots"),
    )
    return staged.select(
        "doc_id",
        "path",
        robots_allowed(staged, "robots", "path").alias("allowed"),
    )


# ---------------------------------------------------------------------------
# q174: sitemap extraction over synthesized XML
# ---------------------------------------------------------------------------

_SITEMAP_ORACLE = """
WITH ids AS (SELECT doc_id FROM documents),
expected AS (
  -- doc_id % 3 == 0: urlset with two pages, first carries lastmod
  SELECT doc_id,
         'https://ex.com/page/' || CAST(doc_id AS VARCHAR) || '/a' AS url,
         '2026-01-' || LPAD(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
             AS lastmod,
         FALSE AS is_sitemap
  FROM ids WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id,
         'https://ex.com/page/' || CAST(doc_id AS VARCHAR) || '/b',
         NULL, FALSE
  FROM ids WHERE doc_id % 3 = 0
  UNION ALL
  -- doc_id % 3 == 1: sitemapindex entry whose loc has NO 'sitemap'
  -- substring (the enclosing tag decides; ADVICE r6)
  SELECT doc_id,
         'https://ex.com/maps/part-' || CAST(doc_id AS VARCHAR)
             || '.xml.gz',
         NULL, TRUE
  FROM ids WHERE doc_id % 3 = 1
  UNION ALL
  -- doc_id % 3 == 2: page URL CONTAINING 'sitemap' -- still a page
  SELECT doc_id,
         'https://ex.com/blog/sitemap-tips-' || CAST(doc_id AS VARCHAR),
         NULL, FALSE
  FROM ids WHERE doc_id % 3 = 2
)
SELECT doc_id, url, lastmod, is_sitemap FROM expected
"""


@query(
    "q174_sitemap_urls",
    oracle=_SITEMAP_ORACLE,
    tags=("curation", "crawl", "sitemap"),
)
def q174_sitemap_urls(spark, sf_dir):
    """Sitemap seed expansion (operators/quality.sitemap_urls) over
    deterministically synthesized urlset / sitemapindex XML; the
    oracle constructs the expected (url, lastmod, is_sitemap) rows in
    closed form -- including the two classification traps the r6
    ADVICE called out (nested sitemap without the substring, page URL
    with it)."""
    from ..operators.quality import sitemap_urls

    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    lastmod = F.concat(
        F.lit("2026-01-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
    )
    xml = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<?xml version="1.0"?><urlset>'
                      "<url><loc> https://ex.com/page/"),
                sid,
                F.lit("/a </loc><lastmod>"),
                lastmod,
                F.lit("</lastmod></url><url><loc>https://ex.com/page/"),
                sid,
                F.lit("/b</loc></url></urlset>"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("<sitemapindex><sitemap><loc>"
                      "https://ex.com/maps/part-"),
                sid,
                F.lit(".xml.gz</loc></sitemap></sitemapindex>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<urlset><url><loc>https://ex.com/blog/"
                      "sitemap-tips-"),
                sid,
                F.lit("</loc></url></urlset>"),
            )
        )
    )
    staged = docs.select("doc_id", xml.alias("xml"))
    return sitemap_urls(staged, "xml", "doc_id")


# ---------------------------------------------------------------------------
# q175/q176: streaming monitors' batch analogs (persist/load replay)
# ---------------------------------------------------------------------------


def _monitor_dir(sf_dir: str, kind: str) -> str:
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), f"graft_{kind}_monitor_{tag}"
    )


_CAT_MONITOR_ORACLE = r"""
WITH old_c AS (
  SELECT event_type AS category, COUNT(*) AS n_old FROM events
  WHERE EXTRACT(hour FROM ts) < 12 GROUP BY 1
), new_c AS (
  SELECT event_type AS category, COUNT(*) AS n_new FROM events
  WHERE EXTRACT(hour FROM ts) >= 12 GROUP BY 1
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
    "q175_category_monitor_replay",
    oracle=_CAT_MONITOR_ORACLE,
    tags=("streaming", "drift", "monitor"),
)
def q175_category_monitor_replay(spark, sf_dir):
    """The category monitor's batch analog (q36/q40 pattern): events
    split into micro-batches replay through category_monitor_batch's
    idempotent per-batch persist (one batch deliberately written
    TWICE -- replay must not double-count), the stores load back, and
    the drift between the AM and PM mixes must match DuckDB computing
    it exactly from raw events."""
    from ..operators.quantiles import categorical_drift_from_counts
    from ..streaming.jobs import (
        category_monitor_batch,
        load_category_counts,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type"), F.hour("ts").alias("h")
    )
    old_dir = _monitor_dir(sf_dir, "cat_old")
    new_dir = _monitor_dir(sf_dir, "cat_new")
    old_side = ev.filter(F.col("h") < 12)
    new_side = ev.filter(F.col("h") >= 12)
    # two micro-batches per side (split on an hour parity no one
    # depends on), plus a duplicate replay of old batch 0
    for bid, batch in [
        (0, old_side.filter(F.col("h") % 2 == 0)),
        (1, old_side.filter(F.col("h") % 2 == 1)),
        (0, old_side.filter(F.col("h") % 2 == 0)),  # replayed
    ]:
        category_monitor_batch(batch, bid, old_dir, "event_type")
    for bid, batch in [
        (0, new_side.filter(F.col("h") % 2 == 0)),
        (1, new_side.filter(F.col("h") % 2 == 1)),
    ]:
        category_monitor_batch(batch, bid, new_dir, "event_type")
    return categorical_drift_from_counts(
        load_category_counts(spark, old_dir),
        load_category_counts(spark, new_dir),
        top_k=50,
    )


_QUANTILE_MONITOR_ORACLE = """
SELECT CAST(q AS DOUBLE) AS q,
       (SELECT COUNT(*) FROM events WHERE value IS NOT NULL) AS n_rows,
       TRUE AS rank_within_bound,
       TRUE AS value_in_range,
       TRUE AS compressed_is_small
FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) t(q)
"""


@query(
    "q176_quantile_monitor_replay",
    oracle=_QUANTILE_MONITOR_ORACLE,
    tags=("streaming", "quantiles", "monitor"),
)
def q176_quantile_monitor_replay(spark, sf_dir):
    """The quantile monitor's batch analog: three event micro-batches
    persist their summaries (one replayed twice -- idempotent
    overwrite must not double weight), the store loads + compresses,
    and the compressed estimate must still sit inside the certified
    rank bound against the raw values. Invariant oracle (q171
    pattern) + the compression size contract."""
    from ..operators.quantiles import compress
    from ..streaming.jobs import (
        load_quantile_summary,
        quantile_monitor_batch,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("v"),
        (F.crc32(F.col("event_id").cast("string")) % 3).alias("b"),
    ).filter(F.col("v").isNotNull())
    store = _monitor_dir(sf_dir, "quant")
    for bid in (0, 1, 2, 1):  # batch 1 replayed
        quantile_monitor_batch(
            ev.filter(F.col("b") == bid % 3).select("v"), bid % 3,
            store, "v", k=128,
        )
    summary = load_quantile_summary(spark, store)
    compact = compress(summary, k=128).localCheckpoint(eager=False)
    rows = _rank_check_rows(ev.select("v"), "v", compact, _QS)
    small = compact.count() <= 128
    return spark.createDataFrame(
        [r + (bool(small),) for r in rows],
        "q double, n_rows long, rank_within_bound boolean, "
        "value_in_range boolean, compressed_is_small boolean",
    )


# ---------------------------------------------------------------------------
# q177: embedding-centroid (semantic) drift -- full oracle
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH qv AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 10000000) AS BIGINT)) AS v
  FROM embeddings
),
o AS (
  SELECT label AS grp, t.i AS i,
         CAST(SUM(v[t.i + 1]) AS BIGINT) AS so,
         COUNT(*) AS n_old
  FROM qv, unnest(range(64)) t(i)
  WHERE vec_id % 2 = 0 GROUP BY 1, 2
),
n AS (
  SELECT label AS grp, t.i AS i,
         CAST(SUM(v[t.i + 1]) AS BIGINT) AS sn,
         COUNT(*) AS n_new
  FROM qv, unnest(range(64)) t(i)
  WHERE vec_id % 2 = 1 GROUP BY 1, 2
),
j AS (
  SELECT COALESCE(o.grp, n.grp) AS grp, so, n_old, sn, n_new
  FROM o FULL OUTER JOIN n ON n.grp = o.grp AND n.i = o.i
),
g AS (
  SELECT grp,
         MAX(n_old) AS n_old, MAX(n_new) AS n_new,
         SUM(CAST(so AS HUGEINT) * CAST(sn AS HUGEINT)) AS dot,
         SUM(CAST(so AS HUGEINT) * CAST(so AS HUGEINT)) AS oo,
         SUM(CAST(sn AS HUGEINT) * CAST(sn AS HUGEINT)) AS nn
  FROM j GROUP BY 1
)
SELECT grp AS "group",
       CAST(COALESCE(n_old, 0) AS BIGINT) AS n_old,
       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
       ROUND(CAST(dot AS DOUBLE)
             / (SQRT(CAST(oo AS DOUBLE)) * SQRT(CAST(nn AS DOUBLE))), 6)
           AS centroid_cos,
       ROUND((SQRT(CAST(nn AS DOUBLE)) / n_new)
             / (SQRT(CAST(oo AS DOUBLE)) / n_old), 6) AS norm_ratio,
       ROUND(1.0 - CAST(dot AS DOUBLE)
             / (SQRT(CAST(oo AS DOUBLE)) * SQRT(CAST(nn AS DOUBLE))), 6)
           AS drift
FROM g
"""


@query(
    "q177_embedding_centroid_drift",
    oracle=_CENTROID_ORACLE,
    tags=("drift", "embeddings", "monitor"),
)
def q177_embedding_centroid_drift(spark, sf_dir):
    """Per-label SEMANTIC drift between two corpus halves (even vs odd
    vec_ids): cosine + norm ratio between exact fixed-point embedding
    centroids (operators/drift.embedding_centroid_drift -- one
    map-side-combined component-sum shuffle per side, products in
    exact DECIMAL so nothing overflows at corpus scale)."""
    from ..operators.drift import embedding_centroid_drift

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_centroid_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        "label",
        "embedding",
    )


# ---------------------------------------------------------------------------
# q178: per-key (stratified) quantile summaries -- invariant oracle
# ---------------------------------------------------------------------------

_GROUPED_QUANTILE_ORACLE = """
SELECT source AS key, CAST(q AS DOUBLE) AS q,
       COUNT(*) AS n_rows,
       TRUE AS rank_within_bound,
       TRUE AS value_in_range
FROM documents, (VALUES (0.5), (0.9)) t(q)
GROUP BY source, q
"""


@query(
    "q178_grouped_quantile_bounds",
    oracle=_GROUPED_QUANTILE_ORACLE,
    tags=("sketch", "quantiles", "stratified"),
)
def q178_grouped_quantile_bounds(spark, sf_dir):
    """Stratified per-source quantile summaries over document lengths
    (operators/quantiles.grouped_quantile_summary: one shuffle keyed
    on the stratum, <= n_keys * k summary rows out), certified per key
    through the same rank-bound invariants as q171: each key's median
    and p90 estimates are re-ranked EXACTLY against the raw data via
    one broadcast join + aggregate, and the theorem-pinned booleans
    plus exact per-key counts go under the hash."""
    from ..operators.quantiles import grouped_quantile_summary

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("source"), F.col("n_chars").cast("double").alias("v")
    )
    # k=8 keeps per-element weights > 1 at sf0.01 so the bound is
    # genuinely exercised (k >= group size would make every err 0)
    gs = grouped_quantile_summary(docs, "source", "v", k=8)
    pairs = gs.select("key", "value", "weight", "err").collect()
    by_key: dict = {}
    for r in pairs:
        by_key.setdefault(r.key, []).append((r.value, r.weight, r.err))
    chk_rows = []
    for key, rows in by_key.items():
        rows.sort()
        total = sum(w for _, w, _ in rows)
        bound = rows[0][2]  # single batch per key: one err value
        maxw = max(w for _, w, _ in rows)
        for q in (0.5, 0.9):
            target = q * total
            cum = 0
            est = rows[-1][0]
            for v, w, _ in rows:
                cum += w
                if cum >= target:
                    est = v
                    break
            chk_rows.append((key, float(q), est, int(bound + 2 * maxw)))
    chk = spark.createDataFrame(
        chk_rows, "key string, q double, est double, slack long"
    )
    staged = docs.select(
        F.col("source").cast("string").alias("key"), "v"
    ).join(F.broadcast(chk), "key")
    agg = staged.groupBy("key", "q").agg(
        F.sum((F.col("v") < F.col("est")).cast("long")).alias("lo"),
        F.sum((F.col("v") <= F.col("est")).cast("long")).alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.first("est").alias("e"),
        F.first("slack").alias("s"),
    )
    target = F.col("q") * F.col("n_rows").cast("double")
    return agg.select(
        "key",
        "q",
        "n_rows",
        (
            (F.col("lo").cast("double") - F.col("s") <= target)
            & (target <= F.col("hi").cast("double") + F.col("s"))
        ).alias("rank_within_bound"),
        (
            (F.col("vmin") <= F.col("e")) & (F.col("e") <= F.col("vmax"))
        ).alias("value_in_range"),
    )


# ---------------------------------------------------------------------------
# q179: ExactSubstr-style duplicate span extraction -- full oracle
# ---------------------------------------------------------------------------

_SPAN_N = 5

_DUP_SPAN_ORACLE = f"""
WITH tokd AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
), g AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, p.i AS pos,
         md5(array_to_string(list_slice(t, p.i, p.i + {_SPAN_N - 1}), ' '))
             AS gram
  FROM tokd, unnest(range(1, len(t) - {_SPAN_N - 2})) AS p(i)
  WHERE len(t) >= {_SPAN_N}
), dup AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
), dp AS (
  SELECT doc_id, n_tokens, pos FROM g JOIN dup USING (gram)
), isl AS (
  SELECT doc_id, n_tokens, pos,
         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT doc_id, n_tokens, pos,
           MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) + {_SPAN_N - 1} AS prev_end
    FROM dp) s
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_SPAN_N - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) + {_SPAN_N - 1} - MIN(pos) + 1 AS BIGINT)
           AS span_tokens,
       n_tokens
FROM isl GROUP BY doc_id, n_tokens, island
"""


@query(
    "q179_duplicate_spans",
    oracle=_DUP_SPAN_ORACLE,
    tags=("dedup", "curation", "spans"),
)
def q179_duplicate_spans(spark, sf_dir):
    """ExactSubstr-style duplicate spans (operators/dedup
    .duplicate_spans): maximal token spans covered by corpus-repeated
    5-grams, merged per document with a gaps-and-islands window -- the
    substring-level cut list q154's scalar fraction summarizes.
    Digest-keyed shuffle only; text never leaves the row."""
    from ..operators.dedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, n=_SPAN_N)


# ---------------------------------------------------------------------------
# q180: benchmark-contamination spans -- full oracle
# ---------------------------------------------------------------------------

_CONTAM_ORACLE = f"""
WITH tokd AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
), g AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, p.i AS pos,
         md5(array_to_string(list_slice(t, p.i, p.i + {_SPAN_N - 1}), ' '))
             AS gram
  FROM tokd, unnest(range(1, len(t) - {_SPAN_N - 2})) AS p(i)
  WHERE len(t) >= {_SPAN_N}
), bench AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 29 = 0
), hit AS (
  SELECT doc_id, n_tokens, pos FROM g
  WHERE doc_id % 29 != 0
    AND EXISTS (SELECT 1 FROM bench b WHERE b.gram = g.gram)
), isl AS (
  SELECT doc_id, n_tokens, pos,
         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT doc_id, n_tokens, pos,
           MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) + {_SPAN_N - 1} AS prev_end
    FROM hit) s
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_SPAN_N - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) + {_SPAN_N - 1} - MIN(pos) + 1 AS BIGINT)
           AS span_tokens,
       n_tokens
FROM isl GROUP BY doc_id, n_tokens, island
"""


@query(
    "q180_contamination_spans",
    oracle=_CONTAM_ORACLE,
    tags=("dedup", "curation", "contamination"),
)
def q180_contamination_spans(spark, sf_dir):
    """Benchmark-contamination cut lists (operators/dedup
    .contamination_spans): every training-doc token span covered by a
    5-gram that appears in the benchmark split (doc_id % 29 == 0
    plays the eval set) -- broadcast benchmark digests, map-side
    semi-join probe, per-document gaps-and-islands merge. The
    span-level complement of q92 / q137."""
    from ..operators.dedup import contamination_spans

    docs = load_table(spark, sf_dir, "documents")
    return contamination_spans(
        docs.filter(F.col("doc_id") % 29 != 0),
        docs.filter(F.col("doc_id") % 29 == 0),
        n=_SPAN_N,
    )


# ---------------------------------------------------------------------------
# q181: apply the contamination cut list -- full oracle
# ---------------------------------------------------------------------------

_APPLY_CUTS_ORACLE = f"""
WITH tokd AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
), g AS (
  SELECT doc_id, p.i AS pos,
         md5(array_to_string(list_slice(t, p.i, p.i + {_SPAN_N - 1}), ' '))
             AS gram
  FROM tokd, unnest(range(1, len(t) - {_SPAN_N - 2})) AS p(i)
  WHERE len(t) >= {_SPAN_N}
), bench AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 29 = 0
), hit AS (
  SELECT doc_id, pos FROM g
  WHERE doc_id % 29 != 0
    AND EXISTS (SELECT 1 FROM bench b WHERE b.gram = g.gram)
), cuts AS (
  SELECT doc_id, list(pos ORDER BY pos) AS ps FROM hit GROUP BY doc_id
), sel AS (
  SELECT b.doc_id, b.t,
         COALESCE(c.ps, CAST([] AS BIGINT[])) AS ps
  FROM tokd b LEFT JOIN cuts c USING (doc_id)
  WHERE b.doc_id % 29 != 0
), keptc AS (
  SELECT doc_id, t,
         list_filter(range(1, len(t) + 1),
             p -> len(list_filter(ps,
                      q -> q <= p AND p <= q + {_SPAN_N - 1})) = 0)
             AS keep
  FROM sel
)
SELECT doc_id,
       -- DuckDB's array_to_string yields NULL on an empty list where
       -- Spark's array_join yields '' -- pin the fully-cut case
       COALESCE(array_to_string(list_transform(keep, p -> t[p]), ' '),
                '') AS clean_text,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(t) - len(keep) AS BIGINT) AS n_removed
FROM keptc
"""


@query(
    "q181_apply_span_cuts",
    oracle=_APPLY_CUTS_ORACLE,
    tags=("dedup", "curation", "contamination"),
)
def q181_apply_span_cuts(spark, sf_dir):
    """The execution half of surgical decontamination: q180's cut
    list applied back to the corpus (operators/dedup.apply_span_cuts
    -- row-local HOF token filter against the per-doc span array),
    emitting the cleaned text plus removal accounting. Composes
    detect -> cut end-to-end under one hash."""
    from ..operators.dedup import apply_span_cuts, contamination_spans

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 29 != 0)
    spans = contamination_spans(
        corpus, docs.filter(F.col("doc_id") % 29 == 0), n=_SPAN_N
    )
    return apply_span_cuts(corpus, spans)
