"""Round-9 batch T: new PLAN SHAPES (VERDICT r8 item 6 -- "keep
filling genuinely new operator shapes rather than more scalar
panels").

* q274 -- the curation funnel as a STREAMED ingest with per-batch
  replay certification: three id-ordered micro-batches run Gopher
  gate -> cross-batch exact dedup through the real persist path
  (streaming/jobs.curation_ingest_batch: batch-keyed idempotent
  funnel + corpus writes, digest rename-aside swap), batch 1 driven
  TWICE. The report is the per-batch funnel [batch, n_raw, n_gated,
  n_kept]; the DuckDB oracle replays gate + arrival-order keep-first
  over the batch ranges, so a double-count, a lost swap, or a
  replay-unstable funnel write all break the hash. The gate CTE chain
  is shared VERBATIM with q144's composed oracle
  (plans/llm_ops6._GATE_CTES), so the streamed and batch forms are
  certified against the same gate semantics.
* q275 -- bucketed-storage join elision on the mart tables: orders and
  customer are persisted bucketed-and-sorted on custkey
  (operators/bucketing.write_bucketed), then joined AND aggregated
  with ZERO Exchange nodes -- the pay-the-shuffle-once-at-write-time
  pattern for 100 TB fact-dim pipelines. The query RAISES if any
  Exchange appears in the physical plan, so the driver row certifies
  the plan shape as well as the values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ._helpers import dec
from .llm_ops6 import _GATE_CTES
from .registry import query

# ---------------------------------------------------------------------------
# q274: streamed curation funnel with replay certification
# ---------------------------------------------------------------------------

_STREAM_CURATION_ORACLE = (
    "WITH "
    + _GATE_CTES
    + """, n AS (SELECT COUNT(*) AS n FROM documents),
b AS (
  SELECT d.doc_id, d.text,
         CAST(CASE WHEN d.doc_id < n.n // 3 THEN 0
                   WHEN d.doc_id < 2 * (n.n // 3) THEN 1
                   ELSE 2 END AS BIGINT) AS batch
  FROM documents d CROSS JOIN n
), gated AS (
  SELECT b.batch, b.doc_id, b.text FROM b JOIN s1 USING (doc_id)
), keep AS (
  SELECT batch,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id)
             AS rn
  FROM gated
), raw AS (
  SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_raw FROM b GROUP BY batch
), g AS (
  SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_gated
  FROM gated GROUP BY batch
), k AS (
  SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM keep WHERE rn = 1 GROUP BY batch
), drv AS (
  -- every DRIVEN batch id: the ingest writes a funnel row for an
  -- EMPTY micro-batch too (n_raw=0), so the oracle must anchor on
  -- the driven ids, not on data-derived groups. (Found by the r12
  -- sf1.0 exactness run: the key-shifted sf1.0 doc ids leave the
  -- middle third empty, and a content-grouped oracle lost that row.)
  SELECT CAST(bi AS BIGINT) AS batch FROM range(0, 3) t(bi)
)
SELECT d.batch,
       CAST(COALESCE(r.n_raw, 0) AS BIGINT) AS n_raw,
       CAST(COALESCE(g.n_gated, 0) AS BIGINT) AS n_gated,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM drv d LEFT JOIN raw r USING (batch)
LEFT JOIN g USING (batch) LEFT JOIN k USING (batch)
"""
)


@query(
    "q274_streamed_curation_replay",
    oracle=_STREAM_CURATION_ORACLE,
    tags=("streaming", "curation", "e2e", "exactly-once"),
)
def q274_streamed_curation_replay(spark, sf_dir):
    """The curation funnel's first two stages as a streamed ingest with
    exactly-once accounting (streaming/jobs.curation_ingest_batch over
    the q199 persist path): documents replay in three id-ordered
    micro-batches -- gate, then cross-batch exact dedup against the
    carried digest table -- with batch 1 deliberately driven twice.
    Per-batch raw/gated counts are replay-stable content functions
    written to batch-keyed directories; kept-new counts are derived
    from the exactly-once corpus store (a batch-time novel count would
    replay as zero). The oracle replays gate + arrival-order keep-first
    (id-ordered batches make the global min-id keeper exactly the
    arrival-order keeper) over the same batch ranges."""
    import os
    import shutil

    from ..streaming.jobs import curation_ingest_batch
    from .llm_ops9 import _monitor_dir

    out_dir = _monitor_dir(sf_dir, "curation_ingest")
    shutil.rmtree(out_dir, ignore_errors=True)  # fresh state per run
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1, s2 = n // 3, 2 * (n // 3)
    batches = [
        (0, docs.filter(F.col("doc_id") < s1)),
        (1, docs.filter((F.col("doc_id") >= s1) & (F.col("doc_id") < s2))),
        (1, docs.filter((F.col("doc_id") >= s1) & (F.col("doc_id") < s2))),
        (2, docs.filter(F.col("doc_id") >= s2)),
    ]
    for bid, b in batches:
        curation_ingest_batch(
            b,
            bid,
            out_dir,
            min_words=10,
            stopwords=("the", "a"),
            min_stopword_hits=1,
        )
    funnel = spark.read.parquet(os.path.join(out_dir, "funnel"))
    corpus_path = os.path.join(out_dir, "corpus")
    if os.path.isdir(corpus_path):
        corpus = spark.read.parquet(corpus_path)
        kept = corpus.groupBy(
            F.col("batch").cast("long").alias("batch")
        ).agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    else:
        # Every batch gated/deduped to zero novel docs: dedup_ingest_batch
        # never creates corpus/ -- report n_kept=0 per batch, mirroring
        # the oracle's COALESCE(k.n_kept, 0) path (ADVICE r9).
        kept = spark.createDataFrame([], "batch long, n_kept long")
    return (
        funnel.select(
            F.col("batch").cast("long").alias("batch"),
            "n_raw",
            "n_gated",
        )
        .join(kept, "batch", "left")
        .select(
            "batch",
            "n_raw",
            "n_gated",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# q275: bucketed mart join -- shuffle elision certified by the driver
# ---------------------------------------------------------------------------

_BUCKETED_JOIN_ORACLE = """
SELECT o_custkey AS custkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_spend
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY 1, 2
"""


@query(
    "q275_bucketed_mart_join",
    oracle=_BUCKETED_JOIN_ORACLE,
    tags=("join", "bucketing", "scale", "marts"),
)
def q275_bucketed_mart_join(spark, sf_dir):
    """Per-customer order rollup over BUCKETED storage: orders and
    customer persist bucketed-and-sorted on custkey (8 buckets,
    operators/bucketing.write_bucketed -- the shuffle is paid once at
    write time), then the merge-hinted join AND both aggregate phases
    run on the bucket partitioning with ZERO Exchange nodes. The
    function raises if any Exchange appears, so the driver's green row
    certifies the plan shape, not just the values. At 100 TB this is
    the daily fact-dim pattern: co-located storage turns every repeat
    join/rollup on the bucket key into a scan-only stage. The result
    is materialized (localCheckpoint) before the temp tables drop, so
    no catalog or warehouse state outlives the call."""
    import hashlib

    from ..operators.bucketing import write_bucketed

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_o, t_c = f"b9_orders_{tag}", f"b9_cust_{tag}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    write_bucketed(orders, t_o, ["o_custkey"], n_buckets=8)
    write_bucketed(cust, t_c, ["o_custkey"], n_buckets=8)
    try:
        joined = spark.table(t_o).hint("merge").join(
            spark.table(t_c), "o_custkey"
        )
        result = joined.groupBy(
            F.col("o_custkey").alias("custkey"), "c_mktsegment"
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_spend"),
        )
        plan = result._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan:
            raise AssertionError(
                "bucketed mart join planned a shuffle -- bucket "
                f"co-location regressed:\n{plan}"
            )
        return result.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")
