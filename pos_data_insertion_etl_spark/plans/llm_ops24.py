r"""Round-9 batch U: new PLAN SHAPES, continuing VERDICT r8 item 6 --
storage/shuffle strategy certifications and two estimator shapes the
registry lacked.

* q276 -- PARTITION PRUNING certified: orders persist partitioned by
  order month, the filtered rollup must show a non-empty
  ``PartitionFilters`` on its scan (the query RAISES otherwise, so the
  driver's green row certifies the 100 TB lever: a month query reads
  month directories, not the table).
* q277 -- SALTED SKEW JOIN: events (5 event types own everything) join
  a per-type dim on (key, salt) with the dim replicated across salts
  (operators/skew.salted_join); result certified row-identical to the
  plain join semantics, and the plan must actually shuffle on the
  salted key.
* q278 -- BLOOM SEMI-JOIN PREFILTER: the runtime-filter shape -- build
  a Bloom filter over the qualifying dim keys (operators/bloom), cut
  the fact table BEFORE the shuffle with a pure expression, then a
  broadcast semi join removes false positives. Certified equal to the
  exact semi join.
* q279 -- LARGEST-REMAINDER apportionment (operators/apportion): the
  exact-total integer allocation q271's floor-division Neyman cannot
  give; ``total_alloc`` repeats the certified budget on every row.
* q280 -- THEIL-SEN robust slope (operators/stats.theil_sen_slope):
  median of pairwise slopes over the monthly revenue series -- a
  bounded months^2 theta join over the COLLAPSED series (the q260
  Mann-Kendall shape carrying an estimator, not just a test).
* q281 -- POSITIONAL PHRASE MATCH: posexplode posting lists self-joined
  on (doc, position+1) -- the inverted-index phrase-query primitive;
  pure equi-joins, no windows over raw tokens.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from ._helpers import dec
from .registry import query

# ---------------------------------------------------------------------------
# q276: partition-pruned mart query (storage-level pruning certified)
# ---------------------------------------------------------------------------

_PRUNED_MART_ORACLE = """
WITH m AS (
  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ym
  FROM orders ORDER BY ym LIMIT 2
)
SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN m ON strftime(o_orderdate, '%Y-%m') = m.ym
GROUP BY ym
"""


@query(
    "q276_partition_pruned_mart",
    oracle=_PRUNED_MART_ORACLE,
    tags=("storage", "pruning", "scale", "marts"),
)
def q276_partition_pruned_mart(spark, sf_dir):
    """Month rollup over MONTH-PARTITIONED storage with certified
    partition pruning: orders persist hive-partitioned by ym
    (date_format 'yyyy-MM'), then the two-month rollup's scan must
    carry a non-empty PartitionFilters -- the function raises if the
    filter did not reach the partition level, so the driver's green
    row certifies the plan shape. At 100 TB this is THE first lever:
    a pruned scan reads the two month directories (file listing and
    IO bounded by the slice), an unpruned one reads the table. The
    two probe months are the lexicographically smallest in the data
    (bounded 2-row collect), so the query is sf-stable. Temp output
    is removed after a localCheckpoint of the result."""
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"graft_pruned_mart_{tag}")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )
    orders.write.mode("overwrite").partitionBy("ym").parquet(out)
    try:
        months = [
            r.ym
            for r in orders.select("ym").distinct().orderBy("ym").limit(2).collect()
        ]
        back = spark.read.parquet(out).filter(F.col("ym").isin(months))
        result = back.groupBy("ym").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
        plan = result._jdf.queryExecution().executedPlan().toString()
        if "PartitionFilters: []" in plan or "PartitionFilters" not in plan:
            raise AssertionError(
                "month filter did not reach the partition level -- "
                f"pruning regressed:\n{plan}"
            )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# q277: salted skew join (result-identical to the plain join)
# ---------------------------------------------------------------------------

_SALTED_JOIN_ORACLE = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * LENGTH(event_type))
            AS DOUBLE) AS weighted_value
FROM events GROUP BY event_type
"""


@query(
    "q277_salted_skew_join",
    oracle=_SALTED_JOIN_ORACLE,
    tags=("join", "skew", "salting", "scale"),
)
def q277_salted_skew_join(spark, sf_dir):
    """Skew-salted equi join certified against plain-join semantics:
    events' 5 event types own everything (the hottest key ~1/4 of all
    rows), so a plain shuffle join lands each type in ONE task. The
    salted form (operators/skew.salted_join, 8 salts off the unique
    event_id) spreads each type across 8 shuffle partitions and
    replicates only the 5-row dim; the oracle is the UNSALTED join
    semantics, so the driver's hash certifies the rewrite is
    row-identical. The function raises if the salt column vanished
    from the join plan (i.e. the rewrite silently degenerated). At
    100 TB: n_salts scales with hot-key rows / target task rows; the
    replicated-dim shuffle cost is n_salts * |dim| rows."""
    from ..operators.skew import salted_join

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("type_w", F.length("event_type").cast("int"))
    )
    joined = salted_join(
        events,
        dim,
        "event_type",
        n_salts=8,
        salt_source=F.col("event_id"),
        # Without the hint Catalyst broadcasts the 5-row dim and the
        # salt is inert (a broadcast join never shuffles the big
        # side); the hint pins the SHUFFLED path this query certifies.
        join_hint="shuffle_hash",
    )
    result = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(dec("value") * F.col("type_w")).cast("double").alias(
            "weighted_value"
        ),
    )
    import re

    plan = result._jdf.queryExecution().executedPlan().toString()
    if not re.search(r"(ShuffledHashJoin|SortMergeJoin) \[[^\]]*_salt", plan):
        raise AssertionError(
            "the salted join did not plan as a shuffle join keyed on "
            f"_salt -- rewrite degenerated:\n{plan}"
        )
    return result


# ---------------------------------------------------------------------------
# q278: Bloom-filter semi-join prefilter (runtime-filter shape)
# ---------------------------------------------------------------------------

_BLOOM_SEMI_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_custkey IN
      (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
GROUP BY o_orderpriority
"""


@query(
    "q278_bloom_semijoin_prefilter",
    oracle=_BLOOM_SEMI_ORACLE,
    tags=("join", "bloom", "runtime-filter", "scale"),
)
def q278_bloom_semijoin_prefilter(spark, sf_dir):
    """Runtime-filter shape: revenue by priority for orders of
    high-balance customers, with the fact side cut by a BLOOM FILTER
    before any join. The filter is built distributed over the ~10% of
    customers that qualify (operators/bloom.build_bloom: bit_or word
    fold, sketch-sized collect), applied to orders as a pure expression
    (bloom_contains -- one binary literal, all probes inside codegen),
    then a broadcast LEFT SEMI join removes the false positives. The
    oracle is the exact semi join, so the driver certifies no false
    NEGATIVES ever (Bloom's one-sided guarantee) and exact final
    values. At 100 TB this is Spark's own runtime-filter/DPP pattern
    made explicit: the expression prefilter drops most fact rows at
    the scan, before shuffle or broadcast hash probing."""
    from ..operators.bloom import bloom_contains, build_bloom

    m_bits, k = 1 << 16, 7
    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select("c_custkey")
    )
    words = build_bloom(keys, "c_custkey", m_bits=m_bits, k_hashes=k)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    pre = orders.filter(
        bloom_contains(
            words, F.col("o_custkey").cast("string"), m_bits, k_hashes=k
        )
    )
    exact = pre.join(
        F.broadcast(keys),
        pre["o_custkey"] == keys["c_custkey"],
        "left_semi",
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q279: largest-remainder apportionment (exact-total integer allocation)
# ---------------------------------------------------------------------------

_LARGEST_REMAINDER_ORACLE = """
WITH g AS (
  SELECT source AS key, CAST(SUM(n_chars) AS BIGINT) AS w
  FROM documents GROUP BY source
), t AS (
  SELECT key, w, CAST(SUM(w) OVER () AS BIGINT) AS tot FROM g
), s AS (
  SELECT key, w,
         CAST((1000000 * w) // nullif(tot, 0) AS BIGINT) AS base,
         CAST((1000000 * w) % nullif(tot, 0) AS BIGINT) AS rem
  FROM t
), r AS (
  SELECT key, w, base,
         CAST(1000000 - CAST(SUM(base) OVER () AS BIGINT) AS BIGINT)
             AS leftover,
         CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, key ASC) AS BIGINT)
             AS rk
  FROM s
), a AS (
  SELECT key, w,
         CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
  FROM r
)
SELECT key, w, alloc, CAST(SUM(alloc) OVER () AS BIGINT) AS total_alloc
FROM a
"""


@query(
    "q279_largest_remainder",
    oracle=_LARGEST_REMAINDER_ORACLE,
    tags=("sampling", "allocation", "llm"),
)
def q279_largest_remainder(spark, sf_dir):
    """Exact-total token-budget split across documents sources by the
    largest-remainder (Hamilton) method (operators/apportion): floor
    shares off BIGINT char weights, then one extra unit to the largest
    remainders (ties by source ascending -- a total order) until the
    1e6 budget is hit EXACTLY. total_alloc repeats the certified sum
    on every row, so the driver's hash proves sum(alloc) == budget --
    the property q271's floor-division Neyman deliberately leaves as
    slack. Every window runs over the 20-row source table; every
    SUM(...) OVER is cast BIGINT on the oracle side (the q131 HUGEINT
    lesson). Overflow: budget * total_chars < 2^63 holds through
    sf1000 (1e6 * ~1.5e10)."""
    from ..operators.apportion import largest_remainder

    docs = load_table(spark, sf_dir, "documents")
    return largest_remainder(
        docs, key_col="source", weight_col="n_chars", budget=1_000_000
    )


# ---------------------------------------------------------------------------
# q280: Theil-Sen robust slope over the monthly revenue series
# ---------------------------------------------------------------------------

_THEIL_SEN_ORACLE = """
WITH mo AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
              + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS x,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS y
  FROM orders GROUP BY 1
), p AS (
  SELECT a.x AS x1, b.x AS x2,
         CAST(((b.y - a.y) * 1000) // (b.x - a.x) AS BIGINT) AS slope_fp
  FROM mo a JOIN mo b ON b.x > a.x
), r AS (
  SELECT slope_fp,
         CAST(ROW_NUMBER() OVER (ORDER BY slope_fp, x1, x2) AS BIGINT)
             AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
  FROM p
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM mo) AS n_points,
       n_pairs, slope_fp,
       CAST(slope_fp AS DOUBLE) / 1000.0 AS slope
FROM r WHERE rk = (n_pairs + 1) // 2
"""


@query(
    "q280_theil_sen_slope",
    oracle=_THEIL_SEN_ORACLE,
    tags=("stats", "robust", "trend"),
)
def q280_theil_sen_slope(spark, sf_dir):
    """Theil-Sen robust revenue trend: the median of all pairwise
    slopes over the MONTHLY revenue series (cents, exact decimal sum
    -> BIGINT), via operators/stats.theil_sen_slope. Slopes are
    fixed-point milli-cents/month (div truncates toward zero on both
    engines); the lower median picks rank ceil(n/2) of a totally
    ordered pair list. The pair theta join is bounded by the month
    DOMAIN squared (80 months -> 3160 pairs at every sf), never by
    rows -- the corpus collapses in the first groupBy. The q235 OLS
    slope chases one outlier month; this estimator tolerates 29%
    contamination."""
    from ..operators.stats import theil_sen_slope

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.expr("year(o_orderdate) * 12 + month(o_orderdate)")
        .cast("long")
        .alias("x")
    ).agg(
        (F.sum(dec("o_totalprice")) * 100).cast("long").alias("y")
    )
    return theil_sen_slope(monthly, "x", "y", scale=1000)


# ---------------------------------------------------------------------------
# q281: positional phrase match over posting lists
# ---------------------------------------------------------------------------

_PHRASE_MATCH_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(text, '\s+')) AS tok,
         unnest(generate_series(1, len(string_split_regex(text, '\s+'))))
             AS p
  FROM documents
), w1 AS (
  SELECT doc_id, p FROM toks WHERE tok = 'table'
), w2 AS (
  SELECT doc_id, p - 1 AS p FROM toks WHERE tok = 'scan'
)
SELECT w1.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM w1 JOIN w2 ON w1.doc_id = w2.doc_id AND w1.p = w2.p
GROUP BY w1.doc_id
"""


@query(
    "q281_phrase_match",
    oracle=_PHRASE_MATCH_ORACLE,
    tags=("retrieval", "tokens", "posexplode"),
)
def q281_phrase_match(spark, sf_dir):
    """Positional phrase query ("table scan") over inverted posting
    lists: posexplode gives (doc, position) postings per token; the
    phrase is the EQUI join of the first word's postings with the
    second word's postings shifted by one position -- the primitive
    under phrase and proximity search. No windows over raw tokens, no
    theta join: both sides shuffle on (doc_id, p), and at 100 TB the
    postings for two fixed terms are a vanishing slice of the token
    stream (filter pushes to the explode output before the shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("p0", "tok")
    )
    w1 = toks.filter(F.col("tok") == "table").select(
        "doc_id", (F.col("p0") + 1).alias("p")
    )
    w2 = toks.filter(F.col("tok") == "scan").select(
        "doc_id", F.col("p0").alias("p")
    )
    return (
        w1.join(w2, ["doc_id", "p"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
