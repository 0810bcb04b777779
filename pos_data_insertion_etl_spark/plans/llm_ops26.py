r"""Round-9 batch W: train/test split LEAKAGE AUDIT -- the measurement
that motivates q201's group-stable split.

q47's per-document hash split is stable and cheap, but duplicates of
one text can land on both sides of the split -- train/test
contamination, the classic eval-inflation bug in LLM data pipelines.
q286 quantifies it: duplicate clusters under the TOKEN-SET fingerprint
(md5 of the sorted distinct-token list -- the "same vocabulary" dedup
key, one step looser than q51's whitespace-normalized exact key, which
this corpus never collides on at the driver's sf) that straddle >= 2
splits, reported per split as leaked-doc counts and ppm shares. The
same audit composes with the q55/q88 LSH pair tables for MinHash
near-dup leakage; the token-set form is registered because its oracle
is closed-form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from .registry import query

_SPLIT_LEAKAGE_ORACLE = r"""
WITH d AS (
  SELECT CASE
           WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
             THEN 'train'
           WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
             THEN 'val'
           ELSE 'test'
         END AS split,
         md5(array_to_string(list_sort(list_distinct(
             string_split_regex(text, '\s+'))), ' ')) AS fp
  FROM documents
), c AS (
  SELECT fp, COUNT(*) AS n_docs_c, COUNT(DISTINCT split) AS n_splits
  FROM d GROUP BY fp
), l AS (
  SELECT fp FROM c WHERE n_docs_c >= 2 AND n_splits >= 2
)
SELECT d.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN l.fp IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaked_docs,
       CAST((SUM(CASE WHEN l.fp IS NOT NULL THEN 1 ELSE 0 END)
             * 1000000) // COUNT(*) AS BIGINT) AS leak_ppm
FROM d LEFT JOIN l ON d.fp = l.fp
GROUP BY d.split
"""


@query(
    "q286_split_leakage_audit",
    oracle=_SPLIT_LEAKAGE_ORACLE,
    tags=("dedup", "split", "leakage", "llm"),
)
def q286_split_leakage_audit(spark, sf_dir):
    """Train/test contamination audit for the q47 per-document hash
    split: duplicate clusters under the token-SET fingerprint (md5 of
    the sorted distinct-token list; both engines sort ASCII tokens
    identically) whose members straddle >= 2 splits are LEAKED; the
    report gives per-split doc counts, leaked-doc counts, and an
    integer ppm share. This is the measurement that motivates q201's
    group-stable split (hash the dedup key, not the document). At
    100 TB: one digest groupBy (never text on the shuffle -- the
    fingerprint is computed row-locally), a cluster-table join back,
    and a 3-row report -- the q50 dedup shape plus one
    broadcast-sized join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    h2 = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    )
    split = (
        F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
    )
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " ")
    )
    d = docs.select(split.alias("split"), fp.alias("fp"))
    clusters = d.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_docs_c"),
        F.countDistinct("split").alias("n_splits"),
    )
    leaked = clusters.filter(
        (F.col("n_docs_c") >= 2) & (F.col("n_splits") >= 2)
    ).select("fp", F.lit(True).alias("_leaked"))
    return (
        d.join(leaked, "fp", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("_leaked"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_leaked_docs"),
            F.expr(
                "CAST((sum(CASE WHEN _leaked THEN 1 ELSE 0 END) * 1000000)"
                " div count(1) AS BIGINT)"
            ).alias("leak_ppm"),
        )
    )
