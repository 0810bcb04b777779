"""DSIR-style importance weighting (hashed n-gram features).

Data Selection via Importance Resampling (Xie et al., 2023, public):
score every raw document by how much more likely its hashed n-gram
features are under a TARGET (in-domain) corpus than under the RAW
corpus, then keep the target-like tail. This is the principled
replacement for hand-tuned quality gates when an in-domain seed corpus
exists, and the last major public curation technique the inventory
lacked next to Gopher gates (q128), LM perplexity (q129/q130/q164),
and mixture reweighting (q121/q149).

Engine-portable by the lm_score convention:

* features = word bigrams hashed into `n_buckets` via the LAST TWO hex
  digits of md5 (md5 is identical everywhere; two hex digits decode
  exactly in any engine, no 64-bit hex parsing needed);
* per-bucket log-likelihood-ratio with add-one smoothing is ONE ln of
  a ratio of exact integers, rounded to 1e-6 fixed point PER BUCKET;
* a document's log-weight is the exact integer sum
  sum_b c_doc[b] * lr_fp[b];
* `selected` = logweight_fp > 0 -- a per-row threshold, deliberately
  NOT a global rank window (a corpus-wide row_number would funnel 100
  TB of scores through one partition; the >0 rule is the "more
  target-like than raw-like" acceptance test and needs no shuffle).

Scale: the bucket model is `n_buckets` rows (broadcast); doc scoring
is one (doc, bucket) groupBy + one broadcast join + one per-doc sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens

LR_SCALE = 1_000_000


def _bucket(col, n_buckets: int):
    """Hash a feature string into [0, n_buckets) from the last two md5
    hex digits (exact in both engines for n_buckets <= 256): Spark
    decodes them with conv(hex, 16, 10); the DuckDB oracle with
    strpos digit arithmetic."""
    h = F.md5(col)
    return (
        F.conv(F.substring(h, 31, 2), 16, 10).cast("long") % n_buckets
    ).cast("int")


def dsir_weights(
    docs: DataFrame,
    target_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """[id, n_feat, logweight_fp, selected] for every document with at
    least one bigram feature. ``target_filter`` is a boolean Column
    marking the in-domain seed rows (they are scored too -- scoring is
    a pure function of the bucket model)."""
    if not 1 <= n_buckets <= 256:
        raise ValueError("n_buckets must be in [1, 256]")
    bk = docs.select(
        F.col(id_col).alias("_id"),
        target_filter.alias("_tgt"),
        F.explode(shingles(tokens(F.lower(F.col(text_col))), 2)).alias("_g"),
    ).select(
        "_id", "_tgt", _bucket(F.col("_g"), n_buckets).alias("_b")
    ).localCheckpoint(eager=False)  # feeds the model AND the doc scoring

    counts = bk.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(1)).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").cast("long").alias("tt"),
        F.sum("cr").cast("long").alias("tr"),
    )
    all_buckets = docs.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("_b")
    )
    model = (
        all_buckets.join(F.broadcast(counts), "_b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.round(
                F.log(
                    (
                        (F.coalesce("ct", F.lit(0)) + F.lit(1)).cast("double")
                        * (F.col("tr") + F.lit(n_buckets))
                    )
                    / (
                        (F.coalesce("cr", F.lit(0)) + F.lit(1)).cast("double")
                        * (F.col("tt") + F.lit(n_buckets))
                    )
                )
                * LR_SCALE
            )
            .cast("long")
            .alias("lr_fp"),
        )
    )
    docb = bk.groupBy("_id", "_b").agg(F.count(F.lit(1)).alias("_c"))
    return (
        docb.join(F.broadcast(model), "_b")
        .groupBy("_id")
        .agg(
            F.sum("_c").cast("long").alias("n_feat"),
            F.sum(F.col("_c") * F.col("lr_fp")).cast("long").alias(
                "logweight_fp"
            ),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_feat",
            "logweight_fp",
            (F.col("logweight_fp") > 0).alias("selected"),
        )
    )
