"""BM25 retrieval scoring + reciprocal-rank fusion, engine-portable.

The retrieval leg of the text stack: q81's tf-idf ranks terms WITHIN a
document; BM25 ranks DOCUMENTS for a query, which is what
dedup-against-eval-sets, RAG indexing, and query-based corpus audits
actually run. Classic BM25 (k1=1.2, b=0.75) is float-laden; this
implementation is exact-integer by construction so a SQL oracle
replays it bit-for-bit:

* k1 and b enter as the rationals 6/5 and 3/4; with avgdl truncated to
  an integer (avgdl = T div N), each term's score becomes the integer
  rational  idf_fp * 44 * tf * avgdl  /  (20*avgdl*tf + 6*avgdl + 18*dl)
  evaluated with ONE floor division per term (resolution ~1e-6 of the
  idf scale), then summed exactly over query terms.
* idf_fp = (N * 1e6) div df -- q81's rational-idf convention (a log
  would hit cross-engine libm ulp differences).
* Numerators stay under 2^63 while N * tf * 44e6 * avgdl < 2^63 --
  comfortably past 1e9 docs at tf <= 1e3; lift the operands to
  DECIMAL(38,0) beyond that.

Scale shape: query terms broadcast (a query workload is KB-sized);
matched-term tf is one (doc, term) groupBy over the filtered token
stream; dl/N/T are one full-corpus groupBy + two broadcast scalars;
per-query top-k is a rank window partitioned by query over the
already-aggregated score table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import tokens

IDF_SCALE = 1_000_000
RRF_SCALE = 1_000_000


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k documents per query under exact-integer BM25.

    `query_terms`: (query_id, term) rows, lowercase. Output:
    [query_id, doc_id, score_fp, rank] ordered by
    (score_fp DESC, doc_id) within each query.
    """
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"),
    )
    lengths = (
        toks.groupBy("_doc")
        .agg(F.count(F.lit(1)).alias("dl"))
        .localCheckpoint(eager=False)
    )  # doc-count-sized; feeds the corpus scalars AND the per-term
    #    join, saving one full corpus re-tokenization
    corpus = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("t_total"),
    ).select(
        "n_docs",
        "t_total",
        F.expr("t_total div n_docs").alias("avgdl"),
    )
    terms = query_terms.select(
        F.col("query_id"), F.col("term").alias("_w")
    )
    tf = (
        toks.join(F.broadcast(terms.select("_w").distinct()), "_w")
        .groupBy("_doc", "_w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )  # matched-term counts feed df_ AND the scoring join: one
    #    corpus tokenization instead of two
    df_ = tf.groupBy("_w").agg(F.count(F.lit(1)).alias("df"))
    scored_terms = (
        tf.join(F.broadcast(df_), "_w")
        .join(lengths, "_doc")
        .crossJoin(F.broadcast(corpus))
        .select(
            "_w",
            "_doc",
            F.expr(
                f"(((n_docs * {IDF_SCALE}) div df) * 44 * tf * avgdl)"
                " div (20 * avgdl * tf + 6 * avgdl + 18 * dl)"
            ).alias("s_fp"),
        )
    )
    per_query = (
        scored_terms.join(F.broadcast(terms), "_w")
        .groupBy("query_id", "_doc")
        .agg(F.sum("s_fp").cast("long").alias("score_fp"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score_fp"), "_doc")
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("_doc").alias("doc_id"), "score_fp", "rank"
        )
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 10, c: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists: score =
    sum over rankings of (RRF_SCALE div (c + rank)) -- exact integers,
    the standard c=60. Each input needs [query_id, doc_id, rank].

    Output: [query_id, doc_id, rrf_fp, n_lists, rank] re-ranked by
    (rrf_fp DESC, doc_id) and cut to top-k per query.

    Scale: inputs are already per-query top-k (driver-bounded); the
    fuse is one union + one (query, doc) groupBy + one rank window.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    parts = [r.select("query_id", "doc_id", "rank") for r in rankings]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy("query_id", "doc_id").agg(
        F.sum(F.expr(f"{RRF_SCALE} div ({c} + rank)"))
        .cast("long")
        .alias("rrf_fp"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rrf_fp"), "doc_id")
    return fused.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)
