"""Round-7 drift-family operators: embedding-centroid drift and
per-key (stratified) quantile summaries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_centroid_drift_identical_sides_is_zero(spark):
    """old == new -> cosine 1, norm ratio 1, drift 0 for every group."""
    from pos_data_insertion_etl_spark.operators.drift import (
        embedding_centroid_drift,
    )

    emb = load_table(spark, SF, "embeddings")
    rows = embedding_centroid_drift(emb, emb, "label", "embedding").collect()
    assert rows
    for r in rows:
        assert r.centroid_cos == 1.0 and r.drift == 0.0
        assert r.norm_ratio == 1.0
        assert r.n_old == r.n_new > 0


def test_centroid_drift_hand_vectors(spark):
    """Hand-checkable geometry: orthogonal centroids -> cos 0; a
    doubled centroid -> norm_ratio 2; one-sided groups -> NULL cosine
    with counts kept."""
    from pos_data_insertion_etl_spark.operators.drift import (
        embedding_centroid_drift,
    )

    old = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]),
            ("b", [1.0, 0.0]),
            ("only_old", [1.0, 1.0]),
        ],
        "g string, v array<double>",
    )
    new = spark.createDataFrame(
        [
            ("a", [0.0, 1.0]),     # orthogonal to old centroid
            ("b", [2.0, 0.0]),     # same direction, doubled magnitude
            ("only_new", [1.0, 1.0]),
        ],
        "g string, v array<double>",
    )
    got = {
        r.group: r
        for r in embedding_centroid_drift(old, new, "g", "v").collect()
    }
    assert got["a"].centroid_cos == 0.0 and got["a"].drift == 1.0
    assert got["b"].centroid_cos == 1.0
    assert abs(got["b"].norm_ratio - 2.0) < 1e-6
    assert got["only_old"].n_new == 0 and got["only_old"].centroid_cos is None
    assert got["only_new"].n_old == 0 and got["only_new"].centroid_cos is None


def test_centroid_drift_matches_numpy(spark):
    """The fixed-point centroid cosine tracks the float computation to
    quantization precision on real embeddings."""
    import numpy as np

    from pos_data_insertion_etl_spark.operators.drift import (
        embedding_centroid_drift,
    )

    emb = load_table(spark, SF, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    got = {
        r.group: r.centroid_cos
        for r in embedding_centroid_drift(
            old, new, "label", "embedding"
        ).collect()
    }
    raw = emb.select("vec_id", "label", "embedding").collect()
    by = {}
    for r in raw:
        by.setdefault((r.label, r.vec_id % 2), []).append(
            np.asarray(r.embedding, dtype=np.float64)
        )
    for label in {r.label for r in raw}:
        o = np.mean(by.get((label, 0), [np.zeros(1)]), axis=0)
        n = np.mean(by.get((label, 1), [np.zeros(1)]), axis=0)
        want = float(
            o @ n / (math.sqrt(o @ o) * math.sqrt(n @ n))
        )
        assert abs(got[label] - want) < 1e-5, label


def test_grouped_quantile_summary_contracts(spark):
    """Per-key summaries: <= k rows per key, weights sum to the key's
    row count, kept values are real data values, and the certified
    rank bound holds for the per-key median estimate."""
    from pos_data_insertion_etl_spark.operators.quantiles import (
        grouped_quantile_summary,
    )

    docs = load_table(spark, SF, "documents").select(
        "source", F.col("n_chars").cast("double").alias("v")
    )
    k = 4
    gs = grouped_quantile_summary(docs, "source", "v", k=k).collect()
    raw = docs.collect()
    vals_by_key: dict = {}
    for r in raw:
        vals_by_key.setdefault(r.source, []).append(r.v)
    by_key: dict = {}
    for r in gs:
        by_key.setdefault(r.key, []).append(r)
    assert set(by_key) == set(vals_by_key)
    for key, rows in by_key.items():
        vals = sorted(vals_by_key[key])
        assert len(rows) <= k + 1  # k blocks + possible partial tail
        assert sum(r.weight for r in rows) == len(vals)
        assert all(r.value in vals for r in rows)
        bound = rows[0].err
        # median estimate rank check (tie-aware)
        pairs = sorted((r.value, r.weight) for r in rows)
        total = len(vals)
        cum = 0
        est = pairs[-1][0]
        for v, w in pairs:
            cum += w
            if cum >= 0.5 * total:
                est = v
                break
        lo = sum(1 for x in vals if x < est)
        hi = sum(1 for x in vals if x <= est)
        maxw = max(r.weight for r in rows)
        assert lo - bound - 2 * maxw <= 0.5 * total <= hi + bound + 2 * maxw


def test_grouped_quantile_summary_is_batching_invariant(spark):
    """groupBy collapses each key to one Arrow group, so the summary
    is identical under any input partitioning."""
    from pos_data_insertion_etl_spark.operators.quantiles import (
        grouped_quantile_summary,
    )

    docs = load_table(spark, SF, "documents").select(
        "source", F.col("n_chars").cast("double").alias("v")
    )
    a = sorted(
        map(tuple, grouped_quantile_summary(docs, "source", "v", k=4).collect())
    )
    b = sorted(
        map(
            tuple,
            grouped_quantile_summary(
                docs.repartition(17), "source", "v", k=4
            ).collect(),
        )
    )
    assert a == b


def test_duplicate_spans_hand_case(spark):
    """Hand-built corpus: a 7-token phrase shared by two docs yields
    one merged span covering it in each (three overlapping dup 5-grams
    -> one island); a doc with no repeated 5-gram yields nothing; an
    in-document repeat counts as duplication too."""
    from pos_data_insertion_etl_spark.operators.dedup import (
        duplicate_spans,
    )

    shared = "the quick brown fox jumps over fences"
    df = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail one"),
            (2, f"{shared} closing remark entirely different"),
            (3, "no duplication at all in this document text"),
            # 5-gram 'a b c d e' occurs twice INSIDE one doc
            (4, "a b c d e x y a b c d e"),
        ],
        "doc_id long, text string",
    )
    rows = duplicate_spans(df, n=5, text_col="text", id_col="doc_id")
    by_doc: dict = {}
    for r in rows.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc
    # doc 1: shared phrase at tokens 4..10 (1-based)
    (s1,) = by_doc[1]
    assert (s1.span_start, s1.span_end, s1.span_tokens) == (4, 10, 7)
    # doc 2: shared phrase at tokens 1..7
    (s2,) = by_doc[2]
    assert (s2.span_start, s2.span_end, s2.span_tokens) == (1, 7, 7)
    # doc 4: both occurrences of the repeated 5-gram are reported;
    # positions 1..5 and 8..12 do not overlap -> two islands
    spans4 = sorted((r.span_start, r.span_end) for r in by_doc[4])
    assert spans4 == [(1, 5), (8, 12)]
    # spans never exceed the document
    for r in rows.collect():
        assert 1 <= r.span_start <= r.span_end <= r.n_tokens


def test_contamination_spans_hand_case(spark):
    """A training doc containing a benchmark phrase gets exactly the
    phrase span cut; clean docs yield nothing; benchmark docs are not
    scanned as training input."""
    from pos_data_insertion_etl_spark.operators.dedup import (
        contamination_spans,
    )

    phrase = "what is the capital of france answer paris"  # 8 tokens
    bench = spark.createDataFrame(
        [(100, phrase)], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, f"leading context {phrase} trailing words"),
            (2, "completely clean document with no benchmark overlap"),
        ],
        "doc_id long, text string",
    )
    rows = contamination_spans(train, bench, n=5).collect()
    assert {r.doc_id for r in rows} == {1}
    (s,) = rows
    # phrase occupies tokens 3..10 of doc 1 (1-based)
    assert (s.span_start, s.span_end, s.span_tokens) == (3, 10, 8)


def test_apply_span_cuts_hand_case(spark):
    """Cut application: spanned tokens vanish, clean docs pass through
    byte-identical, a fully-covered doc becomes empty text with full
    removal accounting."""
    from pos_data_insertion_etl_spark.operators.dedup import (
        apply_span_cuts,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "keep everything here"),
            (3, "x y z"),
        ],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 3, 5), (1, 7, 8), (3, 1, 3)],
        "doc_id long, span_start long, span_end long",
    )
    got = {
        r.doc_id: r for r in apply_span_cuts(docs, spans).collect()
    }
    assert got[1].clean_text == "a b f"
    assert (got[1].n_tokens, got[1].n_removed) == (8, 5)
    assert got[2].clean_text == "keep everything here"
    assert got[2].n_removed == 0
    assert got[3].clean_text == "" and got[3].n_removed == 3
