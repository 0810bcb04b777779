"""Round-5 library operators (register in the query inventory next
round -- the driver's 50-entry evidence window is exactly full this
round, COVERAGE.md "Window capacity note"): Gopher-style quality rules,
unigram-LM cross-entropy scoring, and product-quantization ANN. The
first two hash-match a DuckDB oracle here with the same
oracle_harness.compare the driver methodology uses; PQ search is
approximate by design, so (like q58/q124) its encode stage is
oracle-checked and its search stage carries structural + recall-floor
invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.catalog import load_table
from pos_data_insertion_etl_spark.operators.lm_score import (
    unigram_lm_scores,
)
from pos_data_insertion_etl_spark.operators.quality import (
    gopher_quality_flags,
)
from pos_data_insertion_etl_spark.operators.similarity import (
    cosine_topk,
    pq_codebook,
    pq_encode,
    pq_topk,
)

from .oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


GOPHER_ORACLE = """
WITH base AS (
  SELECT doc_id,
         regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS t,
         string_split_regex(
             regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS words,
         string_split(text, chr(10)) AS lines
  FROM documents
), probed AS (
  SELECT *,
         list_transform(words,
             x -> regexp_replace(lower(x),
                  '^[!-/:-@\\[-`{-~]+|[!-/:-@\\[-`{-~]+$', '', 'g'))
             AS pwords
  FROM base
), m AS (
  SELECT doc_id,
         CASE WHEN t = '' THEN 0 ELSE len(words) END AS n_words,
         length(regexp_replace(t, '\\s+', '', 'g')) AS n_word_chars,
         len(list_filter(pwords, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(lines) AS n_lines,
         len(list_filter(lines,
             x -> substr(trim(x), 1, 2) IN ('- ', '* ', '• '))) AS n_bullet,
         len(list_filter(lines, x -> rtrim(x) LIKE '%...')) AS n_ellipsis,
         (length(t) - length(replace(t, '#', '')))
           + (length(t) - length(replace(t, '…', ''))) AS n_symbols,
         (CASE WHEN list_contains(pwords, 'the') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'be') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'to') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'of') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'and') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'that') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'have') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(pwords, 'with') THEN 1 ELSE 0 END
         ) AS stop_hits
  FROM probed
), r AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words > 0
              THEN ROUND(CAST(n_word_chars AS DOUBLE) / n_words, 6) END
             AS mean_word_len,
         CASE WHEN n_words > 0
              THEN ROUND(CAST(n_symbols AS DOUBLE) / n_words, 6) END
             AS symbol_word_ratio,
         CASE WHEN n_lines > 0
              THEN ROUND(CAST(n_bullet AS DOUBLE) / n_lines, 6) END
             AS bullet_line_frac,
         CASE WHEN n_lines > 0
              THEN ROUND(CAST(n_ellipsis AS DOUBLE) / n_lines, 6) END
             AS ellipsis_line_frac,
         CASE WHEN n_words > 0
              THEN ROUND(CAST(n_alpha AS DOUBLE) / n_words, 6) END
             AS alpha_word_frac,
         CAST(stop_hits AS BIGINT) AS stopword_hits
  FROM m
)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
       stopword_hits,
       COALESCE(n_words BETWEEN 50 AND 100000, FALSE) AS flag_word_count,
       COALESCE(mean_word_len BETWEEN 3.0 AND 10.0, FALSE) AS flag_mean_word_len,
       COALESCE(symbol_word_ratio < 0.1, FALSE) AS flag_symbol_ratio,
       COALESCE(bullet_line_frac <= 0.9, FALSE) AS flag_bullet_lines,
       COALESCE(ellipsis_line_frac <= 0.3, FALSE) AS flag_ellipsis_lines,
       COALESCE(alpha_word_frac >= 0.8, FALSE) AS flag_alpha_words,
       COALESCE(stopword_hits >= 2, FALSE) AS flag_stopwords,
       (COALESCE(n_words BETWEEN 50 AND 100000, FALSE)
        AND COALESCE(mean_word_len BETWEEN 3.0 AND 10.0, FALSE)
        AND COALESCE(symbol_word_ratio < 0.1, FALSE)
        AND COALESCE(bullet_line_frac <= 0.9, FALSE)
        AND COALESCE(ellipsis_line_frac <= 0.3, FALSE)
        AND COALESCE(alpha_word_frac >= 0.8, FALSE)
        AND COALESCE(stopword_hits >= 2, FALSE)) AS gopher_pass
FROM r
"""


def test_gopher_flags_match_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    ok, msg = compare(gopher_quality_flags(docs), duck, GOPHER_ORACLE)
    assert ok, msg


def test_gopher_flags_degenerate_rows(spark):
    """Empty and symbol-only docs: NULL ratios, no crash, no pass."""
    rows = [(1, ""), (2, "   "), (3, "### ### ###"), (4, "- a\n- b\n- c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert got[1].n_words == 0 and got[1].mean_word_len is None
    assert not got[1].gopher_pass and not got[2].gopher_pass
    assert got[3].symbol_word_ratio == pytest.approx(3.0)
    assert not got[3].flag_symbol_ratio
    assert got[4].bullet_line_frac == 1.0 and not got[4].flag_bullet_lines


_TOPV = 20

LM_ORACLE = f"""
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
  ) WHERE rn <= {_TOPV}
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
  SELECT t.doc_id, COALESCE(m.lp_fp, o.oov_fp) AS fp
  FROM toks t LEFT JOIN model m USING (tok) CROSS JOIN oov o
), agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(fp) AS sum_fp FROM scored
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       ROUND(-CAST(sum_fp AS DOUBLE) / 1000000 / n_tokens, 6) AS cross_entropy,
       ROUND(exp(ROUND(-CAST(sum_fp AS DOUBLE) / 1000000 / n_tokens, 6)), 4)
           AS ppl_proxy
FROM agg
"""


def test_unigram_lm_scores_match_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    got = unigram_lm_scores(docs, "text", "doc_id", top_v=_TOPV)
    ok, msg = compare(got, duck, LM_ORACLE)
    assert ok, msg


def test_unigram_lm_scores_share_tokens_identical(spark, sf_dir):
    """r16: ``share_tokens=True`` materializes the exploded token table
    once for the model build and the scoring pass; the scores must be
    bit-identical to the default two-tokenize path."""
    docs = load_table(spark, sf_dir, "documents")
    base = sorted(
        map(tuple, unigram_lm_scores(docs, "text", "doc_id", top_v=_TOPV).collect())
    )
    shared = sorted(
        map(
            tuple,
            unigram_lm_scores(
                docs, "text", "doc_id", top_v=_TOPV, share_tokens=True
            ).collect(),
        )
    )
    assert base == shared


def test_unigram_lm_oov_scores_worse(spark):
    """A doc made of unseen-rare tokens must score strictly worse (higher
    cross-entropy) than one made of the corpus head."""
    common = [(i, "alpha beta alpha beta alpha") for i in range(20)]
    rows = common + [(100, "zzq qqz zqq"), (101, "alpha beta alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.cross_entropy
        for r in unigram_lm_scores(df, "text", "doc_id", top_v=2).collect()
    }
    assert got[100] > got[101]


_PQ_M = 8
_PQ_CODES = 16
_PQ_DIM = 64

PQ_ENCODE_ORACLE = f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd FROM embeddings
), q AS (
  SELECT vec_id,
         list_transform(
             vd,
             x -> CAST(ROUND(x / sqrt(list_sum(
                      list_transform(vd, y -> y * y))) * 10000000)
                  AS BIGINT)) AS v
  FROM raw
), subs AS (
  SELECT vec_id, s.i AS sub_idx,
         v[(s.i * ({_PQ_DIM} // {_PQ_M}) + 1)
           :((s.i + 1) * ({_PQ_DIM} // {_PQ_M}))] AS vsub
  FROM q CROSS JOIN (SELECT unnest(range({_PQ_M})) AS i) s
), cb AS (
  SELECT sub_idx, vec_id AS code, vsub AS csub FROM subs
  WHERE vec_id < {_PQ_CODES}
), dists AS (
  SELECT s.vec_id, s.sub_idx, c.code,
         list_sum(list_transform(
             list_zip(s.vsub, c.csub),
             p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
  FROM subs s JOIN cb c ON s.sub_idx = c.sub_idx
)
SELECT vec_id, CAST(sub_idx AS INTEGER) AS sub_idx,
       arg_min(code, dist * 256 + code) AS code
FROM dists GROUP BY vec_id, sub_idx
"""


def test_pq_encode_matches_oracle(spark, sf_dir, duck):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding", _PQ_M, _PQ_CODES, _PQ_DIM)
    got = pq_encode(emb, "vec_id", "embedding", cb, _PQ_M, _PQ_DIM)
    ok, msg = compare(got, duck, PQ_ENCODE_ORACLE)
    assert ok, msg


def test_pq_codes_selfmatch(spark, sf_dir):
    """A codeword-source vector must encode to its own code in every
    subspace (distance 0 beats everything, code tiebreak irrelevant)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding", _PQ_M, _PQ_CODES, _PQ_DIM)
    codes = pq_encode(
        emb.filter(F.col("vec_id") < _PQ_CODES),
        "vec_id",
        "embedding",
        cb,
        _PQ_M,
        _PQ_DIM,
    ).collect()
    assert len(codes) == _PQ_CODES * _PQ_M
    assert all(r.code == r.vec_id for r in codes)


def test_pq_topk_structure_and_recall(spark, sf_dir):
    """ADC top-k with a Lloyd-trained codebook: dense ranks ordered by
    distance, no self-pairs, and recall@10-vs-exact-top-3 above a floor.
    Untrained id-sampled codewords measure ~0.23 on this corpus and
    random guessing ~0.06, so the 0.4 floor pins both 'training works'
    and 'clearly better than random'."""
    emb = load_table(spark, sf_dir, "embeddings")
    pred = lambda c: c.between(100, 109)  # noqa: E731
    approx = pq_topk(
        emb, "vec_id", "embedding", pred,
        m=_PQ_M, n_codes=32, k=10, dim=_PQ_DIM, train_iters=4,
    ).collect()
    per_query: dict[int, list] = {}
    for r in approx:
        assert r.query_id != r.neighbor_id
        per_query.setdefault(r.query_id, []).append(r)
    assert set(per_query) == set(range(100, 110))
    for rs in per_query.values():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)

    exact = cosine_topk(
        emb, emb.filter(pred(F.col("vec_id"))), "vec_id", "embedding", k=3
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for qid, want in exact_sets.items():
        got = {r.neighbor_id for r in per_query.get(qid, [])}
        hits += len(want & got)
        total += len(want)
    assert total == 30
    assert hits / total >= 0.4, f"recall {hits}/{total}"


def test_curate_corpus_funnel(spark, sf_dir):
    """End-to-end curation funnel: monotone stage counts, survivors are
    a subset of the raw ids, packing is contiguous per shard, and the
    composition is deterministic across runs."""
    from pos_data_insertion_etl_spark.pipeline.curation import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    packed, funnel = curate_corpus(
        docs,
        min_words=10,
        stopwords=("the", "a"),
        min_stopword_hits=1,
        max_cross_entropy=4.0,
        pack_budget=256,
    )
    stages = {r.stage: r.n_docs for r in funnel.collect()}
    counts = [stages[k] for k in sorted(stages)]
    assert counts[0] == docs.count()
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[-1] > 0, "funnel must not collapse to empty"

    rows = packed.collect()
    assert len(rows) == counts[-1]
    per_shard: dict[int, list] = {}
    for r in rows:
        per_shard.setdefault(r.shard, []).append(r)
    for shard_rows in per_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        run = 0
        for r in shard_rows:
            assert r.pack_id == run // 256 and r.offset_in_pack == run % 256
            run += r.n_tokens

    again = {
        (r.doc_id, r.shard, r.pack_id, r.offset_in_pack)
        for r in curate_corpus(
            docs,
            min_words=10,
            stopwords=("the", "a"),
            min_stopword_hits=1,
            max_cross_entropy=4.0,
            pack_budget=256,
        )[0].collect()
    }
    assert again == {
        (r.doc_id, r.shard, r.pack_id, r.offset_in_pack) for r in rows
    }


MIXTURE_ORACLE = """
WITH base AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(text, '\\s+'),
                              x -> x != '')) AS BIGINT) AS n_tokens,
         CASE source WHEN 'src0' THEN 10000
                     WHEN 'src1' THEN 6000
                     WHEN 'src2' THEN 4000 END AS source_budget
  FROM documents
), ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
             AS sel_rank
  FROM base WHERE source_budget IS NOT NULL
), summed AS (
  SELECT *,
         SUM(n_tokens) OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM ranked
)
SELECT doc_id, source, n_tokens, sel_rank, cum_before, source_budget
FROM summed WHERE cum_before < source_budget
"""


def test_budgeted_mixture_sample_matches_oracle(spark, sf_dir, duck):
    from pos_data_insertion_etl_spark.operators.mixture import (
        budgeted_mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = budgeted_mixture_sample(
        docs, {"src0": 0.5, "src1": 0.3, "src2": 0.2}, total_tokens=20_000
    )
    ok, msg = compare(got, duck, MIXTURE_ORACLE)
    assert ok, msg


def test_budgeted_mixture_sample_size_col(spark, sf_dir):
    """size_col switches the budget unit to a precomputed column: the
    n_tokens output IS that column (no tokenization), selection order
    is unchanged, and the strict-prefix budget rule still holds -- the
    q131 certified path (regex tokenization is engine-version-sensitive
    at \\s boundaries; driver rounds 5-7)."""
    from pos_data_insertion_etl_spark.operators.mixture import (
        budgeted_mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    sel = budgeted_mixture_sample(
        docs,
        {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        total_tokens=10_000,
        size_col="n_chars",
    )
    chars = {r.doc_id: r.n_chars for r in docs.collect()}
    rows = sel.collect()
    assert rows and all(r.n_tokens == chars[r.doc_id] for r in rows)
    budgets = {"src0": 5000, "src1": 3000, "src2": 2000}
    assert {r.source for r in rows} <= set(budgets)
    for r in rows:
        assert r.source_budget == budgets[r.source]
        assert r.cum_before < r.source_budget


def test_budgeted_mixture_sample_budget_contract(spark, sf_dir):
    """Budgets fill to the strict-prefix rule: selected tokens reach at
    least the budget (unless the source ran out of documents) and
    exceed it by less than one document; unweighted sources are
    dropped; quality-first ordering selects the best scores."""
    from pos_data_insertion_etl_spark.operators.mixture import (
        budgeted_mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 0.5, "src1": 0.3}
    sel = budgeted_mixture_sample(docs, weights, total_tokens=10_000).collect()
    assert {r.source for r in sel} == set(weights)
    by_src: dict[str, list] = {}
    for r in sel:
        by_src.setdefault(r.source, []).append(r)
    avail = {
        r.source: r.n
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for src, rows in by_src.items():
        total = sum(r.n_tokens for r in rows)
        budget = rows[0].source_budget
        if len(rows) < avail[src]:  # budget was the binding constraint
            assert total >= budget
            assert total - max(r.n_tokens for r in rows) < budget

    scored = docs.withColumn("score", (F.col("doc_id") % 7).cast("double"))
    best = budgeted_mixture_sample(
        scored, {"src0": 1.0}, total_tokens=3_000, score_col="score"
    ).collect()
    picked = {r.doc_id for r in best}
    scores = {
        r.doc_id: r.score
        for r in scored.filter(F.col("source") == "src0").collect()
    }
    worst_picked = min(scores[i] for i in picked)
    best_left = max(
        (s for i, s in scores.items() if i not in picked), default=-1.0
    )
    # quality-first: no unpicked doc strictly beats a picked one
    assert best_left <= worst_picked


_TOPB = 40

BIGRAM_ORACLE = f"""
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
  SELECT prev, SUM(c) AS c_prev FROM counts GROUP BY prev
), vocab AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(a) AS tok FROM arrs)
), ctx_fp AS (
  SELECT prev, c_prev,
         CAST(ROUND(ln(1.0 / CAST(c_prev + v + 1 AS DOUBLE)) * 1000000)
              AS BIGINT) AS ctx_oov_fp
  FROM ctx, vocab
), model AS (
  SELECT prev, tok,
         CAST(ROUND(ln(CAST(c + 1 AS DOUBLE) / CAST(c_prev + v + 1 AS DOUBLE))
                    * 1000000) AS BIGINT) AS lp_fp
  FROM (
    SELECT prev, tok, c,
           ROW_NUMBER() OVER (ORDER BY c DESC, prev, tok) AS rn
    FROM counts
  ) t JOIN ctx USING (prev) CROSS JOIN vocab
  WHERE rn <= {_TOPB}
), gfp AS (
  SELECT CAST(ROUND(ln(1.0 / CAST(v + 1 AS DOUBLE)) * 1000000) AS BIGINT)
             AS global_oov_fp
  FROM vocab
), scored AS (
  SELECT b.doc_id,
         COALESCE(m.lp_fp, c.ctx_oov_fp, g.global_oov_fp) AS fp
  FROM bg b
  LEFT JOIN model m USING (prev, tok)
  LEFT JOIN ctx_fp c USING (prev)
  CROSS JOIN gfp g
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(-CAST(SUM(fp) AS DOUBLE) / 1000000 / COUNT(*), 6)
           AS cross_entropy
FROM scored GROUP BY doc_id
"""


def test_bigram_lm_scores_match_oracle(spark, sf_dir, duck):
    from pos_data_insertion_etl_spark.operators.lm_score import (
        bigram_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = bigram_lm_scores(docs, "text", "doc_id", top_b=_TOPB)
    ok, msg = compare(got, duck, BIGRAM_ORACLE)
    assert ok, msg


def test_bigram_lm_orders_scrambled_text_worse(spark):
    """Bigram (unlike unigram) cross-entropy must punish a document with
    the corpus's token FREQUENCIES but scrambled ORDER."""
    from pos_data_insertion_etl_spark.operators.lm_score import (
        bigram_lm_scores,
        unigram_lm_scores,
    )

    base = [(i, "one two three four one two three four") for i in range(20)]
    rows = base + [(100, "four one three two four two one three"),
                   (101, "one two three four one two three four")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bi = {
        r.doc_id: r.cross_entropy
        for r in bigram_lm_scores(df, "text", "doc_id", top_b=16).collect()
    }
    uni = {
        r.doc_id: r.cross_entropy
        for r in unigram_lm_scores(df, "text", "doc_id", top_v=16).collect()
    }
    assert bi[100] > bi[101], "scrambled order must score worse on bigrams"
    assert uni[100] == uni[101], "unigram is order-blind by construction"


def test_curate_corpus_plan_has_no_nested_loops(spark, sf_dir):
    """The funnel composition must stay equi-join-only end to end: a
    CartesianProduct or BroadcastNestedLoopJoin sneaking into the
    composed plan is a scale regression even if results stay right.
    (The LM stage's 1-row scalar broadcast is a BNLJ by necessity --
    assert the count stays at exactly that one.)"""
    from pos_data_insertion_etl_spark.pipeline.curation import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    packed, funnel = curate_corpus(
        docs, min_words=10, stopwords=("the", "a"), min_stopword_hits=1
    )
    for df in (packed, funnel):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # scalar OOV broadcast (unigram_lm_scores) is the only allowed
        # nested-loop site; localCheckpoint truncation means at most one
        # appearance per remaining plan
        assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:2000]


def test_incremental_exact_dedup_batches(spark):
    """Two ingest batches: within-batch repeats keep the min id, digests
    already seen drop, replay against the pre-batch table reproduces the
    same novels, replay against the post-batch table yields none."""
    from pos_data_insertion_etl_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    b1 = spark.createDataFrame(
        [(0, "aaa"), (1, "bbb"), (2, "aaa")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(3, "bbb"), (4, "ccc"), (5, "ccc"), (6, "ddd")],
        "doc_id long, text string",
    )
    novel1, seen1 = incremental_exact_dedup(b1, None, "text", "doc_id")
    assert {r.doc_id for r in novel1.collect()} == {0, 1}
    assert seen1.count() == 2

    novel2, seen2 = incremental_exact_dedup(b2, seen1, "text", "doc_id")
    assert {r.doc_id for r in novel2.collect()} == {4, 6}
    assert seen2.count() == 4

    replay_pre, _ = incremental_exact_dedup(b2, seen1, "text", "doc_id")
    assert {r.doc_id for r in replay_pre.collect()} == {4, 6}
    replay_post, _ = incremental_exact_dedup(b2, seen2, "text", "doc_id")
    assert replay_post.count() == 0


def test_incremental_neardup_filter(spark, sf_dir):
    """New docs that copy or lightly edit corpus docs drop with recorded
    provenance; genuinely new text survives; jaccard values are exact."""
    from pos_data_insertion_etl_spark.operators.dedup import (
        incremental_neardup_filter,
    )

    corpus = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    )
    rows = corpus.orderBy("doc_id").limit(2).collect()
    exact_copy = rows[0].text
    toks = rows[1].text.split()
    light_edit = " ".join(toks[:-1] + ["zzznovel"])
    fresh = " ".join(f"uniqtok{i}" for i in range(30))
    new = spark.createDataFrame(
        [(1000, exact_copy), (1001, light_edit), (1002, fresh)],
        "doc_id long, text string",
    )
    novel, matches = incremental_neardup_filter(
        new, corpus, "text", "doc_id", threshold_num=1, threshold_den=2
    )
    got_matches = {
        (r.new_id, r.corpus_id): r.jaccard for r in matches.collect()
    }
    novel_ids = {r.doc_id for r in novel.collect()}
    assert 1002 in novel_ids, "fresh text must survive"
    assert (1000, rows[0].doc_id) in got_matches, "exact copy must match"
    assert got_matches[(1000, rows[0].doc_id)] == 1.0
    assert 1000 not in novel_ids
    assert (1001, rows[1].doc_id) in got_matches, "light edit must match"
    assert 1001 not in novel_ids


GAPFILL_ORACLE = """
WITH obs AS (
  SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM orders WHERE o_custkey < 40 GROUP BY 1, 2
), bounds AS (
  SELECT k, MIN(d) AS lo, MAX(d) AS hi FROM obs GROUP BY k
), spine AS (
  SELECT k, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                        CAST(hi AS TIMESTAMP),
                                        INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), dense AS (
  SELECT s.k, s.day, o.v, o.v IS NOT NULL AS observed
  FROM spine s LEFT JOIN obs o ON o.k = s.k AND o.d = s.day
)
SELECT k AS o_custkey, day,
       last_value(v IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS o_totalprice,
       observed
FROM dense
"""


def test_gapfill_ffill_matches_oracle(spark, sf_dir, duck):
    from pos_data_insertion_etl_spark.operators.gapfill import gapfill_daily

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 40
    )
    daily = (
        orders.groupBy(
            "o_custkey", F.col("o_orderdate").cast("date").alias("day")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("o_totalprice")
        )
    )
    got = gapfill_daily(daily, "o_custkey", "day", "o_totalprice", "ffill")
    ok, msg = compare(got, duck, GAPFILL_ORACLE)
    assert ok, msg


def test_gapfill_linear_exact_values(spark):
    """Linear interpolation on a hand-built series: interior gaps take
    the exact linear value, a leading gap backfills, observed rows stay
    bit-identical, and the spine is dense per key."""
    import datetime as dt

    from pos_data_insertion_etl_spark.operators.gapfill import gapfill_daily

    d = dt.date
    rows = [
        (1, d(2024, 1, 1), 10.0),
        (1, d(2024, 1, 4), 40.0),   # gap of 2 days: expect 20, 30
        (1, d(2024, 1, 6), 50.0),   # gap of 1 day: expect 45
        (2, d(2024, 2, 10), 7.5),   # singleton key: one row, no gaps
    ]
    df = spark.createDataFrame(rows, "k long, day date, v double")
    got = {
        (r.k, r.day): (r.v, r.observed)
        for r in gapfill_daily(df, "k", "day", "v", "linear").collect()
    }
    assert got[(1, d(2024, 1, 1))] == (10.0, True)
    assert got[(1, d(2024, 1, 2))] == (20.0, False)
    assert got[(1, d(2024, 1, 3))] == (30.0, False)
    assert got[(1, d(2024, 1, 4))] == (40.0, True)
    assert got[(1, d(2024, 1, 5))] == (45.0, False)
    assert got[(1, d(2024, 1, 6))] == (50.0, True)
    assert got[(2, d(2024, 2, 10))] == (7.5, True)
    assert len(got) == 7


def test_gapfill_single_exchange(spark, sf_dir):
    """All fill windows share one (key x day) partitioning: the executed
    plan must contain exactly ONE shuffle beyond the source aggregate --
    a second Exchange between the windows is a scale regression."""
    from pos_data_insertion_etl_spark.operators.gapfill import gapfill_daily

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum("o_totalprice").alias("v"))
    )
    plan = (
        gapfill_daily(daily, "o_custkey", "day", "v", "linear")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_window_exchanges = plan.count("Exchange hashpartitioning(key")
    assert n_window_exchanges <= 1, plan[:3000]


def _pagerank_reference(edges, iters=10, dn=85, dd=100, scale=10**9):
    """Same integer arithmetic as operators.graph.pagerank, in plain
    Python -- an independent implementation of the identical spec."""
    sym = sorted(set(edges))
    nodes = sorted({n for e in sym for n in e})
    out = {n: 0 for n in nodes}
    for s, _ in sym:
        out[s] += 1
    n = len(nodes)
    teleport = (dd - dn) * scale // dd
    rank = {v: scale for v in nodes}
    for _ in range(iters):
        contrib = {
            v: (rank[v] // out[v] if out[v] else 0) for v in nodes
        }
        kept = {v: rank[v] - out[v] * contrib[v] for v in nodes}
        inflow = {v: 0 for v in nodes}
        for s, d in sym:
            inflow[d] += contrib[s]
        rank = {
            v: teleport + ((kept[v] + inflow[v]) * dn) // dd for v in nodes
        }
    return rank


def test_pagerank_matches_integer_reference(spark):
    """Bit-exact agreement with the pure-Python integer reference on a
    graph with a hub, a chain, a dangling node, and a cycle."""
    from pos_data_insertion_etl_spark.operators.graph import pagerank

    edges = [
        (1, 2), (1, 3), (1, 4),        # hub out
        (2, 1), (3, 1),                # back-links
        (4, 5), (5, 6),                # chain into...
        (6, 7),                        # ...a dangling node 7
        (8, 9), (9, 10), (10, 8),      # separate cycle
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_fp for r in pagerank(df, iters=10).collect()}
    exp = _pagerank_reference(edges, iters=10)
    assert got == exp


def test_pagerank_invariants(spark):
    """Hub beats leaf; total mass drifts by less than iters units per
    node (integer-div truncation bound); repeat run is bit-identical."""
    from pos_data_insertion_etl_spark.operators.graph import (
        PR_SCALE,
        pagerank,
    )

    edges = [(i, 0) for i in range(1, 30)] + [(0, 1), (5, 6), (6, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    iters = 10
    r1 = {r.node: r.rank_fp for r in pagerank(df, iters=iters).collect()}
    assert r1[0] > r1[2], "hub must outrank a pure leaf"
    n = len(r1)
    total = sum(r1.values())
    # teleport constant is itself div-truncated; allow 1 unit for it too
    drift = abs(total - n * PR_SCALE)
    assert drift <= iters * n * 2, (total, n * PR_SCALE, drift)
    r2 = {r.node: r.rank_fp for r in pagerank(df, iters=iters).collect()}
    assert r1 == r2


def test_pca_matches_numpy_and_invariants(spark, sf_dir):
    """The distributed Gram bit-matches numpy's on the quantized grid;
    components are orthonormal with descending variance; projection
    matches a numpy projection; repeat runs are identical (partition-
    independence of the integer Gram)."""
    import numpy as np

    from pos_data_insertion_etl_spark.operators.pca import (
        GRAM_SCALE,
        gram_matrix,
        pca_components,
        pca_project,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    x = np.rint(
        np.asarray([r.embedding for r in rows], dtype=np.float64) * GRAM_SCALE
    ).astype(np.int64)

    g = gram_matrix(emb, "embedding", 64)
    g_np = (x.T @ x).tolist()
    assert g == g_np, "distributed integer Gram must equal numpy's"
    g2 = gram_matrix(emb.repartition(13), "embedding", 64)
    assert g2 == g_np, "Gram must be partitioning-independent"

    comps, var = pca_components(emb, "embedding", dim=64, k=8)
    c = np.asarray(comps)
    assert np.allclose(c @ c.T, np.eye(8), atol=1e-4), "orthonormal"
    assert all(a >= b for a, b in zip(var, var[1:])), "descending variance"
    assert all(v > 0 for v in var)

    proj = pca_project(emb, "embedding", comps).orderBy("vec_id").collect()
    exp = np.asarray([r.embedding for r in rows], dtype=np.float64) @ c.T
    got = np.asarray([r.pca for r in proj])
    assert got.shape == (len(rows), 8)
    assert np.allclose(got, exp, atol=2e-6)

    # variance captured by top-8 must dominate an arbitrary later axis
    _, var16 = pca_components(emb, "embedding", dim=64, k=16)
    assert sum(var[:8]) >= sum(var16[8:16])


def test_pca_projected_ann_recall_grows_with_k(spark, sf_dir):
    """Composition check: brute-force cosine in PCA space. The fixture
    embeddings are near-isotropic (top-8 axes explain only ~20% of
    variance), so small-k recall is honestly weak -- the pinned
    contract is the MECHANISM: recall grows with k and beats random
    (~0.06) clearly at k=24 (~52% variance explained)."""
    from pos_data_insertion_etl_spark.operators.pca import (
        pca_components,
        pca_project,
    )
    from pos_data_insertion_etl_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(
        emb, emb.filter(F.col("vec_id").between(100, 109)),
        "vec_id", "embedding", k=3,
    ).collect()
    want: dict[int, set] = {}
    for r in exact:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall_at(k):
        comps, _ = pca_components(emb, "embedding", dim=64, k=k)
        proj = pca_project(emb, "embedding", comps).select(
            "vec_id", F.col("pca").cast("array<float>").alias("pvec")
        )
        approx = cosine_topk(
            proj, proj.filter(F.col("vec_id").between(100, 109)),
            "vec_id", "pvec", k=10,
        ).collect()
        got: dict[int, set] = {}
        for r in approx:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(w & got.get(q, set())) for q, w in want.items())
        return hits / sum(len(w) for w in want.values())

    r8, r24 = recall_at(8), recall_at(24)
    assert r24 >= r8, (r8, r24)
    assert r24 >= 0.3, r24


def test_bpe_train_and_encode(spark):
    """BPE mechanics on a hand-checkable corpus: the first merges are
    the hand-computed most-frequent pairs; token concatenation
    round-trips every word; more merges never increase the token count;
    repeated runs are identical."""
    from pos_data_insertion_etl_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    rows = [(i, "low low low lower lowest") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    merges = bpe_train(df, "text", n_merges=6)
    # 'l','o' co-occur in every word (50 occurrences) -- must merge
    # first; then ('lo','w') (50) dominates everything else.
    assert merges[0] == ("l", "o"), merges
    assert merges[1] == ("lo", "w"), merges
    assert merges == bpe_train(df, "text", n_merges=6)

    enc = {r.doc_id: r for r in bpe_encode(df, "text", "doc_id", merges).collect()}
    r0 = enc[0]
    assert r0.n_words == 5
    # round-trip: tokens concatenated == words + terminators
    joined = "".join(r0.tokens).replace("</w>", " ").strip()
    assert joined == "low low low lower lowest"

    fewer = bpe_encode(df, "text", "doc_id", merges[:2]).collect()[0]
    assert fewer.n_bpe_tokens >= r0.n_bpe_tokens
    none = bpe_encode(df, "text", "doc_id", []).collect()[0]
    # zero merges => chars + one </w> per word
    assert none.n_bpe_tokens == sum(len(w) + 1 for w in "low low low lower lowest".split())


def test_bpe_corpus_compression(spark, sf_dir):
    """On the fixture corpus, 120 learned merges must cut the corpus
    to less than half its character-level token count (the corpus has
    ~31 distinct words of ~4.5 chars, so ~140 merges would capture
    every word whole; 120 gets most of the mass)."""
    from pos_data_insertion_etl_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    merges = bpe_train(docs, "text", n_merges=120)
    # training stops early when every vocab word is a single symbol --
    # the strongest possible outcome on this small vocabulary
    exhausted = len(merges) < 120
    enc = bpe_encode(docs, "text", "doc_id", merges)
    agg = enc.agg(
        F.sum("n_bpe_tokens").alias("toks"),
        F.sum("n_words").alias("words"),
    ).collect()[0]
    chars = docs.agg(
        F.sum(F.length(F.regexp_replace(F.col("text"), r"\s+", ""))).alias("c")
    ).collect()[0].c
    char_level = chars + agg.words  # chars + one </w> per word
    assert agg.toks < char_level * 0.5, (agg.toks, char_level)
    assert agg.toks >= agg.words  # cannot go below one token per word
    if exhausted:
        # fully merged vocabulary => exactly one token per word
        assert agg.toks == agg.words, (agg.toks, agg.words)


def test_heavy_hitters_guarantees(spark, sf_dir):
    """Misra-Gries certificates against exact counts, with k chosen
    SMALLER than the vocabulary so decrements actually occur: every
    value above n/(k+1) is present; count_lb <= exact <= count_lb +
    max_err for every reported value; exact_recount returns true
    counts."""
    from pos_data_insertion_etl_spark.operators.heavyhitters import (
        heavy_hitters,
    )

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "tok"
            )
        )
        .filter(F.col("tok") != "")
    )
    exact = {
        r.tok: r.c
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    k = 5
    assert len(exact) > k, "fixture must exercise decrements"

    got = {r.value: r for r in heavy_hitters(toks, "tok", k=k).collect()}
    assert got, "summary must not be empty"
    threshold = n / (k + 1)
    for v, c in exact.items():
        if c > threshold:
            assert v in got, f"{v} (count {c} > {threshold}) missing"
    for v, r in got.items():
        assert r.count_lb <= exact[v] <= r.count_lb + r.max_err, (
            v, r.count_lb, exact[v], r.max_err,
        )

    recounted = {
        r.value: r.count_exact
        for r in heavy_hitters(toks, "tok", k=k, exact_recount=True).collect()
    }
    for v, c in recounted.items():
        assert c == exact[v]


def test_countmin_sketch_bounds(spark, sf_dir):
    """Count-Min certificates against exact token counts: estimates
    never under-count, over-count stays within the 2n/width analysis
    bound for every queried value, the sketch is partitioning-
    independent (bit-identical after repartition), and element-wise
    addition merges two disjoint halves into the whole."""
    from pos_data_insertion_etl_spark.operators.heavyhitters import (
        countmin_estimate,
        countmin_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "tok"
        ),
    ).filter(F.col("tok") != "")
    exact = {
        r.tok: r.c
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(exact.values())
    width, depth = 256, 4

    sk = countmin_sketch(toks, "tok", width=width, depth=depth)
    assert countmin_sketch(toks.repartition(7), "tok", width=width, depth=depth) == sk

    bound = 2 * n / width
    for v, c in exact.items():
        est = countmin_estimate(sk, v)
        assert est >= c, (v, est, c)
        assert est - c <= bound, (v, est, c, bound)

    half_a = countmin_sketch(
        toks.filter(F.col("doc_id") % 2 == 0), "tok", width=width, depth=depth
    )
    half_b = countmin_sketch(
        toks.filter(F.col("doc_id") % 2 == 1), "tok", width=width, depth=depth
    )
    merged = [
        [a + b for a, b in zip(ra, rb)] for ra, rb in zip(half_a, half_b)
    ]
    assert merged == sk


def _simhash_pairs_oracle(max_hamming: int, n_chunks: int) -> str:
    hexhi = "'8','9','a','b','c','d','e','f'"
    sums = ",\n         ".join(
        f"SUM(CASE WHEN substr(md5(tok), {j + 1}, 1) IN ({hexhi})"
        f" THEN 1 ELSE -1 END) AS s{j:02d}"
        for j in range(16)
    )
    bits = " || ".join(
        f"(CASE WHEN s{j:02d} >= 0 THEN '1' ELSE '0' END)" for j in range(16)
    )
    width = 16 // n_chunks
    chunk_match = " OR ".join(
        f"substr(a.simhash, {i * width + 1}, {width})"
        f" = substr(b.simhash, {i * width + 1}, {width})"
        for i in range(n_chunks)
    )
    ham = " + ".join(
        f"(CASE WHEN substr(a.simhash, {j + 1}, 1)"
        f" != substr(b.simhash, {j + 1}, 1) THEN 1 ELSE 0 END)"
        for j in range(16)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
  FROM documents
), sums AS (
  SELECT doc_id, {sums} FROM toks GROUP BY doc_id
), sh AS (
  SELECT doc_id, {bits} AS simhash FROM sums
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST({ham} AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND ({chunk_match})
WHERE {ham} <= {max_hamming}
"""


def test_simhash_hamming_pairs_match_oracle(spark, sf_dir, duck):
    """Pigeonhole-banded SimHash pairs hash-match a DuckDB oracle that
    computes the same chunk-agreement candidates + exact hamming."""
    from pos_data_insertion_etl_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = simhash_hamming_pairs(docs, "text", "doc_id", max_hamming=3)
    ok, msg = compare(got, duck, _simhash_pairs_oracle(3, 4))
    assert ok, msg


def test_simhash_hamming_pigeonhole_complete(spark, sf_dir, duck):
    """Soundness of the banding itself: the banded pair set must equal
    the ALL-PAIRS set filtered to hamming <= max_hamming (pigeonhole
    guarantees no candidate above the chunk count is missed)."""
    from pos_data_insertion_etl_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(
            docs, "text", "doc_id", max_hamming=3
        ).collect()
    }
    # brute force over the collected simhashes
    from pos_data_insertion_etl_spark.operators.dedup import simhash16

    hashes = {
        r.doc_id: r.simhash
        for r in simhash16(docs, "text", "doc_id").collect()
    }
    ids = sorted(hashes)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(x != y for x, y in zip(hashes[a], hashes[b]))
            if h <= 3:
                brute.add((a, b, h))
    assert banded == brute


WSAMPLE_ORACLE = """
WITH hexed AS (
  SELECT doc_id, source, n_chars,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS h
  FROM documents
), keyed AS (
  -- 13 hex digits decode exactly in a double (< 2^52)
  SELECT doc_id, source, n_chars,
         ROUND(ln((list_sum(list_transform(range(13),
                    i -> (strpos('0123456789abcdef', substr(h, i + 1, 1)) - 1)
                         * power(16, 12 - i)))
                   / 4503599627370496.0) + 1e-300)
               / CAST(n_chars AS DOUBLE), 9) AS es_key
  FROM hexed
)
SELECT doc_id, source, n_chars, es_key,
       CAST(rk AS BIGINT) AS sample_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY es_key DESC, doc_id) AS rk
  FROM keyed
) t WHERE rk <= 10
"""


def test_weighted_sample_matches_oracle(spark, sf_dir, duck):
    """A-ES keys and per-stratum ranks hash-match DuckDB (the same
    hashed-uniform -> ln(u)/w -> round construction both sides)."""
    from pos_data_insertion_etl_spark.operators.mixture import (
        weighted_sample_without_replacement,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    got = weighted_sample_without_replacement(
        docs, "n_chars", k=10, stratum_col="source"
    )
    ok, msg = compare(got, duck, WSAMPLE_ORACLE)
    assert ok, msg


def test_weighted_sample_prefers_heavy_items(spark):
    """Statistical sanity: across many disjoint strata, items with 10x
    the weight must win the single sample slot far more often (the A-ES
    inclusion-probability property, checked deterministically over the
    fixed hash universe rather than with an RNG)."""
    from pos_data_insertion_etl_spark.operators.mixture import (
        weighted_sample_without_replacement,
    )

    rows = []
    for s in range(300):
        rows.append((s * 2, s, 10.0))     # heavy item in stratum s
        rows.append((s * 2 + 1, s, 1.0))  # light item
    df = spark.createDataFrame(rows, "doc_id long, stratum long, w double")
    picked = weighted_sample_without_replacement(
        df, "w", k=1, stratum_col="stratum"
    ).collect()
    assert len(picked) == 300
    heavy_wins = sum(1 for r in picked if r.doc_id % 2 == 0)
    # E[heavy win] = 10/11 ~ 0.91; the fixed hash universe should land
    # well above a coin flip
    assert heavy_wins >= 240, heavy_wins


def test_bloom_no_false_negatives_and_bounded_fpr(spark, sf_dir):
    """Every benchmark shingle must hit its own filter (zero false
    negatives -- the decontamination guarantee); non-member probe
    strings stay under a loose false-positive ceiling; the filter is
    deterministic across builds."""
    from pos_data_insertion_etl_spark.operators.bloom import (
        bloom_contains,
        build_bloom,
    )
    from pos_data_insertion_etl_spark.operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sh = doc_shingles(docs, "text", "doc_id").select("shingle").distinct()
    n = sh.count()
    m = n * 10
    words = build_bloom(sh, "shingle", m)
    assert words == build_bloom(sh, "shingle", m)

    hits = sh.withColumn(
        "h", bloom_contains(words, F.col("shingle"), m)
    )
    assert hits.filter(~F.col("h")).count() == 0, "false negative!"

    probes = spark.range(2000).select(
        F.concat(F.lit("definitely-not-a-shingle-"), F.col("id")).alias("v")
    )
    fp = probes.withColumn(
        "h", bloom_contains(words, F.col("v"), m)
    ).filter(F.col("h")).count()
    assert fp / 2000 < 0.05, fp  # designed ~1%, ceiling 5%


def test_bloom_contamination_superset_of_exact(spark, sf_dir):
    """The Bloom hit fraction must dominate the exact overlap fraction
    for every document (upper bound), match it exactly for a document
    that IS a benchmark document (hit_frac 1.0), and flag nothing the
    exact check would flag that the bloom misses."""
    from pos_data_insertion_etl_spark.operators.bloom import (
        bloom_contamination_report,
    )
    from pos_data_insertion_etl_spark.operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 120
    )
    benchmark = docs.filter(F.col("doc_id") < 10)

    got = {
        r.doc_id: r
        for r in bloom_contamination_report(docs, benchmark).collect()
    }
    bench_sh = {
        r.shingle
        for r in doc_shingles(benchmark, "text", "doc_id")
        .select("shingle")
        .collect()
    }
    doc_sh: dict[int, set] = {}
    for r in doc_shingles(docs, "text", "doc_id").collect():
        doc_sh.setdefault(r.doc_id, set()).add(r.shingle)

    for doc_id, shs in doc_sh.items():
        exact_frac = len(shs & bench_sh) / len(shs)
        r = got[doc_id]
        assert r.hit_frac >= round(exact_frac, 6) - 1e-9, (
            doc_id, r.hit_frac, exact_frac,
        )
    for doc_id in range(10):
        if doc_id in got:
            assert got[doc_id].hit_frac == 1.0


def test_normalize_text_canonicalizes_for_dedup(spark, duck):
    """Documents that differ only in zero-width characters, typographic
    quotes/dashes, NBSP, or whitespace runs must normalize to the SAME
    string -- so exact dedup then collapses them to one keeper -- while
    already-clean text passes through untouched."""
    from pos_data_insertion_etl_spark.operators.dedup import exact_dedup
    from pos_data_insertion_etl_spark.operators.quality import normalize_text

    clean = 'say "hello" - it\'s fine'
    variants = [
        (1, 'say “hello” – it’s fine'),
        (2, 'say "hello" -  it’s​ fine'),
        (3, '  say  "hello" - it\'s fine⁠ '),
        (4, clean),
        (5, "completely different"),
    ]
    df = spark.createDataFrame(variants, "doc_id long, text string")
    norm = df.withColumn("text", normalize_text(F.col("text")))
    got = {r.doc_id: r.text for r in norm.collect()}
    assert all(got[i] == clean for i in (1, 2, 3, 4)), got
    assert got[5] == "completely different"
    kept = exact_dedup(norm, "text", "doc_id").collect()
    assert sorted(r.keeper_id for r in kept) == [1, 5]
    assert {r.keeper_id: r.n_copies for r in kept}[1] == 4


def test_content_defined_chunks_shift_resistant(spark, sf_dir):
    """The CDC property fixed-size chunking lacks: prepending tokens to
    a document leaves every chunk after the first content-defined
    boundary IDENTICAL, chunks reassemble to the exact token stream,
    boundary spacing respects min_len, and chunking is deterministic."""
    from pos_data_insertion_etl_spark.operators.dedup import (
        content_defined_chunks,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    )
    kw = dict(window=4, boundary_mod=8, min_len=4)
    chunks = content_defined_chunks(docs, "text", "doc_id", **kw).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        rebuilt = " ".join(r.chunk_text for r in rs)
        assert rebuilt == " ".join(texts[doc_id].split())
        for r in rs[:-1]:  # all but the final partial chunk
            assert r.n_tokens >= 4

    # shift resistance: prepend 3 tokens to every doc; chunk multisets
    # must share most chunks with the originals (fixed-size sharing: 0)
    shifted = docs.withColumn(
        "text", F.concat(F.lit("xx yy zz "), F.col("text"))
    )
    shifted_chunks = content_defined_chunks(
        shifted, "text", "doc_id", **kw
    ).collect()
    shared = total = 0
    sh_by_doc: dict[int, set] = {}
    for r in shifted_chunks:
        sh_by_doc.setdefault(r.doc_id, set()).add(r.chunk_text)
    for doc_id, rs in by_doc.items():
        orig = {r.chunk_text for r in rs}
        total += len(orig)
        shared += len(orig & sh_by_doc.get(doc_id, set()))
    assert shared / total > 0.5, f"only {shared}/{total} chunks survived shift"


def test_gopher_sentence_case_and_allcaps_probes(spark):
    """ADVICE r5: sentence-case stopwords ('The', 'the,') must count as
    stopword hits and ALL-CAPS words as alphabetic. Doc 1 is ordinary
    sentence-case English with trailing punctuation; doc 2 is all-caps."""
    rows = [
        (1, "The dog ran to the house, and that was that."),
        (2, "WARNING: THE SYSTEM IS DOWN AND THAT IS BAD."),
        (3, "1234 5678 9012"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    # 'The'/'the' + 'to' + 'and' + 'that' all probe through case/punct
    assert got[1].stopword_hits >= 4, got[1]
    assert got[1].alpha_word_frac == 1.0
    assert got[2].stopword_hits >= 3, got[2]  # THE, AND, THAT
    assert got[2].alpha_word_frac == 1.0
    assert got[3].alpha_word_frac == 0.0  # digits stay non-alphabetic


def test_pq_train_deterministic_and_localcheckpoint(spark, sf_dir):
    """Lloyd training must be run-to-run deterministic after the switch
    to localCheckpoint lineage cuts (no driver round-trip), and a
    codeword-source vector must still encode to itself after training
    init (distance 0 at iteration start keeps its cluster populated)."""
    from pos_data_insertion_etl_spark.operators.similarity import pq_train

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 200
    )
    cb1 = {
        (r.sub_idx, r.code): tuple(r.csub)
        for r in pq_train(
            emb, "vec_id", "embedding", m=4, n_codes=8, dim=64, iters=3
        ).collect()
    }
    cb2 = {
        (r.sub_idx, r.code): tuple(r.csub)
        for r in pq_train(
            emb, "vec_id", "embedding", m=4, n_codes=8, dim=64, iters=3
        ).collect()
    }
    assert cb1 == cb2
    assert len(cb1) == 4 * 8


from pos_data_insertion_etl_spark.plans.llm_ops8 import (  # noqa: E402
    TRIGRAM_ORACLE,
)


def test_trigram_interpolated_lm_matches_oracle(spark, sf_dir, duck):
    """The Jelinek-Mercer interpolated trigram scorer hash-matches a
    DuckDB replica built from the same exact integer counts, capped
    head tables, and identically-ordered double arithmetic."""
    from pos_data_insertion_etl_spark.operators.lm_score import (
        trigram_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = trigram_lm_scores(docs, "text", "doc_id")
    ok, msg = compare(got, duck, TRIGRAM_ORACLE)
    assert ok, msg


def test_trigram_lm_sensible_on_hand_corpus(spark):
    """A formulaic corpus must score LOWER cross-entropy for an
    in-pattern document than for a shuffled/outlier one, and documents
    with < 3 tokens drop out."""
    from pos_data_insertion_etl_spark.operators.lm_score import (
        trigram_lm_scores,
    )

    pattern = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, pattern) for i in range(8)]
    rows.append((100, "rug the on mat dog and sat cat the on the mat sat"))
    rows.append((101, "zebra quark"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in trigram_lm_scores(df, "text", "doc_id").collect()}
    assert 101 not in out  # too short for a trigram
    assert out[0].cross_entropy < out[100].cross_entropy
    assert out[0].n_trigrams == len(pattern.split()) - 2
