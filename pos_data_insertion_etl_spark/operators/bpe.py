"""Byte-pair-encoding tokenizer: corpus-scale training + Arrow-batched
apply -- the real form of the token-counting the estimator in
plans/llm_ops4 (q122) approximates.

Scale split (the architecture HF/SentencePiece use, engine-native):

* The corpus-sized work is ONE distributed word count (explode +
  groupBy word, map-side combined). BPE statistics depend only on the
  (word, count) vocabulary -- Zipf-bounded, orders of magnitude smaller
  than the corpus -- so the merge loop itself runs on the driver over
  the top-``vocab_cap`` words (which carry ~all token mass). Per-merge
  distributed pair-count rounds would cost n_merges shuffles for no
  extra fidelity.
* Apply is a Pandas UDF over Arrow batches with per-batch WORD
  memoization: a word is segmented once per batch no matter how often
  it repeats, so the per-row cost collapses to dict lookups on the
  Zipf head. No JVM-side form exists (BPE is inherently sequential per
  word), so this is the sanctioned Pandas-UDF slow path, vectorized as
  far as the algorithm allows.

Determinism: merge selection breaks count ties lexicographically, so
training is a pure function of the word counts; apply is a pure
function of the merge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for sym, c in vocab.items():
        for a, b in zip(sym, sym[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + c
    return stats


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for sym, c in vocab.items():
        res = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                res.append(merged)
                i += 2
            else:
                res.append(sym[i])
                i += 1
        out[tuple(res)] = out.get(tuple(res), 0) + c
    return out


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 50,
    vocab_cap: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus word counts.

    Words are character sequences with a ``</w>`` end marker (the
    original BPE formulation, so merges can capture word endings).
    Merge choice per round: highest pair count, ties broken by pair
    lexicographic order -- a pure function of the counts.
    """
    rows = (
        _word_counts(docs, text_col)
        .orderBy(F.desc("c"), "word")
        .limit(vocab_cap)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r.word) + ("</w>",)
        vocab[sym] = vocab.get(sym, 0) + r.c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        # lexicographic MIN among max-count pairs:
        best = max(stats.values())
        pair = min(p for p, c in stats.items() if c == best)
        merges.append(pair)
        vocab = _merge_vocab(vocab, pair)
    return merges


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word greedily by rank (lowest rank first) --
    the standard BPE apply."""
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """[id, n_words, n_bpe_tokens, tokens]: BPE segmentation per
    document. ``tokens`` carries the full subword sequence (drop it for
    count-only pipelines). Arrow-batched with per-batch word
    memoization."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = (
        f"{id_col} long, n_words long, n_bpe_tokens long,"
        " tokens array<string>"
    )

    def encode(iterator):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            hit = cache.get(word)
            if hit is None:
                hit = bpe_segment_word(word, ranks)
                cache[word] = hit
            return hit

        for pdf in iterator:
            ids, n_words, n_toks, toks_col = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = str(text).lower().split()
                toks: list[str] = []
                for w in words:
                    toks.extend(seg(w))
                ids.append(doc_id)
                n_words.append(len(words))
                n_toks.append(len(toks))
                toks_col.append(toks)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": n_words,
                    "n_bpe_tokens": n_toks,
                    "tokens": toks_col,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(encode, out_schema)
