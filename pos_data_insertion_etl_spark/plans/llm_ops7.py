"""Round-6 continuation registrations: the last two library dedup
operators from COVERAGE.md's registration queue (content-defined
chunking, pigeonhole-banded SimHash pairs), registered as canonical
queries so the driver's evidence window certifies them.

Both oracles follow the repo's engine-portability rules (md5-seeded
hashing, integer arithmetic, explicit rounding; see plans/registry.py).
The reference has no analytics surface of its own
(/root/reference/main.py:181-211 delegates to stored procedures); these
belong to the engine's LLM-curation tier (SURVEY.md §2).
"""

from __future__ import annotations

from ..catalog import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Content-defined chunking (operators/dedup.content_defined_chunks):
# boundaries where the trailing 8-token shingle's md5 prefix is
# 0 mod 16, with the standard CDC min-length rule. The oracle mirrors
# the operator exactly: per-position window hashes, candidate filter,
# then the sequential min-len greedy as a recursive CTE (the first
# candidate >= last_kept + min_len is kept -- identical to the
# operator's left fold). 8 hex digits decode exactly in a double
# (< 2^32), so the hex->int conversion is bit-portable.
# ---------------------------------------------------------------------------

_CDC_WINDOW, _CDC_MOD, _CDC_MINLEN = 8, 16, 16

_CDC_ORACLE = f"""
WITH RECURSIVE tokd AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks
  FROM documents
), hashed AS (
  SELECT doc_id, toks, len(toks) AS n FROM tokd
), posh AS (
  SELECT doc_id, p.i AS pos,
         substr(md5(array_to_string(
             list_slice(toks, p.i - {_CDC_WINDOW} + 1, p.i), ' ')), 1, 8) AS h8
  FROM hashed, unnest(range({_CDC_WINDOW}, n + 1)) AS p(i)
), cand AS (
  SELECT doc_id, pos
  FROM posh
  WHERE list_sum(list_transform(range(8),
          j -> (strpos('0123456789abcdef', substr(h8, j + 1, 1)) - 1)
               * power(16, 7 - j)))::BIGINT % {_CDC_MOD} = 0
), kept AS (
  SELECT doc_id, 0 AS pos FROM hashed
  UNION ALL
  SELECT k.doc_id,
         (SELECT MIN(c.pos) FROM cand c
          WHERE c.doc_id = k.doc_id AND c.pos - k.pos >= {_CDC_MINLEN})
  FROM kept k
  WHERE (SELECT MIN(c.pos) FROM cand c
         WHERE c.doc_id = k.doc_id AND c.pos - k.pos >= {_CDC_MINLEN})
        IS NOT NULL
), spans AS (
  SELECT k.doc_id, k.pos AS s,
         COALESCE(LEAD(k.pos) OVER (PARTITION BY k.doc_id ORDER BY k.pos),
                  h.n) AS e
  FROM kept k JOIN hashed h USING (doc_id)
)
SELECT doc_id,
       (ROW_NUMBER() OVER (PARTITION BY sp.doc_id ORDER BY sp.s) - 1)::BIGINT
           AS chunk_idx,
       array_to_string(list_slice(h.toks, sp.s + 1, sp.e), ' ') AS chunk_text,
       (sp.e - sp.s)::BIGINT AS n_tokens
FROM spans sp JOIN hashed h USING (doc_id)
WHERE sp.e > sp.s
"""


@query("q146_cdc_chunks", oracle=_CDC_ORACLE, tags=("dedup", "chunking"))
def q146_cdc_chunks(spark, sf_dir):
    """Content-defined chunking: boundaries move WITH the content
    (rsync/LBFS), so chunk-digest dedup survives upstream edits that
    shift every fixed-size chunk (q120's failure mode). Expression-only
    per-row HOFs; no shuffle."""
    from ..operators.dedup import content_defined_chunks

    docs = load_table(spark, sf_dir, "documents")
    return content_defined_chunks(
        docs,
        "text",
        "doc_id",
        window=_CDC_WINDOW,
        boundary_mod=_CDC_MOD,
        min_len=_CDC_MINLEN,
    )


# ---------------------------------------------------------------------------
# Pigeonhole-banded SimHash pairs (operators/dedup.simhash_hamming_pairs):
# hamming <= 3 over 16-bit SimHashes implies exact agreement on one of
# the 4 hash slices, so candidates come from an equi-join on
# (chunk_idx, chunk_value) -- never all-pairs. The oracle recomputes
# the same 16-bit simhash per doc (per-bit +/-1 sums over token md5
# hex digits) and the same chunk-agreement candidate rule.
# ---------------------------------------------------------------------------

_SH_MAXHAM, _SH_CHUNKS = 3, 4


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


@query(
    "q147_simhash_hamming_pairs",
    oracle=_simhash_pairs_oracle(_SH_MAXHAM, _SH_CHUNKS),
    tags=("dedup", "simhash"),
)
def q147_simhash_hamming_pairs(spark, sf_dir):
    """SimHash near-dup PAIRS at scale: pigeonhole banding turns
    hamming <= 3 into a (chunk_idx, chunk_value) equi-join -- the
    SimHash analog of MinHash's LSH band join -- then verifies exact
    hamming on the in-row pair. 16 bits/doc vs 8x32-hex MinHash sigs:
    the cheap coarse near-dup gate."""
    from ..operators.dedup import simhash_hamming_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_hamming_pairs(
        docs, "text", "doc_id", max_hamming=_SH_MAXHAM, n_chunks=_SH_CHUNKS
    )
