"""Bloom-filter membership for corpus decontamination at scale.

q92 (plans/llm_ops3) broadcasts the benchmark's shingle SET and
equi-joins; that is exact but the broadcast grows with the benchmark.
A Bloom filter compresses membership to ~10 bits per shingle at 1%
false-positive rate -- a 100 MB bit array covers ~80M shingles -- and
turns the contamination check into a pure EXPRESSION over each corpus
shingle: k seeded-md5 probes into the filter packed as ONE binary
literal (not per-word literal nodes -- Catalyst carries a single
constant whatever the filter size), no join at all. The probe side of
the plan is map-only; the only shuffle left is the per-document
aggregation of hit fractions.

Guarantees, and what they mean for decontamination:

* NO false negatives -- a shingle that is in the benchmark always
  hits, so contaminated documents can never slip through;
* false positives at the designed rate inflate hit fractions slightly
  -- callers screen with a threshold and (when exactness matters)
  re-verify ONLY the flagged documents against the true set (the
  sketch-then-verify pattern used throughout this engine).

Determinism: bit positions are seeded md5 (same JVM-expression hash at
build and probe time), so the filter and every probe are pure
functions of the inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles


def _positions(value: Column, m_bits: int, k_hashes: int) -> list[Column]:
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bf{i}|"), value)), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        for i in range(k_hashes)
    ]


def build_bloom(
    df: DataFrame, value_col: str, m_bits: int, k_hashes: int = 7
) -> list[int]:
    """Build the filter fully distributed: every (value, probe) bit
    position is computed engine-side, folded into 64-bit words with a
    ``bit_or`` aggregate keyed on the word index (associative ->
    map-side combine), and only the SET words -- at most m_bits/64
    rows, regardless of input row count -- reach the driver. Safe to
    point at a corpus-sized DataFrame (ADVICE/VERDICT r5: the previous
    distinct-positions collect shipped up to n*k rows)."""
    set_words = (
        df.select(F.col(value_col).cast("string").alias("v"))
        .select(
            F.explode(
                F.array(*_positions(F.col("v"), m_bits, k_hashes))
            ).alias("p")
        )
        .select(
            F.expr("p div 64").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * ((m_bits + 63) // 64)
    for r in set_words:
        words[r.w] = r.bits & ((1 << 64) - 1)  # two's-complement -> unsigned
    return words


def bloom_contains(
    words: list[int], value: Column, m_bits: int, k_hashes: int = 7
) -> Column:
    """Membership test as a pure expression: AND over the k probes of a
    bit test against the filter packed into ONE binary literal.

    The packing matters for scale: a per-word ``F.array(F.lit(...))``
    would put m_bits/64 expression nodes in the plan (a 100 MB filter
    => ~12.5M nodes -- unplannable); a single BinaryType literal is one
    node shipped once with the task binary, so filter size is bounded
    by broadcast limits, not by Catalyst. Each probe reads one byte
    (substring on binary), decodes it via hex -> int, and tests the
    bit -- all JVM expressions inside codegen."""
    blob = bytearray((m_bits + 7) // 8)
    for wi, w in enumerate(words):
        for b in range(8):
            idx = wi * 8 + b
            if idx < len(blob):
                blob[idx] = (w >> (8 * b)) & 0xFF
    lit = F.lit(bytes(blob))
    test = F.lit(True)
    for p in _positions(value, m_bits, k_hashes):
        byte = F.conv(
            F.hex(F.substring(lit, (F.shiftright(p, 3) + 1).cast("int"), 1)),
            16,
            10,
        ).cast("int")
        test = test & (F.getbit(byte, (p % 8).cast("int")) == 1)
    return test


def bloom_contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bits_per_shingle: int = 10,
    k_hashes: int = 7,
) -> DataFrame:
    """[id, n_shingles, n_hits, hit_frac]: per-document fraction of
    shingles present in the benchmark's Bloom filter. hit_frac is an
    UPPER bound on true contamination (no false negatives); screen on
    it, then exact-verify the flagged tail if needed."""
    bench_sh = doc_shingles(benchmark, text_col, id_col, n=n).select(
        "shingle"
    ).distinct()
    n_bench = bench_sh.count()
    m_bits = max(64, n_bench * bits_per_shingle)
    words = build_bloom(bench_sh, "shingle", m_bits, k_hashes)
    sh = doc_shingles(docs, text_col, id_col, n=n)
    return (
        sh.withColumn(
            "_hit",
            bloom_contains(words, F.col("shingle"), m_bits, k_hashes).cast(
                "int"
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("_hit").alias("n_hits"),
        )
        .select(
            F.col(id_col),
            "n_shingles",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_shingles"), 6
            ).alias("hit_frac"),
        )
    )
