"""Bloom-filter membership for corpus decontamination at scale.

q92 (plans/llm_ops3) broadcasts the benchmark's shingle SET and
equi-joins; that is exact but the broadcast grows with the benchmark.
A Bloom filter compresses membership to ~10 bits per shingle at 1%
false-positive rate -- a 100 MB bit array covers ~80M shingles -- and
turns the contamination check into a pure EXPRESSION over each corpus
shingle: k seeded-md5 probes into a broadcast array of 64-bit words,
no join at all. The probe side of the plan is map-only; the only
shuffle left is the per-document aggregation of hit fractions.

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
    """Build the filter distributed: every (value, probe) bit position
    is computed engine-side, the DISTINCT positions (at most m_bits,
    bounded by the filter's own design size) collect to the driver and
    set bits in an array of 64-bit words."""
    pos = (
        df.select(F.col(value_col).cast("string").alias("v"))
        .select(
            F.explode(
                F.array(*_positions(F.col("v"), m_bits, k_hashes))
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * ((m_bits + 63) // 64)
    for r in pos:
        words[r.p // 64] |= 1 << (r.p % 64)
    return words


def bloom_contains(
    words: list[int], value: Column, m_bits: int, k_hashes: int = 7
) -> Column:
    """Membership test as a pure expression: AND over the k probes of a
    bit test against the broadcast word array (a plan literal)."""
    # longs are signed; values with bit 63 set wrap negative -- harmless,
    # bitwise ops are two's-complement.
    arr = F.array(
        *[F.lit(w - (1 << 64) if w >= (1 << 63) else w) for w in words]
    )
    test = F.lit(True)
    for p in _positions(value, m_bits, k_hashes):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        test = test & (F.getbit(word, p % 64) == 1)
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
