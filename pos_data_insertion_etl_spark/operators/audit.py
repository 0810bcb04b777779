"""Data-quality audit operators (Benford first-digit conformance).

Benford's law: naturally occurring multi-magnitude monetary/count
columns have first-digit frequencies P(d) = log10(1 + 1/d). Auditors
compare observed digit counts to that profile to flag fabricated or
truncated data -- a one-scan integrity check a warehouse runs on every
fact-table load.

Portability notes (the reasons this looks the way it does):

* The first digit comes from FLOOR + an integer CASE ladder, never
  CAST(double AS BIGINT) -- Spark truncates that cast while DuckDB
  ROUNDS it, a real cross-engine trap; FLOOR then exact integer
  division is identical everywhere.
* Expected probabilities are PRECOMPUTED fixed-point literals
  (round(log10(1+1/d) * 1e6) evaluated in Python once), so no runtime
  log10 touches either engine.

Scale: one scan, one 9-group aggregate with map-side combine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point (1e-6) Benford probabilities for digits 1..9
BENFORD_FP = {
    d: int(round(math.log10(1 + 1 / d) * 1_000_000)) for d in range(1, 10)
}

#: CASE ladder covering the full int64 range (first power 10^18:
#: floor of any double that fits a BIGINT is < 9.3e18, so no value
#: can fall through to a multi-digit ELSE branch)
_LADDER = [10**k for k in range(18, 0, -1)]


def _first_digit_expr():
    """First decimal digit of the long column `_t` (exact integer
    CASE ladder; `_t` must be >= 1)."""
    cases = " ".join(f"WHEN _t >= {p} THEN _t div {p}" for p in _LADDER)
    return F.expr(f"CASE {cases} ELSE _t END")


def benford_first_digit(df: DataFrame, value_col: str) -> DataFrame:
    """Per-digit Benford conformance: [digit, observed,
    expected_milli, dev_milli] over rows with |value| >= 1.
    expected_milli = n * P(d) in 1e-3 units (exact integer:
    n * fp_prob div 1000); dev_milli = |observed*1000 -
    expected_milli|."""
    base = df.select(
        F.floor(F.abs(F.col(value_col))).cast("long").alias("_t")
    ).filter(F.col("_t") >= 1)
    digits = base.select(_first_digit_expr().alias("digit"))
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    n_total = counts.agg(F.sum("observed").cast("long").alias("n"))
    prob_case = " ".join(
        f"WHEN digit = {d} THEN {p}" for d, p in BENFORD_FP.items()
    )
    return (
        counts.crossJoin(F.broadcast(n_total))
        .withColumn("_pfp", F.expr(f"CASE {prob_case} ELSE 0 END"))
        .select(
            F.col("digit").cast("int").alias("digit"),
            "observed",
            F.expr("(n * _pfp) div 1000").cast("long").alias(
                "expected_milli"
            ),
            F.abs(
                F.col("observed") * 1000 - F.expr("(n * _pfp) div 1000")
            )
            .cast("long")
            .alias("dev_milli"),
        )
    )
