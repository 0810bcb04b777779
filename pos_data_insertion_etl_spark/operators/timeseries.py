"""Exponentially-weighted time-series smoothing, engine-portable.

Complements gapfill.py (structural repair) and the windowed
aggregations in plans/relational.py (uniform weights): EWMA weights
recent points geometrically. A true infinite-horizon EWMA is a
recursive state fold -- cross-engine float determinism is hopeless
because every engine folds in its own order. This variant makes it
portable by construction:

* FINITE horizon: `taps` lagged values per row (a fixed window frame).
* DYADIC alpha = 1/2: every weight 2^-(i+1) is a power of two, so each
  product weight*value is EXACT in IEEE doubles (exponent shift, no
  mantissa rounding).
* ONE fixed expression tree: w0*v0 + w1*v1 + ... evaluated
  left-to-right in both engines -> bit-identical sums, then a single
  division by the closed-form weight total (2^taps - 1) / 2^taps.

Scale: per-key window over (order_cols) -- one hash partition by key,
one sort, no joins; `taps` lag expressions ride the same window frame.
Keys are independent, so skew only matters for a single pathological
key (same envelope as any per-user sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def ewma_dyadic(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    taps: int = 8,
) -> DataFrame:
    """Append `ewma` = sum_{i=0..taps-1} 2^-(i+1) * value[t-i],
    normalized by (1 - 2^-taps); NULL until a key has `taps` rows
    (warm-up -- no zero-padding bias, and a deterministic NULL is
    portable where a partial-window renormalization would re-divide
    per row).

    `order_cols` must be a TOTAL order within each key (pass a unique
    id tiebreak); ties would make lag() nondeterministic.
    """
    if taps < 1 or taps > 52:
        raise ValueError("1 <= taps <= 52 (dyadic weights must stay exact)")
    w = W.partitionBy(key_col).orderBy(*order_cols)
    v = F.col(value_col).cast("double")
    acc = v * F.lit(0.5)
    for i in range(1, taps):
        acc = acc + F.lag(v, i).over(w) * F.lit(2.0 ** -(i + 1))
    norm = 1.0 - 2.0**-taps
    rn = F.row_number().over(w)
    return df.withColumn(
        "ewma",
        F.when(rn >= taps, acc / F.lit(norm)).otherwise(F.lit(None)),
    )
