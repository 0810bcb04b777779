"""Round-9 batch X: Spark 4 API surfaces the registry had not yet
exercised -- the VariantType semi-structured path and collation-aware
grouping.

* q287 -- VARIANT JSON stats: ``parse_json`` turns events.props into a
  VariantType column and ``variant_get`` extracts a TYPED bigint in
  one expression -- the Spark 4 replacement for stringly
  ``get_json_object`` chains (q34's generation). The variant itself
  never leaves the query (driver output stays plain bigint/double);
  the oracle extracts the same path with DuckDB's JSON functions.
* q288 -- COLLATED grouping: ``collate(col, 'UTF8_LCASE')`` groups
  case-insensitively without rewriting values -- at 100 TB this beats
  a lower() projection when the collation can push into the shuffle
  key. The grouped representative is aggregation-order-dependent, so
  the OUTPUT key is lower(...) (deterministic); only the grouping runs
  under the collation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ._helpers import dec
from .registry import query

# ---------------------------------------------------------------------------
# q287: VariantType JSON extraction stats
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
            AS BIGINT) AS k_decade,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1
"""


@query(
    "q287_variant_json_stats",
    oracle=_VARIANT_ORACLE,
    tags=("json", "variant", "spark4"),
)
def q287_variant_json_stats(spark, sf_dir):
    """Per-k-decade event stats through the Spark 4 VARIANT path:
    parse_json(props) -> variant_get('$.k', 'bigint') extracts a TYPED
    integer in one expression (no stringly get_json_object -> cast
    chain, no schema-on-write). The variant column is internal only --
    the output schema is plain bigint/double, so the oracle (DuckDB
    json_extract_string + CAST) hash-matches. At 100 TB variant
    parse-once beats repeated per-path string parsing when several
    paths are extracted from one column; extraction stays inside
    whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events").select("props", "value")
    v = ev.select(
        F.parse_json(F.col("props")).alias("_v"), "value"
    )
    return (
        v.select(
            F.expr("variant_get(_v, '$.k', 'bigint')").alias("_k"),
            "value",
        )
        .groupBy(F.expr("_k div 10").cast("long").alias("k_decade"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("value_sum"),
        )
    )


# ---------------------------------------------------------------------------
# q288: collation-aware (case-insensitive) grouping
# ---------------------------------------------------------------------------

_COLLATED_ORACLE = """
WITH d AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
              ELSE event_type END AS et,
         value
  FROM events
)
SELECT lower(et) AS event_type_ci,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM d
GROUP BY lower(et)
"""


@query(
    "q288_collated_group",
    oracle=_COLLATED_ORACLE,
    tags=("string", "collation", "spark4"),
)
def q288_collated_group(spark, sf_dir):
    """Case-insensitive grouping via Spark 4 collations: a
    deterministically mixed-case event_type (even ids uppercased)
    groups under collate(et, 'UTF8_LCASE') -- equivalence classes are
    identical to GROUP BY lower(et) for ASCII, but the collation form
    avoids materializing a rewritten key column and pushes the
    collation into the shuffle hash. The grouped representative value
    is aggregation-order-dependent (observed: first-seen casing), so
    the OUTPUT key is lower(min over nothing -- recompute lower(et))
    -- deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    d = ev.select(
        F.when(
            F.col("event_id") % 2 == 0, F.upper("event_type")
        )
        .otherwise(F.col("event_type"))
        .alias("et"),
        "value",
    )
    return (
        d.groupBy(F.collate(F.col("et"), "UTF8_LCASE").alias("_ci"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("value_sum"),
        )
        .select(
            # cast back to DEFAULT-collation string: the collation
            # rides the dtype ('string collate UTF8_LCASE') and must
            # not reach the driver's typed hash (the q131 lesson's
            # string-typed sibling).
            F.expr("CAST(lower(_ci) AS STRING COLLATE UTF8_BINARY)")
            .alias("event_type_ci"),
            "n_events",
            "value_sum",
        )
    )
