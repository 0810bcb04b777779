"""Round-11 batch Z: giant-component-safe connected components.

q291 certifies :func:`operators.graph.connected_components_stars`
(alternating large-star/small-star contraction, Kiveris et al.
SoCC'14) on the exact shape that degrades the default pointer-jumping
algorithm: ONE giant path component next to the usual small chains.

Why this exists (round-11 finding, PLANS.md): pointer jumping's jump
step joins on the LABEL column, and once labels converge every member
of a component carries the root's id -- for a giant component the join
key distribution collapses onto one heavy key and a single reduce task
drags every remaining round (measured straggler: (31+1)/32 per stage
on a 3M-node path). Star contraction joins only on NODE ids and its
min-aggregations are map-side combinable, so the same shape runs with
uniform tasks. The topology here is deliberately adversarial-small:
a 1500-node path (diameter 1500 -- converges in ~11 alternating
rounds) plus fifty 10-node chains, with a closed-form component map
the DuckDB oracle states directly.

Scale shape: each round is two node-keyed joins + two combinable
min-aggregates + one symmetric-difference convergence check; no label
ever becomes a join key, so no key's frequency grows as components
converge. Rounds are O(log n) w.h.p.; lineage cuts per phase keep
plans flat and honor spark.pos_etl.reliableCheckpointDir.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query

#: giant path nodes 0..G-1; 10-node chains fill G..N-1.
_G = 1500
_N = 2000


@query(
    "q291_cc_giant_star",
    oracle=f"""
SELECT k AS node,
       CAST(
         CASE WHEN k < {_G} THEN 0
              ELSE {_G} + ((k - {_G}) // 10) * 10 END
       AS BIGINT) AS component
FROM range(0, {_N}) t(k)
""",
    tags=("graph", "dedup", "iterative", "skew"),
)
def q291_cc_giant_star(spark, sf_dir):
    """Star-contraction connected components on a giant path (1500
    nodes, one component rooted at 0) plus fifty 10-node chains
    (components rooted at 1500, 1510, ...): the closed form the oracle
    states. Certifies the giant-component-safe algorithm end to end --
    convergence detection, root labeling, and isolated-chain handling
    in one run."""
    from ..operators.graph import connected_components_stars

    ids = spark.range(_N)
    path = ids.filter(F.col("id") < _G - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    chains = (
        ids.filter(F.col("id") >= _G)
        .filter((F.col("id") - _G) % 10 != 9)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    return connected_components_stars(path.union(chains))
