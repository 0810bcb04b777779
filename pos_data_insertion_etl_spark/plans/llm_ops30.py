"""Round-12 batch AA: the giant-component AUTO-ROUTE as a code path.

Round 11 shipped :func:`operators.graph.connected_components_stars`
(q291) but left the routing to a docstring -- a caller feeding a
social-graph edge list to the default ``connected_components`` still
got pointer jumping, which measurably DNFs (>550 s, (31+1)/32
straggler) on a 3M-node path that stars finishes in ~124 s (VERDICT
r11 item 1). Round 12 makes ``method="auto"`` the default: each jump
round's convergence check is one aggregation that ALSO yields the max
label frequency, and the operator switches mid-stream to star
contraction -- carrying the jump rounds' (node, label) shortcut edges
so no progress is discarded -- the moment a heavy label appears or the
loop is still unconverged after ``skew_switch_rounds``.

q292 certifies exactly that switch path end to end at driver scale:
the q291 adversarial topology (one giant path + small chains), run
through the PUBLIC ``connected_components`` entrypoint with the driver
union-find short-circuit disabled and the switch knobs tightened so
the hand-off provably fires mid-run (the path's diameter guarantees
the loop cannot converge before the switch round). The oracle is the
same closed form: correctness of connected components is independent
of WHEN the switch happens, which is what makes the mid-stream
hand-off safe to auto-tune at scale.

Scale shape: pre-switch rounds are the q88-certified jump loop with
the probe folded into the existing aggregate (map-side combinable --
zero extra jobs); post-switch rounds are the q291-certified node-keyed
star contraction. The shortcut edges shrink the effective diameter by
the distance jumping already covered, so the switch never restarts
from scratch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query

#: giant path nodes 0..G-1; 10-node chains fill G..N-1.
_G = 1200
_N = 1700


@query(
    "q292_cc_autoroute_switch",
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
def q292_cc_autoroute_switch(spark, sf_dir):
    """Auto-routed connected components on a 1200-node giant path plus
    fifty 10-node chains, via the public entrypoint with the switch
    knobs tightened (switch after 3 unconverged jump rounds): a
    1200-diameter path needs ~11 jump rounds, so the mid-stream
    jump->stars hand-off provably fires and the closed-form oracle
    certifies the combined result."""
    from ..operators.graph import connected_components

    ids = spark.range(_N)
    path = ids.filter(F.col("id") < _G - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    chains = (
        ids.filter(F.col("id") >= _G)
        .filter((F.col("id") - _G) % 10 != 9)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    return connected_components(
        path.union(chains),
        driver_threshold=0,
        skew_switch_threshold=50,
        skew_switch_rounds=3,
    )
