"""Lineage cuts with a cluster-durability escape hatch.

Iterative operators (connected components, PageRank, k-core, BFS,
weighted SSSP, the set-similarity prefix join) truncate lineage every
round so ``iters`` rounds cost ``iters`` plans instead of one
exponentially nested one. Locally the right cut is
``localCheckpoint``: it stores blocks on the executors, costs no
distributed-filesystem round trip, and a single-JVM local[N] run
cannot lose an executor.

On a real cluster that trade-off flips for long iterative jobs: a
localCheckpoint block lives only on its executor, so an executor loss
mid-iteration is UNRECOVERABLE (lineage was truncated -- Spark cannot
recompute the block) and fails the whole job, losing every completed
round. Reliable ``checkpoint()`` writes the blocks to the
checkpoint directory on shared storage (HDFS/S3), surviving any
executor loss at the cost of one write+read per cut.

This module is the single switch between the two (VERDICT r9 item 2):

    spark.conf.set("spark.pos_etl.reliableCheckpointDir",
                   "hdfs://…/checkpoints")   # cluster mode
    # unset (default): localCheckpoint, bench-identical to round 9

Every iterative lineage-cut site routes through :func:`cut_lineage`
(chain-friendly via ``df.transform(cut_lineage, eager=…)``). One-shot
multi-consumer reuse cuts in single-pass queries (e.g. bm25/itemsets
explode reuse) deliberately stay on plain ``localCheckpoint``: losing
one means re-running one query, not losing accumulated rounds, and
the shared-storage write would be pure overhead there. The CURATION
FUNNEL's stage boundaries (pipeline/curation.py) also stay on plain
``localCheckpoint`` on purpose (ADVICE r15): their ``observe()``
metrics feed the funnel report QUANTITATIVELY, and under reliable
``checkpoint()`` the checkpoint-write job can recompute the plan and
double-count the observation -- routing them through this switch
would silently corrupt the funnel counts on exactly the deployments
the switch targets. On a real cluster, persist those boundaries to
durable storage explicitly instead.

Results are identical either way -- the cut is a materialization
point, not a semantic operator (pytest drives connected_components
and the q189 prefix join through a reliable dir and asserts equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Session conf consulted on every cut. Unset/empty = localCheckpoint.
CONF_KEY = "spark.pos_etl.reliableCheckpointDir"

#: SparkContexts already pointed at a checkpoint dir, keyed by id():
#: setCheckpointDir creates a fresh UUID subdirectory per call, so it
#: must run once per (context, target), not once per cut.
_CONFIGURED: dict[int, str] = {}


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint()`` when the
    session sets ``spark.pos_etl.reliableCheckpointDir``, else
    ``localCheckpoint()`` (identical results, different failure
    domain -- see module docstring)."""
    spark = df.sparkSession
    try:
        target = spark.conf.get(CONF_KEY, "")
    except Exception:
        target = ""
    if not target:
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    key = id(sc)
    if _CONFIGURED.get(key) != target:
        sc.setCheckpointDir(target)
        _CONFIGURED[key] = target
    return df.checkpoint(eager=eager)
