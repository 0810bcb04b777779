"""MERGE-style upsert as a relational composition.

The reference sink upserts row batches into a table keyed by record id
(/root/reference/main.py stored-proc insert-or-update path). On Spark,
without a transactional table format, the same semantics compose from
two primitives that both scale:

    upsert(target, updates, keys) =
        updates  UNION ALL  (target ANTI JOIN updates ON keys)

* The anti join shuffles both sides on the key once (or broadcasts the
  updates side when it is small -- the common CDC-batch case, which
  Catalyst/AQE picks automatically).
* No driver-side row loop; the result is a plain DataFrame the caller
  writes wherever the mart lives.

Last-writer-wins WITHIN the updates batch is the caller's contract:
if `updates` may contain several rows per key, pre-dedupe it (e.g.
operators/topk.latest per key) -- this function intentionally does not
hide a window behind an innocent-looking merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Return `target` with rows matching `updates` on `keys` replaced.

    Both inputs must share the target's schema (checked by name). Rows
    present only in `updates` are inserted; rows present only in
    `target` pass through unchanged.
    """
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"upsert schema mismatch: target={sorted(target.columns)} "
            f"updates={sorted(updates.columns)}"
        )
    missing = [k for k in keys if k not in target.columns]
    if missing:
        raise ValueError(f"upsert keys not in schema: {missing}")
    survivors = target.join(updates.select(*keys), list(keys), "left_anti")
    return updates.select(*target.columns).unionByName(survivors)
