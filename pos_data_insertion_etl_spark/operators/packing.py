"""Greedy no-split sequence packing: the dataloader layout where a
document NEVER straddles a pack boundary -- a pack closes as soon as
the next document would overflow the token budget, so packs carry real
padding waste (unlike q91's concat-then-chunk layout, which has none by
construction). The efficiency report over the packs is what decides
budget/shard tuning for a training run.

Scale shape: the greedy fold is inherently sequential WITHIN a shard,
so the shard is the parallel unit (exactly q91's argument): one
Arrow-batched applyInPandas group per shard, shard count scaling with
the corpus. No global state, no driver data path.

Determinism: the fold consumes documents in (shard, id) order over
exact integer token counts -- bit-identical on any partitioning and
reproducible in the DuckDB oracle's recursive-CTE form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def greedy_pack_no_split(
    docs: DataFrame,
    pack_budget: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to (shard, pack_id, pos_in_pack).

    Within a shard, documents are visited in id order; a document that
    would push the open pack past ``pack_budget`` closes it and starts
    the next (an oversized document occupies a pack alone). Returns
    [id, shard, n_tokens, pack_id, pos_in_pack].
    """
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    if pack_budget < 1:
        raise ValueError("pack_budget must be >= 1")
    sized = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("shard", LongType()),
            StructField("n_tokens", LongType()),
            StructField("pack_id", LongType()),
            StructField("pos_in_pack", LongType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        pack, cur, pos = 0, 0, 0
        rows = []
        for r in pdf.itertuples():
            n = int(r.n_tokens)
            # close only a NON-EMPTY pack: cur == 0 means this pack just
            # opened, and an oversized document must live in it alone
            # rather than strand an empty pack behind itself
            if cur > 0 and cur + n > pack_budget:
                pack += 1
                cur, pos = 0, 0
            rows.append(
                (int(getattr(r, id_col)), int(r.shard), n, pack, pos)
            )
            cur += n
            pos += 1
        return pd.DataFrame(
            rows,
            columns=[id_col, "shard", "n_tokens", "pack_id", "pos_in_pack"],
        )

    return sized.groupBy("shard").applyInPandas(fold, out_schema)


def pack_efficiency_report(
    packed: DataFrame,
    pack_budget: int,
) -> DataFrame:
    """Aggregate a greedy_pack_no_split assignment into the tuning
    table: per (shard, pack_id) document count, token fill, and fill
    rate against the budget (oversized single-doc packs report
    fill_rate > 1 -- visible, not clipped). One small groupBy."""
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
        .select(
            "shard",
            "pack_id",
            "n_docs",
            "pack_tokens",
            F.round(
                F.col("pack_tokens").cast("double") / pack_budget, 6
            ).alias("fill_rate"),
        )
    )
