"""Python UDTF surface (Spark >= 3.5): a record-exploding table function.

Demonstrates the engine's user-extensible table-function slot (SURVEY.md
§2.2 UDF/UDAF/UDTF row). The fixed-width exploder here mirrors
operators/fixedwidth.py semantics one row -> N records. NOTE: UDTFs are
row-at-a-time Python -- fine for control-plane/exploratory use; the hot
ingest path stays on the Arrow-batched mapInPandas source
(sources/zipsource.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="record_idx: bigint, record: string")
class FixedWidthExplode:
    """Explode a text blob into fixed-width character records (keeps the
    trailing partial record, like the reference ingest)."""

    def eval(self, text: str, width: int):
        if not text:
            return
        for i in range(0, len(text), width):
            yield (i // width, text[i : i + width])


def register_udtfs(spark: SparkSession) -> None:
    """Make the table functions available to the SQL surface:
    SELECT t.* FROM docs, LATERAL fixed_width_explode(text, 520) t"""
    spark.udtf.register("fixed_width_explode", FixedWidthExplode)
