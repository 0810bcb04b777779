"""Round-10 invariant guards (post-snapshot, test-only).

Codifies the manual checks made during the round: values_frame
equivalence under hostile data (property-based), q290's session-conf
restoration, the shuffle-free gate plan shape, and q289's
partitioning invariance.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.smallframe import values_frame

_TEXT = st.text(min_size=0, max_size=40)
_CELLS = st.tuples(
    st.integers(min_value=-(2**62), max_value=2**62),
    _TEXT,
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)


@settings(max_examples=15, deadline=None)
@given(st.lists(_CELLS, min_size=1, max_size=8))
def test_values_frame_equals_createdataframe(spark, rows):
    ddl = "n long, s string, x double"
    vf = sorted(map(tuple, values_frame(spark, rows, ddl).collect()), key=str)
    cf = sorted(
        map(tuple, spark.createDataFrame(rows, ddl).collect()), key=str
    )
    assert vf == cf


def test_q290_restores_session_confs(spark, sf_smoke):
    from pos_data_insertion_etl_spark.plans import all_queries

    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    before = {k: spark.conf.get(k, None) for k in keys}
    all_queries()["q290_aqe_skew_split"].spark(spark, sf_smoke).collect()
    after = {k: spark.conf.get(k, None) for k in keys}
    assert before == after


def test_gate_keep_input_is_shuffle_free(spark):
    """The in-place gopher gate (keep_input=True) must plan without any
    Exchange -- the r10 point of removing the flags self-join."""
    from pos_data_insertion_etl_spark.operators.quality import (
        GOPHER_METRIC_COLS,
        gopher_quality_flags,
    )

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over a lazy dog word "),
            F.col("id"),
        ).alias("text"),
    )
    gated = (
        gopher_quality_flags(
            docs, "text", "doc_id", min_words=5,
            stopwords=("the", "a"), min_stopword_hits=1,
            keep_input=True,
        )
        .filter(F.col("gopher_pass"))
        .drop(*GOPHER_METRIC_COLS)
    )
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert gated.columns == ["doc_id", "text"]
    assert gated.count() == 50


def test_q289_partitioning_invariant(spark, sf_smoke):
    """Same emission whatever the shuffle width -- watermark semantics
    must not depend on partitioning (streaming state is keyed)."""
    from pos_data_insertion_etl_spark.plans import all_queries

    spec = all_queries()["q289_watermark_late_data"]

    def run():
        return sorted(
            (str(r.window_start), r.event_type, r.n_events, r.total_value)
            for r in spec.spark(spark, sf_smoke).collect()
        )

    old = spark.conf.get("spark.sql.shuffle.partitions")
    base = run()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert run() == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert len(base) > 0
