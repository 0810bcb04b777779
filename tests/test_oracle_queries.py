"""Every declared query hash-matches the DuckDB oracle at sf0.01 -- the
local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.plans import all_queries

from .oracle_harness import compare, duck_connection

QUERIES = all_queries()
ORACLED = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(name, spark, sf_dir, duck):
    spec = QUERIES[name]
    df = spec.spark(spark, sf_dir)
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_rows_only_inventory_is_known():
    """Every oracle-less query must have a structural test below -- a new
    rows-only query without one fails here instead of passing vacuously.
    (Round 6 gave q58/q63/q64/q124 real oracles, then late in the round
    composed a full oracle for the q144 funnel too: the registry has
    ZERO rows-only entries.)"""
    assert set(ROWS_ONLY) == set()


def test_q144_funnel_monotone(spark, sf_dir):
    """The curation funnel must report every stage exactly once with
    monotone non-increasing counts that start at the corpus size and
    never collapse to zero."""
    from pos_data_insertion_etl_spark.catalog import load_table

    rows = QUERIES["q144_curation_funnel"].spark(spark, sf_dir).collect()
    stages = {r.stage_order: r.n_docs for r in rows}
    assert sorted(stages) == list(range(len(rows)))
    counts = [stages[i] for i in sorted(stages)]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert counts[0] == n_docs
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[-1] > 0


def test_q58_lsh_topk_invariants(spark, sf_dir):
    """Approximate ANN: no value oracle, but the output must still be a
    non-empty per-query top-k with no self-pairs and rn <= k."""
    rows = QUERIES["q58_ann_lsh_bucket"].spark(spark, sf_dir).collect()
    assert rows
    per_query: dict = {}
    for r in rows:
        assert r.query_id != r.neighbor_id
        assert 1 <= r.rn <= 5
        per_query.setdefault(r.query_id, []).append(r)
    for rs in per_query.values():
        rns = sorted(r.rn for r in rs)
        assert rns == list(range(1, len(rs) + 1))  # dense, no dup ranks
        by_rn = sorted(rs, key=lambda r: r.rn)
        sims = [r.cos_sim for r in by_rn]
        assert sims == sorted(sims, reverse=True)  # ranked by similarity


def test_q63_approx_distinct_bounds_hold(spark, sf_dir):
    """The invariant-form output: exact columns are exact, and the
    within-bound booleans the oracle pins TRUE genuinely hold (i.e.
    the sketch really is inside 15% -- not vacuous)."""
    from pos_data_insertion_etl_spark.catalog import load_table

    got = {
        r.l_returnflag: r
        for r in QUERIES["q63_approx_distinct"].spark(spark, sf_dir).collect()
    }
    assert got
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_suppkey").alias("suppliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, g in got.items():
        e = exact[flag]
        assert g.exact_parts == e.parts
        assert g.exact_suppliers == e.suppliers
        assert g.n_rows == e.n_rows
        assert g.parts_within_bound and g.suppliers_within_bound


def test_q64_percentile_rank_bounds_hold(spark, sf_dir):
    """The invariant-form output: per-group row counts are exact and
    both rank-bound booleans hold on real data."""
    from pos_data_insertion_etl_spark.catalog import load_table

    got = {
        r.l_returnflag: r
        for r in QUERIES["q64_percentile_approx"].spark(spark, sf_dir).collect()
    }
    assert got
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for flag, g in got.items():
        assert g.n_rows == exact[flag]
        assert g.median_rank_ok and g.p99_rank_ok


def test_oracle_output_dtypes_agree(spark, sf_smoke):
    """Registry-wide Spark<->DuckDB output-TYPE agreement (VERDICT r8
    item 1/2): the driver's hash serializes typed values, so an oracle
    emitting HUGEINT/INTEGER where Spark emits bigint mismatches even
    when every canonicalized value is equal -- exactly the q131
    signature (rows_match and schema_match true, hash_match false, four
    rounds). The value-compare harness canonicalizes through Python
    ints and cannot see width; this test checks the types structurally
    (DuckDB relation types vs df.dtypes, keyed by column name) so the
    entire skew class fails at registration time. Compatibility classes
    (int widths within int64, timestamp_ntz<->TIMESTAMP) are calibrated
    from eight driver-green counterexamples -- see oracle_harness."""
    from .oracle_harness import dtype_mismatches, duck_connection

    con = duck_connection(sf_smoke)
    try:
        bad = {}
        for name in ORACLED:
            spec = QUERIES[name]
            df = spec.spark(spark, sf_smoke)
            mm = dtype_mismatches(df, con, spec.oracle)
            if mm:
                bad[name] = mm
        assert not bad, (
            f"{len(bad)} oracle(s) with Spark/DuckDB output-type skew: {bad}"
        )
    finally:
        con.close()
