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
    rows-only query without one fails here instead of passing vacuously."""
    assert set(ROWS_ONLY) == {
        "q58_ann_lsh_bucket",
        "q63_approx_distinct",
        "q64_percentile_approx",
        "q124_ann_lsh_seeded",  # structural tests in test_similarity_ann.py
    }


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


def test_q63_approx_distinct_within_tolerance(spark, sf_dir):
    """HLL++ estimate must land within ±10% of the exact distinct count."""
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
        assert abs(g.approx_parts - e.parts) <= 0.1 * e.parts
        assert abs(g.approx_suppliers - e.suppliers) <= 0.1 * e.suppliers
        assert g.n_rows == e.n_rows  # the exact column must be exact


def test_q64_percentile_approx_brackets(spark, sf_dir):
    """Approximate percentiles must be real data values inside the exact
    [min, max], with p50 <= p99 and p50 within the exact p25..p75 band."""
    from pos_data_insertion_etl_spark.catalog import load_table

    got = {
        r.l_returnflag: r
        for r in QUERIES["q64_percentile_approx"].spark(spark, sf_dir).collect()
    }
    assert got
    li = load_table(spark, sf_dir, "lineitem")
    bounds = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
            F.expr("percentile(l_extendedprice, 0.75)").alias("p75"),
        )
        .collect()
    }
    for flag, g in got.items():
        b = bounds[flag]
        assert float(b.lo) <= float(g.median_price_approx) <= float(b.hi)
        assert float(b.lo) <= float(g.p99_price_approx) <= float(b.hi)
        assert float(g.median_price_approx) <= float(g.p99_price_approx)
        assert b.p25 <= float(g.median_price_approx) <= b.p75
