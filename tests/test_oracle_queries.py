"""Every declared query hash-matches the DuckDB oracle at sf0.01 -- the
local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

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


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(name, spark, sf_dir):
    spec = QUERIES[name]
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
