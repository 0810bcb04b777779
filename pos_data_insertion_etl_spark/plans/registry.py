"""Declared-query registry: every engine capability is registered here as
(name, spark_callable, oracle_sql) so the driver's DuckDB oracle can
hash-match it (SURVEY.md §2 inventory -> BASELINE.json t2 gate).

Cross-engine determinism rules used throughout the inventory:

* Aggregates over doubles are computed as exact DECIMAL sums and cast to
  DOUBLE at the end, in BOTH engines -- decimal addition is associative,
  so Spark's partial/final shuffle order and DuckDB's scan order produce
  bitwise-identical results.
* Averages are `CAST(decimal_sum AS DOUBLE) / COUNT(*)` -- one double
  division of identical operands.
* Every LIMIT / top-k orders by a total key (value + unique id tiebreak).
* Timestamps are UTC; `events.ts` is truncated to microseconds on load
  (catalog.load_table) which matches DuckDB's TIMESTAMP_NS -> TIMESTAMP.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a declared query. The decorated fn takes (spark, sf_dir)."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that populate the registry.
    from . import (  # noqa: F401
        etl_ops,
        extended,
        llm_ops,
        llm_ops2,
        llm_ops3,
        llm_ops4,
        llm_ops5,
        llm_ops6,
        llm_ops7,
        llm_ops8,
        llm_ops9,
        llm_ops10,
        llm_ops11,
        llm_ops12,
        llm_ops13,
        llm_ops14,
        llm_ops15,
        llm_ops16,
        llm_ops17,
        llm_ops18,
        llm_ops19,
        llm_ops20,
        llm_ops21,
        llm_ops22,
        llm_ops23,
        llm_ops24,
        llm_ops25,
        llm_ops26,
        llm_ops27,
        llm_ops28,
        llm_ops29,
        llm_ops30,
        llm_ops31,
        llm_ops32,
        media_ops,
        pos_ops,
        relational,
        relational2,
        relational3,
    )

    return REGISTRY
