"""Query inventory — the graded operator coverage (SURVEY.md §2).

Each entry pairs a Spark implementation (``fn(spark, sf_dir) -> DataFrame``)
with the equivalent ANSI SQL the DuckDB oracle runs over the same parquet
tables. Column names and types are aligned on both sides (the driver's
compare sorts columns by name and hashes values). Float aggregates are
rounded identically on both sides so cross-engine summation order can't
flip the hash.

Queries whose semantics aren't SQL-expressible (streaming, stubs over
binary payloads) register ``oracle=None`` → the driver records a weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Q:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only checks


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in REGISTRY, f"duplicate query name {name}"
        REGISTRY[name] = Q(fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import the inventory modules (side effect: populate REGISTRY)."""
    global _LOADED
    if _LOADED:
        return
    from gigapi_querier_spark.inventory import (  # noqa: F401
        dedup,
        multimodal,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        similarity,
        textstats,
        timeseries,
    )

    _LOADED = True
