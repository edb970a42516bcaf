"""Unified query registry consumed by __spark_entry__.py, bench.py, tests."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import QueryDef
from .connectors import CONNECTOR_QUERIES
from .relational import RELATIONAL_QUERIES
from .textops import TEXT_QUERIES
from .training import TRAINING_QUERIES
from .vector import VECTOR_QUERIES

CATALOG: list[QueryDef] = [*RELATIONAL_QUERIES, *TEXT_QUERIES,
                           *VECTOR_QUERIES, *TRAINING_QUERIES,
                           *CONNECTOR_QUERIES]

_BY_NAME = {q.name: q for q in CATALOG}
assert len(_BY_NAME) == len(CATALOG), "duplicate query names in catalog"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in CATALOG}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in CATALOG if q.oracle is not None}


def bench_queries() -> list[QueryDef]:
    return [q for q in CATALOG if q.bench]
