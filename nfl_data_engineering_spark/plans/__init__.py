"""Query catalog: every SURVEY.md §2 operator as a (Spark plan, DuckDB
oracle SQL) pair, consumed by ``__spark_entry__.py`` and ``bench.py``."""

from .registry import CATALOG, oracle_sql, queries  # noqa: F401
