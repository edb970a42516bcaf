"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (X3 best-snapshot-per-key — the
'best available line per game/market' pattern from the reference's odds sort,
get_odds.py:62-66) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the
full catalog from nfl_data_engineering_spark.plans (one entry per SURVEY.md
§2 operator plus the LLM-pipeline extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nfl_data_engineering_spark.plans import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["best_snapshot"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases)."""
    return registry.oracle_sql()
