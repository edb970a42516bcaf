"""Unified query registry consumed by __spark_entry__.py, bench.py, tests."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import QueryDef
from .connectors import CONNECTOR_QUERIES
from .lakeops import LAKEOPS_QUERIES
from .relational import RELATIONAL_QUERIES
from .similarity_api import API_QUERIES
from .textops import TEXT_QUERIES
from .training import TRAINING_QUERIES
from .vector import VECTOR_QUERIES

_ALL: list[QueryDef] = [*RELATIONAL_QUERIES, *TEXT_QUERIES,
                        *VECTOR_QUERIES, *TRAINING_QUERIES,
                        *CONNECTOR_QUERIES, *LAKEOPS_QUERIES,
                        *API_QUERIES]

# Verification-priority order. The external correctness gate checks a
# prefix window of the catalog (50 entries/round), so rotation aims each
# round's window at the entries with the most verification value.
#
# Round 6 window (50) — enacting the rotation staged in the r5 verdict
# (item 6: rotate by age now that all 230 entries have rows), amended
# with this round's code churn:
# (a) entries ADDED or CHANGED in round 6, so their driver rows
#     post-date the code they certify: the similarity-join front door
#     (new), the binned-Gini kernel swap, every entry through the
#     connected-components unpersist fix and the pair_table finalize
#     path, and the recall audit's de-doubled cache;
# (b) the 37 entries whose newest driver row is still round-1 vintage
#     (rotated out of the r5 window), catalog order;
# (c) remaining slots: oldest round-2 rows, catalog order.
# Names absent from this list keep catalog order after it.
_PRIORITY: list[str] = [
    # --- (a) new or code-changed in round 6 ---
    "leakage_safe_split", "kmv_set_ops", "trimmed_mean_binned",
    "incremental_corpus_dedup", "exact_substring_spans",
    "similarity_join_api", "revenue_gini_binned", "dedup_minhash_lsh",
    "dedup_components", "dedup_survivor_table", "dedup_star_survivors",
    "cross_shard_dedup_audit", "embedding_dedup_components",
    "minhash_recall_audit", "ngram_jaccard_pairs", "prefix_filter_join",
    # --- (b) round-1-vintage driver rows, oldest coverage ---
    "exp_weighted_value", "trailing_avg", "matchup_differential",
    "asof_join", "multi_key_sort", "union_by_name", "filter_pushdown",
    "pct_parse", "clean_sentinels", "coerce_types", "priority_extract",
    "tz_hour_histogram", "hourly_zero_fill", "hourly_interpolate",
    "weekly_rollup", "pivot_wide", "explode_array", "value_percentiles",
    "distinct_kmv", "user_sessions", "rollup_revenue", "daily_delta",
    "cube_sales", "status_intersect", "spend_quartiles", "semi_join",
    "anti_join", "grouping_sets", "except_all", "acctbal_pctrank",
    "qty_price_corr", "clicks_before_purchase",
    # --- (c) oldest round-2 rows ---
    "record_split", "json_extract",
    # (trimmed to exactly 50 for the driver's per-round window; the five
    # dropped round-1 re-verifies — unpivot_metrics, locf_fill,
    # lateral_topk, scd2_intervals, sliding_windows — are green since
    # r1/r3 and rotate into round 7)
]

assert not set(_PRIORITY) - {q.name for q in _ALL}, \
    "stale names in _PRIORITY (renamed/removed catalog entries)"

_PRIO_IDX = {n: i for i, n in enumerate(_PRIORITY)}
CATALOG: list[QueryDef] = sorted(
    _ALL, key=lambda q: (_PRIO_IDX.get(q.name, len(_PRIORITY)),
                         _ALL.index(q)))

_BY_NAME = {q.name: q for q in CATALOG}
assert len(_BY_NAME) == len(CATALOG), "duplicate query names in catalog"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in CATALOG}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in CATALOG if q.oracle is not None}


def bench_queries() -> list[QueryDef]:
    return [q for q in CATALOG if q.bench]
