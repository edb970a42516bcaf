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
# Round 11 window (50) — the rotation the r10 verdict staged (item 1:
# rotate the r6-vintage cohort plus weekday_seasonality, whose newest
# driver attestation is r5 because it yielded its r10 slot):
# (a) the 2 round-11 additions, never driver-attested
#     (semantic_dedup_twolevel — VERDICT r10 item 4;
#     auto_route_oph_join — VERDICT r10 item 5), name order;
# (b) weekday_seasonality, the single r5-vintage holdover;
# (c) the full r6-vintage cohort (46 entries, reproducible by folding
#     _green over the CORRECTNESS_r*.json files), name order;
# (d) ann_ivf_multiprobe, first of the 49-entry r7 cohort in name order,
#     taking the one spare slot — the rest of r7 rotates in round 12.
# 2 + 1 + 46 + 1 = the full 50-slot window. Names absent from this list
# keep catalog order after it.
_PRIORITY: list[str] = [
    # --- (a) never-driver-attested round-11 additions, name order ---
    "auto_route_oph_join", "semantic_dedup_twolevel",
    # --- (b) the r5-vintage holdover ---
    "weekday_seasonality",
    # --- (c) the full r6-vintage cohort, name order ---
    "acctbal_pctrank", "anti_join", "asof_join", "clean_sentinels",
    "clicks_before_purchase", "coerce_types", "cross_shard_dedup_audit",
    "cube_sales", "daily_delta", "dedup_components",
    "dedup_star_survivors", "dedup_survivor_table", "distinct_kmv",
    "embedding_dedup_components", "exact_substring_spans", "except_all",
    "exp_weighted_value", "explode_array", "filter_pushdown",
    "grouping_sets", "hourly_interpolate", "hourly_zero_fill",
    "json_extract", "kmv_set_ops", "matchup_differential",
    "minhash_recall_audit", "multi_key_sort", "ngram_jaccard_pairs",
    "pct_parse", "pivot_wide", "prefix_filter_join", "priority_extract",
    "qty_price_corr", "record_split", "revenue_gini_binned",
    "rollup_revenue", "semi_join", "spend_quartiles", "status_intersect",
    "trailing_avg", "trimmed_mean_binned", "tz_hour_histogram",
    "union_by_name", "user_sessions", "value_percentiles",
    "weekly_rollup",
    # --- (d) the first r7-vintage entry, name order ---
    "ann_ivf_multiprobe",
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
