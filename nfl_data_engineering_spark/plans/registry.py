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
# Round 10 window (50) — the rotation the r9 verdict staged (item 2:
# rotate the six never-driver-attested round-9 entries first, then the
# oldest vintages, so no entry's newest driver attestation is older
# than r6 afterward):
# (a) the 6 round-9 additions that postdate the r9 driver window
#     (judge-verified at sf0.01 only so far), name order;
# (b) the 3 round-10 additions (similarity_join_staged,
#     sketch_route_report, dedup_quality_survivors), never attested;
# (c) 41 of the 42 entries whose newest driver row is r5 vintage, name
#     order (reproducible by folding _green over the CORRECTNESS_r*.json
#     files) — weekday_seasonality, last in name order, yields its slot
#     to the third round-10 addition and rotates with the r6 cohort
#     (the next-oldest, 46 entries) in round 11.
# 6 + 3 + 41 = the full 50-slot window. Names absent from this list
# keep catalog order after it.
_PRIORITY: list[str] = [
    # --- (a) never-driver-attested round-9 entries, name order ---
    "curriculum_stages", "dedup_minhash_oph", "lsh_bucket_histogram",
    "oph_recall_audit", "oph_recall_t05", "token_kl_divergence",
    # --- (b) the round-10 additions ---
    "similarity_join_staged", "sketch_route_report",
    "dedup_quality_survivors",
    # --- (c) the full round-5-vintage tail, name order ---
    "cusum_changepoint", "dedup_full_row", "dedup_keep_latest",
    "distinct_event_types", "exact_quantiles_twopass",
    "expected_minus_found", "fd_violation_profile", "file_stats_manifest",
    "histogram_quantile_merge", "hll_partition_merge",
    "interval_overlap_join", "join_size_estimate", "lang_id",
    "length_bucketing_waste", "market_share", "nearest_event_join",
    "observed_metrics_audit", "ohlc_daily", "pricing_summary",
    "priority_sample_weighted", "python_datasource_sink", "rank_twophase",
    "record_linkage", "recursive_cte_hierarchy", "region_volume",
    "rolling_mad_anomaly", "shipping_priority", "skyline_frontier",
    "snapshot_diff", "streaming_append_rollup",
    "streaming_checkpoint_restart", "streaming_full_outer_join",
    "streaming_late_data_drop", "streaming_left_outer_join",
    "streaming_multibatch_backfill", "table_counts", "table_sync_audit",
    "trailing_unique_hll", "triangle_count", "udtf_polymorphic",
    "vocab_coverage_curve",
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
