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
# Round 4 window (50):
# (a) the 36 entries with no driver-green row after rounds 1-3 (all are
#     local-parity green at sf0.001/0.01/0.1 — rounds 1-3 cumulative
#     driver-green is 142/178 of the round-3 catalog; this closes it);
# (b) the 12 entries added this round (percentile-cutoff segmentation
#     twins, weather unit/forecast parity, salted multifile compaction,
#     incremental dedup, PQ recall, 3-col z-order, filter funnel,
#     sliding rollup, cross-shard audit, semantic contamination);
# (c) 2 re-verifies: the partitioned upsert writer (pid-scoped tmp
#     paths) and the refactored streaming keep-latest fold. lang_id's
#     Arrow kernel is equality-proven against the expression form and
#     parity-green at three SFs + EST; its driver row rotates in next
#     round.
# Names absent from this list keep catalog order after it.
_PRIORITY: list[str] = [
    # --- (a) never driver-checked ---
    "sampled_quantiles", "variant_extract", "sql_api_report",
    "dedup_star_survivors", "hard_negative_mining", "ann_pq_topk",
    "kmeans_embeddings", "embedding_int8_quant", "bigram_logprob",
    "importance_resample", "feature_hashing", "pmi_collocations",
    "zorder_pruning", "multimodal_frame_sample", "multimodal_resize",
    "compact_roundtrip", "schema_evolution_read", "bucketed_join_colocated",
    "skew_join_salted", "interval_incident_join", "cdc_merge_apply",
    "streaming_cdc_apply", "streaming_enrich", "streaming_upsert_sink",
    "pagerank_event_graph", "last_touch_attribution", "column_profile",
    "ks_drift", "trailing_unique_users", "streaming_dedup_ingest",
    "basket_pair_rules", "rfm_segmentation", "pit_feature_join",
    "time_to_conversion", "ab_test_report", "revenue_bridge",
    # --- (b) new this round ---
    "spend_quartiles_cutoffs", "rfm_segmentation_cutoffs",
    "weather_unit_convert", "weather_forecast_window", "compact_multifile",
    "incremental_corpus_dedup", "pq_recall_audit", "zorder_pruning_3col",
    "filter_funnel", "streaming_sliding_rollup", "cross_shard_dedup_audit",
    "semantic_contamination",
    # --- (c) re-verify after this round's code changes ---
    "upsert_roundtrip", "streaming_keep_latest",
]

# Round-5 window, staged (enact by moving to the head of _PRIORITY after
# the round-4 CORRECTNESS gate runs): the entries added late in round 4
# with no driver row yet — "bpe_encode", "triangle_count",
# "snapshot_diff", "streaming_left_outer_join", "minhash_recall_audit",
# "hll_partition_merge", "skyline_frontier", "prefix_filter_join",
# "table_sync_audit", "ohlc_daily", "join_size_estimate",
# "trailing_unique_hll", "record_linkage", "nearest_event_join",
# "streaming_append_rollup", "exact_quantiles_twopass",
# "histogram_quantile_merge", "file_stats_manifest",
# "interval_overlap_join", "priority_sample_weighted",
# "streaming_multibatch_backfill", "capped_sessions",
# "weekday_seasonality", "rank_twophase", "kmv_set_ops",
# "python_datasource_sink", "rolling_mad_anomaly",
# "cogrouped_asof_pandas", "streaming_late_data_drop",
# "udtf_polymorphic", "recursive_cte_hierarchy",
# "observed_metrics_audit", "streaming_full_outer_join",
# "streaming_checkpoint_restart", "vocab_coverage_curve",
# "length_bucketing_waste", "cusum_changepoint", "fd_violation_profile",
# "market_share" — plus
# "lang_id" (parity- and equality-proven after the Arrow-kernel rewrite;
# its driver row predates the kernel). Remaining slots: the entries with
# the OLDEST driver rows (round-1 vintage), oldest first.

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
