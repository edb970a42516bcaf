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
# Round 9 window (50) — the staleness rotation the r8 verdict staged
# (item 1: "no entry's newest driver attestation older than r5
# afterward"):
# (a) ALL 46 entries whose newest driver row is r4 vintage, name order
#     (reproducible by folding _green over the CORRECTNESS_r0*.json
#     files — the upsert/zorder/compaction lake ops, the streaming-r4
#     cohort, kmeans/quantization, skew salting, weather fan-out);
# (b) 4 fill slots from the equally-old r5 cohort, name order.
# Names absent from this list keep catalog order after it.
_PRIORITY: list[str] = [
    # --- (a) the full round-4-vintage tail, name order ---
    "ab_test_report", "basket_pair_rules", "bigram_logprob",
    "bucketed_join_colocated", "cdc_merge_apply", "column_profile",
    "compact_multifile", "compact_roundtrip", "embedding_int8_quant",
    "feature_hashing", "filter_funnel", "hard_negative_mining",
    "importance_resample", "interval_incident_join", "kmeans_embeddings",
    "ks_drift", "last_touch_attribution", "multimodal_frame_sample",
    "multimodal_resize", "pagerank_event_graph", "pit_feature_join",
    "pmi_collocations", "pq_recall_audit", "revenue_bridge",
    "rfm_segmentation", "rfm_segmentation_cutoffs", "sampled_quantiles",
    "schema_evolution_read", "semantic_contamination", "skew_join_salted",
    "spend_quartiles_cutoffs", "sql_api_report", "streaming_cdc_apply",
    "streaming_dedup_ingest", "streaming_enrich", "streaming_keep_latest",
    "streaming_sliding_rollup", "streaming_upsert_sink",
    "time_to_conversion", "trailing_unique_users", "upsert_roundtrip",
    "variant_extract", "weather_forecast_window", "weather_unit_convert",
    "zorder_pruning", "zorder_pruning_3col",
    # --- (b) oldest-r5 fill (4 slots), name order ---
    "best_snapshot", "bpe_encode", "capped_sessions",
    "cogrouped_asof_pandas",
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
