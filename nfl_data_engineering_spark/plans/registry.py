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
# Round 7 window (50) — the staleness rotation the r6 verdict staged
# (item 2: the 42 entries whose newest driver row is still r1/r2
# vintage; several share machinery refactored in r4-r6 — SRP bands,
# simhash chunking now also feeding similarity_api.py):
# (a) entries ADDED or semantically CHANGED in round 7: the
#     leakage_safe_split rescued-docs fix (ADVICE r6 medium — the metric
#     now compares resulting SPLITS, not raw buckets), the new
#     second-threshold recall audit for the derived band config, and the
#     front door whose minhash/simhash/prefix kernels changed;
# (b) the 5 round-1-vintage then 37 round-2-vintage entries, name order;
# (c) remaining slots: oldest round-3 rows touching this round's themes
#     (the big_order_customers bench-drift check, the local-scale
#     trimmed_mean baseline, multimodal, as-of tolerance, BPE).
# Names absent from this list keep catalog order after it.
_PRIORITY: list[str] = [
    # --- (a) new or code-changed in round 7 ---
    "leakage_safe_split", "minhash_recall_t05", "similarity_join_api",
    "substring_dedup_rewrite", "semantic_dedup",
    # --- (b) round-1 then round-2 vintage driver rows ---
    "lateral_topk", "locf_fill", "scd2_intervals", "sliding_windows",
    "unpivot_metrics",
    "ann_ivf_multiprobe", "ann_ivf_topk", "contamination_check",
    "cosine_neardup_lsh", "cosine_neardup_pairs", "csv_roundtrip",
    "dedup_exact_text", "dedup_simhash", "distinct_hll",
    "doc_fingerprint", "doc_length_histogram", "drift_tvd",
    "embedding_topk", "fuzzy_editdist", "json_roundtrip",
    "lsh_recall_audit", "median_value_udaf", "multimodal_stats",
    "normalized_dedup", "norms_pandas_udf", "odds_flatten",
    "odds_python_source", "orc_roundtrip", "pii_redact",
    "record_expand_udtf", "repetition_score", "scraper_longform",
    "streaming_daily_rollup", "streaming_interval_join",
    "streaming_sessionization", "text_quality", "token_counts",
    "topk_salted", "trailing_7d_sum", "user_event_sequences",
    "winsorized_stats", "xlsx_roundtrip",
    # --- (c) oldest round-3 rows (3 slots after the round-7 additions) ---
    "big_order_customers", "trimmed_mean", "multimodal_decode",
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
