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
# Round 12 window (50) — the rotation the r11 verdict staged (item 1):
# (a) containment_join, added round 11 after that round's window was
#     staged — the only catalog entry the driver has never attested
#     (VERDICT r11 "What's missing" #1);
# (b) round-12 additions, never driver-attested, as they land
#     (containment front-door dispatch, containment sketch join +
#     recall audit, unigram-LM tokenizer — VERDICT r11 items 2/3/6);
# (c) as much of the 48-entry r7-vintage cohort (newest attestation r7;
#     reproducible by folding _green over the CORRECTNESS_r*.json
#     files) as fits the remaining slots, name order — entries past
#     slot 50 rotate first in round 13;
# (d) if slots remain, the r8 cohort in name order (starts ann_pq_topk).
# Names absent from this list keep catalog order after it.
#
# Round-13 staging: any r7-cohort tail displaced below by (b), then the
# 50-entry r8 cohort in name order (ann_pq_topk, asof_tolerance,
# behavior_set_overlap, bigram_topk, bloom_prefilter_audit, ...).
_PRIORITY: list[str] = [
    # --- (a) the never-driver-attested round-11 addendum entry ---
    "containment_join",
    # --- (b) round-12 additions, never driver-attested ---
    "similarity_containment_api", "containment_sketch_join",
    "containment_recall_audit", "unigram_lm_train", "unigram_lm_apply",
    "unigram_perplexity_filter",
    # --- (c) the r7-vintage cohort, name order (tail -> round 13) ---
    "ann_ivf_topk", "big_order_customers", "contamination_check",
    "cosine_neardup_lsh", "cosine_neardup_pairs", "csv_roundtrip",
    "dedup_exact_text", "dedup_simhash", "distinct_hll",
    "doc_fingerprint", "doc_length_histogram", "drift_tvd",
    "embedding_topk", "fuzzy_editdist", "json_roundtrip", "lateral_topk",
    "leakage_safe_split", "locf_fill", "lsh_recall_audit",
    "median_value_udaf", "minhash_recall_t05", "multimodal_decode",
    "multimodal_stats", "normalized_dedup", "norms_pandas_udf",
    "odds_flatten", "odds_python_source", "orc_roundtrip", "pii_redact",
    "record_expand_udtf", "repetition_score", "scd2_intervals",
    "scraper_longform", "similarity_join_api", "sliding_windows",
    "streaming_daily_rollup", "streaming_interval_join",
    "streaming_sessionization", "substring_dedup_rewrite",
    "text_quality", "token_counts", "topk_salted", "trailing_7d_sum",
    # r7 tail displaced to round 13 by the six (b) additions (plus
    # ann_pq_topk's spare slot yielding): trimmed_mean, unpivot_metrics,
    # user_event_sequences, winsorized_stats, xlsx_roundtrip
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
