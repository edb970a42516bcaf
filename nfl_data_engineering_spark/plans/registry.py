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
# ROUND-4 ROTATION TODO: front-load the 29 entries added during round 3
# (they sit after _PRIORITY in catalog order and have no driver row yet):
# bucketed_join_colocated, skew_join_salted, interval_incident_join,
# cdc_merge_apply, streaming_cdc_apply, streaming_enrich,
# streaming_upsert_sink, pagerank_event_graph, last_touch_attribution,
# column_profile, ks_drift, multimodal_frame_sample, multimodal_resize,
# bigram_logprob, importance_resample, feature_hashing, compact_roundtrip,
# schema_evolution_read, hard_negative_mining, variant_extract,
# sql_api_report, trailing_unique_users, streaming_dedup_ingest, basket_pair_rules, rfm_segmentation, pit_feature_join, time_to_conversion, ab_test_report, revenue_bridge — all parity-green locally at sf0.001/0.01/0.1 plus the
# nanos-timestamp/EST robustness sweep (SCALE.md round-3 section).
#
# Round 3:
# the 45 entries that have never had a driver-green row (they passed the
# rounds 1-2 windows' cut — all are local-parity green), then the two
# entries that gained oracles this round (zscore_groups, multimodal_decode
# — their only prior rows were err:no_oracle), the new S8 connector entry,
# and the two entries whose semantics changed this round (asof_tolerance's
# microsecond tolerance gate, streaming_keep_latest's deterministic
# tiebreak) so the driver re-verifies them. Rounds 1-2 green entries
# follow. Names absent from this list keep catalog order after it.
_PRIORITY: list[str] = [
    # --- round-3 window (50) ---
    # never driver-checked: LLM text/sketch pipeline tail
    "domain_topk", "doc_chunking", "segment_dedup", "inverted_index",
    "heavy_hitters_cms", "bloom_prefilter_audit",
    # never driver-checked: training-pipeline
    "stratified_sample", "train_test_split", "vocab_topk", "tfidf_top_terms",
    "sequence_packing", "source_mixture", "temperature_mixing",
    "bpe_merge_train", "corpus_filter", "shard_balance",
    "unigram_logprob", "bigram_topk", "kfold_assignment", "rename_normalize",
    # never driver-checked: relational (subquery/audit surface)
    "brand_max_price", "top_supplier", "big_order_customers",
    "dormant_high_balance", "promo_revenue_share", "trimmed_mean",
    "full_outer_reconcile", "minmax_scale", "forecast_revenue",
    "returned_item_customers", "corrupt_record_audit", "monthly_rank_report",
    "behavior_set_overlap", "trailing_median", "funnel_stages",
    "cohort_retention", "late_shipment_audit", "event_cooccurrence",
    "mad_outliers", "event_transition_matrix", "revenue_gini",
    "incremental_agg_merge", "first_digit_profile", "key_skew_profile",
    "referential_integrity_audit",
    # newly oracled / new / semantics changed this round
    "zscore_groups", "multimodal_decode", "box_scores_schedule",
    "asof_tolerance", "streaming_keep_latest",
    # --- round-2 green (re-verify after the window) ---
    "record_split", "json_extract", "trailing_7d_sum", "user_event_sequences",
    "upsert_roundtrip", "csv_roundtrip", "json_roundtrip", "orc_roundtrip",
    "xlsx_roundtrip", "odds_flatten", "odds_python_source",
    "scraper_longform",
    "embedding_topk", "ann_ivf_topk", "ann_ivf_multiprobe",
    "cosine_neardup_pairs",
    "cosine_neardup_lsh", "embedding_dedup_components", "lsh_recall_audit",
    "norms_pandas_udf", "median_value_udaf",
    "record_expand_udtf", "streaming_daily_rollup",
    "streaming_interval_join",
    "streaming_sessionization", "topk_salted",
    "winsorized_stats", "drift_tvd", "distinct_hll",
    "dedup_exact_text", "dedup_minhash_lsh", "dedup_components",
    "dedup_survivor_table",
    "ngram_jaccard_pairs", "dedup_simhash", "lang_id", "text_quality",
    "token_counts", "doc_fingerprint", "multimodal_stats",
    "repetition_score", "fuzzy_editdist", "doc_length_histogram",
    "pii_redact", "normalized_dedup", "contamination_check",
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
