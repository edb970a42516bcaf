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
# Round 8 window (50) — the staleness rotation the r7 verdict staged
# (item 1: the 46 entries whose newest driver row is still r3 vintage —
# several ride machinery reworked in r5-r7: finalize/storage release,
# the shared _dup_window_spans / exact_jaccard_count extractions, the
# two-phase selection shapes):
# (a) entries whose code or oracle CHANGED in round 8: the two
#     standalone minhash entries now routing band config through the
#     shared threshold derivation (functions.hashing.minhash_band_config
#     — hash-identical output at t=0.8, but the 64x16 fold is now
#     derived, not pinned) and semantic_dedup, whose K oracle twin moved
#     to integer ceiling division (ADVICE r7) and whose derivation
#     gained the centroid-budget gate;
# (b) ALL 46 round-3-vintage entries, name order — after this round no
#     entry's newest driver attestation is older than r4;
# (c) remaining slot: an oldest-r4 row from the sketch/vector family
#     this round touched.
# Names absent from this list keep catalog order after it.
_PRIORITY: list[str] = [
    # --- (a) code- or oracle-changed in round 8 ---
    "dedup_minhash_lsh", "incremental_corpus_dedup", "semantic_dedup",
    # --- (b) the full round-3-vintage tail, name order ---
    "asof_tolerance", "behavior_set_overlap", "bigram_topk",
    "bloom_prefilter_audit", "box_scores_schedule", "bpe_merge_train",
    "brand_max_price", "cohort_retention", "corpus_filter",
    "corrupt_record_audit", "doc_chunking", "domain_topk",
    "dormant_high_balance", "event_cooccurrence",
    "event_transition_matrix", "first_digit_profile", "forecast_revenue",
    "full_outer_reconcile", "funnel_stages", "heavy_hitters_cms",
    "incremental_agg_merge", "inverted_index", "key_skew_profile",
    "kfold_assignment", "late_shipment_audit", "mad_outliers",
    "minmax_scale", "monthly_rank_report", "promo_revenue_share",
    "referential_integrity_audit", "rename_normalize",
    "returned_item_customers", "revenue_gini", "segment_dedup",
    "sequence_packing", "shard_balance", "source_mixture",
    "stratified_sample", "temperature_mixing", "tfidf_top_terms",
    "top_supplier", "trailing_median", "train_test_split",
    "unigram_logprob", "vocab_topk", "zscore_groups",
    # --- (c) oldest-r4 fill (1 slot) ---
    "ann_pq_topk",
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
