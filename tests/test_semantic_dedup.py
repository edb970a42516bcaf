"""semantic_dedup (plans/vector.py): SemDeDup-style cluster-scoped
embedding dedup. Invariants: the survivor table covers the corpus
one-row-per-vector, canonical ids are component minima (never above the
member id), linked groups never span clusters (pairs are within-cluster
by construction — the paper's tractability trade), and the near-dup test
corpus must yield real multi-member groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl_data_engineering_spark.plans.base import load
from nfl_data_engineering_spark.plans.registry import _BY_NAME


def test_semantic_dedup_invariants(spark, sf_dir):
    out = _BY_NAME["semantic_dedup"].spark(spark, sf_dir).cache()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert out.count() == n_vecs
    assert out.filter(F.col("canonical_vec_id") > F.col("vec_id")).count() == 0
    assert out.filter(
        (F.col("is_survivor") == 1)
        != (F.col("canonical_vec_id") == F.col("vec_id"))).count() == 0
    # a canonical id IS a member: its own row must be a survivor in the
    # SAME cluster (components cannot span clusters)
    canon_rows = out.select(F.col("vec_id").alias("canonical_vec_id"),
                            F.col("cluster").alias("canon_cluster"),
                            F.col("is_survivor").alias("canon_surv"))
    joined = out.join(canon_rows, "canonical_vec_id")
    assert joined.count() == n_vecs
    assert joined.filter(F.col("canon_surv") != 1).count() == 0
    assert joined.filter(F.col("cluster") != F.col("canon_cluster")).count() == 0
    # the testdata corpus has embedding near-dups (same gate as the SRP
    # family) — a semantic dedup that drops nothing is broken
    assert out.filter(F.col("is_survivor") == 0).count() > 0
    out.unpersist()


def test_semdedup_k_derivation_and_cap():
    """K grows with corpus size (ceil(n/2500), floored at the report
    entry's 8) and fails LOUDLY past the centroid-budget gate
    (VERDICT r7 item 4) instead of silently collecting a centroid table
    the driver/broadcast budget cannot hold."""
    import pytest

    from nfl_data_engineering_spark.plans.vector import (SEMDEDUP_MAX_K,
                                                         _semdedup_k)
    assert _semdedup_k(0) == 8
    assert _semdedup_k(20_000) == 8          # test-SF scale: unchanged
    assert _semdedup_k(2_501) == 8
    assert _semdedup_k(25_000) == 10
    assert _semdedup_k(100_000_000) == 40_000   # the paper's regime
    assert _semdedup_k(2500 * SEMDEDUP_MAX_K) == SEMDEDUP_MAX_K  # boundary
    with pytest.raises(ValueError, match="two-level clustering"):
        _semdedup_k(2500 * SEMDEDUP_MAX_K + 1)
