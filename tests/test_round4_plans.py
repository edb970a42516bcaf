"""Semantic tests for the round-4 catalog additions (beyond the DuckDB
parity gate): incremental-ingest dedup and the PQ recall audit."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfl_data_engineering_spark.plans.textops import (  # noqa: E402
    q_incremental_corpus_dedup)
from nfl_data_engineering_spark.plans.training import (  # noqa: E402
    q_corpus_filter, q_filter_funnel)
from nfl_data_engineering_spark.plans.vector import (  # noqa: E402
    N_QUERIES, TOPK, q_pq_recall_audit)

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_verdicts_are_consistent(spark):
    rows = q_incremental_corpus_dedup(spark, SF).collect()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n_incoming = docs.filter(F.col("doc_id") % 4 == 0).count()
    assert len(rows) == n_incoming          # one verdict per incoming doc

    by_id = {r["doc_id"]: r for r in rows}
    assert all(d % 4 == 0 for d in by_id)   # incoming side only
    for r in rows:
        if r["status"] == "new":
            assert r["ref_doc_id"] == -1
        else:
            # refs point INTO the existing corpus, never at the batch
            assert r["ref_doc_id"] % 4 != 0
            assert r["ref_doc_id"] != r["doc_id"]

    # exact layer ground truth: incoming doc is exact_dup iff an existing
    # doc holds byte-identical text, and the ref is the MIN such doc
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    existing_by_text = {}
    for d, t in texts.items():
        if d % 4 != 0:
            existing_by_text.setdefault(t, []).append(d)
    for r in rows:
        matches = existing_by_text.get(texts[r["doc_id"]], [])
        if matches:
            assert r["status"] == "exact_dup"
            assert r["ref_doc_id"] == min(matches)
        else:
            assert r["status"] != "exact_dup"


def test_filter_funnel_is_a_consistent_pipeline(spark):
    rows = {r["stage"]: r for r in q_filter_funnel(spark, SF).collect()}
    order = ["exact_dedup", "lang_id", "quality_score", "repetition"]
    assert sorted(rows) == sorted(order)
    docs_n = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
              .count())
    assert rows[order[0]]["n_in"] == docs_n
    for a, b in zip(order, order[1:]):
        assert rows[a]["n_out"] == rows[b]["n_in"]     # stages chain
        assert rows[a]["n_in"] - rows[a]["n_dropped"] == rows[a]["n_out"]
    # the funnel's final survivors == the composed filter's verdict
    assert rows["repetition"]["n_out"] == q_corpus_filter(spark, SF).count()


def test_pq_recall_audit_shape_and_bounds(spark):
    rows = q_pq_recall_audit(spark, SF).collect()
    emb_ids = {r["vec_id"] for r in
               spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
               .select("vec_id").collect()}
    expect_q = {v for v in emb_ids if v < N_QUERIES}
    assert {r["q_id"] for r in rows} == expect_q
    for r in rows:
        assert r["k"] == TOPK
        assert 0 <= r["n_hits"] <= r["k"]
        assert r["recall_ppm"] == r["n_hits"] * 1_000_000 // r["k"]
    # the audit must be able to detect loss: PQ at 4 subspaces over label
    # cells is lossy, so perfect recall everywhere would mean the exact
    # side and the approximate side are accidentally the same query
    assert any(r["n_hits"] < r["k"] for r in rows) or len(rows) == 0
