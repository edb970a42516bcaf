"""exact_substring_spans / substring_dedup_rewrite (plans/textops.py):
substring-level duplicate span audit and its production rewrite.
Invariants: merged spans are disjoint coverage inside the doc (so
dup_tokens <= n_tokens and each span covers >= SPAN_TOKENS tokens),
short docs have no windows, the near-dup test corpus must show real
substring duplication, and the rewrite must remove exactly the audited
span coverage while reconstructing untouched docs verbatim."""

from __future__ import annotations

import hashlib

from nfl_data_engineering_spark.plans.registry import _BY_NAME
from nfl_data_engineering_spark.plans.textops import SPAN_TOKENS, q_substring_dedup_rewrite


def test_substring_span_invariants(spark, sf_dir):
    rows = _BY_NAME["exact_substring_spans"].spark(spark, sf_dir).collect()
    assert rows, "per-doc report must cover the corpus"
    total_spans = 0
    for r in rows:
        assert 0 <= r["dup_tokens"] <= r["n_tokens"], r
        # every merged span covers at least one full window
        assert r["dup_tokens"] >= SPAN_TOKENS * r["n_dup_spans"], r
        if r["n_tokens"] < SPAN_TOKENS:
            assert r["n_dup_spans"] == 0 == r["dup_tokens"], r
        assert 0 <= r["dup_ppm"] <= 1_000_000, r
        total_spans += r["n_dup_spans"]
    # the testdata corpus contains near-duplicate docs sharing long
    # verbatim runs — a substring audit that finds nothing is broken
    assert total_spans > 0


def test_substring_rewrite_matches_audit(spark, sf_dir):
    """The rewrite drops EXACTLY the token coverage the audit reports
    (removed_tokens == dup_tokens per doc), and an untouched doc's
    cleaned_hash is the md5 of its normalized (lowercased,
    space-joined) tokenization."""
    audit = {r["doc_id"]: r for r in
             _BY_NAME["exact_substring_spans"].spark(spark, sf_dir)
             .collect()}
    rewrite = {r["doc_id"]: r for r in
               q_substring_dedup_rewrite(spark, sf_dir).collect()}
    assert set(audit) == set(rewrite)
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    n_touched = 0
    for doc_id, a in audit.items():
        rw = rewrite[doc_id]
        assert rw["n_tokens"] == a["n_tokens"], doc_id
        assert rw["removed_tokens"] == a["dup_tokens"], doc_id
        assert rw["kept_tokens"] + rw["removed_tokens"] == rw["n_tokens"]
        if a["dup_tokens"] == 0:
            norm = " ".join(docs[doc_id].lower().split())
            assert rw["cleaned_hash"] == hashlib.md5(
                norm.encode()).hexdigest(), doc_id
        else:
            n_touched += 1
    assert n_touched > 0, "rewrite must touch the corpus's near-dup runs"
