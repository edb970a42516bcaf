"""exact_substring_spans (plans/textops.py): substring-level duplicate
span audit. Invariants: merged spans are disjoint coverage inside the
doc (so dup_tokens <= n_tokens and each span covers >= SPAN_TOKENS
tokens), short docs have no windows, and the near-dup test corpus must
show real substring duplication."""

from __future__ import annotations

from nfl_data_engineering_spark.plans.registry import _BY_NAME
from nfl_data_engineering_spark.plans.textops import SPAN_TOKENS


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
