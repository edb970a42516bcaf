"""Semantic tests for the context-assembly, inverted-index, and
Q21-shape/co-occurrence catalog queries (beyond the DuckDB parity gate)."""

from __future__ import annotations

import datetime as dt
import os


from nfl_data_engineering_spark.plans.relational import (  # noqa: E402
    q_event_cooccurrence, q_late_shipment_audit)
from nfl_data_engineering_spark.plans.textops import (  # noqa: E402
    CHUNK_CHARS, MIN_POSTINGS_DF, q_doc_chunking, q_inverted_index)
from nfl_data_engineering_spark.plans.training import (  # noqa: E402
    PACK_WINDOW_TOKENS, q_sequence_packing)

SF = "/root/testdata/sf0.001"


def test_doc_chunking_covers_every_char_exactly_once(spark):
    import pyspark.sql.functions as F
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    expected = {r["doc_id"]: r["n"] for r in
                docs.select("doc_id", F.length("text").alias("n")).collect()}
    per_doc = (q_doc_chunking(spark, SF)
               .groupBy("doc_id")
               .agg(F.sum("chunk_chars").alias("total_chars"),
                    F.count("*").alias("n_chunks"),
                    F.max("chunk_idx").alias("max_idx")).collect())
    assert len(per_doc) == len(expected)
    for r in per_doc:
        n = expected[r["doc_id"]]
        assert r["total_chars"] == n
        want_chunks = max(-(-n // CHUNK_CHARS), 1)
        assert r["n_chunks"] == want_chunks
        assert r["max_idx"] == want_chunks - 1


def test_sequence_packing_conserves_tokens_and_is_contiguous(spark):
    import pyspark.sql.functions as F
    from nfl_data_engineering_spark.functions.text import tokens
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    totals = {r["source"]: r["t"] for r in
              docs.groupBy("source")
              .agg(F.sum(F.size(tokens(F.col("text")))).alias("t")).collect()}
    rows = q_sequence_packing(spark, SF).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(totals)
    for source, packs in by_source.items():
        packs.sort(key=lambda r: r["pack_seq"])
        # conservation: every token lands in exactly one pack
        assert sum(p["pack_tokens"] for p in packs) == totals[source]
        # pack ids are 0..max with no holes
        assert [p["pack_seq"] for p in packs] == list(range(len(packs)))
        # every non-final pack crosses its window boundary (concat-and-split:
        # a pack closes only once the running sum passes the window edge)
        for p in packs[:-1]:
            assert p["pack_tokens"] >= 1
        # doc ranges don't overlap between consecutive packs
        for a, b in zip(packs, packs[1:]):
            assert a["last_doc"] < b["first_doc"]
        assert all(p["pack_tokens"] <= PACK_WINDOW_TOKENS + 10_000
                   for p in packs)  # bounded by window + one max-doc overhang


def test_inverted_index_postings_match_doc_freq(spark):
    rows = q_inverted_index(spark, SF).collect()
    assert rows, "sf0.001 corpus must yield at least one common term"
    for r in rows:
        assert r["doc_freq"] >= MIN_POSTINGS_DF
        postings = [int(d) for d in r["postings"].split("|")]
        assert len(postings) == r["doc_freq"]
        assert postings == sorted(postings)
        assert len(set(postings)) == len(postings)
        assert r["coll_freq"] >= r["doc_freq"]


def test_cms_estimate_never_underestimates(spark):
    from nfl_data_engineering_spark.plans.textops import (CMS_TOPK,
                                                          q_heavy_hitters_cms)
    rows = q_heavy_hitters_cms(spark, SF).collect()
    assert len(rows) == CMS_TOPK
    for r in rows:
        # count-min property: estimate is exact count plus collision mass
        assert r["cms_est"] >= r["exact_n"]


def test_bloom_prefilter_has_no_false_negatives(spark):
    from nfl_data_engineering_spark.plans.textops import q_bloom_prefilter_audit
    rows = q_bloom_prefilter_audit(spark, SF).collect()
    assert rows, "sf0.001 must yield at least one eval doc"
    for r in rows:
        assert 0 <= r["n_exact_matches"] <= r["n_bloom_candidates"]
        assert r["n_bloom_candidates"] <= r["n_shingles"]
        assert r["n_false_positives"] == (
            r["n_bloom_candidates"] - r["n_exact_matches"])


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(str(tmp_path), f"{name}.parquet"))


def test_late_shipment_audit_sole_late_shipper_only(spark, tmp_path):
    d0 = dt.datetime(2025, 1, 1)
    late = d0 + dt.timedelta(days=120)
    ontime = d0 + dt.timedelta(days=10)
    _write(spark, tmp_path, "orders",
           [(1, d0), (2, d0), (3, d0)], "o_orderkey long, o_orderdate timestamp")
    _write(spark, tmp_path, "lineitem",
           [
               # order 1: supplier 10 late, supplier 20 on time -> 10 counted
               (1, 10, late), (1, 20, ontime),
               # order 2: both suppliers late -> nobody counted
               (2, 10, late), (2, 20, late),
               # order 3: single-supplier order, late -> not counted
               (3, 30, late),
           ],
           "l_orderkey long, l_suppkey long, l_shipdate timestamp")
    _write(spark, tmp_path, "supplier",
           [(10, "s10"), (20, "s20"), (30, "s30")],
           "s_suppkey long, s_name string")
    out = {(r["s_suppkey"], r["numwait"])
           for r in q_late_shipment_audit(spark, str(tmp_path)).collect()}
    assert out == {(10, 1)}


def test_event_cooccurrence_counts_users_not_events(spark, tmp_path):
    _write(spark, tmp_path, "events",
           [
               # user 1 does a twice and b once -> (a,b) counted ONCE
               (1, "a"), (1, "a"), (1, "b"),
               # user 2 does a and c
               (2, "a"), (2, "c"),
               # user 3 does only b
               (3, "b"),
           ],
           "user_id long, event_type string")
    out = {(r["type_a"], r["type_b"]): r["n_users"]
           for r in q_event_cooccurrence(spark, str(tmp_path)).collect()}
    assert out == {("a", "b"): 1, ("a", "c"): 1}


def test_quality_survivors_pick_longest_then_min_id(spark, sf_dir):
    """dedup_quality_survivors: within every near-dup component the
    survivor must hold the component's MAX n_chars (min doc_id among
    ties), every member of a component shares that one survivor, and
    singletons survive as themselves — the keep-the-most-complete-copy
    rule, vs dedup_survivor_table's min-id canonical."""
    from nfl_data_engineering_spark.plans.base import load, release_deferred
    from nfl_data_engineering_spark.plans.registry import _BY_NAME

    rows = _BY_NAME["dedup_quality_survivors"].spark(spark, sf_dir).collect()
    release_deferred()
    chars = {r["doc_id"]: r["n_chars"]
             for r in load(spark, sf_dir, "documents")
             .select("doc_id", "n_chars").collect()}
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    assert len(rows) == len(chars)          # one row per document
    saw_multi = False
    for comp, members in by_comp.items():
        survivors = {m["survivor_doc_id"] for m in members}
        assert len(survivors) == 1          # one survivor per component
        s = survivors.pop()
        best = max(chars[m["doc_id"]] for m in members)
        tied = [m["doc_id"] for m in members if chars[m["doc_id"]] == best]
        assert s == min(tied)               # longest, then min id
        assert {m["doc_id"]: m["is_survivor"] for m in members} == {
            m["doc_id"]: int(m["doc_id"] == s) for m in members}
        if len(members) > 1:
            saw_multi = True
        else:
            assert s == members[0]["doc_id"]   # singleton survives itself
    assert saw_multi, "testdata should contain at least one dup cluster"


def test_containment_join_asymmetry(spark, tmp_path):
    """The containment gate is ASYMMETRIC: a short doc fully quoted
    inside a longer wrapper emits (sub=short, super=long) at 1000
    per-mille and NOT the reverse direction (the wrapper's extra
    shingles dilute containment below the 90% gate) — the exact
    near-superset case symmetric jaccard cannot catch. Exact duplicates
    emit both directions."""
    import os as _os

    import pandas as pd
    short = "a b c d e f g h i j"                       # 8 shingles
    wrapper = "x y z " + short + " p q r"               # superset + extras
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [short, wrapper, "u v w q s t u v w", short],
        "lang": ["en"] * 4, "source": ["t"] * 4,
        "n_chars": [len(short), len(wrapper), 17, len(short)],
    })
    d = str(tmp_path / "docs")
    _os.makedirs(d, exist_ok=True)
    docs.to_parquet(_os.path.join(d, "documents.parquet"))
    from nfl_data_engineering_spark.plans.textops import q_containment_join
    rows = {(r["sub_doc_id"], r["super_doc_id"]): r["containment_x1000"]
            for r in q_containment_join(spark, d).collect()}
    assert rows[(1, 2)] == 1000          # short fully inside wrapper
    assert (2, 1) not in rows            # wrapper NOT inside short
    assert rows[(1, 4)] == 1000 and rows[(4, 1)] == 1000  # exact dupes
    assert not any(3 in k for k in rows) # unrelated doc pairs with nobody
