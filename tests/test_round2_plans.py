"""Semantic tests for the round-2 catalog additions (beyond the DuckDB
parity gate): streaming stateful/join entries, segment dedup, temperature
mixing, winsorized stats, salted top-k, embedding components."""

from __future__ import annotations

import os

import pyspark.sql.functions as F


from nfl_data_engineering_spark.plans.relational import (  # noqa: E402
    q_lateral_topk, q_topk_salted, q_winsorized_stats)
from nfl_data_engineering_spark.plans.textops import (  # noqa: E402
    SEGMENT_TOKENS, q_segment_dedup)
from nfl_data_engineering_spark.plans.training import (  # noqa: E402
    q_streaming_interval_join, q_streaming_keep_latest, q_temperature_mixing)

SF = "/root/testdata/sf0.001"


def test_streaming_keep_latest_matches_batch(spark):
    got = {(r["user_id"], r["event_type"]): (r["ts"], r["value"])
           for r in q_streaming_keep_latest(spark, SF).collect()}
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    from pyspark.sql import Window
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc())
    want = {(r["user_id"], r["event_type"]): (r["ts"], r["value"])
            for r in ev.withColumn("rn", F.row_number().over(w))
                       .filter("rn = 1").collect()}
    assert len(got) == len(want)
    for k, (ts, v) in want.items():
        gts, gv = got[k]
        # stream path casts NTZ->LTZ; compare wall-clock values
        assert gts.replace(tzinfo=None) == ts.replace(tzinfo=None)
        assert gv == v


def test_streaming_interval_join_bounds(spark):
    rows = q_streaming_interval_join(spark, SF).collect()
    assert rows, "expected purchase<-click pairs at sf0.001"
    for r in rows:
        delta = (r["purchase_ts"] - r["click_ts"]).total_seconds()
        assert 0 < delta <= 3600


def test_segment_dedup_accounting(spark):
    rows = q_segment_dedup(spark, SF).collect()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["n_removed"] <= r["n_segments"]
        assert 0 <= r["tokens_removed"] <= r["n_tokens"]
        # a full segment holds SEGMENT_TOKENS tokens; the last may be short
        # (and a zero-token doc still counts one empty segment)
        assert r["n_tokens"] <= r["n_segments"] * SEGMENT_TOKENS
        assert r["n_tokens"] >= r["n_segments"] * SEGMENT_TOKENS - SEGMENT_TOKENS


def test_temperature_mixing_upweights_small_sources(spark):
    rows = q_temperature_mixing(spark, SF).collect()
    assert rows
    total_ppm_kept = {r["source"]: r["rate_ppm"] for r in rows}
    counts = {r["source"]: r["n_docs"] for r in rows}
    # sqrt weighting: per-doc keep rate must be higher for smaller sources
    small = min(counts, key=counts.get)
    big = max(counts, key=counts.get)
    if counts[small] < counts[big]:
        assert total_ppm_kept[small] >= total_ppm_kept[big]
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]


def test_topk_salted_equals_lateral_topk(spark):
    salted = {(r["o_custkey"], r["o_orderkey"])
              for r in q_topk_salted(spark, SF).collect()}
    lateral = {(r["c_custkey"], r["o_orderkey"])
               for r in q_lateral_topk(spark, SF).collect()}
    assert salted == lateral


def test_winsorized_avg_between_bounds(spark):
    for r in q_winsorized_stats(spark, SF).collect():
        assert r["p01"] <= r["winsorized_avg"] <= r["p99"]
        assert r["p01"] <= r["p99"]


def test_bpe_greedy_merge_run_parity(spark, tmp_path):
    # 'x x x' with best pair (x,x) must merge left-to-right greedily:
    # [x_x, x], never [x, x_x] or [x_x, x_x]
    import pandas as pd
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["x x x", "x x x x y"],
        "lang": ["en", "en"], "source": ["t", "t"], "n_chars": [5, 9],
    })
    d = str(tmp_path / "docs")
    import os as _os
    _os.makedirs(d, exist_ok=True)
    docs.to_parquet(_os.path.join(d, "documents.parquet"))
    from nfl_data_engineering_spark.plans.training import q_bpe_merge_train
    rows = {r["step"]: r for r in q_bpe_merge_train(spark, d).collect()}
    # step 1: (x, x) occurs 2+3=5 times as adjacent pairs -> merged
    # greedily: doc1 [x_x, x] (1 merge), doc2 [x_x, x_x, y] (2 merges)
    assert rows[1]["left_tok"] == "x" and rows[1]["right_tok"] == "x"
    assert rows[1]["n_merged"] == 3
    # step 2: best remaining pair is (x_x, x) [doc1] vs (x_x, x_x) [doc2]
    # vs (x_x, y) [doc2] — each count 1; lexicographic tiebreak picks
    # ('x_x', 'x')
    assert (rows[2]["left_tok"], rows[2]["right_tok"]) == ("x_x", "x")
    assert rows[2]["n_merged"] == 1


def test_approx_percentile_within_rank_error(spark):
    # the 100 TB percentile path (SCALE.md prescribes approx_percentile for
    # the trimmed-mean bounds at scale): its result must sit within the
    # sketch's documented rank-error bound of the exact order statistic
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    acc = 1000  # rank error <= n / acc
    rows = (ev.groupBy("event_type")
            .agg(F.expr(f"approx_percentile(value, 0.5, {acc})").alias("ap"),
                 F.expr("percentile(value, 0.5)").alias("exact"),
                 F.count("value").alias("n"),
                 F.expr("sort_array(collect_list(value))").alias("vs"))
            .collect())
    for r in rows:
        vs, n = r["vs"], r["n"]
        # rank of the approx answer must be within n/acc of n/2
        import bisect
        lo = bisect.bisect_left(vs, r["ap"])
        hi = bisect.bisect_right(vs, r["ap"])
        target = n / 2
        err_budget = max(n / acc, 1.0)
        assert lo - err_budget <= target <= hi + err_budget, \
            (r["event_type"], lo, hi, target)


def test_hll_estimate_within_4_sigma(spark):
    # the entry exposes the RAW estimate + n_zero_regs so consumers apply
    # the standard linear-counting small-range correction — do exactly
    # that here, then gate at 4x the ~6.5% relative stdev of m=256
    # (simulated -0.6% +/- 6.1% over 30 trials with this exact pipeline)
    import math
    from nfl_data_engineering_spark.plans.relational import (HLL_M,
                                                             q_distinct_hll)
    for r in q_distinct_hll(spark, SF).collect():
        est, zeros = r["hll_estimate"], r["n_zero_regs"]
        if est <= 2.5 * HLL_M and zeros > 0:
            est = HLL_M * math.log(HLL_M / zeros)
        rel = abs(est - r["exact_distinct"]) / r["exact_distinct"]
        assert rel < 0.26, (r["event_type"], est, rel)
        assert 0 <= zeros <= HLL_M


def test_asof_null_value_on_matched_row_stays_null(spark):
    # the matched (newest in-tolerance) right row has value NULL: the
    # output must be NULL, not an older non-null value (DuckDB ASOF JOIN /
    # pandas merge_asof row-consistent semantics)
    import datetime as dt
    from nfl_data_engineering_spark.operators.joins import asof_join
    T = dt.datetime
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 30))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 9, 0), 5.0),
         (1, T(2024, 1, 1, 10, 0), None)],
        "k long, ts timestamp, v double")
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    assert out[0]["v_asof"] is None
    # with a 1h tolerance the 10:00 NULL row is still the match -> NULL
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"],
                    tolerance_s=3600).collect()
    assert out[0]["v_asof"] is None
    # tolerance tighter than the 30-min gap -> no match -> NULL as well
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"],
                    tolerance_s=60).collect()
    assert out[0]["v_asof"] is None
    # non-null matched row inside tolerance passes through
    right2 = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0), 7.5)], "k long, ts timestamp, v double")
    out = asof_join(left, right2, ["k"], "ts", "ts", ["v"],
                    tolerance_s=3600).collect()
    assert out[0]["v_asof"] == 7.5


def test_asof_tolerance_subsecond_boundary(spark):
    # a gap of tolerance + 0.8s must be STALE: timestampdiff(SECOND) would
    # truncate 3600.8s -> 3600 and wrongly pass it (oracle semantics are
    # c.ts >= p.ts - INTERVAL 3600 SECOND, exact)
    import datetime as dt
    from nfl_data_engineering_spark.operators.joins import asof_join
    T = dt.datetime
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 11, 0, 0, 800000))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0, 0, 0), 5.0)],
        "k long, ts timestamp, v double")
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"],
                    tolerance_s=3600).collect()
    assert out[0]["v_asof"] is None  # 3600.8s > 3600s -> stale
    # exactly at the bound (inclusive, matching the oracle's >=) -> fresh
    left2 = spark.createDataFrame(
        [(1, T(2024, 1, 1, 11, 0, 0, 0))], "k long, ts timestamp")
    out = asof_join(left2, right, ["k"], "ts", "ts", ["v"],
                    tolerance_s=3600).collect()
    assert out[0]["v_asof"] == 5.0
