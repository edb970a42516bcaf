"""Semantic tests for the lakehouse/scale-pattern entries (plans/lakeops.py)
beyond the DuckDB parity gate: plan-shape assertions (the scale claims) and
independent recomputation of the statistics."""

from __future__ import annotations


import pandas as pd
import pyspark.sql.functions as F


from nfl_data_engineering_spark.plans.base import load  # noqa: E402
from nfl_data_engineering_spark.plans.lakeops import (  # noqa: E402
    _SALT, q_bucketed_join_colocated, q_cdc_merge_apply, q_column_profile,
    q_interval_incident_join, q_ks_drift, q_last_touch_attribution,
    q_skew_join_salted)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_exchange_free(spark):
    """The whole point of the bucketed layout: with broadcast disabled
    (simulating two big sides), the join over the bucketed tables must be
    a SortMergeJoin with NO shuffle on the join key — the only Exchange
    allowed in the plan is the final small groupBy."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_bucketed_join_colocated(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("orderkey" not in ln for ln in exchanges), \
        f"join-key shuffle survived bucketing: {exchanges}"
    assert "Bucketed: true" in plan


def test_salted_join_matches_plain_join(spark):
    salted = {tuple(r) for r in q_skew_join_salted(spark, SF).collect()}
    cust = load(spark, SF, "customer")
    orders = load(spark, SF, "orders")
    plain = (orders.join(cust, orders.o_custkey == cust.c_custkey)
             .groupBy("c_mktsegment")
             .agg(F.count("*").alias("n_orders"),
                  F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                           .cast("double"), 2).alias("total_price")))
    assert salted == {tuple(r) for r in plain.collect()}


def test_salted_join_replicates_exactly_salt_ways(spark):
    cust_rows = load(spark, SF, "customer").count()
    from nfl_data_engineering_spark.plans.lakeops import load as _ld  # noqa
    replicated = (load(spark, SF, "customer")
                  .select("c_custkey",
                          F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1)))
                           .alias("salt")))
    assert replicated.count() == cust_rows * _SALT


def test_interval_join_covers_every_window(spark):
    hist = q_interval_incident_join(spark, SF).collect()
    n_errors = (load(spark, SF, "events")
                .filter(F.col("event_type") == "error").count())
    # every error window contains at least its own opening event
    assert all(r["n_events"] >= 1 for r in hist)
    assert sum(r["n_windows"] for r in hist) == n_errors


def test_interval_join_matches_theta_join(spark):
    """The binned equi-join must find exactly the pairs the naive range
    predicate defines."""
    ev = load(spark, SF, "events")
    w = (ev.filter(F.col("event_type") == "error")
         .select(F.col("event_id").alias("wid"), F.col("ts").alias("wts")))
    theta = (w.join(ev, (ev.ts >= w.wts) &
                    (ev.ts < w.wts + F.expr("INTERVAL 600 SECOND")))
             .groupBy("wid").agg(F.count("*").alias("n_events"))
             .groupBy("n_events").agg(F.count("*").alias("n_windows")))
    assert ({tuple(r) for r in theta.collect()} ==
            {tuple(r) for r in q_interval_incident_join(spark, SF).collect()})


def test_cdc_merge_drops_tombstoned_keys(spark):
    out = q_cdc_merge_apply(spark, SF).toPandas().set_index("user_id")
    ev = (load(spark, SF, "events")
          .select("user_id", "ts", "event_id", "event_type", "value")
          .toPandas())
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    last = ev.groupby("user_id").tail(1)
    for _, r in last.iterrows():
        if r["event_type"] == "error":
            assert r["user_id"] not in out.index
        else:
            assert out.loc[r["user_id"], "last_value"] == r["value"]
    counts = ev.groupby("user_id").size()
    for uid in out.index:
        assert out.loc[uid, "op_count"] == counts[uid]


def test_streaming_cdc_matches_batch_collapse(spark):
    """The streaming CDC apply must land on exactly the batch merge-apply
    state — including suppressed (tombstoned) keys."""
    from nfl_data_engineering_spark.plans.lakeops import q_streaming_cdc_apply
    got = {(r["user_id"], r["last_value"])
           for r in q_streaming_cdc_apply(spark, SF).collect()}
    want = {(r["user_id"], r["last_value"])
            for r in q_cdc_merge_apply(spark, SF).collect()}
    assert got == want


def test_streaming_enrich_matches_batch_join(spark):
    from nfl_data_engineering_spark.plans.lakeops import q_streaming_enrich
    got = {tuple(r) for r in q_streaming_enrich(spark, SF).collect()}
    ev = load(spark, SF, "events")
    dim = (ev.filter(F.col("event_type") == "click")
           .groupBy("user_id").agg(F.count("*").alias("n_user_clicks")))
    want = (ev.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "value")
            .join(dim, "user_id", "left")
            .select("event_id", "user_id", "value", "n_user_clicks"))
    assert got == {tuple(r) for r in want.collect()}


def test_pagerank_conserves_mass_and_ranks_sensibly(spark):
    from nfl_data_engineering_spark.plans.lakeops import (
        _PR_N, q_pagerank_event_graph)
    rows = q_pagerank_event_graph(spark, SF).collect()
    assert len(rows) == _PR_N
    total = sum(r["rank_ppb"] for r in rows)
    # damping keeps 0.15 base + 0.85 propagated mass; floor division and
    # dropped dangling mass only ever LOSE ppb, never create it
    assert 0.8 * 1_000_000_000 <= total <= 1_000_000_000
    assert all(r["rank_ppb"] > 0 for r in rows)


def test_last_touch_matches_pandas(spark):
    got = {(r["click_hour"], r["n_purchases"])
           for r in q_last_touch_attribution(spark, SF).collect()}
    ev = (load(spark, SF, "events")
          .filter(F.col("event_type").isin("click", "purchase"))
          .select("user_id", "ts", "event_id", "event_type", "value")
          .toPandas()
          .sort_values(["user_id", "ts", "event_id"]))
    ev["click_ts"] = ev["ts"].where(ev["event_type"] == "click")
    ev["last_click"] = ev.groupby("user_id")["click_ts"].ffill()
    pur = ev[(ev["event_type"] == "purchase") & ev["last_click"].notna()]
    want = pur.groupby(pur["last_click"].dt.hour).size()
    assert got == {(int(h), int(n)) for h, n in want.items()}


def test_column_profile_counts(spark):
    prof = {r["column_name"]: r for r in q_column_profile(spark, SF).collect()}
    orders = load(spark, SF, "orders")
    n = orders.count()
    assert all(r["n_rows"] == n for r in prof.values())
    nd = orders.select(F.countDistinct("o_orderstatus")).first()[0]
    assert prof["o_orderstatus"]["n_distinct"] == nd
    assert prof["o_custkey"]["n_nulls"] == \
        orders.filter(F.col("o_custkey").isNull()).count()


def test_ks_drift_matches_pandas(spark):
    row = q_ks_drift(spark, SF).first()
    # mirror the query's filters exactly: null values carry no order
    # information and are excluded from both ECDF denominators
    ev = (load(spark, SF, "events")
          .filter(F.col("event_type").isin("view", "click") &
                  F.col("value").isNotNull())
          .select("event_type",
                  F.round(F.col("value") * 100).cast("bigint").alias("bin"))
          .toPandas())
    a = ev[ev.event_type == "view"]["bin"]
    b = ev[ev.event_type == "click"]["bin"]
    grid = pd.Series(sorted(set(ev["bin"])))
    ecdf_a = grid.map(lambda x: (a <= x).sum()) / len(a)
    ecdf_b = grid.map(lambda x: (b <= x).sum()) / len(b)
    d = (ecdf_a - ecdf_b).abs().max()
    assert row["n_view"] == len(a) and row["n_click"] == len(b)
    assert abs(row["d_stat"] - round(d, 6)) <= 1e-6
    assert 0.0 <= row["d_stat"] <= 1.0


def test_rfm_scores_partition_customers(spark):
    from nfl_data_engineering_spark.plans.lakeops import q_rfm_segmentation
    rows = q_rfm_segmentation(spark, SF).collect()
    n_cust = (load(spark, SF, "orders")
              .select("o_custkey").distinct().count())
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5


def test_basket_rules_counts_bound_by_supports(spark):
    from nfl_data_engineering_spark.plans.lakeops import q_basket_pair_rules
    li = (load(spark, SF, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    support = {r["l_partkey"]: r["n"]
               for r in li.groupBy("l_partkey")
                          .agg(F.count("*").alias("n")).collect()}
    for r in q_basket_pair_rules(spark, SF).collect():
        assert r["pa"] < r["pb"]
        assert r["pair_n"] <= min(support[r["pa"]], support[r["pb"]])
        assert r["lift_ppm"] >= 0


def test_streaming_dedup_ingest_removes_doubled_input(spark):
    from nfl_data_engineering_spark.plans.lakeops import (
        q_streaming_dedup_ingest)
    got = {r["event_type"]: r["n"]
           for r in q_streaming_dedup_ingest(spark, SF).collect()}
    want = {r["event_type"]: r["n"]
            for r in load(spark, SF, "events").groupBy("event_type")
                     .agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_trailing_unique_users_matches_pandas(spark):
    from nfl_data_engineering_spark.plans.lakeops import (
        q_trailing_unique_users)
    got = {r["day_index"]: r["n_users"]
           for r in q_trailing_unique_users(spark, SF).collect()}
    ev = (load(spark, SF, "events")
          .select(F.col("ts").cast("date").alias("d"), "user_id")
          .toPandas())
    import datetime as dt
    epoch = dt.date(2000, 1, 1)
    pairs = {( (d - epoch).days, u) for d, u in zip(ev["d"], ev["user_id"])}
    want = {}
    for d, u in pairs:
        for td in range(d, d + 7):
            want.setdefault(td, set()).add(u)
    assert got == {td: len(us) for td, us in want.items()}


def test_cents_quantization_is_exact(spark):
    from nfl_data_engineering_spark.plans.base import cents
    df = spark.createDataFrame(
        [(6.55,), (0.0,), (123.45,), (0.01,)], "v double")
    got = [r[0] for r in df.select(cents("v")).collect()]
    assert got == [655, 0, 12345, 1]


def test_ab_test_variants_cover_all_purchasers(spark):
    from nfl_data_engineering_spark.plans.lakeops import q_ab_test_report
    row = q_ab_test_report(spark, SF).first()
    n_purch = (load(spark, SF, "events")
               .filter(F.col("event_type") == "purchase").count())
    assert row["na"] + row["nb"] == n_purch
    assert row["na"] > 0 and row["nb"] > 0


def test_cutoff_twins_have_no_global_window(spark):
    """The percentile-cutoff twins exist to prove the 100 TB path: their
    physical plans must contain NO Window operator (the ntile originals
    funnel through one) and must broadcast the 1-row cutoff frame."""
    from nfl_data_engineering_spark.plans.lakeops import (
        q_rfm_segmentation_cutoffs)
    from nfl_data_engineering_spark.plans.relational import (
        q_spend_quartiles_cutoffs)
    for q in (q_spend_quartiles_cutoffs, q_rfm_segmentation_cutoffs):
        plan = q(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, (q.__name__, plan)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" \
            in plan, (q.__name__, plan)


def test_cutoff_quartiles_agree_with_ntile_on_populations(spark):
    """Value-based cutoff quartiles and ntile quartiles agree up to tie
    blocks: every cutoff-quartile population is within the largest tie
    block of the ntile's N/4."""
    from nfl_data_engineering_spark.plans.relational import (
        q_spend_quartiles_cutoffs)
    rows = q_spend_quartiles_cutoffs(spark, SF).collect()
    n = sum(r["n_customers"] for r in rows)
    n_cust = (load(spark, SF, "orders")
              .select("o_custkey").distinct().count())
    assert n == n_cust                       # partition of all customers
    assert {r["quartile"] for r in rows} <= {1, 2, 3, 4}
    for r in rows:
        assert r["avg_spend_cents"] * r["n_customers"] <= \
            r["sum_spend_cents"] < (r["avg_spend_cents"] + 1) * r["n_customers"]


def test_revenue_bridge_effects_sum_to_total(spark):
    from nfl_data_engineering_spark.plans.lakeops import q_revenue_bridge
    for r in q_revenue_bridge(spark, SF).collect():
        assert (r["volume_effect_cents"] + r["rate_effect_cents"]
                == r["total_delta_cents"])
        assert r["n1"] > 0 and r["n2"] > 0
