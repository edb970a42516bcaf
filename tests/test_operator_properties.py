"""Property-based tests for the engine's custom operators: hypothesis
generates adversarial small inputs and the Spark implementation must agree
with a brute-force Python model of the declared semantics (same upgrade
path as test_clean_properties.py, applied to joins/windows/upserts)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from nfl_data_engineering_spark.operators.dedup import dedup_keep_latest
from nfl_data_engineering_spark.operators.joins import asof_join
from nfl_data_engineering_spark.operators.windows import exp_weighted_mean

KEYS = ("a", "b")

# (key, ts) pairs; right side gets unique (key, ts) so the as-of value is
# well-defined (two right rows at the same instant would tie)
_left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 50)), max_size=12)
_right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 50),
              st.integers(-1000, 1000)),
    max_size=12, unique_by=lambda r: (r[0], r[1]))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=_left_rows, right=_right_rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "key string, ts long, row_id long")
    rdf = spark.createDataFrame(right, "key string, ts long, value long")
    out = asof_join(ldf, rdf, ["key"], "ts", "ts", ["value"])
    got = {r.row_id: r.value_asof for r in out.collect()}
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, got[i], want)


_series = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 100),
              st.floats(-100, 100, allow_nan=False, width=32)),
    max_size=20, unique_by=lambda r: (r[0], r[1]))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_series)
def test_exp_weighted_mean_matches_model(spark, rows):
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    out = exp_weighted_mean(df, ["key"], "ts", "value",
                            decay=0.88, last_n=16)
    got = {r.key: r.ewm_value for r in out.collect()}
    for k in {r[0] for r in rows}:
        hist = sorted([(ts, v) for (kk, ts, v) in rows if kk == k],
                      reverse=True)[:16]
        num = sum(v * 0.88 ** i for i, (_, v) in enumerate(hist))
        den = sum(0.88 ** i for i in range(len(hist)))
        assert math.isclose(got[k], num / den, rel_tol=1e-9), k


_upsert_batches = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 5),     # key, subkey
              st.integers(0, 100), st.integers(-50, 50)),   # ts, value
    max_size=15)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(b1=_upsert_batches, b2=_upsert_batches)
def test_keep_latest_dedup_matches_model(spark, b1, b2):
    """Union of two collection batches + keep-latest == per-key max-ts row
    (ties broken by the larger value via the pinned tiebreak order)."""
    df = spark.createDataFrame(b1 + b2,
                               "key string, subkey int, ts long, value long")
    out = dedup_keep_latest(df, ["key", "subkey"], "ts",
                            tiebreak_cols=["value"])
    got = {(r.key, r.subkey): (r.ts, r.value) for r in out.collect()}
    model: dict = {}
    for k, s, t, v in b1 + b2:
        cur = model.get((k, s))
        if cur is None or (t, v) > cur:
            model[(k, s)] = (t, v)
    assert got == model


# ---------------------------------------------------------------------------
# Binned interval join: bin equi-join + refine must equal the naive theta
# join on arbitrary microsecond timestamps (boundary-heavy by construction)
# ---------------------------------------------------------------------------

_WIN = 1_000  # small window so hypothesis hits boundaries often

_event_times = st.lists(st.integers(0, 5_000), min_size=1, max_size=14)
_error_flags = st.lists(st.booleans(), min_size=1, max_size=14)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(times=_event_times, flags=_error_flags)
def test_binned_interval_join_equals_theta(spark, times, flags):
    rows = [(i, t, bool(f)) for i, (t, f) in
            enumerate(zip(times, flags + [True] * len(times)))]
    df = spark.createDataFrame(rows, "event_id long, us long, is_err boolean")
    windows = (df.filter("is_err")
               .selectExpr("event_id AS wid", "us AS wus")
               .selectExpr("wid", "wus",
                           f"explode(array(wus div {_WIN}, "
                           f"wus div {_WIN} + 1)) AS bin"))
    events = df.selectExpr("event_id", "us", f"us div {_WIN} AS bin")
    binned = (windows.join(events, "bin")
              .filter(f"(us >= wus) AND (us < wus + {_WIN})")
              .select("wid", "event_id"))
    theta = (df.filter("is_err").selectExpr("event_id AS wid", "us AS wus")
             .join(df.selectExpr("event_id", "us"),
                   F.expr(f"(us >= wus) AND (us < wus + {_WIN})"))
             .select("wid", "event_id"))
    assert ({tuple(r) for r in binned.collect()} ==
            {tuple(r) for r in theta.collect()})
