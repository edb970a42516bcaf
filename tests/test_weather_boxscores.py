"""Connector tests for the weather (S7) and box-score (S8) sources —
deterministic fake fetchers, no network.

Fetchers are defined INSIDE each test body: cloudpickle must serialize
them by value (tests/ is not importable on Spark workers).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest


from nfl_data_engineering_spark.sources.box_scores import (  # noqa: E402
    SCHEDULE_COLUMNS, season_schedules, write_schedule_csv)
from nfl_data_engineering_spark.sources.weather import (  # noqa: E402
    convert_units, fetch_hourly_forecast, fetch_hourly_observations,
    forecast_frame, forecast_window, get_historical_weather,
    get_weather_forecast, hourly_frame)

START, END = "2025-01-01 00:00:00", "2025-01-02 00:00:00"


def _mk_locations(spark):
    return spark.createDataFrame(
        [("den", 39.7, -105.0, "America/Denver"),
         ("gb", 44.5, -88.1, "America/Chicago")],
        "loc_id string, lat double, lon double, tz string")


def _mk_fake_weather():
    def fake(lat, lon, start, end):
        import pandas as pd
        # only 20 of 24 hours (gaps at 5,11,17,23); temp = lat + hour
        hours = [h for h in range(24) if h % 6 != 5]
        return pd.DataFrame({
            "ts_utc": [f"2025-01-01 {h:02d}:00:00" for h in hours],
            "temperature_2m": [lat + h for h in hours],
            "windspeed_10m": [10.0] * len(hours),
            "precipitation": [0.0] * len(hours),
        })
    return fake


def test_weather_spine_is_complete_with_null_gaps(spark):
    locs = _mk_locations(spark)
    obs = fetch_hourly_observations(locs, START, END,
                                    fetcher=_mk_fake_weather())
    frame = hourly_frame(locs, obs, START, END)
    rows = frame.collect()
    assert len(rows) == 2 * 24  # full spine, both locations
    by_loc = {}
    for r in rows:
        by_loc.setdefault(r["loc_id"], []).append(r)
    for loc, lrs in by_loc.items():
        assert len(lrs) == 24
        gaps = sorted(r["ts_utc"].hour for r in lrs
                      if r["temperature_2m"] is None)
        assert gaps == [5, 11, 17, 23]  # API gaps surface as NULL, not absence


def test_weather_tz_localization_per_row(spark):
    locs = _mk_locations(spark)
    obs = fetch_hourly_observations(locs, START, END,
                                    fetcher=_mk_fake_weather())
    frame = hourly_frame(locs, obs, START, END)
    r = {(x["loc_id"], x["ts_utc"].hour): x["ts_local"] for x in frame.collect()}
    # Jan 1: Denver = UTC-7, Green Bay (Chicago) = UTC-6
    assert r[("den", 12)] == dt.datetime(2025, 1, 1, 5, 0)
    assert r[("gb", 12)] == dt.datetime(2025, 1, 1, 6, 0)


def test_weather_retry_recovers_from_transient_failures(spark, tmp_path):
    marker = str(tmp_path / "attempts")

    def flaky(lat, lon, start, end):
        import os as _os
        import pandas as pd
        # fail the first two calls (file counter survives across retries)
        with open(marker, "a") as f:
            f.write("x")
        if _os.path.getsize(marker) < 3:
            raise ConnectionError("transient")
        hours = [h for h in range(24) if h % 6 != 5]
        return pd.DataFrame({
            "ts_utc": [f"2025-01-01 {h:02d}:00:00" for h in hours],
            "temperature_2m": [lat + h for h in hours],
            "windspeed_10m": [10.0] * len(hours),
            "precipitation": [0.0] * len(hours),
        })

    locs = _mk_locations(spark).limit(1).coalesce(1)
    obs = fetch_hourly_observations(locs, START, END, fetcher=flaky)
    assert obs.count() == 20
    with open(marker) as f:
        assert len(f.read()) >= 3  # it actually retried


def test_weather_default_fetcher_raises(spark):
    locs = _mk_locations(spark)
    obs = fetch_hourly_observations(locs, START, END, fetcher=None, retries=1)
    with pytest.raises(Exception, match="NotImplementedError|fetcher"):
        obs.count()


def test_convert_units_values_and_validation(spark):
    locs = _mk_locations(spark).limit(1)
    obs = fetch_hourly_observations(locs, START, END,
                                    fetcher=_mk_fake_weather())
    conv = convert_units(obs)  # defaults mirror the reference: F/mph/inch
    r = conv.filter("hour(ts_utc) = 0").first()
    assert r["temperature_2m"] == pytest.approx((39.7) * 9 / 5 + 32)
    assert r["windspeed_10m"] == pytest.approx(10.0 / 1.609344)
    assert r["precipitation"] == 0.0
    # identity path: native units request changes nothing
    same = convert_units(obs, "celsius", "kmh", "mm")
    assert same.first()["windspeed_10m"] == 10.0
    with pytest.raises(ValueError, match="temperature_unit"):
        convert_units(obs, temperature_unit="kelvin")
    with pytest.raises(ValueError, match="wind_speed_unit"):
        convert_units(obs, wind_speed_unit="knots")
    with pytest.raises(ValueError, match="precipitation_unit"):
        convert_units(obs, precipitation_unit="cm")


def test_get_historical_weather_reference_default_units(spark):
    """The reference one-call contract (weather_client.py:28-56): default
    output is fahrenheit/mph/inch WITHOUT composing convert_units, and the
    frame is spine-complete + localized — get_historical_weather's exact
    signature semantics."""
    locs = _mk_locations(spark)
    frame = get_historical_weather(locs, START, END,
                                   fetcher=_mk_fake_weather())
    assert set(frame.columns) == {"loc_id", "ts_utc", "ts_local",
                                  "temperature_2m", "windspeed_10m",
                                  "precipitation"}
    rows = frame.collect()
    assert len(rows) == 2 * 24            # spine survives the conversion
    r = {(x["loc_id"], x["ts_utc"].hour): x for x in rows}
    # fake temp is lat + hour in celsius -> reference default fahrenheit
    assert r[("den", 0)]["temperature_2m"] == pytest.approx(39.7 * 9 / 5 + 32)
    assert r[("den", 0)]["windspeed_10m"] == pytest.approx(10.0 / 1.609344)
    assert r[("den", 5)]["temperature_2m"] is None    # gaps stay NULL
    # native-unit override is still one call
    native = get_historical_weather(locs, START, END,
                                    fetcher=_mk_fake_weather(),
                                    temperature_unit="celsius",
                                    wind_speed_unit="kmh",
                                    precipitation_unit="mm")
    n = {(x["loc_id"], x["ts_utc"].hour): x for x in native.collect()}
    assert n[("den", 0)]["temperature_2m"] == pytest.approx(39.7)


def test_get_weather_forecast_reference_default_units(spark):
    locs = _mk_locations(spark).limit(1)
    frame = get_weather_forecast(locs, START, forecast_days=1,
                                 fetcher=_mk_fake_weather())
    rows = frame.collect()
    assert len(rows) == 24
    got = {r["ts_utc"].hour: r for r in rows}
    assert got[0]["temperature_2m"] == pytest.approx(39.7 * 9 / 5 + 32)
    assert got[0]["windspeed_10m"] == pytest.approx(10.0 / 1.609344)


def test_forecast_window_shape_and_gap_nulls(spark):
    assert forecast_window("2025-01-01 00:00:00", 2) == \
        ("2025-01-01 00:00:00", "2025-01-03 00:00:00")

    def gappy(lat, lon, start, end):
        import pandas as pd
        hours = pd.date_range(pd.Timestamp(start), pd.Timestamp(end),
                              freq="1h", inclusive="left")
        keep = [(ts, i) for i, ts in enumerate(hours) if i % 5 != 2]
        return pd.DataFrame({
            "ts_utc": [ts for ts, _ in keep],
            "temperature_2m": [float(i) for _, i in keep],
            "windspeed_10m": [1.0] * len(keep),
            "precipitation": [0.0] * len(keep),
        })

    locs = _mk_locations(spark)
    obs = fetch_hourly_forecast(locs, START, forecast_days=2, fetcher=gappy)
    frame = forecast_frame(locs, obs, START, forecast_days=2)
    rows = frame.collect()
    assert len(rows) == 2 * 48            # days*24 spine hours per location
    for loc in ("den", "gb"):
        lrs = [r for r in rows if r["loc_id"] == loc]
        gaps = [r for r in lrs if r["temperature_2m"] is None]
        assert len(gaps) == sum(1 for i in range(48) if i % 5 == 2)


def _mk_fake_schedule():
    def fake(year):
        import pandas as pd
        return pd.DataFrame({
            "game_id": [f"{year}-g1", f"{year}-g2"],
            "season": [year, year],
            "week": [1, 2],
            "game_date": [f"{year}-09-07", f"{year}-09-14"],
            "home_team": ["KC", "GB"],
            "away_team": ["DET", "CHI"],
            "home_score": [21, 24],
            "away_score": [20, 10],
        })
    return fake


def test_season_schedules_unions_years(spark):
    df = season_schedules(spark, [2023, 2024, 2025],
                          fetcher=_mk_fake_schedule())
    rows = df.collect()
    assert len(rows) == 6
    assert {r["season"] for r in rows} == {2023, 2024, 2025}
    assert list(df.columns) == list(SCHEDULE_COLUMNS)
    assert df.schema["game_date"].dataType.typeName() == "date"


def test_schedule_csv_roundtrip(spark, tmp_path):
    df = season_schedules(spark, [2024], fetcher=_mk_fake_schedule())
    out = str(tmp_path / "sched_csv")
    write_schedule_csv(df, out)
    back = (spark.read.option("header", True)
            .schema(df.schema).csv(out))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
