"""Distributed weather source: the hourly time-series connector (S7).

The reference pulls Open-Meteo hourly history/forecast per location in one
process with a cached session and retry x5 (weather_client.py:22-24,
28-151 historical, 153-236 forecast), then builds a tz-localized hourly
DatetimeIndex frame (weather_client.py:131-138, 222-232). Here:

- the location list is a DataFrame and the fetch fans out via
  ``mapInPandas`` (one task per location slice) — N locations pull in
  parallel instead of sequentially;
- the hourly index becomes an explicit *spine* per location
  (``sequence(start, end - 1h, interval 1 hour)`` + ``explode`` — the T14
  mapping), and observed rows are LEFT-joined onto it, so missing hours
  surface as NULLs for the gap-fill operators
  (operators/timeseries.py: interpolate_linear / locf) instead of silently
  shrinking the frame;
- timezone handling is a per-row ``from_utc_timestamp(ts, tz)`` — the
  connector stores UTC, localizes at the edge (T13), so frames from
  different venues union cleanly;
- HTTP retry stays connector-side (``_retrying`` mirrors the reference's
  retry x5 exponential backoff) and the fetcher is pluggable — tests and
  offline runs inject a deterministic fake; no network code runs unless a
  caller provides one.

At scale: one fetch task per location is the unit of parallelism; the
spine explode is row-local; the spine-join is an equi-join on
(loc_id, hour) — co-partitioned, no skew (every location has the same
hour count).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# (lat, lon, start_iso, end_iso) -> frame with columns ts_utc + metrics
Fetcher = Callable[[float, float, str, str], pd.DataFrame]

LOCATIONS_SCHEMA = "loc_id string, lat double, lon double, tz string"
OBS_METRICS = ("temperature_2m", "windspeed_10m", "precipitation")
OBS_SCHEMA = ("loc_id string, ts_utc timestamp, "
              + ", ".join(f"{m} double" for m in OBS_METRICS))

RETRIES = 5           # weather_client.py:23 (retry x5)
BACKOFF_S = 0.2       # weather_client.py:23 (backoff_factor)


def _default_fetcher(lat: float, lon: float, start: str, end: str) -> pd.DataFrame:
    raise NotImplementedError(
        "no HTTP fetcher injected; pass fetcher= (network stays in the "
        "connector, mirroring weather_client.py:28-44)")


def _retrying(fetcher: Fetcher, retries: int = RETRIES,
              backoff_s: float = BACKOFF_S) -> Fetcher:
    """Connector-side retry with exponential backoff — the reference's
    ``retry_requests`` session (weather_client.py:22-24) as a wrapper, so
    any injected fetcher gets the same resilience. Spark task retries
    (spark.task.maxFailures) remain the outer layer."""
    def wrapped(lat: float, lon: float, start: str, end: str) -> pd.DataFrame:
        for attempt in range(retries):
            try:
                return fetcher(lat, lon, start, end)
            except Exception:
                if attempt == retries - 1:
                    raise
                time.sleep(backoff_s * (2 ** attempt))
        raise AssertionError("unreachable")
    return wrapped


def fetch_hourly_observations(locations: DataFrame, start: str, end: str,
                              fetcher: Fetcher | None = None,
                              retries: int = RETRIES) -> DataFrame:
    """Fan the location list out across executors; emit UTC observations.

    Returns (loc_id, ts_utc, *metrics) — whatever hours the upstream API
    returned, NOT yet aligned to the full spine (use ``hourly_frame``)."""
    fetch = _retrying(fetcher or _default_fetcher, retries=retries)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for row in batch.itertuples(index=False):
                got = fetch(row.lat, row.lon, start, end)
                out = pd.DataFrame({
                    "loc_id": row.loc_id,
                    "ts_utc": pd.to_datetime(got["ts_utc"]),
                    **{m: got[m] if m in got else pd.NA for m in OBS_METRICS},
                })
                yield out

    # one fetch unit per location: repartition by loc_id so tasks, not the
    # driver, hold the HTTP latency (the reference's sequential loop cost)
    n = locations.count()
    return (locations.repartition(max(int(n), 1), "loc_id")
            .mapInPandas(run, OBS_SCHEMA))


# Unit conversion (weather_client.py:45-56 historical, :173-183 forecast):
# the reference threads temperature_unit / wind_speed_unit /
# precipitation_unit through to the API; here the connector stores the
# Open-Meteo NATIVE units (celsius, km/h, mm) canonically and converts at
# the edge with row-local arithmetic — one stored table serves every unit
# request instead of one fetch per unit combination.
_KMH_PER_MPH = 1.609344
_MM_PER_INCH = 25.4


def convert_units(df: DataFrame,
                  temperature_unit: str = "fahrenheit",
                  wind_speed_unit: str = "mph",
                  precipitation_unit: str = "inch") -> DataFrame:
    """Convert the metric columns in place (same column names, requested
    units — the reference's API contract). Accepted values mirror the
    reference's defaults: temperature 'celsius'|'fahrenheit', wind
    'kmh'|'mph', precipitation 'mm'|'inch'. Pure builtin column
    arithmetic — codegen'd, no UDF, identical cost to a projection."""
    out = df
    if temperature_unit == "fahrenheit":
        for c in ("temperature_2m",):
            if c in out.columns:
                out = out.withColumn(c, F.col(c) * 9.0 / 5.0 + 32.0)
    elif temperature_unit != "celsius":
        raise ValueError(f"unknown temperature_unit {temperature_unit!r}")
    if wind_speed_unit == "mph":
        if "windspeed_10m" in out.columns:
            out = out.withColumn("windspeed_10m",
                                 F.col("windspeed_10m") / _KMH_PER_MPH)
    elif wind_speed_unit != "kmh":
        raise ValueError(f"unknown wind_speed_unit {wind_speed_unit!r}")
    if precipitation_unit == "inch":
        if "precipitation" in out.columns:
            out = out.withColumn("precipitation",
                                 F.col("precipitation") / _MM_PER_INCH)
    elif precipitation_unit != "mm":
        raise ValueError(f"unknown precipitation_unit {precipitation_unit!r}")
    return out


def forecast_window(start: str, forecast_days: int = 14) -> tuple[str, str]:
    """The forecast request shape (weather_client.py:153-236): the window
    is [start, start + forecast_days*24h), parameterized by day count
    instead of an end date. ``start`` is explicit (the reference implies
    'today'; an explicit anchor keeps runs reproducible)."""
    import datetime as _dt
    t0 = _dt.datetime.fromisoformat(start)
    t1 = t0 + _dt.timedelta(days=forecast_days)
    return start, t1.strftime("%Y-%m-%d %H:%M:%S")


def fetch_hourly_forecast(locations: DataFrame, start: str,
                          forecast_days: int = 14,
                          fetcher: Fetcher | None = None,
                          retries: int = RETRIES) -> DataFrame:
    """Forecast twin of fetch_hourly_observations — same fan-out, window
    derived from ``forecast_days`` (weather_client.py:153-236)."""
    s, e = forecast_window(start, forecast_days)
    return fetch_hourly_observations(locations, s, e,
                                     fetcher=fetcher, retries=retries)


def forecast_frame(locations: DataFrame, observations: DataFrame,
                   start: str, forecast_days: int = 14,
                   temperature_unit: str = "celsius",
                   wind_speed_unit: str = "kmh",
                   precipitation_unit: str = "mm") -> DataFrame:
    """Spine-aligned forecast frame: every (loc, hour) in the forecast
    window exactly once, API gaps as NULL metrics. Unit kwargs convert
    at the edge (native Open-Meteo units by default; pass the reference
    defaults or use ``get_weather_forecast`` for its exact contract)."""
    s, e = forecast_window(start, forecast_days)
    return hourly_frame(locations, observations, s, e,
                        temperature_unit=temperature_unit,
                        wind_speed_unit=wind_speed_unit,
                        precipitation_unit=precipitation_unit)


def hourly_frame(locations: DataFrame, observations: DataFrame,
                 start: str, end: str,
                 temperature_unit: str = "celsius",
                 wind_speed_unit: str = "kmh",
                 precipitation_unit: str = "mm") -> DataFrame:
    """Align observations to the complete per-location hourly spine.

    Equivalent of the reference's ``pd.date_range(..., inclusive='left')``
    index build (weather_client.py:132-137): every (loc_id, hour) in
    [start, end) is present exactly once; hours the API skipped carry NULL
    metrics (feed to interpolate_linear/locf downstream); ``ts_local`` is
    the venue-localized timestamp (T13). Unit kwargs run convert_units on
    the way out — one call yields the frame in the requested units
    (defaults stay the connector's NATIVE units so stored tables remain
    canonical; ``get_historical_weather`` carries the reference's
    fahrenheit/mph/inch defaults)."""
    spine = (locations.select(
        "loc_id", "tz",
        F.explode(F.sequence(
            F.to_timestamp(F.lit(start)),
            F.to_timestamp(F.lit(end)) - F.expr("INTERVAL 1 HOUR"),
            F.expr("INTERVAL 1 HOUR"))).alias("ts_utc")))
    out = (spine.join(observations, ["loc_id", "ts_utc"], "left")
           .withColumn("ts_local", F.from_utc_timestamp("ts_utc", F.col("tz")))
           .drop("tz"))
    return convert_units(out, temperature_unit=temperature_unit,
                         wind_speed_unit=wind_speed_unit,
                         precipitation_unit=precipitation_unit)


def get_historical_weather(locations: DataFrame, start: str, end: str,
                           fetcher: Fetcher | None = None,
                           retries: int = RETRIES,
                           temperature_unit: str = "fahrenheit",
                           wind_speed_unit: str = "mph",
                           precipitation_unit: str = "inch") -> DataFrame:
    """The reference's one-call contract (weather_client.py:28-56):
    fetch hourly history for every location, align to the [start, end)
    spine, localize, and return metric columns in the REFERENCE DEFAULT
    units (fahrenheit / mph / inch — weather_client.py:45-47) unless
    overridden. Fan-out, retry x5, spine, tz, and conversion are the
    documented pieces composed; nothing here adds semantics."""
    obs = fetch_hourly_observations(locations, start, end,
                                    fetcher=fetcher, retries=retries)
    return hourly_frame(locations, obs, start, end,
                        temperature_unit=temperature_unit,
                        wind_speed_unit=wind_speed_unit,
                        precipitation_unit=precipitation_unit)


def get_weather_forecast(locations: DataFrame, start: str,
                         forecast_days: int = 14,
                         fetcher: Fetcher | None = None,
                         retries: int = RETRIES,
                         temperature_unit: str = "fahrenheit",
                         wind_speed_unit: str = "mph",
                         precipitation_unit: str = "inch") -> DataFrame:
    """Forecast twin of ``get_historical_weather`` — the reference's
    get_weather_forecast contract (weather_client.py:153-236): window
    from ``forecast_days``, reference default units."""
    obs = fetch_hourly_forecast(locations, start, forecast_days,
                                fetcher=fetcher, retries=retries)
    return forecast_frame(locations, obs, start, forecast_days,
                          temperature_unit=temperature_unit,
                          wind_speed_unit=wind_speed_unit,
                          precipitation_unit=precipitation_unit)
