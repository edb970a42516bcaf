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


def hourly_frame(locations: DataFrame, observations: DataFrame,
                 start: str, end: str) -> DataFrame:
    """Align observations to the complete per-location hourly spine.

    Equivalent of the reference's ``pd.date_range(..., inclusive='left')``
    index build (weather_client.py:132-137): every (loc_id, hour) in
    [start, end) is present exactly once; hours the API skipped carry NULL
    metrics (feed to interpolate_linear/locf downstream); ``ts_local`` is
    the venue-localized timestamp (T13)."""
    spine = (locations.select(
        "loc_id", "tz",
        F.explode(F.sequence(
            F.to_timestamp(F.lit(start)),
            F.to_timestamp(F.lit(end)) - F.expr("INTERVAL 1 HOUR"),
            F.expr("INTERVAL 1 HOUR"))).alias("ts_utc")))
    return (spine.join(observations, ["loc_id", "ts_utc"], "left")
            .withColumn("ts_local", F.from_utc_timestamp("ts_utc", F.col("tz")))
            .drop("tz"))
