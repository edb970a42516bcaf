"""Time-series operators (SURVEY.md §2.2 T13/T14, §2.9 windows).

The reference builds hourly tz-localized DatetimeIndex frames driver-side
(weather_client.py:132-150). Spark-native: ``sequence(start, stop, interval)``
+ ``explode`` generates the spine distributed, and ``from_utc_timestamp``
handles venue-timezone localization (src/main.py:31-35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def hourly_spine(spark: SparkSession, start: str, end_exclusive: str) -> DataFrame:
    """T14: one row per hour in [start, end) — pd.date_range(inclusive='left')
    semantics (weather_client.py:132-137)."""
    return (spark.range(1)
            .select(F.explode(F.sequence(
                F.to_timestamp(F.lit(start)),
                F.to_timestamp(F.lit(end_exclusive)) - F.expr("interval 1 hour"),
                F.expr("interval 1 hour"))).alias("ts")))


def spine_from_bounds(df: DataFrame, ts_col: str, interval: str = "1 hour") -> DataFrame:
    """Hourly spine spanning [min(ts) truncated, max(ts) truncated] of ``df``.

    The bounds aggregate is a single-row reduce; the sequence explode then
    fans back out across executors — no driver-side date_range loop.
    """
    unit = interval.split()[-1].rstrip("s")
    bounds = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("hi"))
    return bounds.select(F.explode(F.sequence(
        "lo", "hi", F.expr(f"interval {interval}"))).alias("bucket"))


def zero_filled_counts(df: DataFrame, ts_col: str, interval: str = "1 hour",
                       out_count: str = "n") -> DataFrame:
    """Bucketed event counts with gap buckets present at 0 — the weather
    client's dense-hourly-frame contract over any event feed."""
    unit = interval.split()[-1].rstrip("s")
    counts = (df.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("bucket"))
                .agg(F.count("*").alias(out_count)))
    spine = spine_from_bounds(df, ts_col, interval)
    return (spine.join(counts, "bucket", "left")
            .select("bucket", F.coalesce(F.col(out_count), F.lit(0)).alias(out_count)))
