"""Distributed season-schedule source: the ESPN box-score connector (S8).

The reference loops over a year list, pulls each season's schedule via
sportsdataverse, concatenates, and writes CSV
(box_score_cllector.py:12-32, CSV sink :38). Here the year list is the
unit of parallelism: each year fetches in its own task via ``mapInPandas``
(the S2/S7 connector pattern), the per-season frames union structurally
(one schema, no pandas concat alignment), and the CSV sink is Spark's
writer (S9).

The fetcher is pluggable and the default raises — no network code unless
injected. At scale a season is a tiny frame; the pattern matters because
it is the same fan-out used for the 221-table scraper and the weather
pulls: source latency is paid once per task, never serially on a driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# year -> schedule frame with SCHEDULE_COLUMNS
Fetcher = Callable[[int], pd.DataFrame]

SCHEDULE_COLUMNS = ("game_id", "season", "week", "game_date",
                    "home_team", "away_team", "home_score", "away_score")
SCHEDULE_SCHEMA = ("game_id string, season int, week int, game_date date, "
                   "home_team string, away_team string, "
                   "home_score int, away_score int")


def _default_fetcher(year: int) -> pd.DataFrame:
    raise NotImplementedError(
        "no schedule fetcher injected; pass fetcher= (network stays in the "
        "connector, mirroring box_score_cllector.py:12-25)")


def season_schedules(spark: SparkSession, years: list[int],
                     fetcher: Fetcher | None = None) -> DataFrame:
    """One task per season year; union of per-year schedule frames
    (box_score_cllector.py:26-32's loop+concat as a distributed union)."""
    fetch = fetcher or _default_fetcher

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for year in batch["year"]:
                got = fetch(int(year))
                out = pd.DataFrame({c: got[c] for c in SCHEDULE_COLUMNS})
                out["game_date"] = pd.to_datetime(out["game_date"]).dt.date
                yield out

    years_df = spark.createDataFrame([(y,) for y in years], "year int")
    return (years_df.repartition(max(len(years), 1), "year")
            .mapInPandas(run, SCHEDULE_SCHEMA))


def write_schedule_csv(df: DataFrame, path: str) -> None:
    """S9 CSV sink (box_score_cllector.py:38 ``to_csv(index=False)``)."""
    df.write.mode("overwrite").option("header", True).csv(path)
