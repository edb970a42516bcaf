"""Declared schemas.

The reference never declares schemas — it infers at ingest and repairs types
before every write (src/s3_io/s3_client.py:45-100). We invert that: every
dataset has an explicit StructType, which statically kills most of the
type-repair engine (SURVEY.md §2 T10) and gives Catalyst exact column types
for pruning/pushdown.

Two schema families:

1. NFL-domain datasets (odds / rankings-long / weather / games) — parity with
   the reference's four logical datasets (SURVEY.md §1.1).
2. Driver testdata star schema (/root/testdata/sf*/...) used by the oracle
   correctness harness; mirrors FIXTURES.md F8.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. NFL-domain schemas
# ---------------------------------------------------------------------------

# Odds raw (nested, pre-flatten): the 4-level JSON the odds API returns —
# game -> bookmakers -> markets -> outcomes (get_odds.py:44-59). We keep the
# nested form as a first-class type and flatten with explode (operators T1).
ODDS_RAW = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("commence_time", T.StringType()),
    T.StructField("home_team", T.StringType()),
    T.StructField("away_team", T.StringType()),
    T.StructField("bookmakers", T.ArrayType(T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("markets", T.ArrayType(T.StructType([
            T.StructField("key", T.StringType()),
            T.StructField("outcomes", T.ArrayType(T.StructType([
                T.StructField("name", T.StringType()),
                T.StructField("price", T.LongType()),
                T.StructField("point", T.DoubleType()),
            ]))),
        ]))),
    ]))),
])

# Odds flat: the exact 9-column contract asserted by the reference's tests
# (test/test_odds_collector.py:170-172) plus the collection timestamp
# (odds_data_collector.py:25).
ODDS_FLAT = T.StructType([
    T.StructField("game_id", T.StringType()),
    T.StructField("game_time", T.StringType()),
    T.StructField("home_team", T.StringType()),
    T.StructField("away_team", T.StringType()),
    T.StructField("book", T.StringType()),
    T.StructField("market", T.StringType()),
    T.StructField("outcome", T.StringType()),
    T.StructField("price", T.LongType()),
    T.StructField("point", T.DoubleType()),
    T.StructField("timestamp", T.TimestampType()),
])

# Rankings, long/tidy form — our scale-safe core representation of the
# reference's 1500+-column wide frame (README.md:185). The wide form is a
# pivot of this (operators/joins.py:pivot_wide); metric names follow the
# reference's "{category}_{table}_{stat}" convention
# (team_rankings_scraper.py:190-194).
RANKINGS_LONG = T.StructType([
    T.StructField("team", T.StringType()),
    T.StructField("date", T.DateType()),
    T.StructField("metric", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("timestamp", T.TimestampType()),
])

# Weather hourly time-series (weather_client.py:132-150).
WEATHER_HOURLY = T.StructType([
    T.StructField("latitude", T.DoubleType()),
    T.StructField("longitude", T.DoubleType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("temperature_2m", T.DoubleType()),
    T.StructField("relative_humidity_2m", T.DoubleType()),
    T.StructField("apparent_temperature", T.DoubleType()),
    T.StructField("rain", T.DoubleType()),
    T.StructField("snowfall", T.DoubleType()),
    T.StructField("snow_depth", T.DoubleType()),
    T.StructField("cloud_cover", T.DoubleType()),
    T.StructField("wind_speed_10m", T.DoubleType()),
    T.StructField("wind_gusts_10m", T.DoubleType()),
])

# Game schedule spine (box_score_cllector.py:12-32 + config.py naming).
GAMES = T.StructType([
    T.StructField("game_id", T.StringType()),
    T.StructField("season", T.IntegerType()),
    T.StructField("week", T.IntegerType()),
    T.StructField("game_date", T.TimestampType()),
    T.StructField("home_team", T.StringType()),
    T.StructField("away_team", T.StringType()),
    T.StructField("home_score", T.IntegerType()),
    T.StructField("away_score", T.IntegerType()),
])

# Multimodal document: opaque binary payload + typed metadata
# (LLM-pipeline extension; see sources/multimodal.py).
MULTIMODAL_DOC = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("modality", T.StringType()),       # image | audio | video | text
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("source", T.StringType()),
])

# ---------------------------------------------------------------------------
# 2. Driver testdata star schema (FIXTURES.md F8)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
