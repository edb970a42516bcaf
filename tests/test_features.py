"""Training-feature contract (features.py): generated names match what
matchup_join materializes; validation fails fast with the missing list."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nfl_data_engineering_spark.features import (missing_features,
                                                 select_training_features,
                                                 training_feature_columns)
from nfl_data_engineering_spark.operators.joins import matchup_join


def test_contract_matches_matchup_join_output(spark):
    games = spark.createDataFrame(
        [("g1", "BearsTeam", "LionsTeam", 120.0)],
        "game_id string, home string, away string, travel_delta double")
    stats = spark.createDataFrame(
        [("BearsTeam", 1.5, 20.0), ("LionsTeam", -0.5, 17.0)],
        "team string, rating double, points double")
    feats = matchup_join(games, stats, "team", "home", "away",
                         ["rating", "points"])
    assert missing_features(feats, ["rating", "points"]) == []
    out = select_training_features(feats, ["rating", "points"], ["game_id"])
    assert out.columns == ["game_id",
                           "home_rating", "road_rating",
                           "rating_matchup_differential",
                           "home_points", "road_points",
                           "points_matchup_differential",
                           "travel_delta"]
    row = out.collect()[0]
    assert row.rating_matchup_differential == pytest.approx(2.0)
    assert row.points_matchup_differential == pytest.approx(3.0)


def test_missing_features_fail_fast(spark):
    df = spark.range(1).select(F.lit(1.0).alias("home_rating"))
    missing = missing_features(df, ["rating"])
    assert missing == ["road_rating", "rating_matchup_differential",
                       "travel_delta"]
    with pytest.raises(ValueError, match="road_rating"):
        select_training_features(df, ["rating"], [])


def test_column_expansion_shape():
    cols = training_feature_columns(["a", "b"], game_features=[])
    assert cols == ["home_a", "road_a", "a_matchup_differential",
                    "home_b", "road_b", "b_matchup_differential"]
    assert training_feature_columns([], game_features=["travel_delta"]) == [
        "travel_delta"]
