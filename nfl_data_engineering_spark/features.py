"""Training-feature contract: the engine-side equivalent of the reference's
curated column registry (src/config.py:6-101, SPREAD_MODEL_TRAINING_COLUMNS).

The reference hand-maintains a 101-line list of model input columns whose
names follow one mechanical convention: per-side features are the base
metric prefixed ``home_`` / ``road_``, each paired metric adds a
``{metric}_matchup_differential`` (home minus road, src/config.py:22-23 et
al.), plus standalone game-level features (``travel_delta``,
src/config.py:100). Here the convention IS the API: the contract is
generated from a base-metric list, so it can never drift from the matchup
join that materializes it (operators/joins.py:matchup_join), and validation
is a set comparison instead of eyeballing a hand-written list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# hyperparameters of the downstream aggregation contract (src/config.py:3-5)
AGGREGATION_METHOD = "exp_weighted_mean"
DECAY_FACTOR = 0.88
GAME_SAMPLE = 16

HOME_PREFIX = "home_"
ROAD_PREFIX = "road_"
DIFFERENTIAL_SUFFIX = "_matchup_differential"


def training_feature_columns(base_metrics: list[str],
                             game_features: list[str] = ("travel_delta",),
                             include_differentials: bool = True) -> list[str]:
    """Expand base metric names into the full model-input column contract:
    home_{m}, road_{m}, {m}_matchup_differential per metric, plus
    game-level features appended unprefixed."""
    cols: list[str] = []
    for m in base_metrics:
        cols.append(f"{HOME_PREFIX}{m}")
        cols.append(f"{ROAD_PREFIX}{m}")
        if include_differentials:
            cols.append(f"{m}{DIFFERENTIAL_SUFFIX}")
    cols.extend(game_features)
    return cols


def missing_features(df: DataFrame, base_metrics: list[str],
                     game_features: list[str] = ("travel_delta",)) -> list[str]:
    """Contract check: which declared training columns are absent from the
    feature frame — the engine's version of the reference's implicit
    'model training will fail at fit time' discovery."""
    want = training_feature_columns(base_metrics, game_features)
    have = set(df.columns)
    return [c for c in want if c not in have]


def select_training_features(df: DataFrame, base_metrics: list[str],
                             key_cols: list[str],
                             game_features: list[str] = ("travel_delta",)
                             ) -> DataFrame:
    """Project the feature matrix down to keys + the declared contract,
    failing fast (with the full missing list) instead of at fit time."""
    missing = missing_features(df, base_metrics, game_features)
    if missing:
        raise ValueError(f"feature frame is missing declared training "
                         f"columns: {missing}")
    return df.select(*key_cols,
                     *training_feature_columns(base_metrics, game_features))
