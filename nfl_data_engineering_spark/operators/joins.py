"""Join operators (SURVEY.md §2.3 J1/J2/J3).

- ``asof_join``: the implied "stats as of game date" temporal join
  (README.md:64-67, odds_data_collector.py:36-37). Implemented as the
  union + last-non-null-over-preceding window trick: ZERO joins, one shuffle
  on the key, linear in rows. The naive range-join + dedup shuffles the
  cross-range; this doesn't, which is what survives 100 TB.
- ``matchup_join``: the home/road self-join contract from the feature list
  (src/config.py:6-101) — one fact spine joined twice against a keyed stats
  frame, differentials as projection arithmetic (X2).
- ``pivot_wide``: J1 restructure — the reference folds 221 scraped tables
  with chained left-joins (team_rankings_scraper.py:229-235); we store long
  form and pivot once, which is the scale-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              left_ts: str, right_ts: str,
              value_cols: list[str], suffix: str = "_asof",
              tolerance_s: int | None = None,
              tiebreak_cols: list[str] | None = None) -> DataFrame:
    """For each left row, attach the newest right row with
    ``right.ts <= left.ts`` within the same key (J3); with ``tolerance_s``,
    only if that row is at most ``tolerance_s`` seconds older (pandas
    ``merge_asof(tolerance=...)`` semantics — staler matches surface NULL).

    Plan shape: tag both sides, unionByName, ONE window partitioned by key
    ordered by (ts, is_left[, tiebreaks]) carrying the matched right row as
    a struct via ``last(ignorenulls=True)`` over the unbounded-preceding
    frame, then filter back to left rows. Right rows sort before left rows
    at equal timestamps so a right row AT the left timestamp is visible
    (<= semantics). Carrying (match_ts, values) in ONE struct pins every
    output to the SAME matched row — value columns that are NULL on the
    matched row stay NULL instead of leaking an older non-null value
    (DuckDB ASOF JOIN / pandas merge_asof behavior). ``tiebreak_cols``
    pins a total order among right rows sharing a timestamp (last() picks
    the greatest tiebreak — ORDER BY ts DESC, tiebreak DESC LIMIT 1).
    Staleness compares the NTZ wall clocks directly (timestampdiff at
    MICROSECOND precision — SECOND would truncate sub-second remainders
    and admit matches up to tolerance_s+1s exclusive), not epoch micros
    after a session-zone cast, so a DST transition between the two
    timestamps cannot distort the gap."""
    tiebreaks = tiebreak_cols or []
    l_tag = (left
             .withColumn("__ts", F.col(left_ts))
             .withColumn("__side", F.lit(1)))
    for v in value_cols:
        l_tag = l_tag.withColumn(
            f"__v_{v}", F.lit(None).cast(right.schema[v].dataType))
    for t in tiebreaks:
        l_tag = l_tag.withColumn(
            f"__tb_{t}", F.lit(None).cast(right.schema[t].dataType))
    r_tag = (right.select(
        *[F.col(c) for c in key_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreaks]))
    for c in left.columns:
        if c not in key_cols:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    merged = l_tag.unionByName(r_tag.select(*l_tag.columns))
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col("__ts"), F.col("__side"),
                  *[F.col(f"__tb_{t}") for t in tiebreaks])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    row_struct = F.when(
        F.col("__side") == 0,
        F.struct(F.col("__ts").alias("mts"),
                 *[F.col(f"__v_{v}").alias(v) for v in value_cols]))
    merged = merged.withColumn(
        "__match", F.last(row_struct, ignorenulls=True).over(w))
    fresh = F.lit(True) if tolerance_s is None else (
        F.expr("timestampdiff(MICROSECOND, __match.mts, __ts)")
        <= F.lit(int(tolerance_s) * 1_000_000))
    for v in value_cols:
        merged = merged.withColumn(
            f"{v}{suffix}", F.when(fresh, F.col("__match")[v]))
    return (merged.filter(F.col("__side") == 1)
            .drop("__ts", "__side", "__match",
                  *[f"__v_{v}" for v in value_cols],
                  *[f"__tb_{t}" for t in tiebreaks]))


def asof_join_tolerance(left: DataFrame, right: DataFrame,
                        key_cols: list[str], left_ts: str, right_ts: str,
                        value_cols: list[str], tolerance_s: int,
                        tiebreak_cols: list[str] | None = None,
                        suffix: str = "_asof") -> DataFrame:
    """Backward-compatible alias: :func:`asof_join` with a required
    ``tolerance_s`` — one implementation, two entry points."""
    return asof_join(left, right, key_cols, left_ts, right_ts, value_cols,
                     suffix=suffix, tolerance_s=tolerance_s,
                     tiebreak_cols=tiebreak_cols)


def matchup_join(games: DataFrame, stats: DataFrame, stat_key: str,
                 game_home_key: str, game_away_key: str,
                 feature_cols: list[str]) -> DataFrame:
    """J2 + X2: join a stats frame onto a game spine twice (home/road) and
    emit home_*, road_* and *_matchup_differential columns
    (config.py:22-23 naming contract)."""
    h = stats.select(F.col(stat_key).alias("__hk"),
                     *[F.col(c).alias(f"home_{c}") for c in feature_cols])
    r = stats.select(F.col(stat_key).alias("__rk"),
                     *[F.col(c).alias(f"road_{c}") for c in feature_cols])
    out = (games
           .join(F.broadcast(h), games[game_home_key] == h["__hk"], "left").drop("__hk")
           .join(F.broadcast(r), games[game_away_key] == r["__rk"], "left").drop("__rk"))
    for c in feature_cols:
        out = out.withColumn(f"{c}_matchup_differential",
                             F.col(f"home_{c}") - F.col(f"road_{c}"))
    return out


def pivot_wide(long_df: DataFrame, key_cols: list[str], metric_col: str,
               value_col: str, metrics: list[str] | None = None) -> DataFrame:
    """J1 restructure: long (key, metric, value) -> wide feature matrix.

    Pass ``metrics`` explicitly at scale — it skips the distinct-values scan
    and pins column order.
    """
    g = long_df.groupBy(*key_cols)
    p = g.pivot(metric_col, metrics) if metrics else g.pivot(metric_col)
    return p.agg(F.first(value_col))
