"""Window / ranking / weighted aggregations (SURVEY.md §2.4 X1, §2.5 X3).

- ``topk_per_group``: the "best line per (game, market, outcome)" pattern the
  reference implies with its multi-key sort (get_odds.py:62-66) — top-k per
  key WITHOUT a total sort: one hash shuffle on the group keys, per-partition
  rank, filter. Scale-safe where orderBy-then-take is not.
- ``exp_weighted_mean``: the declared downstream aggregation contract
  (src/config.py:3-5 — exp_weighted_mean, DECAY_FACTOR=0.88, GAME_SAMPLE=16):
  over each key's last N rows by event time,
  sum(value * d^age) / sum(d^age), age = 0 for the newest row.
- ``trailing_mean``: the site's pre-aggregated 'Last 3'/'Last 1' columns
  (xlsx cols_to_keep; SURVEY.md §2.4 note) computed from grain data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def topk_per_group(df: DataFrame, group_cols: list[str], order: list[Column],
                   k: int = 1, rank_col: str = "rnk") -> DataFrame:
    """X3: top-k rows per key. ``order`` must pin a total order (add a
    unique-id tiebreak) or the winner is nondeterministic."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))


def topk_per_group_salted(df: DataFrame, group_cols: list[str],
                          order: list[Column], k: int = 1,
                          salt_buckets: int = 32,
                          rank_col: str = "rnk") -> DataFrame:
    """Skew-safe top-k per key: two-phase ranking.

    A single window on a hot key serializes that key through one task. Phase
    one ranks within (key, salt) — the hot key spreads over ``salt_buckets``
    tasks and each keeps only its local top-k; phase two ranks the surviving
    k x salt_buckets rows per key. The salt is a row hash, so results are
    identical to :func:`topk_per_group` for any total order — only the
    physical distribution changes. Use when a key can exceed a single task's
    share (the as-of/dedup skew cliff in SCALE.md).
    """
    salt = F.pmod(F.hash(F.struct(*[F.col(c) for c in df.columns])),
                  F.lit(salt_buckets))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order)
    local = (df.withColumn("__salt", salt)
             .withColumn("__r1", F.row_number().over(w1))
             .filter(F.col("__r1") <= k)
             .drop("__salt", "__r1"))
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (local.withColumn(rank_col, F.row_number().over(w2))
            .filter(F.col(rank_col) <= k))


def exp_weighted_mean(df: DataFrame, key_cols: list[str], ts_col: str,
                      value_col: str, decay: float = 0.88, last_n: int = 16,
                      tiebreak: list[str] | None = None,
                      out_col: str = "ewm_value") -> DataFrame:
    """X1: exponentially-weighted mean over each key's last ``last_n`` rows.

    One shuffle on ``key_cols``; weights are computed from row_number so the
    whole thing is two window functions + one groupBy — no Python, no
    iterative driver loop.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    weighted = (df
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= last_n)
                .withColumn("__w", F.pow(F.lit(decay), F.col("__rn") - 1)))
    return (weighted.groupBy(*key_cols)
            .agg((F.sum(F.col(value_col) * F.col("__w")) / F.sum("__w"))
                 .alias(out_col)))


def trailing_mean(df: DataFrame, key_cols: list[str], ts_col: str,
                  value_col: str, n: int, out_col: str,
                  tiebreak: list[str] | None = None) -> DataFrame:
    """'Last N' trailing average per key, ordered by event time ascending."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = (Window.partitionBy(*key_cols).orderBy(*order)
         .rowsBetween(-(n - 1), Window.currentRow))
    return df.withColumn(out_col, F.avg(value_col).over(w))
