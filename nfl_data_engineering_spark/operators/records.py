"""Record-string splitting (SURVEY.md §2.2 T3).

The reference turns '"W-L(-T)"' strings into _wins/_losses/_ties int columns
plus a derived _games_played sum (team_rankings_scraper.py:48-82). Here it
is three ``regexp_extract`` calls + arithmetic — one projection, no UDF,
fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RECORD_RE = r"^(\d+)-(\d+)(?:-(\d+))?$"


def split_record(df: DataFrame, col: str, prefix: str | None = None,
                 drop_source: bool = True) -> DataFrame:
    """'3-1' / '2-1-1' -> {prefix}_wins/_losses/_ties/_games_played."""
    p = prefix or col
    wins = F.regexp_extract(F.col(col), RECORD_RE, 1).cast("int")
    losses = F.regexp_extract(F.col(col), RECORD_RE, 2).cast("int")
    ties_raw = F.regexp_extract(F.col(col), RECORD_RE, 3)
    ties = F.when(ties_raw == "", F.lit(0)).otherwise(ties_raw.cast("int"))
    # non-matching strings ('--', '') -> NULL across the board, like the
    # reference's to_numeric(errors='coerce') path (team_rankings_scraper.py:73-74)
    wins = F.when(F.col(col).rlike(RECORD_RE), wins)
    losses = F.when(F.col(col).rlike(RECORD_RE), losses)
    ties = F.when(F.col(col).rlike(RECORD_RE), ties)
    out = (df.withColumn(f"{p}_wins", wins)
             .withColumn(f"{p}_losses", losses)
             .withColumn(f"{p}_ties", ties)
             .withColumn(f"{p}_games_played",
                         F.col(f"{p}_wins") + F.col(f"{p}_losses") + F.col(f"{p}_ties")))
    return out.drop(col) if drop_source else out
