"""Cleaning / scalar-transform operators (SURVEY.md §2.2 T2-T10).

All pure builtin column expressions — the reference's only true Python UDF
(__replace_percentage_strings, team_rankings_scraper.py:133-141) becomes a
``when``/``regexp_replace`` chain, and the 56-line runtime type-repair engine
(s3_client.py:45-100) collapses to ``coerce_types`` because our schemas are
declared. Staying in builtins keeps every op inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

# Sentinel strings the reference nulls out at write time (s3_client.py:96-98).
NULL_SENTINELS = ("None", "nan", "<NA>", "NaN")


def fill_null(df: DataFrame, defaults: dict) -> DataFrame:
    """T2: scalar null fill (get_odds.py:61 ``point`` NaN -> 0.0)."""
    return df.fillna(defaults)


def strip_symbols(col: Column) -> Column:
    """T4: strip the site's '--' missing-marker and '+' prefixes
    (team_rankings_scraper.py:127-131)."""
    c = F.when(col == "--", F.lit(None)).otherwise(col)
    return F.regexp_replace(c, r"^\+", "")


def strip_parenthetical(col: Column) -> Column:
    """T4: drop ' (W-L-T)' suffixes from team names
    (team_rankings_scraper.py:31)."""
    return F.regexp_replace(col, r"\s*\(.*\)$", "")


def pct_to_fraction(col: Column) -> Column:
    """T5: '75.5%' -> 0.755, numeric pass-through
    (team_rankings_scraper.py:133-141) — builtin-only, no Python UDF.

    try_cast, not cast: the reference engine is best-effort
    (to_numeric(errors='coerce')), and Spark 4's default ANSI mode would
    otherwise throw on unparseable survivors instead of nulling them."""
    return F.when(
        col.endswith("%"),
        F.regexp_replace(col, "%$", "").try_cast("double") / F.lit(100.0),
    ).otherwise(col.try_cast("double"))


def empty_to_null(col: Column) -> Column:
    """T8: '' -> NULL (team_rankings_data_collector.py:26)."""
    return F.nullif(col, F.lit(""))


def sentinels_to_null(col: Column) -> Column:
    """T9: 'None'/'nan'/'<NA>'/'NaN' strings -> NULL (s3_client.py:96-98)."""
    return F.when(col.isin(*NULL_SENTINELS), F.lit(None)).otherwise(col)


def clean_string(col: Column) -> Column:
    """T4+T8+T9 composite: the full dirty-string normalization chain."""
    return sentinels_to_null(empty_to_null(strip_symbols(col)))


def coerce_types(df: DataFrame, schema: T.StructType) -> DataFrame:
    """T10: schema-driven type coercion, replacing the runtime inference
    engine at s3_client.py:45-100.

    For each target field: clean dirty string forms ('', sentinels, '--',
    '+', '%') then cast. Numeric targets route '%'-strings through /100;
    string targets get sentinel cleanup only. Columns absent from ``df``
    are added as typed NULLs so the output schema is exactly ``schema``.
    """
    exprs = []
    have = set(df.columns)
    numeric = (T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
               T.DecimalType, T.ShortType, T.ByteType)
    for field in schema.fields:
        name, dt = field.name, field.dataType
        if name not in have:
            exprs.append(F.lit(None).cast(dt).alias(name))
            continue
        col = F.col(name)
        src_is_str = isinstance(df.schema[name].dataType, T.StringType)
        if src_is_str and isinstance(dt, numeric):
            # try_cast throughout: best-effort semantics (s3_client.py's
            # to_numeric(errors='coerce')); plain cast would raise under
            # ANSI mode on any unparseable survivor
            cleaned = clean_string(col)
            e = F.when(cleaned.endswith("%"),
                       F.regexp_replace(cleaned, "%$", "").try_cast("double") / 100
                       ).otherwise(cleaned.try_cast("double")).try_cast(dt)
        elif src_is_str and isinstance(dt, T.StringType):
            e = sentinels_to_null(empty_to_null(col))
        else:
            e = col.cast(dt)
        exprs.append(e.alias(name))
    return df.select(*exprs)
