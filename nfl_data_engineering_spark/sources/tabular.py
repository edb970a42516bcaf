"""Small-table config sources/sinks: Excel (S3/S10) and CSV.

The reference reads its 221-row URL registry and writes a stats db as Excel
(team_rankings_scraper.py:15, :246, :251). These are driver-side small-table
ops — the registry is broadcast-sized config, not data — so the adapter
reads with pandas on the driver and lifts to a DataFrame.

Excel engines (openpyxl/xlrd) are not installed in this container, so the
Excel paths are import-gated: they work when an engine is present and raise
a clear NotImplementedError otherwise. CSV twins cover the same shape
everywhere (S9 for the sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

REGISTRY_SCHEMA = ("category string, table_name string, base_url string, "
                   "cols_to_keep string, record_cols string")


def _excel_available() -> bool:
    try:
        import openpyxl  # noqa: F401
        return True
    except ImportError:
        return False


def read_registry_excel(spark: SparkSession, path: str,
                        schema: str = REGISTRY_SCHEMA) -> DataFrame:
    """S3: driver-side Excel read of a config registry -> DataFrame.
    The frame is broadcast-sized by construction (hundreds of rows)."""
    if not _excel_available():
        raise NotImplementedError(
            "no Excel engine (openpyxl) installed; use read_registry_csv or "
            "install an engine — gated per the environment constraints")
    import pandas as pd
    pdf = pd.read_excel(path).fillna("")
    return spark.createDataFrame(pdf, schema=schema)


def read_registry_csv(spark: SparkSession, path: str,
                      schema: str = REGISTRY_SCHEMA) -> DataFrame:
    """CSV twin of the registry read (same schema contract)."""
    return (spark.read.schema(schema).option("header", "true").csv(path)
            .na.fill(""))


def write_excel(df: DataFrame, path: str) -> None:
    """S10: driver-side Excel export (team_rankings_scraper.py:251 analog).
    Only for export-sized frames — collect happens on the driver."""
    if not _excel_available():
        raise NotImplementedError(
            "no Excel engine (openpyxl) installed; use df.write.csv instead")
    df.toPandas().to_excel(path, index=False)
