"""Distributed HTML-table source: the rankings-scraper adapter.

The reference fetches 221 configured tables sequentially in one process
with a politeness sleep (team_rankings_scraper.py:152-170, 213-235) — the
dominant wall-clock cost of its weekly run (SURVEY.md §6). Here the URL
registry becomes a DataFrame and the fetch fans out via ``mapInPandas``:
one task per registry slice, politeness throttle applied *per worker*, and
the output is the scale-safe LONG form (team, date, metric, value) — the
1500-column wide frame is a pivot away (operators/joins.py:pivot_wide).

The HTTP call itself is pluggable (``fetcher``); the default raises — tests
and offline runs inject a deterministic fake. No network code runs unless a
caller provides it.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# (category, table_name, base_url, date) -> parsed table
Fetcher = Callable[[str, str, str, str], pd.DataFrame]

REGISTRY_SCHEMA = "category string, table_name string, base_url string, cols_to_keep string, record_cols string"
LONG_SCHEMA = "team string, date string, metric string, value string"


def _default_fetcher(category: str, table_name: str, base_url: str,
                     date: str) -> pd.DataFrame:
    raise NotImplementedError(
        "no HTTP fetcher injected; pass fetcher= (network is connector-side, "
        "mirroring team_rankings_scraper.py:152-170)")


def scrape_tables_long(registry: DataFrame, date: str,
                       fetcher: Fetcher | None = None,
                       throttle_s: float = 0.0,
                       num_tasks: int = 32) -> DataFrame:
    """Fan the registry out across executors; emit long-form metrics.

    Each fetched table is melted to (team, metric, value) with metric names
    prefixed ``{category}_{table_name}_{col}`` — the reference's
    column-naming contract (team_rankings_scraper.py:190-194) applied to
    long-form rows. Values stay strings here; operators/clean.py +
    operators/records.py handle %-parsing, record splits, and coercion
    downstream (the reference's T3-T10 chain).
    """
    fetch = fetcher or _default_fetcher

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if throttle_s:
                    time.sleep(throttle_s)
                tbl = fetch(row.category, row.table_name, row.base_url, date)
                if tbl is None or tbl.empty or "Team" not in tbl.columns:
                    continue
                keep = [c.strip() for c in str(row.cols_to_keep or "").split(",")
                        if c.strip()] or [c for c in tbl.columns if c != "Team"]
                melted = tbl.melt(id_vars=["Team"],
                                  value_vars=[c for c in keep if c in tbl.columns],
                                  var_name="col", value_name="value")
                prefix = f"{row.category}_{row.table_name}_"
                metric = (prefix + melted["col"].astype(str)
                          .str.lower().str.replace(r"\s+", "_", regex=True))
                yield pd.DataFrame({
                    "team": melted["Team"].astype(str),
                    "date": date,
                    "metric": metric,
                    "value": melted["value"].astype("string"),
                })

    return (registry
            .repartition(num_tasks)
            .mapInPandas(run, schema=LONG_SCHEMA)
            .withColumn("date", F.to_date("date")))
