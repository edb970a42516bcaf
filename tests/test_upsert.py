"""Upsert writer: idempotency fixed point + partition locality
(the reference's read-merge-dedup-rewrite contract, SURVEY.md §2.4/§4)."""

from __future__ import annotations

import datetime as dt
import os

from nfl_data_engineering_spark.io import upsert_partitioned, write_partitioned


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k int, v string, timestamp timestamp")


def test_upsert_idempotent_fixed_point(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = dt.datetime(2024, 1, 15)
    b = _batch(spark, [(1, "a", t), (2, "b", t)])
    upsert_partitioned(spark, b, path, key_cols=None)
    upsert_partitioned(spark, b, path, key_cols=None)  # double-run guard
    assert spark.read.parquet(path).count() == 2


def test_upsert_keyed_keeps_latest(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t1, t2 = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    upsert_partitioned(spark, _batch(spark, [(1, "old", t1)]), path, key_cols=["k"])
    upsert_partitioned(spark, _batch(spark, [(1, "new", t2)]), path, key_cols=["k"])
    out = spark.read.parquet(path).collect()
    assert len(out) == 1 and out[0]["v"] == "new"


def test_upsert_touches_only_new_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    jan = _batch(spark, [(1, "jan", dt.datetime(2024, 1, 5))])
    feb = _batch(spark, [(2, "feb", dt.datetime(2024, 2, 5))])
    upsert_partitioned(spark, jan, path, key_cols=None)
    jan_dir = os.path.join(path, "year=2024", "month=1")
    before = {f: os.path.getmtime(os.path.join(jan_dir, f))
              for f in os.listdir(jan_dir) if f.endswith(".parquet")}
    upsert_partitioned(spark, feb, path, key_cols=None)
    after = {f: os.path.getmtime(os.path.join(jan_dir, f))
             for f in os.listdir(jan_dir) if f.endswith(".parquet")}
    # dynamic partition overwrite must leave January untouched
    assert before == after
    assert spark.read.parquet(path).count() == 2


def test_write_partitioned_layout(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = _batch(spark, [(1, "a", dt.datetime(2024, 3, 1)),
                        (2, "b", dt.datetime(2024, 4, 1))])
    write_partitioned(df, path)
    assert os.path.isdir(os.path.join(path, "year=2024", "month=3"))
    assert os.path.isdir(os.path.join(path, "year=2024", "month=4"))
    back = spark.read.parquet(path)
    assert back.count() == 2 and "year" in back.columns
