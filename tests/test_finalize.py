"""finalize()'s checkpoint modes (plans/base.py).

Default: eager localCheckpoint (executor-local, non-replicated — the
local-mode/driver-collect trade documented in finalize's docstring).
SPARK_GRAFT_RELIABLE_CHECKPOINT=1 swaps in a reliable checkpoint under
the context's checkpoint dir — the cluster-mode switch VERDICT r6 item 7
asked to make actionable. Both modes must release the caches they were
handed and return the same rows."""

from __future__ import annotations


from pyspark.sql import functions as F


from nfl_data_engineering_spark.plans.base import finalize  # noqa: E402


def _frame(spark):
    return (spark.range(0, 1000)
            .select(F.col("id"), (F.col("id") % 7).alias("k")))


def test_finalize_reliable_checkpoint_mode(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_FINALIZE", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    cache = _frame(spark).cache()
    cache.count()
    result = cache.groupBy("k").agg(F.count("*").alias("n"))
    out = finalize(result, cache)
    # reliable checkpoint: materialized to the checkpoint dir, cache freed
    assert sorted(r["n"] for r in out.collect()) == [142] + [143] * 6
    assert any((tmp_path / "ckpt").rglob("*")), \
        "reliable checkpoint wrote nothing under the checkpoint dir"
    assert cache.storageLevel.useMemory is False, \
        "finalize(reliable) failed to unpersist the cache it was handed"


def test_finalize_default_mode_unchanged(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_FINALIZE", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    cache = _frame(spark).cache()
    cache.count()
    result = cache.groupBy("k").agg(F.count("*").alias("n"))
    out = finalize(result, cache)
    assert sorted(r["n"] for r in out.collect()) == [142] + [143] * 6
    assert cache.storageLevel.useMemory is False
