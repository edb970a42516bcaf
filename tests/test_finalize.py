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


def test_finalize_checkpoint_release_is_deterministic(spark, monkeypatch):
    """Once a finalized frame's wrapper dies, release_deferred() must
    remove its checkpoint blocks from the persistent registry
    IMMEDIATELY — no gc.collect(), no JVM System.gc(), no poll. This is
    the deterministic-release contract (storage.py) that replaces the
    ContextCleaner/py4j-detach chain whose lost-detach race pinned one
    block per ~3 full-suite runs (VERDICT r6 item 1)."""
    from nfl_data_engineering_spark.plans.base import release_deferred
    from nfl_data_engineering_spark.storage import registry_rdd_ids

    monkeypatch.delenv("SPARK_GRAFT_NO_FINALIZE", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    release_deferred()                       # drain other tests' leftovers
    before = registry_rdd_ids(spark)
    out = finalize(_frame(spark).groupBy("k").agg(F.count("*").alias("n")))
    created = registry_rdd_ids(spark) - before
    assert created, "eager localCheckpoint must register a persistent RDD"
    assert release_deferred() == 0, \
        "sweep must NOT touch a checkpoint whose wrapper is alive"
    assert created <= registry_rdd_ids(spark)
    del out                                  # refcount death — no gc needed
    assert release_deferred() >= len(created)
    assert not (registry_rdd_ids(spark) & created), \
        "checkpoint blocks must leave the registry at the sweep, not at GC"


def test_finalize_cc_releases_labels_checkpoint(spark, sf_dir, monkeypatch):
    """Under the DISTRIBUTED connected-components path (driver fast path
    disabled), a CC entry must leave at most its own finalize checkpoint
    in the registry — every min-label round checkpoint AND the final
    labels checkpoint are released explicitly (finalize_cc), not left to
    the ContextCleaner."""
    from nfl_data_engineering_spark.operators import dedup as D
    from nfl_data_engineering_spark.plans.base import release_deferred
    from nfl_data_engineering_spark.plans.registry import _BY_NAME
    from nfl_data_engineering_spark.storage import registry_rdd_ids

    monkeypatch.delenv("SPARK_GRAFT_NO_FINALIZE", raising=False)
    monkeypatch.setattr(D, "_CC_DRIVER_EDGE_CAP", 0)
    release_deferred()
    spark.catalog.clearCache()
    before = registry_rdd_ids(spark)
    df = _BY_NAME["dedup_components"].spark(spark, sf_dir)
    assert df.count() > 0
    mid = registry_rdd_ids(spark) - before
    assert len(mid) <= 1, (
        f"CC entry left {len(mid)} persistent RDDs beyond its own "
        f"finalize checkpoint: {mid}")
    del df
    release_deferred()
    assert not (registry_rdd_ids(spark) - before)


def test_finalize_default_mode_unchanged(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_FINALIZE", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    cache = _frame(spark).cache()
    cache.count()
    result = cache.groupBy("k").agg(F.count("*").alias("n"))
    out = finalize(result, cache)
    assert sorted(r["n"] for r in out.collect()) == [142] + [143] * 6
    assert cache.storageLevel.useMemory is False


def test_untrack_checkpoint_transfers_release_ownership(spark, monkeypatch):
    """The derive-then-drop escape hatch (ADVICE r7): a lazy child plan
    derived from a finalized result outlives the parent wrapper ONLY if
    the caller takes ownership via storage.untrack_checkpoint — the
    sweep then leaves the blocks alone, the child stays collectable, and
    the caller's explicit unpersist_rdd_ids completes the release."""
    from nfl_data_engineering_spark.plans.base import release_deferred
    from nfl_data_engineering_spark.storage import (registry_rdd_ids,
                                                    unpersist_rdd_ids,
                                                    untrack_checkpoint)

    monkeypatch.delenv("SPARK_GRAFT_NO_FINALIZE", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    release_deferred()
    before = registry_rdd_ids(spark)
    parent = finalize(_frame(spark).groupBy("k").agg(F.count("*").alias("n")))
    created = registry_rdd_ids(spark) - before
    assert created
    child = parent.filter(F.col("n") > 142)          # lazy: reads the ckpt
    ids = untrack_checkpoint(parent)
    assert ids == frozenset(created)
    del parent                                       # wrapper dies tracked-free
    release_deferred()                               # sweep must NOT release
    assert created <= registry_rdd_ids(spark), \
        "untracked checkpoint blocks must survive the sweep"
    assert child.count() == 6                        # child still readable
    assert unpersist_rdd_ids(spark, ids) == len(ids)
    assert not (registry_rdd_ids(spark) & created)
    # untracking an unknown frame is a no-op returning empty
    assert untrack_checkpoint(child) == frozenset()


def test_sweep_retries_on_transient_release_error(spark, monkeypatch):
    """A transient failure releasing a dead wrapper's blocks must keep the
    entry tracked for the next sweep (round-8 review: dropping it on ANY
    exception leaked the blocks for the session's lifetime); only a
    stopped session may drop it."""
    import nfl_data_engineering_spark.storage as storage
    from nfl_data_engineering_spark.plans.base import release_deferred
    from nfl_data_engineering_spark.storage import registry_rdd_ids

    monkeypatch.delenv("SPARK_GRAFT_NO_FINALIZE", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", raising=False)
    release_deferred()
    before = registry_rdd_ids(spark)
    out = finalize(_frame(spark).groupBy("k").agg(F.count("*").alias("n")))
    created = registry_rdd_ids(spark) - before
    assert created
    del out

    orig = storage.unpersist_rdd_ids
    monkeypatch.setattr(storage, "unpersist_rdd_ids",
                        lambda *a: (_ for _ in ()).throw(
                            RuntimeError("transient py4j hiccup")))
    assert storage.sweep_dead_checkpoints() == 0
    assert created <= registry_rdd_ids(spark), \
        "blocks must survive a failed sweep attempt"
    monkeypatch.setattr(storage, "unpersist_rdd_ids", orig)
    assert storage.sweep_dead_checkpoints() >= len(created)   # retried
    assert not (registry_rdd_ids(spark) & created)


def test_cached_plan_aqe_scope_sets_restores_and_rightsizes(spark):
    """cached_plan_aqe (plans/base.py): inside the scope AQE may coalesce
    a cache-filling plan (a tiny post-shuffle cache materializes in far
    fewer partitions than spark.sql.shuffle.partitions — the fixed
    per-partition Arrow/task cost the round-12 unigram/containment
    entries pay without it); the conf is restored on exit and on error."""
    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    from nfl_data_engineering_spark.plans.base import cached_plan_aqe

    before = spark.conf.get(key)
    assert before == "false"  # Spark default: cache partitioning pinned

    tiny = (_frame(spark).groupBy("k").agg(F.count("*").alias("n")))
    with cached_plan_aqe(spark):
        assert spark.conf.get(key) == "true"
        c = tiny.cache()
        try:
            c.count()
            # 7 groups over a 32-partition shuffle: AQE coalesces the
            # cached plan to a handful of partitions instead of 32
            assert c.rdd.getNumPartitions() < int(
                spark.conf.get("spark.sql.shuffle.partitions"))
        finally:
            c.unpersist()
    assert spark.conf.get(key) == before

    try:
        with cached_plan_aqe(spark):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before
