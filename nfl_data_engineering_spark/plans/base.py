"""Plumbing shared by the query catalog.

Determinism rules (the driver hash-compares Spark vs DuckDB values):

1. Money/metric sums go through DECIMAL then cast to DOUBLE — decimal
   aggregation is exact in both engines, so the final double is bit-equal
   regardless of row/partition order.
2. Averages are computed as exact-decimal-sum :: double / count.
3. Every ranking window pins a total order (unique-id tiebreak).
4. All hash-based ops use the md5-derived h60 primitive (identical across
   engines); no engine-native hash functions in results.
5. Every computed column is aliased identically in the Spark plan and the
   oracle SQL.
6. NO list_reduce/lambda folds in oracle SQL: DuckDB 1.0 returns wrong
   results for list_reduce fused into a parallel grouped aggregate
   (observed: per-cell correct when filtered, wrong over the full table).
   Order-sensitive reductions are expressed as window row_number + joins,
   or sidestepped by quantizing addends to integers (order-free sums).
7. ROUND on a DOUBLE is engine-divergent on tie-adjacent values (verified:
   Spark round(1.005d, 2) = 1.01 via shortest-repr HALF_UP, DuckDB
   ROUND(1.005::DOUBLE, 2) = 1.00 via float rounding). Round in exact
   DECIMAL before any double cast (money paths), or replace the round
   with an integer floor division (ks_drift's d_stat pattern) for
   ratio-of-integer statistics. ROUND(double, 6) on organically-computed
   ratios is tolerated in legacy entries (ties there require a 7-digit
   shortest repr ending in 5 — never observed across three rounds and
   three scale factors) but new entries should use the integer forms.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..storage import (registry_rdd_ids, sweep_dead_checkpoints,
                       track_checkpoint)


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # ANSI SQL for DuckDB; None -> rows-only check
    ops: str                    # SURVEY.md §2 operator ids covered
    bench: bool = False         # include in bench.py headline set


# Caches whose release is deferred past the entry's result consumption
# (pair_table=True below). Catalog runners (bench.py, the endurance test)
# call release_deferred() between entries; a runner that never calls it
# degrades to the pre-round-5 behavior (caches live until session end).
_DEFERRED: list[DataFrame] = []


@contextmanager
def stream_state_partitions(spark: SparkSession, n: int | None = None):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming query's
    start/awaitTermination so its STATE STORE partitioning is sized to the
    aggregation, not to the session's batch default.

    Every state partition pays a fixed per-micro-batch cost (store open,
    delta file write, commit, maintenance) regardless of how many keys it
    holds — measured 2.95 s vs 1.26 s for the 150-key daily rollup drain
    at 32 vs 8 state partitions (guide §2.2's fixed-per-partition overhead
    applied to state stores). The right count tracks key cardinality and
    throughput, not the core count; the default (8, env
    SPARK_GRAFT_STREAM_PARTITIONS) is sized for the catalog's ~10^2-key
    streaming aggregations, and a 100 TB deployment raises it to its key
    volume. Only the streaming query started inside the scope binds this
    number (state layout is fixed at first start); the follow-up batch
    read of the sink runs at the restored session default. Results are
    partitioning-invariant — only placement changes."""
    if n is None:
        n = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@contextmanager
def cached_plan_aqe(spark: SparkSession):
    """Scope ``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning``
    = true around an entry whose caches are TINY relative to the session
    and whose consumers are per-partition-fixed-cost bound (Arrow
    mapInPandas passes, chains of near-empty stages).

    Spark leaves the flag false by default so a cache's output
    partitioning is stable for downstream reuse — but that also disables
    AQE coalescing on the cache-filling plan, so a 31-row distinct-word
    table caches as 32 near-empty partitions and every Viterbi
    mapInPandas over it launches 32 Python tasks that each pay the
    ~0.25 s fixed Arrow/worker cost for a row or two of work (measured:
    the whole unigram family, guide §2.2's fixed-per-partition overhead
    at the Python boundary). Inside the scope AQE right-sizes the cache
    to its actual bytes; at 100 TB the same caches are GB-scale and AQE's
    bytes/parallelism target keeps them wide, so nothing degrades — the
    flag only matters where the cache is small, exactly where the fixed
    cost dominates.

    NOT session-global: the jaccard-star family's shingle-array caches
    feed compute-dense row-local JVM passes, and coalescing them starves
    those cores (measured: leakage_safe_split 1.85 -> 2.46 s,
    dedup_star_survivors 1.30 -> 2.02 s with the flag on) — so each
    entry opts in only where its cache consumers are fixed-cost bound.
    The flag must be set while the cache MATERIALIZES (every scoped
    entry fills its caches eagerly inside the scope); results are
    partitioning-invariant per the determinism doctrine."""
    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def scoped_cached_plan_aqe(fn):
    """Entry decorator for :func:`cached_plan_aqe` — the scoped form for
    QueryDef.spark callables (every scoped entry fills its caches
    eagerly inside the function body, so the flag is live exactly while
    they materialize)."""
    import functools

    @functools.wraps(fn)
    def wrap(spark: SparkSession, sf_dir: str) -> DataFrame:
        with cached_plan_aqe(spark):
            return fn(spark, sf_dir)
    return wrap


def _no_finalize() -> bool:
    """Opt-out flag, truthy ONLY for explicit on-values — '0'/'false'/''
    keep finalization ON (ADVICE r5: any-non-empty was backwards for a
    user exporting SPARK_GRAFT_NO_FINALIZE=0)."""
    return os.environ.get("SPARK_GRAFT_NO_FINALIZE", "").lower() in (
        "1", "true", "yes")


def _reliable_checkpoint() -> bool:
    """Cluster-mode switch (VERDICT r6 item 7): swap finalize()'s eager
    localCheckpoint — non-replicated executor-local blocks, unrecoverable
    on executor loss — for a RELIABLE checkpoint written under the
    context's checkpoint dir (HDFS/S3 on a real cluster). The caller must
    have run spark.sparkContext.setCheckpointDir(...) first; Spark raises
    if not. Same explicit-true parsing as the opt-out flag."""
    return os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINT", "").lower() in (
        "1", "true", "yes")


def finalize(result: DataFrame, *caches: DataFrame,
             pair_table: bool = False) -> DataFrame:
    """Release an entry's fan-out caches without losing their benefit:
    materialize `result` executor-side (eager localCheckpoint — the
    cached intermediates are read exactly once more, no driver
    round-trip), then unpersist the caches. Without this, a session
    running the full query catalog accumulates storage-memory
    entries for the life of the SparkSession — Spark's cache registry
    pins persisted plans until an explicit unpersist (ADVICE r4).
    Checkpoint blocks, by contrast, are ContextCleaner-managed: freed
    when the returned DataFrame is garbage-collected. The trade is
    materializing the (small, post-filter) RESULT to release the
    (large, pre-aggregation) intermediates — the same move as writing
    a stage's output and dropping its scratch tables on a cluster.

    Two trade-offs a cluster deployment must know (ADVICE r5):

    * localCheckpoint stores NON-REPLICATED executor-local blocks with
      lineage truncated — an executor loss makes the returned frame
      unrecoverable (cache() could recompute; checkpoint cannot). Fine
      in local mode and for driver-collected results; a long-lived
      cluster pipeline sets SPARK_GRAFT_RELIABLE_CHECKPOINT=1 (plus
      sparkContext.setCheckpointDir to a durable path) to swap in a
      reliable checkpoint — tested in tests/test_finalize.py.
    * finalization makes the QueryDef.spark() call EAGERLY execute the
      query at plan-construction time. Plan-only consumers (explain
      dumps, schema checks, tools/audit_plans.py) must set
      SPARK_GRAFT_NO_FINALIZE=1 to get the raw lazy plan back (caches
      then retained — acceptable in one-off processes).

    LIFETIME CONTRACT (ADVICE r7): the returned frame's checkpoint
    blocks are released by the next release_deferred() after its Python
    wrapper dies. A LAZY plan derived from it still reads those blocks
    through the truncated lineage, so "derive a child, drop the parent,
    keep the child" is NOT supported by default — either keep the parent
    referenced until every derived plan is materialized (what every
    catalog runner does: the entry result is collected before the next
    entry's release_deferred), or take ownership first via
    storage.untrack_checkpoint(parent) and release the returned ids
    yourself once the children are consumed.

    ``pair_table=True`` marks entries whose RESULT is the largest frame
    in the plan (pair-enumeration outputs: ~10^8 legitimate rows at the
    100x replica for the minhash baseline — SCALE.md). Eagerly
    checkpointing that to executor storage to free two SMALLER caches
    would invert the "small result, large intermediates" trade, so
    instead the raw plan is returned and its caches are parked on the
    deferred list: they stay hot through the result's consumption (the
    pair plan reads them) and are released by the runner's next
    release_deferred() call."""
    if _no_finalize():
        return result
    if pair_table:
        _DEFERRED.extend(caches)
        return result
    if _reliable_checkpoint():
        # reliable checkpoints live as FILES under the checkpoint dir,
        # not as persistent-registry blocks — nothing to track
        out = result.checkpoint(eager=True)
    else:
        # record the checkpoint's registry ids so release is EXPLICIT
        # (release_deferred's sweep) once the wrapper dies — the
        # ContextCleaner/py4j-detach chain is GC-paced and can lose a
        # detach, pinning one block forever (VERDICT r6 item 1's flake).
        # The result of an eager localCheckpoint is self-contained (its
        # plan scans its own checkpoint), satisfying storage.py's
        # tracking contract. The diff may also catch cache blocks this
        # job materialized; those unpersist below, making their ids
        # stale in the tracked set — unpersist_rdd_ids skips absent ids.
        before = registry_rdd_ids(result.sparkSession)
        out = result.localCheckpoint(eager=True)
        track_checkpoint(out, registry_rdd_ids(result.sparkSession) - before)
    for c in caches:
        c.unpersist()
    return out


def finalize_cc(result: DataFrame, labels: DataFrame,
                *caches: DataFrame) -> DataFrame:
    """finalize() for entries built on a checkpointed helper frame that
    exposes ``_ckpt_ids`` (connected_components' final labels, the BPE
    loop's final token table): after the eager checkpoint materializes
    every dependent of that frame, its checkpoint has no live reader and
    is released EXPLICITLY, completing the deterministic-release story.
    CC's driver fast path persists nothing, so the release is a no-op at
    small edge counts. Skipped under SPARK_GRAFT_NO_FINALIZE: the
    returned plan is then still lazy and reads that checkpoint —
    unconditional release there destroys blocks a later collect needs
    (round-7 review finding on q_bpe_encode)."""
    from ..storage import unpersist_rdd_ids
    out = finalize(result, *caches)
    if not _no_finalize():
        unpersist_rdd_ids(labels.sparkSession,
                          getattr(labels, "_ckpt_ids", set()))
    return out


def release_deferred() -> int:
    """Unpersist caches parked by finalize(pair_table=True) AND
    explicitly release finalize-checkpoint blocks whose Python wrapper
    has died (storage.sweep_dead_checkpoints — deterministic, no GC in
    the path); returns how many storage entries were released.
    Idempotent; call between catalog entries.

    Tolerates parked frames from a since-STOPPED SparkSession (their
    blocks died with the JVM; the min-of-N bench runs one fresh session
    per repetition and the first release_deferred of rep 2 used to NPE on
    rep 1's parked caches). Same retry policy as sweep_dead_checkpoints:
    a transient failure on a LIVE session keeps the frame parked for the
    next call rather than leaking its blocks."""
    from ..storage import _session_stopped
    n = 0
    keep: list[DataFrame] = []
    for c in _DEFERRED:
        try:
            c.unpersist()
            n += 1
        except Exception:
            if not _session_stopped(c.sparkSession):
                keep.append(c)
    _DEFERRED[:] = keep
    return n + sweep_dead_checkpoints()


def dec(c, p="18,2"):
    """Exact-decimal cast for money/metric aggregation (determinism rule 1).
    Shared here so every plan module rounds through the SAME precision."""
    return F.col(c).cast(f"decimal({p})")


def cents(col):
    """Quantize a 2-decimal money double to exact integer cents — the
    entry point to the all-integer statistics paths (rule 7). One shared
    definition; the oracle twin is CAST(round(x * 100) AS BIGINT)."""
    if isinstance(col, str):
        col = F.col(col)
    return F.round(col * 100).cast("bigint")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table.

    The events table is written with nanosecond timestamps, which Spark's
    parquet reader rejects; read them as int64 nanos and convert losslessly
    (the generator emits microsecond-aligned values) with integer division —
    double division would lose precision above 2^53 epoch-nanos.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # rebuild as TIMESTAMP_NTZ (not timestamp_micros -> LTZ): the
            # oracle engine reads nanos as naive UTC wall time, and LTZ
            # would re-render every year/month/hour extraction through the
            # session zone — a silent divergence on any non-UTC driver
            df = df.withColumn(
                "ts", F.expr("timestampadd(MICROSECOND, ts div 1000, "
                             "TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
        return df
    return spark.read.parquet(path)
