"""Micro-probe for the per-stage Python/Arrow fixed cost (VERDICT r12
item 1). Times an identity mapInArrow over a tiny cached frame at several
partition counts, against the same frame's pure-JVM noop write, and
reports the python worker process census so worker reuse is observable.

Usage: python tools/probe_arrow.py [reps]
Env: SPARK_GRAFT_PROBE_DAEMON=1 uses the preloading daemon module.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

from pyspark.sql import functions as F

try:
    import nfl_data_engineering_spark  # noqa: F401 — installed?
except ImportError:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfl_data_engineering_spark.session import get_spark


def worker_census() -> tuple[int, int]:
    out = subprocess.run(
        ["bash", "-c", "ps -eo pid,cmd | grep '[p]yspark' | grep -c daemon;"
         " ps -eo pid,cmd | grep -c '[p]yspark'"],
        capture_output=True, text=True).stdout.split()
    return (int(out[0]) if out else -1,
            int(out[1]) if len(out) > 1 else -1)


def ident(it):
    for b in it:
        yield b


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("arrow-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for nparts in (1, 8, 32):
        df = (spark.range(0, 2048, 1, nparts)
              .select("id", (F.col("id") * 2).alias("v")).cache())
        df.count()
        # JVM-only baseline: same frame, no Python
        jvm = []
        for _ in range(reps):
            t0 = time.time()
            df.select("id", "v").write.format("noop").mode("overwrite").save()
            jvm.append(time.time() - t0)
        walls = []
        for r in range(reps):
            sc.setJobDescription(f"probe mapInArrow {nparts}p rep{r}")
            t0 = time.time()
            (df.mapInArrow(ident, "id long, v long")
             .write.format("noop").mode("overwrite").save())
            walls.append(time.time() - t0)
        sc.setJobDescription(None)
        d, total = worker_census()
        print(f"nparts={nparts:3d} jvm_noop={min(jvm):.3f}s "
              f"arrow walls={['%.3f' % w for w in walls]} "
              f"min={min(walls):.3f} daemons={d} pyprocs={total}")
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
