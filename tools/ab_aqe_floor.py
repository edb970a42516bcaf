"""Interleaved in-session A/B of the AQE coalescing floor (VERDICT r12
item 4): runs a cohort of queries under several
``spark.sql.adaptive.coalescePartitions.minPartitionSize`` values inside
ONE SparkSession, cycling the floor per repetition so machine drift hits
every arm equally. Reports per-query min and median walls per floor.

Usage: python tools/ab_aqe_floor.py [--reps N] [--floors 256k,512k,1m]
                                    [query ...]
Default cohort = the tiny-aggregate regression signature from VERDICT r12
item 3 plus the compute-dense round-12 winners it must not hurt.
"""

from __future__ import annotations

import statistics
import sys
import time

DEFAULT_QUERIES = [
    # tiny-aggregate cohort (the +60-110 ms signature)
    "rollup_revenue", "weekly_rollup", "promo_revenue_share",
    "skew_join_salted", "interval_incident_join",
    # compute-dense winners the 256k floor bought (must not regress)
    "triangle_count", "similarity_join_api",
]

FLOOR_KEY = "spark.sql.adaptive.coalescePartitions.minPartitionSize"


def main() -> None:
    argv = sys.argv[1:]
    reps, floors, names = 4, ["256k", "512k", "1m"], []
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1]); i += 2; continue
        if argv[i] == "--floors":
            floors = argv[i + 1].split(","); i += 2; continue
        names.append(argv[i]); i += 1
    if not names:
        names = DEFAULT_QUERIES

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from nfl_data_engineering_spark.plans.base import release_deferred
    from nfl_data_engineering_spark.plans.registry import CATALOG
    from nfl_data_engineering_spark.session import get_spark

    qs = {q.name: q for q in CATALOG if q.name in names}
    missing = set(names) - set(qs)
    assert not missing, f"unknown queries: {missing}"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("ab-aqe-floor")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        release_deferred()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.time()
        (qs[name].spark(spark, sf_dir)
         .write.format("noop").mode("overwrite").save())
        return time.time() - t0

    # warm every plan shape once (codegen/JIT) before any timed run
    for n in names:
        run(n)

    walls: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        # rotate arm order per rep so position effects cancel
        order = floors[rep % len(floors):] + floors[:rep % len(floors)]
        for fl in order:
            spark.conf.set(FLOOR_KEY, fl)
            for n in names:
                w = run(n)
                walls.setdefault((n, fl), []).append(w)
                print(f"# rep{rep} floor={fl} {n}: {w:.3f}s",
                      file=sys.stderr)
    spark.conf.set(FLOOR_KEY, "256k")

    print(f"{'query':28s} " + " ".join(f"{fl:>14s}" for fl in floors)
          + "   (min | median)")
    totals = {fl: 0.0 for fl in floors}
    for n in names:
        cells = []
        for fl in floors:
            v = walls[(n, fl)]
            totals[fl] += min(v)
            cells.append(f"{min(v):5.3f}|{statistics.median(v):5.3f}")
        print(f"{n:28s} " + " ".join(f"{c:>14s}" for c in cells))
    print(f"{'TOTAL (min)':28s} "
          + " ".join(f"{totals[fl]:>14.3f}" for fl in floors))
    spark.stop()


if __name__ == "__main__":
    main()
