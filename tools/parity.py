"""Local mirror of the driver's correctness gate: run every queries() entry
against its oracle_sql() in DuckDB on the same parquet and compare
row-count + column names + order-insensitive values.

Usage: python tools/parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as se

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-session simulation: the external harness passes its OWN
        # SparkSession, not our tuned one — every query must survive a
        # bone-stock session (no custom confs beyond master)
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.appName("parity-vanilla")
                 .master("local[8]").getOrCreate())
    else:
        from nfl_data_engineering_spark.session import get_spark
        spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = se.queries(), se.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in os_:
            print(f"SKIP {name}: no oracle (rows-only) — {len(spark_rows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(os_[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            failures.append(name)
            continue
        ok = True
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            ok = False
        elif len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
            ok = False
        else:
            s = normalize(spark_rows, spark_cols)
            d = normalize(duck_rows, duck_cols)
            if s != d:
                ok = False
                diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
                print(f"FAIL {name}: values differ; first diffs:")
                for a, b in diffs:
                    print(f"   spark={a}\n   duck ={b}")
        if ok:
            print(f"OK   {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
