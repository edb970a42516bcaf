"""Z-order clustered writer: roundtrip + data-skipping evidence."""

from __future__ import annotations

import glob
import os


from nfl_data_engineering_spark.io import (write_zordered,  # noqa: E402
                                           zorder_keyed)

SF = "/root/testdata/sf0.001"


def _file_ranges(path, cols):
    import pyarrow.parquet as pq
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        t = pq.read_table(f, columns=list(cols))
        if t.num_rows == 0:
            continue
        out.append({c: (min(t[c].to_pylist()), max(t[c].to_pylist()))
                    for c in cols})
    return out


def test_zorder_roundtrip_and_two_dim_clustering(spark, tmp_path):
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    out = str(tmp_path / "li_z")
    write_zordered(li, out, "l_partkey", "l_suppkey", num_files=16)

    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)

    row = li.selectExpr("min(l_partkey) a0", "max(l_partkey) a1",
                        "min(l_suppkey) b0", "max(l_suppkey) b1").collect()[0]
    span_a = row["a1"] - row["a0"] or 1
    span_b = row["b1"] - row["b0"] or 1

    ranges = _file_ranges(out, ("l_partkey", "l_suppkey"))
    assert len(ranges) > 4  # actually produced multiple files
    frac_a = sum((r["l_partkey"][1] - r["l_partkey"][0]) / span_a
                 for r in ranges) / len(ranges)
    frac_b = sum((r["l_suppkey"][1] - r["l_suppkey"][0]) / span_b
                 for r in ranges) / len(ranges)
    # both dimensions cluster: each file covers a minority of BOTH ranges
    # (a plain sort by l_partkey would give frac_b ~= 1.0)
    assert frac_a < 0.6, frac_a
    assert frac_b < 0.6, frac_b

    # point-filter skipping: a single l_partkey value hits few files
    probe = row["a0"] + (row["a1"] - row["a0"]) // 2
    containing = sum(1 for r in ranges
                     if r["l_partkey"][0] <= probe <= r["l_partkey"][1])
    assert containing < len(ranges)


def test_zorder_key_plan_has_no_global_window(spark):
    """The layout job must be cluster-shaped: z-key derivation is a
    row-local expression over approxQuantile cut points — no Window (the
    old ntile ranking funneled the whole table through ONE task) and no
    SinglePartition exchange anywhere in the physical plan."""
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    keyed = zorder_keyed(li, ["l_partkey", "l_suppkey"])
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "Exchange" not in plan, plan  # row-local: no shuffle at all
    # and the derivation is still correct: cells are within [0, 256)
    import pyspark.sql.functions as F
    row = keyed.agg(F.min("__z"), F.max("__z")).collect()[0]
    assert 0 <= row[0] <= row[1] < (1 << 16)


def test_expression_cells_equal_arrow_cells(spark):
    """The codegen'd nested-when quantile_cells (the SQL-only/no-Python
    alternative) must map every value to the SAME cell as the Arrow
    searchsorted kernel the layout job ships — including nulls (cell 0)
    and values below/above all cuts."""
    import pyspark.sql.functions as F

    from nfl_data_engineering_spark.io import (_quantile_cells_arrow,
                                               quantile_cells)
    li = (spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
          .select(F.col("l_partkey").cast("double").alias("v"))
          .union(spark.sql("SELECT CAST(NULL AS DOUBLE)"))
          .union(spark.sql("SELECT CAST('NaN' AS DOUBLE)"))
          .union(spark.sql("SELECT -1e18"))
          .union(spark.sql("SELECT 1e18")))
    cuts = li.stat.approxQuantile("v", [i / 64 for i in range(1, 64)],
                                  0.5 / 64)
    kern = _quantile_cells_arrow(cuts, bits=6)
    both = li.select(quantile_cells("v", cuts, bits=6).alias("expr_cell"),
                     kern(F.col("v")).alias("arrow_cell"))
    assert both.filter("expr_cell IS DISTINCT FROM arrow_cell").count() == 0


def test_zorder_three_columns_cluster_all_dims(spark, tmp_path):
    """N-column layout: with three z-ordered columns, every file covers a
    minority of EVERY column's range (a single-column sort would leave
    two of the three at ~1.0)."""
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    out = str(tmp_path / "li_z3")
    cols = ("l_partkey", "l_suppkey", "l_orderkey")
    write_zordered(li, out, *cols, num_files=16)
    back = spark.read.parquet(out)
    assert back.count() == li.count()

    spans = {}
    for c in cols:
        row = li.selectExpr(f"min({c}) a0", f"max({c}) a1").collect()[0]
        spans[c] = (row["a1"] - row["a0"]) or 1
    ranges = _file_ranges(out, cols)
    assert len(ranges) > 4
    for c in cols:
        frac = sum((r[c][1] - r[c][0]) / spans[c]
                   for r in ranges) / len(ranges)
        assert frac < 0.75, (c, frac)
