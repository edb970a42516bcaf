"""Scale guards: the labeled O(n^2) baselines and the one driver-side
sink must refuse unbounded input instead of planning a corpus-scale job."""

from __future__ import annotations

import pandas as pd
import pytest

from nfl_data_engineering_spark.functions.similarity import (
    brute_force_topk, guard_allpairs)
from nfl_data_engineering_spark.sources.tabular import write_excel


def test_guard_allpairs_passes_under_cap(spark):
    df = spark.range(100)
    assert guard_allpairs(df, "t", max_rows=100) is df


def test_guard_allpairs_refuses_over_cap(spark):
    df = spark.range(101)
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        guard_allpairs(df, "t", max_rows=100)


def test_brute_force_topk_guards_fat_query_set(spark):
    # a query set too big to broadcast turns the baseline into a
    # cross-join; the guard fails fast instead
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(i + 100, [1.0, float(i)]) for i in range(10_001)],
        "q_id long, q_vec array<float>")
    with pytest.raises(ValueError, match="query set"):
        brute_force_topk(emb, q)


def test_write_excel_guards_large_tables(spark, tmp_path):
    df = spark.range(51).selectExpr("id", "CAST(id AS STRING) AS s")
    with pytest.raises(ValueError, match="driver-side export cap"):
        write_excel(df, str(tmp_path / "big.xlsx"), max_rows=50)
    # under the cap the export path still works end-to-end
    small = df.limit(3)
    write_excel(small, str(tmp_path / "ok.xlsx"), max_rows=50)
    from nfl_data_engineering_spark.sources.tabular import read_xlsx_pandas
    back = read_xlsx_pandas(str(tmp_path / "ok.xlsx"))
    assert back.shape == (3, 2)


def test_xlsx_reader_preserves_float_typed_cells(tmp_path):
    # 2.0 must read back as float 2.0, not int 2 (dtype-stable roundtrip);
    # integer literals still read as ints (ids above 2^53 stay exact)
    from nfl_data_engineering_spark.sources.tabular import (
        read_xlsx_pandas, write_xlsx_pandas)
    pdf = pd.DataFrame({"f": [2.0, 1e16], "i": [2, 10**16 + 1]})
    path = str(tmp_path / "typed.xlsx")
    write_xlsx_pandas(pdf, path)
    back = read_xlsx_pandas(path)
    assert isinstance(back["f"][0], float) and back["f"][0] == 2.0
    assert isinstance(back["f"][1], float)
    assert back["i"].tolist() == [2, 10**16 + 1]


def test_xlsx_reader_keeps_data_wider_than_header(tmp_path):
    # data cells beyond the header's last populated column must survive
    # with generated names, not be silently dropped
    import zipfile

    from nfl_data_engineering_spark.sources.tabular import (
        read_xlsx_pandas, write_xlsx_pandas)
    pdf = pd.DataFrame({"a": ["x"], "b": ["y"]})
    path = str(tmp_path / "wide.xlsx")
    write_xlsx_pandas(pdf, path)
    # splice an extra cell into the data row past the header width
    with zipfile.ZipFile(path) as zf:
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
        others = {n: zf.read(n) for n in zf.namelist()
                  if n != "xl/worksheets/sheet1.xml"}
    sheet = sheet.replace(
        '</row></sheetData>',
        '<c r="C2" t="inlineStr"><is><t>extra</t></is></c>'
        '</row></sheetData>')
    with zipfile.ZipFile(path, "w") as zf:
        for n, data in others.items():
            zf.writestr(n, data)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    back = read_xlsx_pandas(path)
    assert back.shape == (1, 3)
    assert back["col2"][0] == "extra"
