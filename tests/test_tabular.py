"""S3/S10: the self-contained OOXML (.xlsx) codec + registry load path.

The reference's schema registry IS an xlsx (team_rankings_scraper.py:15,
:246); these tests exercise the full write -> read -> DataFrame path with
no external Excel engine installed, plus the scraper wiring that consumes
the registry (record_cols / cols_to_keep threading).
"""

from __future__ import annotations

import zipfile

import pandas as pd
import pytest

from nfl_data_engineering_spark.sources.tabular import (
    REGISTRY_SCHEMA, read_registry_excel, read_xlsx_pandas, write_excel,
    write_xlsx_pandas)


def test_xlsx_roundtrip_strings_and_numbers(tmp_path):
    pdf = pd.DataFrame({
        "category": ["off", "def", "st"],
        "table_name": ["predictive", "yards per play", "kick_returns"],
        "n_cols": [3, 12, 7],
        "weight": [0.5, 1.25, -2.0],
    })
    path = str(tmp_path / "registry.xlsx")
    write_xlsx_pandas(pdf, path)
    back = read_xlsx_pandas(path)
    assert list(back.columns) == list(pdf.columns)
    assert back["category"].tolist() == ["off", "def", "st"]
    assert back["table_name"].tolist() == pdf["table_name"].tolist()
    assert back["n_cols"].tolist() == [3, 12, 7]
    assert back["weight"].tolist() == [0.5, 1.25, -2.0]


def test_xlsx_is_valid_zip_package(tmp_path):
    path = str(tmp_path / "t.xlsx")
    write_xlsx_pandas(pd.DataFrame({"a": [1]}), path)
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert "[Content_Types].xml" in names
    assert "xl/workbook.xml" in names
    assert "xl/worksheets/sheet1.xml" in names


def test_xlsx_empty_and_none_cells(tmp_path):
    pdf = pd.DataFrame({"a": ["x", None, ""], "b": [None, 2, None]})
    path = str(tmp_path / "holes.xlsx")
    write_xlsx_pandas(pdf, path)
    back = read_xlsx_pandas(path)
    assert back.shape == (3, 2)
    assert back["a"].tolist()[0] == "x"
    assert back["b"].tolist()[1] == 2


def test_registry_excel_to_dataframe(spark, tmp_path):
    pdf = pd.DataFrame({
        "category": ["off", "def"],
        "table_name": ["predictive", "scoring"],
        "base_url": ["https://example.test/a", "https://example.test/b"],
        "cols_to_keep": ["Rating,Pct", "Rating"],
        "record_cols": ["", "Record"],
    })
    path = str(tmp_path / "registry.xlsx")
    write_xlsx_pandas(pdf, path)
    df = read_registry_excel(spark, path)
    assert df.columns == [f.split()[0] for f in REGISTRY_SCHEMA.split(", ")]
    rows = {r["table_name"]: r for r in df.collect()}
    assert rows["scoring"]["record_cols"] == "Record"
    assert rows["predictive"]["cols_to_keep"] == "Rating,Pct"


def test_write_excel_from_spark_df(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "name string, n int")
    path = str(tmp_path / "export.xlsx")
    write_excel(df, path)
    back = read_xlsx_pandas(path)
    assert back["name"].tolist() == ["a", "b"]
    assert back["n"].tolist() == [1, 2]


def test_special_chars_escaped(tmp_path):
    pdf = pd.DataFrame({"t": ["<tag> & \"quote\"", "a\nb", "  spaced  "]})
    path = str(tmp_path / "esc.xlsx")
    write_xlsx_pandas(pdf, path)
    back = read_xlsx_pandas(path)
    assert back["t"].tolist() == ["<tag> & \"quote\"", "a\nb", "  spaced  "]


# ---------------------------------------------------------------------------
# Property tests: arbitrary frames must survive the OOXML roundtrip
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

# cell values the registry/export path actually carries: strings (incl.
# XML-hostile chars), full-range int64 (integer literals parse without
# the float truncation past 2^53), floats, None. Excel's XML forbids control
# chars below 0x20 except \t \n \r, so the string alphabet excludes them
# (the writer is a config/export sink, not a binary store).
_cell = st.one_of(
    st.none(),
    st.integers(min_value=-2**63 + 1, max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF)
            | st.sampled_from("\t\n<>&\"'"), max_size=40),
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(_cell, min_size=2, max_size=4), min_size=1,
                max_size=8).filter(
                    lambda rows: len({len(r) for r in rows}) == 1))
def test_xlsx_roundtrip_property(tmp_path_factory, rows):
    import pandas as pd
    ncols = len(rows[0])
    pdf = pd.DataFrame(rows, columns=[f"c{i}" for i in range(ncols)])
    path = str(tmp_path_factory.mktemp("xl") / "prop.xlsx")
    write_xlsx_pandas(pdf, path)
    back = read_xlsx_pandas(path)
    assert back.shape == pdf.shape
    for i in range(len(rows)):
        for j in range(ncols):
            # compare against what the FRAME holds, not the raw generated
            # value: pandas itself coerces an int to float64 at DataFrame
            # construction when a column mixes ints and floats — that
            # happens before the codec ever sees the cell. Object-dtype
            # columns (ints mixed with strings/None) keep exact ints and
            # still exercise the exact-int64 path.
            orig, got = pdf.iloc[i, j], back.iloc[i, j]
            if hasattr(orig, "item"):
                orig = orig.item()
            if orig is None or (isinstance(orig, float) and orig != orig):
                assert got is None or got != got
            elif isinstance(orig, str):
                assert got == orig
            elif isinstance(orig, bool):
                assert bool(got) == orig
            elif isinstance(orig, int):
                # exact int64 equality — float() comparison would mask
                # precision loss past 2^53
                assert int(got) == orig
            elif not float(orig).is_integer():
                assert float(got) == orig
            else:
                assert float(got) == float(orig)
