"""Native xlsx dim-table scan (S9, reference data_process.py:194-199)."""

from __future__ import annotations

import pytest

from jp_qcew_spark.sources.excel import (
    load_naics_dims_xlsx,
    read_xlsx,
    read_xlsx_rows,
)
from tests.xlsx_fixtures import Inline, write_xlsx


@pytest.fixture(scope="module")
def book(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xlsx") / "naics_codes.xlsx")
    sheet1 = [
        ["naics_data", "naics_desc", "weight", "active"],
        [1001, "Oilseed & Grain Farming", 1.5, True],
        [1002, Inline("Vegetable <&> Melon"), 2, False],
        # sparse row: description omitted entirely (cell absent, not empty)
        [1003, None, 0.25, True],
    ]
    sheet2 = [["naics_data"], [1001], [8888]]
    write_xlsx(path, {"descriptions": sheet1, "invalid": sheet2})
    return path


def test_rows_roundtrip_types_and_gaps(book):
    rows = read_xlsx_rows(book, sheet_id=1)
    assert rows[0] == ["naics_data", "naics_desc", "weight", "active"]
    assert rows[1] == [1001, "Oilseed & Grain Farming", 1.5, True]
    # shared vs inline string paths both decode; XML escapes unescaped
    assert rows[2][1] == "Vegetable <&> Melon"
    # numbers split int/float; omitted cell comes back as None at its slot
    assert rows[2][2] == 2 and isinstance(rows[2][2], int)
    assert rows[3] == [1003, None, 0.25, True]


def test_sheet_id_selection_and_bounds(book):
    assert read_xlsx_rows(book, sheet_id=2) == [["naics_data"], [1001], [8888]]
    with pytest.raises(ValueError, match="out of range"):
        read_xlsx_rows(book, sheet_id=3)


def test_dataframe_schema_inference(spark, book):
    df = read_xlsx(spark, book, sheet_id=1)
    assert [f.simpleString() for f in df.schema.fields] == [
        "naics_data:bigint",
        "naics_desc:string",
        "weight:double",
        "active:boolean",
    ]
    assert df.count() == 3


def test_naics_dim_load_feeds_wages_chain(spark, book):
    """The reference's exact two-sheet consumption: sheet 1 descriptions,
    sheet 2 invalid codes, flowing into enrich_wages unchanged."""
    from jp_qcew_spark.operators.wages import enrich_wages

    naics_desc, invalid = load_naics_dims_xlsx(spark, book)
    facts = spark.createDataFrame(
        [("100101", 10.0), ("100201", 20.0), ("999901", 30.0)],
        "naics_code string, total_wages double",
    )
    out = enrich_wages(facts, naics_desc, invalid)
    got = {r.naics_4digit: r.naics_desc_label for r in out.collect()}
    # 1001 excluded by sheet-2 invalid list; 9999 survives with null desc
    assert set(got) == {"1002", "9999"}
    assert got["1002"] == "(N1002) Vegetable <&> Melon"
    assert got["9999"] is None


# --------------------------------------------------------------------------
# spark.read.format("xlsx") — the Python DataSource wrapper
# --------------------------------------------------------------------------


def test_xlsx_datasource_matches_driver_reader(spark, book):
    from jp_qcew_spark.sources.excel import read_xlsx
    from jp_qcew_spark.sources.xlsx_datasource import XlsxDataSource

    spark.dataSource.register(XlsxDataSource)
    via_source = (
        spark.read.format("xlsx").option("sheet_id", 1).load(str(book))
    )
    via_driver = read_xlsx(spark, str(book), sheet_id=1)
    assert via_source.schema == via_driver.schema
    assert sorted(map(tuple, via_source.collect())) == sorted(
        map(tuple, via_driver.collect())
    )


def test_xlsx_datasource_glob_is_one_partition_per_file(
    spark, tmp_path_factory
):
    from tests.xlsx_fixtures import write_xlsx

    from jp_qcew_spark.sources.xlsx_datasource import XlsxDataSource

    d = tmp_path_factory.mktemp("books")
    for i in range(3):
        write_xlsx(
            str(d / f"part{i}.xlsx"),
            {"s": [["k", "v"], [f"row{i}", i], [f"alt{i}", i * 10]]},
        )
    spark.dataSource.register(XlsxDataSource)
    df = spark.read.format("xlsx").load(str(d / "*.xlsx"))
    assert df.rdd.getNumPartitions() == 3
    rows = {(r.k, r.v) for r in df.collect()}
    assert rows == {
        ("row0", 0), ("alt0", 0), ("row1", 1), ("alt1", 10),
        ("row2", 2), ("alt2", 20),
    }


def test_xlsx_datasource_rejects_mismatched_headers(spark, tmp_path_factory):
    import pytest as _pytest

    from tests.xlsx_fixtures import write_xlsx

    from jp_qcew_spark.sources.xlsx_datasource import XlsxDataSource

    d = tmp_path_factory.mktemp("mismatch")
    write_xlsx(str(d / "a.xlsx"), {"s": [["k", "v"], ["x", 1]]})
    write_xlsx(str(d / "b.xlsx"), {"s": [["other", "v"], ["y", 2]]})
    spark.dataSource.register(XlsxDataSource)
    df = spark.read.format("xlsx").load(str(d / "*.xlsx"))
    with _pytest.raises(Exception, match="inferred schema"):
        df.collect()
