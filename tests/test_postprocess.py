"""Unit tests for post-extraction transforms (D5 blank-row filter, I24
sanitization, C5 typed Scan, IsEmpty sheet filter)."""

from pyspark.sql import functions as F

ROWS_SCHEMA = ("repo string, path string, sheet string, row_id long, "
               "cells array<string>")


def _rows(spark, data):
    return spark.createDataFrame(data, ROWS_SCHEMA)


def test_drop_blank_rows(spark):
    from grate_spark.operators.postprocess import drop_blank_rows

    df = _rows(spark, [
        ("r", "p", "s", 0, ["a", ""]),
        ("r", "p", "s", 1, ["", ""]),
        ("r", "p", "s", 2, []),
        ("r", "p", "s", 3, ["", "x"]),
    ])
    got = sorted(r["row_id"] for r in drop_blank_rows(df).collect())
    assert got == [0, 3]


def test_sanitize_cells(spark):
    from grate_spark.operators.postprocess import sanitize_cells

    df = _rows(spark, [("r", "p", "s", 0,
                        ["  a \t b ", "x\r\ny", "\t\t", "ok"])])
    got = sanitize_cells(df).collect()[0]["cells"]
    assert got == ["a b", "x y", "", "ok"]


def test_typed_column_scan(spark):
    from grate_spark.operators.postprocess import typed_column

    df = _rows(spark, [
        ("r", "p", "s", 0, ["42", "3.5", "YES", "2021-01-02 03:04:05"]),
        ("r", "p", "s", 1, ["nope", "x", "off", "not a date"]),
    ])
    out = typed_column(df, 1, "int", "i")
    out = typed_column(out, 2, "float", "f")
    out = typed_column(out, 3, "bool", "b")
    out = typed_column(out, 4, "timestamp", "ts")
    rows = {r["row_id"]: r for r in out.collect()}
    assert rows[0]["i"] == 42 and rows[0]["f"] == 3.5
    assert rows[0]["b"] is True and rows[0]["ts"] is not None
    # parse failures -> NULL (Scan's error analog); bool table: off=False
    assert rows[1]["i"] is None and rows[1]["f"] is None
    assert rows[1]["b"] is False and rows[1]["ts"] is None


def test_non_empty_sheets(spark):
    from grate_spark.operators.postprocess import non_empty_sheets

    df = _rows(spark, [
        ("r", "p", "empty", 0, [""]),          # 1x1 -> dropped
        ("r", "p", "wide", 0, ["a", "b"]),     # 1x2 -> kept
        ("r", "p", "tall", 0, ["a"]),          # 2x1 -> kept
        ("r", "p", "tall", 1, ["b"]),
    ])
    got = {r["sheet"] for r in non_empty_sheets(df).collect()}
    assert got == {"wide", "tall"}
