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


def test_typed_column_strict_scan_mismatch(spark):
    """strict=True mirrors commonxl Scan (commonxl/sheet.go:178-222):
    a cell whose runtime TYPE differs from the target is a surfaced
    mismatch, not a silent NULL; matching cells scan normally."""
    from grate_spark.operators.postprocess import typed_column

    df = spark.createDataFrame(
        [("r", "p", "s", 0, ["42", "x"], "is"),    # int, string
         ("r", "p", "s", 1, ["7", "9"], "si"),     # string "7", int 9
         ("r", "p", "s", 2, [""], " ")],           # blank cell
        "repo string, path string, sheet string, row_id long, "
        "cells array<string>, types string")
    out = typed_column(df, 1, "int", "i", strict=True)
    out = typed_column(out, 1, "string", "s1", strict=True)
    rows = {r["row_id"]: r for r in out.collect()}
    # row 0 pos 1 is an integer cell: int scan ok, string scan mismatch
    assert rows[0]["i"] == 42 and rows[0]["i_mismatch"] is False
    assert rows[0]["s1"] is None and rows[0]["s1_mismatch"] is True
    # row 1 pos 1 is a STRING cell "7": lenient would parse 7; strict
    # flags the type mismatch and yields NULL
    assert rows[1]["i"] is None and rows[1]["i_mismatch"] is True
    assert rows[1]["s1"] == "7" and rows[1]["s1_mismatch"] is False
    # blank cell: Value() is "" (string) -> *string ok, *int64 errors
    assert rows[2]["s1"] == "" and rows[2]["s1_mismatch"] is False
    assert rows[2]["i_mismatch"] is True
    # position past the row's width is a mismatch, not a crash
    out2 = typed_column(df, 9, "int", "i9", strict=True)
    assert all(r["i9_mismatch"] for r in out2.collect())


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


def test_export_tsv_layout_and_content(spark, tmp_path):
    """B18/I25: grate2tsv-style sink — md5[0:2]/md5[2:4] bucket dirs
    (cmd/grate2tsv/main.go:186-229), one file set per (path, sheet),
    tab-joined cells in row_id order, blank rows dropped."""
    import glob
    import hashlib
    import os

    from grate_spark.operators.sinks import export_tsv

    df = spark.createDataFrame(
        [("r", "a/book.xlsx", "S1", 0, ["h1", "h2"], None),
         ("r", "a/book.xlsx", "S1", 1, ["v1", "v2"], None),
         ("r", "a/book.xlsx", "S1", 2, ["", ""], None),      # blank: drop
         ("r", "a/book.xlsx", "S2", 0, ["x"], None),
         ("r", "bad.xls", "S1", 0, ["junk"], "boom")],       # error: drop
        "repo string, path string, sheet string, row_id long, "
        "cells array<string>, error string")
    out = str(tmp_path / "results")
    export_tsv(df, out)

    md5 = hashlib.md5(b"book.xlsx").hexdigest()
    b1, b2 = md5[:2], md5[2:4]
    s1_dir = os.path.join(out, f"b1={b1}", f"b2={b2}",
                          "name=a_book.xlsx.S1")
    assert os.path.isdir(s1_dir), sorted(
        glob.glob(out + "/**", recursive=True))
    lines = []
    for part in sorted(glob.glob(s1_dir + "/part-*")):
        with open(part) as fh:
            lines += [ln.rstrip("\n") for ln in fh]
    assert lines == ["h1\th2", "v1\tv2"]  # row order kept, blank gone

    s2_dir = os.path.join(out, f"b1={b1}", f"b2={b2}",
                          "name=a_book.xlsx.S2")
    assert os.path.isdir(s2_dir)
    # the errored path must not be exported at all
    assert not glob.glob(out + "/**/name=bad.xls*", recursive=True)
