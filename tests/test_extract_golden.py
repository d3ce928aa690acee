"""Golden parity: extraction output vs the reference testdata fixtures.

The binary fixtures and their TSV goldens live in the read-only reference
checkout; tests skip if it is absent. Comparison follows the reference's
own golden protocol (xls/simple_test.go:74-84): compare cell-by-cell over
the golden's grid with numeric-tolerant equality, plus strict string
equality for the TSV-format fixtures themselves (their golden IS the
file).
"""

import os

import pytest

from grate_spark.extract import extract_blob, NotInFormat
from grate_spark.extract.simple import open_tsv

REF = "/root/reference/testdata"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference testdata not available")


def load_fixture(fn: str) -> bytes:
    with open(os.path.join(REF, fn), "rb") as f:
        return f.read()


def golden_rows(fn: str) -> list[list[str]]:
    text = load_fixture(fn).decode("utf-8")
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return [ln.rstrip("\r").split("\t") for ln in lines]


def cells_equal(got: str, want: str) -> bool:
    """Numeric-tolerant golden compare (reference Cell.Equal analog)."""
    if got == want:
        return True
    try:
        return float(got) == float(want)
    except ValueError:
        return False


@needs_ref
@pytest.mark.parametrize("fixture", ["basic.tsv", "basic2.tsv",
                                     "testing.tsv", "multi_test.tsv"])
def test_tsv_identity(fixture):
    """Extracting a TSV re-renders its own lines exactly."""
    text = load_fixture(fixture).decode("utf-8")
    res = extract_blob(fixture, text)
    assert res.fmt == "tsv"
    assert res.tables[0].name == fixture
    want = golden_rows(fixture)
    got = [r[0] for r in res.tables[0].rows]
    assert got == want


@needs_ref
def test_tsv_types_and_formats():
    res = extract_blob("basic.tsv", load_fixture("basic.tsv").decode())
    cells, types, formats = res.tables[0].rows[1]
    assert cells == ["1", "Hello", "42.0", "0.0"]
    assert types == ["string"] * 4
    assert formats == ["General"] * 4
    # blank detection
    res2 = extract_blob("multi_test.tsv",
                        load_fixture("multi_test.tsv").decode())
    cells, types, _ = res2.tables[0].rows[0]
    assert types[0] == "blank" and types[1] == "string"


@needs_ref
@pytest.mark.parametrize("fixture,golden", [
    ("basic.xlsx", "basic.tsv"),
    # the two pairs enabled in the reference's own CI
    # (xls/simple_test.go:13-15)
    ("basic.xls", "basic.tsv"),
    ("testing.xls", "testing.tsv"),
])
def test_spreadsheet_golden(fixture, golden):
    """Raw-value comparison over the golden grid, the reference's own
    protocol (xls/simple_test.go:74-84): numeric cells compare as floats,
    others as strings."""
    res = extract_blob(fixture, load_fixture(fixture))
    assert res.fmt == fixture.rsplit(".", 1)[-1]
    want = golden_rows(golden)
    table = res.tables[0]
    raws = table.raw_rows
    for ri, wrow in enumerate(want):
        for ci, wval in enumerate(wrow):
            rval = raws[ri][ci] if ri < len(raws) and ci < len(raws[ri]) else None
            if isinstance(rval, (int, float)) and not isinstance(rval, bool):
                assert float(rval) == float(wval), (
                    f"{fixture} ({ri},{ci}): got {rval!r} want {wval!r}")
            else:
                got = "" if rval is None else str(rval)
                assert cells_equal(got, wval), (
                    f"{fixture} ({ri},{ci}): got {rval!r} want {wval!r}")
    # any extra extracted rows must be entirely blank (grid-growth artifact)
    for extra in raws[len(want):]:
        assert all(v is None for v in extra)


@needs_ref
def test_xlsx_basic_types():
    res = extract_blob("basic.xlsx", load_fixture("basic.xlsx"))
    rows = res.tables[0].rows
    # header row is shared strings
    assert rows[0][1][:4] == ["string"] * 4
    # data row: int-like floats extracted as numbers
    assert rows[1][1][0] in ("float", "integer")


@needs_ref
def test_xlsx_basic2_custom_formats():
    """basic2's custom numFmt ids (59-61) collide with the reference's
    built-in th-TH table, whose Add refuses overrides — so the *built-in*
    formats apply. These assertions pin grate's actual behavior (its own
    golden pair is disabled for exactly this reason,
    xls/simple_test.go:17-18)."""
    res = extract_blob("basic2.xlsx", load_fixture("basic2.xlsx"))
    got = [r[0] for r in res.tables[0].rows]
    assert got[1] == ["1", "Hello", "42", "0"]       # 59 -> builtin %d
    assert got[3] == ["3", "This", "700000000.00", "0"]  # 60 -> %4.2f
    # raw value coerced to int by the format's implied type, like the
    # reference's Put -> NewCellWithType path
    assert res.tables[0].raw_rows[4][3] == 0
    assert res.tables[0].raw_rows[4][0] == 4.0


@needs_ref
def test_xlsx_multi_test_extracts():
    """Pins grate-actual behavior for multi_test.xlsx (its golden pair is
    disabled in the reference: custom numFmt ids 59-62 collide with th-TH
    built-ins, so e.g. the Fractions column renders via builtin %d)."""
    res = extract_blob("multi_test.xlsx", load_fixture("multi_test.xlsx"))
    assert res.fmt == "xlsx"
    got = [r[0] for r in res.tables[0].rows]
    flat = ["\t".join(r) for r in got]
    # merged-cell sentinels placed
    assert any("↓" in s or "⤓" in s for s in flat)
    assert any("→" in s and "⇥" in s for s in flat)
    # builtin th %d won over the file's fraction-ish values
    assert got[1][3] == "44198"
    # numFmt 64 '"yes";"yes";"no"' does NOT collide -> custom bool works
    assert got[14][5] == "yes" and got[15][5] == "no"
    # bool cells render TRUE/FALSE
    assert got[1][5] == "TRUE" and got[3][5] == "FALSE"
    # formula cell without cached value keeps the formula text (last
    # CharData wins, like the reference)
    assert got[9][4] == "E5+E6"


def test_csv_quoted_embedded_newlines():
    text = 'a,b,c\n"x,1","line1\nline2",3\n"do""quote",2,3\n'
    res = extract_blob("quoted.csv", text)
    assert res.fmt == "csv"
    rows = [r[0] for r in res.tables[0].rows]
    assert rows[1] == ["x,1", "line1\nline2", "3"]
    assert rows[2] == ['do"quote', "2", "3"]


def test_ambiguous_rejected():
    # 30 2-col rows out of 40 -> >25 occurrences but <=80% -> ambiguous
    lines = ["a\tb"] * 30 + ["c"] * 10
    with pytest.raises(NotInFormat):
        open_tsv("ambiguous.txt", "\n".join(lines))


def test_single_col_accepted():
    res = extract_blob("single.tsv", "a\nb\nc\n")
    assert [r[0] for r in res.tables[0].rows] == [["a"], ["b"], ["c"]]


def test_crlf_tsv():
    res = extract_blob("x.tsv", "a\tb\r\nc\td\r\n")
    assert [r[0] for r in res.tables[0].rows] == [["a", "b"], ["c", "d"]]


def test_grater_cli_stdout_matches_tsv_golden(capsys):
    """The grater CLI analog (cmd/grater/main.go:16-57) prints the
    tab-joined rendered rows for each file argument."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "grater_cli", os.path.join(os.path.dirname(__file__),
                                   "..", "scripts", "grater.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    src = os.path.join(REF, "basic.xlsx")
    if not os.path.exists(src):
        import pytest
        pytest.skip("reference testdata not available")
    rc = mod.main([src])
    out = capsys.readouterr().out.rstrip("\n").split("\n")
    assert rc == 0
    assert out[0] == "a\tb\tc\td"
    assert out[1].startswith("1\tHello\t42")
    # a missing file is an error line on stderr + rc 1, not a crash
    rc = mod.main(["/nonexistent/file.xls"])
    assert rc == 1
