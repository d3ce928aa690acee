"""Unit tests for the number-format engine (commonxl parity).

Vectors transcribed from the reference's own unit tests where they are
consistent with its code (commonxl/frac_test.go:14-57,
commonxl/fmt_test.go:110-141) plus derived cases for the general-format
11-char rule, comma insertion, date serials, and the custom-format
compiler.
"""

import datetime as dt
import math

import pytest

from grate_spark.formats import Formatter, make_formatter
from grate_spark.formats import cells as C
from grate_spark.formats.dates import format_go_time, serial_to_datetime
from grate_spark.formats.fmt import add_commas, frac_fmt_func, ident_func
from grate_spark.formats.numbers import decimal_to_whole_fraction


# --- fractions (commonxl/frac_test.go) ------------------------------------

FRACS = [
    (0, "0", 1), (0.5, "1/2", 1), (-0.5, "-1/2", 1), (0.125, "1/8", 1),
    (10, "10", 1), (-10, "-10", 1), (10.5, "10 1/2", 1), (-10.5, "-10 1/2", 1),
    (10.25, "10 1/4", 1), (10.75, "10 3/4", 1), (10.667, "10 2/3", 1),
    (-10.25, "-10 1/4", 1), (-10.75, "-10 3/4", 1), (-10.667, "-10 2/3", 1),
    (3.14159, "3 1/7", 1), (3.14159, "3 1/7", 2), (3.14159, "3 16/113", 3),
    (3.14159, "3 431/3044", 4), (3.14159, "3 3432/24239", 5),
    (3.14159, "3 14159/100000", 6),
    (math.pi, "3 1/7", 1), (math.pi, "3 1/7", 2), (math.pi, "3 16/113", 3),
    (math.pi, "3 16/113", 4), (math.pi, "3 14093/99532", 5),
    (math.pi, "3 14093/99532", 6),
    (-math.pi, "-3 1/7", 1), (-math.pi, "-3 1/7", 2),
    (-math.pi, "-3 16/113", 3), (-math.pi, "-3 16/113", 4),
    (-math.pi, "-3 14093/99532", 5), (-math.pi, "-3 14093/99532", 6),
]


@pytest.mark.parametrize("v,s,n", FRACS)
def test_fractions(v, s, n):
    assert frac_fmt_func(n)(None, v) == s


# --- general format / identFunc -------------------------------------------

IDENT = [
    (True, "TRUE"), (False, "FALSE"),
    (1, "1"), (-1, "-1"), (1000000000000, "1000000000000"),
    (42.0, "42"), (99.1, "99.1"), (7e8, "700000000"),
    (2.4e-8, "0.000000024"),  # exactly 11 chars -> 'f' form
    (0.0001, "0.0001"), (1e-05, "0.00001"),
    (1.234, "1.234"), (1.2345678, "1.2345678"), (1.0, "1"),
    (123456789.0, "123456789"),
    (1000000000000.0, "1e+12"),  # 'f' is 13 chars -> %.6g
    (123456790.234, "1.23457e+08"),
    (-42.1, "-42.1"),
    ("hello", "hello"),
]


@pytest.mark.parametrize("v,s", IDENT)
def test_ident(v, s):
    assert ident_func(None, v) == s


# --- commas (consistent subset of commonxl/fmt_test.go:14-82) --------------

COMMAS = [
    (10, "10"), (10.0, "10"), (10.12345, "10.12345"),
    (-10, "-10"), (-10.0, "-10"), (-9.87655, "-9.87655"),
    (100, "100"), (1000, "1,000"), (1000.0, "1,000"),
    (1000.12345, "1,000.12345"), (-1000, "-1,000"),
    (10000, "10,000"), (100000, "100,000"), (1000000, "1,000,000"),
    (100000000, "100,000,000"),
    # float 1e6-region goes through %.6g -> scientific, commas untouched
    (-999999.87655, "-1e+06"),
]


@pytest.mark.parametrize("v,s", COMMAS)
def test_commas(v, s):
    assert add_commas(ident_func)(None, v) == s


def test_commas_scientific_mantissa():
    # commas are inserted before the 'e' — quirk preserved
    assert add_commas(lambda x, v: "12345.6e+08")(None, 0) == "12,345.6e+08"


# --- custom bool format (commonxl/fmt_test.go:110-141) ---------------------

def test_bool_format():
    ff, _ = make_formatter('"yes";"yes";"no"')
    for v in (False, 0, 0.0):
        assert ff(None, v) == "no"
    for v in (True, 99, -4, 4.0, -99.0):
        assert ff(None, v) == "yes"


# --- serial dates -----------------------------------------------------------

def test_serial_dates_epoch1900():
    f = Formatter()
    # Excel serial 1 = 1899-12-31 via the Julian branch
    assert serial_to_datetime(1.0) == dt.datetime(1899, 12, 31)
    # serial 2 = 1900-01-01
    assert serial_to_datetime(2.0) == dt.datetime(1900, 1, 1)
    # serial 61 = 1900-03-01 (the >= 61 branch; 60 is the phantom leap day)
    assert serial_to_datetime(61.0) == dt.datetime(1900, 3, 1)
    # big serial: 38179 = 2004-07-11
    assert serial_to_datetime(38179.0) == dt.datetime(2004, 7, 11)
    # fractional day
    assert serial_to_datetime(38179.5) == dt.datetime(2004, 7, 11, 12, 0, 0)


def test_serial_dates_mode1904():
    assert serial_to_datetime(100.0, True) == dt.datetime(1904, 4, 10)


def test_go_layout_render():
    t = dt.datetime(2004, 7, 11, 15, 4, 5)
    assert format_go_time(t, "2-Jan-06") == "11-Jul-04"
    assert format_go_time(t, "January 2, 2006") == "July 11, 2004"
    assert format_go_time(t, "01-02-06") == "07-11-04"
    assert format_go_time(t, "15:04:05") == "15:04:05"
    assert format_go_time(t, "3:04 PM") == "3:04 PM"
    t2 = dt.datetime(2004, 7, 11, 9, 30, 0)
    assert format_go_time(t2, "3:04 PM") == "9:30 AM"
    # literal quotes are preserved, like Go time.Format
    assert format_go_time(t, '2006"年"1"月"') == '2004"年"7"月"'


# --- builtin formats through the Formatter ----------------------------------

def test_builtin_formats():
    f = Formatter()
    assert f.apply(0, 42.0) == ("42", True)
    assert f.apply(2, 3.14159) == ("3.14", True)
    assert f.apply(9, 0.42) == ("42%", True)
    assert f.apply(10, 0.42171) == ("42.17%", True)
    assert f.apply(3, 1234567) == ("1,234,567", True)
    assert f.apply(11, 7e8) == ("7.00E+08", True)
    assert f.apply(12, 0.5) == ("1/2", True)
    assert f.apply(14, 38179.0) == ("07-11-04", True)
    assert f.apply(15, 38179.0) == ("11-Jul-04", True)
    # unknown id -> (Sprint, False)
    s, ok = f.apply(164, 7e8)
    assert not ok and s == "7e+08"


def test_custom_format_compile():
    f = Formatter()
    assert f.add(164, "0.00000")
    assert f.apply(164, 0.0) == ("0.00000", True)
    assert f.apply(164, 0.001) == ("0.00100", True)
    ct, ok = f.get_cell_type(164)
    assert ok and ct == C.FLOAT
    # builtin ids are not replaceable
    assert not f.add(14, "yyyy")


def test_custom_scientific_format():
    f = Formatter()
    f.add(165, "0.00E+00")
    s, ok = f.apply(165, 7e8)
    assert ok and s == "7.00E+08"


def test_custom_date_format():
    ff, ct = make_formatter('mmmm d", "yyyy')
    assert ct == C.DATE
    assert ff(Formatter(), 38179.0) == "July 11, 2004"


def test_format_switch_sections():
    ff, _ = make_formatter("0.0;(0.0);zero")
    assert ff(None, 1.25) == "1.2"  # %2.1f
    # the negative section surrounds but does not strip the sign — the
    # parens-negatives behavior belongs to addNegParens, not surround
    assert ff(None, -1.25) == "(-1.2)"
    assert ff(None, 0.0) == "zero"


def test_coercion_matrix():
    f = Formatter()
    c = C.new_cell_with_type("42", C.INTEGER, f)
    assert c.value == 42 and c.ctype == C.INTEGER
    c = C.new_cell_with_type(1.0, C.BOOLEAN, f)
    assert c.value is True
    c = C.new_cell_with_type(38179.0, C.DATE, f)
    assert c.value == dt.datetime(2004, 7, 11) and c.ctype == C.DATE
    c = C.new_cell_with_type("", C.INTEGER, f)  # blank stays blank-ish
    assert c.ctype == C.BLANK


# -- cross-type compare (commonxl/cell.go:319-463) -----------------------------

def test_cell_less_matrix():
    from grate_spark.formats.cells import (BOOLEAN, FLOAT, INTEGER, STRING,
                                           Cell, cell_less, new_cell)

    c = new_cell
    # bool rows: F < truthy, T < nothing
    assert cell_less(c(False), c(True)) is True
    assert cell_less(c(True), c(False)) is False
    assert cell_less(c(False), c(1)) is True
    assert cell_less(c(False), c(0)) is False
    assert cell_less(c(False), c(0.5)) is True
    assert cell_less(c(False), c("yes")) is True
    assert cell_less(c(False), c("nope")) is False
    assert cell_less(c(True), c(99)) is False
    # int rows
    assert cell_less(c(1), c(2)) is True
    assert cell_less(c(2), c(1)) is False
    assert cell_less(c(1), c(1.5)) is True
    assert cell_less(c(1), c(True)) is False
    assert cell_less(c(0), c(True)) is True
    assert cell_less(c(5), c("12")) is True      # numeric parse of str
    assert cell_less(c(5), c("12abc")) is True   # Sscanf trailing junk
    assert cell_less(c(5), c("abc")) is True     # falls to "5" < "abc"
    assert cell_less(c(5), c(float(2**64))) is True   # > MaxInt64
    assert cell_less(c(5), c(float(-2**64))) is False  # < MinInt64
    # float rows
    assert cell_less(c(1.5), c(2)) is True
    assert cell_less(c(1.5), c("1.6")) is True
    assert cell_less(c(1.5), c("x")) is True     # "1.5" < "x"
    assert cell_less(c(float(2**64)), c(7)) is False
    assert cell_less(c(float(-2**64)), c(7)) is True
    assert cell_less(c(0.5), c(True)) is True
    # string rows
    assert cell_less(c("a"), c("b")) is True
    assert cell_less(c("12"), c(13)) is True     # parse str as int
    assert cell_less(c("1.5"), c(1.6)) is True
    assert cell_less(c("x"), c(2)) is False      # "x" < "2" is False
    assert cell_less(c("no"), c(True)) is True   # bool-literal aware
    assert cell_less(c("yes"), c(True)) is False
    # nil never less / nothing less than before nil
    assert cell_less(Cell(None, 0), c(5)) is False
    assert cell_less(c(5), Cell(None, 0)) is False


def test_cell_equal_numeric_first():
    from grate_spark.formats.cells import Cell, FLOAT, INTEGER, STRING, \
        cell_equal, new_cell

    c = new_cell
    assert cell_equal(c(2), c(2.0)) is True
    assert cell_equal(c(2), c(3)) is False
    assert cell_equal(Cell("2.5", STRING), Cell(2.5, FLOAT)) is True
    assert cell_equal(c("a"), c("a")) is True
    assert cell_equal(c("a"), c("b")) is False
    # non-numeric falls back to mutual Less
    assert cell_equal(c(False), c("no")) is True
    assert cell_equal(c(False), c("yes")) is False
    # reference quirk (cell.go:338): the second operand's fallback parse
    # reads Sprint of the FIRST value, so numeric-vs-unparseable-string
    # self-compares and reports equal
    assert cell_equal(Cell(2, INTEGER), Cell("zzz", STRING)) is True
