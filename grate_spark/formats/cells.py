"""Cell model: tagged values with per-cell display formats.

Semantics follow the reference cell model (pbnjay/grate
``commonxl/cell.go``): a cell is ``[value, cell_type, format_no, url?]``.
Types are a closed enum; a coercion matrix converts between them when a
cell's number format implies a different type than its raw value
(``commonxl/cell.go:119-196``).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Optional

# CellType enum values (commonxl/cell.go:16-26)
BLANK = 0
INTEGER = 1
FLOAT = 2
STRING = 3
BOOLEAN = 4
DATE = 5
HYPERLINK = 6  # internal: string cell carrying a URL
STATIC = 7  # internal: merged-cell placeholder

_TYPE_NAMES = {
    BLANK: "blank",
    INTEGER: "integer",
    FLOAT: "float",
    STRING: "string",
    BOOLEAN: "boolean",
    DATE: "date",
    HYPERLINK: "hyperlink",
    STATIC: "static",
}


def type_name(ct: int) -> str:
    """Public type-name rendering (commonxl/cell.go:29-48)."""
    return _TYPE_NAMES.get(ct, "string")


# Accepted boolean literals (commonxl/cell.go:111-116).
BOOL_STRINGS = {
    "yes": True, "true": True, "t": True, "y": True, "1": True, "on": True,
    "no": False, "false": False, "f": False, "n": False, "0": False, "off": False,
    "YES": True, "TRUE": True, "T": True, "Y": True, "1.0": True, "ON": True,
    "NO": False, "FALSE": False, "F": False, "N": False, "0.0": False, "OFF": False,
}


class Cell:
    """One spreadsheet cell: raw value + type tag + display format id."""

    __slots__ = ("value", "ctype", "fmtno", "url")

    def __init__(self, value: Any, ctype: int, fmtno: int = 0,
                 url: Optional[str] = None):
        self.value = value
        self.ctype = ctype
        self.fmtno = fmtno
        self.url = url

    def __repr__(self) -> str:  # debug aid only
        return f"Cell({self.value!r}, {type_name(self.ctype)}, fmt={self.fmtno})"


BLANK_CELL = Cell(None, BLANK, 0)


def new_cell(value: Any) -> Cell:
    """Build a cell from a raw python value (commonxl/cell.go:199-303).

    Empty strings fold to blank; bytes decode as latin-1 (callers decode
    real encodings before reaching here).
    """
    if value is None:
        return Cell(None, BLANK, 0)
    if isinstance(value, bool):
        return Cell(value, BOOLEAN, 0)
    if isinstance(value, int):
        return Cell(value, INTEGER, 0)
    if isinstance(value, float):
        return Cell(value, FLOAT, 0)
    if isinstance(value, str):
        if not value:
            return Cell(None, BLANK, 0)
        return Cell(value, STRING, 0)
    if isinstance(value, (bytes, bytearray)):
        if not value:
            return Cell(None, BLANK, 0)
        return Cell(bytes(value).decode("latin-1"), STRING, 0)
    if isinstance(value, _dt.datetime):
        return Cell(value, DATE, 0)
    raise TypeError(f"grate_spark: cell data type not handled: {type(value)}")


def new_cell_with_type(value: Any, target: int, formatter) -> Cell:
    """Coercion matrix (commonxl/cell.go:119-196), ported branch-for-branch.

    ``formatter`` supplies Excel serial-date conversion for DATE targets.
    """
    c = new_cell(value)
    if c.ctype == target:
        return c

    if c.ctype == BOOLEAN:
        if target == INTEGER:
            c.value = 1 if c.value else 0
            c.ctype = INTEGER
        elif target == FLOAT:
            c.value = 1.0 if c.value else 0.0
            c.ctype = FLOAT
        elif target == STRING:
            # NB: the reference tags this FLOAT (commonxl/cell.go:142-147);
            # replicated for behavioural parity.
            c.value = "TRUE" if c.value else "FALSE"
            c.ctype = FLOAT

    if c.ctype == FLOAT:
        if target == INTEGER:
            c.value = int(c.value)
            c.ctype = INTEGER
        elif target == BOOLEAN:
            c.value = c.value != 0.0
            c.ctype = BOOLEAN
    if c.ctype == INTEGER:
        if target == FLOAT:
            c.value = float(c.value)
            c.ctype = FLOAT
        elif target == BOOLEAN:
            c.value = c.value != 0
            c.ctype = BOOLEAN
    if c.ctype == STRING:
        if target == INTEGER:
            try:
                c.value = int(c.value, 10)
            except ValueError:
                c.value = 0  # Go ParseInt error -> zero value
            c.ctype = INTEGER
        elif target == FLOAT:
            try:
                c.value = float(c.value)
            except ValueError:
                c.value = 0.0
            c.ctype = FLOAT
        elif target == BOOLEAN:
            c.value = BOOL_STRINGS.get(c.value, False)
            c.ctype = BOOLEAN
    if target == STRING:
        c.value = go_sprint(c.value)
        c.ctype = STRING
    if target == DATE:
        if c.ctype == FLOAT:
            c.value = formatter.convert_to_date(c.value)
        elif c.ctype == INTEGER:
            c.value = formatter.convert_to_date(float(c.value))
        c.ctype = DATE
    return c


# ---------------------------------------------------------------------------
# Go-compatible default renderings (fmt.Sprint analogs) used as fallbacks.


def go_format_float_f(x: float) -> str:
    """Shortest round-trip decimal rendering, never scientific.

    Mirrors Go ``strconv.FormatFloat(x, 'f', -1, 64)``.
    """
    r = repr(x)
    if "e" not in r and "E" not in r:
        if r.endswith(".0"):
            return r[:-2]
        return r
    # python repr switched to scientific; expand positionally keeping the
    # same shortest digits
    from decimal import Decimal

    return format(Decimal(r), "f")


def go_sprint_float(x: float) -> str:
    """Go ``fmt.Sprint(float64)``: shortest 'g'-style rendering.

    Shortest round-trip digits; scientific form iff the decimal exponent
    is < -4 or >= 6 (Go shortest-%g form selection), which differs from
    python repr's switchover points.
    """
    import math
    from decimal import Decimal

    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "+Inf" if x > 0 else "-Inf"
    d = Decimal(repr(x)).normalize()
    sign, digits, exp = d.as_tuple()
    ndigits = len(digits)
    e10 = ndigits + exp - 1  # decimal exponent of the leading digit
    if -4 <= e10 < 6:
        return format(d, "f")
    mant = str(digits[0])
    if ndigits > 1:
        mant += "." + "".join(str(dd) for dd in digits[1:])
    s = "-" if sign else ""
    esign = "+" if e10 >= 0 else "-"
    return f"{s}{mant}e{esign}{abs(e10):02d}"


def go_time_string(t: _dt.datetime) -> str:
    """Go ``time.Time.String()`` for UTC times (fmt.Sprint fallback)."""
    s = t.strftime("%Y-%m-%d %H:%M:%S")
    if t.microsecond:
        frac = f"{t.microsecond:06d}".rstrip("0")
        s += f".{frac}"
    return s + " +0000 UTC"


def go_sprint(v: Any) -> str:
    """Go ``fmt.Sprint`` for the value types cells can hold."""
    if v is None:
        return "<nil>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return go_sprint_float(v)
    if isinstance(v, str):
        return v
    if isinstance(v, _dt.datetime):
        return go_time_string(v)
    return str(v)


# ---------------------------------------------------------------------------
# Cross-type comparison (commonxl/cell.go:319-463).

import re as _re

_MAX_I64 = (1 << 63) - 1
_MIN_I64 = -(1 << 63)

_INT_RE = _re.compile(r"\s*([+-]?\d+)")
_FLOAT_RE = _re.compile(
    r"\s*([+-]?(?:\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|[iI][nN][fF](?:inity)?|[nN][aA][nN]))")


def _go_scan_int(s: str):
    """Go ``fmt.Sscanf(s, "%d", &x)``: leading int, trailing junk OK."""
    m = _INT_RE.match(s)
    return int(m.group(1)) if m else None


def _go_scan_float(s: str):
    """Go ``fmt.Sscanf(s, "%g", &x)``: leading float, trailing junk OK."""
    m = _FLOAT_RE.match(s)
    if not m:
        return None
    tok = m.group(1)
    low = tok.lstrip("+-").lower()
    if low.startswith("inf"):
        return float("-inf") if tok[0] == "-" else float("inf")
    if low.startswith("nan"):
        return float("nan")
    return float(tok)


def _num(v) -> float:
    """Numeric view used by Equal: ints cast, strings %g-scanned,
    unparseable -> 0.0 (Go's zero-value on Sscanf failure)."""
    if isinstance(v, bool):
        # Go: a bool is neither float64 nor int64 -> Sprint + %g scan
        # fails -> 0.0
        return 0.0
    if isinstance(v, (int, float)):
        return float(v)
    x = _go_scan_float(go_sprint(v))
    return 0.0 if x is None else x


def cell_equal(a: "Cell", b: "Cell") -> bool:
    """Reference ``Cell.Equal`` (commonxl/cell.go:319-344): numeric-first
    when either side is typed INTEGER/FLOAT, else mutual-Less equality.

    Faithfully reproduces the reference's quirk that the *second*
    operand's fallback parse scans ``fmt.Sprint(c[0])`` — the FIRST
    cell's value (cell.go:338: ``Sscanf(fmt.Sprint(c[0]), "%g", &v2)``)
    — so a numeric-typed cell compared against an unparseable value
    falls back to self-comparison.
    """
    if a.ctype in (FLOAT, INTEGER) or b.ctype in (FLOAT, INTEGER):
        v1 = _num(a.value)
        if isinstance(b.value, (int, float)) and not isinstance(
                b.value, bool):
            v2 = float(b.value)
        else:
            # reference scans Sprint(c[0]) here, not other[0]
            x = _go_scan_float(go_sprint(a.value))
            v2 = 0.0 if x is None else x
        return v1 == v2
    return cell_less(a, b) == cell_less(b, a)


def cell_less(a: "Cell", b: "Cell") -> bool:
    """Reference ``Cell.Less`` (commonxl/cell.go:346-463): typed
    comparison matrix with best-effort numeric parsing of strings."""
    v1, v2 = a.value, b.value
    if v1 is None:
        return False
    if isinstance(v1, bool):
        # F < truthy(v2); T < anything = F
        if v1:
            return False
        if v2 is None:
            return False
        if isinstance(v2, bool):
            return v2
        if isinstance(v2, int):
            return v2 != 0
        if isinstance(v2, float):
            return v2 != 0.0
        if isinstance(v2, str):
            return BOOL_STRINGS.get(v2, False)
        return False
    if isinstance(v1, int):
        if v2 is None:
            return False
        if isinstance(v2, bool):
            return v1 < (1 if v2 else 0)
        if isinstance(v2, int):
            return v1 < v2
        if isinstance(v2, float):
            if v2 < _MIN_I64:
                return False
            if v2 > _MAX_I64:
                return True
            return float(v1) < v2
        if isinstance(v2, str):
            x = _go_scan_int(v2)
            if x is not None:
                return v1 < x
            return go_sprint(v1) < v2
        raise TypeError("unable to compare cells (invalid internal type)")
    if isinstance(v1, float):
        if v2 is None:
            return False
        if isinstance(v2, bool):
            return v1 < (1.0 if v2 else 0.0)
        if isinstance(v2, int):
            if v1 < _MIN_I64:
                return True
            if v1 > _MAX_I64:
                return False
            return v1 < float(v2)
        if isinstance(v2, float):
            return v1 < v2
        if isinstance(v2, str):
            x = _go_scan_float(v2)
            if x is not None:
                return v1 < x
            return go_sprint(v1) < v2
        raise TypeError("unable to compare cells (invalid internal type)")
    if isinstance(v1, str):
        if v2 is None:
            return False
        if isinstance(v2, bool):
            return v2 and not BOOL_STRINGS.get(v1, False)
        if isinstance(v2, int):
            x = _go_scan_int(v1)
            if x is not None:
                return x < v2
            return v1 < go_sprint(v2)
        if isinstance(v2, float):
            x = _go_scan_float(v1)
            if x is not None:
                return x < v2
            return v1 < go_sprint(v2)
        if isinstance(v2, str):
            return v1 < v2
        raise TypeError("unable to compare cells (invalid internal type)")
    raise TypeError("unable to compare cells (invalid internal type)")
