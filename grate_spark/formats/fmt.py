"""Number-format rendering functions and combinators.

Each format function takes ``(formatter, value)`` and returns the display
string, mirroring the reference FmtFunc design (``commonxl/fmt.go``). The
quirky details — the 11-character general-format switchover, commas
inserted into scientific mantissas, Go's %-verb mismatch strings — are
load-bearing for byte-exact output parity and ported deliberately.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable, Optional

from .cells import go_format_float_f, go_sprint
from .dates import format_go_time, serial_to_datetime
from .numbers import decimal_to_whole_fraction

FmtFunc = Callable[[Any, Any], str]


def static_fmt(s: str) -> FmtFunc:
    return lambda x, v: s


def surround(pre: str, ff: FmtFunc, post: str) -> FmtFunc:
    return lambda x, v: pre + ff(x, v) + post


def add_neg_parens(ff: FmtFunc) -> FmtFunc:
    def f(x, v):
        s1 = ff(x, v)
        if s1 and s1[0] == "-":
            return "(" + s1[1:] + ")"
        return s1
    return f


def add_commas(ff: FmtFunc) -> FmtFunc:
    """Insert thousands separators before the '.'/'e'/'E' (fmt.go:34-55)."""
    def f(x, v):
        s1 = ff(x, v)
        is_neg = False
        if s1 and s1[0] == "-":
            is_neg = True
            s1 = s1[1:]
        end = len(s1)
        for i, ch in enumerate(s1):
            if ch in ".eE":
                end = i
                break
        while end > 3:
            end -= 3
            s1 = s1[:end] + "," + s1[end:]
        return "-" + s1 if is_neg else s1
    return f


def ident_func(x, v) -> str:
    """'General' rendering (fmt.go:57-84): ints plain; floats shortest
    decimal if <=11 chars, else 6-sig-fig %g if <=11 chars, else Sprint."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        s = go_format_float_f(v)
        if len(s) <= 11 or (len(s) == 12 and v < 0):
            return s
        s = "%.6g" % v
        if len(s) <= 11:
            return s
        return go_sprint(v)
    if isinstance(v, str):
        return v
    return go_sprint(v)


def _go_sprintf(fs: str, v) -> str:
    return fs % v


def sprintf_func(fs: str, mul: int) -> FmtFunc:
    """printf-style numeric formats, x100 for percents (fmt.go:86-103)."""
    want_int = "%d" in fs

    def f(x, v):
        if isinstance(v, bool):
            return go_sprint(v)
        if isinstance(v, int):
            if want_int:
                return _go_sprintf(fs, v)
            # Go prints a %-verb mismatch marker here (fmt.Sprintf with an
            # int against a float verb); replicate its shape
            verb = fs[-1] if fs[-1] in "fE" else "v"
            return f"%!{verb}(int64={v})"
        if isinstance(v, float):
            val = v * mul
            if want_int:
                return _go_sprintf(fs, int(val))
            return _go_sprintf(fs, val)
        return go_sprint(v)
    return f


def convert_to_float64(v) -> tuple[float, bool]:
    """Numeric widening incl. string parse (fmt.go:110-147)."""
    if isinstance(v, bool):
        return (1.0, True) if v else (0.0, True)
    if isinstance(v, (int, float)):
        return float(v), True
    if isinstance(v, str):
        try:
            return float(v), True
        except ValueError:
            return 0.0, False
    return 0.0, False


def zero_dash_func(ff: FmtFunc) -> FmtFunc:
    def f(x, v):
        fval, ok = convert_to_float64(v)
        if not ok:
            return go_sprint(v)
        if fval == 0.0:
            return "-"
        return ff(x, v)
    return f


def frac_fmt_func(n: int) -> FmtFunc:
    """Fraction formats '# ?/?' (fmt.go:164-182)."""
    def f(x, v):
        fval, ok = convert_to_float64(v)
        if not ok:
            return "MUST BE numeric TO FORMAT CORRECTLY"
        w, num, den = decimal_to_whole_fraction(fval, n, n)
        if num == 0:
            return "%d" % w
        if w == 0:
            if fval < 0 and num > 0:
                num = -num
            return "%d/%d" % (num, den)
        return "%d %d/%d" % (w, num, den)
    return f


def switch_fmt_func(pos: FmtFunc, *others: FmtFunc) -> FmtFunc:
    """pos;neg;zero;text four-section dispatch (fmt.go:186-212)."""
    string_ff: FmtFunc = ident_func
    zero_ff = pos
    neg_ff = pos
    if len(others) > 0:
        neg_ff = others[0]
        if len(others) > 1:
            zero_ff = others[1]
            if len(others) > 2:
                string_ff = others[2]

    def f(x, v):
        val, ok = convert_to_float64(v)
        if not ok:
            return string_ff(x, v)
        if val == 0.0:
            return zero_ff(x, v)
        if val < 0.0:
            return neg_ff(x, v)
        return pos(x, v)
    return f


def _coerce_time(x, v) -> Optional[_dt.datetime]:
    if isinstance(v, _dt.datetime):
        return v
    fval, ok = convert_to_float64(v)
    if not ok:
        return None
    mode1904 = bool(x is not None and getattr(x, "mode1904", False))
    return serial_to_datetime(fval, mode1904)


def time_fmt_func(layout: str) -> FmtFunc:
    """Date/time rendering with a Go layout (dates.go:47-60)."""
    def f(x, v):
        t = _coerce_time(x, v)
        if t is None:
            return "MUST BE time.Time OR numeric TO FORMAT CORRECTLY"
        return format_go_time(t, layout)
    return f


def cn_time_fmt_func(layout: str) -> FmtFunc:
    """Same, with zh-CN AM/PM substitution (dates.go:64-78)."""
    def f(x, v):
        t = _coerce_time(x, v)
        if t is None:
            return "MUST BE time.Time OR numeric TO FORMAT CORRECTLY"
        s = format_go_time(t, layout)
        s = s.replace("AM", "上午", 1)
        return s.replace("PM", "下午", 1)
    return f
