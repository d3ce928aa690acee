"""Excel number-format engine: built-in tables + custom-code compiler.

The ``Formatter`` resolves a numeric format id to a rendering function and
an implied cell type; custom format-code strings are compiled with the
same precedence rules as the reference (``commonxl/formats.go:76-196``).
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any

from . import cells as C
from .cells import go_sprint
from .dates import serial_to_datetime
from .fmt import (FmtFunc, add_commas, ident_func, sprintf_func, static_fmt,
                  surround, switch_fmt_func, time_fmt_func)
from .tables import BUILTIN_FORMATS, BUILTIN_FORMAT_TYPES, BUILTIN_FORMATTERS

_MINS = re.compile(r"h.*m.*s")
_NON_ESC = re.compile(r'([^"]|^)"')
_SQUASH = re.compile(r"[*_].")
_FIX_ESC = re.compile(r"\\(.)")
_BRACKETS = re.compile(r"\[[^\]]*\]")
_TEXT_LIT = re.compile(r'"[^"]*"')
_EXP_PART = re.compile(r"[eE]+[+-]0+")
_NUM_RUN = re.compile(r"[0#?,.]+")

# Go layout replacements for Excel date tokens, applied once each in order
# (commonxl/formats.go:104-113).
_DATE_REPS = [
    ("hh", "15"), ("h", "15"),
    ("ss", "05"), ("s", "5"),
    ("mmmmm", "Jan"),
    ("mmmm", "January"), ("mmm", "Jan"),
    ("mm", "01"), ("m", "1"),
    ("dddd", "Monday"), ("ddd", "Mon"),
    ("dd", "02"), ("d", "2"),
    ("yyyy", "2006"), ("yy", "06"),
]


def _last_index_any(s: str, chars: str) -> int:
    return max(s.rfind(c) for c in chars)


def make_formatter(code: str) -> tuple[FmtFunc, int]:
    """Compile an Excel format-code string -> (renderer, implied CellType).

    Precedence mirrors the reference: strip [...] sections, split ';'
    into a sign switch, detect date tokens and translate to a Go layout,
    else derive a printf spec from the 0#?.,%eE digit pattern, then wrap
    with commas/surround/static handling.
    """
    s = _BRACKETS.sub("", code)
    if ";" in s:
        parts = s.split(";")
        pos_ff, ctype_pos = make_formatter(parts[0])
        rem = [make_formatter(p)[0] for p in parts[1:]]
        return switch_fmt_func(pos_ff, *rem), ctype_pos

    # strip quoted literals before token detection
    s2 = _TEXT_LIT.sub("", s)

    if any(ch in s2 for ch in "ymdhs"):
        m = _MINS.search(s)
        if m is not None:
            inner = s[m.start():m.end()]
            inner = inner.replace("mm", "04", 1)
            inner = inner.replace("m", "4", 1)
            s = s[:m.start()] + inner + s[m.end():]
        reps = [list(r) for r in _DATE_REPS]
        if "AM" in s or "PM" in s:
            reps[0][1] = "03"
            reps[1][1] = "3"
        for old, new in reps:
            s = s.replace(old, new, 1)
        s = _NON_ESC.sub(r"\1", s)
        s = _SQUASH.sub("", s)
        s = _FIX_ESC.sub(r"\1", s)
        return time_fmt_func(s), C.DATE

    if any(ch in s for ch in ".Ee"):
        verb = "E" if ("E" in s or "e" in s) else "f"
        s = _EXP_PART.sub("", s)
        s2 = s.replace(",", "")
        i1 = s2.find("0")
        i2 = s2.find(".")
        i3 = _last_index_any(s2, "0.")
        mul = 100 if "%" in s2 else 1
        ff: FmtFunc = sprintf_func("%%%d.%d%s" % (i3 - i1, i3 - i2, verb), mul)
        ctype = C.FLOAT
    else:
        s2 = s.replace(",", "")
        i1 = s2.find("0")
        i2 = _last_index_any(s2, "0.")
        mul = 100 if "%" in s2 else 1
        sf = "%%%dd" % (i2 - i1) if (i2 - i1) != 0 else "%d"
        ff = sprintf_func(sf, mul)
        ctype = C.INTEGER

    if "," in s:
        ff = add_commas(ff)

    prepost = _NUM_RUN.split(s, maxsplit=1)
    if prepost and prepost[0]:
        prepost[0] = _NON_ESC.sub(r"\1", prepost[0])
        prepost[0] = _SQUASH.sub("", prepost[0])
        prepost[0] = _FIX_ESC.sub(r"\1", prepost[0])
    if len(prepost) == 1:
        if prepost[0] == "@":
            return ident_func, C.STRING
        return static_fmt(prepost[0]), C.STRING
    if prepost[0] or prepost[1]:
        prepost[1] = _NON_ESC.sub(r"\1", prepost[1])
        prepost[1] = _SQUASH.sub("", prepost[1])
        prepost[1] = _FIX_ESC.sub(r"\1", prepost[1])
        ff = surround(prepost[0], ff, prepost[1])

    return ff, ctype


class Formatter:
    """Per-workbook format registry (commonxl/formats.go:10-64,198-224)."""

    __slots__ = ("mode1904", "custom_codes", "custom_code_types",
                 "custom_code_strings")

    def __init__(self) -> None:
        self.mode1904 = False
        self.custom_codes: dict[int, FmtFunc] = {}
        self.custom_code_types: dict[int, int] = {}
        self.custom_code_strings: dict[int, str] = {}

    def set_mode1904(self, enabled: bool) -> None:
        self.mode1904 = enabled

    def add(self, fmt_id: int, format_code: str) -> bool:
        """Register a custom number format; built-ins are not replaceable.

        Returns False instead of raising on conflicts — callers in the
        extractors ignore registration failures like the reference does.
        """
        if format_code.lower() == "general":
            self.custom_codes[fmt_id] = BUILTIN_FORMATTERS[0]
            self.custom_code_strings.setdefault(fmt_id, format_code)
            return True
        if fmt_id in BUILTIN_FORMATTERS:
            return False
        if fmt_id in self.custom_codes:
            return False
        ff, ct = make_formatter(format_code)
        self.custom_codes[fmt_id] = ff
        self.custom_code_types[fmt_id] = ct
        self.custom_code_strings[fmt_id] = format_code
        return True

    def get_cell_type(self, fmt_id: int) -> tuple[int, bool]:
        ct = BUILTIN_FORMAT_TYPES.get(fmt_id)
        if ct is not None:
            return ct, True
        ct = self.custom_code_types.get(fmt_id)
        if ct is not None:
            return ct, True
        return 0, False

    def apply(self, fmt_id: int, val: Any) -> tuple[str, bool]:
        """Render val with format fmt_id; ok=False when id is unknown."""
        ff = BUILTIN_FORMATTERS.get(fmt_id)
        if ff is None:
            custom = self.custom_codes.get(fmt_id)
            if custom is not None:
                return custom(self, val), True
            return go_sprint(val), False
        return ff(self, val), True

    def convert_to_date(self, val: float) -> _dt.datetime:
        return serial_to_datetime(val, self.mode1904)


__all__ = [
    "Formatter", "make_formatter", "BUILTIN_FORMATS",
    "BUILTIN_FORMAT_TYPES", "BUILTIN_FORMATTERS", "go_sprint",
]
