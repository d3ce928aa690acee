"""Excel serial-date conversion and Go-layout time rendering.

Ports the reference's date machinery (``commonxl/dates.go``): serials < 61
go through Julian-day math so Excel's phantom 1900-02-29 is handled; larger
serials offset from 1899-12-30 (or 1904-01-01 in 1904 mode). Rendering uses
Go reference-time layouts (``2-Jan-06`` style) because the reference's
format tables are expressed that way; unrecognized characters — including
quote marks in the CJK formats — are copied verbatim, exactly like Go's
``time.Format``.
"""

from __future__ import annotations

import datetime as _dt

_DAY_NS = 24 * 3600 * 1_000_000_000


def serial_to_datetime(val: float, mode1904: bool = False) -> _dt.datetime:
    """Excel serial number -> datetime (commonxl/dates.go:10-45)."""
    v = int(val)  # Go int(float) truncates toward zero; serials are >= 0
    if v < 61:
        jdate = val + 0.5
        if mode1904:
            jdate += 2416480.5
        else:
            jdate += 2415018.5
        jd = int(jdate)
        frac = jdate - float(jd)

        # integer Julian-day -> Gregorian (all-positive, // == Go /)
        L = jd + 68569
        N = 4 * L // 146097
        L = L - (146097 * N + 3) // 4
        I = 4000 * (L + 1) // 1461001
        L = L - 1461 * I // 4 + 31
        J = 80 * L // 2447
        day = L - 2447 * J // 80
        L = J // 11
        month = J + 2 - 12 * L
        year = 100 * (N - 49) + I + L

        ns = int(float(_DAY_NS) * frac)  # Go Duration truncation
        return _dt.datetime(year, month, day) + _dt.timedelta(
            microseconds=ns // 1000)

    frac = val - float(v)
    base = _dt.datetime(1904, 1, 1) if mode1904 else _dt.datetime(1899, 12, 30)
    ns = int(float(_DAY_NS) * frac)
    return base + _dt.timedelta(days=v, microseconds=ns // 1000)


# ---------------------------------------------------------------------------
# Go reference-time layout rendering.

_MONTHS = ["January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December"]
_DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
         "Sunday"]

# (layout token, renderer) tried longest-first at each position.
_TOKENS = [
    ("2006", lambda t: f"{t.year:04d}"),
    ("January", lambda t: _MONTHS[t.month - 1]),
    ("Monday", lambda t: _DAYS[t.weekday()]),
    ("Jan", lambda t: _MONTHS[t.month - 1][:3]),
    ("Mon", lambda t: _DAYS[t.weekday()][:3]),
    ("15", lambda t: f"{t.hour:02d}"),
    ("01", lambda t: f"{t.month:02d}"),
    ("02", lambda t: f"{t.day:02d}"),
    ("03", lambda t: f"{(t.hour % 12) or 12:02d}"),
    ("04", lambda t: f"{t.minute:02d}"),
    ("05", lambda t: f"{t.second:02d}"),
    ("06", lambda t: f"{t.year % 100:02d}"),
    ("PM", lambda t: "PM" if t.hour >= 12 else "AM"),
    ("pm", lambda t: "pm" if t.hour >= 12 else "am"),
    ("1", lambda t: str(t.month)),
    ("2", lambda t: str(t.day)),
    ("3", lambda t: str((t.hour % 12) or 12)),
    ("4", lambda t: str(t.minute)),
    ("5", lambda t: str(t.second)),
]


def _fractional(t: _dt.datetime, ndigits: int, keep_zeros: bool) -> str:
    # microsecond precision; Go layouts here never exceed 6 digits
    frac = f"{t.microsecond:06d}"[:ndigits].ljust(ndigits, "0")
    if keep_zeros:
        return "." + frac
    frac = frac.rstrip("0")
    return "." + frac if frac else ""


def format_go_time(t: _dt.datetime, layout: str) -> str:
    """Render ``t`` with a Go reference-time layout string."""
    out = []
    i = 0
    n = len(layout)
    while i < n:
        ch = layout[i]
        if ch == ".":
            # fractional seconds: .0.. (fixed) or .9.. (trim zeros)
            j = i + 1
            if j < n and layout[j] in "09":
                digit = layout[j]
                k = j
                while k < n and layout[k] == digit:
                    k += 1
                out.append(_fractional(t, k - j, digit == "0"))
                i = k
                continue
        matched = False
        for tok, fn in _TOKENS:
            if layout.startswith(tok, i):
                out.append(fn(t))
                i += len(tok)
                matched = True
                break
        if not matched:
            out.append(ch)
            i += 1
    return "".join(out)
