"""CSV/TSV extraction with dialect-acceptance heuristics.

Column-count histogram acceptance matches the reference thresholds
(simple/csv.go:48-63, simple/tsv.go:40-57): a file is *rejected as
ambiguous* only when some multi-column width occurs >25 times without
reaching the >10-rows-and->80% bar. TSV line scanning matches
``bufio.Scanner`` (split on \\n, strip one trailing \\r, 64 KiB line cap).

Deviation from the reference: its OpenCSV treats end-of-input as an error
(simple/csv.go:36-46 never special-cases io.EOF), so standalone CSV opens
always fail there; we implement the evident intent (EOF = success) since
the north star requires RFC-4180 quoted/embedded-newline parsing.
"""

from __future__ import annotations

import csv as _csv
import io

from . import ExtractError, NotInFormat, ExtractResult, Table

MAX_LINE_BYTES = 64 * 1024  # bufio.MaxScanTokenSize


def _scan_lines(text: str) -> list[str]:
    """bufio.Scanner line semantics: \\n-separated, trailing \\r dropped,
    no phantom final empty line."""
    if text == "":
        return []
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    out = []
    for ln in lines:
        if len(ln) > MAX_LINE_BYTES and len(ln.encode("utf-8")) > MAX_LINE_BYTES:
            raise ExtractError("line too long for TSV scanner")
        out.append(ln[:-1] if ln.endswith("\r") else ln)
    return out


def _looks_good(ncols: dict[int, int], total: int) -> int:
    """Reference acceptance metric. 2/0 = accept, 1 = ambiguous-reject."""
    looks = 0
    for c, n in ncols.items():
        if c <= 1:
            continue
        if n > 10 and n / total > 0.8:
            looks = 2
        elif n > 25 and looks == 0:
            looks = 1
    return looks


def _accept_or_raise(rows: list[list[str]], what: str) -> None:
    ncols: dict[int, int] = {}
    for r in rows:
        ncols[len(r)] = ncols.get(len(r), 0) + 1
    if _looks_good(ncols, len(rows)) == 1:
        raise NotInFormat(f"ambiguous column structure for {what}")


def _render(rows: list[list[str]]) -> list[tuple[list[str], list[str], list[str]]]:
    """simple-source rendering: raw strings, blank/string types, General."""
    out = []
    for r in rows:
        types = ["blank" if v == "" else "string" for v in r]
        out.append((r, types, ["General"] * len(r)))
    return out


def open_tsv(name: str, text: str) -> ExtractResult:
    rows = [ln.split("\t") for ln in _scan_lines(text)]
    _accept_or_raise(rows, "tsv")
    return ExtractResult("tsv", [Table(name, _render(rows))])


def open_csv(name: str, text: str) -> ExtractResult:
    # Go encoding/csv converts \r\n -> \n everywhere, incl. quoted fields
    text = text.replace("\r\n", "\n")
    rows: list[list[str]] = []
    try:
        reader = _csv.reader(io.StringIO(text), delimiter=",", quotechar='"',
                             doublequote=True, strict=True)
        for rec in reader:
            if not rec:
                continue  # Go csv skips blank lines
            rows.append(rec)
    except _csv.Error as e:
        # Go maps csv.ParseError to not-in-format
        raise NotInFormat(f"csv parse error: {e}")
    _accept_or_raise(rows, "csv")
    return ExtractResult("csv", [Table(name, _render(rows))])
