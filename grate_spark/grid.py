"""In-UDF sheet grid: typed cells scattered into a dense 2-D array.

This is the extraction engine's only intermediate representation — it
lives entirely inside one Arrow-UDF invocation per file blob and is never
shuffled. Semantics (auto-resize on out-of-bounds puts, merged-cell
sentinel passthrough, format-driven type coercion, lazy render) follow the
reference grid (``commonxl/sheet.go``) byte-for-byte, including its
grow-to-rows+1 artifact, because rendered output parity is the contract.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

from .formats import BUILTIN_FORMATS, Formatter
from .formats import cells as C
from .formats.cells import Cell, go_sprint, new_cell, new_cell_with_type

# Merged-cell sentinels (grate.go:94-104) — preserved byte-exactly.
CONTINUE_COLUMN_MERGED = "→"
END_COLUMN_MERGED = "⇥"
CONTINUE_ROW_MERGED = "↓"
END_ROW_MERGED = "⤓"

_SENTINELS = {CONTINUE_COLUMN_MERGED, END_COLUMN_MERGED,
              CONTINUE_ROW_MERGED, END_ROW_MERGED}


class Sheet:
    """Dense row-major grid of cells with a shared Formatter."""

    __slots__ = ("formatter", "num_rows", "num_cols", "rows")

    def __init__(self, formatter: Optional[Formatter] = None):
        self.formatter = formatter if formatter is not None else Formatter()
        self.num_rows = 0
        self.num_cols = 0
        self.rows: list[list[Optional[Cell]]] = []

    def resize(self, rows: int, cols: int) -> None:
        """Grow the grid (commonxl/sheet.go:23-48, quirks included)."""
        for i, r in enumerate(self.rows):
            if i > rows:
                break
            n = cols - len(r)
            if n > 0:
                r.extend([None] * n)

        if rows <= 0:
            rows = 1
        if cols <= 0:
            cols = 1
        self.num_rows = rows
        self.num_cols = cols

        while rows >= len(self.rows):
            self.rows.append([None] * cols)

    def put(self, row: int, col: int, value: Any, fmtno: int) -> None:
        """Place a typed value; auto-resize when out of bounds
        (commonxl/sheet.go:51-85)."""
        if row >= self.num_rows or col >= self.num_cols:
            # invalid per spec; resize in place instead of failing
            if row >= self.num_rows:
                self.num_rows = row + 1
            if col >= self.num_cols:
                self.num_cols = col + 1
            self.resize(self.num_rows, self.num_cols)

        if isinstance(value, str) and value in _SENTINELS:
            c = new_cell(value)
            c.ctype = C.STATIC
            self.rows[row][col] = c
            return

        if fmtno == 0:  # General — the dominant case, no type lookup
            c = new_cell(value)
        else:
            ct, ok = self.formatter.get_cell_type(fmtno)
            if not ok:
                c = new_cell(value)
            else:
                c = new_cell_with_type(value, ct, self.formatter)
        c.fmtno = fmtno
        self.rows[row][col] = c

    def set_value(self, row: int, col: int, value: Any) -> None:
        """Overwrite an existing cell as a string (formula string results)."""
        if row > self.num_rows or col > self.num_cols:
            return
        cell = self.rows[row][col]
        if cell is None:
            cell = Cell(None, C.BLANK, 0)
            self.rows[row][col] = cell
        cell.value = value
        cell.ctype = C.STRING

    def set_url(self, row: int, col: int, link: str) -> None:
        if row > self.num_rows or col > self.num_cols:
            return
        cell = self.rows[row][col]
        if cell is None:
            cell = Cell(None, C.BLANK, 0)
            self.rows[row][col] = cell
        cell.ctype = C.HYPERLINK
        cell.url = link

    # -- rendering ---------------------------------------------------------

    def render_row(self, row: list[Optional[Cell]]
                   ) -> tuple[list[str], list[str], list[str]]:
        """(strings, types, formats) for one grid row
        (commonxl/sheet.go:129-172)."""
        n = self.num_cols
        strs = [""] * n
        types = ["blank"] * n
        formats = [BUILTIN_FORMATS[0]] * n
        fmtr = self.formatter
        for i, cell in enumerate(row):
            if i >= n:
                break
            if cell is None:
                continue
            ct = cell.ctype
            types[i] = C.type_name(ct)
            fno = cell.fmtno
            if fno:
                formats[i] = BUILTIN_FORMATS.get(fno, str(fno))
            if ct == C.BLANK:
                strs[i] = ""
            elif ct == C.STATIC:
                strs[i] = cell.value
            elif fno == 0 and ct == C.STRING:
                # General-format string renders as itself — the hottest
                # cell kind; skip the formatter dispatch
                strs[i] = cell.value
            else:
                fs, ok = fmtr.apply(fno, cell.value)
                strs[i] = fs if ok else go_sprint(cell.value)
        return strs, types, formats

    def iter_rows(self) -> Iterator[tuple[list[str], list[str], list[str]]]:
        """Iterate every grid row (cursor semantics: len(rows) rows)."""
        for row in self.rows:
            yield self.render_row(row)

    def raw_row(self, row: list[Optional[Cell]]) -> list:
        """Pre-render typed values for one row (None for blank cells)."""
        n = self.num_cols
        out = [None] * n
        for i, cell in enumerate(row):
            if i < n and cell is not None and cell.ctype != C.BLANK:
                out[i] = cell.value
        return out

    def iter_raw_rows(self) -> Iterator[list]:
        for row in self.rows:
            yield self.raw_row(row)

    def is_empty(self) -> bool:
        return self.num_cols <= 1 and self.num_rows <= 1
