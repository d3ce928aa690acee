"""XLS (BIFF8) extraction: CFB container walk, record stream, SST, cells.

Filled in by the BIFF8 phase; the public entry point is ``open_xls``.
"""

from __future__ import annotations

from .. import ExtractError, ExtractResult


def open_xls(name: str, data: bytes) -> ExtractResult:
    from .workbook import parse_workbook

    return parse_workbook(name, data)
