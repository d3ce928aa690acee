"""BIFF8 workbook stream parsing (placeholder — BIFF phase)."""

from __future__ import annotations

from .. import ExtractError, ExtractResult


def parse_workbook(name: str, data: bytes) -> ExtractResult:
    raise ExtractError("xls: BIFF8 extraction not yet implemented")
