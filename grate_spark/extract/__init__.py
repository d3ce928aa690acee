"""Per-format tabular extractors + format detection/dispatch.

Runs entirely inside Arrow UDF batches — one call per file blob, no Spark
objects here. Dispatch mirrors the reference registry order
(xls=1, xlsx=5, tsv=10, csv=15 — grate.go:58-92) but replaces blind
trial-and-error with cheap magic-byte pre-dispatch (CFB signature -> xls,
ZIP signature -> xlsx, else text), and prefers the extension's parser for
``.csv``/``.tsv`` paths so RFC-4180 files aren't mis-read as 1-column TSV.
"""

from __future__ import annotations

import base64
import posixpath
from dataclasses import dataclass, field
from typing import Iterator, Optional

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
ZIP_MAGIC = b"PK\x03\x04"


class NotInFormat(Exception):
    """Opener-level rejection: the blob is not this format."""


class ExtractError(Exception):
    """The blob matched a format but is corrupt/unsupported."""


@dataclass
class Table:
    """One extracted sheet: rendered rows (grate Strings/Types/Formats).

    ``raw_rows`` carries the pre-render typed values (None for blanks)
    aligned with ``rows`` — used for typed views and golden comparison.
    """
    name: str
    rows: list[tuple[list[str], list[str], list[str]]]
    hidden: bool = False
    raw_rows: Optional[list[list]] = None


@dataclass
class ExtractResult:
    fmt: str
    tables: list[Table] = field(default_factory=list)

    def list(self) -> list[str]:
        """Visible sheet names (WorkBook.List, xls/sheets.go:14-23)."""
        return [t.name for t in self.tables if not t.hidden]

    def list_hidden(self) -> list[str]:
        """Hidden sheet names — the complement surface
        (WorkBook.ListHidden, xls/sheets.go:25-34)."""
        return [t.name for t in self.tables if t.hidden]

    def get(self, name: str) -> Table:
        """The named sheet (WorkBook.Get, xls/sheets.go:36-44); raises
        KeyError for an unknown name."""
        for t in self.tables:
            if t.name == name:
                return t
        raise KeyError(name)


def decode_content(content, lang: Optional[str] = None) -> bytes:
    """Blob column -> raw bytes. Binary formats arrive base64-encoded in
    the string ``content`` column (BASELINE input_hint); text formats raw.
    """
    if content is None:
        return b""
    if isinstance(content, (bytes, bytearray)):
        return bytes(content)
    s = content
    # binary formats are base64 in the repo table; sniff by decodability
    # plus magic bytes so text that merely looks base64-ish stays text
    stripped = s.strip()
    if stripped and len(stripped) % 4 == 0:
        try:
            raw = base64.b64decode(stripped, validate=True)
            if raw[:8] == CFB_MAGIC or raw[:4] == ZIP_MAGIC:
                return raw
        except (ValueError, TypeError):
            pass
    return s.encode("utf-8")


def extract_blob(path: str, content, lang: Optional[str] = None
                 ) -> ExtractResult:
    """Extract every sheet of one file blob.

    Raises NotInFormat when no registered format accepts the blob, or
    ExtractError for corrupt/unsupported files.
    """
    from . import simple
    from .xlsx import open_xlsx
    from .xls import open_xls

    data = decode_content(content, lang)
    name = posixpath.basename(path or "")

    if data[:8] == CFB_MAGIC:
        return open_xls(name, data)
    if data[:4] == ZIP_MAGIC:
        return open_xlsx(name, data)

    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError as e:
        raise NotInFormat(f"binary content with no known signature: {e}")

    suffix = name.rsplit(".", 1)[-1].lower() if "." in name else ""
    if suffix == "csv":
        try:
            return simple.open_csv(name, text)
        except NotInFormat:
            return simple.open_tsv(name, text)
    if suffix == "tsv":
        return simple.open_tsv(name, text)
    # unknown text: reference registry order (tsv then csv)
    try:
        return simple.open_tsv(name, text)
    except NotInFormat:
        return simple.open_csv(name, text)


# (?i): case-insensitive so FOO.XLSX matches, keeping the CDC path
# filter consistent with is_tabular_path's lowercasing
TABULAR_SUFFIX_RE = r"(?i)\.(xlsx?|[ct]sv)$"


def is_tabular_path(path: str) -> bool:
    p = (path or "").lower()
    return p.endswith((".xls", ".xlsx", ".csv", ".tsv"))
