"""XLSX (OOXML) extraction: ZIP + rels + styles + sharedStrings + sheets.

Follows the reference pipeline (xlsx/xlsx.go:44-133, xlsx/workbook.go,
xlsx/sheets.go) re-expressed over ``zipfile`` + streaming ElementTree pull
parsing (O(row) memory, no DOM). Intra-file lookups — shared-string index,
xf->numFmt indirection, hyperlink rel ids — are plain dict/list lookups
inside the UDF; both sides of each "join" live in the same blob, so
nothing here ever shuffles.

NB (parity): like the reference, ``List()`` for xlsx does NOT filter
hidden sheets (xlsx/xlsx.go:152-158), and the ``dimension`` ref's 0-based
indexes are passed to Resize as-is (xlsx/sheets.go:108-124), relying on
out-of-bounds Puts to grow the grid to the true size.
"""

from __future__ import annotations

import io
import posixpath
import zipfile
from typing import Iterator, Optional
from xml.etree.ElementTree import XMLPullParser, ParseError

from . import ExtractError, NotInFormat, ExtractResult, Table
from ..formats import Formatter
from ..grid import (CONTINUE_COLUMN_MERGED, CONTINUE_ROW_MERGED,
                    END_COLUMN_MERGED, END_ROW_MERGED, Sheet)

_REL_OFFICE_DOC = ("http://schemas.openxmlformats.org/officeDocument/2006/"
                   "relationships/officeDocument")
_REL_WORKSHEET = ("http://schemas.openxmlformats.org/officeDocument/2006/"
                  "relationships/worksheet")
_REL_STYLES = ("http://schemas.openxmlformats.org/officeDocument/2006/"
               "relationships/styles")
_REL_SHARED_STRINGS = ("http://schemas.openxmlformats.org/officeDocument/"
                       "2006/relationships/sharedStrings")
_REL_HYPERLINK = ("http://schemas.openxmlformats.org/officeDocument/2006/"
                  "relationships/hyperlink")


_LOCAL_CACHE: dict = {}


def _local(tag: str) -> str:
    r = _LOCAL_CACHE.get(tag)
    if r is None:
        r = tag.rsplit("}", 1)[-1]
        _LOCAL_CACHE[tag] = r
    return r


def _int(s: str, default: int = 0) -> int:
    if not s:
        return default
    try:
        return int(s, 10)
    except (ValueError, TypeError):
        return default


def col2int(col: str) -> int:
    """Base-26 column letters: A=0, AA=26 (xlsx/types.go:48-57)."""
    idx = 0
    for c in col:
        idx = idx * 26 + (ord(c) - 0x40)
    return idx - 1


_DIGITS = "0123456789"
# column-letters -> 0-based index memo (A=0, AA=26); bounded by the
# number of distinct columns ever seen in a worker (< 16 384)
_COL_CACHE: dict = {}


def ref_to_indexes(r: str) -> tuple[int, int]:
    """A1/R1C1 reference -> (col, row), 0-based (xlsx/types.go:57-80)."""
    if len(r) < 2:
        return -1, -1
    i1 = -1
    for i, ch in enumerate(r):
        if ch in _DIGITS:
            i1 = i
            break
    if i1 <= 0:
        return -1, -1
    col1 = r[:i1]
    rest = r[i1:]
    i2 = rest.find("C")
    if i2 == -1:
        return col2int(col1), _int(rest) - 1
    # R1C1 mode
    return _int(rest[:i2]), _int(rest[i2 + 1:]) - 1


def _iter_xml(fileobj, events=("start", "end")) -> Iterator:
    parser = XMLPullParser(events=events)
    while True:
        chunk = fileobj.read(1 << 16)
        if not chunk:
            break
        parser.feed(chunk)
        yield from parser.read_events()
    parser.close()
    yield from parser.read_events()


class _Workbook:
    def __init__(self, z: zipfile.ZipFile):
        self.z = z
        self.names = set(z.namelist())
        self.rels: dict[str, dict[str, str]] = {}
        self.primary_doc = ""
        self.sheets: list[tuple[str, str, str]] = []  # (relID, name, docname)
        self.strings: list[str] = []
        self.xfs: list[int] = []
        self.fmt = Formatter()

    def open_member(self, name: str):
        if name not in self.names:
            raise KeyError(name)
        return self.z.open(name)

    # -- parsing stages (xlsx/workbook.go) ---------------------------------

    def parse_rels(self, member: str, basedir: str) -> None:
        with self.open_member(member) as f:
            for ev, el in _iter_xml(f, events=("start",)):
                if _local(el.tag) != "Relationship":
                    continue
                typ = el.get("Type", "")
                tgt = el.get("Target", "")
                rid = el.get("Id", "")
                bucket = self.rels.setdefault(typ, {})
                if tgt.startswith("/"):
                    bucket[rid] = tgt[1:]  # malformed absolute path
                else:
                    bucket[rid] = posixpath.normpath(
                        posixpath.join(basedir, tgt)) if basedir else tgt
                if typ == _REL_OFFICE_DOC:
                    self.primary_doc = tgt

    def parse_workbook(self) -> None:
        with self.open_member(self.primary_doc.lstrip("/")) as f:
            for ev, el in _iter_xml(f, events=("start",)):
                if _local(el.tag) != "sheet":
                    continue
                rid = name = None
                for k, v in el.attrib.items():
                    lk = _local(k)
                    if lk == "id":
                        rid = v
                    elif lk == "name":
                        name = v
                if rid is None or name is None:
                    raise ExtractError("xlsx: invalid sheet definition")
                docname = self.rels.get(_REL_WORKSHEET, {}).get(rid, "")
                self.sheets.append((rid, name, docname))

    def parse_styles(self, member: str) -> None:
        base_num_formats: list[str] = []
        self.xfs = []
        section = 0
        with self.open_member(member) as f:
            for ev, el in _iter_xml(f):
                tag = _local(el.tag)
                if ev == "start":
                    if tag == "numFmt":
                        fmt_no = _int(el.get("numFmtId", ""))
                        self.fmt.add(fmt_no, el.get("formatCode", ""))
                    elif tag == "cellStyleXfs":
                        section = 1
                    elif tag == "cellXfs":
                        section = 2
                    elif tag == "xf":
                        num_fmt_id = el.get("numFmtId", "")
                        apply_nf = el.get("applyNumberFormat", "")
                        xf_id = el.get("xfId", "")
                        if section == 1:
                            base_num_formats.append(
                                "0" if apply_nf == "0" else num_fmt_id)
                        elif section == 2:
                            base_id = _int(xf_id)
                            nf = ("0" if base_id >= len(base_num_formats)
                                  else base_num_formats[base_id])
                            # the reference unconditionally overrides the
                            # inherited id here (xlsx/workbook.go:150-160);
                            # replicated for behavioural parity
                            nf = "0" if apply_nf == "0" else num_fmt_id
                            self.xfs.append(_int(nf))
                else:
                    if tag in ("cellStyleXfs", "cellXfs"):
                        section = 0

    def parse_shared_strings(self, member: str) -> None:
        with self.open_member(member) as f:
            for ev, el in _iter_xml(f, events=("end",)):
                if _local(el.tag) == "si":
                    self.strings.append("".join(el.itertext()))
                    el.clear()

    # -- sheet scan (xlsx/sheets.go:29-214) ---------------------------------

    def parse_sheet(self, docname: str) -> Sheet:
        ws = Sheet(self.fmt)

        linkmap: dict[str, str] = {}
        base = posixpath.basename(docname)
        sub = docname[: len(docname) - len(base)]
        relsname = posixpath.normpath(posixpath.join(sub, "_rels",
                                                     base + ".rels"))
        if relsname in self.names:
            with self.open_member(relsname) as f:
                for ev, el in _iter_xml(f, events=("start",)):
                    if _local(el.tag) != "Relationship":
                        continue
                    if (el.get("TargetMode", "") == "External"
                            and el.get("Type", "") == _REL_HYPERLINK):
                        linkmap[el.get("Id", "")] = el.get("Target", "")

        max_col = max_row = 0
        # end-events only: <dimension/> is an empty element, so its end
        # event fires immediately; halves the pull-parser event traffic
        with self.open_member(docname) as f:
            for ev, el in _iter_xml(f, events=("end",)):
                tag = _local(el.tag)
                if tag == "dimension":
                    ref = el.get("ref", "")
                    if ref == "A1":
                        max_col, max_row = 1, 1
                        ws.resize(1, 1)  # empty-sheet short circuit
                        continue
                    dims = ref.split(":")
                    max_col, max_row = ref_to_indexes(dims[-1])
                    ws.resize(max_row, max_col)
                elif tag == "c":
                    self._handle_cell(ws, el)
                    el.clear()
                elif tag == "row":
                    el.clear()
                elif tag == "mergeCell":
                    self._handle_merge(ws, el, max_row, max_col)
                elif tag == "hyperlink":
                    ref = el.get("ref", "")
                    rid = ""
                    for k, v in el.attrib.items():
                        if _local(k) == "id":
                            rid = v
                    col, row = ref_to_indexes(ref)
                    link = linkmap.get(rid, "")
                    if col >= 0 and row >= 0:
                        ws.put(row, col, link, 0)
                        ws.set_url(row, col, link)
        return ws

    def _handle_cell(self, ws: Sheet, el) -> None:
        # value chunks first: style-only cells exit before attr work.
        # Fast path for the dominant shape <c ...><v>text</v></c>: the
        # last CharData chunk is the child's tail, else its text, else
        # the cell's own text — identical to itertext()'s last yield
        # when the single child is leaf; anything else (inlineStr with
        # nested runs, multiple children) takes the general path.
        if len(el) == 1 and not len(el[0]):
            sub = el[0]
            chunk = sub.tail or sub.text or el.text
            if not chunk:
                return
        else:
            chunks = [t for t in el.itertext() if t is not None]
            if not chunks:
                return
            # the reference Puts once per CharData chunk; last wins
            chunk = chunks[-1]
        get = el.get
        ref = get("r", "")
        ctype = get("t", "") or "n"
        sid = _int(get("s", ""))
        fno = self.xfs[sid] if sid < len(self.xfs) else 0

        # A1-style fast path with a memoized column-letter decode
        # (bounded: one entry per distinct column); R1C1/malformed refs
        # fall back to the general parser
        pre = ref.rstrip(_DIGITS)
        if pre and len(pre) < len(ref) and pre.isalpha():
            col = _COL_CACHE.get(pre)
            if col is None:
                col = col2int(pre)
                # only cache plausible Excel columns (max col XFD = 3
                # letters): a malicious file with many long distinct
                # prefixes must not grow worker memory unboundedly
                if len(pre) <= 3:
                    _COL_CACHE[pre] = col
            row = int(ref[len(pre):]) - 1
        else:
            col, row = ref_to_indexes(ref)
        if col < 0 or row < 0:
            return
        val: object = chunk
        if ctype == "b":
            val = bool(chunk[:1] == "1")
        elif ctype == "n":
            try:
                val = float(chunk)
            except ValueError:
                pass
        elif ctype == "s":
            si = _int(chunk)
            val = self.strings[si] if 0 <= si < len(self.strings) else ""
        # 'd', 'e', 'str', 'inlineStr' keep the raw string
        ws.put(row, col, val, fno)

    @staticmethod
    def _handle_merge(ws: Sheet, el, max_row: int, max_col: int) -> None:
        dims = el.get("ref", "").split(":")
        start_col, start_row = ref_to_indexes(dims[0])
        end_col, end_row = start_col, start_row
        if len(dims) > 1:
            end_col, end_row = ref_to_indexes(dims[1])
        if end_row > max_row:
            end_row = max_row
        if end_col > max_col:
            end_col = max_col
        for r in range(start_row, end_row + 1):
            for c in range(start_col, end_col + 1):
                if r == start_row and c == start_col:
                    continue  # keeps its value
                if c == start_col:
                    ws.put(r, c, END_ROW_MERGED if r == end_row
                           else CONTINUE_ROW_MERGED, 0)
                elif c == end_col:
                    ws.put(r, c, END_COLUMN_MERGED, 0)
                else:
                    ws.put(r, c, CONTINUE_COLUMN_MERGED, 0)


def open_xlsx(name: str, data: bytes) -> ExtractResult:
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise NotInFormat(f"not a zip container: {e}")

    wb = _Workbook(z)
    try:
        if "_rels/.rels" not in wb.names:
            raise NotInFormat("xlsx: missing _rels/.rels")
        wb.parse_rels("_rels/.rels", "")
        if not wb.primary_doc:
            raise ExtractError("xlsx: invalid document")

        primary = wb.primary_doc.lstrip("/")
        base = posixpath.basename(primary)
        sub = primary[: len(primary) - len(base)]
        relfn = posixpath.normpath(posixpath.join(sub, "_rels",
                                                  base + ".rels"))
        wb.parse_rels(relfn, sub)
        wb.parse_workbook()
        for member in wb.rels.get(_REL_STYLES, {}).values():
            wb.parse_styles(member)
        for member in wb.rels.get(_REL_SHARED_STRINGS, {}).values():
            wb.parse_shared_strings(member)

        tables = []
        for rid, sheet_name, docname in wb.sheets:
            ws = wb.parse_sheet(docname)
            tables.append(Table(sheet_name, list(ws.iter_rows()),
                                raw_rows=list(ws.iter_raw_rows())))
        return ExtractResult("xlsx", tables)
    except (KeyError, ParseError) as e:
        raise ExtractError(f"xlsx: {e}")
    finally:
        z.close()
