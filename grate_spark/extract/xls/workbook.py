"""BIFF8 workbook stream parsing: records, substreams, globals, sheets.

Re-expresses the reference pipeline (xls/xls.go:175-360, xls/sheets.go)
per blob inside the extraction UDF: record walk over one bytes buffer,
substream partitioning at non-nested BOF...EOF boundaries, globals decode
(Date1904, Format, XF, BoundSheet8, SST gather), RC4 FilePass handling,
then a two-pass sheet scan (Dimensions/WsBool pre-pass, cell-record
scatter pass) into the shared typed grid.
"""

from __future__ import annotations

import struct
from typing import Optional

from .. import ExtractError, ExtractResult, NotInFormat, Table
from ...formats import Formatter
from ...grid import (CONTINUE_COLUMN_MERGED, CONTINUE_ROW_MERGED,
                     END_COLUMN_MERGED, END_ROW_MERGED, Sheet)
from .cfb import Document
from .hyperlinks import decode_hyperlinks
from .strings import (decode_short_unicode_string, decode_unicode_string,
                      parse_sst)

# record types handled (xls/records.go); everything else is skipped by size
REC_FORMULA = 6
REC_EOF = 10
REC_DATE1904 = 34
REC_FILEPASS = 47
REC_CONTINUE = 60
REC_CODEPAGE = 66
REC_WSBOOL = 129
REC_BOUNDSHEET8 = 133
REC_MULRK = 189
REC_XF = 224
REC_INTERFACEHDR = 225
REC_MERGECELLS = 229
REC_SST = 252
REC_LABELSST = 253
REC_RRDHEAD = 312
REC_USREXCL = 404
REC_FILELOCK = 405
REC_RRDINFO = 406
REC_HLINK = 440
REC_DIMENSIONS = 512
REC_NUMBER = 515
REC_BOOLERR = 517
REC_STRING = 519
REC_RK = 638
REC_FORMAT = 1054
REC_BOF = 2057

# records whose payload stays cleartext in encrypted streams
# (xls/xls.go:124; MS-XLS 2.2.10)
_CLEARTEXT_RECS = frozenset({REC_BOF, REC_FILEPASS, REC_USREXCL,
                             REC_FILELOCK, REC_INTERFACEHDR, REC_RRDINFO,
                             REC_RRDHEAD})

BERR_LOOKUP = {
    0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!", 0x17: "#REF!",
    0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A", 0x2B: "#GETTING_DATA",
}

_U16 = struct.Struct("<H").unpack_from
_U32 = struct.Struct("<I").unpack_from
_F64 = struct.Struct("<d").unpack_from


def rk_number(rk: int):
    """RK 30-bit packed number -> int or float (xls/structs.go:64-107)."""
    sval = rk - (1 << 32) if rk & 0x80000000 else rk
    val = sval >> 2  # arithmetic shift
    if rk & 2:  # integer payload
        if rk & 1:
            # fInt + fX100: Excel semantics are val/100 as a decimal.
            # DELIBERATE DIVERGENCE from the reference, whose
            # IsInteger() excludes bit0 so Float64()'s fall-through
            # yields 0.0 for this encoding (xls/structs.go:64-107) —
            # a reference bug that would silently zero two-decimal
            # currency cells. We return the Excel-correct value.
            return val / 100.0
        return val
    # float payload: sign-extended val << 34 as IEEE754 bits
    bits = ((val & 0xFFFFFFFFFFFFFFFF) << 34) & 0xFFFFFFFFFFFFFFFF
    f = struct.unpack("<d", struct.pack("<Q", bits))[0]
    if rk & 1:
        return f / 100.0
    return f


def _iter_records(raw: bytes):
    """(rec_type, payload) walk; truncated trailing record -> error
    (xls/xls.go:346-360)."""
    pos = 0
    n = len(raw)
    view = memoryview(raw)
    while n - pos >= 4:
        rtype, rsize = struct.unpack_from("<HH", raw, pos)
        if n - pos - 4 < rsize:
            raise ExtractError("xls: unexpected EOF in record stream")
        yield rtype, bytes(view[pos + 4: pos + 4 + rsize])
        pos += 4 + rsize


class _BoundSheet:
    __slots__ = ("position", "hidden_state", "sheet_type", "name")

    def __init__(self, position, hidden_state, sheet_type, name):
        self.position = position
        self.hidden_state = hidden_state
        self.sheet_type = sheet_type
        self.name = name


class _WorkBook:
    def __init__(self):
        self.sheets: list[_BoundSheet] = []
        self.date_mode = 0
        self.strings: list[str] = []
        self.substreams: list[list[tuple[int, bytes]]] = []
        self.pos2substream: dict[int, int] = {}
        self.fmt = Formatter()
        self.xfs: list[int] = []

    # -- stream load (xls/xls.go:175-338) -----------------------------------

    def load_from_stream(self, raw: bytes, is_decrypted: bool = False) -> None:
        substr = -1
        nested_bof = 0
        fpos = 0
        self.substreams = []
        self.pos2substream = {}

        for rtype, data in _iter_records(raw):
            if rtype == REC_EOF:
                nested_bof -= 1
            elif rtype == REC_BOF:
                if nested_bof == 0:
                    substr = len(self.substreams)
                    self.substreams.append([])
                    self.pos2substream[fpos] = substr
                nested_bof += 1
            fpos += 4 + len(data)

            if rtype == REC_FILEPASS and not is_decrypted:
                etype = _U16(data)[0]
                if etype == 1:
                    from .crypto import BasicRC4Decryptor
                    dec = BasicRC4Decryptor(data[2:])
                    return self.load_from_stream(
                        _decrypt_stream(raw, dec), is_decrypted=True)
                if etype in (2, 3, 4):
                    raise ExtractError(
                        "xls: unsupported Crypto API encryption method")
                raise ExtractError("xls: unsupported encryption method")

            self.substreams[substr].append((rtype, data))

        self._parse_globals()

    def _parse_globals(self) -> None:
        for records in self.substreams:
            i = -1
            for rtype, data in records:
                i += 1
                if len(data) == 0:
                    continue
                if rtype == REC_SST:
                    # gather following Continue records; strings may span
                    # the record gaps (B16)
                    rec_set = [data]
                    j = i + 1
                    while j < len(records) and records[j][0] == REC_CONTINUE:
                        rec_set.append(records[j][1])
                        j += 1
                    self.strings = parse_sst(rec_set)
                elif rtype == REC_BOF:
                    version = _U16(data)[0]
                    rup_year = _U16(data, 6)[0]
                    if version != 0x0600:
                        raise ExtractError("xls: invalid file version")
                    if rup_year not in (0x07CC, 0x07CD):
                        raise ExtractError("xls: unsupported biff version")
                elif rtype == REC_DATE1904:
                    self.date_mode = _U16(data)[0]
                    self.fmt.set_mode1904(self.date_mode != 0)
                elif rtype == REC_FORMAT:
                    fmt_no = _U16(data)[0]
                    code, _ = decode_unicode_string(data[2:])
                    self.fmt.add(fmt_no, code)
                elif rtype == REC_XF:
                    # font id at [0:2] ignored; numFmt id at [2:4]
                    self.xfs.append(_U16(data, 2)[0])
                elif rtype == REC_BOUNDSHEET8:
                    name, _ = decode_short_unicode_string(data[6:])
                    self.sheets.append(_BoundSheet(
                        _U32(data)[0], data[4], data[5], name))

    def _fno(self, ixfe: int) -> int:
        return self.xfs[ixfe] if ixfe < len(self.xfs) else 0

    # -- sheet scan (xls/sheets.go:47-439) -----------------------------------

    def parse_sheet(self, bs: _BoundSheet) -> Optional[Sheet]:
        ss = self.pos2substream.get(bs.position)
        if ss is None:
            raise ExtractError("xls: sheet not found")
        records = self.substreams[ss]

        res = Sheet(self.fmt)
        max_row = 0
        max_col = 0

        # pass 1: dialog check, dimensions pre-allocation, nested skip
        in_substream = 0
        for idx, (rtype, data) in enumerate(records):
            if in_substream > 0:
                if rtype == REC_EOF:
                    in_substream -= 1
                continue
            if rtype == REC_BOF:
                if idx > 0:
                    in_substream += 1
            elif rtype == REC_WSBOOL:
                if data[1] & 0x10:
                    return None  # dialog sheet
            elif rtype == REC_DIMENSIONS:
                # max = 0-based index of the row AFTER the last valid one
                max_row = _U32(data, 4)[0]
                max_col = _U16(data, 10)[0]
                res.resize(max_row, max_col)

        # pass 2: cell records
        in_substream = 0
        formula_row = 0
        formula_col = 0
        for ridx, (rtype, data) in enumerate(records):
            if in_substream > 0:
                if rtype == REC_EOF:
                    in_substream -= 1
                continue

            if rtype == REC_BOF:
                if ridx > 0:
                    in_substream += 1

            elif rtype == REC_BOOLERR:
                row = _U16(data)[0]
                col = _U16(data, 2)[0]
                ixfe = _U16(data, 4)[0]
                if data[7] == 0:
                    res.put(row, col, data[6] == 1, self._fno(ixfe))
                else:
                    res.put(row, col,
                            BERR_LOOKUP.get(data[6], "<unknown error>"), 0)

            elif rtype == REC_MULRK:
                nrk = (len(data) - 6) // 6
                row = _U16(data)[0]
                col = _U16(data, 2)[0]
                for i in range(nrk):
                    off = 4 + i * 6
                    ixfe = _U16(data, off)[0]
                    res.put(row, col + i, rk_number(_U32(data, off + 2)[0]),
                            self._fno(ixfe))

            elif rtype == REC_NUMBER:
                row = _U16(data)[0]
                col = _U16(data, 2)[0]
                ixfe = _U16(data, 4)[0]
                res.put(row, col, _F64(data, 6)[0], self._fno(ixfe))

            elif rtype == REC_RK:
                row = _U16(data)[0]
                col = _U16(data, 2)[0]
                ixfe = _U16(data, 4)[0]
                res.put(row, col, rk_number(_U32(data, 6)[0]),
                        self._fno(ixfe))

            elif rtype == REC_FORMULA:
                formula_row = _U16(data)[0]
                formula_col = _U16(data, 2)[0]
                ixfe = _U16(data, 4)[0]
                fdata = data[6:]
                fno = self._fno(ixfe)
                if fdata[6] == 0xFF and fdata[7] == 0xFF:
                    kind = fdata[0]
                    if kind == 0:
                        # cached string follows in a String record;
                        # placeholder records the numFmt now
                        res.put(formula_row, formula_col, "", fno)
                    elif kind == 1:
                        res.put(formula_row, formula_col, fdata[2] != 0, fno)
                    elif kind == 2:
                        res.put(formula_row, formula_col,
                                BERR_LOOKUP.get(fdata[2],
                                                "<unknown error>"), 0)
                    # kind 3 = blank string: nothing to place
                else:
                    res.put(formula_row, formula_col, _F64(fdata)[0], fno)

            elif rtype == REC_STRING:
                # previously-rendered formula value; may continue across
                # records with a per-fragment 8/16-bit flag
                char_count = _U16(data)[0]
                flags = data[2]
                if flags & 1:
                    fstr = data[3: 3 + 2 * char_count].decode(
                        "utf-16-le", errors="replace")
                else:
                    fstr = data[3:].decode("latin-1")
                ridx2 = ridx + 1
                while ridx2 < len(records) and \
                        records[ridx2][0] == REC_CONTINUE:
                    cdata = records[ridx2][1]
                    if cdata[0] & 1:
                        body = cdata[1:]
                        fstr += body[: (len(body) // 2) * 2].decode(
                            "utf-16-le", errors="replace")
                    else:
                        fstr += cdata[1:].decode("latin-1")
                    ridx2 += 1
                res.set_value(formula_row, formula_col, fstr)

            elif rtype == REC_LABELSST:
                row = _U16(data)[0]
                col = _U16(data, 2)[0]
                ixfe = _U16(data, 4)[0]
                sst_index = _U32(data, 6)[0]
                if sst_index >= len(self.strings):
                    raise ExtractError("xls: invalid sst index")
                if self.strings[sst_index] != "":
                    res.put(row, col, self.strings[sst_index],
                            self._fno(ixfe))

            elif rtype == REC_HLINK:
                first_row = _U16(data)[0]
                last_row = _U16(data, 2)[0]
                first_col = _U16(data, 4)[0]
                last_col = _U16(data, 6)[0]
                if first_col > max_col or first_row > max_row:
                    continue
                if last_row == 0xFFFF:
                    last_row = max_row - 1
                if last_col == 0xFF:
                    last_col = max_col - 1
                try:
                    display, link = decode_hyperlinks(data[8:])
                except (ExtractError, IndexError, struct.error):
                    continue
                self._merge_block(res, first_row, last_row, first_col,
                                  last_col,
                                  top_left=(display + " <" + link + ">"))

            elif rtype == REC_MERGECELLS:
                cmcs = _U16(data)[0]
                off = 2
                for _ in range(cmcs):
                    first_row = _U16(data, off)[0]
                    last_row = _U16(data, off + 2)[0]
                    first_col = _U16(data, off + 4)[0]
                    last_col = _U16(data, off + 6)[0]
                    off += 8
                    if last_row == 0xFFFF:
                        last_row = max_row - 1
                    if last_col == 0xFF:
                        last_col = max_col - 1
                    self._merge_block(res, first_row, last_row, first_col,
                                      last_col, top_left=None)
        return res

    @staticmethod
    def _merge_block(res: Sheet, first_row: int, last_row: int,
                     first_col: int, last_col: int,
                     top_left: Optional[str]) -> None:
        """Sentinel fill for a merge range (xls/sheets.go:353-420); the
        top-left cell keeps its value (or takes the hyperlink text)."""
        for rn in range(first_row, last_row + 1):
            for cn in range(first_col, last_col + 1):
                if rn == first_row and cn == first_col:
                    if top_left is not None:
                        res.put(rn, cn, top_left, 0)
                elif cn == first_col:
                    res.put(rn, cn, END_ROW_MERGED if rn == last_row
                            else CONTINUE_ROW_MERGED, 0)
                elif cn == last_col:
                    res.put(rn, cn, END_COLUMN_MERGED, 0)
                else:
                    res.put(rn, cn, CONTINUE_COLUMN_MERGED, 0)


def _decrypt_stream(raw: bytes, dec) -> bytes:
    """Stream records through RC4 with cleartext overlays restored
    (xls/xls.go:83-160)."""
    pos = 0
    zeros = b"\x00" * 8224
    overlays: list[tuple[int, int, int, bytes]] = []

    while len(raw) - pos > 4:
        rtype, rsize = struct.unpack_from("<HH", raw, pos)
        opos = pos
        pos += 4
        # record headers are never encrypted: feed zeros, restore after
        dec.write(zeros[:4])
        tocopy = rsize
        odata = b""
        if rtype in _CLEARTEXT_RECS:
            odata = raw[pos: pos + rsize]
            dec.write(zeros[:rsize])
            pos += rsize
            tocopy = 0
        elif rtype == REC_BOUNDSHEET8:
            # 32-bit stream position stays cleartext
            odata = raw[pos: pos + 4]
            dec.write(zeros[:4])
            pos += 4
            tocopy -= 4
        if tocopy > 0:
            dec.write(raw[pos: pos + tocopy])
            pos += tocopy
        overlays.append((opos, rtype, rsize, odata))
    dec.flush()

    alldata = bytearray(dec.bytes())
    for opos, rtype, rsize, odata in overlays:
        struct.pack_into("<HH", alldata, opos, rtype, rsize)
        if odata:
            alldata[opos + 4: opos + 4 + len(odata)] = odata
    return bytes(alldata)


def parse_workbook(name: str, data: bytes) -> ExtractResult:
    """CFB blob -> ExtractResult with one Table per sheet.

    Hidden sheets (HiddenState & 0x03 != 0) are emitted with hidden=True
    (the reference's List() excludes them — D1); dialog sheets are
    skipped (D2).
    """
    doc = Document(data)
    try:
        stream = doc.open_stream("Workbook")
    except NotInFormat:
        # pre-BIFF8 files use the "Book" stream name; reference rejects
        # them as not-in-format via the Workbook lookup
        raise NotInFormat("xls: no Workbook stream")

    wb = _WorkBook()
    wb.load_from_stream(stream)

    tables: list[Table] = []
    for bs in wb.sheets:
        hidden = (bs.hidden_state & 0x03) != 0
        ws = wb.parse_sheet(bs)
        if ws is None:
            continue  # dialog sheet
        tables.append(Table(bs.name, list(ws.iter_rows()), hidden=hidden,
                            raw_rows=list(ws.iter_raw_rows())))
    return ExtractResult("xls", tables)
