"""End-to-end synthetic .xls: a minimal CFB+BIFF8 writer (test-only)
exercises decode paths the reference fixtures don't cover — hyperlink
records, BoolErr error codes, formula cached-string continuation,
hidden/dialog sheets, SST continuation, and full-file RC4 encryption."""

import struct

import pytest

from grate_spark.extract import extract_blob
from grate_spark.extract.xls import workbook as wb

SEC = 512
FREE = 0xFFFFFFFF
ENDCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


# -- minimal CFB writer (single regular stream named Workbook) ---------------

def make_cfb(stream: bytes) -> bytes:
    if len(stream) < 4096:
        stream = stream + b"\x00" * (4096 - len(stream))  # no ministream
    if len(stream) % SEC:
        stream = stream + b"\x00" * (SEC - len(stream) % SEC)
    n = len(stream) // SEC
    assert n <= 125, "single-FAT-sector writer"

    fat = [FATSECT]                      # sector 0: the FAT itself
    fat += [i + 1 for i in range(1, n)] + [ENDCHAIN]  # stream chain 1..n
    fat += [ENDCHAIN]                    # dir sector n+1
    fat += [FREE] * (128 - len(fat))
    fat_sector = struct.pack("<128I", *fat)

    def dirent(name, otype, start, size):
        raw_name = name.encode("utf-16-le") + b"\x00\x00"
        e = raw_name + b"\x00" * (64 - len(raw_name))
        e += struct.pack("<h", len(raw_name))
        e += bytes([otype, 1])
        e += struct.pack("<III", FREE, FREE, FREE)
        e += b"\x00" * 16 + struct.pack("<I", 0) + b"\x00" * 16
        e += struct.pack("<iQ", start, size)
        assert len(e) == 128
        return e

    # start sector -2 (ENDOFCHAIN) marks the empty root ministream
    root = dirent("Root Entry", 5, -2, 0)
    book = dirent("Workbook", 2, 1, len(stream))
    unused = b"\x00" * 128
    dir_sector = root + book + unused + unused

    from grate_spark.extract.xls.cfb import _HEADER
    header = _HEADER.pack(
        0xE11AB1A1E011CFD0, b"\x00" * 16,
        0x3E, 3, 0xFFFE, 9, 6, b"\x00" * 6,
        0, 1,              # numdirsectors, numfatsectors
        n + 1,             # first directory sector
        0, 0x1000,
        ENDCHAIN, 0,       # first miniFAT sector, count
        ENDCHAIN, 0)       # first DIFAT sector, count
    difat = struct.pack("<I", 0) + struct.pack("<I", FREE) * 108
    header = header + difat
    assert len(header) == 512, len(header)
    return header + fat_sector + stream + dir_sector


# -- BIFF8 record builders -----------------------------------------------------

def rec(rtype: int, data: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(data)) + data


def bof(doctype: int) -> bytes:
    return rec(2057, struct.pack("<HHHHQ", 0x0600, doctype, 0, 0x07CC, 0))


def short_str(s: str) -> bytes:
    return struct.pack("<BB", len(s), 0) + s.encode("latin-1")


def boundsheet(pos: int, hidden: int, name: str) -> bytes:
    return rec(133, struct.pack("<IBB", pos, hidden, 0) + short_str(name))


def sst(strings, split_at=None):
    """SST payload; optionally returns (sst_rec, continue_rec) with the
    LAST string split mid-payload (with a re-encoding flag byte)."""
    body = struct.pack("<II", len(strings), len(strings))
    for i, s in enumerate(strings[:-1] if split_at is not None
                          else strings):
        body += struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    if split_at is None:
        return rec(252, body)
    last = strings[-1]
    body += struct.pack("<HB", len(last), 0) \
        + last[:split_at].encode("latin-1")
    cont = b"\x00" + last[split_at:].encode("latin-1")
    return rec(252, body) + rec(60, cont)


def xf(fmt_no: int) -> bytes:
    return rec(224, struct.pack("<HH", 0, fmt_no) + b"\x00" * 12)


def dimensions(nrows: int, ncols: int) -> bytes:
    return rec(512, struct.pack("<IIHHH", 0, nrows, 0, ncols, 0))


def number(row, col, ixfe, val) -> bytes:
    return rec(515, struct.pack("<HHH", row, col, ixfe)
               + struct.pack("<d", val))


def rk_rec(row, col, ixfe, rkval) -> bytes:
    return rec(638, struct.pack("<HHHI", row, col, ixfe, rkval))


def mulrk(row, first_col, entries) -> bytes:
    body = struct.pack("<HH", row, first_col)
    for ixfe, rkval in entries:
        body += struct.pack("<HI", ixfe, rkval)
    body += struct.pack("<H", first_col + len(entries) - 1)
    return rec(189, body)


def boolerr(row, col, ixfe, value, is_err) -> bytes:
    return rec(517, struct.pack("<HHHBB", row, col, ixfe, value,
                                1 if is_err else 0))


def label_sst(row, col, ixfe, idx) -> bytes:
    return rec(253, struct.pack("<HHHI", row, col, ixfe, idx))


def formula_with_string(row, col, ixfe, cached: str, split=None):
    fdata = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF]) + b"\x00" * 6
    out = rec(6, struct.pack("<HHH", row, col, ixfe) + fdata)
    if split is None:
        out += rec(519, struct.pack("<HB", len(cached), 0)
                   + cached.encode("latin-1"))
    else:
        out += rec(519, struct.pack("<HB", len(cached), 0)
                   + cached[:split].encode("latin-1"))
        out += rec(60, b"\x00" + cached[split:].encode("latin-1"))
    return out


def merge_cells(ranges) -> bytes:
    body = struct.pack("<H", len(ranges))
    for (r1, r2, c1, c2) in ranges:
        body += struct.pack("<HHHH", r1, r2, c1, c2)
    return rec(229, body)


def hlink(row, col, url: str, display: str) -> bytes:
    flags = 0x010 | 0x001 | 0x100  # display + moniker-as-string
    def hstr(s):
        return struct.pack("<I", len(s)) + s.encode("utf-16-le")
    body = struct.pack("<HHHH", row, row, col, col)
    body += b"\x00" * 16 + struct.pack("<II", 2, flags)
    body += hstr(display) + hstr(url)
    return rec(440, body)


def rk_from_int(i: int) -> int:
    return ((i << 2) & 0xFFFFFFFF) | 2


def build_workbook(encrypt: bool = False, date1904: bool = False) -> bytes:
    """``date1904=True`` flips the epoch flag, adds a 17th XF with the
    built-in date format 14, and a serial-number cell at row 6 — the
    rendered date must use the 1904 epoch."""
    epoch = b"\x01\x00" if date1904 else b"\x00\x00"
    extra_xf = xf(14) if date1904 else b""
    extra_cell = number(6, 0, 16, 100.5) if date1904 else b""
    sheet1 = (
        bof(0x0010)
        + rec(129, b"\x00\x00")  # WsBool, not a dialog
        + dimensions(7 if date1904 else 6, 4)
        + rk_rec(0, 0, 0, rk_from_int(7))
        + mulrk(0, 1, [(0, rk_from_int(10)), (0, rk_from_int(20))])
        + number(1, 0, 0, 2.5)
        + boolerr(1, 1, 0, 1, False)       # TRUE
        + boolerr(1, 2, 0, 0x07, True)     # #DIV/0!
        + label_sst(2, 0, 0, 0)
        + label_sst(2, 1, 0, 1)
        + formula_with_string(3, 0, 0, "cached-value", split=6)
        + merge_cells([(4, 5, 0, 1)])
        + hlink(3, 2, "https://example.com/x", "Example")
        + extra_cell
        + rec(10, b""))
    hidden_sheet = (bof(0x0010) + dimensions(1, 1)
                    + rk_rec(0, 0, 0, rk_from_int(99)) + rec(10, b""))
    dialog_sheet = (bof(0x0010) + rec(129, b"\x00\x10") + rec(10, b""))

    globals_base = (
        rec(34, epoch)
        + sst(["alpha", "continuation!"], split_at=4)
        + xf(0) * 16 + extra_xf
        + boundsheet(0, 0, "Visible")
        + boundsheet(0, 1, "Hidden")
        + boundsheet(0, 0, "Dialog"))

    # positions: globals length depends on the (fixed-size) BoundSheet
    # records, so compute with placeholders then patch
    g = bof(0x0005) + globals_base + rec(10, b"")
    pos1 = len(g)
    pos2 = pos1 + len(sheet1)
    pos3 = pos2 + len(hidden_sheet)
    globals_fixed = (
        rec(34, epoch)
        + sst(["alpha", "continuation!"], split_at=4)
        + xf(0) * 16 + extra_xf
        + boundsheet(pos1, 0, "Visible")
        + boundsheet(pos2, 1, "Hidden")
        + boundsheet(pos3, 0, "Dialog"))
    g2 = bof(0x0005) + globals_fixed + rec(10, b"")
    assert len(g2) == len(g)
    stream = g2 + sheet1 + hidden_sheet + dialog_sheet

    if encrypt:
        from tests.test_xls import _make_filepass_payload, _Encryptor
        payload = _make_filepass_payload(b"\x42" * 16)
        # FilePass goes right after the first BOF; BoundSheet stream
        # positions shift by its length
        filepass = rec(47, struct.pack("<H", 1) + payload)
        shift = len(filepass)
        globals_enc = (
            rec(34, epoch)
            + sst(["alpha", "continuation!"], split_at=4)
            + xf(0) * 16 + extra_xf
            + boundsheet(pos1 + shift, 0, "Visible")
            + boundsheet(pos2 + shift, 1, "Hidden")
            + boundsheet(pos3 + shift, 0, "Dialog"))
        plain2 = bof(0x0005) + filepass + globals_enc + rec(10, b"") \
            + sheet1 + hidden_sheet + dialog_sheet
        # encrypt with the overlay pipeline (FilePass itself cleartext);
        # append a pad record so the trailing EOF isn't dropped by the
        # `> 4` loop bound
        plain2 += rec(0x00FF, b"\x00" * 4)
        return make_cfb(wb._decrypt_stream(plain2, _Encryptor(payload)))
    return make_cfb(stream)


EXPECTED_FIRST_ROWS = [
    ["7", "10", "20", ""],
    ["2.5", "TRUE", "#DIV/0!", ""],
    ["alpha", "continuation!", "", ""],
    ["cached-value", "", "Example <https://example.com/x>", ""],
    # merge block rows 4-5 x cols 0-1: top-left keeps its (blank)
    # value; col==lastCol gets ⇥; (5,0) is firstCol+lastRow -> ⤓
    ["", "⇥", "", ""],
    ["⤓", "⇥", "", ""],
]


def test_cfb_fat_self_loop_at_eof_errors_not_hangs():
    """A FAT chain pointing at the sector whose offset == len(data),
    with a self-loop there, must raise (cfb.go bounds semantics) — the
    old `offs > len` check admitted the empty slice and the walk never
    progressed."""
    import pytest
    from grate_spark.extract import ExtractError
    from grate_spark.extract.xls.cfb import Document

    blob = bytearray(make_cfb(b"x" * 4096))
    n = (len(blob) - 512 * 2) // SEC - 1  # content sectors (minus dir)
    # FAT lives in sector 0 at byte offset 512; entry i at 512 + 4*i.
    # Point the last stream sector's next -> first out-of-range sid,
    # and make that sid a self-loop.
    oob = len(blob) // SEC - 1  # sid with offs == len(data)
    struct.pack_into("<I", blob, 512 + 4 * n, oob)
    struct.pack_into("<I", blob, 512 + 4 * oob, oob)
    doc = Document(bytes(blob))
    # ask for more bytes than the truncated chain can deliver
    with pytest.raises(ExtractError):
        doc._read_chain(1, 4096 + SEC)


def test_synthetic_cfb_roundtrip():
    blob = build_workbook()
    res = extract_blob("synth.xls", blob)
    assert res.fmt == "xls"
    names = [(t.name, t.hidden) for t in res.tables]
    # dialog sheet skipped entirely; hidden sheet carried with flag
    assert names == [("Visible", False), ("Hidden", True)]
    got = [r[0] for r in res.tables[0].rows]
    assert got[:6] == EXPECTED_FIRST_ROWS


def test_synthetic_merge_sentinels_and_types():
    res = extract_blob("synth.xls", build_workbook())
    rows = res.tables[0].rows
    types = [r[1] for r in rows]
    assert types[0][:3] == ["integer", "integer", "integer"]
    assert types[1][:3] == ["float", "boolean", "string"]
    # the xls HLink path renders "display <url>" as a plain string cell
    # (xls/sheets.go:357 Puts a string; no SetURL)
    assert types[3][2] == "string"


def test_list_listhidden_get_surface():
    """Source-level List/ListHidden/Get (xls/sheets.go:14-44): visible
    and hidden names split; Get reaches a hidden sheet by name."""
    res = extract_blob("synth.xls", build_workbook())
    assert res.list() == ["Visible"]
    assert res.list_hidden() == ["Hidden"]
    assert res.get("Hidden").rows[0][0] == ["99"]
    with pytest.raises(KeyError):
        res.get("NoSuchSheet")


def test_synthetic_encrypted_roundtrip():
    """Full-file standard RC4: encrypted workbook extracts to the same
    rows as the cleartext one (B17 end-to-end)."""
    enc = build_workbook(encrypt=True)
    res = extract_blob("synth-enc.xls", enc)
    got = [r[0] for r in res.tables[0].rows]
    assert got[:6] == EXPECTED_FIRST_ROWS
