"""Unit tests for the BIFF8/.xls stack: RK numbers, SST continuation with
mid-string encoding flips, RC4 round trip, hyperlink monikers, CFB walk,
and pinned grate-actual behavior for the fixtures whose golden pairs are
disabled in the reference."""

import os
import struct

import pytest

from grate_spark.extract import extract_blob
from grate_spark.extract.xls.cfb import Document
from grate_spark.extract.xls.crypto import (RC4, BasicRC4Decryptor,
                                            generate_std97_key)
from grate_spark.extract.xls.hyperlinks import decode_hyperlinks
from grate_spark.extract.xls.strings import parse_sst
from grate_spark.extract.xls.workbook import rk_number, _decrypt_stream

REF = "/root/reference/testdata"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference testdata not available")


def ref_bytes(fn):
    with open(os.path.join(REF, fn), "rb") as f:
        return f.read()


# -- RK numbers (xls/structs.go:64-107) --------------------------------------

def _rk_from_float(f: float, div100=False) -> int:
    bits = struct.unpack("<Q", struct.pack("<d", f))[0]
    rk = (bits >> 34) << 2
    if div100:
        rk |= 1
    return rk


def _rk_from_int(i: int, div100=False) -> int:
    rk = ((i << 2) & 0xFFFFFFFF) | 2
    if div100:
        rk |= 1
    return rk


def test_rk_integer():
    assert rk_number(_rk_from_int(42)) == 42
    assert rk_number(_rk_from_int(-7)) == -7
    assert rk_number(_rk_from_int(0)) == 0


def test_rk_integer_div100_is_decimal():
    # fInt + fX100 -> Excel semantics val/100 as float. Deliberate
    # divergence from the reference, whose Float64() fall-through
    # returns 0.0 for this encoding (xls/structs.go:64-107).
    assert rk_number(_rk_from_int(250, div100=True)) == 2.5
    assert rk_number(_rk_from_int(-250, div100=True)) == -2.5
    assert rk_number(_rk_from_int(200, div100=True)) == 2.0
    assert isinstance(rk_number(_rk_from_int(200, div100=True)), float)


def test_rk_float():
    assert rk_number(_rk_from_float(1.5)) == 1.5
    assert rk_number(_rk_from_float(-2.0)) == -2.0
    assert rk_number(_rk_from_float(102.0, div100=True)) == 1.02


# -- SST continuation (xls/strings.go:137-246) --------------------------------

def _sst_header(nstrings: int) -> bytes:
    return struct.pack("<II", nstrings, nstrings)


def _xl_str(s: str, wide: bool) -> bytes:
    flags = 1 if wide else 0
    payload = s.encode("utf-16-le") if wide else s.encode("latin-1")
    return struct.pack("<HB", len(s), flags) + payload


def test_sst_simple():
    data = _sst_header(2) + _xl_str("hello", False) + _xl_str("wörld", True)
    assert parse_sst([data]) == ["hello", "wörld"]


def test_sst_boundary_straddle_8bit():
    # "abcdef" split "abc" | "def" across a Continue, staying 8-bit
    head = _sst_header(1) + struct.pack("<HB", 6, 0) + b"abc"
    cont = b"\x00" + b"def"
    assert parse_sst([head, cont]) == ["abcdef"]


def test_sst_boundary_encoding_flip_to_16bit():
    # starts 8-bit, flips to 16-bit at the record gap
    head = _sst_header(1) + struct.pack("<HB", 6, 0) + b"abc"
    cont = b"\x01" + "déf".encode("utf-16-le")
    assert parse_sst([head, cont]) == ["abcdéf"]


def test_sst_boundary_encoding_flip_to_8bit():
    head = _sst_header(1) + struct.pack("<HB", 6, 1) \
        + "abc".encode("utf-16-le")
    cont = b"\x00" + b"def"
    assert parse_sst([head, cont]) == ["abcdef"]


def test_sst_rich_runs_skipped_across_boundary():
    # rich-format runs (2 runs = 8 bytes) span into the next record
    head = _sst_header(2) + struct.pack("<HBH", 2, 0x08, 2) + b"ab" \
        + b"\x00" * 5
    cont = b"\x00" * 3 + _xl_str("cd", False)
    assert parse_sst([head, cont]) == ["ab", "cd"]


def test_sst_one_byte_16bit_remainder_errors_not_hangs():
    # a 16-bit string continuing into a record with exactly 1 usable
    # byte must fail fast ("off by one", xls/strings.go:206-208) —
    # before the fix the avail==0/take==0 loop spun forever, hanging
    # the Spark task on a corrupt blob
    from grate_spark.extract import ExtractError
    head = _sst_header(1) + struct.pack("<HB", 4, 1) + "ab".encode(
        "utf-16-le")
    cont = b"\x01" + b"B"  # 16-bit continue, single payload byte
    with pytest.raises(ExtractError, match="off by one"):
        parse_sst([head, cont])


def test_sst_truncated_stream_raises_not_hangs():
    # string claims 10 chars but the records end: IndexError/ExtractError
    # is fine, an infinite loop is not
    head = _sst_header(1) + struct.pack("<HB", 10, 0) + b"abc"
    with pytest.raises(Exception):
        parse_sst([head])


def test_sst_string_count_from_multi_fixture():
    if not os.path.isdir(REF):
        pytest.skip("reference testdata not available")
    res = extract_blob("multi_test.xls", ref_bytes("multi_test.xls"))
    flat = {c for _, (cells, _, _) in
            ((0, r) for t in res.tables for r in t.rows) for c in cells}
    assert "Three Small Words" in flat


# -- RC4 (xls/crypto) ----------------------------------------------------------

def test_rc4_known_vector():
    # RFC 6229-style smoke: RC4("Key")("Plaintext")
    c = RC4(b"Key")
    assert c.crypt(b"Plaintext").hex() == "bbf316e8d940af0ad3"


def test_std97_key_deterministic():
    k1 = generate_std97_key("VelvetSweatshop", b"\x01" * 16)
    k2 = generate_std97_key("VelvetSweatshop", b"\x01" * 16)
    assert k1 == k2 and len(k1) == 16


class _Encryptor(BasicRC4Decryptor):
    """RC4 is symmetric: the decryptor doubles as the encryptor."""


def _make_filepass_payload(salt: bytes, password="VelvetSweatshop") -> bytes:
    import hashlib
    key = generate_std97_key(password, salt)
    # block-0 cipher
    blk = hashlib.md5(key[:5] + struct.pack("<I", 0)).digest()
    verifier = b"0123456789abcdef"
    vhash = hashlib.md5(verifier).digest()
    c = RC4(blk)
    ev = c.crypt(verifier)
    eh = c.crypt(vhash)
    return struct.pack("<HH", 1, 1) + salt + ev + eh


def test_basic_rc4_verifier_roundtrip():
    payload = _make_filepass_payload(b"\x5a" * 16)
    dec = BasicRC4Decryptor(payload)
    dec.write(b"hello world, this is a test of the rc4 block layer")
    dec.flush()
    enc_once = dec.bytes()
    # applying the keystream twice restores plaintext
    dec2 = BasicRC4Decryptor(payload)
    dec2.write(enc_once)
    dec2.flush()
    assert dec2.bytes().startswith(b"hello world")


def test_basic_rc4_bad_verifier_rejected():
    payload = bytearray(_make_filepass_payload(b"\x5a" * 16))
    payload[-1] ^= 0xFF
    from grate_spark.extract import ExtractError
    with pytest.raises(ExtractError):
        BasicRC4Decryptor(bytes(payload))


def test_encrypted_stream_roundtrip():
    """Encrypt a tiny record stream with the overlay algorithm, then
    decrypt it back (xls/xls.go:83-160 both directions)."""
    payload = _make_filepass_payload(b"\x11" * 16)

    # plaintext record stream: BOF, BoundSheet8, a Number record, EOF
    bof = struct.pack("<HH", 2057, 16) + struct.pack(
        "<HHHHQ", 0x0600, 0x0005, 0, 0x07CC, 0)
    bsheet = struct.pack("<HH", 133, 12) + struct.pack("<I", 0) \
        + bytes([0, 0]) + struct.pack("<BB", 4, 0) + b"Shee"
    num = struct.pack("<HH", 515, 14) + struct.pack(
        "<HHH", 0, 0, 0) + struct.pack("<d", 3.14)
    eof = struct.pack("<HH", 10, 0)
    plain = bof + bsheet + num + eof

    # encrypt = run the same overlay pipeline (RC4 symmetric)
    enc = _decrypt_stream(plain, _Encryptor(payload))
    assert enc != plain
    # headers and BOF payload stay cleartext
    assert enc[:4] == plain[:4] and enc[4:20] == plain[4:20]
    # a bare trailing 4-byte record header (the final EOF) is dropped by
    # the `> 4` loop bound — reference parity (xls/xls.go:111)
    assert len(enc) == len(plain) - 4
    # decrypt restores everything that went through the pipeline
    dec = _decrypt_stream(enc, BasicRC4Decryptor(payload))
    assert dec == plain[:-4]


# -- hyperlinks ----------------------------------------------------------------

def _hl_string(s: str) -> bytes:
    u = s.encode("utf-16-le")
    return struct.pack("<I", len(s)) + u


def test_hyperlink_display_and_url_string():
    flags = 0x010 | 0x001 | 0x100  # display + moniker-as-string
    raw = b"\x00" * 16 + struct.pack("<II", 2, flags) \
        + _hl_string("Example") + _hl_string("https://example.com/")
    display, link = decode_hyperlinks(raw)
    assert display == "Example"
    assert link == "https://example.com/"


def test_hyperlink_url_moniker():
    url = "https://example.com/x"
    u = (url + "\x00").encode("utf-16-le")
    moniker = bytes([0xE0, 0xC9, 0xEA, 0x79, 0xF9, 0xBA, 0xCE, 0x11,
                     0x8C, 0x82, 0x00, 0xAA, 0x00, 0x4B, 0xA9, 0x0B]) \
        + struct.pack("<I", len(u)) + u
    raw = b"\x00" * 16 + struct.pack("<II", 2, 0x001) + moniker
    display, link = decode_hyperlinks(raw)
    assert link == url + ""  # trailing NUL trimmed
    assert display == ""


# -- CFB -----------------------------------------------------------------------

@needs_ref
def test_cfb_walk_lists_workbook():
    doc = Document(ref_bytes("basic.xls"))
    assert "Workbook" in doc.list_streams()
    stream = doc.open_stream("Workbook")
    # starts with a BOF record of a BIFF8 workbook
    rtype, rsize = struct.unpack_from("<HH", stream, 0)
    assert rtype == 2057
    assert struct.unpack_from("<H", stream, 4)[0] == 0x0600


@needs_ref
def test_cfb_not_in_format():
    from grate_spark.extract import NotInFormat
    with pytest.raises((NotInFormat,)):
        Document(b"PK\x03\x04" + b"\x00" * 600)


# -- pinned behavior for reference-disabled golden pairs ------------------------

@needs_ref
def test_xls_basic2_custom_formats():
    """Same th-TH builtin collision as basic2.xlsx (ids 59-61): builtin
    formats win because Formatter.Add refuses overriding 0-81."""
    res = extract_blob("basic2.xls", ref_bytes("basic2.xls"))
    got = [r[0] for r in res.tables[0].rows]
    assert got[1] == ["1", "Hello", "42", "0"]
    assert got[3] == ["3", "This", "700000000.00", "0"]


@needs_ref
def test_xls_multi_test_merges_and_bools():
    res = extract_blob("multi_test.xls", ref_bytes("multi_test.xls"))
    got = [r[0] for r in res.tables[0].rows]
    flat = ["\t".join(r) for r in got]
    assert any("↓" in s or "⤓" in s for s in flat)
    assert any("→" in s and "⇥" in s for s in flat)
    # custom yes/no bool format (numFmt 64, no builtin collision)
    assert got[14][5] == "yes" and got[15][5] == "no"
    assert got[1][5] == "TRUE" and got[3][5] == "FALSE"


@needs_ref
def test_xls_xlsx_agreement():
    """Both binary formats of the same workbook extract the same rendered
    grid (where both have fixtures)."""
    for base in ("basic", "basic2"):
        xls = extract_blob(f"{base}.xls", ref_bytes(f"{base}.xls"))
        xlsx = extract_blob(f"{base}.xlsx", ref_bytes(f"{base}.xlsx"))
        rows_a = [r[0] for r in xls.tables[0].rows]
        rows_b = [r[0] for r in xlsx.tables[0].rows]
        assert rows_a == rows_b, base
