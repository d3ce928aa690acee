"""OLE HLink record payload decoding (display text + URL).

Follows the reference structure walk (xls/hyperlinks.go:11-146): flags ->
optional display string, frame skip, URL moniker (GUID-matched) or file
moniker (ANSI + optional Unicode path), then an optional location string
that overrides the link text; null/space trimming matches exactly.
"""

from __future__ import annotations

from .. import ExtractError

HLSTMF_HAS_MONIKER = 0x001
HLSTMF_HAS_LOCATION_STR = 0x008
HLSTMF_HAS_DISPLAY_NAME = 0x010
HLSTMF_HAS_FRAME_NAME = 0x080
HLSTMF_MONIKER_SAVED_AS_STR = 0x100

_URL_MONIKER_CLSID = bytes([0xE0, 0xC9, 0xEA, 0x79, 0xF9, 0xBA, 0xCE, 0x11,
                            0x8C, 0x82, 0x00, 0xAA, 0x00, 0x4B, 0xA9, 0x0B])
_FILE_MONIKER_CLSID = bytes([0x03, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
                             0xC0, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x46])

_TRIM = " \v\f\t\r\n\x00"


def _u32(raw: bytes, off: int = 0) -> int:
    return int.from_bytes(raw[off:off + 4], "little")


def _read_hyperlink_string(raw: bytes) -> tuple[str, bytes]:
    """length-prefixed UTF-16 string; returns (text, rest)."""
    n = _u32(raw)
    body = raw[4: 4 + 2 * n]
    return body.decode("utf-16-le", errors="replace"), raw[4 + 2 * n:]


def decode_hyperlinks(raw: bytes) -> tuple[str, str]:
    """HLink payload (after the 8-byte ref8) -> (display, link)."""
    raw = raw[16:]  # skip classid
    if _u32(raw) != 2:
        raise ExtractError("xls: unknown hyperlink version")
    flags = _u32(raw, 4)
    raw = raw[8:]

    display_text = ""
    link_text = ""

    if flags & HLSTMF_HAS_DISPLAY_NAME:
        display_text, raw = _read_hyperlink_string(raw)
    if flags & HLSTMF_HAS_FRAME_NAME:
        n = _u32(raw)
        raw = raw[4 + 2 * n:]
    if flags & HLSTMF_HAS_MONIKER:
        if flags & HLSTMF_MONIKER_SAVED_AS_STR:
            link_text, raw = _read_hyperlink_string(raw)
        else:
            link_text, consumed = parse_hyperlink_moniker(raw)
            raw = raw[consumed:]
    if flags & HLSTMF_HAS_LOCATION_STR:
        link_text, raw = _read_hyperlink_string(raw)

    return display_text.strip(_TRIM), link_text.strip(_TRIM)


def parse_hyperlink_moniker(raw: bytes) -> tuple[str, int]:
    """URL or file moniker -> (text, bytes consumed)
    (xls/hyperlinks.go:76-132)."""
    classid = raw[:16]
    no = 16

    if classid == _URL_MONIKER_CLSID:
        length = _u32(raw, no) // 2
        no += 4
        buf = raw[no: no + 2 * length]
        no += 2 * length
        chars = buf.decode("utf-16-le", errors="replace")
        # strip the 12-unit serialGUID/version/flags tail when present
        if length > 12 and buf[2 * (length - 13): 2 * (length - 12)] \
                == b"\x00\x00":
            chars = chars[: length - 12]
        return chars, no

    if classid == _FILE_MONIKER_CLSID:
        length = _u32(raw, no + 2)  # ansiLength (after cAnti)
        no += 6
        ansi = raw[no: no + length]
        no += length + 24  # misc fixed properties
        ulen = _u32(raw, no)  # cbUnicodePathSize
        no += 4
        if ulen > 0:
            no += 6
            ulen -= 6
            buf = raw[no: no + (ulen // 2) * 2]
            no += (ulen // 2) * 2
            return buf.decode("utf-16-le", errors="replace"), no
        return ansi.decode("latin-1"), no

    raise ExtractError("xls: unknown moniker classid")
