"""BIFF8 Unicode string decoding + SST shared-string table.

Semantics follow the reference decoders (xls/strings.go): the three
XLUnicodeString variants with 8-bit-compressed vs full UTF-16LE payloads,
and the SST parser whose strings may span Continue-record boundaries where
a one-byte flag can flip the encoding 8<->16-bit mid-string
(xls/strings.go:190-198) — the classic corruption source, ported exactly.

Bulk decodes use ``bytes.decode('utf-16-le')`` / ``.decode('latin-1')``
for whole runs; the per-character loop survives only at record-gap
straddles where the encoding can change.
"""

from __future__ import annotations

from .. import ExtractError


def decode_short_unicode_string(raw: bytes) -> tuple[str, int]:
    """ShortXLUnicodeString (2.5.240): 8-bit length + flags + payload.

    Returns (string, bytes consumed)."""
    cch = raw[0]
    flags = raw[1]
    body = raw[2:]
    if (flags & 0x1) == 0:
        return body[:cch].decode("latin-1"), cch + 2
    return body[: 2 * cch].decode("utf-16-le"), 2 * cch + 2


def decode_unicode_string(raw: bytes) -> tuple[str, int]:
    """XLUnicodeString (2.5.294): 16-bit length + flags + payload."""
    cch = int.from_bytes(raw[:2], "little")
    flags = raw[2]
    body = raw[3:]
    if (flags & 0x1) == 0:
        return body[:cch].decode("latin-1"), cch + 3
    return body[: 2 * cch].decode("utf-16-le"), 2 * cch + 3


def parse_sst(rec_datas: list[bytes]) -> list[str]:
    """Decode the SST from the SST record plus its Continue records.

    ``rec_datas`` is the payload list (SST first). Mirrors
    xls/strings.go:137-246 including the mid-string encoding flips,
    rich-run (4 bytes each) and phonetic-block skipping across record
    boundaries.
    """
    first = rec_datas[0]
    # total refs at [0:4] unused; string count at [4:8]
    buf = first[8:]
    all_strings: list[str] = []

    i = 0
    while i < len(rec_datas):
        while len(buf) > 0:
            c_run_bytes = 0
            cb_ext_rs = 0
            slen = int.from_bytes(buf[:2], "little")
            flags = buf[2]
            buf = buf[3:]

            if flags & 0x8:
                c_run = int.from_bytes(buf[:2], "little")
                c_run_bytes = c_run * 4
                buf = buf[2:]
            if flags & 0x4:
                cb_ext_rs = int.from_bytes(buf[:4], "little")
                buf = buf[4:]

            # read slen characters, transparently continuing across
            # records; the gap flag byte may flip the encoding
            parts: list[str] = []
            remaining = slen
            while remaining > 0:
                if len(buf) == 0:
                    i += 1
                    nxt = rec_datas[i]
                    flags = (flags & 0xFE) | (nxt[0] & 1)
                    buf = nxt[1:]
                if flags & 1:  # 16-bit
                    avail = len(buf) // 2
                    take = min(avail, remaining)
                    parts.append(buf[: 2 * take].decode(
                        "utf-16-le", errors="replace"))
                    buf = buf[2 * take:]
                    remaining -= take
                    if len(buf) == 1:
                        # reference errors whenever a 16-bit read leaves
                        # exactly one byte behind (xls/strings.go:206-208);
                        # must fire even when take == 0 (a 1-byte record
                        # remainder), else this loop never progresses and
                        # a corrupt SST hangs the Spark task forever
                        raise ExtractError("xls: off by one")
                else:  # 8-bit compressed
                    take = min(len(buf), remaining)
                    parts.append(buf[:take].decode("latin-1"))
                    buf = buf[take:]
                    remaining -= take
            all_strings.append("".join(parts))

            # skip rich-format runs and phonetic blocks, which may also
            # span records (no flag byte at those gaps)
            while c_run_bytes > 0:
                if len(buf) >= c_run_bytes:
                    buf = buf[c_run_bytes:]
                    c_run_bytes = 0
                else:
                    c_run_bytes -= len(buf)
                    i += 1
                    buf = rec_datas[i]
            while cb_ext_rs > 0:
                if len(buf) >= cb_ext_rs:
                    buf = buf[cb_ext_rs:]
                    cb_ext_rs = 0
                else:
                    cb_ext_rs -= len(buf)
                    i += 1
                    buf = rec_datas[i]
        i += 1
        if i < len(rec_datas):
            buf = rec_datas[i]

    return all_strings
