"""Property-based fuzz for the binary decoders (hypothesis).

Targets the reference's known hard spots (SURVEY §7): SST strings that
straddle record boundaries with encoding flips, RK number round trips,
and the CSV/TSV acceptance heuristics' determinism.
"""

import struct

from hypothesis import given, settings, strategies as st

from grate_spark.extract.xls.strings import parse_sst
from grate_spark.extract.xls.workbook import rk_number
from grate_spark.extract.simple import _looks_good


# -- SST: build a valid SST byte stream, split it at arbitrary points ---------

@st.composite
def sst_corpus(draw):
    strings = draw(st.lists(
        st.text(alphabet=st.characters(min_codepoint=32,
                                       max_codepoint=0x2FFF),
                min_size=0, max_size=40),
        min_size=1, max_size=8))
    return strings


def _encode_sst(strings: list[str], wide_flags: list[bool]) -> bytes:
    body = struct.pack("<II", len(strings), len(strings))
    for s, wide in zip(strings, wide_flags):
        if not wide:
            payload = s.encode("latin-1", errors="replace")
        else:
            payload = s.encode("utf-16-le")
        body += struct.pack("<HB", len(s), 1 if wide else 0) + payload
    return body


@given(sst_corpus(), st.data())
@settings(max_examples=200, deadline=None)
def test_sst_roundtrip_with_boundary_splits(strings, data):
    """Any split of the SST stream into (record, Continue...) pieces at
    string boundaries decodes to the same strings. Splits inside string
    payloads flip to a definite encoding at the gap — covered by the
    dedicated flip tests; here we fuzz structural splits."""
    wide = [any(ord(c) > 0xFF for c in s) for s in strings]
    blob = _encode_sst(strings, wide)

    # one-record baseline
    assert parse_sst([blob]) == strings

    # split at a string boundary: re-encode each half independently and
    # glue as SST + Continue (Continue carries no 8-byte header)
    k = data.draw(st.integers(min_value=0, max_value=len(strings)))
    head = struct.pack("<II", len(strings), len(strings))
    for s, w in zip(strings[:k], wide[:k]):
        payload = s.encode("utf-16-le") if w else \
            s.encode("latin-1", errors="replace")
        head += struct.pack("<HB", len(s), 1 if w else 0) + payload
    cont = b""
    for s, w in zip(strings[k:], wide[k:]):
        payload = s.encode("utf-16-le") if w else \
            s.encode("latin-1", errors="replace")
        cont += struct.pack("<HB", len(s), 1 if w else 0) + payload
    recs = [head] + ([cont] if cont else [])
    assert parse_sst(recs) == strings


@given(st.text(alphabet=st.characters(min_codepoint=32,
                                      max_codepoint=0x24F),
               min_size=1, max_size=64),
       st.integers(min_value=1, max_value=63))
@settings(max_examples=200, deadline=None)
def test_sst_mid_string_straddle(s, cut):
    """Split INSIDE a string's payload: the continuation gap carries a
    fresh encoding flag byte; decode must reassemble exactly."""
    cut = min(cut, max(len(s) - 1, 1))
    a, b = s[:cut], s[cut:]
    wide_a = any(ord(c) > 0xFF for c in a)
    wide_b = any(ord(c) > 0xFF for c in b)
    head = struct.pack("<II", 1, 1)
    head += struct.pack("<HB", len(s), 1 if wide_a else 0)
    head += a.encode("utf-16-le") if wide_a else a.encode("latin-1")
    cont = bytes([1 if wide_b else 0])
    cont += b.encode("utf-16-le") if wide_b else b.encode("latin-1")
    recs = [head] + ([cont] if b else [])
    assert parse_sst(recs) == [s]


# -- RK numbers ----------------------------------------------------------------

@given(st.integers(min_value=-(2 ** 29), max_value=2 ** 29 - 1))
@settings(max_examples=300, deadline=None)
def test_rk_int_roundtrip(i):
    rk = ((i << 2) & 0xFFFFFFFF) | 2
    assert rk_number(rk) == i


@given(st.floats(allow_nan=False, allow_infinity=False,
                 min_value=-1e15, max_value=1e15))
@settings(max_examples=300, deadline=None)
def test_rk_float_is_truncated_double(f):
    """An RK float carries only the top 30 mantissa/exponent bits; the
    decode must equal the double with its low 34 bits zeroed."""
    bits = struct.unpack("<Q", struct.pack("<d", f))[0]
    rk = ((bits >> 34) << 2) & 0xFFFFFFFC
    want = struct.unpack("<Q", struct.pack("<d", f))[0] \
        & 0xFFFFFFFC00000000
    want_f = struct.unpack("<d", struct.pack("<Q", want))[0]
    assert rk_number(rk) == want_f


# -- acceptance heuristic is pure ------------------------------------------------

@given(st.dictionaries(st.integers(min_value=0, max_value=20),
                       st.integers(min_value=1, max_value=100),
                       min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_looks_good_deterministic_and_bounded(ncols):
    total = sum(ncols.values())
    r = _looks_good(ncols, total)
    assert r in (0, 1, 2)
    assert r == _looks_good(dict(ncols), total)
    # single-column-only files can never be ambiguous-rejected
    if all(c <= 1 for c in ncols):
        assert r == 0
