"""MS Compound File Binary (OLE2) container walking.

Re-expresses the reference walker (xls/cfb/cfb.go:105-363) in Python over
one in-memory bytes buffer: header validation, DIFAT -> FAT, miniFAT,
directory entries, and FAT/miniFAT chain following. FAT arrays are bulk-
decoded with ``numpy.frombuffer('<u4')`` instead of per-entry reads; chain
walking joins sector slices with one ``b"".join`` (the Python analog of
the reference's zero-copy SliceReader, xls/cfb/slicereader.go:10-101).

Runs per blob inside the extraction UDF — no Spark objects here.
"""

from __future__ import annotations

import struct

import numpy as np

from .. import ExtractError, NotInFormat

SEC_FREE = 0xFFFFFFFF
SEC_END_OF_CHAIN = 0xFFFFFFFE

CFB_SIGNATURE = 0xE11AB1A1E011CFD0

_HEADER = struct.Struct(
    "<Q"      # Signature
    "16s"     # ClassID
    "HH"      # MinorVersion, MajorVersion
    "H"       # ByteOrder
    "HH"      # SectorShift, MiniSectorShift
    "6s"      # Reserved1
    "ii"      # NumDirectorySectors, NumFATSectors
    "I"       # FirstDirectorySectorLocation
    "i"       # TransactionSignature
    "i"       # MiniStreamCutoffSize
    "I"       # FirstMiniFATSectorLocation
    "i"       # NumMiniFATSectors
    "I"       # FirstDIFATSectorLocation
    "i"       # NumDIFATSectors
)

_DIRENT = struct.Struct("<64s h B B III 16s I qq i Q")

TYPE_UNKNOWN = 0x00
TYPE_STORAGE = 0x01
TYPE_STREAM = 0x02
TYPE_ROOT_STORAGE = 0x05


class _DirEntry:
    __slots__ = ("name", "object_type", "start_sector", "stream_size")

    def __init__(self, name: str, object_type: int, start_sector: int,
                 stream_size: int):
        self.name = name
        self.object_type = object_type
        self.start_sector = start_sector
        self.stream_size = stream_size


def _read_fat_sector(data: bytes, sid: int, shift: int) -> np.ndarray:
    offs = (1 + sid) << shift
    if offs >= len(data):
        raise ExtractError("xls/cfb: unable to load file")
    n = 1 << (shift - 2)
    return np.frombuffer(data, dtype="<u4", count=n, offset=offs)


class Document:
    """A parsed CFB container over one in-memory buffer."""

    def __init__(self, data: bytes):
        if len(data) < _HEADER.size:
            raise NotInFormat("cfb: too short")
        (sig, class_id, minor, major, byte_order, sector_shift,
         mini_shift, reserved1, _ndirsec, num_fat, first_dir,
         _txn, mini_cutoff, first_minifat, num_minifat,
         first_difat, num_difat) = _HEADER.unpack_from(data, 0)

        if sig != CFB_SIGNATURE:
            raise NotInFormat("cfb: bad signature")
        if byte_order != 0xFFFE:
            raise NotInFormat("cfb: bad byte order")
        if class_id != b"\x00" * 16:
            raise NotInFormat("cfb: invalid CLSID")
        if major not in (3, 4):
            raise ExtractError("cfb: unknown major version")
        if any(reserved1):
            raise ExtractError("cfb: reserved section is non-zero")
        if major == 3 and sector_shift != 9:
            raise ExtractError("cfb: invalid sector size")
        if major == 4 and sector_shift != 12:
            raise ExtractError("cfb: invalid sector size")
        if mini_shift != 6:
            raise ExtractError("cfb: invalid mini sector size")
        if mini_cutoff != 0x1000:
            raise ExtractError("cfb: invalid mini sector cutoff")

        self.data = data
        self.sector_shift = sector_shift
        self.mini_shift = mini_shift
        self.mini_cutoff = mini_cutoff
        self.major = major

        n_entries = 1 << (sector_shift - 2)

        # DIFAT: 109 inline FAT-sector ids, then chained DIFAT sectors
        # (cfb.go:165-212)
        difat = np.frombuffer(data, dtype="<u4", count=109,
                              offset=76)
        fat_parts: list[np.ndarray] = []
        for sid in difat:
            if sid == SEC_FREE:
                break
            fat_parts.append(_read_fat_sector(data, int(sid), sector_shift))
        if num_difat > 0:
            sid1 = first_difat
            while sid1 != SEC_END_OF_CHAIN:
                dsec = _read_fat_sector(data, int(sid1), sector_shift)
                for sid2 in dsec[:-1]:
                    if sid2 in (SEC_FREE, SEC_END_OF_CHAIN):
                        continue
                    fat_parts.append(
                        _read_fat_sector(data, int(sid2), sector_shift))
                sid1 = int(dsec[-1])
        self.fat = (np.concatenate(fat_parts) if fat_parts
                    else np.empty(0, dtype="<u4"))

        # miniFAT chain (cfb.go:214-234)
        minifat_parts: list[np.ndarray] = []
        sid = first_minifat
        count = 0
        while sid != SEC_END_OF_CHAIN and count < num_minifat:
            minifat_parts.append(_read_fat_sector(data, int(sid),
                                                  sector_shift))
            count += n_entries
            if count >= num_minifat:
                break
            sid = int(self.fat[sid]) if sid < len(self.fat) else \
                SEC_END_OF_CHAIN
        self.minifat = (np.concatenate(minifat_parts) if minifat_parts
                        else np.empty(0, dtype="<u4"))

        # directory entries: the reference reads exactly 4 entries from the
        # first directory sector and stops at the first Unknown entry
        # (cfb.go:242-281) — replicated for behavioral parity
        self.dir: list[_DirEntry] = []
        self.ministream_start = 0
        self.ministream_size = 0
        offs = (1 + first_dir) << sector_shift
        for j in range(4):
            if offs + _DIRENT.size > len(data):
                break
            (name_raw, name_len, otype, _color, _left, _right, _child,
             _clsid, _state, _ctime, _mtime, start_sec,
             ssize) = _DIRENT.unpack_from(data, offs)
            offs += _DIRENT.size
            if major == 3:
                ssize &= 0xFFFFFFFF
            name = ""
            if 0 < name_len <= 64 and (name_len & 1) == 0:
                name = name_raw[:name_len].decode("utf-16-le")
                name = name.rstrip("\x00")
            ent = _DirEntry(name, otype, start_sec & 0xFFFFFFFF, ssize)
            if otype == TYPE_ROOT_STORAGE:
                self.ministream_start = ent.start_sector
                self.ministream_size = ssize & 0xFFFFFFFF
            elif otype == TYPE_UNKNOWN:
                return
            self.dir.append(ent)

    # -- stream readers (cfb.go:283-363) ------------------------------------

    def _read_chain(self, sid: int, size: int) -> bytes:
        sec_size = 1 << self.sector_shift
        parts: list[bytes] = []
        remaining = size
        while sid != SEC_END_OF_CHAIN and sid != SEC_FREE:
            offs = (1 + sid) << self.sector_shift
            if offs >= len(self.data):
                # offs == len(data) would yield an empty slice that never
                # decrements `remaining`; with a FAT self-loop at that
                # sector the walk would spin forever
                raise ExtractError("cfb: corrupt data format")
            sl = self.data[offs:offs + sec_size]
            if not sl and remaining > 0:
                raise ExtractError("cfb: corrupt data format")
            if remaining < len(sl):
                sl = sl[:remaining]
                remaining = 0
            else:
                remaining -= len(sl)
            parts.append(sl)
            if remaining == 0:
                break
            if sid >= len(self.fat):
                raise ExtractError("cfb: corrupt FAT chain")
            sid = int(self.fat[sid])
        if remaining != 0:
            raise ExtractError("cfb: incomplete read")
        return b"".join(parts)

    def _read_mini_chain(self, sid: int, size: int) -> bytes:
        # materialize the mini-stream via the regular FAT first
        ministream = self._read_chain(self.ministream_start,
                                      self.ministream_size)
        mini_size = 1 << self.mini_shift
        parts: list[bytes] = []
        remaining = size
        while sid != SEC_END_OF_CHAIN and sid != SEC_FREE:
            offs = sid << self.mini_shift
            if offs >= len(ministream):
                raise ExtractError("cfb: corrupt mini-stream chain")
            sl = ministream[offs:offs + mini_size]
            if not sl and remaining > 0:
                raise ExtractError("cfb: corrupt mini-stream chain")
            if remaining < len(sl):
                sl = sl[:remaining]
                remaining = 0
            else:
                remaining -= len(sl)
            parts.append(sl)
            if remaining == 0:
                break
            if sid >= len(self.minifat):
                raise ExtractError("cfb: corrupt miniFAT chain")
            sid = int(self.minifat[sid])
        if remaining != 0:
            raise ExtractError("cfb: incomplete read")
        return b"".join(parts)

    def list_streams(self) -> list[str]:
        return [e.name for e in self.dir if e.object_type == TYPE_STREAM]

    def open_stream(self, name: str) -> bytes:
        for e in self.dir:
            if e.name == name and e.object_type == TYPE_STREAM:
                if e.stream_size < self.mini_cutoff:
                    return self._read_mini_chain(e.start_sector,
                                                 e.stream_size)
                if e.stream_size != 0:
                    return self._read_chain(e.start_sector, e.stream_size)
        raise NotInFormat(f"cfb: stream '{name}' not found")
