"""Pure-stdlib media decoders for the multimodal path.

The container has no PIL/opencv/ffmpeg, so codec-library formats (JPEG,
MP3, H.264, ...) stay behind ``NotImplementedError`` — but the formats
that need only ``zlib``/``struct`` are decoded for real:

- **BMP**: uncompressed 24/32-bit BITMAPINFOHEADER.
- **PNG**: 8-bit greyscale / RGB / RGBA / palette-indexed (PLTE),
  non-interlaced (zlib inflate + Sub/Up/Average/Paeth unfiltering).
- **WAV**: PCM 8/16-bit RIFF.

Decoders return numpy arrays, so downstream feature UDFs stay
vectorized. Everything here is per-blob pure CPU — the Spark side calls
it inside Arrow-batched ``mapInPandas`` (operators/multimodal.py), which
is the same shape a real codec library would run in.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class MediaDecodeError(ValueError):
    """Raised for malformed or unsupported media payloads."""


# ---------------------------------------------------------------------------
# BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> uint8 array (H, W, 3|4), top-down
    row order regardless of the file's bottom-up storage."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise MediaDecodeError("bmp: bad signature")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<IiI", payload, 14)[0], \
        struct.unpack_from("<i", payload, 18)[0], \
        struct.unpack_from("<i", payload, 22)[0]
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1:
        raise MediaDecodeError("bmp: unsupported header")
    if compression != 0 or bpp not in (24, 32):
        raise MediaDecodeError(f"bmp: unsupported bpp={bpp}/"
                               f"compression={compression}")
    flip = height > 0
    height = abs(height)
    if width <= 0 or height <= 0 or width * height > 1 << 26:
        raise MediaDecodeError("bmp: bad dimensions")
    ch = bpp // 8
    stride = (width * ch + 3) & ~3
    need = data_off + stride * height
    if len(payload) < need:
        raise MediaDecodeError("bmp: truncated pixel data")
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * height, offset=data_off)
    img = raw.reshape(height, stride)[:, : width * ch] \
        .reshape(height, width, ch)
    if flip:
        img = img[::-1]
    # BGR(A) -> RGB(A)
    if ch >= 3:
        img = img[..., [2, 1, 0] + ([3] if ch == 4 else [])]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color_type -> channels per PIXEL IN THE SCANLINE (type 3 stores
# 1-byte palette indices; the palette lookup expands them to RGB)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> uint8 array (H, W, C)."""
    if payload[:8] != _PNG_SIG:
        raise MediaDecodeError("png: bad signature")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        chunk = payload[pos:pos + length]
        if len(chunk) < length:
            raise MediaDecodeError("png: truncated chunk")
        pos += length + 4  # skip CRC (content errors surface in inflate)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, ilace = \
                struct.unpack(">IIBBBBB", chunk)
            if ilace != 0:
                raise MediaDecodeError("png: interlaced not supported")
            if bit_depth != 8 or color_type not in _PNG_CHANNELS:
                raise MediaDecodeError(
                    f"png: unsupported depth={bit_depth}/"
                    f"color={color_type}")
        elif ctype == b"PLTE":
            if length % 3 or length > 256 * 3:
                raise MediaDecodeError("png: bad PLTE length")
            plte = chunk
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise MediaDecodeError("png: missing IHDR/IDAT")
    if color_type == 3 and plte is None:
        raise MediaDecodeError("png: palette image without PLTE")
    if width * height > 1 << 26:
        raise MediaDecodeError("png: bad dimensions")
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"png: inflate failed: {e}") from None
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise MediaDecodeError("png: bad decompressed size")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=y * (stride + 1) + 1).copy()
        if ft == 0:
            pass
        elif ft == 2:  # Up
            line += prev
        elif ft == 1:  # Sub (sequential within the row)
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x])
                           + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                line[x] = (int(line[x])
                           + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise MediaDecodeError(f"png: bad filter {ft}")
        out[y] = line
        prev = out[y]
    if color_type == 3:
        # indexed color: expand 1-byte indices through the RGB palette
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(height, width)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise MediaDecodeError("png: palette index out of range")
        return pal[idx]
    return out.reshape(height, width, ch)


# ---------------------------------------------------------------------------
# WAV

def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM RIFF/WAVE -> (sample_rate, samples[(n, channels)] int16)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise MediaDecodeError("wav: bad signature")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        chunk = payload[pos:pos + clen]
        pos += clen + (clen & 1)
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
    if fmt is None or data is None:
        raise MediaDecodeError("wav: missing fmt/data chunk")
    audio_fmt, n_ch, rate, _bps, _align, bits = \
        struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits not in (8, 16) or n_ch < 1:
        raise MediaDecodeError(
            f"wav: unsupported fmt={audio_fmt}/bits={bits}")
    if bits == 16:
        samples = np.frombuffer(
            data, dtype="<i2", count=len(data) // 2).astype(np.int16)
    else:  # 8-bit PCM is unsigned, centre at 0
        samples = (np.frombuffer(data, dtype=np.uint8)
                   .astype(np.int16) - 128) * 256
    n = len(samples) // n_ch
    return rate, samples[: n * n_ch].reshape(n, n_ch)


# ---------------------------------------------------------------------------
# transforms

def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize (H, W, C) -> (height, width, C)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 rows, one IDAT) for resize output
    and tests; round-trips through decode_png."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24/32-bit BMP encoder (BGR(A), bottom-up, padded rows);
    round-trips through decode_bmp."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    if ch not in (3, 4):
        raise MediaDecodeError("bmp encode: need 3 or 4 channels")
    bgr = img[..., [2, 1, 0] + ([3] if ch == 4 else [])]
    stride = (w * ch + 3) & ~3
    rows = b"".join(
        bgr[y].tobytes() + b"\x00" * (stride - w * ch)
        for y in range(h - 1, -1, -1))
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, ch * 8, 0,
                       len(rows), 2835, 2835, 0, 0)
    return hdr + info + rows
