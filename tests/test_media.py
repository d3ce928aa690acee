"""Multimodal decode kernels (pure-stdlib BMP/PNG/WAV) + the Spark
feature/resize UDFs over them."""

import struct
import zlib

import numpy as np
import pytest

from grate_spark.operators.media_codecs import (MediaDecodeError,
                                                decode_bmp, decode_png,
                                                decode_wav, encode_png,
                                                resize_nearest)


def _img(h, w, ch):
    rng = np.arange(h * w * ch, dtype=np.uint32) * 37 % 251
    return rng.astype(np.uint8).reshape(h, w, ch)


def make_bmp(img: np.ndarray) -> bytes:
    h, w, ch = img.shape
    stride = (w * ch + 3) & ~3
    bgr = img[..., [2, 1, 0] + ([3] if ch == 4 else [])]
    rows = b"".join(
        bgr[y].tobytes() + b"\x00" * (stride - w * ch)
        for y in range(h - 1, -1, -1))  # bottom-up
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, ch * 8, 0,
                       len(rows), 2835, 2835, 0, 0)
    return hdr + info + rows


def make_wav(rate: int, samples: np.ndarray) -> bytes:
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_bmp_roundtrip_24_and_32bit():
    for ch in (3, 4):
        img = _img(5, 7, ch)
        got = decode_bmp(make_bmp(img))
        assert got.shape == (5, 7, ch)
        assert np.array_equal(got, img)


def test_png_roundtrip_all_channel_counts():
    for ch in (1, 2, 3, 4):
        img = _img(6, 5, ch)
        got = decode_png(encode_png(img))
        assert got.shape == (6, 5, ch)
        assert np.array_equal(got, img)


def test_png_filtered_rows_decode():
    """Sub/Up/Average/Paeth filters (what real encoders emit)."""
    img = _img(4, 4, 3)
    stride = 4 * 3
    flat = img.reshape(4, stride).astype(np.int32)
    lines = []
    # row 0: Sub, row 1: Up, row 2: Average, row 3: Paeth
    r0 = flat[0].copy()
    r0[3:] = (flat[0][3:] - flat[0][:-3]) % 256
    lines.append(bytes([1]) + bytes(r0.astype(np.uint8)))
    lines.append(bytes([2]) + bytes(((flat[1] - flat[0]) % 256)
                                    .astype(np.uint8)))
    r2 = flat[2].copy()
    for x in range(stride):
        left = flat[2][x - 3] if x >= 3 else 0
        r2[x] = (flat[2][x] - ((int(left) + int(flat[1][x])) >> 1)) % 256
    lines.append(bytes([3]) + bytes(r2.astype(np.uint8)))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    r3 = flat[3].copy()
    for x in range(stride):
        left = int(flat[3][x - 3]) if x >= 3 else 0
        up = int(flat[2][x])
        ul = int(flat[2][x - 3]) if x >= 3 else 0
        r3[x] = (flat[3][x] - paeth(left, up, ul)) % 256
    lines.append(bytes([4]) + bytes(r3.astype(np.uint8)))

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"".join(lines)))
               + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), img)


def test_png_palette_decode():
    """color_type 3 (PLTE-indexed) — the most common real-corpus PNG
    variant: indices expand through the palette to RGB."""
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    pal = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  7, 8, 9])
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    lines = b"".join(bytes([0]) + bytes(row) for row in idx)
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3,
                                            0, 0, 0))
               + chunk(b"PLTE", pal)
               + chunk(b"IDAT", zlib.compress(lines))
               + chunk(b"IEND", b""))
    got = decode_png(payload)
    want = np.frombuffer(pal, dtype=np.uint8).reshape(4, 3)[idx]
    assert got.shape == (2, 4, 3)
    assert np.array_equal(got, want)

    # out-of-range index and missing PLTE surface as decode errors
    bad_idx = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3,
                                            0, 0, 0))
               + chunk(b"PLTE", pal)
               + chunk(b"IDAT", zlib.compress(b"\x00\x09"))
               + chunk(b"IEND", b""))
    with pytest.raises(MediaDecodeError):
        decode_png(bad_idx)
    no_plte = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
               + chunk(b"IEND", b""))
    with pytest.raises(MediaDecodeError):
        decode_png(no_plte)


def test_wav_roundtrip_stereo():
    samples = (np.arange(200, dtype=np.int16)
               .reshape(100, 2) * 17 - 300).astype(np.int16)
    rate, got = decode_wav(make_wav(8000, samples))
    assert rate == 8000
    assert np.array_equal(got, samples)


def test_resize_nearest_dims_and_identity():
    img = _img(8, 6, 3)
    assert np.array_equal(resize_nearest(img, 6, 8), img)
    small = resize_nearest(img, 3, 4)
    assert small.shape == (4, 3, 3)
    assert np.array_equal(small, img[::2][:, ::2])


def test_corrupt_payloads_raise_decode_error():
    with pytest.raises(MediaDecodeError):
        decode_bmp(b"BMxx")
    with pytest.raises(MediaDecodeError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 10)
    with pytest.raises(MediaDecodeError):
        decode_wav(b"RIFF" + b"\x00" * 40)
    # compression / unsupported depth
    bad = bytearray(make_bmp(_img(2, 2, 3)))
    struct.pack_into("<I", bad, 30, 1)  # RLE8 compression
    with pytest.raises(MediaDecodeError):
        decode_bmp(bytes(bad))


def test_codec_formats_still_stubbed():
    from grate_spark.operators.multimodal import (decode_audio,
                                                  decode_image,
                                                  sample_video_frames)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF....")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04....")
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"\x00\x00\x00 ftypisom")


def test_spark_image_audio_features_and_resize(spark):
    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from grate_spark.operators.multimodal import (extract_audio_features,
                                                  extract_image_features,
                                                  resize_images)

    imgs = [(0, make_bmp(_img(4, 6, 3))), (1, encode_png(_img(3, 3, 4))),
            (2, b"\xff\xd8\xffJPEG-ish"), (3, b"garbage")]
    schema = StructType([StructField("media_id", LongType()),
                         StructField("payload", BinaryType())])
    df = spark.createDataFrame(imgs, schema)
    feats = {r["media_id"]: r for r in
             extract_image_features(df).collect()}
    assert (feats[0]["width"], feats[0]["height"],
            feats[0]["channels"]) == (6, 4, 3)
    assert (feats[1]["width"], feats[1]["height"],
            feats[1]["channels"]) == (3, 3, 4)
    assert feats[2]["error"].startswith("NotImplementedError")
    assert feats[3]["error"].startswith("MediaDecodeError")
    assert abs(feats[0]["mean_luma"] - _img(4, 6, 3).mean()) < 1e-9

    resized = {r["media_id"]: r for r in
               resize_images(df, 2, 2).collect()}
    out = decode_png(bytes(resized[0]["payload"]))
    assert out.shape == (2, 2, 3)
    assert resized[3]["error"] is not None

    wavs = [(0, make_wav(16000, np.zeros((1600, 1), dtype=np.int16))),
            (1, b"ID3broken")]
    adf = spark.createDataFrame(wavs, schema)
    afeats = {r["media_id"]: r for r in
              extract_audio_features(adf).collect()}
    assert afeats[0]["sample_rate"] == 16000
    assert afeats[0]["n_samples"] == 1600
    assert abs(afeats[0]["duration_sec"] - 0.1) < 1e-9
    assert afeats[0]["rms"] == 0.0
    assert afeats[1]["error"].startswith("NotImplementedError")
