"""Native PNG/BMP/WAV codecs + the real multimodal decode stages."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from fonduer_ray.functions import codecs


def gradient_rgb(h, w):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    img[:, :, 2] = 7
    return img


def test_png_roundtrip_rgb():
    img = gradient_rgb(13, 17)
    out, mode = codecs.png_decode(codecs.png_encode(img))
    assert mode == "RGB"
    assert out.shape == (13, 17, 3)
    assert np.array_equal(out, img)


def test_png_roundtrip_gray_and_rgba():
    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    out, mode = codecs.png_decode(codecs.png_encode(g))
    assert mode == "L" and np.array_equal(out[:, :, 0], g)
    rgba = np.dstack([gradient_rgb(8, 8), np.full((8, 8), 200, np.uint8)])
    out, mode = codecs.png_decode(codecs.png_encode(rgba))
    assert mode == "RGBA" and np.array_equal(out, rgba)


def test_png_all_filters():
    """Decode scanlines written with every filter type (hand-filtered)."""
    img = gradient_rgb(5, 4)
    h, w, ch = img.shape
    stride = w * ch
    rows = img.reshape(h, stride).astype(np.int64)
    enc = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y]
        if f == 0:
            raw = cur.copy()
        elif f == 1:
            raw = cur.copy()
            raw[ch:] = (cur[ch:] - cur[:-ch]) % 256
        elif f == 2:
            raw = (cur - prev) % 256
        elif f == 3:
            raw = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                raw[x] = (cur[x] - (left + prev[x]) // 2) % 256
        else:
            raw = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                raw[x] = (cur[x] - pred) % 256
        enc.append(f)
        enc.extend(raw.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(enc)))
        + chunk(b"IEND", b"")
    )
    out, _ = codecs.png_decode(data)
    assert np.array_equal(out, img)


def test_bmp_decode():
    img = gradient_rgb(6, 5)
    # hand-encode a bottom-up 24-bit BMP
    row_bytes = (5 * 3 + 3) & ~3
    px = bytearray()
    for y in range(5, -1, -1):
        row = img[y][:, ::-1].tobytes()  # RGB -> BGR
        px.extend(row + b"\x00" * (row_bytes - len(row)))
    header = b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 5, 6, 1, 24, 0, len(px), 0, 0, 0, 0)
    out, mode = codecs.bmp_decode(header + dib + px)
    assert mode == "RGB" and np.array_equal(out, img)


def test_resize_and_features():
    img = gradient_rgb(32, 32)
    small = codecs.resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)
    # nearest-neighbor: corners map to corners
    assert np.array_equal(small[0, 0], img[0, 0])
    vec = codecs.image_features(img, dim=16)
    assert vec.shape == (16,) and 0.0 <= vec.min() and vec.max() <= 1.0


def test_wav_roundtrip():
    t = np.arange(8000)
    sig = (np.sin(2 * np.pi * 440 * t / 8000) * 10000).astype(np.int16)
    data = codecs.wav_encode(sig, 8000)
    samples, rate = codecs.wav_decode(data)
    assert rate == 8000 and samples.shape == (8000, 1)
    assert np.array_equal(samples[:, 0], sig)


def test_image_decode_stage_real(ray_session):
    import ray.data as rd

    from fonduer_ray.functions import multimodal

    png = codecs.png_encode(gradient_rgb(20, 30))
    ds = rd.from_arrow(
        pa.table({"key": ["a", "bad"], "data": [png, b"not an image"]})
    )
    rows = {r["key"]: r for r in multimodal.decode_images(ds).take_all()}
    assert rows["a"]["width"] == 30 and rows["a"]["height"] == 20
    assert rows["a"]["mode"] == "RGB" and rows["a"]["error"] is None
    assert rows["bad"]["error"]  # routed, not dropped

    resized = multimodal.resize_images(
        rd.from_arrow(pa.table({"key": ["a"], "data": [png]})), 10, 10
    ).take_all()
    out, _ = codecs.png_decode(resized[0]["data"])
    assert out.shape == (10, 10, 3)

    emb = multimodal.embed_images(
        rd.from_arrow(pa.table({"key": ["a"], "data": [png]})), dim=9
    ).take_all()
    assert len(emb[0]["embedding"]) == 9


def test_resize_embed_route_bad_rows(ray_session):
    """A corrupt payload lands on the error column; good rows still process."""
    import ray.data as rd

    from fonduer_ray.functions import multimodal

    png = codecs.png_encode(gradient_rgb(8, 8))
    ds = rd.from_arrow(pa.table({"key": ["ok", "bad"], "data": [png, b"\x00junk"]}))

    rows = {r["key"]: r for r in multimodal.resize_images(ds, 4, 4).take_all()}
    assert rows["bad"]["error"] and rows["bad"]["data"] is None
    assert rows["ok"]["error"] is None
    out, _ = codecs.png_decode(rows["ok"]["data"])
    assert out.shape == (4, 4, 3)

    rows = {r["key"]: r for r in multimodal.embed_images(ds, dim=4).take_all()}
    assert rows["bad"]["error"] and rows["bad"]["embedding"] is None
    assert rows["ok"]["error"] is None and len(rows["ok"]["embedding"]) == 4


def test_audio_decode_stage(ray_session):
    import ray.data as rd

    from fonduer_ray.functions import multimodal

    sig = np.full(4000, 1000, dtype=np.int16)
    wav = codecs.wav_encode(sig, 16000)
    rows = multimodal.decode_audio(
        rd.from_arrow(pa.table({"key": ["w"], "data": [wav]}))
    ).take_all()
    r = rows[0]
    assert r["sample_rate"] == 16000
    assert r["n_frames"] == 4000
    assert r["duration_sec"] == pytest.approx(0.25)
    assert r["rms"] == pytest.approx(1000.0)


def test_sniff_format_new_families():
    import numpy as np

    from fonduer_ray.functions.codecs import sniff_format
    from fonduer_ray.functions.mp3 import mp3_encode_silent
    from fonduer_ray.functions.mp4 import mp4_encode_stub
    from fonduer_ray.functions.tiff import tiff_encode

    assert sniff_format(mp4_encode_stub(100)) == "mp4"
    assert sniff_format(
        tiff_encode([np.zeros((2, 2), dtype=np.uint8)], little_endian=True)
    ) == "tiff"
    assert sniff_format(
        tiff_encode([np.zeros((2, 2), dtype=np.uint8)], little_endian=False)
    ) == "tiff"
    # both mp3 branches: ID3v2-tagged and bare frame sync
    assert sniff_format(mp3_encode_silent(1, id3v2_junk=4)) == "mp3"
    assert sniff_format(mp3_encode_silent(1, id3v2_junk=0)) == "mp3"
    # II/MM without the 42 magic is NOT tiff
    assert sniff_format(b"II\x00\x00rest") is None
    assert sniff_format(b"garbage") is None
