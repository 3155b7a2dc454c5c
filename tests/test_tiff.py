"""TIFF 6.0 container codec: roundtrips in both byte orders, the
offset-value (non-inline BitsPerSample) path, multi-page IFD chains, and
the ValueError truncation/cycle contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fonduer_ray.functions.tiff import (
    tiff_decode_page,
    tiff_encode,
    tiff_parse,
)


def test_roundtrip_gray_little_endian():
    img = np.arange(12 * 16, dtype=np.uint8).reshape(12, 16)
    data = tiff_encode([img], little_endian=True)
    meta = tiff_parse(data)
    assert meta["byte_order"] == "II"
    assert meta["n_pages"] == 1
    p = meta["pages"][0]
    assert (p["width"], p["height"], p["samples_per_pixel"]) == (16, 12, 1)
    np.testing.assert_array_equal(tiff_decode_page(meta, data, 0), img)


def test_roundtrip_rgb_big_endian_offset_bits():
    img = np.zeros((8, 10, 3), dtype=np.uint8)
    img[:, :5] = (1, 2, 3)
    img[:, 5:] = (200, 100, 50)
    data = tiff_encode([img], little_endian=False)
    meta = tiff_parse(data)
    assert meta["byte_order"] == "MM"
    p = meta["pages"][0]
    assert p["bits"] == [8, 8, 8]  # count 3 -> read through the offset path
    assert p["samples_per_pixel"] == 3
    np.testing.assert_array_equal(tiff_decode_page(meta, data, 0), img)


def test_multi_page_chain():
    pages = [
        np.full((4, 6), v, dtype=np.uint8) for v in (10, 20, 30)
    ]
    data = tiff_encode(pages, little_endian=True)
    meta = tiff_parse(data)
    assert meta["n_pages"] == 3
    for i, v in enumerate((10, 20, 30)):
        assert int(tiff_decode_page(meta, data, i).mean()) == v


def test_truncation_and_magic_errors():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = tiff_encode([img])
    with pytest.raises(ValueError):
        tiff_parse(data[:6])
    with pytest.raises(ValueError):
        tiff_parse(b"XX" + data[2:])
    # chop mid-IFD: the entry table overruns
    meta = tiff_parse(data)
    with pytest.raises(ValueError):
        tiff_parse(data[: len(data) - 10])


def test_ifd_cycle_detected():
    img = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(tiff_encode([img], little_endian=True))
    # patch the last next-IFD pointer to point back at the first IFD
    (first_ifd,) = struct.unpack("<I", data[4:8])
    (n_entries,) = struct.unpack("<H", data[first_ifd : first_ifd + 2])
    next_ptr = first_ifd + 2 + 12 * n_entries
    struct.pack_into("<I", data, next_ptr, first_ifd)
    with pytest.raises(ValueError, match="cycle"):
        tiff_parse(bytes(data))


def test_unsupported_compression_rejected():
    img = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(tiff_encode([img], little_endian=True))
    (first_ifd,) = struct.unpack("<I", data[4:8])
    (n_entries,) = struct.unpack("<H", data[first_ifd : first_ifd + 2])
    for i in range(n_entries):
        e = first_ifd + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", data, e)
        if tag == 259:  # Compression
            struct.pack_into("<H", data, e + 8, 5)  # LZW
    meta = tiff_parse(bytes(data))
    with pytest.raises(ValueError, match="compression"):
        tiff_decode_page(meta, bytes(data), 0)
