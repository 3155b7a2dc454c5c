"""Baseline JPEG codec tests (fonduer_ray.functions.jpeg): closed-form
golden values, encode->decode round trips across sampling/quality/restart
configurations, and the multimodal stage integration."""

import numpy as np
import pyarrow as pa
import pytest

from fonduer_ray.functions import codecs
from fonduer_ray.functions.jpeg import (
    ZIGZAG,
    _canonical_codes,
    DC_LUMA_SPEC,
    jpeg_decode,
    jpeg_encode,
    quality_tables,
)


def gradient_rgb(h, w):
    x = np.linspace(0, 255, w)[None, :]
    y = np.linspace(0, 255, h)[:, None]
    return np.stack(
        [np.tile(x, (h, 1)), np.tile(y, (1, w)), np.full((h, w), 128.0)], axis=2
    ).astype(np.uint8)


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot checks (T.81 Figure A.6)
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63


def test_canonical_codes_match_spec():
    """Annex K DC-luma table: category 0 gets the 2-bit code 00, category 1
    the 3-bit 010 (canonical assignment over [0,1,5,1,...] counts)."""
    codes = _canonical_codes(DC_LUMA_SPEC)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[2] == (0b011, 3)
    assert codes[11] == (0b111111110, 9)


def test_quality_tables_scale():
    l50, c50 = quality_tables(50)
    assert l50[0] == 16 and c50[0] == 17  # scale 100 = base tables
    l100, _ = quality_tables(100)
    assert (l100 == 1).all()  # lossless-quant limit
    l10, _ = quality_tables(10)
    assert (l10 >= l50).all()  # coarser at low quality


def test_uniform_gray_exact():
    """DC-only image: quant error < half a level at q>=90, so every uniform
    gray value decodes EXACTLY (closed form: pixel = dc/8 + 128)."""
    for c in (0, 1, 77, 128, 200, 254, 255):
        img = np.full((24, 16), c, dtype=np.uint8)
        out, mode = jpeg_decode(jpeg_encode(img, quality=90))
        assert mode == "L" and out.shape == (24, 16)
        assert (out == c).all(), f"gray {c} not exact"


def test_rgb_roundtrip_444():
    img = gradient_rgb(40, 56)
    out, mode = jpeg_decode(jpeg_encode(img, quality=95))
    assert mode == "RGB" and out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0


def test_rgb_roundtrip_420_odd_dims():
    """4:2:0 with non-multiple-of-16 dimensions: edge replication pads,
    crop restores the exact requested size."""
    img = gradient_rgb(37, 51)
    out, mode = jpeg_decode(jpeg_encode(img, quality=90, subsampling="420"))
    assert mode == "RGB" and out.shape == (37, 51, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4.0  # chroma decimation is lossy but bounded here


def test_restart_markers_bit_identical():
    """RSTn every N MCUs must not change a single pixel vs the same encode
    without restarts (DC predictors reset at each boundary)."""
    img = gradient_rgb(48, 64)
    base, _ = jpeg_decode(jpeg_encode(img, quality=90))
    for ri in (1, 3, 7):
        out, _ = jpeg_decode(jpeg_encode(img, quality=90, restart_interval=ri))
        assert np.array_equal(out, base)
    b420, _ = jpeg_decode(jpeg_encode(img, quality=90, subsampling="420"))
    o420, _ = jpeg_decode(
        jpeg_encode(img, quality=90, subsampling="420", restart_interval=2)
    )
    assert np.array_equal(o420, b420)


def test_noise_roundtrip_bounded():
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    out, _ = jpeg_decode(jpeg_encode(noise, quality=95))
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 8


def test_decode_rejects_non_baseline():
    img = np.full((8, 8), 100, dtype=np.uint8)
    data = bytearray(jpeg_encode(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite as progressive SOF2
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"not a jpeg")


def test_sniff_and_image_decode_dispatch():
    img = gradient_rgb(16, 16)
    data = jpeg_encode(img, quality=95)
    assert codecs.sniff_format(data) == "jpeg"
    out, mode = codecs.image_decode(data)
    assert mode == "RGB" and out.shape == (16, 16, 3)


def test_image_stages_decode_jpeg(ray_session):
    """The multimodal stages handle JPEG without fake=True now."""
    import ray.data as rd

    from fonduer_ray.functions import multimodal

    img = gradient_rgb(32, 32)
    data = jpeg_encode(img, quality=95)
    ds = rd.from_arrow(pa.table({"key": ["j"], "data": [data]}))
    meta = multimodal.decode_images(ds).take_all()[0]
    assert (meta["width"], meta["height"], meta["mode"]) == (32, 32, "RGB")
    assert meta["error"] is None
    resized = multimodal.resize_images(ds, 8, 8).take_all()[0]
    out, _ = codecs.png_decode(resized["data"])
    assert out.shape == (8, 8, 3) and resized["error"] is None
