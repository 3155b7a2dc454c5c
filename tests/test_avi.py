"""MJPEG-AVI container codec + real frame-sample stage tests."""

from __future__ import annotations

import struct

import numpy as np
import pytest
import ray.data as rd

from fonduer_ray.functions import multimodal
from fonduer_ray.functions.avi import (
    avi_decode_frame,
    avi_encode_mjpeg,
    avi_parse,
)
from fonduer_ray.functions.codecs import sniff_format


def _gradient_frames(n: int, h: int = 48, w: int = 64) -> list[np.ndarray]:
    out = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w]
        g = ((x * 2 + y * 3 + i * 17) % 256).astype(np.uint8)
        out.append(np.stack([g, np.roll(g, i, 0), 255 - g], axis=2))
    return out


def test_avi_roundtrip_and_index():
    frames = _gradient_frames(6)
    data = avi_encode_mjpeg(frames, fps=12, quality=90)
    assert sniff_format(data) == "avi"
    meta = avi_parse(data)
    assert (meta["width"], meta["height"]) == (64, 48)
    assert meta["fps"] == 12
    assert meta["codec"] == "MJPG"
    assert meta["n_frames"] == len(meta["frames"]) == 6
    for i in (0, 3, 5):
        img = avi_decode_frame(data, meta["frames"][i])
        assert img.shape == frames[i].shape
        assert np.abs(img.astype(int) - frames[i].astype(int)).mean() < 12


def test_avi_linear_walk_without_idx1():
    frames = _gradient_frames(4)
    data = avi_encode_mjpeg(frames, fps=10)
    with_idx = avi_parse(data)
    stripped = data[: data.rindex(b"idx1")]
    stripped = b"RIFF" + struct.pack("<I", len(stripped) - 8) + stripped[8:]
    meta = avi_parse(stripped)
    assert meta["frames"] == with_idx["frames"]


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        avi_parse(b"not a riff file at all")


def test_frame_sample_real_mjpeg(ray_session):
    frames = _gradient_frames(9, h=32, w=32)
    data = avi_encode_mjpeg(frames, fps=10, quality=90)
    ds = rd.from_items([{"key": "v1", "data": data}])
    rows = multimodal.sample_frames(ds, every_n=3, n_frames=4, fake=False).take_all()
    # frames 0, 3, 6 exist; 9 is out of range and silently not emitted
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    assert all(r["error"] is None for r in rows)
    # each sampled payload is the frame's own standalone baseline JPEG —
    # decodable by the downstream image stages directly
    from fonduer_ray.functions.jpeg import jpeg_decode

    for r in rows:
        img, _mode = jpeg_decode(r["data"])
        ref = frames[r["frame_idx"]]
        assert img.shape == ref.shape
        assert np.abs(img.astype(int) - ref.astype(int)).mean() < 12


def test_frame_sample_feeds_image_decode(ray_session):
    frames = _gradient_frames(3, h=24, w=40)
    data = avi_encode_mjpeg(frames, fps=5, quality=85)
    ds = rd.from_items([{"key": "v", "data": data}])
    sampled = multimodal.sample_frames(ds, every_n=1, n_frames=3, fake=False)
    sampled = sampled.drop_columns(["frame_idx", "error"])
    meta = multimodal.decode_images(sampled, fake=False).take_all()
    assert len(meta) == 3
    assert all(m["error"] is None for m in meta)
    assert all((m["width"], m["height"]) == (40, 24) for m in meta)
