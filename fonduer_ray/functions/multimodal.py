"""Multimodal column operators: image/audio/video as opaque binary columns.

Decode kernels are REAL for PNG, BMP, baseline JPEG (``functions/jpeg.py``,
pure-numpy Huffman+DCT), GIF (``functions/gif.py``, real variable-width
LZW incl. animation), PCM WAV audio (``functions/codecs.py``) and
MJPEG-AVI video (``functions/avi.py`` — RIFF container + per-frame JPEG),
and MP3 frame-header metadata (``functions/mp3.py`` — duration/bitrate/
sample-rate/channels from the header walk; PCM synthesis stays out).
MP4/ISO-BMFF container metadata (``functions/mp4.py`` — duration, track
codecs, dimensions, sample counts from the box walk) does the same for
inter-frame video. The frame DECODE of inter-frame codecs (H.264 etc.)
remains stubbed: those land on the
per-row ``error`` side channel (or raise at construction where the whole
stage is unusable) unless ``fake=True`` supplies the deterministic
stand-in used by the plumbing tests. In a container with the real
libraries the stand-ins swap out behind the same stage signatures.

Pattern per stage: callable class (state built once per actor),
``map_batches(Cls, batch_size=SMALL, concurrency=N)``; binary payloads
ride zero-copy in Arrow ``binary`` columns and batches stay small so
batch x concurrency fits the worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from fonduer_ray.functions import codecs
from fonduer_ray.stages.util import default_concurrency

#: large binary payloads -> small batches so batch x concurrency fits heap
MEDIA_BATCH_SIZE = 16

IMAGE_META_SCHEMA = pa.schema(
    [
        ("key", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("mode", pa.string()),
        ("content_hash", pa.string()),
        ("error", pa.string()),
    ]
)

AUDIO_META_SCHEMA = pa.schema(
    [
        ("key", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_channels", pa.int32()),
        ("n_frames", pa.int64()),
        ("duration_sec", pa.float64()),
        ("rms", pa.float64()),
        ("error", pa.string()),
    ]
)


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


class ImageDecode:
    """binary -> (key, width, height, mode, content_hash, error).

    Real decode for PNG/BMP/JPEG/GIF; unsupported formats land on the
    ``error`` side-channel column (never a silent drop). ``fake=True``
    keeps the deterministic stand-in for plumbing tests."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for key, payload in zip(batch["key"].to_pylist(), batch["data"].to_pylist()):
            payload = payload or b""
            row = {
                "key": key,
                "width": 0,
                "height": 0,
                "mode": "",
                "content_hash": hashlib.md5(payload).hexdigest(),
                "error": None,
            }
            if self.fake:
                row["width"], row["height"] = _fake_dims(payload)
                row["mode"] = "RGB"
            else:
                try:
                    img, mode = codecs.image_decode(payload)
                    row["height"], row["width"] = img.shape[:2]
                    row["mode"] = mode
                except Exception as exc:  # noqa: BLE001 - routed, not dropped
                    row["error"] = str(exc)
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=IMAGE_META_SCHEMA)


class ImageResize:
    """binary -> binary: nearest-neighbor resize, re-encoded as PNG.
    ``fake=True`` hashes (payload, size) instead (plumbing stand-in)."""

    def __init__(self, width: int, height: int, fake: bool = False):
        self.width = width
        self.height = height
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, errs = [], []
        for payload in batch["data"].to_pylist():
            payload = payload or b""
            if self.fake:
                out.append(
                    hashlib.md5(payload + f"{self.width}x{self.height}".encode()).digest()
                )
                errs.append(None)
                continue
            try:
                img, _mode = codecs.image_decode(payload)
                out.append(
                    codecs.png_encode(codecs.resize_nearest(img, self.width, self.height))
                )
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 - routed, not dropped
                out.append(None)
                errs.append(str(exc))
        return pa.table(
            {
                "key": batch["key"],
                "data": pa.array(out, pa.binary()),
                "width": pa.array([self.width] * len(out), pa.int32()),
                "height": pa.array([self.height] * len(out), pa.int32()),
                "error": pa.array(errs, pa.string()),
            }
        )


class ImageEmbed:
    """binary -> list<float32>: average-pooled luminance features
    (``codecs.image_features``) — a real, deterministic classical feature
    vector; a model-based embedder (loaded once per actor here in
    ``__init__``) drops in behind the same signature. ``fake=True`` derives
    the vector from the payload hash instead."""

    def __init__(self, dim: int = 16, fake: bool = False):
        self.dim = dim
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs, errs = [], []
        for payload in batch["data"].to_pylist():
            payload = payload or b""
            if self.fake:
                seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
                rng = np.random.RandomState(seed)
                vecs.append(rng.randn(self.dim).astype(np.float32).tolist())
                errs.append(None)
                continue
            try:
                img, _mode = codecs.image_decode(payload)
                vecs.append(codecs.image_features(img, self.dim).tolist())
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 - routed, not dropped
                vecs.append(None)
                errs.append(str(exc))
        return pa.table(
            {
                "key": batch["key"],
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "error": pa.array(errs, pa.string()),
            }
        )


class AudioDecode:
    """binary -> (key, sample_rate, n_channels, n_frames, duration_sec,
    rms, error): real PCM WAV decode via the stdlib wave module, and a
    REAL MPEG-audio (MP3) frame-header walk (``functions/mp3.py``) for
    metadata — sample rate, channels, sample count, duration. MP3 PCM
    synthesis (Huffman + IMDCT) stays out of scope, so ``rms`` is 0.0
    for MP3 rows; everything else is exact from the headers."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fonduer_ray.functions.mp3 import mp3_parse, sniff_mp3

        rows = []
        for key, payload in zip(batch["key"].to_pylist(), batch["data"].to_pylist()):
            payload = payload or b""
            row = {
                "key": key,
                "sample_rate": 0,
                "n_channels": 0,
                "n_frames": 0,
                "duration_sec": 0.0,
                "rms": 0.0,
                "error": None,
            }
            try:
                if sniff_mp3(payload):
                    meta = mp3_parse(payload)
                    row["sample_rate"] = meta["sample_rate"]
                    row["n_channels"] = meta["n_channels"]
                    row["n_frames"] = meta["n_samples"]
                    row["duration_sec"] = meta["duration_sec"]
                else:
                    samples, rate = codecs.wav_decode(payload)
                    row["sample_rate"] = rate
                    row["n_channels"] = samples.shape[1]
                    row["n_frames"] = samples.shape[0]
                    row["duration_sec"] = samples.shape[0] / rate if rate else 0.0
                    row["rms"] = float(
                        np.sqrt(np.mean(samples.astype(np.float64) ** 2))
                    )
            except Exception as exc:  # noqa: BLE001
                row["error"] = str(exc)
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=AUDIO_META_SCHEMA)


class FrameSample:
    """video binary -> one row per sampled frame
    (key, frame_idx, data, error).

    REAL for MJPEG AVI (``functions/avi.py``): the RIFF 'idx1' index gives
    O(1) chunk spans, so sampling slices ONLY the chosen frames' JPEG
    payloads out of the container — no full decode, no copy of unsampled
    frames. ``data`` holds the frame's own baseline-JPEG bytes; pixel
    decode is the downstream image stages' job (``decode_images`` /
    ``resize_images`` accept the sampled rows directly). Other codecs
    (H.264 etc. need entropy decoders this environment lacks) land on the
    ``error`` side channel. ``fake=True`` keeps the deterministic
    stand-in used by the plumbing tests."""

    def __init__(self, every_n: int = 10, n_frames: int = 4, fake: bool = False):
        self.every_n = every_n
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, idxs, frames, errs = [], [], [], []
        for key, payload in zip(batch["key"].to_pylist(), batch["data"].to_pylist()):
            payload = payload or b""
            if self.fake:
                for i in range(self.n_frames):
                    keys.append(key)
                    idxs.append(i * self.every_n)
                    frames.append(hashlib.md5(payload + bytes([i])).digest())
                    errs.append(None)
                continue
            try:
                from fonduer_ray.functions.avi import avi_parse

                meta = avi_parse(payload)
                if meta["codec"] not in ("MJPG", "mjpg"):
                    raise NotImplementedError(
                        f"video codec {meta['codec']!r} needs an entropy "
                        "decoder this container lacks (MJPG supported)"
                    )
                spans = meta["frames"]
                for i in range(self.n_frames):
                    fi = i * self.every_n
                    if fi >= len(spans):
                        break
                    off, size = spans[fi]
                    keys.append(key)
                    idxs.append(fi)
                    frames.append(payload[off : off + size])
                    errs.append(None)
            except Exception as exc:  # noqa: BLE001 - routed, not dropped
                keys.append(key)
                idxs.append(-1)
                frames.append(None)
                errs.append(str(exc))
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "data": pa.array(frames, pa.binary()),
                "error": pa.array(errs, pa.string()),
            }
        )


def decode_images(ds: "ray.data.Dataset", fake: bool = False) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=default_concurrency(),
    )


def resize_images(
    ds: "ray.data.Dataset", width: int, height: int, fake: bool = False
) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"width": width, "height": height, "fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=default_concurrency(),
    )


def embed_images(ds: "ray.data.Dataset", dim: int = 16, fake: bool = False):
    return ds.map_batches(
        ImageEmbed,
        fn_constructor_kwargs={"dim": dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=default_concurrency(),
    )


def decode_audio(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(
        AudioDecode,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=default_concurrency(),
    )


def sample_frames(ds: "ray.data.Dataset", every_n: int = 10, n_frames: int = 4,
                  fake: bool = False):
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"every_n": every_n, "n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=default_concurrency(),
    )
