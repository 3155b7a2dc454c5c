"""Multimodal column operators: image/audio/video as opaque binary columns.

The decode libraries (PIL/ffmpeg/torchaudio) are not in this container, so
the *decode kernels* are stubs — a deterministic fake decoder behind
``fake=True`` (for tests) and ``NotImplementedError`` otherwise — but all
the Ray-side plumbing is real and tested: schemas, actor-pool signatures,
small-batch sizing for large payloads, and typed metadata output layout.

Pattern per stage: callable class (state = decoder handle, built once per
actor), ``map_batches(Cls, batch_size=SMALL, concurrency=N)``; binary
payloads ride zero-copy in Arrow ``binary`` columns.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

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
    ]
)


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


class ImageDecode:
    """binary -> (key, width, height, mode, content_hash)."""

    def __init__(self, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "no image decode library in this container; pass fake=True "
                "for the deterministic stand-in"
            )
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for key, payload in zip(batch["key"].to_pylist(), batch["data"].to_pylist()):
            payload = payload or b""
            w, h = _fake_dims(payload)
            rows.append(
                {
                    "key": key,
                    "width": w,
                    "height": h,
                    "mode": "RGB",
                    "content_hash": hashlib.md5(payload).hexdigest(),
                }
            )
        return pa.Table.from_pylist(rows, schema=IMAGE_META_SCHEMA)


class ImageResize:
    """binary -> binary (resized); fake mode hashes (payload, size)."""

    def __init__(self, width: int, height: int, fake: bool = False):
        if not fake:
            raise NotImplementedError("no image library; pass fake=True")
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch["data"].to_pylist():
            payload = payload or b""
            out.append(
                hashlib.md5(payload + f"{self.width}x{self.height}".encode()).digest()
            )
        return pa.table(
            {
                "key": batch["key"],
                "data": pa.array(out, pa.binary()),
                "width": pa.array([self.width] * len(out), pa.int32()),
                "height": pa.array([self.height] * len(out), pa.int32()),
            }
        )


class ImageEmbed:
    """binary -> list<float32> feature vector; fake mode derives a
    deterministic vector from the payload hash (model would load once per
    actor in ``__init__``)."""

    def __init__(self, dim: int = 16, fake: bool = False):
        if not fake:
            raise NotImplementedError("no vision model; pass fake=True")
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = []
        for payload in batch["data"].to_pylist():
            seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
            rng = np.random.RandomState(seed)
            vecs.append(rng.randn(self.dim).astype(np.float32).tolist())
        return pa.table(
            {
                "key": batch["key"],
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )


class FrameSample:
    """video binary -> one row per sampled frame (key, frame_idx, data)."""

    def __init__(self, every_n: int = 10, n_frames: int = 4, fake: bool = False):
        if not fake:
            raise NotImplementedError("no video library; pass fake=True")
        self.every_n = every_n
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, idxs, frames = [], [], []
        for key, payload in zip(batch["key"].to_pylist(), batch["data"].to_pylist()):
            payload = payload or b""
            for i in range(self.n_frames):
                keys.append(key)
                idxs.append(i * self.every_n)
                frames.append(hashlib.md5(payload + bytes([i])).digest())
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "data": pa.array(frames, pa.binary()),
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


def sample_frames(ds: "ray.data.Dataset", every_n: int = 10, n_frames: int = 4,
                  fake: bool = False):
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"every_n": every_n, "n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=default_concurrency(),
    )
