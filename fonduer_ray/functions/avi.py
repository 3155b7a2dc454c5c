"""Minimal RIFF/AVI container codec for Motion-JPEG video.

AVI is Microsoft's RIFF-based container (public spec: the OpenDML /
"AVI RIFF File Reference" layout); Motion-JPEG stores each frame as an
independent baseline JPEG, which ``functions/jpeg.py`` already decodes —
together they make the video frame-sample stage REAL for the one video
format expressible with this repo's pure-numpy codecs. Other codecs
(H.264 etc.) still raise with a clear message.

Layout written/read here::

    RIFF <size> 'AVI '
      LIST <size> 'hdrl'
        'avih' <56>  MainAVIHeader  (us/frame, flags, total frames, w, h)
        LIST <size> 'strl'
          'strh' <56> AVIStreamHeader ('vids', 'MJPG', rate/scale, length)
          'strf' <40> BITMAPINFOHEADER (w, h, 'MJPG')
      LIST <size> 'movi'
        '00dc' <n> <jpeg bytes>      (one chunk per frame, word-aligned)
        ...
      'idx1' <16*n> index entries    (ckid, flags, offset, size)

Sampling reads the 'idx1' index when present (O(1) per sampled frame —
the scale path for large payloads: only the sampled chunks are sliced),
falling back to a linear 'movi' chunk walk.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def avi_encode_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 75
) -> bytes:
    """uint8 gray (H,W) or RGB (H,W,3) frames -> MJPEG AVI bytes.

    All frames must share one shape; each becomes an independent baseline
    JPEG ('00dc' chunk) and an 'idx1' entry."""
    from fonduer_ray.functions.jpeg import jpeg_encode

    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one shape")
    payloads = [jpeg_encode(f, quality=quality) for f in frames]

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # us per frame
        0,  # max bytes/sec (unused)
        0,  # padding granularity
        _AVIF_HASINDEX,
        len(frames),
        0,  # initial frames
        1,  # streams
        0,  # suggested buffer size
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids", b"MJPG",
        0, 0, 0,  # flags; priority, language (2H)
        0,  # initial frames
        1, fps,  # scale, rate -> fps frames/sec
        0, len(frames), 0, 0xFFFFFFFF, 0,  # start, length, bufsize, quality, samplesize
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, w, h, 1, 24, struct.unpack("<I", b"MJPG")[0],
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_chunks = []
    idx_entries = []
    # idx1 offsets are relative to the start of the 'movi' fourcc
    offset = 4
    for p in payloads:
        movi_chunks.append(_chunk(b"00dc", p))
        idx_entries.append(
            struct.pack("<4s3I", b"00dc", _AVIIF_KEYFRAME, offset, len(p))
        )
        offset += 8 + len(p) + (len(p) % 2)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def avi_parse(data: bytes) -> dict:
    """AVI bytes -> {width, height, fps, n_frames, codec, frames} where
    ``frames`` is a list of (offset, size) spans of the raw per-frame
    payloads inside ``data`` (no payload copies — slicing is deferred to
    the caller so sampling only touches the chosen frames)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    meta = {"width": 0, "height": 0, "fps": 0, "n_frames": 0, "codec": ""}
    movi_start = None
    idx1 = None

    def walk(pos: int, end: int) -> None:
        nonlocal movi_start, idx1
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body = pos + 8
            if fourcc == b"LIST":
                ltype = data[body : body + 4]
                if ltype == b"movi":
                    movi_start = body
                walk(body + 4, body + size)
            elif fourcc == b"avih":
                us_pf, _, _, _, total, _, _, _, w, h = struct.unpack_from(
                    "<10I", data, body
                )
                meta["width"], meta["height"] = w, h
                meta["n_frames"] = total
                meta["fps"] = round(1_000_000 / us_pf) if us_pf else 0
            elif fourcc == b"strh":
                stype, handler = struct.unpack_from("<4s4s", data, body)
                if stype == b"vids":
                    meta["codec"] = handler.decode("ascii", "replace")
            elif fourcc == b"idx1":
                idx1 = (body, body + size)
            pos = body + size + (size % 2)

    walk(12, len(data))
    frames: list[tuple[int, int]] = []
    if idx1 is not None and movi_start is not None:
        pos, end = idx1
        while pos + 16 <= end:
            ckid, _flags, off, size = struct.unpack_from("<4s3I", data, pos)
            if ckid[2:4] in (b"dc", b"db"):
                # offset is movi-relative (to the 'movi' fourcc) per spec;
                # some writers use file-absolute — disambiguate by checking
                # the chunk id at the movi-relative position
                p = movi_start + off
                if data[p : p + 2] != ckid[:2]:
                    p = off
                frames.append((p + 8, size))
            pos += 16
    elif movi_start is not None:
        (movi_size,) = struct.unpack_from("<I", data, movi_start - 4)
        pos, end = movi_start + 4, movi_start + movi_size
        while pos + 8 <= end:
            ckid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if ckid[2:4] in (b"dc", b"db"):
                frames.append((pos + 8, size))
            pos += 8 + size + (size % 2)
    meta["frames"] = frames
    if not meta["n_frames"]:
        meta["n_frames"] = len(frames)
    return meta


def avi_decode_frame(data: bytes, span: tuple[int, int]) -> np.ndarray:
    """Decode one frame payload span from ``avi_parse`` (MJPG only)."""
    from fonduer_ray.functions.jpeg import jpeg_decode

    off, size = span
    img, _mode = jpeg_decode(bytes(data[off : off + size]))
    return img
