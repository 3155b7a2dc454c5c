"""Pure-Python/numpy media codecs for the multimodal stages.

No imaging library ships in this environment, so the formats with simple
public specifications are decoded natively:

- **PNG** (RFC 2083): 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced;
  zlib-inflated IDAT, all five scanline filters unfiltered (Sub/Up
  vectorized with numpy, Average/Paeth per-row). Encoder writes filter-0
  scanlines (used for resize output and test fixtures).
- **BMP**: 24-bit uncompressed bottom-up DIB.
- **WAV**: PCM via the stdlib ``wave`` module -> int16/uint8 numpy samples.
- **JPEG**: baseline JFIF (Huffman + DCT) in ``functions/jpeg.py`` — the
  dominant real-web image format; progressive JPEGs raise with a clear
  message.

- **AVI/MJPEG** (RIFF container, per-frame baseline JPEG) in
  ``functions/avi.py`` — makes video frame sampling real.

MP3 and inter-frame video codecs remain out of scope (a container with
the real libraries swaps them in behind the same stage signatures — see
``functions/multimodal.py``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: color type -> channels
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_MODE = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def sniff_format(data: bytes) -> str | None:
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF89a", b"GIF87a"):
        return "gif"
    if data[4:8] == b"ftyp":
        return "mp4"  # ISO-BMFF: first box is ftyp, size at 0:4
    if data[:2] in (b"II", b"MM") and len(data) >= 4:
        import struct

        en = "<" if data[:2] == b"II" else ">"
        if struct.unpack(en + "H", data[2:4])[0] == 42:
            return "tiff"
    if data[:3] == b"ID3":
        return "mp3"  # ID3v2-tagged MPEG audio
    if len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        return "mp3"  # bare MPEG audio frame sync
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def png_decode(data: bytes) -> tuple[np.ndarray, str]:
    """PNG bytes -> (HxWxC uint8 array, mode string)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}): only 8-bit non-interlaced L/LA/RGB/RGBA"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = filters[y]
        row = rows[y]
        if f == 0:
            cur = row.copy()
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            cur = row.copy()
            for c in range(ch):
                cur[c::ch] = np.cumsum(cur[c::ch]) % 256
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f == 3:  # Average (sequential in x)
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth (sequential in x)
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                cur[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = cur
    img = out.astype(np.uint8).reshape(height, width, ch)
    return img, _PNG_MODE[color_type]


def png_encode(img: np.ndarray) -> bytes:
    """HxWxC (or HxW) uint8 array -> PNG bytes (filter 0, non-interlaced)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
    scan[:, 1:] = img.reshape(h, w * ch)
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def bmp_decode(data: bytes) -> tuple[np.ndarray, str]:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flipped = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    px = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * height, offset=pixel_off
    ).reshape(height, row_bytes)
    img = px[:, : width * 3].reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    if flipped:
        img = img[::-1]
    return np.ascontiguousarray(img), "RGB"


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples [n_frames x n_channels], sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch, sampwidth, rate, n_frames = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(n_frames)
    if sampwidth == 2:
        arr = np.frombuffer(raw, dtype="<i2")
    elif sampwidth == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    return arr.reshape(-1, n_ch), rate


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    import io
    import wave

    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# image ops
# ---------------------------------------------------------------------------


def image_decode(data: bytes) -> tuple[np.ndarray, str]:
    """Sniff + decode PNG, BMP, baseline JPEG or GIF."""
    fmt = sniff_format(data)
    if fmt == "png":
        return png_decode(data)
    if fmt == "bmp":
        return bmp_decode(data)
    if fmt == "jpeg":
        from fonduer_ray.functions.jpeg import jpeg_decode

        return jpeg_decode(data)
    if fmt == "gif":
        from fonduer_ray.functions.gif import gif_decode

        return gif_decode(data)
    raise ValueError(
        "unsupported image format (PNG/BMP/JPEG/GIF supported natively)"
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    h, w = img.shape[:2]
    rows = (np.arange(height) * h / height).astype(np.int64)
    cols = (np.arange(width) * w / width).astype(np.int64)
    return np.ascontiguousarray(img[rows][:, cols])


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic classical feature vector: k x k average-pooled
    luminance in [0, 1] (k = ceil(sqrt(dim))), truncated to ``dim``. A
    model-based embedder (actor holding the model) drops in behind the same
    stage signature."""
    if img.ndim == 3:
        ch = img.shape[2]
        if ch >= 3:
            lum = (
                0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
            )
        else:
            lum = img[:, :, 0].astype(np.float64)
    else:
        lum = img.astype(np.float64)
    k = int(np.ceil(np.sqrt(dim)))
    pooled = resize_nearest(lum[:, :, None].astype(np.uint8), k, k)[:, :, 0]
    vec = (pooled.astype(np.float32) / 255.0).reshape(-1)[:dim]
    if len(vec) < dim:
        vec = np.pad(vec, (0, dim - len(vec)))
    return vec.astype(np.float32)
