"""GIF87a/89a codec, pure numpy/python — real LZW, no image libraries.

GIF's entropy stage is LZW with variable code width (3-12 bits,
LSB-first bit packing, CLEAR/EOI control codes), which — unlike JPEG's
Huffman+DCT (``functions/jpeg.py``) — is small enough to implement
exactly from the public specification (GIF89a spec, CompuServe 1990).
Web corpora are full of GIFs, so this closes the still-image decode
family: PNG, BMP, JPEG, GIF all decode natively.

Scope: global-color-table images, non-interlaced, multi-frame
(animation) supported; per-frame LOCAL color tables and interlacing are
rejected loudly (the encoder never produces them, web thumbnails rarely
use them).
"""

from __future__ import annotations

import numpy as np

_HDR89 = b"GIF89a"
_HDR87 = b"GIF87a"


def sniff_gif(data: bytes) -> bool:
    return data[:6] in (_HDR89, _HDR87)


# ------------------------------------------------------------------ LZW


def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable width starting at mcs+1, capped at 12
    bits; codes packed LSB-first."""
    clear = 1 << mcs
    eoi = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = table[: clear + 2]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < (1 << 12):
            # table frozen at the 12-bit cap (deferred-clear streams keep
            # emitting existing codes without defining new ones)
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW output short of pixel count")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(mcs: int, indices: np.ndarray) -> bytes:
    """Real LZW compression (dict of byte strings -> code), emitting a
    CLEAR when the table hits the 12-bit cap — the decoder above and any
    spec-conformant reader round-trip it exactly."""
    clear = 1 << mcs
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = mcs + 1
    emit(clear, width)
    data = indices.astype(np.uint8).tobytes()
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = mcs + 1
        w = c
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ----------------------------------------------------------------- container


def _u16(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8)


def gif_parse(data: bytes) -> dict:
    """Container walk: ``{width, height, n_frames, frames}`` where each
    frame entry is ``(left, top, w, h, mcs, lzw_bytes)`` ready for
    :func:`_lzw_decode`, plus the global ``palette`` (Nx3 uint8)."""
    if not sniff_gif(data):
        raise ValueError("not a GIF")
    width, height = _u16(data, 6), _u16(data, 8)
    packed = data[10]
    pos = 13
    palette = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        palette = np.frombuffer(
            data[pos : pos + 3 * n_colors], dtype=np.uint8
        ).reshape(-1, 3)
        pos += 3 * n_colors
    frames = []
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            if pos >= len(data):
                raise ValueError("truncated GIF (extension sub-blocks)")
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if pos + 10 >= len(data):
            raise ValueError("truncated GIF (image descriptor)")
        left, top = _u16(data, pos + 1), _u16(data, pos + 3)
        w, h = _u16(data, pos + 5), _u16(data, pos + 7)
        ipacked = data[pos + 9]
        if ipacked & 0x80:
            raise ValueError("local color tables not supported")
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        pos += 10
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        if pos >= len(data):
            raise ValueError("truncated GIF (image data sub-blocks)")
        pos += 1
        frames.append((left, top, w, h, mcs, bytes(lzw)))
    if palette is None:
        raise ValueError("GIF without a global color table not supported")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
        "palette": palette,
    }


def gif_decode_frame(meta: dict, idx: int) -> np.ndarray:
    """Frame ``idx`` -> HxWx3 uint8 RGB (frame-local dims)."""
    left, top, w, h, mcs, lzw = meta["frames"][idx]
    indices = _lzw_decode(mcs, lzw, w * h)
    return meta["palette"][indices].reshape(h, w, 3)


def gif_decode(data: bytes) -> tuple[np.ndarray, str]:
    """First frame -> (HxWx3 uint8 RGB, "RGB") — the
    ``codecs.image_decode`` contract."""
    meta = gif_parse(data)
    return gif_decode_frame(meta, 0), "RGB"


def gif_encode(frames: list[np.ndarray]) -> bytes:
    """HxWx3 uint8 RGB frame list -> GIF89a bytes (one global color
    table built from the union of frame colors; <= 256 distinct)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(
        stacked, axis=0, return_inverse=True
    )
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors > 256 (needs quantization)")
    # palette size must be a power of two >= 2; mcs >= 2 per spec
    bits = max(2, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    mcs = bits

    out = bytearray()
    out += _HDR89
    out += bytes([w & 0xFF, w >> 8, h & 0xFF, h >> 8])
    out += bytes([0x80 | ((bits - 1) & 0x07) << 4 | (bits - 1), 0, 0])
    out += palette.tobytes()
    if len(frames) > 1:
        # NETSCAPE2.0 loop extension (honest animation container)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    offset = 0
    for f in frames:
        fh, fw = f.shape[:2]
        if (fh, fw) != (h, w):
            raise ValueError("all frames must share dimensions")
        idx = inverse[offset : offset + fh * fw].astype(np.uint8)
        offset += fh * fw
        out += b"\x2c" + bytes(
            [0, 0, 0, 0, fw & 0xFF, fw >> 8, fh & 0xFF, fh >> 8, 0]
        )
        out += bytes([mcs])
        lzw = _lzw_encode(mcs, idx)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
