"""Minimal-but-real TIFF 6.0 (Adobe spec, 1992) container codec: baseline
encoder and an IFD (Image File Directory) walker — the EXIF-family
metadata surface for scanned-document / photo payload columns, doing for
TIFF what ``mp4.py``'s box walk does for video containers.

Covered (all from the public TIFF 6.0 specification):

- both byte orders (``II`` little- and ``MM`` big-endian) from the magic,
- the 8-byte header (order, 42, first-IFD offset),
- IFD entry decoding (tag, field type, count, inline value vs. offset —
  a value is inline iff ``type_size * count <= 4``),
- the next-IFD pointer chain (multi-page files),
- uncompressed (Compression=1) single/multi-strip grayscale & RGB pixel
  data via StripOffsets/StripByteCounts.

Anything outside that (LZW/JPEG-compressed strips, tiles, planar config
2) raises ``ValueError`` with a reason, matching the truncated-stream
``ValueError`` contract the other codecs use for the per-row error side
channel. No reference analog (fonduer has no binary-payload codecs).
"""

from __future__ import annotations

import struct

import numpy as np

#: field type -> byte size (TIFF 6.0 §2); only the types the baseline set
#: uses, plus RATIONAL for the resolution tags
TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279


def tiff_encode(
    pages: "list[np.ndarray]", little_endian: bool = True
) -> bytes:
    """Encode uint8 grayscale ``(h, w)`` or RGB ``(h, w, 3)`` pages as an
    uncompressed baseline TIFF with one strip per page and a chained IFD
    per page."""
    en = "<" if little_endian else ">"
    out = bytearray()
    out += b"II" if little_endian else b"MM"
    out += struct.pack(en + "H", 42)
    ifd_ptr_pos = len(out)
    out += struct.pack(en + "I", 0)  # patched to the first IFD below

    for page_idx, px in enumerate(pages):
        px = np.ascontiguousarray(px, dtype=np.uint8)
        if px.ndim == 2:
            h, w = px.shape
            spp = 1
            photometric = 1  # BlackIsZero
        elif px.ndim == 3 and px.shape[2] == 3:
            h, w, _ = px.shape
            spp = 3
            photometric = 2  # RGB
        else:
            raise ValueError("tiff_encode: need (h,w) or (h,w,3) uint8")
        strip = px.tobytes()
        strip_off = len(out)
        out += strip
        if len(out) % 2:
            out += b"\x00"  # IFDs must begin on a word boundary

        bits_extra_off = 0
        entries = []

        def short_entry(tag: int, value: int) -> bytes:
            return struct.pack(en + "HHI", tag, 3, 1) + struct.pack(
                en + "HH", value, 0
            )

        def long_entry(tag: int, value: int) -> bytes:
            return struct.pack(en + "HHII", tag, 4, 1, value)

        if spp == 3:
            # BitsPerSample count 3 -> 6 bytes, does not fit inline
            bits_extra_off = len(out)
            out += struct.pack(en + "HHH", 8, 8, 8)
            if len(out) % 2:
                out += b"\x00"

        entries.append(long_entry(TAG_WIDTH, w))
        entries.append(long_entry(TAG_HEIGHT, h))
        if spp == 1:
            entries.append(short_entry(TAG_BITS, 8))
        else:
            entries.append(
                struct.pack(en + "HHII", TAG_BITS, 3, 3, bits_extra_off)
            )
        entries.append(short_entry(TAG_COMPRESSION, 1))
        entries.append(short_entry(TAG_PHOTOMETRIC, photometric))
        entries.append(long_entry(TAG_STRIP_OFFSETS, strip_off))
        entries.append(short_entry(TAG_SAMPLES_PER_PIXEL, spp))
        entries.append(long_entry(TAG_ROWS_PER_STRIP, h))
        entries.append(long_entry(TAG_STRIP_BYTE_COUNTS, len(strip)))

        ifd_off = len(out)
        # patch the pointer that should reach this IFD
        struct.pack_into(en + "I", out, ifd_ptr_pos, ifd_off)
        out += struct.pack(en + "H", len(entries))
        for ebytes in entries:
            out += ebytes
        ifd_ptr_pos = len(out)
        out += struct.pack(en + "I", 0)  # next-IFD pointer (0 = last)

    return bytes(out)


def _read_values(data: bytes, en: str, ftype: int, count: int, raw: bytes):
    """Decode an IFD entry's values from its inline 4 bytes or the
    pointed-to region."""
    size = TYPE_SIZES.get(ftype)
    if size is None:
        return None  # unknown type: skip (spec-sanctioned reader behavior)
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(en + "I", raw)
        if off + total > len(data):
            raise ValueError("truncated TIFF: value region out of range")
        buf = data[off : off + total]
    if ftype == 3:
        return list(struct.unpack(en + f"{count}H", buf))
    if ftype == 4:
        return list(struct.unpack(en + f"{count}I", buf))
    if ftype == 1:
        return list(buf)
    if ftype == 2:
        return [buf.rstrip(b"\x00").decode("ascii", "replace")]
    if ftype == 5:
        vals = struct.unpack(en + f"{2 * count}I", buf)
        return [(vals[i], vals[i + 1]) for i in range(0, len(vals), 2)]
    return None


def tiff_parse(data: bytes) -> dict:
    """Walk every IFD of a TIFF stream. Returns ``{byte_order, n_pages,
    pages: [{width, height, bits, samples_per_pixel, compression,
    photometric, strip_offsets, strip_byte_counts, rows_per_strip}]}``.
    Raises ``ValueError`` on truncation, a bad magic, or an IFD cycle."""
    if len(data) < 8:
        raise ValueError("truncated TIFF: no header")
    order = data[:2]
    if order == b"II":
        en = "<"
    elif order == b"MM":
        en = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic, first_ifd) = struct.unpack(en + "HI", data[2:8])
    if magic != 42:
        raise ValueError("not a TIFF: magic != 42")

    pages = []
    seen = set()
    off = first_ifd
    while off:
        if off in seen:
            raise ValueError("bad TIFF: IFD cycle")
        seen.add(off)
        if off + 2 > len(data):
            raise ValueError("truncated TIFF: IFD offset out of range")
        (n_entries,) = struct.unpack(en + "H", data[off : off + 2])
        end = off + 2 + 12 * n_entries
        if end + 4 > len(data):
            raise ValueError("truncated TIFF: IFD overruns stream")
        tags: dict[int, list] = {}
        for i in range(n_entries):
            e = off + 2 + 12 * i
            tag, ftype, count = struct.unpack(en + "HHI", data[e : e + 8])
            vals = _read_values(data, en, ftype, count, data[e + 8 : e + 12])
            if vals is not None:
                tags[tag] = vals
        pages.append(
            {
                "width": int(tags.get(TAG_WIDTH, [0])[0]),
                "height": int(tags.get(TAG_HEIGHT, [0])[0]),
                "bits": [int(b) for b in tags.get(TAG_BITS, [1])],
                "samples_per_pixel": int(
                    tags.get(TAG_SAMPLES_PER_PIXEL, [1])[0]
                ),
                "compression": int(tags.get(TAG_COMPRESSION, [1])[0]),
                "photometric": int(tags.get(TAG_PHOTOMETRIC, [1])[0]),
                "strip_offsets": [
                    int(v) for v in tags.get(TAG_STRIP_OFFSETS, [])
                ],
                "strip_byte_counts": [
                    int(v) for v in tags.get(TAG_STRIP_BYTE_COUNTS, [])
                ],
                "rows_per_strip": int(
                    tags.get(TAG_ROWS_PER_STRIP, [2**32 - 1])[0]
                ),
            }
        )
        (off,) = struct.unpack(en + "I", data[end : end + 4])

    return {
        "byte_order": order.decode("ascii"),
        "n_pages": len(pages),
        "pages": pages,
    }


def tiff_decode_page(meta: dict, data: bytes, page: int = 0) -> np.ndarray:
    """Decode one uncompressed page to a uint8 array ``(h, w)`` or
    ``(h, w, 3)``."""
    p = meta["pages"][page]
    if p["compression"] != 1:
        raise ValueError(
            f"unsupported TIFF compression {p['compression']} (baseline only)"
        )
    if any(b != 8 for b in p["bits"]):
        raise ValueError("unsupported TIFF bit depth (8-bit only)")
    w, h, spp = p["width"], p["height"], p["samples_per_pixel"]
    buf = bytearray()
    for o, n in zip(p["strip_offsets"], p["strip_byte_counts"]):
        if o + n > len(data):
            raise ValueError("truncated TIFF: strip out of range")
        buf += data[o : o + n]
    need = w * h * spp
    if len(buf) < need:
        raise ValueError("truncated TIFF: strip data short")
    arr = np.frombuffer(bytes(buf[:need]), dtype=np.uint8)
    return arr.reshape((h, w) if spp == 1 else (h, w, spp))
