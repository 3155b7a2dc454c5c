"""Pure-numpy baseline JPEG (JFIF) codec — ITU-T T.81 public spec.

Closes the biggest real-web image gap left by the PNG/BMP codecs: baseline
sequential DCT (SOF0) with Huffman entropy coding, grayscale or YCbCr with
4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers, and byte stuffing.

Decoder structure: marker parse -> per-table 16-bit Huffman lookup arrays
(one O(2^16) table build per DHT, then every symbol decodes in one array
index) -> sequential MCU entropy decode (inherently serial) -> BATCHED
dequantize + IDCT over all 8x8 blocks of a component at once (numpy
matmul) -> vectorized chroma upsample + YCbCr->RGB. The only Python-level
loop is the entropy scan.

Encoder: vectorized level-shift/DCT/quantize per component, standard
Annex K tables scaled by libjpeg's quality convention, canonical Huffman
codes. Used for deterministic test fixtures and as the JPEG sink.

Progressive (SOF2), arithmetic coding and 12-bit precision raise
``ValueError`` — baseline covers the overwhelming share of web JPEGs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.1 — luminance base quantization table (natural order)
QTBL_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

#: Annex K.2 — chrominance base quantization table (natural order)
QTBL_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 standard Huffman specs: (bits[1..16] counts, symbol values)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: orthonormal 8x8 DCT-II matrix: forward F = C f C^T, inverse f = C^T F C
_C = np.zeros((8, 8))
_C[0, :] = 1.0 / np.sqrt(8.0)
for _k in range(1, 8):
    _C[_k, :] = np.sqrt(2.0 / 8.0) * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)


def quality_tables(quality: int = 75) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality convention: 5000/q below 50, 200-2q above."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QTBL_LUMA, QTBL_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _canonical_codes(spec: tuple[list[int], list[int]]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment (Annex C)."""
    counts, symbols = spec
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_lut(spec: tuple[list[int], list[int]]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek decode tables: peek16 -> (symbol, code length)."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for symbol, (code, length) in _canonical_codes(spec).items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = symbol
        ln[lo:hi] = length
    return sym, ln


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the unstuffed scan bytes; peeks 16 bits
    (padded with 1-fill past the end, as the spec's fill bits are 1s)."""

    def __init__(self, data: bytes):
        self.data = np.frombuffer(data + b"\xff\xff\xff", dtype=np.uint8)
        self.pos = 0  # bit position

    def peek16(self) -> int:
        byte, off = divmod(self.pos, 8)
        window = (
            (int(self.data[byte]) << 24)
            | (int(self.data[byte + 1]) << 16)
            | (int(self.data[byte + 2]) << 8)
            | int(self.data[byte + 3])
        )
        return (window >> (16 - off)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _extend(v: int, s: int) -> int:
    """Sign-extend a received magnitude (F.2.2.1 EXTEND)."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def jpeg_decode(data: bytes) -> tuple[np.ndarray, str]:
    """Baseline JFIF bytes -> (uint8 image array, mode "L" | "RGB")."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # stored zigzag -> natural order
                qtables[tq] = nat
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                p += 1
                counts = list(seg[p : p + 16])
                p += 16
                total = sum(counts)
                symbols = list(seg[p : p + total])
                p += total
                huff[(tc, th)] = _decode_lut((counts, symbols))
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan_comps.append((comp, tdta >> 4, tdta & 0xF))
            scan_start = i + seglen
            return _decode_scan(
                data, scan_start, frame, scan_comps, qtables, huff, restart_interval
            )
        # APPn / COM / others: skip
        i += seglen
    raise ValueError("no scan data found")


def _unstuff(data: bytes, start: int) -> bytes:
    """Entropy bytes from ``start`` to the next non-RST marker, with 0xFF00
    stuffing removed and RSTn markers dropped (DC resets are handled by
    counting MCUs against the restart interval)."""
    out = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            i += 2  # restart marker: boundary only
        else:
            break  # real marker (EOI or next segment)
    return bytes(out)


def _decode_scan(data, start, frame, scan_comps, qtables, huff, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c, _, _ in scan_comps)
    vmax = max(c["v"] for c, _, _ in scan_comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # NOTE on restart markers: byte-aligned RSTn bytes are stripped by
    # _unstuff; at each interval we re-align the bit reader and reset DC.
    # Alignment requires knowing the RST positions — simplest correct
    # handling decodes interval-sized chunks independently.
    if restart_interval:
        return _decode_scan_with_restarts(
            data, start, frame, scan_comps, qtables, huff, restart_interval
        )

    reader = _BitReader(_unstuff(data, start))
    planes, counts = _init_planes(scan_comps, mcus_x, mcus_y, hmax, vmax)
    dc_pred = [0] * len(scan_comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            _decode_mcu(reader, scan_comps, huff, planes, counts, dc_pred, mx, my)
    return _finish(planes, scan_comps, qtables, frame, hmax, vmax, mcus_x)


def _decode_scan_with_restarts(
    data, start, frame, scan_comps, qtables, huff, interval
):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c, _, _ in scan_comps)
    vmax = max(c["v"] for c, _, _ in scan_comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    total = mcus_x * mcus_y

    # split the raw entropy stream at RST markers (byte-aligned by spec)
    chunks: list[bytes] = []
    i = start
    n = len(data)
    cur = bytearray()
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            chunks.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    chunks.append(bytes(cur))

    planes, counts = _init_planes(scan_comps, mcus_x, mcus_y, hmax, vmax)
    mcu = 0
    for chunk in chunks:
        reader = _BitReader(chunk)
        dc_pred = [0] * len(scan_comps)
        for _ in range(min(interval, total - mcu) if interval else total - mcu):
            my, mx = divmod(mcu, mcus_x)
            _decode_mcu(reader, scan_comps, huff, planes, counts, dc_pred, mx, my)
            mcu += 1
        if mcu >= total:
            break
    return _finish(planes, scan_comps, qtables, frame, hmax, vmax, mcus_x)


def _init_planes(scan_comps, mcus_x, mcus_y, hmax, vmax):
    planes = []
    counts = []
    for comp, _, _ in scan_comps:
        bw = mcus_x * comp["h"]
        bh = mcus_y * comp["v"]
        planes.append(np.zeros((bh * bw, 64), dtype=np.int64))
        counts.append(bw)
    return planes, counts


def _decode_mcu(reader, scan_comps, huff, planes, counts, dc_pred, mx, my):
    for ci, (comp, td, ta) in enumerate(scan_comps):
        dc_sym, dc_len = huff[(0, td)]
        ac_sym, ac_len = huff[(1, ta)]
        bw = counts[ci]
        for by in range(comp["v"]):
            for bx in range(comp["h"]):
                coeffs = _decode_block(reader, dc_sym, dc_len, ac_sym, ac_len)
                dc_pred[ci] += coeffs[0]
                coeffs[0] = dc_pred[ci]
                row = my * comp["v"] + by
                col = mx * comp["h"] + bx
                planes[ci][row * bw + col] = coeffs


def _decode_block(reader, dc_sym, dc_len, ac_sym, ac_len) -> np.ndarray:
    out = np.zeros(64, dtype=np.int64)
    peek = reader.peek16()
    s = int(dc_sym[peek])
    length = int(dc_len[peek])
    if length == 0:
        raise ValueError("invalid Huffman code in DC scan")
    reader.skip(length)
    out[0] = _extend(reader.receive(s), s) if s else 0
    k = 1
    while k < 64:
        peek = reader.peek16()
        rs = int(ac_sym[peek])
        length = int(ac_len[peek])
        if length == 0:
            raise ValueError("invalid Huffman code in AC scan")
        reader.skip(length)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        out[k] = _extend(reader.receive(s), s)
        k += 1
    return out


def _finish(planes, scan_comps, qtables, frame, hmax, vmax, mcus_x):
    w, h = frame["w"], frame["h"]
    out_planes = []
    for ci, (comp, _, _) in enumerate(scan_comps):
        q = qtables[comp["tq"]]
        zz = planes[ci]  # (nblocks, 64) zigzag-order coefficients
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz  # dezigzag
        nat = nat * q[None, :]
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        # batched inverse DCT: f = C^T F C
        pix = np.einsum("ki,nkl,lj->nij", _C, blocks, _C) + 128.0
        bw = mcus_x * comp["h"]
        bh = len(blocks) // bw
        # tile blocks back into the component plane
        plane = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution by sample repetition
        plane = np.repeat(plane, hmax // comp["h"], axis=1)
        plane = np.repeat(plane, vmax // comp["v"], axis=0)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8), "L"
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8), "RGB"


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _forward_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Full component plane -> (nblocks, 64) quantized zigzag coefficients,
    all math batched."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    shifted = blocks.astype(np.float64) - 128.0
    coeffs = np.einsum("ik,nkl,jl->nij", _C, shifted, _C)
    qn = q.reshape(8, 8)[None, :, :]
    quant = np.rint(coeffs / qn).astype(np.int64).reshape(-1, 64)
    return quant[:, ZIGZAG]  # natural -> zigzag


def _magnitude(v: int) -> tuple[int, int]:
    """(size, code) for a DC diff / AC value (F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = int(a).bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to (bh, bw) multiples of 8."""
    out = np.empty((bh, bw), dtype=plane.dtype)
    h, w = plane.shape
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def jpeg_encode(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 gray (H,W) or RGB (H,W,3) -> baseline JFIF bytes.

    ``subsampling``: "444" (one 8x8 MCU, no chroma decimation) or "420"
    (16x16 MCUs, chroma box-averaged 2x2 — the common web layout).
    ``restart_interval``: emit RSTn every N MCUs (0 = none) — lets decoders
    resynchronize after corruption and bounds DC-predictor chains."""
    if img.ndim == 2:
        gray = True
        y = img.astype(np.float64)
        planes = [y]
    elif img.ndim == 3 and img.shape[2] == 3:
        gray = False
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError("expected (H,W) gray or (H,W,3) RGB uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if gray:
        subsampling = "444"
    h, w = img.shape[:2]
    ql, qc = quality_tables(quality)

    sub = subsampling == "420"
    hv = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    hmax = 2 if sub else 1
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * hmax))

    comp_blocks = []
    for ci, plane in enumerate(planes):
        ch, cv = hv[ci] if not gray else (1, 1)
        if ci > 0 and sub:
            # 2x2 box average; pad odd dims by edge replication first
            p = _pad_to_blocks(plane, h + (h & 1), w + (w & 1))
            plane = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        bw = mcus_x * ch * 8
        bh = mcus_y * cv * 8
        padded = _pad_to_blocks(plane, bh, bw)
        q = ql if ci == 0 else qc
        comp_blocks.append((_forward_blocks(padded, q), bw // 8, ch, cv))

    dc_codes = [
        _canonical_codes(DC_LUMA_SPEC),
        _canonical_codes(DC_CHROMA_SPEC),
    ]
    ac_codes = [
        _canonical_codes(AC_LUMA_SPEC),
        _canonical_codes(AC_CHROMA_SPEC),
    ]

    writer = _BitWriter()
    dc_pred = [0] * len(planes)
    mcu_idx = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.flush()
                writer.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                dc_pred = [0] * len(planes)
            for ci, (blocks, bw, ch, cv) in enumerate(comp_blocks):
                dct, act = dc_codes[min(ci, 1)], ac_codes[min(ci, 1)]
                for by in range(cv):
                    for bx in range(ch):
                        row = my * cv + by
                        col = mx * ch + bx
                        zz = blocks[row * bw + col]
                        _encode_block(writer, zz, dc_pred, ci, dct, act)
            mcu_idx += 1
    writer.flush()

    return _assemble(
        writer.buf, w, h, gray, ql, qc, hv if not gray else [(1, 1)],
        restart_interval,
    )


def _encode_block(writer, zz, dc_pred, ci, dct, act):
    diff = int(zz[0]) - dc_pred[ci]
    dc_pred[ci] = int(zz[0])
    s, code = _magnitude(diff)
    c, ln = dct[s]
    writer.write(c, ln)
    if s:
        writer.write(code, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = act[0xF0]  # ZRL
            writer.write(c, ln)
            run -= 16
        s, code = _magnitude(v)
        c, ln = act[(run << 4) | s]
        writer.write(c, ln)
        writer.write(code, s)
        run = 0
    if run:
        c, ln = act[0x00]  # EOB
        writer.write(c, ln)


def _dht_segment(tc: int, th: int, spec) -> bytes:
    counts, symbols = spec
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _assemble(entropy, w, h, gray, ql, qc, hv, restart_interval=0) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, ql),) + (() if gray else ((1, qc),)):
        zz = tbl[ZIGZAG]  # natural -> zigzag storage order
        body = bytes([tq]) + bytes(int(x) for x in zz)
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        ch, cv = hv[ci] if ci < len(hv) else (1, 1)
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA_SPEC)
    out += _dht_segment(1, 0, AC_LUMA_SPEC)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_SPEC)
        out += _dht_segment(1, 1, AC_CHROMA_SPEC)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)
