"""MP4 / ISO-BMFF (ISO/IEC 14496-12) box walk: container metadata WITHOUT
frame decode.

Web corpora carry MP4 payloads whose useful pipeline signals — duration,
track count, codecs, video dimensions, sample counts — all live in the
box tree (``ftyp``/``moov``/``trak``/...); only the entropy-coded sample
payload (H.264/AAC) needs a media library. This module walks the public
box layout: 4-byte big-endian size + 4-byte type, ``size == 1`` promotes
to a 64-bit largesize, ``size == 0`` runs to end-of-enclosure, container
boxes recurse, full boxes carry version+flags. It does for video what
``mp3.py``'s header walk does for audio (round-4 verdict item #7); actual
H.264 frame decode stays honestly out of scope (``multimodal.py`` routes
it to the error side channel).

``mp4_encode_stub`` emits a structurally valid ISO-BMFF tree (real box
sizes, real ``mvhd``/``tkhd``/``mdhd``/``hdlr``/``stsd``/``stsz``
layouts, junk ``mdat``) so plumbing and oracle fixtures are
self-contained — the sample data is NOT decodable media and
``mp4_parse`` never reads it.
"""

from __future__ import annotations

import struct

#: boxes that contain child boxes directly (no extra payload prefix)
_CONTAINERS = frozenset(
    {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex", b"udta"}
)


def _walk(data: bytes, start: int, end: int):
    """Yield ``(type, body_start, body_end)`` for each box in
    ``data[start:end]``; raise ValueError on any truncation or size
    violation (consistent error contract for dispatch side channels)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated MP4 box header at byte {pos}")
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated MP4 largesize at byte {pos}")
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to the end of the enclosure
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"invalid MP4 box size {size} for {btype!r} at byte {pos}"
            )
        yield btype, body, pos + size
        pos += size


def _full_box(data: bytes, start: int, end: int) -> tuple[int, int]:
    """(version, body_offset_after_version_and_flags)."""
    if start + 4 > end:
        raise ValueError("truncated MP4 full box")
    return data[start], start + 4


def _parse_mvhd(data: bytes, start: int, end: int) -> tuple[int, int]:
    """(timescale, duration) from the movie header."""
    ver, p = _full_box(data, start, end)
    if ver == 1:
        if p + 28 > end:
            raise ValueError("truncated mvhd v1")
        timescale = int.from_bytes(data[p + 16 : p + 20], "big")
        duration = int.from_bytes(data[p + 20 : p + 28], "big")
    else:
        if p + 16 > end:
            raise ValueError("truncated mvhd v0")
        timescale = int.from_bytes(data[p + 8 : p + 12], "big")
        duration = int.from_bytes(data[p + 12 : p + 16], "big")
    return timescale, duration


def _parse_tkhd(data: bytes, start: int, end: int) -> tuple[int, int]:
    """(width, height) in integer pixels from the 16.16 fixed-point track
    header fields (0, 0 for non-visual tracks)."""
    ver, p = _full_box(data, start, end)
    # v0: times 4+4, id 4, rsvd 4, dur 4 = 20; v1: 8+8+4+4+8 = 32
    p += 32 if ver == 1 else 20
    p += 8 + 2 + 2 + 2 + 2 + 36  # reserved, layer, group, volume, rsvd, matrix
    if p + 8 > end:
        raise ValueError("truncated tkhd")
    width = int.from_bytes(data[p : p + 4], "big") >> 16
    height = int.from_bytes(data[p + 4 : p + 8], "big") >> 16
    return width, height


def _parse_mdhd(data: bytes, start: int, end: int) -> tuple[int, int]:
    """(timescale, duration) from the media header."""
    ver, p = _full_box(data, start, end)
    if ver == 1:
        if p + 28 > end:
            raise ValueError("truncated mdhd v1")
        return (
            int.from_bytes(data[p + 16 : p + 20], "big"),
            int.from_bytes(data[p + 20 : p + 28], "big"),
        )
    if p + 16 > end:
        raise ValueError("truncated mdhd v0")
    return (
        int.from_bytes(data[p + 8 : p + 12], "big"),
        int.from_bytes(data[p + 12 : p + 16], "big"),
    )


def _parse_hdlr(data: bytes, start: int, end: int) -> str:
    _, p = _full_box(data, start, end)
    if p + 8 > end:
        raise ValueError("truncated hdlr")
    return data[p + 4 : p + 8].decode("latin-1")


def _parse_stsd(data: bytes, start: int, end: int) -> str:
    """FourCC of the first sample entry ('' when the table is empty)."""
    _, p = _full_box(data, start, end)
    if p + 4 > end:
        raise ValueError("truncated stsd")
    n_entries = int.from_bytes(data[p : p + 4], "big")
    if n_entries == 0:
        return ""
    if p + 12 > end:
        raise ValueError("truncated stsd sample entry")
    return data[p + 8 : p + 12].decode("latin-1")


def _parse_stsz(data: bytes, start: int, end: int) -> int:
    """sample_count from the sample-size table."""
    _, p = _full_box(data, start, end)
    if p + 8 > end:
        raise ValueError("truncated stsz")
    return int.from_bytes(data[p + 4 : p + 8], "big")


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    track = {
        "handler": "",
        "codec": "",
        "width": 0,
        "height": 0,
        "n_samples": 0,
        "timescale": 0,
        "duration_ts": 0,
    }
    for btype, b0, b1 in _walk(data, start, end):
        if btype == b"tkhd":
            track["width"], track["height"] = _parse_tkhd(data, b0, b1)
        elif btype == b"mdia":
            for mtype, m0, m1 in _walk(data, b0, b1):
                if mtype == b"mdhd":
                    track["timescale"], track["duration_ts"] = _parse_mdhd(
                        data, m0, m1
                    )
                elif mtype == b"hdlr":
                    track["handler"] = _parse_hdlr(data, m0, m1)
                elif mtype == b"minf":
                    for stype, s0, s1 in _walk(data, m0, m1):
                        if stype != b"stbl":
                            continue
                        for ttype, t0, t1 in _walk(data, s0, s1):
                            if ttype == b"stsd":
                                track["codec"] = _parse_stsd(data, t0, t1)
                            elif ttype == b"stsz":
                                track["n_samples"] = _parse_stsz(data, t0, t1)
    return track


def mp4_parse(data: bytes) -> dict:
    """Walk the ISO-BMFF box tree; raise ValueError when the payload is
    not an MP4 family container (so stage error side channels stay
    accurate).

    Returns ``{brand, timescale, duration_ts, duration_sec, n_tracks,
    tracks}`` where ``tracks`` is a list of ``{handler, codec, width,
    height, n_samples, timescale, duration_ts}`` in file order."""
    out = {
        "brand": "",
        "timescale": 0,
        "duration_ts": 0,
        "duration_sec": 0.0,
        "n_tracks": 0,
        "tracks": [],
    }
    saw_ftyp = saw_moov = False
    for btype, b0, b1 in _walk(data, 0, len(data)):
        if btype == b"ftyp":
            if b1 - b0 < 8:
                raise ValueError("truncated ftyp")
            out["brand"] = data[b0 : b0 + 4].decode("latin-1")
            saw_ftyp = True
        elif btype == b"moov":
            saw_moov = True
            for mtype, m0, m1 in _walk(data, b0, b1):
                if mtype == b"mvhd":
                    out["timescale"], out["duration_ts"] = _parse_mvhd(
                        data, m0, m1
                    )
                elif mtype == b"trak":
                    out["tracks"].append(_parse_trak(data, m0, m1))
    if not saw_ftyp or not saw_moov:
        raise ValueError("not an ISO-BMFF container (missing ftyp/moov)")
    out["n_tracks"] = len(out["tracks"])
    if out["timescale"]:
        out["duration_sec"] = out["duration_ts"] / out["timescale"]
    return out


def sniff_mp4(data: bytes) -> bool:
    """Cheap dispatch test: an ftyp box header in the first 12 bytes."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def _trak_stub(
    handler: bytes,
    codec: bytes,
    timescale: int,
    duration_ts: int,
    n_samples: int,
    width: int = 0,
    height: int = 0,
) -> bytes:
    tkhd = _full(
        b"tkhd",
        0,
        struct.pack(">IIII", 0, 0, 1, 0)  # times, track id, reserved
        + struct.pack(">I", duration_ts)
        + b"\x00" * 8  # reserved
        + struct.pack(">hhhh", 0, 0, 0x0100, 0)  # layer, group, volume, rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, duration_ts)
        + struct.pack(">hh", 0x55C4, 0),  # language 'und', pre_defined
    )
    hdlr = _full(
        b"hdlr", 0, struct.pack(">I", 0) + handler + b"\x00" * 12 + b"\x00"
    )
    if handler == b"vide":
        # VisualSampleEntry: rsvd 6, dref idx 2, pre/rsvd 16, w/h, res,
        # rsvd, frame_count, compressorname 32, depth, pre_defined
        entry_body = (
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)
            + struct.pack(">I", 0)
            + struct.pack(">H", 1)
            + b"\x00" * 32
            + struct.pack(">Hh", 24, -1)
        )
    else:
        # AudioSampleEntry: rsvd 6, dref idx 2, rsvd 8, channels,
        # samplesize, pre_defined, rsvd, samplerate 16.16
        entry_body = (
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 8
            + struct.pack(">HHHH", 2, 16, 0, 0)
            + struct.pack(">I", 44100 << 16)
        )
    stsd = _full(
        b"stsd", 0, struct.pack(">I", 1) + _box(codec, entry_body)
    )
    stsz = _full(b"stsz", 0, struct.pack(">II", 0, n_samples))
    stbl = _box(b"stbl", stsd + stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def mp4_encode_stub(
    duration_ts: int,
    timescale: int = 1000,
    width: int = 320,
    height: int = 240,
    n_video_samples: int = 0,
    with_audio: bool = True,
    video_codec: bytes = b"avc1",
    audio_codec: bytes = b"mp4a",
    mdat_bytes: int = 32,
) -> bytes:
    """Structurally valid ISO-BMFF container with junk sample data
    (box tree real, media not decodable) — the deterministic fixture
    generator for tests and the driver oracle."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp41")
    mvhd = _full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, duration_ts)
        + struct.pack(">Ihh", 0x00010000, 0x0100, 0)  # rate, volume, rsvd
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 3),  # next track id
    )
    traks = _trak_stub(
        b"vide", video_codec, timescale, duration_ts, n_video_samples,
        width, height,
    )
    if with_audio:
        traks += _trak_stub(
            b"soun", audio_codec, 44100,
            duration_ts * 44100 // timescale, 0,
        )
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", b"\x00" * mdat_bytes)
    return ftyp + moov + mdat
