"""MPEG audio (MP3) frame-header walk: container metadata WITHOUT PCM.

Web corpora carry MP3 payloads whose useful signals for data pipelines —
duration, bitrate, sample rate, channel mode, CBR/VBR — all live in the
32-bit frame headers; only the entropy-coded granule payload (Huffman +
IMDCT synthesis) needs an audio library. This module walks the frame
sequence from the public header layout (ISO/IEC 11172-3 / 13818-3 frame
header fields), skipping ID3v2 (synchsafe-sized leading tag) and ID3v1
(fixed 128-byte trailing tag). PCM synthesis stays honestly out of scope
(``multimodal.py`` routes it to the error side channel).

``mp3_encode_silent`` emits structurally valid CBR frames (real headers,
zeroed payload) so plumbing and oracle fixtures are self-contained — the
payload is NOT meaningful audio and ``mp3_parse`` never reads it.
"""

from __future__ import annotations

#: kbps by (version_key, layer, bitrate_index); 0 = free-format (rejected)
_BITRATES_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATES_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

#: Hz by (version, samplerate_index)
_SAMPLE_RATES = {
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}

#: samples per frame by (version, layer)
def _samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if absent). The tag size
    is 4 synchsafe bytes (7 bits each) and EXCLUDES the 10-byte header."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    size = (
        (data[6] & 0x7F) << 21
        | (data[7] & 0x7F) << 14
        | (data[8] & 0x7F) << 7
        | (data[9] & 0x7F)
    )
    return 10 + size


def _parse_header(b: bytes, off: int) -> dict | None:
    """Decode the 4-byte frame header at ``off``; None if not a valid
    sync/field combination."""
    if off + 4 > len(b):
        return None
    h = int.from_bytes(b[off : off + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:  # 11-bit sync
        return None
    version_bits = (h >> 19) & 0x3
    layer_bits = (h >> 17) & 0x3
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 0x3
    padding = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    if version_bits == 1 or layer_bits == 0:
        return None  # reserved version / reserved layer
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None  # free-format or bad indices
    version = {0: "2.5", 2: "2", 3: "1"}[version_bits]
    layer = {3: 1, 2: 2, 1: 3}[layer_bits]
    table = _BITRATES_V1 if version == "1" else _BITRATES_V2
    bitrate_kbps = table[layer][bitrate_idx]
    sample_rate = _SAMPLE_RATES[version][rate_idx]
    if layer == 1:
        frame_len = (12 * bitrate_kbps * 1000 // sample_rate + padding) * 4
    else:
        per = 144 if (layer == 2 or version == "1") else 72
        frame_len = per * bitrate_kbps * 1000 // sample_rate + padding
    return {
        "version": version,
        "layer": layer,
        "bitrate_kbps": bitrate_kbps,
        "sample_rate": sample_rate,
        "padding": padding,
        "n_channels": 1 if mode == 3 else 2,
        "frame_len": frame_len,
        "samples": _samples_per_frame(version, layer),
    }


def mp3_parse(data: bytes) -> dict:
    """Walk every frame; raise ValueError when the payload is not MPEG
    audio (so stage error side channels stay accurate).

    Returns ``{n_frames, n_samples, sample_rate, n_channels,
    bitrate_kbps, duration_sec, vbr}`` — ``bitrate_kbps`` is the frame
    mean (== the constant rate for CBR), ``vbr`` True when frames carry
    more than one distinct bitrate."""
    end = len(data)
    if end >= 128 and data[-128:-125] == b"TAG":  # trailing ID3v1
        end -= 128
    off = _id3v2_size(data)
    n_frames = 0
    n_samples = 0
    sample_rate = 0
    n_channels = 0
    bitrate_sum = 0
    rates: set[int] = set()
    while off + 4 <= end:
        hdr = _parse_header(data, off)
        if hdr is None:
            raise ValueError(
                f"invalid MPEG audio frame header at byte {off}"
            )
        n_frames += 1
        n_samples += hdr["samples"]
        sample_rate = hdr["sample_rate"]
        n_channels = hdr["n_channels"]
        bitrate_sum += hdr["bitrate_kbps"]
        rates.add(hdr["bitrate_kbps"])
        off += hdr["frame_len"]
    if n_frames == 0:
        raise ValueError("no MPEG audio frames found")
    return {
        "n_frames": n_frames,
        "n_samples": n_samples,
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bitrate_kbps": bitrate_sum // n_frames,
        "duration_sec": n_samples / sample_rate,
        "vbr": len(rates) > 1,
    }


def sniff_mp3(data: bytes) -> bool:
    """Cheap dispatch test: leading ID3v2 tag or a valid first header."""
    off = _id3v2_size(data)
    return off > 0 or _parse_header(data, 0) is not None


_BITRATE_INDEX_V1L3 = {
    kbps: i for i, kbps in enumerate(_BITRATES_V1[3]) if kbps
}


def mp3_encode_silent(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    stereo: bool = True,
    id3v2_junk: int = 0,
) -> bytes:
    """Structurally valid MPEG1 Layer III CBR stream with zeroed frame
    payloads (headers real, audio meaningless) — the deterministic fixture
    generator for tests and the driver oracle. ``id3v2_junk`` prepends an
    ID3v2 tag of that many payload bytes to exercise the skip path."""
    if bitrate_kbps not in _BITRATE_INDEX_V1L3:
        raise ValueError(f"unsupported MPEG1 L3 bitrate {bitrate_kbps}")
    rate_idx = _SAMPLE_RATES["1"].index(sample_rate)
    bidx = _BITRATE_INDEX_V1L3[bitrate_kbps]
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate  # padding=0
    h = (
        0x7FF << 21
        | 0x3 << 19  # MPEG1
        | 0x1 << 17  # Layer III
        | 0x1 << 16  # no CRC
        | bidx << 12
        | rate_idx << 10
        | 0 << 9  # padding
        | (0x0 if stereo else 0x3) << 6  # mode: stereo / single
    )
    frame = h.to_bytes(4, "big") + b"\x00" * (frame_len - 4)
    out = bytearray()
    if id3v2_junk:
        size = id3v2_junk
        out += b"ID3\x03\x00\x00" + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"\x00" * size
    out += frame * n_frames
    return bytes(out)
