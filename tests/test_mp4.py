"""MP4 / ISO-BMFF box walk (functions/mp4.py) and the fixture stage."""
import struct

import pyarrow as pa
import pytest

from fonduer_ray.functions.mp4 import (
    _box,
    mp4_encode_stub,
    mp4_parse,
    sniff_mp4,
)


def test_two_track_roundtrip_fields():
    data = mp4_encode_stub(
        duration_ts=3000,
        timescale=1000,
        width=336,
        height=264,
        n_video_samples=90,
        with_audio=True,
    )
    assert sniff_mp4(data)
    m = mp4_parse(data)
    assert m["brand"] == "isom"
    assert (m["timescale"], m["duration_ts"]) == (1000, 3000)
    assert m["duration_sec"] == pytest.approx(3.0)
    assert m["n_tracks"] == 2
    video, audio = m["tracks"]
    assert video["handler"] == "vide"
    assert (video["width"], video["height"]) == (336, 264)
    assert video["codec"] == "avc1"
    assert video["n_samples"] == 90
    assert audio["handler"] == "soun"
    assert audio["codec"] == "mp4a"
    assert audio["timescale"] == 44100
    # audio media duration rescaled to its own timescale
    assert audio["duration_ts"] == 3000 * 44100 // 1000


def test_video_only_and_codec_override():
    data = mp4_encode_stub(
        duration_ts=2000, with_audio=False, video_codec=b"hvc1"
    )
    m = mp4_parse(data)
    assert m["n_tracks"] == 1
    assert m["tracks"][0]["codec"] == "hvc1"


def test_largesize_and_size_zero_boxes():
    """A 64-bit largesize box and a size==0 run-to-end box both walk."""
    base = mp4_encode_stub(duration_ts=1000, with_audio=False)
    # rewrite the trailing mdat as a largesize box
    mdat_payload = b"\x00" * 32
    large = (
        struct.pack(">I", 1)
        + b"mdat"
        + struct.pack(">Q", 16 + len(mdat_payload))
        + mdat_payload
    )
    body = base[: len(base) - (8 + 32)] + large
    assert mp4_parse(body)["n_tracks"] == 1
    # size==0: final box extends to EOF
    zero = struct.pack(">I", 0) + b"mdat" + mdat_payload
    assert mp4_parse(base[: len(base) - (8 + 32)] + zero)["n_tracks"] == 1


def test_truncation_raises_valueerror():
    data = mp4_encode_stub(duration_ts=1000)
    for cut in (3, 10, len(data) // 2):
        with pytest.raises(ValueError):
            mp4_parse(data[:cut])
    with pytest.raises(ValueError):
        mp4_parse(b"")
    # structurally fine boxes but no ftyp/moov
    with pytest.raises(ValueError):
        mp4_parse(_box(b"free", b"\x00" * 4))
    # inner size larger than its enclosure
    bad = _box(b"moov", struct.pack(">I", 999) + b"mvhd")
    with pytest.raises(ValueError):
        mp4_parse(_box(b"ftyp", b"isom" + b"\x00" * 8) + bad)


def test_sniff_rejects_non_mp4():
    assert not sniff_mp4(b"")
    assert not sniff_mp4(b"RIFF\x00\x00\x00\x00AVI ")
    assert not sniff_mp4(b"\xff\xfb\x90\x00" * 4)


def test_fixture_stage_closed_form(ray_session):
    """The docops fixture stage produces exactly the closed-form values
    the DuckDB oracle predicts from doc_id."""
    import ray.data

    from fonduer_ray.pipelines.docops import _Mp4StatsStage

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4, 5, 11], pa.int64())})
    out = _Mp4StatsStage()(t)
    for r in out.to_pylist():
        i = r["doc_id"]
        assert r["n_tracks"] == (1 if i % 3 == 0 else 2)
        assert r["timescale"] == 1000
        assert r["duration_ms"] == 1000 * (2 + i % 5)
        assert r["width"] == 320 + (i % 4) * 16
        assert r["height"] == 240 + (i % 3) * 16
        assert r["video_codec"] == "avc1"
        assert r["audio_codec"] == ("" if i % 3 == 0 else "mp4a")
        assert r["n_video_samples"] == 30 * (2 + i % 5)
