"""MP3 frame-header walk (functions/mp3.py) and AudioDecode dispatch."""
import numpy as np
import pyarrow as pa
import pytest

from fonduer_ray.functions.mp3 import (
    mp3_encode_silent,
    mp3_parse,
    sniff_mp3,
)


def test_cbr_roundtrip_fields():
    data = mp3_encode_silent(7, bitrate_kbps=128, sample_rate=44100)
    m = mp3_parse(data)
    assert m["n_frames"] == 7
    assert m["n_samples"] == 7 * 1152
    assert m["sample_rate"] == 44100
    assert m["n_channels"] == 2
    assert m["bitrate_kbps"] == 128
    assert m["duration_sec"] == pytest.approx(7 * 1152 / 44100)
    assert not m["vbr"]
    # frame length formula: 144 * 128000 / 44100 = 417 (padding 0)
    assert len(data) == 7 * 417


def test_mono_and_other_bitrates():
    for kbps, frame_len in ((96, 313), (112, 365), (160, 522)):
        data = mp3_encode_silent(3, bitrate_kbps=kbps, stereo=False)
        m = mp3_parse(data)
        assert (m["bitrate_kbps"], m["n_channels"]) == (kbps, 1)
        assert len(data) == 3 * frame_len


def test_id3v2_skip_and_id3v1_trailer():
    data = mp3_encode_silent(4, id3v2_junk=57)
    assert data[:3] == b"ID3"
    assert sniff_mp3(data)
    m = mp3_parse(data)
    assert m["n_frames"] == 4
    # trailing ID3v1 tag: fixed 128 bytes starting with 'TAG'
    m2 = mp3_parse(data + b"TAG" + b"\x00" * 125)
    assert m2["n_frames"] == 4


def test_vbr_detected():
    data = mp3_encode_silent(2, bitrate_kbps=96) + mp3_encode_silent(
        2, bitrate_kbps=160
    )
    m = mp3_parse(data)
    assert m["vbr"]
    assert m["n_frames"] == 4
    assert m["bitrate_kbps"] == (96 + 96 + 160 + 160) // 4


def test_garbage_rejected():
    with pytest.raises(ValueError):
        mp3_parse(b"not audio at all")
    with pytest.raises(ValueError):
        # valid first frame then corrupt sync mid-stream
        data = bytearray(mp3_encode_silent(2))
        data[417] = 0x00
        mp3_parse(bytes(data))
    assert not sniff_mp3(b"RIFF....WAVE")


def test_audio_decode_dispatches_wav_and_mp3(ray_session):
    import ray.data

    from fonduer_ray.functions.codecs import wav_encode
    from fonduer_ray.functions.multimodal import decode_audio

    samples = (np.sin(np.linspace(0, 40, 8000)) * 20000).astype(np.int16)
    wav = wav_encode(samples.reshape(-1, 1), 8000)
    mp3 = mp3_encode_silent(5, bitrate_kbps=112, stereo=False)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(["w", "m", "bad"], pa.string()),
                "data": pa.array([wav, mp3, b"junk"], pa.binary()),
            }
        )
    )
    rows = {r["key"]: r for r in decode_audio(ds).take_all()}
    assert rows["w"]["sample_rate"] == 8000
    assert rows["w"]["n_frames"] == 8000
    assert rows["w"]["rms"] > 0
    assert rows["w"]["error"] is None
    assert rows["m"]["sample_rate"] == 44100
    assert rows["m"]["n_frames"] == 5 * 1152
    assert rows["m"]["n_channels"] == 1
    assert rows["m"]["duration_sec"] == pytest.approx(5 * 1152 / 44100)
    assert rows["m"]["error"] is None
    assert rows["bad"]["error"] is not None
