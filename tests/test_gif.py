"""GIF codec (functions/gif.py): real LZW, container walk, dispatch."""
import numpy as np
import pytest

from fonduer_ray.functions.gif import (
    gif_decode,
    gif_decode_frame,
    gif_encode,
    gif_parse,
    sniff_gif,
)

#: 1x1 white GIF as produced by reference tooling — decodes the spec's
#: canonical minimal stream (clear, index 0, EOI packed into 0x44 0x01)
REF_1X1 = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
    b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
)


def test_reference_fixture_decodes():
    assert sniff_gif(REF_1X1)
    img, mode = gif_decode(REF_1X1)
    assert mode == "RGB"
    assert img.shape == (1, 1, 3)
    assert (img == 255).all()


def test_random_roundtrips():
    rng = np.random.RandomState(11)
    for _ in range(6):
        h, w = rng.randint(2, 48), rng.randint(2, 48)
        pal = rng.randint(0, 256, (rng.randint(2, 30), 3), dtype=np.uint8)
        img = pal[rng.randint(0, len(pal), (h, w))]
        back, _ = gif_decode(gif_encode([img]))
        assert (back == img).all()


def test_width_growth_and_12bit_clear_roundtrip():
    """Enough distinct pixel runs to grow the code width to 12 bits and
    force mid-stream CLEAR emissions."""
    rng = np.random.RandomState(3)
    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    img = pal[rng.randint(0, 256, (180, 260))]
    data = gif_encode([img])
    back, _ = gif_decode(data)
    assert (back == img).all()


def test_animation_frames():
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (8, 3), dtype=np.uint8)
    frames = [pal[rng.randint(0, 8, (10, 14))] for _ in range(4)]
    data = gif_encode(frames)
    meta = gif_parse(data)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (14, 10, 4)
    for i, f in enumerate(frames):
        assert (gif_decode_frame(meta, i) == f).all()


def test_rejections():
    with pytest.raises(ValueError):
        gif_parse(b"NOTAGIF")
    rng = np.random.RandomState(1)
    too_many = rng.randint(0, 256, (17, 17, 3), dtype=np.uint8)
    # 17*17 = 289 likely-distinct random colors > 256
    if len(np.unique(too_many.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="256"):
            gif_encode([too_many])


def test_image_decode_dispatches_gif():
    from fonduer_ray.functions.codecs import image_decode, sniff_format

    pal = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    img = pal[np.array([[0, 1], [1, 0]])]
    data = gif_encode([img])
    assert sniff_format(data) == "gif"
    back, mode = image_decode(data)
    assert mode == "RGB"
    assert (back == img).all()


def test_gif_parse_truncated_raises_valueerror():
    # truncation anywhere in the stream must surface as the documented
    # ValueError contract (image_decode's error side channel), never as
    # an IndexError from an unguarded data[pos]
    pal = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    img = pal[np.array([[0, 1], [1, 0]])]
    data = gif_encode([img, img])  # 2 frames -> includes a NETSCAPE ext
    from fonduer_ray.functions.gif import gif_parse

    for cut in range(14, len(data)):
        truncated = data[:cut]
        try:
            gif_parse(truncated)
        except ValueError:
            pass  # the contract
