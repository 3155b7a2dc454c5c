"""Property tests: PNG round-trip over arbitrary images; linker identity."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fonduer_ray.functions import codecs
from fonduer_ray.sources.pdf import link_word_lists


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_random(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    out, _mode = codecs.png_decode(codecs.png_encode(img))
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    nh=st.integers(1, 16),
    nw=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_preserves_palette(h, w, nh, nw, seed):
    """Nearest-neighbor resize only ever emits source pixel values."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = codecs.resize_nearest(img, nw, nh)
    assert out.shape == (nh, nw, 3)
    src = {tuple(p) for p in img.reshape(-1, 3)}
    assert all(tuple(p) in src for p in out.reshape(-1, 3))


@settings(max_examples=25, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=1, max_size=40
    )
)
def test_linker_identity_on_equal_lists(words):
    """When PDF words equal HTML words exactly, the linker is the identity
    (the global exact pass matches every multiset occurrence in order)."""
    html = [((0, i), w) for i, w in enumerate(words)]
    pdf = [((1, i), w) for i, w in enumerate(words)]
    links = link_word_lists(html, pdf, search_max=10)
    assert links == {(0, i): (1, i) for i in range(len(words))}


@settings(max_examples=15, deadline=None)
@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=3,
        max_size=30,
    ),
    drop=st.integers(0, 2),
)
def test_linker_total_and_in_range(words, drop):
    """Every html word gets SOME pdf link even when pdf words are missing."""
    html = [((0, i), w) for i, w in enumerate(words)]
    pdf_words = words[: len(words) - drop] if drop < len(words) else words[:1]
    pdf = [((1, i), w) for i, w in enumerate(pdf_words)]
    links = link_word_lists(html, pdf, search_max=8)
    assert set(links) == {(0, i) for i in range(len(words))}
    assert all(v in dict(pdf) or v[1] < len(pdf) for v in links.values())
