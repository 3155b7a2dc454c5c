"""Tests for alternate sources (text/TSV/CSV/hOCR), the hOCR visual parser,
and the multimodal stub stages."""

import pyarrow as pa
import pytest

import ray.data as rd

from fonduer_ray.core.spans import Span
from fonduer_ray.functions import multimodal
from fonduer_ray.parser.parse import parse_document
from fonduer_ray.parser.visual import (
    attach_word_bboxes,
    bbox_from_sentence,
    get_page,
    is_horz_aligned,
    is_vert_aligned,
    same_page,
)
from fonduer_ray.sources.preprocessors import (
    hocr_to_html,
    pages_from_csv,
    pages_from_text,
    pages_from_tsv,
)
from fonduer_ray.stages.parse_stage import parse_webpages

HOCR = """<html><body>
<div class="ocr_page" title="image x; bbox 0 0 1000 1400; ppageno 2">
<p class="ocr_par">
<span class="ocr_line" title="bbox 10 20 400 40">
<span class="ocrx_word" title="bbox 10 20 60 40">Alpha</span>
<span class="ocrx_word" title="bbox 70 20 120 40">beta.</span>
</span>
<span class="ocr_line" title="bbox 10 50 400 70">
<span class="ocrx_word" title="bbox 10 50 80 70">Gamma</span>
</span>
</p>
</div>
</body></html>"""


def test_pages_from_text(ray_session):
    ds = rd.from_items([{"name": "a", "body": "hello world."}])
    pages = pages_from_text(ds, "name", "body")
    docs = parse_webpages(pages).take_all()
    assert len(docs) == 1
    assert docs[0]["sentences"][0]["words"] == ["hello", "world"]


def test_pages_from_tsv(ray_session, tmp_path):
    p = tmp_path / "docs.tsv"
    p.write_text("doc1\tfirst text.\ndoc2\tsecond text.\n")
    docs = parse_webpages(pages_from_tsv(str(p))).take_all()
    assert {d["doc_name"] for d in docs} == {"doc1", "doc2"}


def test_pages_from_csv(ray_session, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("name,intro,specs\nd1,hello there.,max 125 C.\n")
    rule = {"specs": lambda v: f"<p class=\"spec\">{v}</p>"}
    docs = parse_webpages(pages_from_csv(str(p), "name", parser_rules=rule)).take_all()
    d = docs[0]
    assert len(d["sections"]) == 3  # html + 2 column sections
    spec_sents = [s for s in d["sentences"] if "125" in s["text"]]
    assert spec_sents and "class=spec" in spec_sents[0]["html_attrs"]


def test_hocr_visual_path():
    html = hocr_to_html(HOCR)
    doc = parse_document("h", html.encode())
    attach_word_bboxes(doc)
    s0 = doc["sentences"][0]
    assert s0["words"] == ["Alpha", "beta"]
    assert s0["page"] == [3, 3]  # ppageno 2 -> 1-based page 3
    assert s0["left"] == [10, 70]
    assert s0["bottom"] == [40, 40]
    # bbox attrs stripped after linking
    assert not any(a.startswith("tokens=") for a in s0["html_attrs"])
    # second line on its own xpath
    s1 = [s for s in doc["sentences"] if s["words"] == ["Gamma"]][0]
    assert s1["left"] == [10] and s1["top"] == [50]


def test_hocr_multi_sentence_line_keeps_bboxes():
    """An hOCR line holding two sentences: the delimiter '.' the sentencizer
    drops must not strand the char cursor — later sentences on the same line
    keep their word bboxes (ADVICE r1, parser/visual.py cursor skip)."""
    hocr = """<html><body>
<div class="ocr_page" title="image x; bbox 0 0 1000 1400; ppageno 0">
<p class="ocr_par">
<span class="ocr_line" title="bbox 10 20 400 40">
<span class="ocrx_word" title="bbox 10 20 60 40">Alpha</span>
<span class="ocrx_word" title="bbox 70 20 120 40">beta.</span>
<span class="ocrx_word" title="bbox 130 20 190 40">Gamma</span>
<span class="ocrx_word" title="bbox 200 20 260 40">delta.</span>
</span>
</p>
</div>
</body></html>"""
    doc = parse_document("h2", hocr_to_html(hocr).encode())
    attach_word_bboxes(doc)
    by_words = {tuple(s["words"]): s for s in doc["sentences"]}
    s0 = by_words[("Alpha", "beta")]
    s1 = by_words[("Gamma", "delta")]
    assert s0["left"] == [10, 70]
    assert s1["left"] == [130, 200]
    assert s1["page"] == [1, 1]


def test_visual_bbox_predicates():
    html = hocr_to_html(HOCR)
    doc = parse_document("h", html.encode())
    attach_word_bboxes(doc)
    s0, s1 = doc["sentences"][0], doc["sentences"][1]
    a = Span(s0, 0, 4)  # Alpha
    g = Span(s1, 0, 4)  # Gamma
    assert bbox_from_sentence(s0) == (3, 20, 10, 40, 120)
    assert same_page((a, g))
    assert get_page(a) == 3
    assert not is_horz_aligned((a, g))
    assert is_vert_aligned((a, g))


def test_multimodal_stubs(ray_session):
    ds = rd.from_items(
        [{"key": "img1", "data": b"abc"}, {"key": "img2", "data": b"defg"}]
    )
    meta = multimodal.decode_images(ds, fake=True).take_all()
    assert {m["key"] for m in meta} == {"img1", "img2"}
    assert all(64 <= m["width"] <= 255 for m in meta)
    resized = multimodal.resize_images(ds, 32, 32, fake=True).take_all()
    assert all(r["width"] == 32 and isinstance(r["data"], bytes) for r in resized)
    emb = multimodal.embed_images(ds, dim=8, fake=True).take_all()
    assert all(len(e["embedding"]) == 8 for e in emb)
    frames = multimodal.sample_frames(ds, fake=True).take_all()
    assert len(frames) == 8  # 2 videos x 4 frames
    # image decode and MJPEG-AVI frame sampling are REAL now (see
    # tests/test_codecs.py / test_avi.py); a non-AVI payload routes to the
    # per-row error side channel instead of raising
    real = multimodal.sample_frames(ds, fake=False).take_all()
    assert len(real) == 2
    assert all(r["error"] and r["frame_idx"] == -1 for r in real)


def test_multimodal_determinism(ray_session):
    ds = rd.from_items([{"key": "k", "data": b"payload"}])
    a = multimodal.embed_images(ds, dim=4, fake=True).take_all()
    b = multimodal.embed_images(ds, dim=4, fake=True).take_all()
    assert a[0]["embedding"] == b[0]["embedding"]


def test_visual_alignment_helpers():
    from fonduer_ray.core.spans import Span
    from fonduer_ray.parser import visual as V

    def vsent(pos, top, left, bottom, right, words=("w",)):
        n = len(words)
        return {
            "doc_name": "d",
            "position": pos,
            "text": " ".join(words),
            "words": list(words),
            "char_offsets": [0] * n,
            "abs_char_offsets": [0] * n,
            "lemmas": [w.upper() for w in words],
            "page": [1] * n,
            "top": [top] * n,
            "left": [left] * n,
            "bottom": [bottom] * n,
            "right": [right] * n,
        }

    s0 = vsent(0, 100, 50, 110, 80, ("alpha",))
    s1 = vsent(1, 100, 200, 110, 240, ("beta",))   # same row as s0
    s2 = vsent(2, 300, 50, 310, 80, ("gamma",))    # same column as s0
    doc = {"doc_name": "d", "sentences": [s0, s1, s2]}
    sp = Span(s0, 0, len(s0["text"]) - 1)
    sp1 = Span(s1, 0, len(s1["text"]) - 1)
    sp2 = Span(s2, 0, len(s2["text"]) - 1)
    assert V.is_horz_aligned([sp, sp1]) and not V.is_horz_aligned([sp, sp2])
    assert V.is_vert_aligned_left([sp, sp2]) and not V.is_vert_aligned_left([sp, sp1])
    assert V.is_vert_aligned_center([sp, sp2])
    assert list(V.get_horz_ngrams(sp, doc)) == ["beta"]
    assert list(V.get_vert_ngrams(sp, doc)) == ["gamma"]
    assert set(V.get_visual_aligned_lemmas(sp, doc)) == {"beta", "gamma"}
    assert 0 < V.get_page_vert_percentile(sp, doc) < 1


def test_direction_ngrams_use_span_bbox():
    """Alignment compares against the SPAN's word-range bbox, not the whole
    sentence bbox (reference _get_direction_ngrams, visual.py:219-257), and
    from_sentence=False yields word-level aligned ngrams."""
    from fonduer_ray.core.spans import Span
    from fonduer_ray.parser import visual as V

    def vsent(pos, words, lefts, rights, top, bottom):
        offs, i = [], 0
        for w in words:
            offs.append(i)
            i += len(w) + 1
        n = len(words)
        return {
            "doc_name": "d",
            "position": pos,
            "text": " ".join(words),
            "words": list(words),
            "char_offsets": offs,
            "abs_char_offsets": offs,
            "lemmas": [w.upper() for w in words],
            "page": [1] * n,
            "top": [top] * n,
            "left": lefts,
            "bottom": [bottom] * n,
            "right": rights,
        }

    # s0: "aa" at x[0,50], "bb" at x[500,560]; s1: "cc" under bb only
    s0 = vsent(0, ["aa", "bb"], [0, 500], [50, 560], 10, 20)
    s1 = vsent(1, ["cc"], [500], [560], 100, 110)
    doc = {"doc_name": "d", "sentences": [s0, s1]}
    span_aa = Span(s0, 0, 1)
    span_bb = Span(s0, 3, 4)
    assert V.span_bbox(span_aa) == (1, 10, 0, 20, 50)
    # vert alignment must use the span's word bbox: aa is NOT above cc
    assert list(V.get_vert_ngrams(span_aa, doc)) == []
    assert list(V.get_vert_ngrams(span_bb, doc)) == ["cc"]
    # from_sentence=False: word-level ngrams aligned with the span, own
    # sentence included, the span itself excluded
    assert list(V.get_vert_ngrams(span_bb, doc, from_sentence=False)) == ["cc"]
    assert list(V.get_horz_ngrams(span_aa, doc, from_sentence=False)) == ["bb"]


def test_lambda_figure_matcher():
    from fonduer_ray.core.matchers import LambdaFunctionFigureMatcher
    from fonduer_ray.core.ngrams import MentionFigures

    doc = {
        "doc_name": "d0",
        "sentences": [],
        "figures": [
            {"position": 0, "url": "http://x/a.png"},
            {"position": 1, "url": "http://x/b.jpg"},
        ],
    }
    m = LambdaFunctionFigureMatcher(
        func=lambda f: f.get_span().endswith(".png")
    )
    out = list(m.apply(MentionFigures().apply(doc)))
    assert [f.get_span() for f in out] == ["http://x/a.png"]


def test_visual_feature_family():
    from fonduer_ray.core.spans import Span
    from fonduer_ray.stages.feature_stage import visual_features

    def vsent(pos, top, left, words):
        n = len(words)
        offs = []
        i = 0
        for w in words:
            offs.append(i)
            i += len(w) + 1
        return {
            "doc_name": "d",
            "position": pos,
            "text": " ".join(words),
            "words": list(words),
            "char_offsets": offs,
            "abs_char_offsets": offs,
            "lemmas": [w.upper() for w in words],
            "page": [1] * n,
            "top": [top] * n,
            "left": [left] * n,
            "bottom": [top + 10] * n,
            "right": [left + 30] * n,
        }

    s0 = vsent(0, 100, 50, ("alpha",))
    s1 = vsent(1, 100, 200, ("beta",))
    doc = {"doc_name": "d", "sentences": [s0, s1]}
    spans = [Span(s0, 0, 4), Span(s1, 0, 3)]
    feats = visual_features(spans, doc)
    assert "SAME_PAGE" in feats and "HORZ_ALIGNED" in feats
    assert "e0_PAGE_[1]" in feats and "e0_ALIGNED_[beta]" in feats
    # sentences without bboxes -> no visual features, no crash
    bare = {
        "doc_name": "d",
        "position": 2,
        "text": "x",
        "words": ["x"],
        "char_offsets": [0],
        "abs_char_offsets": [0],
        "page": [],
        "top": [],
        "left": [],
        "bottom": [],
        "right": [],
    }
    assert visual_features([Span(bare, 0, 0)], {"doc_name": "d", "sentences": [bare]}) == []
