"""Native PDF word extraction + the ported 3-pass HTML<->PDF word linker."""

from fonduer_ray.parser.parse import parse_document
from fonduer_ray.sources.pdf import (
    attach_pdf_bboxes,
    generate_simple_pdf,
    link_word_lists,
    pdf_extract_words,
)


def test_pdf_roundtrip_words_and_boxes():
    pdf = generate_simple_pdf(
        [
            [("Maximum storage temperature", 72, 700, 12)],
            [("150", 100, 650, 10)],
        ],
        page_w=612,
        page_h=792,
    )
    words, coord, dim = pdf_extract_words(pdf)
    assert dim == (612, 792)
    texts = [w for _, w in words]
    assert texts == ["Maximum", "storage", "temperature", "150"]
    # page 1, top-left origin: top = 792 - 700 - 12 = 80
    (pg, top, bottom, left, right) = coord[words[0][0]]
    assert (pg, top, bottom, left) == (1, 80, 92, 72)
    assert right == left + int(0.6 * 12 * len("Maximum"))
    # second page, 1-based page number
    assert coord[words[3][0]][0] == 2


def test_pdf_delimiter_split():
    """The reference splits pdf words on its separator set — a trailing
    period becomes its own pdf word (pdf_visual_parser.py:67-70, 181-192)."""
    pdf = generate_simple_pdf([[("rated.", 10, 700, 12)]])
    words, _, _ = pdf_extract_words(pdf)
    assert [w for _, w in words] == ["rated", "."]


def test_linker_exact_and_fuzzy():
    html = [((0, i), w) for i, w in enumerate(["alpha", "beta", "gamma", "delta"])]
    pdf = [((1, i), w) for i, w in enumerate(["alpha", "befa", "gamma", "delta"])]
    links = link_word_lists(html, pdf, search_max=10)
    # exact words link exactly; the OCR-ish "befa" links to "beta" fuzzily
    assert links[(0, 0)] == (1, 0)
    assert links[(0, 1)] == (1, 1)
    assert links[(0, 2)] == (1, 2)
    assert links[(0, 3)] == (1, 3)


def test_linker_tiny_search_max():
    """search_max < 2 must not divide by zero (radius clamps to 1)."""
    html = [((0, 0), "alpha"), ((0, 1), "beta")]
    pdf = [((1, 0), "alpha"), ((1, 1), "beta")]
    links = link_word_lists(html, pdf, search_max=1)
    assert links[(0, 0)] == (1, 0)
    assert links[(0, 1)] == (1, 1)


def test_linker_prefix_shortcut():
    """Fuzzy pass accepts prefix/suffix containment before edit distance."""
    html = [((0, 0), "anchor"), ((0, 1), "temperatures")]
    pdf = [((1, 0), "anchor"), ((1, 1), "temperature")]
    links = link_word_lists(html, pdf, search_max=6)
    assert links[(0, 1)] == (1, 1)


def test_pdf_visual_parser_directory_contract(tmp_path):
    """Reference API shape: a directory of {doc_name}.pdf files."""
    from fonduer_ray.parser.visual import PdfVisualParser

    pdf = generate_simple_pdf([[("hello world", 50, 700, 12)]])
    (tmp_path / "d9.pdf").write_bytes(pdf)
    p = PdfVisualParser(str(tmp_path))
    assert p.is_parsable("d9") and not p.is_parsable("nope")
    doc = parse_document("d9", b"<html><body><p>hello world</p></body></html>")
    p.parse(doc)
    s = doc["sentences"][0]
    assert s["page"] == [1, 1] and s["left"][0] == 50


def test_render_candidates_pdf_overlay():
    """The visualizer analog: words render at their attached bboxes and
    candidate arg spans get stroked rectangles."""
    from fonduer_ray.sources.pdf import render_candidates_pdf

    html = b"<html><body><p>Maximum temp 150</p></body></html>"
    doc = parse_document("dv", html)
    pdf = generate_simple_pdf([[("Maximum temp 150", 72, 700, 12)]])
    attach_pdf_bboxes(doc, pdf)
    s = doc["sentences"][0]
    cand = {
        "arg_sentence_positions": [s["position"], s["position"]],
        "arg_char_starts": [0, 13],
        "arg_char_ends": [6, 15],
    }
    out = render_candidates_pdf(doc, [cand])
    words, coord, _ = pdf_extract_words(out)
    assert [w for _, w in words] == ["Maximum", "temp", "150"]
    # two stroked rectangles present
    assert out.count(b"re S") == 2
    assert b"1 0 0 RG" in out


def test_attach_pdf_bboxes_end_to_end():
    html = b"<html><body><p>Maximum storage temperature</p><p>rated 150</p></body></html>"
    doc = parse_document("d1", html)
    # PDF words laid out on one page, same text layer
    pdf = generate_simple_pdf(
        [
            [
                ("Maximum storage temperature", 72, 700, 12),
                ("rated 150", 72, 680, 12),
            ]
        ]
    )
    attach_pdf_bboxes(doc, pdf)
    s0 = [s for s in doc["sentences"] if s["words"][:1] == ["Maximum"]][0]
    assert s0["page"] == [1, 1, 1]
    assert s0["top"] == [80, 80, 80]
    assert s0["left"][0] == 72
    # words advance left-to-right
    assert s0["left"][0] < s0["left"][1] < s0["left"][2]
    s1 = [s for s in doc["sentences"] if s["words"][:1] == ["rated"]][0]
    assert s1["top"] == [100, 100]  # 792 - 680 - 12
    assert len(s1["left"]) == 2
