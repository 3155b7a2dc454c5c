"""Parity tests against the reference's OWN html fixtures and golden counts.

Inputs are the read-only fixture files under ``/root/reference/tests/data/``;
every expected value is the number the reference's test suite asserts
(``tests/parser/test_parser.py``, cited per test). No Ray needed — the parser
is a pure per-document function.
"""

import os

import pytest

from fonduer_ray.parser.parse import ParserConfig, parse_document

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixtures unavailable"
)


def _parse(name: str, subdir: str = "html_simple", **cfg):
    with open(f"{DATA}/{subdir}/{name}.html", "rb") as f:
        html = f.read()
    return parse_document(name, html.decode("utf-8"), ParserConfig(**cfg))


def test_md_structure():
    """Golden structural counts for md.html (test_parser.py:85-132)."""
    doc = _parse("md", sentencizer="punct")
    assert len(doc["sections"]) == 1
    assert len(doc["paragraphs"]) == 44
    assert len(doc["figures"]) == 1
    assert len(doc["tables"]) == 1
    assert len(doc["cells"]) == 16
    # figure url + stable ordering (test_parser.py:104-108)
    assert doc["figures"][0]["url"] == "http://placebear.com/200/200"
    assert doc["figures"][0]["position"] == 0
    # cell grid coords (test_parser.py:117-129)
    cells = doc["cells"]
    assert (cells[0]["row_start"], cells[0]["col_start"], cells[0]["position"]) == (0, 0, 0)
    assert (cells[10]["row_start"], cells[10]["col_start"], cells[10]["position"]) == (2, 2, 10)


def test_md_sentences_spacy_like():
    """45 sentences incl. standalone "." tails; tail-after-inner ordering
    (#333) and the abs_char_offsets invariant (#332) — test_parser.py:131-152."""
    doc = _parse("md", sentencizer="punct")
    sents = doc["sentences"]
    assert len(sents) == 45
    assert [s["text"] for s in sents[14:18]] == ["italics and later", "bold", ".", "Even"]
    # "Spicy" sits in the table at row 0 / col 2 (test_parser.py:133-138)
    spicy = sents[25]
    assert spicy["text"] == "Spicy"
    assert spicy["table_position"] == 0
    assert (spicy["row_start"], spicy["col_start"]) == (0, 2)
    # abs_char_offsets index into the concatenation of sentence texts
    text = "".join(s["text"] for s in sents)
    for s in sents:
        for off, word in zip(s["abs_char_offsets"], s["words"]):
            assert text[off] == word[0]


def test_md_structural_attrs():
    """Header xpath/html_tag/html_attrs — test_parser.py:158-163."""
    doc = _parse("md", sentencizer="punct")
    header = doc["sentences"][0]
    assert header["xpath"] == "/html/body/h1"
    assert header["html_tag"] == "h1"
    assert header["html_attrs"] == ["id=sample-markdown"]


def test_md_simple_parser_no_delim():
    """SimpleParser(delim="NoDelim") -> one sentence per paragraph = 44
    (test_parser.py:482-523)."""
    doc = _parse("md", sentence_delim="NoDelim")
    assert len(doc["sentences"]) == 44
    header = doc["sentences"][0]
    assert header["xpath"] == "/html/body/h1"
    assert header["html_tag"] == "h1"
    assert header["html_attrs"] == ["id=sample-markdown"]


def test_md_wo_tabular():
    """tabular=False -> no tables/cells, same sections/paragraphs/figures
    (test_parser.py:184-217)."""
    doc = _parse("md", sentencizer="punct", tabular=False)
    assert len(doc["sections"]) == 1
    assert len(doc["paragraphs"]) == 44
    assert len(doc["figures"]) == 1
    assert len(doc["tables"]) == 0
    assert len(doc["cells"]) == 0
    assert len(doc["sentences"]) == 45
    assert all(s["cell_position"] is None for s in doc["sentences"])


def test_md_para_structure():
    """md_para.html: 6 figures (img-in-figure collapse, multi-img
    degradation), figcaption wiring, 46 paragraphs, 51 sentences, 16 cells
    (test_parser.py:396-480)."""
    doc = _parse("md_para", sentencizer="punct")
    figs = doc["figures"]
    assert len(figs) == 6
    assert figs[0]["url"] == "http://placebear.com/200/200"
    assert figs[0]["position"] == 0
    assert figs[2]["url"] == (
        "http://html5doctor.com/wp-content/uploads/2010/03/kookaburra.jpg"
    )
    assert figs[2]["position"] == 2
    assert figs[4]["url"] == (
        "http://html5doctor.com/wp-content/uploads/2010/03/pelican.jpg"
    )
    assert len(doc["tables"]) == 1
    assert len(doc["cells"]) == 16
    cells = doc["cells"]
    assert (cells[0]["row_start"], cells[0]["col_start"], cells[0]["position"]) == (0, 0, 0)
    assert (cells[10]["row_start"], cells[10]["col_start"], cells[10]["position"]) == (2, 2, 10)
    assert len(doc["paragraphs"]) == 46
    sents = doc["sentences"]
    assert len(sents) == 51
    assert sents[1]["text"] == "This is some basic, sample markdown."
    assert sents[2]["text"] == (
        "Unlike the other markdown document, however, "
        "this document actually contains paragraphs of text."
    )
    assert sents[1]["paragraph_position"] == 1
    assert sents[2]["paragraph_position"] == 1
    assert sents[1]["section_position"] == 0
    # caption sentences: "Australian Birds." is the first caption sentence
    # of figure 2 (test_parser.py:425-432)
    cap_sents = [
        s
        for s in sents
        if doc["paragraphs"][s["paragraph_position"]].get("caption_position") is not None
    ]
    assert cap_sents and cap_sents[0]["text"] == "Australian Birds."


def test_table_span():
    """table_span.html parses and yields exactly 1 sentence
    (test_parser.py:536-556)."""
    doc = _parse("table_span", sentencizer="punct")
    assert len(doc["sentences"]) == 1


def test_diseases_structure():
    """diseases.html golden counts + cell/xpath/attr asserts
    (test_parser.py:561-635)."""
    doc = _parse("diseases", sentencizer="punct")
    assert len(doc["captions"]) == 2
    assert len(doc["figures"]) == 0
    assert len(doc["tables"]) == 3
    assert len(doc["cells"]) == 25
    assert len(doc["sentences"]) == 37
    # caption sentence (test_parser.py:593-597)
    cap = doc["sentences"][20]
    assert cap["text"] == "Table 1: Infectious diseases and where to find them."
    assert cap["paragraph_position"] == 18
    assert doc["paragraphs"][18]["caption_position"] == 0
    assert doc["captions"][0]["table_position"] == 0
    # sentence 10 cell coords + structural attrs (test_parser.py:610-622)
    s = doc["sentences"][10]
    assert s["table_position"] == 0
    assert (s["row_start"], s["col_start"], s["cell_position"]) == (2, 1, 4)
    assert s["xpath"] == "/html/body/table[1]/tbody/tr[3]/td[1]/p"
    assert s["html_tag"] == "p"
    assert s["html_attrs"] == ["class=s6", "style=padding-top: 1pt"]


def test_ext_diseases_style_class_merge():
    """<head><style> CSS class blocks merge into the style html_attr
    (test_parser.py:637-680; reference parser.py:522-561)."""
    doc = _parse("ext_diseases", subdir="html_extended", sentencizer="punct")
    sents = doc["sentences"]
    assert set(sents[6]["html_attrs"]) == {
        "class=col-header",
        "hobbies=work:hard;play:harder",
        "type=phenotype",
        "style=background: #f1f1f1; color: aquamarine; font-size: 18px;",
    }
    assert set(sents[9]["html_attrs"]) == {
        "class=row-header",
        "style=background: #f1f1f1;",
    }
    assert set(sents[11]["html_attrs"]) == {"class=cell", "style=text-align: center;"}
    assert len(sents) == 37


def test_radiology_multi_sections():
    """Multi-<section> document: counts + section/paragraph name attributes
    (test_parser.py:702-727)."""
    doc = _parse("radiology", subdir="pure_html", sentencizer="punct")
    assert len(doc["sections"]) == 5
    assert len(doc["paragraphs"]) == 30
    assert len(doc["sentences"]) == 35
    assert len(doc["figures"]) == 2
    assert doc["sections"][0]["name"] is None
    assert doc["sections"][1]["name"] == "label"
    assert doc["sections"][2]["name"] == "content"
    assert doc["sections"][3]["name"] == "image"
    content = [p for p in doc["paragraphs"] if p["section_position"] == 2]
    assert [p["name"] for p in content[:4]] == [
        "COMPARISON",
        "INDICATION",
        "FINDINGS",
        "IMPRESSION",
    ]


def test_various_format_preprocessors(ray_session):
    """Text/TSV/CSV preprocessor parity on the reference's various_format
    fixtures (test_parser.py:730-788): golden doc/section/paragraph/sentence
    counts and the TSV doc name."""
    from fonduer_ray.sources import preprocessors as P

    vf = f"{DATA}/various_format"

    rows = P.pages_from_text_files(f"{vf}/text_format.txt").take_all()
    assert len(rows) == 1 and rows[0]["url"] == "text_format"
    d = parse_document(rows[0]["url"], rows[0]["html"], ParserConfig(sentencizer="punct"))
    assert (len(d["sections"]), len(d["paragraphs"]), len(d["sentences"])) == (1, 1, 57)

    rows = P.pages_from_tsv(f"{vf}/tsv_format.tsv", header=True).take_all()
    assert len(rows) == 2
    assert rows[0]["url"] == "9b28e780-ba48-4a53-8682-7c58c141a1b6"
    d = parse_document(rows[0]["url"], rows[0]["html"], ParserConfig(sentencizer="punct"))
    assert (len(d["sections"]), len(d["paragraphs"]), len(d["sentences"])) == (1, 1, 33)

    rows = P.pages_from_csv(f"{vf}/csv_format.csv").take_all()
    assert len(rows) == 10
    d = parse_document(rows[0]["url"], rows[0]["html"], ParserConfig(sentencizer="punct"))
    assert (len(d["sections"]), len(d["paragraphs"]), len(d["sentences"])) == (12, 10, 17)


def test_hocr_visual_parity():
    """hOCR preprocessor + visual alignment on the reference's hOCR fixtures
    (test_parser.py:906-931): the golden left-coordinate array (with its
    one-hOCR-token-to-many-words shared bbox) and the double-space collapse."""
    from fonduer_ray.parser.visual import attach_word_bboxes
    from fonduer_ray.sources.preprocessors import hocr_to_html

    hocr = open(f"{DATA}/hocr_simple/md.hocr").read()
    d = parse_document("md", hocr_to_html(hocr), ParserConfig(sentencizer="punct"))
    d = attach_word_bboxes(d)
    # every sentence aligned
    assert all(len(s["left"]) == len(s["words"]) for s in d["sentences"])
    assert all(p == 1 for s in d["sentences"] for p in s["page"])
    # the reference's golden array for its sentence 12 ("A link to somewhere.")
    # — note 418 repeated: "somewhere" and "." share one hOCR token's bbox
    golden = [s for s in d["sentences"] if s["left"] == [372, 384, 405, 418, 418]]
    assert golden and golden[0]["words"] == ["A", "link", "to", "somewhere", "."]

    hocr121 = open(f"{DATA}/hocr_simple/121.hocr").read()
    d2 = parse_document("121", hocr_to_html(hocr121), ParserConfig(sentencizer="punct"))
    # double spaces collapse to single (test_parser.py:926-931)
    assert d2["sentences"][0]["words"][:3] == ["This", "Consumer", "Credit"]

    # hOCR with tables parses and aligns fully (test_parser.py:965-977)
    h3 = open(f"{DATA}/hocr_simple/1st.hocr").read()
    d3 = parse_document("1st", hocr_to_html(h3), ParserConfig(sentencizer="punct"))
    d3 = attach_word_bboxes(d3)
    assert len(d3["tables"]) == 1
    assert all(len(s["left"]) == len(s["words"]) for s in d3["sentences"])
