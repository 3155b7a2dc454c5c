"""Golden-count and golden-value parser tests on fixed synthetic HTML
(modeled on fonduer tests/parser/test_parser.py)."""

from fonduer_ray.parser.htmltree import flatten_tags, parse_html, serialize
from fonduer_ray.parser.lingual import HeuristicLinguist, SimpleSentencizer
from fonduer_ray.parser.parse import ParserConfig, parse_document

PAGE = """<html><head><title>T</title><style>p {color: red}</style></head><body>
<h1>Widget Catalog.</h1>
<p>The AB100 widget runs. It uses 5 volts.</p>
<p>See <span>inline</span> note.</p>
<table>
<caption>Spec table.</caption>
<tr><th>Part</th><th colspan="2">Limits</th></tr>
<tr><td>AB100</td><td>-40</td><td rowspan="2">125</td></tr>
<tr><td>AB200</td><td>-55</td></tr>
</table>
<figure><img src="a.png"/><figcaption>Fig one.</figcaption></figure>
<img src="b.png"/>
<script>var x = 1;</script>
<p>Last—paragraph.</p>
</body></html>""".encode()


def parsed():
    return parse_document("page1", PAGE)


def test_counts():
    d = parsed()
    assert len(d["sections"]) == 1
    assert len(d["tables"]) == 1
    assert len(d["cells"]) == 7
    assert len(d["figures"]) == 2
    assert len(d["captions"]) == 2
    # paragraphs: title, h1, p(2 sents), p(flattened), caption, 7 cells,
    # figcaption, last p = 14
    assert len(d["paragraphs"]) == 14
    assert len(d["sentences"]) == 15


def test_text_invariant_round_trip():
    """document.text = deterministic serialization of the stripped tree;
    re-parsing our own serialization is a fixed point (byte-identical)."""
    d = parsed()
    text = d["text"]
    assert "<span>" not in text and "flatten" not in text  # span flattened away
    assert "<style>" in text  # blacklisted tags stay in text, skipped in walk
    d2 = parse_document("page1", text.encode())
    assert d2["text"] == text


def test_cell_grid():
    d = parsed()
    cells = d["cells"]
    # header: Part at (0,0), Limits colspan 2 at (0,1..2)
    assert (cells[0]["row_start"], cells[0]["col_start"], cells[0]["col_end"]) == (0, 0, 0)
    assert (cells[1]["col_start"], cells[1]["col_end"]) == (1, 2)
    # rowspan cell 125 occupies rows 1-2 col 2; AB200 row gets cols 0,1
    c125 = [c for c in cells if c["row_start"] == 1 and c["col_start"] == 2][0]
    assert c125["row_end"] == 2
    last_row = [c for c in cells if c["row_start"] == 2]
    assert sorted(c["col_start"] for c in last_row) == [0, 1]


def test_sentence_fields():
    d = parsed()
    s = [x for x in d["sentences"] if x["text"].startswith("The AB100")][0]
    assert s["words"][1] == "AB100"
    assert s["xpath"] == "/html/body/p[1]"
    assert s["html_tag"] == "p"
    # char offsets line up with text
    for w, o in zip(s["words"], s["char_offsets"]):
        assert s["text"][o : o + len(w)] == w
    # unicode dash replaced
    last = d["sentences"][-1]
    assert "Last-paragraph" in last["text"]
    # tabular sentence carries grid coords
    cell_sent = [x for x in d["sentences"] if x["text"] == "AB200"][0]
    assert cell_sent["row_start"] == 2 and cell_sent["col_start"] == 0
    assert cell_sent["table_position"] == 0


def test_stable_ids_deterministic():
    a, b = parsed(), parsed()
    assert [s["stable_id"] for s in a["sentences"]] == [
        s["stable_id"] for s in b["sentences"]
    ]
    assert len({s["stable_id"] for s in a["sentences"]}) == len(a["sentences"])


def test_figure_handling():
    d = parsed()
    urls = sorted(f["url"] for f in d["figures"])
    assert urls == ["a.png", "b.png"]
    cap = d["captions"][1]
    assert cap["figure_position"] == 0 and cap["table_position"] is None


def test_multi_img_figure_degrades():
    html = b'<html><body><figure><img src="1.png"/><img src="2.png"/><figcaption>x</figcaption></figure></body></html>'
    d = parse_document("m", html)
    assert len(d["figures"]) == 2
    assert len(d["captions"]) == 0


def test_nested_table():
    html = (
        b"<html><body><table><tr><td>outer"
        b"<table><tr><td>inner</td></tr></table>"
        b"</td></tr></table></body></html>"
    )
    d = parse_document("n", html)
    assert len(d["tables"]) == 2
    inner_sent = [s for s in d["sentences"] if s["text"] == "inner"][0]
    assert inner_sent["table_position"] == 1
    assert d["tables"][1]["parent_cell"] == 0


def test_empty_and_faulty():
    assert parse_document("e", b"") is None
    d = parse_document("s", b"<html><body><script>x</script></body></html>")
    assert d["sentences"] == []
    # malformed nesting tolerated
    d2 = parse_document("m", b"<html><body><p>a<p>b</body></html>")
    assert len(d2["sentences"]) == 2


def test_sentencizer_offsets():
    sents = list(SimpleSentencizer().split_sentences("Hello world. Bye now."))
    assert [s["text"] for s in sents] == ["Hello world", "Bye now"]
    assert sents[1]["start"] == 13
    assert sents[1]["char_offsets"] == [0, 4]


def test_heuristic_linguist():
    lg = HeuristicLinguist()
    s = {"words": ["Alice", "met", "Bob", "in", "March", "2020", "runs"]}
    lg.enrich(s)
    assert s["pos_tags"][0] == "NNP"
    assert s["pos_tags"][3] == "IN"
    assert s["ner_tags"][4] == "DATE" and s["ner_tags"][5] == "DATE"
    assert s["ner_tags"][2] == "PERSON"  # capitalized, not sentence-initial
    assert s["lemmas"][6] == "run"
    assert s["dep_parents"][0] == 0 and s["dep_labels"][0] == "ROOT"


def test_flatten_tags_semantics():
    t = parse_html(b"<html><body><p>a<span>b<i>c</i>d</span>e</p></body></html>")
    flatten_tags(t, {"span"})
    assert serialize(t) == "<html><body><p>ab<i>c</i>de</p></body></html>"
