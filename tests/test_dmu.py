"""Unit tests for the data_model_utils LF-helper DSL (per-modality, like the
reference tests/utils/data_model_utils/)."""

import pytest

from fonduer_ray.core.spans import Span
from fonduer_ray.functions import dmu
from fonduer_ray.parser.parse import parse_document

HTML = b"""<html><body>
<p>alpha beta gamma delta epsilon.</p>
<p>zeta eta.</p>
<table>
<tr><th>Part</th><th>Min</th><th>Max</th></tr>
<tr><td>AB100</td><td>-40</td><td>125</td></tr>
<tr><td>AB200</td><td>-55</td><td>150</td></tr>
</table>
<p id="last" class="foot note">omega psi.</p>
</body></html>"""


@pytest.fixture(scope="module")
def doc():
    return parse_document("d", HTML)


def span_of(doc, word: str) -> Span:
    for s in doc["sentences"]:
        if word in s["words"]:
            i = s["words"].index(word)
            cs = s["char_offsets"][i]
            return Span(s, cs, cs + len(word) - 1)
    raise KeyError(word)


def test_textual_helpers(doc):
    g = span_of(doc, "gamma")
    assert dmu.get_left_ngrams(g, window=2).__next__() == "alpha"
    assert list(dmu.get_right_ngrams(g, window=2)) == ["delta", "epsilon"]
    a, e = span_of(doc, "alpha"), span_of(doc, "epsilon")
    assert list(dmu.get_between_ngrams((a, e))) == ["beta", "gamma", "delta"]
    assert dmu.same_sentence((a, e))
    z = span_of(doc, "zeta")
    assert not dmu.same_sentence((a, z))
    neigh = set(dmu.get_neighbor_sentence_ngrams(z, doc, d=1))
    assert "omega" not in neigh and "epsilon" in neigh


def test_tabular_helpers(doc):
    p, mn, mx = span_of(doc, "AB100"), span_of(doc, "-40"), span_of(doc, "125")
    assert dmu.same_table((p, mx)) and dmu.same_row((p, mx))
    assert not dmu.same_cell((p, mx))
    p2 = span_of(doc, "AB200")
    assert not dmu.same_row((p, p2)) and dmu.same_col((p, p2))
    assert dmu.is_tabular_aligned((p, p2))
    row = set(dmu.get_row_ngrams(p, doc))
    assert row == {"-40", "125"}
    col = set(dmu.get_col_ngrams(mx, doc))
    assert col == {"max", "150"}
    head = set(dmu.get_head_ngrams(mx, doc, axis="col"))
    assert head == {"max"}
    assert dmu.get_max_row_num(p, doc) == 2
    assert dmu.get_min_row_num(p, doc) == 0
    neigh = set(dmu.get_neighbor_cell_ngrams(span_of(doc, "-40"), doc, dist=1))
    assert neigh == {"ab100", "125", "min", "-55"}
    with_dir = dict(
        (d, g)
        for g, d in dmu.get_neighbor_cell_ngrams(span_of(doc, "-40"), doc, dist=1, directions=True)
    )
    assert with_dir["UP"] == "min" and with_dir["LEFT"] == "ab100"
    # non-tabular span: helpers degrade to empty/None
    a = span_of(doc, "alpha")
    assert not dmu.same_table((a, p))
    assert list(dmu.get_row_ngrams(a, doc)) == []
    assert dmu.get_max_row_num(a, doc) is None


def test_structural_helpers(doc):
    o = span_of(doc, "omega")
    assert dmu.get_tag(o) == "p"
    assert "id=last" in dmu.get_attributes(o)
    assert dmu.get_parent_tag(o) == "body"
    assert dmu.get_ancestor_tag_names(o) == ["html", "body"]
    assert dmu.get_ancestor_class_names(o) == ["foot", "note"]
    assert dmu.get_ancestor_id_names(o) == ["last"]
    a = span_of(doc, "alpha")
    assert dmu.common_ancestor((o, a)) == ["", "html", "body"]
    assert dmu.lowest_common_ancestor_depth((o, a)) == 1


def test_generic_helpers(doc):
    assert dmu.is_superset([1, 2, 3], [2, 3])
    assert dmu.overlap(["a", "b"], ["b", "c"])
    assert not dmu.overlap(["a"], ["b"])
