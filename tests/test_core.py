"""Unit tests for the pure core library: stable IDs, spans, ngrams."""

from fonduer_ray.core.ngrams import MentionNgrams, Ngrams, tokens_to_ngrams
from fonduer_ray.core.spans import ImplicitSpan, Span
from fonduer_ray.core.stable_ids import (
    candidate_stable_id,
    document_stable_id,
    span_stable_id,
)


def make_sentence(text: str, position: int = 0, abs_base: int = 0) -> dict:
    words, offsets = [], []
    i = 0
    for w in text.split(" "):
        if w:
            words.append(w)
            offsets.append(i)
        i += len(w) + 1
    return {
        "doc_name": "d0",
        "position": position,
        "text": text,
        "words": words,
        "char_offsets": offsets,
        "abs_char_offsets": [abs_base + o for o in offsets],
        "ner_tags": ["O"] * len(words),
    }


def test_stable_ids():
    assert document_stable_id("u1") == "u1::document:0:0"
    assert span_stable_id("u1", 3, 9) == "u1::span_mention:3:9"
    assert candidate_stable_id(["a", "b"]) == "a~b"


def test_span_math():
    s = make_sentence("the quick brown fox", abs_base=100)
    sp = Span(s, 4, 14)  # "quick brown"
    assert sp.get_span() == "quick brown"
    assert sp.get_word_start_index() == 1
    assert sp.get_word_end_index() == 2
    assert sp.get_attrib_tokens() == ["quick", "brown"]
    assert sp.abs_char_start == 104 and sp.abs_char_end == 114
    assert sp.get_stable_id() == "d0::span_mention:104:114"
    inner = Span(s, 4, 8)
    assert inner in sp and sp not in inner
    assert sp[0:5].get_span() == "quick"


def test_implicit_span():
    s = make_sentence("parts AB10 to AB12")
    sp = ImplicitSpan(s, 6, 17, "range", 1, "AB11")
    assert sp.get_span() == "AB11"
    assert "implicit_span_mention" in sp.get_stable_id()
    assert sp.get_stable_id().endswith(":range:1")
    rec = sp.to_record("part")
    assert rec["implicit"] and rec["text"] == "AB11"


def test_tokens_to_ngrams():
    out = list(tokens_to_ngrams(["a", "b", "c"], 1, 2))
    assert out == ["a", "a b", "b", "b c", "c"]


def test_ngrams_longest_first_and_dedup():
    s = make_sentence("a b c")
    spans = list(Ngrams(1, 2).apply_sentence(s))
    texts = [sp.get_span() for sp in spans]
    assert texts == ["a b", "b c", "a", "b", "c"]  # reverse-n order


def test_ngrams_split_tokens():
    s = make_sentence("BC546-16 works")
    spans = list(Ngrams(1, 3, split_tokens=["-"]).apply_sentence(s))
    texts = {sp.get_span() for sp in spans}
    assert "BC546" in texts and "16" in texts and "BC546-16" in texts


def test_mention_ngrams_over_doc():
    doc = {"sentences": [make_sentence("a b"), make_sentence("c d", position=1)]}
    texts = [sp.get_span() for sp in MentionNgrams(1, 1).apply(doc)]
    assert texts == ["a", "b", "c", "d"]


def test_mention_figures():
    from fonduer_ray.core.ngrams import FigureMention, MentionFigures

    doc = {
        "doc_name": "d0",
        "sentences": [],
        "figures": [
            {"position": 0, "url": "http://x/img.png"},
            {"position": 1, "url": "http://x/chart.jpg"},
            {"position": 2, "url": None},
        ],
    }
    all_figs = list(MentionFigures().apply(doc))
    assert [f.get_span() for f in all_figs] == [
        "http://x/img.png",
        "http://x/chart.jpg",
        "",
    ]
    assert all_figs[0].get_stable_id() == "d0::figure_mention:0"
    png_only = list(MentionFigures(types=["png"]).apply(doc))
    assert [f.get_span() for f in png_only] == ["http://x/img.png"]
    rec = png_only[0].to_record("fig")
    assert rec["sentence_position"] == -1 and rec["text"] == "http://x/img.png"


def test_node_mention_spaces():
    from fonduer_ray.core.ngrams import MentionCells, MentionParagraphs

    s0 = make_sentence("cell one", position=0)
    s0.update(table_position=0, cell_position=0, paragraph_position=0)
    s1 = make_sentence("cell one more", position=1)
    s1.update(table_position=0, cell_position=0, paragraph_position=1)
    s2 = make_sentence("cell two", position=2)
    s2.update(table_position=0, cell_position=1, paragraph_position=2)
    s3 = make_sentence("free text", position=3)
    s3.update(table_position=None, cell_position=None, paragraph_position=3)
    doc = {
        "doc_name": "d0",
        "sentences": [s0, s1, s2, s3],
        "tables": [{"position": 0}],
        "cells": [
            {"position": 0, "table_position": 0},
            {"position": 1, "table_position": 0},
        ],
        "paragraphs": [{"position": i} for i in range(4)],
        "sections": [{"position": 0}],
        "captions": [],
    }
    cells = list(MentionCells().apply(doc))
    # cell 0 has two sentences -> ImplicitSpan with joined text
    assert [c.get_span() for c in cells] == ["cell one cell one more", "cell two"]
    assert isinstance(cells[0], ImplicitSpan) and not isinstance(cells[1], ImplicitSpan)
    paras = list(MentionParagraphs().apply(doc))
    assert [p.get_span() for p in paras] == [
        "cell one",
        "cell one more",
        "cell two",
        "free text",
    ]


def test_range_expand_space():
    from fonduer_ray.core.ngrams import MentionNgramsRangeExpand

    doc = {"doc_name": "d0", "sentences": [make_sentence("part AB123A/B works")]}
    spans = list(MentionNgramsRangeExpand(1, 1).apply(doc))
    texts = [sp.get_span() for sp in spans]
    assert "AB123A/B" in texts and "AB123A" in texts and "AB123B" in texts
    implicit = [sp for sp in spans if isinstance(sp, ImplicitSpan)]
    assert {sp.get_span() for sp in implicit} == {"AB123A", "AB123B"}
    # implicit stable ids are distinct from the explicit anchor's
    ids = {sp.get_stable_id() for sp in spans}
    assert len(ids) == len(spans)
