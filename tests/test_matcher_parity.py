"""Matcher-algebra parity: the reference's own matcher unit tests
(``tests/candidates/test_matchers.py``) ported onto our engine — same
sentence ("This is apple"), same spaces, same expected span sets."""

import pytest

from fonduer_ray.core.matchers import (
    Concat,
    DictionaryMatch,
    Inverse,
    Intersect,
    LambdaFunctionMatcher,
    RegexMatchEach,
    RegexMatchSpan,
    Union,
)
from fonduer_ray.core.ngrams import MentionNgrams

DATA = "/root/reference/tests/data"


def make_doc(text: str = "This is apple") -> dict:
    words, offsets = [], []
    i = 0
    for w in text.split(" "):
        words.append(w)
        offsets.append(i)
        i += len(w) + 1
    return {
        "doc_name": "test",
        "sentences": [
            {
                "doc_name": "test",
                "position": 0,
                "text": text,
                "words": words,
                "char_offsets": offsets,
                "abs_char_offsets": offsets,
                "ner_tags": ["O"] * len(words),
            }
        ],
    }


def spans(doc, n_min=1, n_max=2):
    return MentionNgrams(n_min=n_min, n_max=n_max).apply(doc)


def texts(matcher, doc, n_min=1, n_max=2):
    return {tc.get_span() for tc in matcher.apply(spans(doc, n_min, n_max))}


def test_union_parity():
    """Reference test_matchers.py:42-90."""
    doc = make_doc()
    assert {tc.get_span() for tc in spans(doc)} == {
        "This is", "is apple", "This", "is", "apple",
    }
    m0 = RegexMatchSpan(rgx=r"apple", search=True, full_match=True, longest_match_only=False)
    assert texts(m0, doc) == {"is apple", "apple"}
    m1 = RegexMatchSpan(rgx=r"this", search=False, full_match=False, longest_match_only=False)
    assert texts(m1, doc) == {"This is", "This"}
    assert texts(Union(m0, m1, longest_match_only=False), doc) == {
        "is apple", "apple", "This is", "This",
    }
    # longest_match_only of the PARENT overrides the children's
    assert texts(Union(m0, m1, longest_match_only=True), doc) == {"This is", "is apple"}
    with pytest.raises(Exception):
        Union(m0, m1, long_match_only=False)


def test_intersect_parity():
    """Reference test_matchers.py:93-137."""
    doc = make_doc()
    m0 = RegexMatchSpan(rgx=r"apple", search=True, full_match=True, longest_match_only=False)
    assert texts(m0, doc, 1, 3) == {"This is apple", "is apple", "apple"}
    m1 = RegexMatchSpan(rgx=r"this", search=False, full_match=False, longest_match_only=False)
    assert texts(m1, doc, 1, 3) == {"This is apple", "This is", "This"}
    assert texts(Intersect(m0, m1, longest_match_only=False), doc, 1, 3) == {
        "This is apple"
    }
    assert texts(Intersect(m0, m0, longest_match_only=False), doc, 1, 3) == {
        "This is apple", "is apple", "apple",
    }
    assert texts(Intersect(m0, m0, longest_match_only=True), doc, 1, 3) == {
        "This is apple"
    }


def test_inverse_parity():
    """Reference test_matchers.py:140-198."""
    doc = make_doc()
    m0 = RegexMatchSpan(rgx=r"apple", search=True, full_match=True, longest_match_only=False)
    assert texts(Inverse(m0, longest_match_only=False), doc) == {"This is", "This", "is"}
    assert texts(Inverse(m0, longest_match_only=True), doc) == {"This is"}
    m0 = RegexMatchSpan(rgx=r"apple", search=True, full_match=True, longest_match_only=True)
    # child's longest_match_only is ignored by the Inverse parent
    assert texts(Inverse(m0, longest_match_only=False), doc) == {"This is", "This", "is"}
    assert texts(Inverse(m0, longest_match_only=True), doc) == {"This is"}
    with pytest.raises(ValueError):
        Inverse()
    with pytest.raises(ValueError):
        Inverse(m0, m0)


def test_concat_parity():
    """Reference test_matchers.py:201-244."""
    doc = make_doc()
    m0 = RegexMatchSpan(rgx=r"this", search=False, full_match=False, longest_match_only=False)
    m1 = RegexMatchSpan(rgx=r"is", search=False, full_match=False, longest_match_only=False)
    assert texts(Concat(m0, m1), doc) == {"This is"}
    with pytest.raises(ValueError):
        list(Concat(m0, m1).apply(make_doc()["sentences"][0]["words"]))
    with pytest.raises(ValueError):
        list(Concat(m0).apply(spans(doc)))
    assert texts(Concat(m0, m1, left_required=False), doc) == {"This is", "is apple"}
    assert texts(Concat(m0, m1, right_required=False), doc) == {"This is"}
    assert texts(Concat(m1, m0, permutations=False), doc) == set()
    assert texts(Concat(m1, m0, permutations=True), doc) == {"This is"}


def test_dictionary_match_parity():
    """Reference test_matchers.py:247-283."""
    doc = make_doc()
    assert texts(DictionaryMatch(d=["this"]), doc, 1, 1) == {"This"}
    with pytest.raises(Exception):
        DictionaryMatch()
    # identity "stemmer" exercising the stemmer path
    assert texts(DictionaryMatch(d=["is"], stemmer=lambda w: w), doc, 1, 1) == {"is"}
    with pytest.raises(ValueError):
        list(DictionaryMatch(d=["this"]).apply(doc["sentences"][0]["words"]))

    # UnicodeDecodeError in the stemmer -> word passes through unstemmed
    def broken(w):
        raise UnicodeDecodeError("dummycodec", b"\x00\x00", 1, 2, "Dummy!")

    m = DictionaryMatch(d=["is"], stemmer=broken)
    assert m._stem("caresses") == "caresses"


def test_lambda_function_matcher_parity():
    """Reference test_matchers.py:285-304."""
    doc = make_doc()
    m = LambdaFunctionMatcher(func=lambda x: True)
    assert texts(m, doc, 1, 1) == {"This", "is", "apple"}
    with pytest.raises(ValueError):
        list(m.apply(doc["sentences"][0]["words"]))
    with pytest.raises(Exception):
        LambdaFunctionMatcher()


def test_regex_match_parity():
    """Reference test_matchers.py:307-335."""
    doc = make_doc()
    with pytest.raises(Exception):
        RegexMatchSpan(regex=r"apple")
    with pytest.raises(ValueError):
        list(RegexMatchSpan(rgx=r"apple").apply(doc["sentences"][0]["words"]))
    with pytest.raises(ValueError):
        list(RegexMatchEach(rgx=r"apple").apply(doc["sentences"][0]["words"]))
    assert texts(RegexMatchEach(rgx=r"apple"), doc) == {"apple"}
    assert list(RegexMatchEach(rgx=r"Apple", ignore_case=False).apply(spans(doc))) == []
    # sep is REMOVED from the raw span text for attrib="words"
    assert texts(RegexMatchSpan(rgx=r"isapple", sep=" "), doc) == {"is apple"}


def _one_word_sentence(word: str) -> dict:
    return {
        "doc_name": "d",
        "position": 0,
        "text": word,
        "words": [word],
        "char_offsets": [0],
        "abs_char_offsets": [0],
    }


def test_ngram_split_parity():
    """Reference test_candidates.py:67-189: split unigrams yield every
    contiguous combination around split tokens."""
    from fonduer_ray.core.ngrams import Ngrams

    ngrams = Ngrams(split_tokens=["-", "/"])

    def spans_of(word):
        return [sp.get_span() for sp in ngrams.apply_sentence(_one_word_sentence(word))]

    r = spans_of("New-Text")
    assert r == ["New-Text", "New", "Text"]
    assert spans_of("New-") == ["New-", "New"]
    assert spans_of("-Text") == ["-Text", "Text"]
    r = spans_of("New/Text-Word")
    assert len(r) == 6
    assert set(r) == {"New/Text-Word", "New", "New/Text", "Text", "Text-Word", "Word"}
    r = spans_of("A-B/C-D")
    assert len(r) == 10
    assert set(r) == {
        "A-B/C-D", "A-B/C", "B/C-D", "A-B", "C-D", "B/C", "A", "B", "C", "D",
    }

    ngrams = Ngrams(split_tokens=["~", "~~"])
    r = [sp.get_span() for sp in ngrams.apply_sentence(_one_word_sentence("a~b~~c~d"))]
    assert len(r) == 10
    assert set(r) == {
        "a~b~~c~d", "a", "a~b", "a~b~~c", "b", "b~~c", "b~~c~d", "c", "c~d", "d",
    }

    ngrams = Ngrams(split_tokens=["~a", "a~"])
    r = [sp.get_span() for sp in ngrams.apply_sentence(_one_word_sentence("~a~b~~c~d"))]
    assert len(r) == 2
    assert set(r) == {"~a~b~~c~d", "~b~~c~d"}

    ngrams = Ngrams(split_tokens=["-", "/", "*"])
    r = [sp.get_span() for sp in ngrams.apply_sentence(_one_word_sentence("A-B/C*D"))]
    assert len(r) == 10
    assert set(r) == {
        "A-B/C*D", "A", "A-B", "A-B/C", "B", "B/C", "B/C*D", "C", "C*D", "D",
    }


def test_ngram_split_offsets_sentence_relative():
    """Split spans carry correct sentence-relative char offsets even when the
    split word is NOT the first token (we fix the reference's word-relative
    offset quirk, mentions.py:113-121)."""
    from fonduer_ray.core.ngrams import Ngrams

    sent = {
        "doc_name": "d",
        "position": 0,
        "text": "part BC546-16 works",
        "words": ["part", "BC546-16", "works"],
        "char_offsets": [0, 5, 14],
        "abs_char_offsets": [0, 5, 14],
    }
    spans = list(Ngrams(1, 1, split_tokens=["-"]).apply_sentence(sent))
    by_text = {sp.get_span(): (sp.char_start, sp.char_end) for sp in spans}
    assert by_text["BC546"] == (5, 9)
    assert by_text["16"] == (11, 12)


def test_span_char_start_end_parity():
    """Reference test_candidates.py:192-206."""
    from fonduer_ray.core.ngrams import Ngrams

    result = list(Ngrams().apply_sentence(_one_word_sentence("BC548BG")))
    assert len(result) == 1
    assert result[0].get_span() == "BC548BG"
    assert (result[0].char_start, result[0].char_end) == (0, 6)


def test_mention_longest_match_lincoln():
    """Longest-match filtering on the reference's lincoln_short fixture
    (test_candidates.py:395-450). The reference counts 23/4 under spaCy
    tokenization; our punct tokenizer yields 29/5 (commas tokenize
    separately), with identical SEMANTICS: "Sinking Spring Farm" always
    present, its sub-span "Farm" suppressed iff longest_match_only."""
    from fonduer_ray.core.matchers import LambdaFunctionMatcher
    from fonduer_ray.core.ngrams import MentionNgrams
    from fonduer_ray.functions import dmu
    from fonduer_ray.parser.parse import ParserConfig, parse_document

    html = open(f"{DATA}/pure_html/lincoln_short.html", "rb").read().decode()
    doc = parse_document("lincoln_short", html, ParserConfig(sentencizer="punct"))

    def is_birthplace_table_row(span):
        if span.sentence.get("table_position") is None:
            return False
        return "birth_place" in set(dmu.get_row_ngrams(span, doc, lower=True))

    space = MentionNgrams(1, 4)
    loose = [
        sp.get_span()
        for sp in LambdaFunctionMatcher(
            func=is_birthplace_table_row, longest_match_only=False
        ).apply(space.apply(doc))
    ]
    assert "Sinking Spring Farm" in loose and "Farm" in loose
    assert len(loose) == 29
    strict = [
        sp.get_span()
        for sp in LambdaFunctionMatcher(
            func=is_birthplace_table_row, longest_match_only=True
        ).apply(space.apply(doc))
    ]
    assert "Sinking Spring Farm" in strict and "Farm" not in strict
    assert len(strict) == 5


def test_candidate_with_nullable_mentions_parity():
    """Reference test_candidates.py:547-576: a nullable unary relation emits
    one candidate per mention plus one with the NULL argument."""
    from fonduer_ray.core.matchers import RegexMatchSpan
    from fonduer_ray.core.ngrams import MentionNgrams
    from fonduer_ray.stages.candidate_stage import CandidateStage, RelationSpec
    from fonduer_ray.stages.mention_stage import MentionSpec, MentionStage

    doc = make_doc("t1 is 100 and t2 is 150")
    specs = [MentionSpec("temp", MentionNgrams(1, 1), RegexMatchSpan(rgx=r"\d{3}"))]
    doc["mentions"] = MentionStage(specs).extract_doc(doc)
    assert len(doc["mentions"]) == 2
    rel = RelationSpec("cand_temp", ("temp",), nullables=(True,))
    cands = CandidateStage([rel]).extract_doc(doc)
    assert len(cands) == len(doc["mentions"]) + 1
    assert "" in [c["arg_stable_ids"][0] for c in cands]


def test_tabular_dmu_parity_md():
    """data_model_utils tabular helpers on md.html with the reference's own
    golden values (tests/utils/data_model_utils/test_tabular.py:56-290);
    mentions located by text rather than by spaCy token index."""
    from fonduer_ray.core.ngrams import MentionNgrams
    from fonduer_ray.functions import dmu
    from fonduer_ray.parser.parse import ParserConfig, parse_document

    html = open(f"{DATA}/html_simple/md.html", "rb").read().decode()
    doc = parse_document("md", html, ParserConfig(sentencizer="punct"))
    mentions = list(MentionNgrams(1, 1).apply(doc))
    by_text = {}
    for m in mentions:
        by_text.setdefault(m.get_span(), m)
    joan, saag, paneer = by_text["Joan"], by_text["saag"], by_text["paneer"]
    sally, vindaloo, name = by_text["Sally"], by_text["vindaloo"], by_text["Name"]
    sample, markdown, this = by_text["Sample"], by_text["Markdown"], by_text["This"]
    basic = by_text["basic"]

    # same_row / same_col / aligned / same_cell (test_tabular.py:56-110)
    assert dmu.same_row((joan, saag)) and not dmu.same_row((joan, sally))
    assert not dmu.same_col((joan, saag)) and dmu.same_col((joan, sally))
    assert dmu.is_tabular_aligned((joan, saag))
    assert not dmu.is_tabular_aligned((joan, vindaloo))
    assert not dmu.same_cell((joan, saag)) and dmu.same_cell((saag, paneer))
    # same_sentence (test_tabular.py:112-124)
    assert dmu.same_sentence((sample, markdown))
    assert not dmu.same_sentence((sample, this))

    # sentence ngrams around "basic" (test_tabular.py:157-182)
    assert list(dmu.get_sentence_ngrams(basic)) == [
        "this", "is", "some", ",", "sample", "markdown", ".",
    ]
    assert list(dmu.get_neighbor_sentence_ngrams(basic, doc)) == [
        "sample", "markdown", "second", "heading",
    ]

    # cell / neighbor-cell ngrams (test_tabular.py:184-221)
    assert list(dmu.get_cell_ngrams(saag, doc)) == ["paneer"]
    assert list(dmu.get_cell_ngrams(sample, doc)) == []
    assert list(dmu.get_neighbor_cell_ngrams(saag, doc)) == [
        "paneer", "joan", "medium", "lunch", "order", "vindaloo",
    ]
    assert list(dmu.get_neighbor_cell_ngrams(saag, doc, directions=True)) == [
        "paneer",
        ("joan", "LEFT"),
        ("medium", "RIGHT"),
        ("lunch", "UP"),
        ("order", "UP"),
        ("vindaloo", "DOWN"),
    ]

    # row / col / aligned ngrams (test_tabular.py:223-268)
    assert list(dmu.get_row_ngrams(saag, doc)) == ["paneer", "joan", "medium", "$", "11"]
    assert list(dmu.get_row_ngrams(sample, doc)) == []
    assert list(dmu.get_col_ngrams(saag, doc)) == [
        "paneer", "lunch", "order", "vindaloo", "lamb", "madras",
    ]
    assert list(dmu.get_aligned_ngrams(saag, doc)) == [
        "paneer", "joan", "medium", "$", "11",
        "paneer", "lunch", "order", "vindaloo", "lamb", "madras",
    ]

    # head ngrams (test_tabular.py:270-290)
    assert list(dmu.get_head_ngrams(saag, doc)) == ["joan", "lunch", "order"]
    assert list(dmu.get_head_ngrams(joan, doc)) == []
    assert list(dmu.get_head_ngrams(name, doc)) == []
    assert list(dmu.get_head_ngrams(sample, doc)) == []

    # min/max col (test_tabular.py:126-155)
    assert dmu.get_min_row_num(sample, doc) is None
    assert dmu.get_min_row_num(joan, doc) == 0


STRUCT_HTML = """<html>
                    <body>
                        <h1>test1</h1>
                        <h2>test2</h2>
                        <div>
                            <h3>test3</h3>
                            <table>
                                <tr>
                                    <td>test4</td>
                                    <td>test5</td>
                                </tr>
                            </table>
                            <table>
                                <tr>
                                    <td>test6</td>
                                    <td>test7</td>
                                </tr>
                            </table>
                        </div>
                        <p>test8 test9</p>
                    </body>
                </html>"""


@pytest.mark.parametrize(
    "mention_ids, output_common_ancestor, output_lcad",
    [
        ([], ["", "html", "body"], 1),
        ([0, 1], ["", "html", "body"], 1),
        ([2, 3], ["", "html", "body", "div"], 1),
        ([3, 4], ["", "html", "body", "div", "table[1]", "tr"], 1),
        ([4, 5], ["", "html", "body", "div"], 3),
        ([5, 6], ["", "html", "body", "div", "table[2]", "tr"], 1),
        ([3, 5], ["", "html", "body", "div"], 3),
        ([7, 8], ["", "html", "body", "p"], 0),
    ],
)
def test_structural_ancestors_parity(mention_ids, output_common_ancestor, output_lcad):
    """Reference tests/utils/data_model_utils/test_structural.py:75-120."""
    from fonduer_ray.core.ngrams import MentionNgrams
    from fonduer_ray.functions.dmu import common_ancestor, lowest_common_ancestor_depth
    from fonduer_ray.parser.parse import ParserConfig, parse_document

    doc = parse_document("test", STRUCT_HTML, ParserConfig(sentencizer="punct"))
    mentions = list(MentionNgrams(1, 1).apply(doc))
    assert len(mentions) == sum(len(s["words"]) for s in doc["sentences"])
    assert mentions[7].get_span() == "test8"
    assert mentions[8].get_span() == "test9"
    test_mentions = [mentions[i] for i in mention_ids] if mention_ids else mentions
    assert common_ancestor(test_mentions) == output_common_ancestor
    assert lowest_common_ancestor_depth(test_mentions) == output_lcad


def test_visual_dmu_parity():
    """Reference tests/utils/data_model_utils/test_visual.py:60-110: horz/
    vert ngram alignment with the 1.5pt-shrunk overlap (touching edges do
    not align) and the from_sentence=False variant."""
    from fonduer_ray.core.ngrams import MentionNgrams
    from fonduer_ray.parser.visual import get_horz_ngrams, get_vert_ngrams

    def vsent(pos, text, page, top, bottom, lefts):
        words = text.split(" ")
        offs = []
        i = 0
        for w in words:
            offs.append(i)
            i += len(w) + 1
        n = len(words)
        return {
            "doc_name": "d",
            "position": pos,
            "text": text,
            "words": words,
            "char_offsets": offs,
            "abs_char_offsets": offs,
            "page": [page] * n,
            "top": [top] * n,
            "bottom": [bottom] * n,
            "left": lefts,
            "right": [x + 10 for x in lefts],
        }

    doc = {
        "doc_name": "d",
        "sentences": [
            vsent(0, "This is apple .", 1, 0, 10, [0, 10, 20, 30]),
            vsent(1, "That is orange .", 1, 0, 10, [40, 50, 60, 70]),
            vsent(2, "Where is banaba ?", 1, 10, 20, [0, 10, 20, 30]),
            vsent(3, "Page two words !", 2, 0, 10, [0, 10, 20]),
        ],
    }
    mentions = list(MentionNgrams(1, 1).apply(doc))
    apple = [m for m in mentions if m.get_span() == "apple"][0]
    # horizontally aligned: sentence 1 only (sentence 2 touches at y=10 ->
    # NOT aligned after shrink; sentence 3 is on another page)
    assert list(get_horz_ngrams(apple, doc)) == ["that", "is", "orange", "."]
    # vertically aligned: sentence 2 only
    assert list(get_vert_ngrams(apple, doc)) == ["where", "is", "banaba", "?"]
    # from_sentence=False prepends the span's own sentence tokens
    assert list(get_horz_ngrams(apple, doc, from_sentence=False)) == [
        "this", "is", ".", "that", "is", "orange", ".",
    ]


def test_ngram_limits_lincoln():
    """N-gram limit invariants from reference test_candidates.py:326-363
    (exact reference counts are spaCy-NER-bound; the n_min/n_max invariants
    and our own deterministic counts are asserted instead)."""
    from fonduer_ray.core.matchers import PersonMatcher
    from fonduer_ray.core.ngrams import MentionNgrams
    from fonduer_ray.functions import dmu
    from fonduer_ray.parser.lingual import HeuristicLinguist
    from fonduer_ray.parser.parse import ParserConfig, parse_document

    html = open(f"{DATA}/pure_html/lincoln_short.html", "rb").read().decode()
    doc = parse_document("lincoln_short", html, ParserConfig(sentencizer="punct"))
    hl = HeuristicLinguist()
    for s in doc["sentences"]:
        hl.enrich(s)

    persons = list(PersonMatcher().apply(MentionNgrams(n_max=3).apply(doc)))
    assert persons, "heuristic NER should find person-like mentions"
    assert all(p.get_num_words() <= 3 for p in persons)
    n1 = len(persons)

    persons2 = list(PersonMatcher().apply(MentionNgrams(n_min=2, n_max=3).apply(doc)))
    assert all(2 <= p.get_num_words() <= 3 for p in persons2)
    assert len(persons2) < n1

    # row/col ngrams are empty exactly for non-tabular mentions
    # (test_candidates.py:363-393)
    for m in list(MentionNgrams(1, 2).apply(doc))[:500]:
        row = list(dmu.get_row_ngrams(m, doc))
        col = list(dmu.get_col_ngrams(m, doc))
        if m.sentence.get("table_position") is None:
            assert row == [] and col == []
        else:
            assert not any(x is None for x in row)
            assert not any(x is None for x in col)


def test_multimodal_mentions_and_candidates_radiology():
    """Reference test_candidates.py:452-527: one mention per context node of
    every type over radiology.html, and unary candidates matching mention
    counts — golden counts 1/2/5/2/2/30/35/21."""
    from fonduer_ray.core.matchers import DoNothingMatcher
    from fonduer_ray.core.ngrams import (
        MentionCaptions,
        MentionCells,
        MentionDocuments,
        MentionFigures,
        MentionParagraphs,
        MentionSections,
        MentionSentences,
        MentionTables,
    )
    from fonduer_ray.parser.parse import ParserConfig, parse_document
    from fonduer_ray.stages.candidate_stage import CandidateStage, RelationSpec
    from fonduer_ray.stages.mention_stage import MentionSpec, MentionStage

    html = open(f"{DATA}/pure_html/radiology.html", "rb").read().decode()
    doc = parse_document("radiology", html, ParserConfig(sentencizer="punct"))
    assert len(doc["sentences"]) == 35

    spaces = {
        "m_doc": MentionDocuments(),
        "m_cap": MentionCaptions(),
        "m_sec": MentionSections(),
        "m_tab": MentionTables(),
        "m_fig": MentionFigures(),
        "m_para": MentionParagraphs(),
        "m_sent": MentionSentences(),
        "m_cell": MentionCells(),
    }
    specs = [
        MentionSpec(name, space, DoNothingMatcher())
        for name, space in spaces.items()
    ]
    doc["mentions"] = MentionStage(specs).extract_doc(doc)
    by_type: dict[str, int] = {}
    for m in doc["mentions"]:
        by_type[m["mention_type"]] = by_type.get(m["mention_type"], 0) + 1
    assert by_type == {
        "m_doc": 1,
        "m_cap": 2,
        "m_sec": 5,
        "m_tab": 2,
        "m_fig": 2,
        "m_para": 30,
        "m_sent": 35,
        "m_cell": 21,
    }

    rels = [
        RelationSpec(f"cs_{t}", (t,), nullables=(False,)) for t in spaces
    ]
    cands = CandidateStage(rels).extract_doc(doc)
    by_rel: dict[str, int] = {}
    for c in cands:
        by_rel[c["relation"]] = by_rel.get(c["relation"], 0) + 1
    assert by_rel == {f"cs_{t}": n for t, n in by_type.items()}
