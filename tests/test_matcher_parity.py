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
