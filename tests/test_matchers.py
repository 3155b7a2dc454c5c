"""Matcher-algebra unit tests (semantics per fonduer candidates/matchers.py)."""

from fonduer_ray.core.matchers import (
    Concat,
    DictionaryMatch,
    DoNothingMatcher,
    Intersect,
    Inverse,
    LambdaFunctionMatcher,
    NumberMatcher,
    RegexMatchEach,
    RegexMatchSpan,
    Union,
)
from fonduer_ray.core.ngrams import Ngrams

from tests.test_core import make_sentence


def spans_of(text, n_min=1, n_max=3):
    return list(Ngrams(n_min, n_max).apply_sentence(make_sentence(text)))


def apply_texts(matcher, spans):
    return [m.get_span() for m in matcher.apply(spans)]


def test_dictionary_match():
    spans = spans_of("the Quick fox", 1, 1)
    m = DictionaryMatch(d=["quick", "dog"])
    assert apply_texts(m, spans) == ["Quick"]
    m2 = DictionaryMatch(d=["quick"], ignore_case=False)
    assert apply_texts(m2, spans) == []
    m3 = DictionaryMatch(d=["quick"], inverse=True)
    assert apply_texts(m3, spans) == ["the", "fox"]


def test_regex_match_span_full_vs_search():
    spans = spans_of("ab12 xyz", 1, 1)
    assert apply_texts(RegexMatchSpan(rgx=r"[a-z]+\d+"), spans) == ["ab12"]
    # full_match auto-anchors: bare prefix regex must cover whole span
    assert apply_texts(RegexMatchSpan(rgx=r"[a-z]+"), spans) == ["xyz"]
    # search=True still honors the grouped $-wrap (reference
    # matchers.py:306-314); un-anchored search needs full_match=False
    assert apply_texts(RegexMatchSpan(rgx=r"[a-z]+", search=True), spans) == ["xyz"]
    assert apply_texts(
        RegexMatchSpan(rgx=r"[a-z]+", search=True, full_match=False), spans
    ) == ["ab12", "xyz"]


def test_longest_match_only_suppression():
    spans = spans_of("alpha beta gamma", 1, 2)
    m = RegexMatchSpan(rgx=r"(alpha|beta)( beta)?", longest_match_only=True)
    out = apply_texts(m, spans)
    assert out == ["alpha beta"]  # the contained "alpha"/"beta" are suppressed
    m2 = RegexMatchSpan(rgx=r"(alpha|beta)( beta)?", longest_match_only=False)
    assert set(apply_texts(m2, spans)) == {"alpha beta", "alpha", "beta"}


def test_boolean_algebra():
    spans = spans_of("one two three", 1, 1)
    a = DictionaryMatch(d=["one", "two"])
    b = DictionaryMatch(d=["two", "three"])
    assert apply_texts(Union(a, b), spans) == ["one", "two", "three"]
    assert apply_texts(Intersect(a, b), spans) == ["two"]
    assert apply_texts(Inverse(a, longest_match_only=False), spans) == ["three"]


def test_concat():
    spans = spans_of("stg temp max", 2, 2)
    m = Concat(DictionaryMatch(d=["stg"]), DictionaryMatch(d=["temp"]))
    assert apply_texts(m, spans) == ["stg temp"]
    perm = Concat(
        DictionaryMatch(d=["temp"]), DictionaryMatch(d=["stg"]), permutations=True
    )
    assert apply_texts(perm, spans) == ["stg temp"]


def test_regex_match_each_and_ner_presets():
    s = make_sentence("42 7")
    s["ner_tags"] = ["CARDINAL", "CARDINAL"]
    spans = list(Ngrams(1, 2).apply_sentence(s))
    out = [m.get_span() for m in NumberMatcher().apply(spans)]
    assert out == ["42 7"]  # longest span where every token is CARDINAL
    m = RegexMatchEach(rgx=r"\d+", longest_match_only=False)
    assert len(list(m.apply(spans))) == 3


def test_lambda_matcher_and_donothing():
    spans = spans_of("a bb ccc", 1, 1)
    m = LambdaFunctionMatcher(func=lambda sp: len(sp.get_span()) == 2)
    assert apply_texts(m, spans) == ["bb"]
    assert len(apply_texts(DoNothingMatcher(), spans)) == 3
