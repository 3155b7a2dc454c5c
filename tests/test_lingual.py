"""Lingual plug-point tests: linguist selection, the token-preserving Doc
helpers (pure, no spaCy needed), and availability-gated spaCy conformance."""

import pytest

from fonduer_ray.parser.lingual import (
    HeuristicLinguist,
    _char_limit_batches,
    _words_and_spaces,
    default_linguist,
    spacy_available,
)


def test_char_limit_batches():
    sents = [{"text": "a" * n} for n in (40, 40, 40, 100, 10)]
    batches = _char_limit_batches(sents, limit=100)
    assert [[len(s["text"]) for s in b] for b in batches] == [
        [40, 40],  # 40+40 < 100, adding the third hits the limit
        [40],
        [100],
        [10],
    ]
    # everything fits in one batch under a huge limit
    assert _char_limit_batches(sents, limit=10**6) == [sents]
    assert _char_limit_batches([], limit=100) == []


def test_words_and_spaces_token_preserving():
    """Reference TokenPreservingTokenizer semantics (spacy_parser.py:288-319):
    the trailing-space flag is recovered from the sentence text, the last
    word of each sentence is always space-followed, and sentence starts are
    doc-level token indices."""
    sents = [
        {"text": "Hello world.", "words": ["Hello", "world", "."]},
        {"text": "Bye now", "words": ["Bye", "now"]},
        {"text": "", "words": []},  # empty sentences contribute nothing
    ]
    words, spaces, starts = _words_and_spaces(sents)
    assert words == ["Hello", "world", ".", "Bye", "now"]
    # "world" abuts "." (no space); "." ends its sentence (always True)
    assert spaces == [True, False, True, True, True]
    assert starts == [0, 3]
    # a word missing from its sentence text is a hard error, not a skew
    with pytest.raises(AttributeError):
        _words_and_spaces([{"text": "abc", "words": ["zzz", "abc"]}])


def test_default_linguist_selection():
    assert isinstance(default_linguist("heuristic"), HeuristicLinguist)
    assert default_linguist(None) is None
    custom = HeuristicLinguist()
    assert default_linguist(custom) is custom
    with pytest.raises(ValueError):
        default_linguist("nope")
    if not spacy_available():
        # auto falls back deterministically when spaCy is absent
        assert isinstance(default_linguist("auto"), HeuristicLinguist)
        with pytest.raises(ImportError):
            default_linguist("spacy")


def test_heuristic_enrich_document_matches_per_sentence():
    lg = HeuristicLinguist()
    sents = [
        {"text": "Ray runs fast.", "words": ["Ray", "runs", "fast", "."]},
        {"text": "It scales.", "words": ["It", "scales", "."]},
    ]
    import copy

    expect = [HeuristicLinguist().enrich(copy.deepcopy(s)) for s in sents]
    assert lg.enrich_document(copy.deepcopy(sents)) == expect


@pytest.mark.skipif(not spacy_available(), reason="spaCy not installed")
def test_spacy_linguist_conformance():
    """Real-spaCy path: OUR tokenization and boundaries survive the pipe,
    and every lingual array is token-aligned (runs only where spaCy + an
    English model exist)."""
    from fonduer_ray.parser.lingual import SpacyLinguist

    lg = SpacyLinguist("en")
    sents = [
        {"text": "Barack Obama visited Paris.", "words": ["Barack", "Obama", "visited", "Paris", "."]},
        {"text": "The talks went well.", "words": ["The", "talks", "went", "well", "."]},
    ]
    out = lg.enrich_document(sents)
    for s in out:
        n = len(s["words"])
        assert len(s["lemmas"]) == n
        assert len(s["pos_tags"]) == n
        assert len(s["ner_tags"]) == n
        assert len(s["dep_parents"]) == n
        assert len(s["dep_labels"]) == n
        assert all(0 <= p <= n for p in s["dep_parents"])
    assert out[0]["ner_tags"][0] != "O"  # Barack tagged as an entity
