"""Lingual parsers: sentence splitting + deterministic NLP enrichment.

``SimpleSentencizer`` mirrors the reference's ``SimpleParser``
(``parser/lingual_parser/simple_parser.py:9-61``): split on a delimiter,
whitespace-tokenize, cumulative char offsets, no NLP.

``HeuristicLinguist`` stands in for the reference's spaCy stage
(``spacy_parser.py:102-249``). spaCy models are not available in this
environment, so enrichment is a deterministic, rule-based tagger with the
same *shape*: token-aligned ``lemmas``, ``pos_tags``, ``ner_tags`` ("O"
default), ``dep_parents`` (sentence-local, 0 = root), ``dep_labels``.
It is designed to run as an actor-pool ``map_batches`` stage — all state
(compiled regexes, gazetteers) is built once in ``__init__``.
"""

from __future__ import annotations

import re


class SimpleSentencizer:
    """Delimiter split + whitespace tokenization with char offsets."""

    def __init__(self, delim: str = "."):
        self.delim = delim

    def split_sentences(self, text: str):
        """Yield dicts ``{text, words, char_offsets, start}`` where ``start``
        is the sentence's char offset within ``text`` and ``char_offsets``
        are word starts relative to the sentence text."""
        pos = 0
        for chunk in text.split(self.delim):
            stripped = chunk.strip()
            if stripped:
                lead = len(chunk) - len(chunk.lstrip())
                words, offsets = _tokenize_ws(stripped)
                yield {
                    "text": stripped,
                    "words": words,
                    "char_offsets": offsets,
                    "start": pos + lead,
                }
            pos += len(chunk) + len(self.delim)


def _tokenize_ws(text: str) -> tuple[list[str], list[int]]:
    words: list[str] = []
    offsets: list[int] = []
    for m in re.finditer(r"\S+", text):
        words.append(m.group(0))
        offsets.append(m.start())
    return words, offsets


_PUNCT_TOKEN = re.compile(r"\w+|[^\w\s]+", re.UNICODE)
# terminal punctuation optionally followed by closing quotes/brackets —
# spaCy's sentencizer keeps the closer with the sentence and splits after it
_SENT_BOUNDARY = re.compile(r"[.!?]+[\"'”’)\]]*(?:\s+|$)")


class PunctSentencizer:
    """spaCy-sentencizer-style splitting (reference ``spacy_parser.py:191-249``
    run with only the sentencizer pipe): sentences end at ``.!?`` runs, the
    terminal punctuation stays attached to its sentence, and punctuation-only
    paragraphs (e.g. a bare tail ".") are emitted as their own sentence —
    which is how the reference arrives at 45 sentences for ``md.html``
    (``tests/parser/test_parser.py:132-146``). Tokens split word/punct
    clusters like spaCy ("later." -> ["later", "."])."""

    def split_sentences(self, text: str):
        bounds = [m.end() for m in _SENT_BOUNDARY.finditer(text)]
        if not bounds or bounds[-1] < len(text):
            bounds.append(len(text))
        start = 0
        for end in bounds:
            chunk = text[start:end]
            stripped = chunk.strip()
            if stripped:
                lead = len(chunk) - len(chunk.lstrip())
                words, offsets = [], []
                for m in _PUNCT_TOKEN.finditer(stripped):
                    words.append(m.group(0))
                    offsets.append(m.start())
                yield {
                    "text": stripped,
                    "words": words,
                    "char_offsets": offsets,
                    "start": start + lead,
                }
            start = end


_MONTHS = frozenset(
    "january february march april may june july august september october "
    "november december jan feb mar apr jun jul aug sep oct nov dec".split()
)
_PREPOSITIONS = frozenset(
    "in on at by for with from to of over under between into through "
    "during before after above below up down off near".split()
)
_DETERMINERS = frozenset("the a an this that these those".split())
_CONJUNCTIONS = frozenset("and or but nor so yet".split())
_PRONOUNS = frozenset("i you he she it we they me him her us them".split())
_ORG_SUFFIX = frozenset("inc corp ltd llc co gmbh plc".split())
_LOC_WORDS = frozenset(
    "america europe asia africa london paris berlin tokyo madrid rome "
    "york francisco angeles chicago texas california".split()
)


class HeuristicLinguist:
    """Deterministic rule-based lemma/POS/NER/dep tagger (spaCy stand-in).

    Stateless per call but holds compiled patterns; instantiate once per
    actor (``map_batches(LingualEnrichStage, concurrency=N)``)."""

    def __init__(self) -> None:
        self.num_rgx = re.compile(r"^[+-]?\d+(?:[.,]\d+)*$")
        self.year_rgx = re.compile(r"^(1[89]\d\d|20\d\d)$")
        self.cap_rgx = re.compile(r"^[A-Z][a-z]+")
        self.allcap_rgx = re.compile(r"^[A-Z]{2,}\d*$")
        # per-word memos: tags are pure functions of the word (ner also of
        # prev-word presence) and corpus vocabulary is Zipfian, so the
        # regex cascade runs ~once per distinct word per worker
        self._lemma_memo: dict[str, str] = {}
        self._pos_memo: dict[str, str] = {}
        self._ner_memo: dict[tuple[str, bool], str] = {}

    def lemma(self, word: str) -> str:
        w = word.lower()
        if len(w) > 3 and w.endswith("ies"):
            return w[:-3] + "y"
        if len(w) > 3 and w.endswith("s") and not w.endswith("ss"):
            return w[:-1]
        return w

    def pos(self, word: str) -> str:
        w = word.lower()
        if self.num_rgx.match(word):
            return "CD"
        if w in _DETERMINERS:
            return "DT"
        if w in _PREPOSITIONS:
            return "IN"
        if w in _CONJUNCTIONS:
            return "CC"
        if w in _PRONOUNS:
            return "PRP"
        if w.endswith("ing") and len(w) > 4:
            return "VBG"
        if w.endswith("ed") and len(w) > 3:
            return "VBD"
        if w.endswith("ly") and len(w) > 3:
            return "RB"
        if self.cap_rgx.match(word) or self.allcap_rgx.match(word):
            return "NNP"
        return "NN"

    def ner(self, word: str, prev_word: str | None) -> str:
        w = word.lower().strip(".,;:")
        if w in _MONTHS or self.year_rgx.match(w):
            return "DATE"
        if self.num_rgx.match(word):
            return "CARDINAL"
        if w in _ORG_SUFFIX:
            return "ORG"
        if w in _LOC_WORDS:
            return "GPE"
        if self.cap_rgx.match(word) and prev_word is not None:
            return "PERSON"
        return "O"

    def enrich(self, sentence: dict) -> dict:
        """Fill token-aligned lingual arrays in place and return it."""
        words = sentence["words"]
        lm, pm, nm = self._lemma_memo, self._pos_memo, self._ner_memo
        lemmas, poss, ners = [], [], []
        for i, w in enumerate(words):
            le = lm.get(w)
            if le is None:
                le = self.lemma(w)
                if len(lm) < 1_000_000:
                    lm[w] = le
            lemmas.append(le)
            p = pm.get(w)
            if p is None:
                p = self.pos(w)
                if len(pm) < 1_000_000:
                    pm[w] = p
            poss.append(p)
            nk = (w, i > 0)
            ne = nm.get(nk)
            if ne is None:
                ne = self.ner(w, words[i - 1] if i > 0 else None)
                if len(nm) < 1_000_000:
                    nm[nk] = ne
            ners.append(ne)
        sentence["lemmas"] = lemmas
        sentence["pos_tags"] = poss
        sentence["ner_tags"] = ners
        # flat deterministic dependency tree: token 0 is root, rest attach to it
        n = len(words)
        sentence["dep_parents"] = [0] + [1] * (n - 1) if n else []
        sentence["dep_labels"] = (["ROOT"] + ["dep"] * (n - 1)) if n else []
        return sentence
