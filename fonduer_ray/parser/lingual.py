"""Lingual parsers: sentence splitting + deterministic NLP enrichment.

``SimpleSentencizer`` mirrors the reference's ``SimpleParser``
(``parser/lingual_parser/simple_parser.py:9-61``): split on a delimiter,
whitespace-tokenize, cumulative char offsets, no NLP.

``SpacyLinguist`` is the real NLP stage (reference
``spacy_parser.py:102-319``): full-pipe enrichment over a token-preserving
Doc with pinned sentence boundaries, model loaded once per actor. It is
selected automatically by ``default_linguist("auto")`` whenever ``import
spacy`` (plus a model) succeeds.

``HeuristicLinguist`` is the deterministic fallback when spaCy is absent
(as in this container): a rule-based tagger with the same *shape* —
token-aligned ``lemmas``, ``pos_tags``, ``ner_tags`` ("O" default),
``dep_parents`` (sentence-local, 0 = root), ``dep_labels``.

Both run inside the parse ``map_batches`` stage — all state (spaCy model /
compiled regexes) is built once per worker, work happens per document via
``enrich_document``.
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

    def enrich_document(self, sentences: list[dict]) -> list[dict]:
        """Per-document entry point (shared interface with SpacyLinguist)."""
        for s in sentences:
            self.enrich(s)
        return sentences


# ---------------------------------------------------------------------------
# real-spaCy plug point (reference spacy_parser.py:102-319)
# ---------------------------------------------------------------------------


def spacy_available() -> bool:
    """True when the spaCy package can be imported (model availability is
    checked at ``SpacyLinguist`` construction)."""
    import importlib.util

    return importlib.util.find_spec("spacy") is not None


def _char_limit_batches(sentences: list[dict], limit: int) -> list[list[dict]]:
    """Greedy char-bounded batching of one document's sentences so each
    merged Doc stays under spaCy's ``max_length`` (reference
    ``spacy_parser.py:177-189``)."""
    batches: list[list[dict]] = [[]]
    num_chars = 0
    for s in sentences:
        if num_chars + len(s["text"]) >= limit:
            batches.append([s])
            num_chars = len(s["text"])
        else:
            batches[-1].append(s)
            num_chars += len(s["text"])
    return [b for b in batches if b]


def _words_and_spaces(
    sentences: list[dict],
) -> tuple[list[str], list[bool], list[int]]:
    """Token-preserving Doc inputs (reference ``TokenPreservingTokenizer``,
    ``spacy_parser.py:288-319``): the already-tokenized sentence words plus
    a trailing-space flag per token recovered from the sentence text, and
    the doc-level index of each sentence's first token (for boundary
    pinning, ``set_custom_boundary`` ``spacy_parser.py:252-269``)."""
    import string

    ws = tuple(string.whitespace)
    all_words: list[str] = []
    all_spaces: list[bool] = []
    starts: list[int] = []
    for s in sentences:
        words = s["words"]
        if not words:
            continue
        starts.append(len(all_words))
        all_words.extend(words)
        spaces = [True] * len(words)  # last word always space-followed
        pos = 0
        for i, w in enumerate(words[:-1]):
            pos = s["text"].find(w, pos)
            if pos == -1:
                raise AttributeError("Could not find token in its parent sentence")
            pos += len(w)
            if not s["text"][pos:].startswith(ws):
                spaces[i] = False
        all_spaces.extend(spaces)
    return all_words, all_spaces, starts


class SpacyLinguist:
    """Real spaCy enrichment, faithful to the reference semantics
    (``spacy_parser.py:102-175``): sentences keep OUR tokenization and OUR
    boundaries (token-preserving Doc + pinned ``is_sent_start``), the full
    pipeline runs over the merged document text, and each sentence gets
    token-aligned ``lemmas``/``pos_tags`` (``tag_``)/``ner_tags``
    (``ent_type_`` or "O")/``dep_parents`` (0 = root, else sentence-local
    1-based head index)/``dep_labels``.

    HEAVY state: the model loads once per actor — run the parse stage as an
    actor pool (``map_batches(ParseStage, concurrency=N)``) when using it.
    """

    def __init__(self, lang: str = "en", model_name: str | None = None):
        import spacy

        name = model_name or lang
        try:
            self.model = spacy.load(name)
        except OSError:
            if name == "en":  # bare lang code: fall back to the small model
                self.model = spacy.load("en_core_web_sm")
            else:
                raise
        # boundaries come pinned from our sentencizer, never from spaCy's
        # (reference removes these pipes, spacy_parser.py:120-128)
        for pipe in ("sentencizer", "sentence_boundary_detector"):
            if self.model.has_pipe(pipe):
                self.model.remove_pipe(pipe)

    def enrich_document(self, sentences: list[dict]) -> list[dict]:
        from spacy.tokens import Doc

        for batch in _char_limit_batches(sentences, self.model.max_length):
            nonempty = [s for s in batch if s["words"]]
            if not nonempty:
                continue
            words, spaces, starts = _words_and_spaces(nonempty)
            doc = Doc(self.model.vocab, words=words, spaces=spaces)
            start_set = set(starts)
            for i, tok in enumerate(doc):
                tok.is_sent_start = i in start_set
            for _name, proc in self.model.pipeline:
                doc = proc(doc)
            for sent, s in zip(doc.sents, nonempty):
                lemmas, poss, ners, parents, labels = [], [], [], [], []
                first = sent[0].i
                for token in sent:
                    lemmas.append(token.lemma_)
                    poss.append(token.tag_)
                    ners.append(token.ent_type_ if token.ent_type_ else "O")
                    parents.append(
                        0 if token.head is token else token.head.i - first + 1
                    )
                    labels.append(token.dep_)
                s["lemmas"] = lemmas
                s["pos_tags"] = poss
                s["ner_tags"] = ners
                s["dep_parents"] = parents
                s["dep_labels"] = labels
        return sentences


def default_linguist(linguist: "str | object" = "auto", lang: str = "en"):
    """Resolve a linguist selector: ``"auto"`` picks ``SpacyLinguist`` when
    spaCy imports (falling back if no model is installed), ``"spacy"``
    demands it, ``"heuristic"`` forces the deterministic tagger, ``None``
    disables enrichment, and any object with ``enrich_document`` passes
    through (user extension hook)."""
    if linguist is None:
        return None
    if hasattr(linguist, "enrich_document"):
        return linguist
    if linguist == "heuristic":
        return HeuristicLinguist()
    if linguist == "spacy":
        return SpacyLinguist(lang)
    if linguist == "auto":
        if spacy_available():
            try:
                return SpacyLinguist(lang)
            except Exception:  # no model installed: deterministic fallback
                return HeuristicLinguist()
        return HeuristicLinguist()
    raise ValueError(f"unknown linguist selector {linguist!r}")
