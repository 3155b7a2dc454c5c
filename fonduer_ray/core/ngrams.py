"""Mention spaces: n-gram / context-node span generators.

Reimplements the semantics of the reference's mention spaces
(``candidates/mentions.py:28-358``): ``Ngrams`` emits all n-grams of a
sentence **longest-first** (reverse-n order) with a seen-set dedup — the
ordering that makes the matchers' longest-match-only suppression work —
plus an optional ``split_tokens`` regex that additionally splits matching
unigrams into sub-spans (e.g. "BC546-16" -> "BC546", "16").

All spaces are plain generators over the nested document row; they run
inside a ``map_batches`` stage, one document at a time — no Ray here.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from fonduer_ray.core.spans import Span


def tokens_to_ngrams(
    tokens: list[str], n_min: int = 1, n_max: int = 3, delim: str = " ", lower: bool = False
) -> Iterator[str]:
    """All n-grams of a token list (reference ``utils/utils.py:36-48``)."""
    num = len(tokens)
    for i in range(num):
        for n in range(n_min, min(n_max, num - i) + 1):
            g = delim.join(tokens[i : i + n])
            yield g.lower() if lower else g


class MentionSpace:
    """Interface: ``apply(doc_row) -> Iterator[Span]``."""

    def apply(self, doc: dict) -> Iterator[Span]:  # pragma: no cover - interface
        raise NotImplementedError


class Ngrams(MentionSpace):
    """All n-grams n_min..n_max over one sentence, longest first."""

    def __init__(self, n_min: int = 1, n_max: int = 5, split_tokens: list[str] | None = None):
        self.n_min = n_min
        self.n_max = n_max
        # longest token first in the alternation (reference mentions.py:67-72:
        # escaped, reverse-sorted)
        self.split_rgx = (
            re.compile(
                r"("
                + r"|".join(map(re.escape, sorted(split_tokens, reverse=True)))
                + r")"
            )
            if split_tokens
            else None
        )

    def apply_sentence(self, sentence: dict) -> Iterator[Span]:
        offsets = sentence["char_offsets"]
        words = sentence["words"]
        num = len(words)
        seen: set[tuple[int, int]] = set()
        # longest-first so downstream longest_match_only suppression works
        for n in range(self.n_max, self.n_min - 1, -1):
            for i in range(num - n + 1):
                cs = offsets[i]
                ce = offsets[i + n - 1] + len(words[i + n - 1]) - 1
                key = (cs, ce)
                if key not in seen:
                    seen.add(key)
                    yield Span(sentence, cs, ce)
                # split unigrams at split tokens: yield EVERY contiguous
                # (part-start, part-end) combination — "A-B/C-D" also yields
                # "A-B/C", "B/C-D", "B/C" etc. (reference mentions.py:100-126;
                # offsets made sentence-relative, which the reference omits)
                if (
                    n == 1
                    and self.n_min <= 1 <= self.n_max
                    and self.split_rgx is not None
                    and ce - cs > 0
                ):
                    word = words[i]
                    start_idxs = [0]
                    end_idxs = []
                    for m in self.split_rgx.finditer(word):
                        start_idxs.append(m.end())
                        end_idxs.append(m.start())
                    end_idxs.append(len(word))
                    for si in start_idxs:
                        for ei in end_idxs:
                            if si < ei:
                                k2 = (cs + si, cs + ei - 1)
                                if k2 not in seen:
                                    seen.add(k2)
                                    yield Span(sentence, k2[0], k2[1])


class MentionNgrams(Ngrams):
    """Ngrams over every sentence of a document."""

    def apply(self, doc: dict) -> Iterator[Span]:
        for sentence in doc["sentences"]:
            yield from self.apply_sentence(sentence)


class MentionSentences(MentionSpace):
    """The whole sentence as one span."""

    def apply(self, doc: dict) -> Iterator[Span]:
        for sentence in doc["sentences"]:
            if sentence["words"]:
                yield Span(sentence, 0, len(sentence["text"]) - 1)


class MentionDocuments(MentionSpace):
    """One span per document: the first sentence stands in as carrier."""

    def apply(self, doc: dict) -> Iterator[Span]:
        for sentence in doc["sentences"][:1]:
            yield Span(sentence, 0, len(sentence["text"]) - 1)


class FigureMention:
    """Figure-node mention (reference ``TemporaryFigureMention``): the
    matchable "text" is the image url. Duck-types the Span surface the
    matchers/record layer need; ``sentence_position`` is -1 (no carrier
    sentence — downstream span reconstruction skips these)."""

    __slots__ = ("doc_name", "figure")

    def __init__(self, doc_name: str, figure: dict):
        self.doc_name = doc_name
        self.figure = figure

    def get_span(self) -> str:
        return self.figure.get("url") or ""

    def get_attrib_tokens(self, attrib: str = "words") -> list:
        return [self.get_span()]

    def get_stable_id(self) -> str:
        return f"{self.doc_name}::figure_mention:{self.figure['position']}"

    def __contains__(self, other) -> bool:
        return self == other

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, FigureMention)
            and self.doc_name == other.doc_name
            and self.figure["position"] == other.figure["position"]
        )

    def __hash__(self) -> int:
        return hash((self.doc_name, self.figure["position"]))

    def to_record(self, mention_type: str) -> dict:
        return {
            "mention_type": mention_type,
            "stable_id": self.get_stable_id(),
            "sentence_position": -1,
            "char_start": self.figure["position"],
            "char_end": self.figure["position"],
            "text": self.get_span(),
            "implicit": False,
            "expander_key": "figure",
            "position": self.figure["position"],
            "expanded_words": [],
        }


class MentionFigures(MentionSpace):
    """All figures of a document, optional url-suffix type filter
    (reference ``mentions.py:164-196``)."""

    def __init__(self, types: list[str] | None = None):
        self.suffixes = tuple(f".{t.lstrip('.')}" for t in types) if types else None

    def apply(self, doc: dict) -> Iterator["FigureMention"]:
        for fig in doc.get("figures", []):
            url = fig.get("url") or ""
            if self.suffixes is not None and not url.lower().endswith(self.suffixes):
                continue
            yield FigureMention(doc["doc_name"], fig)


class ContextMention:
    """Non-span mention for a context node with no sentences of its own
    (e.g. an empty <section>); the generalization of ``FigureMention``.
    Reference spaces emit one Temporary*Mention per NODE regardless of
    text content (``mentions.py:224-358``)."""

    __slots__ = ("doc_name", "ctx_type", "position", "text")

    def __init__(self, doc_name: str, ctx_type: str, position: int, text: str = ""):
        self.doc_name = doc_name
        self.ctx_type = ctx_type
        self.position = position
        self.text = text

    def get_span(self) -> str:
        return self.text

    def get_attrib_tokens(self, attrib: str = "words") -> list:
        return self.text.split()

    def get_stable_id(self) -> str:
        return f"{self.doc_name}::{self.ctx_type}_mention:{self.position}"

    def __contains__(self, other) -> bool:
        return self == other

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, ContextMention)
            and (self.doc_name, self.ctx_type, self.position)
            == (other.doc_name, other.ctx_type, other.position)
        )

    def __hash__(self) -> int:
        return hash((self.doc_name, self.ctx_type, self.position))

    def to_record(self, mention_type: str) -> dict:
        return {
            "mention_type": mention_type,
            "stable_id": self.get_stable_id(),
            "sentence_position": -1,
            "char_start": self.position,
            "char_end": self.position,
            "text": self.text,
            "implicit": False,
            "expander_key": self.ctx_type,
            "position": self.position,
            "expanded_words": [],
        }


class _NodeMentions(MentionSpace):
    """One mention per context node (cell/paragraph/table/section/caption),
    reference ``mentions.py:224-358``. A single-sentence node is a plain
    full-sentence Span; a multi-sentence node becomes an ImplicitSpan
    anchored at the node's first sentence carrying the node's joined text;
    a node with NO sentences yields a non-span ``ContextMention`` (the
    reference emits per node, not per text)."""

    #: doc key holding the node records
    node_list: str = ""
    #: sentence-row field(s) identifying the node; None value = not in one
    node_fields: tuple[str, ...] = ()
    expander_key = "node"

    def node_key(self, s: dict, doc: dict):
        vals = tuple(s.get(f) for f in self.node_fields)
        return None if any(v is None for v in vals) else vals

    def node_key_of_record(self, rec: dict) -> tuple:
        # default: last node_field corresponds to the record's position
        return tuple(
            rec["position"] if i == len(self.node_fields) - 1 else rec.get(f)
            for i, f in enumerate(self.node_fields)
        )

    def apply(self, doc: dict) -> Iterator[Span]:
        from fonduer_ray.core.spans import ImplicitSpan

        groups: dict[tuple, list[dict]] = {}
        for s in doc["sentences"]:
            k = self.node_key(s, doc)
            if k is not None:
                groups.setdefault(k, []).append(s)
        for rec in doc.get(self.node_list, []):
            k = self.node_key_of_record(rec)
            sents = groups.get(k)
            if not sents:
                yield ContextMention(
                    doc["doc_name"], self.expander_key, rec["position"]
                )
            elif len(sents) == 1:
                anchor = sents[0]
                yield Span(anchor, 0, len(anchor["text"]) - 1)
            else:
                anchor = sents[0]
                text = " ".join(s["text"] for s in sents)
                yield ImplicitSpan(
                    anchor,
                    0,
                    len(anchor["text"]) - 1,
                    self.expander_key,
                    0,
                    text,
                )


class MentionCells(_NodeMentions):
    node_list = "cells"
    node_fields = ("table_position", "cell_position")
    expander_key = "cell"

    def node_key_of_record(self, rec: dict) -> tuple:
        return (rec["table_position"], rec["position"])


class MentionTables(_NodeMentions):
    node_list = "tables"
    node_fields = ("table_position",)
    expander_key = "table"


class MentionParagraphs(_NodeMentions):
    node_list = "paragraphs"
    node_fields = ("paragraph_position",)
    expander_key = "paragraph"


class MentionSections(_NodeMentions):
    node_list = "sections"
    node_fields = ("section_position",)
    expander_key = "section"


class MentionCaptions(_NodeMentions):
    """One mention per <caption>/<figcaption> node; a sentence belongs to a
    caption via its paragraph's ``caption_position``."""

    node_list = "captions"
    node_fields = ("caption_position",)
    expander_key = "caption"

    def node_key(self, s: dict, doc: dict):
        p = s.get("paragraph_position")
        if p is None:
            return None
        cap = doc["paragraphs"][p].get("caption_position")
        return None if cap is None else (cap,)


class MentionNgramsRangeExpand(MentionNgrams):
    """User-extension example mirroring the reference's hardware
    ``MentionNgramsPart`` (``tests/shared/hardware_spaces.py:13-163``):
    unigrams like "AB123A/B" additionally yield IMPLICIT spans "AB123A"
    and "AB123B" whose surface text differs from the document."""

    _slash_rgx = re.compile(r"^([A-Z]+\d+)([A-Z])/([A-Z])$")

    def apply(self, doc: dict) -> Iterator[Span]:
        from fonduer_ray.core.spans import ImplicitSpan

        for sentence in doc["sentences"]:
            for span in self.apply_sentence(sentence):
                yield span
                word = span.get_span()
                m = self._slash_rgx.match(word)
                if m:
                    base, a, b = m.groups()
                    for pos, suffix in enumerate((a, b)):
                        yield ImplicitSpan(
                            span.sentence,
                            span.char_start,
                            span.char_end,
                            "range",
                            pos,
                            base + suffix,
                        )
