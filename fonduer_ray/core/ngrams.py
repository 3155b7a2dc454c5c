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
        self.split_rgx = (
            re.compile(r"(" + r"|".join(split_tokens) + r")")
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
                # split matching unigrams into their parts
                if n == 1 and self.split_rgx is not None:
                    word = words[i]
                    m = self.split_rgx.search(word)
                    if m and len(word) > self.n_max:
                        start_lo = cs
                        parts = [p for p in self.split_rgx.split(word) if p]
                        pos = 0
                        for part in parts:
                            idx = word.find(part, pos)
                            pos = idx + len(part)
                            if self.split_rgx.fullmatch(part):
                                continue
                            k2 = (start_lo + idx, start_lo + idx + len(part) - 1)
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
