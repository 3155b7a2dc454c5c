"""Span objects over nested sentence records.

The engine's sentences are plain dicts (one element of a document row's
``sentences`` list) with token-aligned arrays: ``words``, ``char_offsets``
(sentence-relative start of each word), ``abs_char_offsets``, plus optional
lingual/tabular/structural arrays.

``Span`` reimplements the *semantics* of the reference's
``TemporarySpanMention`` (``candidates/models/span_mention.py:104-212``):
inclusive char indices relative to the sentence, char<->word index conversion,
attribute slicing, containment and value equality. ``ImplicitSpan`` carries its
own surface arrays (``candidates/models/implicit_span_mention.py:16-111``).

No ORM, no Ray — pure library, usable inside any map_batches stage.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Any

from fonduer_ray.core.stable_ids import implicit_span_stable_id, span_stable_id


class Span:
    """A char-interval over one sentence. ``char_end`` is inclusive."""

    __slots__ = ("sentence", "char_start", "char_end", "meta")

    def __init__(self, sentence: dict, char_start: int, char_end: int, meta: Any = None):
        self.sentence = sentence
        self.char_start = int(char_start)
        self.char_end = int(char_end)
        self.meta = meta

    # -- identity ---------------------------------------------------------
    @property
    def doc_name(self) -> str:
        return self.sentence["doc_name"]

    @property
    def abs_char_start(self) -> int:
        offs = self.sentence["abs_char_offsets"]
        base = offs[0] - self.sentence["char_offsets"][0] if offs else 0
        return base + self.char_start

    @property
    def abs_char_end(self) -> int:
        return self.abs_char_start + (self.char_end - self.char_start)

    def get_stable_id(self) -> str:
        return span_stable_id(self.doc_name, self.abs_char_start, self.abs_char_end)

    # -- char <-> word math ----------------------------------------------
    def get_word_start_index(self) -> int:
        return _char_to_word_index(self.sentence["char_offsets"], self.char_start)

    def get_word_end_index(self) -> int:
        return _char_to_word_index(self.sentence["char_offsets"], self.char_end)

    def get_num_words(self) -> int:
        return self.get_word_end_index() - self.get_word_start_index() + 1

    # -- attribute slicing -------------------------------------------------
    def get_attrib_tokens(self, attrib: str = "words") -> list:
        ws, we = self.get_word_start_index(), self.get_word_end_index()
        arr = self.sentence.get(attrib) or []
        return list(arr[ws : we + 1])

    def get_attrib_span(self, attrib: str, sep: str = " ") -> str:
        if attrib == "words":
            return self.get_span()
        return sep.join(str(t) for t in self.get_attrib_tokens(attrib))

    def get_span(self) -> str:
        return self.sentence["text"][self.char_start : self.char_end + 1]

    @property
    def text(self) -> str:
        return self.get_span()

    # -- relations ---------------------------------------------------------
    def __contains__(self, other: "Span") -> bool:
        if not isinstance(other, Span):
            # non-span mentions (figures, empty context nodes) are never
            # contained in a text span
            return False
        return (
            self.sentence_key() == other.sentence_key()
            and other.char_start >= self.char_start
            and other.char_end <= self.char_end
        )

    def sentence_key(self):
        return (self.sentence["doc_name"], self.sentence["position"])

    def __getitem__(self, key) -> "Span":
        if isinstance(key, slice):
            start = self.char_start if key.start is None else self.char_start + key.start
            if key.stop is None:
                end = self.char_end
            elif key.stop >= 0:
                end = self.char_start + key.stop - 1
            else:
                end = self.char_end + key.stop
            return Span(self.sentence, start, end)
        raise NotImplementedError("Span slicing requires a slice object")

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Span)
            and not isinstance(other, ImplicitSpan)
            and self.sentence_key() == other.sentence_key()
            and self.char_start == other.char_start
            and self.char_end == other.char_end
        )

    def __hash__(self) -> int:
        return hash((self.sentence_key(), self.char_start, self.char_end))

    def __repr__(self) -> str:
        return f"Span({self.get_span()!r}, chars=[{self.char_start},{self.char_end}])"

    def to_record(self, mention_type: str) -> dict:
        """Flatten to the mention-table record carried on document rows."""
        return {
            "mention_type": mention_type,
            "stable_id": self.get_stable_id(),
            "sentence_position": self.sentence["position"],
            "char_start": self.char_start,
            "char_end": self.char_end,
            "text": self.get_span(),
            "implicit": False,
            "expander_key": "",
            "position": 0,
            "expanded_words": [],
        }


class ImplicitSpan(Span):
    """A span whose surface text differs from the document (e.g. the range
    "AB1000 to AB1002" expanding to "AB1001"). Carries its own text/words."""

    __slots__ = ("expander_key", "position", "own_text", "own_words")

    def __init__(
        self,
        sentence: dict,
        char_start: int,
        char_end: int,
        expander_key: str,
        position: int,
        text: str,
        words: list[str] | None = None,
        meta: Any = None,
    ):
        super().__init__(sentence, char_start, char_end, meta)
        self.expander_key = expander_key
        self.position = int(position)
        self.own_text = text
        self.own_words = words if words is not None else text.split()

    def get_span(self) -> str:
        return self.own_text

    def get_attrib_tokens(self, attrib: str = "words") -> list:
        if attrib == "words":
            return list(self.own_words)
        return super().get_attrib_tokens(attrib)

    def get_stable_id(self) -> str:
        return implicit_span_stable_id(
            self.doc_name,
            self.abs_char_start,
            self.abs_char_end,
            self.expander_key,
            self.position,
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, ImplicitSpan)
            and self.sentence_key() == other.sentence_key()
            and self.char_start == other.char_start
            and self.char_end == other.char_end
            and self.expander_key == other.expander_key
            and self.position == other.position
            and self.own_text == other.own_text
        )

    def __hash__(self) -> int:
        return hash(
            (
                self.sentence_key(),
                self.char_start,
                self.char_end,
                self.expander_key,
                self.position,
                self.own_text,
            )
        )

    def to_record(self, mention_type: str) -> dict:
        rec = super().to_record(mention_type)
        rec.update(
            {
                "stable_id": self.get_stable_id(),
                "text": self.own_text,
                "implicit": True,
                "expander_key": self.expander_key,
                "position": self.position,
                "expanded_words": list(self.own_words),
            }
        )
        return rec


def _char_to_word_index(char_offsets: list[int], ci: int) -> int:
    """Index of the word containing char index ``ci`` (reference semantics:
    last word whose start offset <= ci; ``span_mention.py:104-124``)."""
    i = bisect_right(char_offsets, ci) - 1
    return max(i, 0)


def span_from_record(sentence: dict, rec: dict) -> Span:
    """Rehydrate a Span/ImplicitSpan from a mention record + its sentence."""
    if rec.get("implicit"):
        return ImplicitSpan(
            sentence,
            rec["char_start"],
            rec["char_end"],
            rec["expander_key"],
            rec.get("position", 0),
            rec["text"],
            list(rec.get("expanded_words") or []) or None,
        )
    return Span(sentence, rec["char_start"], rec["char_end"])
