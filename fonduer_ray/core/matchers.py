"""Matcher algebra: compositional predicates/filters on spans.

Reimplements the semantics of the reference's matcher combinators
(``candidates/matchers.py``): a matcher is a filter ``apply(spans) ->
spans`` with **longest-match-only** suppression — once a span matches,
later (shorter) spans contained in it are suppressed
(``matchers.py:58-71``; relies on the longest-first generation order of
``Ngrams``). Child composition on the base class is conjunction.

This is the main user-facing extension surface: mention matching for
subj/obj detection is written in this algebra.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

from fonduer_ray.core.spans import Span

WORDS = "words"


class Matcher:
    """Base matcher. ``children`` compose conjunctively with ``self._f``."""

    def __init__(self, *children: "Matcher", **opts):
        self.children = children
        self.opts = opts
        self.longest_match_only = bool(opts.get("longest_match_only", True))
        self.init()
        self._check_opts()

    def init(self) -> None:
        pass

    #: option names accepted beyond longest_match_only
    allowed_opts: tuple[str, ...] = ()

    def _check_opts(self) -> None:
        for key in self.opts:
            if key not in ("longest_match_only",) + self.allowed_opts:
                raise ValueError(f"{type(self).__name__}: unsupported option '{key}'")

    def _f(self, span: Span) -> bool:
        return True

    def f(self, span: Span) -> bool:
        """Own predicate AND all children's composed predicates."""
        return self._f(span) and all(c.f(span) for c in self.children)

    def apply(self, spans) -> Iterator[Span]:
        seen: list[Span] = []
        for span in spans:
            if self.f(span):
                if self.longest_match_only:
                    if any(span in s for s in seen):
                        continue
                    seen.append(span)
                yield span


class DictionaryMatch(Matcher):
    """Span text in a dictionary (case-folded by default, optional stemmer,
    ``inverse`` flips the predicate). Reference ``matchers.py:74-122``."""

    allowed_opts = ("d", "ignore_case", "inverse", "stemmer")

    def init(self) -> None:
        self.ignore_case = bool(self.opts.get("ignore_case", True))
        self.inverse = bool(self.opts.get("inverse", False))
        self.stemmer = self.opts.get("stemmer")
        if "d" not in self.opts:
            raise ValueError("Please supply a dictionary (list of strings) d=d")
        self.d = frozenset(self._norm(w) for w in self.opts["d"])

    def _stem(self, w: str) -> str:
        """Stem, tolerating stemmers that blow up on unicode (reference
        ``matchers.py:108-118``: UnicodeDecodeError -> return w as-is)."""
        try:
            fn = getattr(self.stemmer, "stem", self.stemmer)
            return fn(w)
        except UnicodeDecodeError:
            return w

    def _norm(self, w: str) -> str:
        w = w.lower() if self.ignore_case else w
        if self.stemmer is not None:
            w = self._stem(w)
        return w

    def _f(self, span: Span) -> bool:
        if not hasattr(span, "get_span"):
            raise ValueError(f"{type(self).__name__} only supports span mentions")
        return self.inverse != (self._norm(span.get_span()) in self.d)


class LambdaFunctionMatcher(Matcher):
    """Arbitrary user predicate; longest_match_only defaults False here
    (reference ``matchers.py:125-155``)."""

    allowed_opts = ("func",)

    def init(self) -> None:
        if "longest_match_only" not in self.opts:
            self.longest_match_only = False
        self.func: Callable[[Span], bool] = self.opts["func"]

    def _f(self, span: Span) -> bool:
        if not hasattr(span, "get_span"):
            raise ValueError(f"{type(self).__name__} only supports span mentions")
        return bool(self.func(span))


class Union(Matcher):
    """Disjunction of children."""

    def f(self, span: Span) -> bool:
        return any(c.f(span) for c in self.children)


class Intersect(Matcher):
    """Conjunction of children."""

    def f(self, span: Span) -> bool:
        return all(c.f(span) for c in self.children)


class Inverse(Matcher):
    """Negation of a single child."""

    def __init__(self, *children: Matcher, **opts):
        if len(children) != 1:
            raise ValueError("Inverse takes exactly one child matcher")
        super().__init__(*children, **opts)

    def f(self, span: Span) -> bool:
        return not self.children[0].f(span)


class Concat(Matcher):
    """Span = concatenation of two child-matched sub-spans at a word
    boundary (reference ``matchers.py:211-280``). Options: ``permutations``
    (try right+left too), ``left_required``/``right_required``,
    ``ignore_sep``/``sep`` (allow a separator token between the halves)."""

    allowed_opts = ("permutations", "left_required", "right_required", "ignore_sep", "sep")

    def init(self) -> None:
        self.permutations = bool(self.opts.get("permutations", False))
        self.left_required = bool(self.opts.get("left_required", True))
        self.right_required = bool(self.opts.get("right_required", True))
        self.ignore_sep = bool(self.opts.get("ignore_sep", True))
        self.sep = self.opts.get("sep", ",")

    def f(self, span: Span) -> bool:
        if len(self.children) != 2:
            raise ValueError("Concat takes two child matchers")
        if not hasattr(span, "get_num_words"):
            raise ValueError(f"{type(self).__name__} only supports span mentions")
        L, R = self.children
        if not self.left_required and R.f(span):
            return True
        if not self.right_required and L.f(span):
            return True
        num = span.get_num_words()
        for split in range(1, num):
            left = _word_slice(span, 0, split - 1)
            right = _word_slice(span, split, num - 1)
            if L.f(left) and R.f(right):
                return True
            if self.permutations and R.f(left) and L.f(right):
                return True
            # allow one separator token between the halves
            if self.ignore_sep and split < num - 1:
                sep_tok = span.get_attrib_tokens(WORDS)[split]
                if sep_tok == self.sep:
                    right2 = _word_slice(span, split + 1, num - 1)
                    if L.f(left) and R.f(right2):
                        return True
                    if self.permutations and R.f(left) and L.f(right2):
                        return True
        return False


class RegexMatch(Matcher):
    allowed_opts = ("rgx", "search", "full_match", "ignore_case", "sep", "attrib")

    def init(self) -> None:
        #: reference default sep="" (matchers.py:297); for attrib="words" the
        #: sep is REMOVED from the raw span text rather than used as a joiner
        #: (span_mention.py:142-160) — e.g. sep=" " turns "is apple" into
        #: "isapple"
        self.sep = self.opts.get("sep", "")
        self.attrib = self.opts.get("attrib", WORDS)
        if "rgx" not in self.opts:
            raise ValueError("Please supply a regular expression string as rgx=r")
        rgx = self.opts["rgx"]
        self.search = bool(self.opts.get("search", False))
        # grouped $-wrap so alternations anchor as a whole: (a|b)$ not a|b$
        # (reference matchers.py:306-314)
        if bool(self.opts.get("full_match", True)) and not rgx.endswith("$"):
            rgx = "(" + rgx + ")$"
        flags = re.UNICODE | (re.IGNORECASE if self.opts.get("ignore_case", True) else 0)
        self.rgx = re.compile(rgx, flags)

    def _get_attrib_span(self, span: Span) -> str:
        if not hasattr(span, "get_span"):
            raise ValueError(
                f"{type(self).__name__} only supports span mentions"
            )
        if self.attrib == WORDS:
            text = span.get_span()
            return text.replace(self.sep, "") if self.sep else text
        return span.get_attrib_span(self.attrib, sep=self.sep)


class RegexMatchSpan(RegexMatch):
    """Regex over the joined span text; ``search`` vs anchored ``match``
    with auto-``$`` full-match wrap (reference ``matchers.py:283-361``).

    The predicate depends only on the span's attrib text, and corpus
    vocabulary is Zipfian — a per-instance memo turns the hot-path regex
    into a dict hit (bounded size; hit rate ~99% on web text)."""

    def _f(self, span: Span) -> bool:
        text = self._get_attrib_span(span)
        memo = self.__dict__.setdefault("_memo", {})
        hit = memo.get(text)
        if hit is None:
            hit = bool(
                self.rgx.search(text) if self.search else self.rgx.match(text)
            )
            if len(memo) < 1_000_000:
                memo[text] = hit
        return hit


class RegexMatchEach(RegexMatch):
    """Regex must match every token of the chosen attrib (used on NER tags;
    reference ``matchers.py:364-390``)."""

    def _f(self, span: Span) -> bool:
        if not hasattr(span, "get_attrib_tokens"):
            raise ValueError(f"{type(self).__name__} only supports span mentions")
        toks = span.get_attrib_tokens(self.attrib)
        return bool(toks) and all(self.rgx.match(str(t)) for t in toks)


def _ner_matcher(tag_rgx: str, **opts) -> RegexMatchEach:
    opts.setdefault("attrib", "ner_tags")
    opts.setdefault("ignore_case", False)
    return RegexMatchEach(rgx=tag_rgx, **opts)


def PersonMatcher(**opts) -> RegexMatchEach:
    return _ner_matcher(r"PERSON", **opts)


def LocationMatcher(**opts) -> RegexMatchEach:
    return _ner_matcher(r"GPE|LOC", **opts)


def OrganizationMatcher(**opts) -> RegexMatchEach:
    return _ner_matcher(r"NORG|ORG", **opts)


def DateMatcher(**opts) -> RegexMatchEach:
    return _ner_matcher(r"DATE", **opts)


def NumberMatcher(**opts) -> RegexMatchEach:
    return _ner_matcher(r"CARDINAL|QUANTITY", **opts)


def MiscMatcher(**opts) -> RegexMatchEach:
    return _ner_matcher(r"MISC", **opts)


class LambdaFunctionFigureMatcher(Matcher):
    """Predicate on figure mentions (reference ``matchers.py:483-506``);
    non-figure inputs never match."""

    allowed_opts = ("func",)

    def init(self) -> None:
        if "longest_match_only" not in self.opts:
            self.longest_match_only = False
        self.func = self.opts["func"]

    def _f(self, span) -> bool:
        return getattr(span, "figure", None) is not None and bool(self.func(span))


class DoNothingMatcher(Matcher):
    """Pass-through."""


def _word_slice(span: Span, wi: int, wj: int) -> Span:
    """Sub-span covering words wi..wj (inclusive) of ``span``."""
    offs = span.sentence["char_offsets"]
    words = span.sentence["words"]
    ws = span.get_word_start_index()
    cs = offs[ws + wi]
    ce = offs[ws + wj] + len(words[ws + wj]) - 1
    return Span(span.sentence, cs, ce)
