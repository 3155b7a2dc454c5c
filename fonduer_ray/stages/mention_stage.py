"""Mention extraction stage: document rows -> document rows + mentions.

Reimplements the semantics of ``MentionExtractorUDF.apply``
(``candidates/mentions.py:527-592``): per document, for each (name, space,
matcher) spec, generate spans, filter through the matcher (longest-match-only
suppression), dedup by (mention_type, stable_id), and attach the flattened
mention records to the document row. Everything is doc-local — no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

import ray.data

from fonduer_ray.stages.util import map_stage

from fonduer_ray.core.matchers import Matcher
from fonduer_ray.core.ngrams import MentionSpace
from fonduer_ray.stages.schemas import DOC_MENTION_SCHEMA, MENTION_ROW_SCHEMA


@dataclass
class MentionSpec:
    """One mention type: its span space and its matcher."""

    name: str
    space: MentionSpace
    matcher: Matcher


def _unigram_word_pred(spec: MentionSpec):
    """Vectorization fast path: for the very common (MentionNgrams(1,1),
    leaf RegexMatchSpan/DictionaryMatch-on-words) spec shape, mention
    extraction reduces to a per-WORD predicate — no Span construction, no
    matcher-combinator call chain, no longest-match bookkeeping (unigrams
    can never contain each other, and the Ngrams seen-set dedup is a no-op
    for distinct word positions). Returns ``pred(word) -> bool`` or None
    when the generic path must run. Semantics are unchanged — the generic
    path remains the source of truth and the parity suites cover both."""
    from fonduer_ray.core.matchers import DictionaryMatch, RegexMatchSpan
    from fonduer_ray.core.ngrams import MentionNgrams

    space = spec.space
    if (
        type(space) is not MentionNgrams
        or space.n_min != 1
        or space.n_max != 1
        or space.split_rgx is not None
    ):
        return None
    m = spec.matcher
    if m.children:
        return None
    if type(m) is RegexMatchSpan and m.attrib == "words" and not m.sep:
        rgx, search = m.rgx, m.search
        if search:
            return lambda w: rgx.search(w) is not None
        return lambda w: rgx.match(w) is not None
    if type(m) is DictionaryMatch and m.stemmer is None:
        d, inv, ic = m.d, m.inverse, m.ignore_case
        if ic:
            return lambda w: inv != (w.lower() in d)
        return lambda w: inv != (w in d)
    return None


class MentionStage:
    def __init__(self, specs: list[MentionSpec]):
        if len({s.name for s in specs}) != len(specs):
            raise ValueError("duplicate mention spec names")
        self.specs = specs
        self._fast = [_unigram_word_pred(s) for s in specs]
        #: per-word predicate memo (Zipfian vocabulary -> ~99% hit rate)
        self._memo: list[dict[str, bool]] = [{} for _ in specs]

    def extract_doc(self, doc: dict) -> list[dict]:
        from fonduer_ray.core.spans import Span

        mentions: list[dict] = []
        seen: set[tuple[str, str]] = set()
        for si, spec in enumerate(self.specs):
            fast = self._fast[si]
            if fast is None:
                for span in spec.matcher.apply(spec.space.apply(doc)):
                    rec = span.to_record(spec.name)
                    key = (spec.name, rec["stable_id"])
                    if key not in seen:
                        seen.add(key)
                        mentions.append(rec)
                continue
            memo = self._memo[si]
            name = spec.name
            for sentence in doc["sentences"]:
                offs = sentence["char_offsets"]
                for i, w in enumerate(sentence["words"]):
                    hit = memo.get(w)
                    if hit is None:
                        hit = fast(w)
                        if len(memo) < 1_000_000:
                            memo[w] = hit
                    if not hit:
                        continue
                    rec = Span(sentence, offs[i], offs[i] + len(w) - 1).to_record(name)
                    key = (name, rec["stable_id"])
                    if key not in seen:
                        seen.add(key)
                        mentions.append(rec)
        return mentions

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.to_pylist()
        for doc in docs:
            doc["mentions"] = self.extract_doc(doc)
        return pa.Table.from_pylist(docs, schema=DOC_MENTION_SCHEMA)


def extract_mentions(
    ds: "ray.data.Dataset",
    specs: list[MentionSpec],
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32,
) -> "ray.data.Dataset":
    return map_stage(ds, MentionStage, {"specs": specs}, batch_size, concurrency)


def mentions_table(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Explode the nested mentions column into a flat mention table."""

    def explode(batch: pa.Table) -> pa.Table:
        rows = []
        for doc in batch.select(["doc_name", "mentions"]).to_pylist():
            for m in doc["mentions"]:
                rows.append({"doc_name": doc["doc_name"], **m})
        return pa.Table.from_pylist(rows, schema=MENTION_ROW_SCHEMA)

    return ds.map_batches(explode, batch_format="pyarrow")
