"""Candidate extraction stage: document rows + mentions -> + candidates.

Reimplements the semantics of ``CandidateExtractorUDF.apply``
(``candidates/candidates.py:220-325``): per document, per relation, the
cross-product of per-type mention lists, optional ``[None]`` for nullable
arguments, a user throttler predicate over the span tuple, the binary-relation
policies (drop self-relations, drop nested, drop symmetric duplicates), and a
stable-id dedup. The train/dev/test ``split`` is a deterministic hash of the
document name (replacing the caller-assigned split column,
``candidates.py:27-213``). Doc-local: no shuffle.
"""

from __future__ import annotations

import hashlib
import itertools
from collections.abc import Callable
from dataclasses import dataclass, field

import pyarrow as pa

import ray.data

from fonduer_ray.stages.util import map_stage

from fonduer_ray.core.ngrams import ContextMention
from fonduer_ray.core.spans import Span, span_from_record
from fonduer_ray.core.stable_ids import candidate_stable_id
from fonduer_ray.stages.schemas import CANDIDATE_ROW_SCHEMA, DOC_CANDIDATE_SCHEMA

#: receives the reconstructed mention objects (Span, ImplicitSpan or — for
#: figure/empty-node mentions — ContextMention), None only for nullable slots,
#: mirroring the reference where throttlers get the Mention whose .context may
#: be a Figure (candidates.py:279-287)
Throttler = Callable[[tuple[Span | ContextMention | None, ...]], bool]


def _mention_from_record(
    doc_name: str, sent_by_pos: dict, m: dict | None
) -> Span | ContextMention | None:
    """Rehydrate the mention object a record was flattened from.

    Non-span mentions (``sentence_position == -1``: figures, empty context
    nodes) become ``ContextMention``s keyed by (doc, ctx_type, position) so the
    reference's self/nested checks compare real contexts instead of None
    (reference candidates.py:291-306 uses ``cand[j][1].context``)."""
    if m is None:
        return None
    if m["sentence_position"] >= 0:
        return span_from_record(sent_by_pos[m["sentence_position"]], m)
    return ContextMention(doc_name, m["expander_key"], m["position"], m["text"])


@dataclass
class RelationSpec:
    name: str
    arg_types: tuple[str, ...]
    throttler: Throttler | None = None
    self_relations: bool = False
    nested_relations: bool = False
    #: reference default True (candidates.py:43); False prunes by MENTION
    #: LIST INDEX ordering (candidates.py:304), not by span order
    symmetric_relations: bool = True
    nullables: tuple[bool, ...] = field(default=())

    def __post_init__(self):
        if not self.nullables:
            self.nullables = tuple(False for _ in self.arg_types)


def doc_split(doc_name: str, fractions: tuple[float, float] = (0.8, 0.9)) -> int:
    """Deterministic train(0)/dev(1)/test(2) assignment by doc-name hash."""
    h = int.from_bytes(hashlib.md5(doc_name.encode()).digest()[:8], "big")
    u = h / 2**64
    return 0 if u < fractions[0] else (1 if u < fractions[1] else 2)


class CandidateStage:
    def __init__(self, relations: list[RelationSpec], split_fractions=(0.8, 0.9)):
        self.relations = relations
        self.split_fractions = split_fractions

    def extract_doc(self, doc: dict) -> list[dict]:
        sent_by_pos = {s["position"]: s for s in doc["sentences"]}
        by_type: dict[str, list[dict]] = {}
        for m in doc["mentions"]:
            by_type.setdefault(m["mention_type"], []).append(m)
        split = doc_split(doc["doc_name"], self.split_fractions)
        out: list[dict] = []
        # rehydrate each mention's span object ONCE per doc (the product
        # below would otherwise rebuild it per combination)
        span_cache: dict[int, Span | ContextMention | None] = {}

        def span_of(m: dict | None):
            if m is None:
                return None
            k = id(m)
            sp = span_cache.get(k)
            if sp is None:
                sp = _mention_from_record(doc["doc_name"], sent_by_pos, m)
                span_cache[k] = sp
            return sp

        for rel in self.relations:
            seen: set[str] = set()
            arg_lists = []
            for t, nullable in zip(rel.arg_types, rel.nullables):
                lst: list[dict | None] = list(by_type.get(t, []))
                if nullable:
                    lst.append(None)
                arg_lists.append(lst)
            for idx_combo in itertools.product(*(list(enumerate(lst)) for lst in arg_lists)):
                combo = tuple(m for _, m in idx_combo)
                spans = tuple(span_of(m) for m in combo)
                if len(combo) == 2:
                    a, b = spans
                    # None == None skips the all-None pair too
                    # (reference candidates.py:296-306)
                    if not rel.self_relations and a == b:
                        continue
                    if (
                        not rel.nested_relations
                        and a is not None
                        and b is not None
                        and (a in b or b in a)
                    ):
                        continue
                    if (
                        not rel.symmetric_relations
                        and idx_combo[0][0] > idx_combo[1][0]
                    ):
                        continue
                if rel.throttler is not None and not rel.throttler(spans):
                    continue
                sid = candidate_stable_id(
                    [m["stable_id"] if m is not None else "" for m in combo]
                )
                if sid in seen:
                    continue
                seen.add(sid)
                out.append(
                    {
                        "relation": rel.name,
                        "stable_id": sid,
                        "split": split,
                        "arg_types": list(rel.arg_types),
                        "arg_stable_ids": [
                            m["stable_id"] if m else "" for m in combo
                        ],
                        "arg_sentence_positions": [
                            m["sentence_position"] if m else -1 for m in combo
                        ],
                        "arg_char_starts": [
                            m["char_start"] if m else -1 for m in combo
                        ],
                        "arg_char_ends": [m["char_end"] if m else -1 for m in combo],
                        "arg_texts": [m["text"] if m else "" for m in combo],
                        "arg_implicit": [
                            bool(m["implicit"]) if m else False for m in combo
                        ],
                    }
                )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.to_pylist()
        for doc in docs:
            doc["candidates"] = self.extract_doc(doc)
        return pa.Table.from_pylist(docs, schema=DOC_CANDIDATE_SCHEMA)


def _span_order_key(span: Span):
    return (span.sentence["position"], span.char_start, span.char_end)


def extract_candidates(
    ds: "ray.data.Dataset",
    relations: list[RelationSpec],
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32,
) -> "ray.data.Dataset":
    return map_stage(ds, CandidateStage, {"relations": relations}, batch_size, concurrency)


def candidates_table(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Explode the nested candidates column into a flat candidate table."""

    def explode(batch: pa.Table) -> pa.Table:
        rows = []
        for doc in batch.select(["doc_name", "candidates"]).to_pylist():
            for c in doc["candidates"]:
                rows.append({"doc_name": doc["doc_name"], **c})
        return pa.Table.from_pylist(rows, schema=CANDIDATE_ROW_SCHEMA)

    return ds.map_batches(explode, batch_format="pyarrow")
