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


class MentionStage:
    def __init__(self, specs: list[MentionSpec]):
        if len({s.name for s in specs}) != len(specs):
            raise ValueError("duplicate mention spec names")
        self.specs = specs

    def extract_doc(self, doc: dict) -> list[dict]:
        mentions: list[dict] = []
        seen: set[tuple[str, str]] = set()
        for spec in self.specs:
            for span in spec.matcher.apply(spec.space.apply(doc)):
                rec = span.to_record(spec.name)
                key = (spec.name, rec["stable_id"])
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
