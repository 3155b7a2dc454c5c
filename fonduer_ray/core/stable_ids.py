"""Stable-ID construction.

Deterministic, run-independent string keys for every context node, mention and
candidate. These are the universal shuffle/dedup/join keys of the engine —
content-derived so re-runs are idempotent and resumable.

Format mirrors the reference semantics (fonduer ``parser/models/utils.py:7-65``):
``"{doc_name}::{type}:{idx...}"``; spans use document-absolute char offsets;
candidates are the ``~``-joined tuple of their argument mention stable IDs
(``fonduer utils/utils.py:51-69``).
"""

from __future__ import annotations

from collections.abc import Sequence

SEP = "::"


def document_stable_id(name: str) -> str:
    return f"{name}{SEP}document:0:0"


def context_stable_id(doc_name: str, ctx_type: str, *idx: int | str) -> str:
    """Generic positional context id, e.g. ``{doc}::section:0``."""
    suffix = ":".join(str(i) for i in idx)
    return f"{doc_name}{SEP}{ctx_type}:{suffix}"


def sentence_stable_id(doc_name: str, abs_start: int, abs_end: int) -> str:
    return f"{doc_name}{SEP}sentence:{abs_start}:{abs_end}"


def span_stable_id(doc_name: str, abs_start: int, abs_end: int) -> str:
    """Span mention over document-absolute char offsets (inclusive end)."""
    return f"{doc_name}{SEP}span_mention:{abs_start}:{abs_end}"


def implicit_span_stable_id(
    doc_name: str, abs_start: int, abs_end: int, expander_key: str, position: int
) -> str:
    """Implicit span: surface text differs from the document (e.g. expanded
    ranges); id carries the expander key + position like the reference
    (``candidates/models/implicit_span_mention.py:95-111``)."""
    return (
        f"{doc_name}{SEP}implicit_span_mention:"
        f"{abs_start}:{abs_end}:{expander_key}:{position}"
    )


def cell_stable_id(doc_name: str, pos: int, row_start: int, col_start: int) -> str:
    return f"{doc_name}{SEP}cell:{pos}:{row_start}:{col_start}"


def candidate_stable_id(mention_ids: Sequence[str]) -> str:
    """Candidate identity = tuple of constituent mention stable IDs."""
    return "~".join(mention_ids)
