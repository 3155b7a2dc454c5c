"""Visual parser: per-word bounding boxes onto sentences (hOCR path).

Reimplements the semantics of the reference's ``HocrVisualParser``
(``parser/visual_parser/hocr_visual_parser.py:15-153``): sentences parsed
from hOCR-derived HTML carry ``tokens/left/top/right/bottom/ppageno``
attribute lists (hoisted by ``sources/preprocessors.hocr_to_html``); this
stage aligns those hOCR tokens with the sentence's own words, writes
per-word ``page/top/left/bottom/right`` arrays, and strips the bbox attrs.

The PDF path of the reference (``pdf_visual_parser.py:40-362``) shells out
to ``pdftotext``, which is unavailable here; ``PdfVisualParser`` raises
``NotImplementedError`` but documents the actor-pool shape it would use.

Pure per-document function -> runs inside the parse ``map_batches`` stage
or as its own stage.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from fonduer_ray.stages.schemas import DOC_SCHEMA
from fonduer_ray.stages.util import default_concurrency

_BBOX_KEYS = ("tokens", "left", "top", "right", "bottom", "ppageno")


def _attr_map(html_attrs: list[str]) -> dict[str, str]:
    out = {}
    for a in html_attrs:
        if "=" in a:
            k, v = a.split("=", 1)
            out[k] = v
    return out


def attach_word_bboxes(doc: dict) -> dict:
    """Align hOCR tokens with sentence words; fills the VisualMixin arrays.

    Alignment: sentences produced from one hOCR line share its xpath; the
    sentence's words are matched as a contiguous subsequence of the line's
    token list, scanning left to right (hOCR tokens and our whitespace
    tokenization agree because ``hocr_to_html`` writes the line text as the
    space-joined tokens)."""
    consumed: dict[str, int] = {}
    for s in doc["sentences"]:
        attrs = _attr_map(s.get("html_attrs") or [])
        if "tokens" not in attrs or not attrs.get("left"):
            continue
        tokens = attrs["tokens"].split(" ")
        lefts = [int(x) for x in attrs["left"].split(" ")]
        tops = [int(x) for x in attrs["top"].split(" ")]
        rights = [int(x) for x in attrs["right"].split(" ")]
        bottoms = [int(x) for x in attrs["bottom"].split(" ")]
        page = int(attrs.get("ppageno", "0"))
        start = consumed.get(s["xpath"], 0)
        n = len(s["words"])
        # scan for the word subsequence (periods removed by the sentencizer
        # may shorten words; match by prefix)
        idx = start
        pages, l, t, r, b = [], [], [], [], []
        for w in s["words"]:
            while idx < len(tokens) and not tokens[idx].startswith(w[:1]):
                idx += 1
            if idx >= len(tokens):
                break
            pages.append(page)
            l.append(lefts[idx])
            t.append(tops[idx])
            r.append(rights[idx])
            b.append(bottoms[idx])
            idx += 1
        consumed[s["xpath"]] = idx
        if len(pages) == n:
            s["page"], s["left"], s["top"], s["right"], s["bottom"] = pages, l, t, r, b
        # strip bbox attrs either way (reference strips them after linking)
        s["html_attrs"] = [
            a for a in s["html_attrs"] if a.split("=", 1)[0] not in _BBOX_KEYS
        ]
    return doc


class HocrVisualStage:
    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = [attach_word_bboxes(d) for d in batch.to_pylist()]
        return pa.Table.from_pylist(docs, schema=DOC_SCHEMA)


def parse_visual(ds: "ray.data.Dataset", concurrency=None) -> "ray.data.Dataset":
    return ds.map_batches(
        HocrVisualStage,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency or default_concurrency(),
    )


class PdfVisualParser:
    """Placeholder for the pdftotext-based visual parser: the binary is not
    available in this environment. At scale this runs as an actor-pool
    ``map_batches`` stage (subprocess + per-doc linker state in the actor),
    exactly like the hOCR stage above."""

    def __init__(self, pdf_path: str):
        raise NotImplementedError(
            "pdftotext is unavailable in this environment; use the hOCR "
            "visual path (sources.preprocessors.pages_from_hocr + "
            "parser.visual.parse_visual)"
        )


# -- bbox math (reference utils/utils_visual.py:65-137) ----------------------


def bbox_from_sentence(s: dict) -> tuple[int, int, int, int, int] | None:
    """(page, top, left, bottom, right) aggregated over word boxes."""
    if not s.get("page"):
        return None
    return (
        s["page"][0],
        min(s["top"]),
        min(s["left"]),
        max(s["bottom"]),
        max(s["right"]),
    )


def is_horz_aligned(spans, tol: float = 1.5) -> bool:
    boxes = [bbox_from_sentence(sp.sentence) for sp in spans]
    if any(b is None for b in boxes):
        return False
    return (
        len({b[0] for b in boxes}) == 1
        and max(b[1] for b in boxes) - min(b[1] for b in boxes) <= tol
    )


def is_vert_aligned(spans, tol: float = 2.0) -> bool:
    boxes = [bbox_from_sentence(sp.sentence) for sp in spans]
    if any(b is None for b in boxes):
        return False
    return (
        len({b[0] for b in boxes}) == 1
        and max(b[2] for b in boxes) - min(b[2] for b in boxes) <= tol
    )


def same_page(spans) -> bool:
    boxes = [bbox_from_sentence(sp.sentence) for sp in spans]
    return all(b is not None for b in boxes) and len({b[0] for b in boxes}) == 1


def get_page(span) -> int | None:
    b = bbox_from_sentence(span.sentence)
    return b[0] if b else None
