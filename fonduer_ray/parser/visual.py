"""Visual parser: per-word bounding boxes onto sentences (hOCR path).

Reimplements the semantics of the reference's ``HocrVisualParser``
(``parser/visual_parser/hocr_visual_parser.py:15-153``): sentences parsed
from hOCR-derived HTML carry ``tokens/left/top/right/bottom/ppageno``
attribute lists (hoisted by ``sources/preprocessors.hocr_to_html``); this
stage aligns those hOCR tokens with the sentence's own words, writes
per-word ``page/top/left/bottom/right`` arrays, and strips the bbox attrs.

The PDF path of the reference (``pdf_visual_parser.py:40-362``) shells out
to ``pdftotext``; ``PdfVisualParser`` below instead uses the native PDF
text-layer extractor in ``sources/pdf.py`` plus a faithful port of the
reference's 3-pass html<->pdf word linker — no external binary needed.

Pure per-document function -> runs inside the parse ``map_batches`` stage
or as its own stage.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from fonduer_ray.stages.schemas import DOC_SCHEMA

_BBOX_KEYS = ("tokens", "left", "top", "right", "bottom", "ppageno")


def _attr_map(html_attrs: list[str]) -> dict[str, str]:
    out = {}
    for a in html_attrs:
        if "=" in a:
            k, v = a.split("=", 1)
            out[k] = v
    return out


def attach_word_bboxes(doc: dict) -> dict:
    """Align hOCR tokens with sentence words; fills the VisualMixin arrays
    (reference ``hocr_visual_parser.py:15-153``, which uses spacy.gold.align
    with one-to-many fallbacks).

    Char-cursor alignment: sentences produced from one hOCR line share its
    xpath; the line text is the space-joined hOCR token list, so every
    sentence word is consumed from the token stream character by character —
    several words inside one token ("bold," -> "bold" + ",") share that
    token's bbox; a word spanning several tokens gets the min/max merge of
    their boxes."""
    consumed: dict[str, tuple[int, int]] = {}
    for s in doc["sentences"]:
        attrs = _attr_map(s.get("html_attrs") or [])
        if "tokens" not in attrs or not attrs.get("left"):
            continue
        tokens = attrs["tokens"].split(" ")
        lefts = [int(x) for x in attrs["left"].split(" ")]
        tops = [int(x) for x in attrs["top"].split(" ")]
        rights = [int(x) for x in attrs["right"].split(" ")]
        bottoms = [int(x) for x in attrs["bottom"].split(" ")]
        # 1-based pages (reference hocr_visual_parser.py:144)
        page = int(attrs.get("ppageno", "0")) + 1
        tok_idx, off = consumed.get(s["xpath"], (0, 0))
        n = len(s["words"])
        pages, l, t, r, b = [], [], [], [], []
        ok = True
        for w in s["words"]:
            matched = False
            while tok_idx < len(tokens):
                if off >= len(tokens[tok_idx]):
                    tok_idx += 1
                    off = 0
                    continue
                rem = tokens[tok_idx][off:]
                if rem.startswith(w):
                    # word fully inside current token
                    pages.append(page)
                    l.append(lefts[tok_idx])
                    t.append(tops[tok_idx])
                    r.append(rights[tok_idx])
                    b.append(bottoms[tok_idx])
                    off += len(w)
                    matched = True
                    break
                if w.startswith(rem):
                    # word spans token boundary: merge boxes min/max
                    need = len(w)
                    ml, mt, mr, mb = lefts[tok_idx], tops[tok_idx], rights[tok_idx], bottoms[tok_idx]
                    need -= len(rem)
                    j = tok_idx + 1
                    while need > 0 and j < len(tokens):
                        ml = min(ml, lefts[j])
                        mt = min(mt, tops[j])
                        mr = max(mr, rights[j])
                        mb = max(mb, bottoms[j])
                        need -= len(tokens[j])
                        j += 1
                    pages.append(page)
                    l.append(ml)
                    t.append(mt)
                    r.append(mr)
                    b.append(mb)
                    tok_idx = j - 1
                    off = len(tokens[tok_idx]) + need  # position inside last token
                    matched = True
                    break
                # char the sentencizer dropped (e.g. the '.' left behind in
                # "world." when the line holds two sentences): skip it and
                # retry this word against the rest of the token stream
                off += 1
            if not matched:
                ok = False
                break
        consumed[s["xpath"]] = (tok_idx, off)
        if ok and len(pages) == n:
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
    from fonduer_ray.stages.util import map_stage

    return map_stage(ds, HocrVisualStage, {}, 32, concurrency)


class PdfVisualParser:
    """PDF visual parser (reference ``pdf_visual_parser.py:40-362``) backed
    by the native text-layer extractor + 3-pass linker in ``sources/pdf.py``
    (poppler's pdftotext is unavailable here; simple Flate/plain text-layer
    PDFs are handled natively, with the same word-splitting, block sort and
    linker passes as the reference). Same contract: a directory of
    ``{doc_name}.pdf`` files; ``parse(doc)`` fills the per-word bbox arrays.
    At scale this runs inside a ``map_batches`` stage exactly like the hOCR
    path above."""

    def __init__(self, pdf_path: str, search_max: int = 200):
        import os

        if not os.path.isdir(pdf_path):
            raise ValueError(f"No directory exists at {pdf_path}!")
        self.pdf_path = pdf_path
        self.search_max = search_max

    def _pdf_file(self, document_name: str) -> str | None:
        import os

        for ext in (".pdf", ".PDF"):
            p = os.path.join(self.pdf_path, document_name + ext)
            if os.path.isfile(p):
                return p
        return None

    def is_parsable(self, document_name: str) -> bool:
        return self._pdf_file(document_name) is not None

    def parse(self, doc: dict) -> dict:
        from fonduer_ray.sources.pdf import attach_pdf_bboxes

        path = self._pdf_file(doc["doc_name"])
        if path is None:
            return doc
        with open(path, "rb") as f:
            data = f.read()
        return attach_pdf_bboxes(doc, data, search_max=self.search_max)


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


def _shrunk_overlap(lo1: float, hi1: float, lo2: float, hi2: float, pad: float = 1.5) -> bool:
    """Interval overlap after shrinking both by ``pad`` (reference
    ``utils_visual.py:65-103``: touching edges do NOT count as aligned)."""
    return not (lo1 + pad > hi2 - pad or lo2 + pad > hi1 - pad)


def is_horz_aligned(spans) -> bool:
    """All spans' bboxes share y-range overlap, 1.5pt-shrunk (reference
    ``bbox_horz_aligned`` via ``data_model_utils/visual.py:35-49``)."""
    boxes = [bbox_from_sentence(sp.sentence) for sp in spans]
    if any(b is None for b in boxes):
        return False
    b0 = boxes[0]
    return all(_shrunk_overlap(b[1], b[3], b0[1], b0[3]) for b in boxes)


def is_vert_aligned(spans) -> bool:
    """All spans' bboxes share x-range overlap, 1.5pt-shrunk."""
    boxes = [bbox_from_sentence(sp.sentence) for sp in spans]
    if any(b is None for b in boxes):
        return False
    b0 = boxes[0]
    return all(_shrunk_overlap(b[2], b[4], b0[2], b0[4]) for b in boxes)


def same_page(spans) -> bool:
    boxes = [bbox_from_sentence(sp.sentence) for sp in spans]
    return all(b is not None for b in boxes) and len({b[0] for b in boxes}) == 1


def get_page(span) -> int | None:
    b = bbox_from_sentence(span.sentence)
    return b[0] if b else None


def is_vert_aligned_left(spans, tol: float = 2.0) -> bool:
    """Same page + left edges within tolerance (``utils_visual.py:83-95``)."""
    boxes = [bbox_from_sentence(sp.sentence) for sp in spans]
    if any(b is None for b in boxes):
        return False
    return (
        len({b[0] for b in boxes}) == 1
        and max(b[2] for b in boxes) - min(b[2] for b in boxes) <= tol
    )


def is_vert_aligned_right(spans, tol: float = 2.0) -> bool:
    """Same page + right edges within tolerance."""
    boxes = [bbox_from_sentence(sp.sentence) for sp in spans]
    if any(b is None for b in boxes):
        return False
    return (
        len({b[0] for b in boxes}) == 1
        and max(b[4] for b in boxes) - min(b[4] for b in boxes) <= tol
    )


def is_vert_aligned_center(spans, tol: float = 5.0) -> bool:
    """Same page + horizontal centers within tolerance (±5pt,
    ``utils_visual.py:110-123``)."""
    boxes = [bbox_from_sentence(sp.sentence) for sp in spans]
    if any(b is None for b in boxes):
        return False
    centers = [(b[2] + b[4]) / 2.0 for b in boxes]
    return len({b[0] for b in boxes}) == 1 and max(centers) - min(centers) <= tol


def _page_sentences(doc: dict, page: int) -> list[dict]:
    return [s for s in doc["sentences"] if s.get("page") and s["page"][0] == page]


def span_bbox(span) -> tuple[int, int, int, int, int] | None:
    """(page, top, left, bottom, right) over the span's own WORD RANGE
    (reference ``span_mention.py:169-180`` ``get_bbox``), not the whole
    sentence."""
    if not span.sentence.get("page"):
        return None
    pages = span.get_attrib_tokens("page")
    if not pages:
        return None
    return (
        pages[0],
        min(span.get_attrib_tokens("top")),
        min(span.get_attrib_tokens("left")),
        max(span.get_attrib_tokens("bottom")),
        max(span.get_attrib_tokens("right")),
    )


def _direction_ngrams(
    direction: str, span, doc: dict, attrib: str, lower: bool,
    from_sentence: bool, n_min: int, n_max: int,
):
    """Reference ``_get_direction_ngrams`` (``data_model_utils/visual.py:
    219-257``): alignment is tested against the SPAN's word-range bbox.
    ``from_sentence=True`` yields token ngrams of every OTHER aligned
    sentence on the page; ``from_sentence=False`` yields the text of every
    word-level ngram (over all page sentences, own included) whose own bbox
    aligns with the span's, excluding ngrams containing/contained in it."""
    from fonduer_ray.core.ngrams import Ngrams, tokens_to_ngrams

    b = span_bbox(span)
    if b is None:
        return
    lo, hi = (1, 3) if direction == "horz" else (2, 4)
    ngrams_space = Ngrams(n_min=n_min, n_max=n_max) if not from_sentence else None
    for s in _page_sentences(doc, b[0]):
        if from_sentence:
            if s is span.sentence:
                continue
            sb = bbox_from_sentence(s)
            if sb is None or not _shrunk_overlap(sb[lo], sb[hi], b[lo], b[hi]):
                continue
            yield from tokens_to_ngrams(
                list(s.get(attrib) or s["words"]), n_min, n_max, lower=lower
            )
        else:
            for ts in ngrams_space.apply_sentence(s):
                tb = span_bbox(ts)
                if tb is None or not _shrunk_overlap(tb[lo], tb[hi], b[lo], b[hi]):
                    continue
                if ts in span or span in ts:
                    continue
                w = ts.get_span()
                yield w.lower() if lower else w


def get_horz_ngrams(
    span, doc: dict, attrib: str = "words", lower: bool = True,
    from_sentence: bool = True, n_min: int = 1, n_max: int = 1,
):
    """Ngrams horizontally aligned (1.5pt-shrunk y-overlap) with the span's
    bbox on its page (``data_model_utils/visual.py:155-184``)."""
    yield from _direction_ngrams(
        "horz", span, doc, attrib, lower, from_sentence, n_min, n_max
    )


def get_vert_ngrams(
    span, doc: dict, attrib: str = "words", lower: bool = True,
    from_sentence: bool = True, n_min: int = 1, n_max: int = 1,
):
    """Ngrams vertically aligned (1.5pt-shrunk x-overlap) with the span's
    bbox."""
    yield from _direction_ngrams(
        "vert", span, doc, attrib, lower, from_sentence, n_min, n_max
    )


def get_page_vert_percentile(
    span, doc: dict, page_height: float = 792.0
) -> float | None:
    """Top edge as a fraction of the page height (``visual.py:311-330``)."""
    b = bbox_from_sentence(span.sentence)
    return None if b is None else b[1] / page_height


def get_page_horz_percentile(
    span, doc: dict, page_width: float = 612.0
) -> float | None:
    b = bbox_from_sentence(span.sentence)
    return None if b is None else b[2] / page_width


def get_visual_aligned_lemmas(span, doc: dict):
    """Lemmas sharing a horizontal or vertical alignment group with the
    span on its page (``visual.py:384-440``)."""
    seen = set()
    for w in get_horz_ngrams(span, doc, attrib="lemmas"):
        if w not in seen:
            seen.add(w)
            yield w
    for w in get_vert_ngrams(span, doc, attrib="lemmas"):
        if w not in seen:
            seen.add(w)
            yield w
