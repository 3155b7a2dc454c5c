"""data_model_utils: the LF/throttler helper DSL.

The portable "query language" labeling functions and throttlers are written
in — reimplements the semantics of the reference's ``data_model_utils``
package (textual ``textual.py:11-197``, tabular ``tabular.py:31-561``,
structural ``structural.py:17-221``, generic ``utils.py:40-83``) over this
engine's nested document rows. All helpers are doc-local pure functions of
``Span``s (and the doc row they ride in), so LFs written against the
reference's API port with the same call shapes.

Tokens are lower-cased lemmas by default when available (``attrib="lemmas"``
falls back to lower-cased words), matching the reference's n-gram getters.
"""

from __future__ import annotations

from collections.abc import Iterator

from fonduer_ray.core.ngrams import tokens_to_ngrams
from fonduer_ray.core.spans import Span


def _doc_of(span: Span) -> dict | None:
    return span.meta.get("doc") if isinstance(span.meta, dict) else None


def _attrib_tokens(sentence: dict, attrib: str) -> list[str]:
    if attrib == "lemmas" and not sentence.get("lemmas"):
        return [w.lower() for w in sentence["words"]]
    return [str(t) for t in (sentence.get(attrib) or sentence["words"])]


# ---------------------------------------------------------------------------
# textual
# ---------------------------------------------------------------------------


def same_sentence(spans) -> bool:
    return all(
        s is not None and s.sentence_key() == spans[0].sentence_key() for s in spans
    )


def get_between_ngrams(
    spans, attrib: str = "words", n_min: int = 1, n_max: int = 1, lower: bool = True
) -> Iterator[str]:
    """Tokens strictly between a binary candidate's two spans (same
    sentence only; reference ``textual.py:40-74``)."""
    a, b = spans[0], spans[1]
    if a.sentence_key() != b.sentence_key():
        return
    lo = min(a.get_word_end_index(), b.get_word_end_index())
    hi = max(a.get_word_start_index(), b.get_word_start_index())
    toks = _attrib_tokens(a.sentence, attrib)[lo + 1 : hi]
    yield from tokens_to_ngrams(toks, n_min, n_max, lower=lower)


def get_left_ngrams(
    span: Span, window: int = 3, attrib: str = "words", n_min: int = 1, n_max: int = 1,
    lower: bool = True,
) -> Iterator[str]:
    ws = span.get_word_start_index()
    toks = _attrib_tokens(span.sentence, attrib)[max(0, ws - window) : ws]
    yield from tokens_to_ngrams(toks, n_min, n_max, lower=lower)


def get_right_ngrams(
    span: Span, window: int = 3, attrib: str = "words", n_min: int = 1, n_max: int = 1,
    lower: bool = True,
) -> Iterator[str]:
    we = span.get_word_end_index()
    toks = _attrib_tokens(span.sentence, attrib)[we + 1 : we + 1 + window]
    yield from tokens_to_ngrams(toks, n_min, n_max, lower=lower)


def get_sentence_ngrams(span: Span, attrib: str = "words", n_min: int = 1,
                        n_max: int = 1, lower: bool = True) -> Iterator[str]:
    """All other tokens of the span's sentence (window 100 in the reference,
    i.e. effectively the whole sentence; ``textual.py:126-152``)."""
    yield from get_left_ngrams(span, 100, attrib, n_min, n_max, lower)
    yield from get_right_ngrams(span, 100, attrib, n_min, n_max, lower)


def get_neighbor_sentence_ngrams(
    span: Span, doc: dict, d: int = 1, attrib: str = "words",
    n_min: int = 1, n_max: int = 1, lower: bool = True,
) -> Iterator[str]:
    """Tokens of sentences within +/-d positions (``textual.py:155-197``)."""
    pos = span.sentence["position"]
    for s in doc["sentences"]:
        if s["position"] != pos and abs(s["position"] - pos) <= d:
            yield from tokens_to_ngrams(_attrib_tokens(s, attrib), n_min, n_max, lower=lower)


# ---------------------------------------------------------------------------
# tabular
# ---------------------------------------------------------------------------


def _tab(span: Span) -> dict | None:
    s = span.sentence
    if s.get("table_position") is None:
        return None
    return s


def same_table(spans) -> bool:
    tabs = [_tab(s) for s in spans]
    return all(t is not None for t in tabs) and len(
        {t["table_position"] for t in tabs}
    ) == 1


def same_cell(spans) -> bool:
    return same_table(spans) and len(
        {s.sentence.get("cell_position") for s in spans}
    ) == 1 and spans[0].sentence.get("cell_position") is not None


def _rows_overlap(a: dict, b: dict) -> bool:
    if a.get("row_start") is None or b.get("row_start") is None:
        return False
    return not (a["row_end"] < b["row_start"] or b["row_end"] < a["row_start"])


def _cols_overlap(a: dict, b: dict) -> bool:
    if a.get("col_start") is None or b.get("col_start") is None:
        return False
    return not (a["col_end"] < b["col_start"] or b["col_end"] < a["col_start"])


def same_row(spans) -> bool:
    return same_table(spans) and _rows_overlap(spans[0].sentence, spans[1].sentence)


def same_col(spans) -> bool:
    return same_table(spans) and _cols_overlap(spans[0].sentence, spans[1].sentence)


def is_tabular_aligned(spans) -> bool:
    return same_row(spans) or same_col(spans)


def get_max_row_num(span: Span, doc: dict) -> int | None:
    t = _tab(span)
    if t is None:
        return None
    rows = [
        s["row_end"] for s in doc["sentences"]
        if s.get("table_position") == t["table_position"] and s.get("row_end") is not None
    ]
    return max(rows) if rows else None


def get_min_row_num(span: Span, doc: dict) -> int | None:
    t = _tab(span)
    if t is None:
        return None
    rows = [
        s["row_start"] for s in doc["sentences"]
        if s.get("table_position") == t["table_position"] and s.get("row_start") is not None
    ]
    return min(rows) if rows else None


def get_cell_ngrams(span: Span, doc: dict, attrib: str = "words",
                    n_min: int = 1, n_max: int = 1, lower: bool = True) -> Iterator[str]:
    """Tokens of other sentences in the same cell + the span's own sentence
    neighbors; nothing for non-tabular mentions (``tabular.py:220-260``)."""
    t = _tab(span)
    if t is None or t.get("cell_position") is None:
        return
    yield from get_sentence_ngrams(span, attrib, n_min, n_max, lower)
    for s in doc["sentences"]:
        if (
            s.get("cell_position") == t["cell_position"]
            and s["position"] != t["position"]
        ):
            yield from tokens_to_ngrams(_attrib_tokens(s, attrib), n_min, n_max, lower=lower)


def _aligned_sentences(span: Span, doc: dict, axis: str, spread=(0, 0)) -> list[dict]:
    t = _tab(span)
    if t is None or t.get("row_start") is None:
        return []
    out = []
    for s in doc["sentences"]:
        if s.get("table_position") != t["table_position"] or s["position"] == t["position"]:
            continue
        if s.get("row_start") is None:
            continue
        if axis == "row":
            lo, hi = t["row_start"] - spread[0], t["row_end"] + spread[1]
            if not (s["row_end"] < lo or s["row_start"] > hi):
                out.append(s)
        else:
            lo, hi = t["col_start"] - spread[0], t["col_end"] + spread[1]
            if not (s["col_end"] < lo or s["col_start"] > hi):
                out.append(s)
    return out


def _axis_ngrams(span, doc, axis, attrib, n_min, n_max, spread, lower):
    """Sentence ngrams first, then aligned cells; nothing for non-tabular
    (reference ``_get_axis_ngrams``, tabular.py:509-533)."""
    if _tab(span) is None:
        return
    yield from get_sentence_ngrams(span, attrib, n_min, n_max, lower)
    for s in _aligned_sentences(span, doc, axis, spread):
        yield from tokens_to_ngrams(_attrib_tokens(s, attrib), n_min, n_max, lower=lower)


def get_row_ngrams(span: Span, doc: dict, attrib: str = "words", n_min: int = 1,
                   n_max: int = 1, spread=(0, 0), lower: bool = True) -> Iterator[str]:
    yield from _axis_ngrams(span, doc, "row", attrib, n_min, n_max, spread, lower)


def get_col_ngrams(span: Span, doc: dict, attrib: str = "words", n_min: int = 1,
                   n_max: int = 1, spread=(0, 0), lower: bool = True) -> Iterator[str]:
    yield from _axis_ngrams(span, doc, "col", attrib, n_min, n_max, spread, lower)


def get_aligned_ngrams(span: Span, doc: dict, **kw) -> Iterator[str]:
    yield from get_row_ngrams(span, doc, **kw)
    yield from get_col_ngrams(span, doc, **kw)


def get_head_ngrams(span: Span, doc: dict, axis: str | None = None,
                    attrib: str = "words", n_min: int = 1, n_max: int = 1,
                    lower: bool = True) -> Iterator[str]:
    """Tokens of the leftmost cell of the row and/or topmost cell of the
    column (``tabular.py:437-483``): both axes when ``axis`` is None; yields
    NOTHING at all if the mention itself sits at the head position of a
    requested axis (the reference returns, aborting both axes)."""
    t = _tab(span)
    if t is None or t.get("row_start") is None:
        return
    axes = (axis,) if axis else ("row", "col")
    for ax in axes:
        own = t["col_start"] if ax == "row" else t["row_start"]
        if own == 0:
            return
        head = [
            s
            for s in _aligned_sentences(span, doc, ax)
            if (s["col_start"] if ax == "row" else s["row_start"]) == 0
        ]
        for s in head:
            yield from tokens_to_ngrams(_attrib_tokens(s, attrib), n_min, n_max, lower=lower)


def get_neighbor_cell_ngrams(
    span: Span, doc: dict, dist: int = 1, directions: bool = False,
    attrib: str = "words", n_min: int = 1, n_max: int = 1, lower: bool = True,
) -> Iterator[str | tuple[str, str]]:
    """Own-sentence tokens (undirected) then tokens of cells within ``dist``
    grid steps along exactly one axis, row-aligned cells before col-aligned,
    tagged UP/DOWN/LEFT/RIGHT when ``directions`` (``tabular.py:260-332``;
    the reference re-runs the neighbor scan per own-sentence token — an
    indentation quirk we do not reproduce)."""
    t = _tab(span)
    if t is None or t.get("row_start") is None:
        return
    yield from get_sentence_ngrams(span, attrib, n_min, n_max, lower)
    seen_positions = set()
    for ax in ("row", "col"):
        for s in _aligned_sentences(span, doc, ax):
            if s["position"] in seen_positions:
                continue
            row_d = 0 if _rows_overlap(t, s) else (
                s["row_start"] - t["row_end"] if s["row_start"] > t["row_end"]
                else s["row_end"] - t["row_start"]
            )
            col_d = 0 if _cols_overlap(t, s) else (
                s["col_start"] - t["col_end"] if s["col_start"] > t["col_end"]
                else s["col_end"] - t["col_start"]
            )
            if (row_d == 0) == (col_d == 0):
                continue
            if abs(row_d) + abs(col_d) > dist:
                continue
            seen_positions.add(s["position"])
            if directions:
                if col_d == 0:
                    direction = "DOWN" if row_d > 0 else "UP"
                else:
                    direction = "RIGHT" if col_d > 0 else "LEFT"
                for g in tokens_to_ngrams(_attrib_tokens(s, attrib), n_min, n_max, lower=lower):
                    yield (g, direction)
            else:
                for g in tokens_to_ngrams(_attrib_tokens(s, attrib), n_min, n_max, lower=lower):
                    yield g



# ---------------------------------------------------------------------------
# structural
# ---------------------------------------------------------------------------


def get_tag(span: Span) -> str:
    return span.sentence.get("html_tag") or ""


def get_attributes(span: Span) -> list[str]:
    return list(span.sentence.get("html_attrs") or [])


def _xpath_parts(span: Span) -> list[str]:
    return [p for p in (span.sentence.get("xpath") or "").split("/") if p]


def get_parent_tag(span: Span) -> str:
    parts = _xpath_parts(span)
    return parts[-2].split("[")[0] if len(parts) >= 2 else ""


def get_ancestor_tag_names(span: Span) -> list[str]:
    return [p.split("[")[0] for p in _xpath_parts(span)[:-1]]


def get_ancestor_class_names(span: Span) -> list[str]:
    out = []
    for a in get_attributes(span):
        if a.startswith("class="):
            out.extend(a[6:].split())
    return out


def get_ancestor_id_names(span: Span) -> list[str]:
    return [a[3:] for a in get_attributes(span) if a.startswith("id=")]


def common_ancestor(spans) -> list[str]:
    """Shared xpath prefix, split on "/" with the leading empty segment kept
    (reference ``structural.py:172-188`` output shape)."""
    paths = [(s.sentence.get("xpath") or "").split("/") for s in spans]
    out: list[str] = []
    for segs in zip(*paths):
        if len(set(segs)) != 1:
            break
        out.append(segs[0])
    return out


def lowest_common_ancestor_depth(spans) -> int:
    common = common_ancestor(spans)
    return min(
        len((s.sentence.get("xpath") or "").split("/")) - len(common) for s in spans
    )


# ---------------------------------------------------------------------------
# generic
# ---------------------------------------------------------------------------


def is_superset(a, b) -> bool:
    return set(a) >= set(b)


def overlap(a, b) -> bool:
    return not set(a).isdisjoint(b)


def get_matches(matcher, doc: dict, space) -> list[Span]:
    """Run a matcher over a span space for one doc (debug helper,
    reference ``utils.py:61-83``)."""
    return list(matcher.apply(space.apply(doc)))
