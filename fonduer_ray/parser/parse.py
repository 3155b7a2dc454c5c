"""HTML -> hierarchical context tree (the flagship per-document transform).

Reimplements the *semantics* of the reference parser
(``parser/parser.py:266-857``) as a pure per-document function suitable for a
stateless ``map_batches`` stage:

- comments stripped, ``flatten`` tags (span/br) stripped with text merging,
  then the stripped tree is re-serialized into ``document.text`` — the
  byte-identical-per-url invariant (``parser.py:789-795``),
- DFS with two-phase text/tail visits (``parser.py:601-609,822-852``):
  ``node.text`` paragraphs attach to the node's context, ``node.tail``
  paragraphs attach to the *parent* node's context,
- ``<table>`` with occupancy-grid rowspan/colspan resolution and nested
  tables (``parser.py:266-392``),
- ``<img>/<figure>`` with img-in-figure collapse and multi-img degradation
  (``parser.py:394-470``), ``<caption>/<figcaption>`` (``parser.py:703-750``),
- blacklisted subtrees (style/script) skipped during the walk but retained
  in the serialized text (``parser.py:74-78``),
- sentences via a pluggable sentencizer with doc-absolute char offsets and
  stable IDs (``parser.py:472-581``).

Output: one nested dict per document (lists of section/paragraph/table/cell/
figure/caption/sentence records) — the single-row-per-document representation
that keeps every downstream "join" doc-local.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from fonduer_ray.core.stable_ids import document_stable_id, sentence_stable_id
from fonduer_ray.parser.htmltree import Node, flatten_tags, parse_html, serialize
from fonduer_ray.parser.lingual import SimpleSentencizer

_UNICODE_DASHES = (
    "[֊־‐‑‒–—―⁓"
    "⁻₋−⸗⸺⸻〜〰゠︱︲﹘﹣－]"
)


@dataclass
class ParserConfig:
    blacklist: tuple[str, ...] = ("style", "script")
    flatten: tuple[str, ...] = ("span", "br")
    strip: bool = True
    replacements: tuple[tuple[str, str], ...] = ((_UNICODE_DASHES, "-"),)
    structural: bool = True
    tabular: bool = True
    sentence_delim: str = "."
    #: "simple" = reference SimpleParser (split on delim, drop empties);
    #: "punct" = spaCy-sentencizer-like (keep terminal punctuation,
    #: punctuation-only paragraphs become sentences); or ANY object with
    #: ``split_sentences(text) -> iter of {text, words, char_offsets,
    #: start}`` — the custom-LingualParser extension hook (reference
    #: ``lingual_parser/lingual_parser.py:7-46``)
    sentencizer: object = "simple"

    def compiled_replacements(self) -> list[tuple[re.Pattern, str]]:
        return [(re.compile(rgx), repl) for rgx, repl in self.replacements]


@dataclass
class _Ctx:
    """Enclosing context positions during the walk (None = not inside)."""

    section: int | None = None
    paragraph: int | None = None
    table: int | None = None
    cell: int | None = None
    figure: int | None = None
    caption: int | None = None
    # live grid coords of the current cell
    row_start: int | None = None
    row_end: int | None = None
    col_start: int | None = None
    col_end: int | None = None

    def child(self, **kw) -> "_Ctx":
        d = self.__dict__.copy()
        d.update(kw)
        return _Ctx(**d)


@dataclass
class _TableState:
    grid: dict = field(default_factory=dict)
    row_idx: int = -1
    next_col: int = 0


class _DocBuilder:
    def __init__(self, doc_name: str, cfg: ParserConfig):
        self.doc_name = doc_name
        self.cfg = cfg
        self.replacements = cfg.compiled_replacements()
        if cfg.sentencizer == "punct":
            from fonduer_ray.parser.lingual import PunctSentencizer

            self.sentencizer = PunctSentencizer()
        elif hasattr(cfg.sentencizer, "split_sentences"):
            self.sentencizer = cfg.sentencizer  # user-supplied LingualParser
        else:
            self.sentencizer = SimpleSentencizer(cfg.sentence_delim)
        #: text of <head><style>, for CSS-class style merging (set by
        #: parse_document before the walk)
        self.style_text: str = ""
        self.sections: list[dict] = []
        self.paragraphs: list[dict] = []
        self.tables: list[dict] = []
        self.cells: list[dict] = []
        self.figures: list[dict] = []
        self.captions: list[dict] = []
        self.sentences: list[dict] = []
        self.abs_base = 0

    def _merge_class_styles(self, node: Node, html_attrs: list[str]) -> list[str]:
        """Extend the style html_attr with the <head><style> CSS block of the
        node's class (reference ``parser.py:522-561``): if the node already
        has a style attr the block is appended raw (CR/LF/tab removed); a
        missing style attr gains a whitespace-collapsed ``style=`` entry."""
        html_attrs = list(html_attrs)
        cur_style_index = None
        for index, attr in enumerate(html_attrs):
            if attr.find("style") >= 0:
                cur_style_index = index
                break
        for k, v in node.attrs:
            if k == "class":
                rgx = re.compile(r"(." + re.escape(v) + r")([\n\s\r]*)\{(.*?)\}", re.DOTALL)
                m = rgx.search(self.style_text)
                if m is not None:
                    body = m.group(3).replace("\r", "").replace("\n", "").replace("\t", "")
                    if cur_style_index is not None:
                        html_attrs[cur_style_index] += body
                    else:
                        html_attrs.append(
                            "style=" + re.sub(r"\s{1,}", " ", body.strip())
                        )
                break
        return html_attrs

    # -- paragraph + sentences --------------------------------------------
    def add_paragraph(
        self, raw_text: str, node: Node, ctx: _Ctx, xpath: str
    ) -> None:
        text = raw_text.strip() if self.cfg.strip else raw_text
        for rgx, repl in self.replacements:
            text = rgx.sub(repl, text)
        if not text:
            return
        pos = len(self.paragraphs)
        para = {
            "position": pos,
            "name": node.get("name"),
            "section_position": ctx.section,
            "table_position": ctx.table,
            "cell_position": ctx.cell,
            "figure_position": ctx.figure,
            "caption_position": ctx.caption,
        }
        self.paragraphs.append(para)
        if not self.cfg.structural:
            xpath = ""
        html_tag = node.tag if self.cfg.structural else ""
        html_attrs = [f"{k}={v}" for k, v in node.attrs] if self.cfg.structural else []
        if self.cfg.structural and self.style_text:
            html_attrs = self._merge_class_styles(node, html_attrs)
        for sent in self.sentencizer.split_sentences(text):
            stext = sent["text"]
            if not sent["words"]:
                continue
            abs_offsets = [self.abs_base + o for o in sent["char_offsets"]]
            # reference advance: end of last word, no inter-sentence gap
            # (parser.py:498-507: abs_offset + char_offsets[-1] + len(words[-1]))
            abs_end = self.abs_base + sent["char_offsets"][-1] + len(sent["words"][-1])
            record = {
                "doc_name": self.doc_name,
                "position": len(self.sentences),
                "stable_id": sentence_stable_id(self.doc_name, self.abs_base, abs_end),
                "paragraph_position": pos,
                "section_position": ctx.section,
                "text": stext,
                "words": sent["words"],
                "char_offsets": sent["char_offsets"],
                "abs_char_offsets": abs_offsets,
                "lemmas": [],
                "pos_tags": [],
                "ner_tags": [],
                "dep_parents": [],
                "dep_labels": [],
                "xpath": xpath,
                "html_tag": html_tag,
                "html_attrs": html_attrs,
                "table_position": ctx.table,
                "cell_position": ctx.cell,
                "row_start": ctx.row_start,
                "row_end": ctx.row_end,
                "col_start": ctx.col_start,
                "col_end": ctx.col_end,
                "page": [],
                "top": [],
                "left": [],
                "bottom": [],
                "right": [],
            }
            self.sentences.append(record)
            self.abs_base = abs_end

    # -- walk --------------------------------------------------------------
    def walk(
        self,
        node: Node,
        ctx: _Ctx,
        table_state: _TableState | None,
        path: str = "",
        parent_path: str = "",
    ) -> None:
        """``path``/``parent_path`` are the lxml-getpath-style xpaths of
        ``node`` and its parent, built INCREMENTALLY during the descent
        (equivalent to ``Node.xpath()`` — property-tested) so each
        paragraph does not pay an upward walk with per-level sibling
        scans."""
        tag = node.tag
        if tag in self.cfg.blacklist:
            return  # subtree and its tail are skipped entirely
        my_ctx = ctx
        my_table_state = table_state

        if tag in ("html", "section"):
            pos = len(self.sections)
            self.sections.append({"position": pos, "name": node.get("name")})
            my_ctx = ctx.child(section=pos)
        elif tag == "table" and self.cfg.tabular:
            pos = len(self.tables)
            self.tables.append(
                {"position": pos, "section_position": ctx.section, "parent_cell": ctx.cell}
            )
            my_ctx = ctx.child(
                table=pos, cell=None, row_start=None, row_end=None,
                col_start=None, col_end=None,
            )
            my_table_state = _TableState()
        elif tag == "tr" and my_table_state is not None:
            my_table_state.row_idx += 1
            my_table_state.next_col = 0
        elif tag in ("td", "th") and my_table_state is not None and ctx.table is not None:
            my_ctx, _cell = self._open_cell(node, ctx, my_table_state)
        elif tag in ("img", "figure"):
            handled, my_ctx = self._open_figure(node, ctx)
            if handled == "skip-children":
                # multi-img <figure>: imgs became their own figures; walk imgs only
                for c in node.children:
                    if c.tag == "img":
                        self._add_figure(c, ctx, url=c.get("src") or "")
                self._tail(node, ctx, parent_path)
                return
        elif tag in ("caption", "figcaption"):
            parent_table = ctx.table if tag == "caption" else None
            parent_figure = ctx.figure if tag == "figcaption" else None
            if parent_table is not None or parent_figure is not None:
                pos = len(self.captions)
                self.captions.append(
                    {
                        "position": pos,
                        "table_position": parent_table,
                        "figure_position": parent_figure,
                    }
                )
                my_ctx = ctx.child(caption=pos)

        # phase 1: node text
        if node.text:
            self.add_paragraph(node.text, node, my_ctx, path)
        # children
        children = node.children
        if children:
            if len(children) == 1:
                c = children[0]
                self.walk(
                    c, my_ctx, my_table_state, path + "/" + c.tag, path
                )
            else:
                tag_total: dict[str, int] = {}
                for c in children:
                    tag_total[c.tag] = tag_total.get(c.tag, 0) + 1
                seen: dict[str, int] = {}
                for c in children:
                    t = c.tag
                    if tag_total[t] > 1:
                        k = seen.get(t, 0) + 1
                        seen[t] = k
                        seg = f"{t}[{k}]"
                    else:
                        seg = t
                    self.walk(
                        c, my_ctx, my_table_state, path + "/" + seg, path
                    )
        # phase 2: tail attaches to the *parent* context and node's parent
        self._tail(node, ctx, parent_path)

    def _tail(self, node: Node, parent_ctx: _Ctx, parent_path: str) -> None:
        if node.tail and node.parent is not None:
            self.add_paragraph(node.tail, node.parent, parent_ctx, parent_path)

    def _open_cell(self, node: Node, ctx: _Ctx, ts: _TableState):
        if ts.row_idx < 0:  # td without tr (malformed): synthesize row 0
            ts.row_idx = 0
        row = ts.row_idx
        col = ts.next_col
        while (row, col) in ts.grid:
            col += 1
        rowspan = _int_attr(node, "rowspan", 1)
        colspan = _int_attr(node, "colspan", 1)
        for r in range(row, row + rowspan):
            for c in range(col, col + colspan):
                ts.grid[(r, c)] = True
        ts.next_col = col + colspan
        pos = len(self.cells)
        cell = {
            "position": pos,
            "table_position": ctx.table,
            "row_start": row,
            "row_end": row + rowspan - 1,
            "col_start": col,
            "col_end": col + colspan - 1,
            "html_tag": node.tag,
        }
        self.cells.append(cell)
        return (
            ctx.child(
                cell=pos,
                row_start=row,
                row_end=row + rowspan - 1,
                col_start=col,
                col_end=col + colspan - 1,
            ),
            cell,
        )

    def _add_figure(self, node: Node, ctx: _Ctx, url: str) -> int:
        pos = len(self.figures)
        self.figures.append(
            {
                "position": pos,
                "section_position": ctx.section,
                "cell_position": ctx.cell,
                "url": url,
            }
        )
        return pos

    def _open_figure(self, node: Node, ctx: _Ctx):
        if node.tag == "img":
            if ctx.figure is not None:
                return "noop", ctx  # img already collapsed into its <figure>
            self._add_figure(node, ctx, url=node.get("src") or "")
            return "noop", ctx
        imgs = [c for c in node.children if c.tag == "img"]
        if len(imgs) > 1:
            return "skip-children", ctx  # degrade: one Figure per img, no caption
        url = imgs[0].get("src") or "" if imgs else node.get("src") or ""
        pos = self._add_figure(node, ctx, url=url)
        return "noop", ctx.child(figure=pos)


def _int_attr(node: Node, key: str, default: int) -> int:
    v = node.get(key)
    if v is None:
        return default
    try:
        return max(int(v), 1)
    except ValueError:
        return default


def parse_document(
    doc_name: str, html: bytes | str, cfg: ParserConfig | None = None
) -> dict | None:
    """Parse one web page into a nested context-tree row; None for unparseable
    (empty) input — the caller routes those to an error side-channel instead of
    the reference's silent drop (``parser.py:257-264``)."""
    cfg = cfg or ParserConfig()
    root = parse_html(html)
    if root is None:
        return None
    flatten_tags(root, frozenset(cfg.flatten))
    text = serialize(root)
    builder = _DocBuilder(doc_name, cfg)
    for head in root.children:
        if head.tag == "head":
            for child in head.children:
                if child.tag == "style" and child.text:
                    builder.style_text = child.text
                    break
            break
    builder.walk(root, _Ctx(), None, "/" + root.tag, "")
    return {
        "doc_name": doc_name,
        "stable_id": document_stable_id(doc_name),
        "text": text,
        "sections": builder.sections,
        "paragraphs": builder.paragraphs,
        "tables": builder.tables,
        "cells": builder.cells,
        "figures": builder.figures,
        "captions": builder.captions,
        "sentences": builder.sentences,
    }
