"""Document preprocessors: alternate input formats -> (url, html, lang) pages.

Ray-native re-expressions of the reference's preprocessor family
(``parser/preprocessors/``): each is a vectorized ``map_batches`` transform
(or a reader + transform) that normalizes a source format into the engine's
canonical page shape, after which the common parse stage takes over.

- text  (``text_doc_preprocessor.py:11-26``): wrap plain text in minimal HTML
- TSV   (``tsv_doc_preprocessor.py:11-65``): one ``name\\ttext`` line per doc
- CSV   (``csv_doc_preprocessor.py:13-108``): one row per doc, each column a
  ``<section>``, pluggable per-column parser rules
- hOCR  (``hocr_doc_preprocessor.py:15-166``): hOCR -> HTML with word bboxes
  hoisted onto ancestor attributes (``left/top/right/bottom/ppageno/tokens``)
  for the visual parser to consume
"""

from __future__ import annotations

from collections.abc import Callable
from html import escape

import pyarrow as pa

import ray.data

PAGE_SCHEMA = pa.schema(
    [("url", pa.string()), ("html", pa.binary()), ("lang", pa.string())]
)


def build_node(node_type: str, name: str, content: str) -> str:
    """Minimal HTML node builder (reference ``utils/utils_parser.py:5-45``).

    ``doc``/``section`` wrap already-built HTML; ``paragraph`` escapes its
    text content."""
    if node_type == "doc":
        return f"<html><body>{content}</body></html>"
    if node_type == "section":
        return f"<section name=\"{escape(name)}\">{content}</section>"
    if node_type == "paragraph":
        return f"<p>{escape(content, quote=False)}</p>"
    raise ValueError(node_type)


def pages_from_text(
    ds: "ray.data.Dataset", name_col: str, text_col: str, lang: str = "en"
) -> "ray.data.Dataset":
    """Plain-text rows -> pages: each text wrapped in <html><body><p>."""

    def wrap(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for name, text in zip(t[name_col].to_pylist(), t[text_col].to_pylist()):
            urls.append(str(name))
            htmls.append(
                build_node("doc", "", "")
                .replace("</body>", build_node("paragraph", "", text or "") + "</body>")
                .encode()
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array([lang] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(wrap, batch_format="pyarrow")


def pages_from_text_files(path: str, lang: str = "en") -> "ray.data.Dataset":
    """One plain-text FILE -> one page (reference ``TextDocPreprocessor``,
    ``text_doc_preprocessor.py:11-26``): the whole file body becomes a single
    ``<p>`` inside ``<html><body>``; doc name = basename sans extension."""
    import os

    ds = ray.data.read_binary_files(path, include_paths=True)

    def wrap(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for p, data in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            base = os.path.basename(p)
            name = base[: base.rfind(".")] if "." in base else base
            urls.append(name)
            text = data.decode("utf-8", errors="replace")
            htmls.append(
                ("<html><body>" + build_node("paragraph", "", text) + "</body></html>").encode()
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array([lang] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(wrap, batch_format="pyarrow")


def pages_from_tsv(
    path: str, lang: str = "en", header: bool = False
) -> "ray.data.Dataset":
    """``name\\ttext`` lines -> pages (one doc per line); ``header=True``
    drops the file's first line (reference ``tsv_doc_preprocessor.py:11-65``)."""
    ds = ray.data.read_text(path)
    first_line = None
    if header:
        with open(path) as f:
            first_line = f.readline().rstrip("\n")

    def parse(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for line in t["text"].to_pylist():
            if not line or "\t" not in line or (header and line == first_line):
                continue
            name, text = line.split("\t", 1)
            urls.append(name)
            htmls.append(
                ("<html><body>" + build_node("paragraph", "", text) + "</body></html>").encode()
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array([lang] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def pages_from_csv(
    path: str,
    name_col: str | None = None,
    parser_rules: dict[str, Callable[[str], str]] | None = None,
    lang: str = "en",
    keep_name_col: bool = False,
) -> "ray.data.Dataset":
    """CSV rows -> pages; every non-name column becomes a ``<section>`` whose
    content may be rewritten by a per-column rule (the reference's
    ``parser_rule`` hook, ``csv_doc_preprocessor.py:45-80``).

    ``name_col=None`` mirrors the reference exactly: ALL columns become
    sections and the doc name is the row's first column value;
    ``keep_name_col=True`` keeps an explicit name column as a section too."""
    ds = ray.data.read_csv(path)
    rules = parser_rules or {}

    def to_pages(t: pa.Table) -> pa.Table:
        if name_col is None or keep_name_col:
            cols = list(t.column_names)
        else:
            cols = [c for c in t.column_names if c != name_col]
        nm = name_col if name_col is not None else t.column_names[0]
        urls, htmls = [], []
        for row in t.to_pylist():
            sections = []
            for c in cols:
                v = "" if row[c] is None else str(row[c])
                rule = rules.get(c)
                body = rule(v) if rule else build_node("paragraph", c, v)
                sections.append(build_node("section", c, body))
            urls.append(str(row[nm]))
            htmls.append(("<html><body>" + "".join(sections) + "</body></html>").encode())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array([lang] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def hocr_to_html(hocr: str) -> str:
    """hOCR -> parseable HTML with per-word bbox attrs hoisted onto the
    line/paragraph element (``left/top/right/bottom/ppageno/tokens``
    space-joined lists), matching the shape the visual parser consumes
    (reference ``hocr_doc_preprocessor.py:15-166``)."""
    from fonduer_ray.parser.htmltree import parse_html, serialize

    root = parse_html(hocr.encode())
    if root is None:
        return "<html><body></body></html>"

    def page_of(node) -> str:
        cur = node
        while cur is not None:
            title = cur.get("title") or ""
            if (cur.get("class") or "") == "ocr_page":
                for part in title.split(";"):
                    part = part.strip()
                    if part.startswith("ppageno"):
                        return part.split()[1]
                return "0"
            cur = cur.parent
        return "0"

    def rewrite(node) -> None:
        for c in node.children:
            rewrite(c)
        if (node.get("class") or "") in ("ocr_line", "ocrx_line"):
            words, lefts, tops, rights, bottoms = [], [], [], [], []
            for w in [c for c in node.children if (c.get("class") or "") == "ocrx_word"]:
                title = w.get("title") or ""
                bbox = None
                for part in title.split(";"):
                    part = part.strip()
                    if part.startswith("bbox"):
                        bbox = [int(x) for x in part.split()[1:5]]
                if bbox and w.text.strip():
                    words.append(w.text.strip())
                    lefts.append(str(bbox[0]))
                    tops.append(str(bbox[1]))
                    rights.append(str(bbox[2]))
                    bottoms.append(str(bbox[3]))
            page = page_of(node)
            node.attrs = [
                ("tokens", " ".join(words)),
                ("left", " ".join(lefts)),
                ("top", " ".join(tops)),
                ("right", " ".join(rights)),
                ("bottom", " ".join(bottoms)),
                ("ppageno", page),
            ]
            node.tag = "p"
            node.text = " ".join(words)
            node.children = []

    rewrite(root)
    return serialize(root)


def pages_from_hocr(
    ds: "ray.data.Dataset", name_col: str, hocr_col: str, lang: str = "en"
) -> "ray.data.Dataset":
    def conv(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for name, hocr in zip(t[name_col].to_pylist(), t[hocr_col].to_pylist()):
            urls.append(str(name))
            h = hocr.decode() if isinstance(hocr, (bytes, bytearray)) else (hocr or "")
            htmls.append(hocr_to_html(h).encode())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array([lang] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(conv, batch_format="pyarrow")
