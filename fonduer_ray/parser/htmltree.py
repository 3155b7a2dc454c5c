"""Minimal deterministic HTML DOM for the parse stage.

Built on stdlib ``html.parser.HTMLParser`` (lxml is unavailable in this
environment). Provides the three tree operations the engine needs, with the
same *semantics* as the reference's lxml usage (``parser/parser.py:775-857``):

- parse bytes -> element tree (comments stripped, like ``strip_comments``),
- ``flatten_tags`` -- lxml ``strip_tags`` semantics: remove the element but
  keep and merge its text/tail and splice its children in place,
- ``serialize`` -- a pinned, deterministic re-serialization of the stripped
  tree; this string IS ``document.text`` and the byte-identical per-url
  invariant of the engine (reference invariant: ``parser.py:789-795``).

Pure Python, no Ray: runs inside map_batches workers.
"""

from __future__ import annotations

import re

from html import escape, unescape
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# tags whose end tag implicitly closes a previous open sibling of the same tag
_IMPLICIT_CLOSE = {
    "li": {"li"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "tr": {"tr", "td", "th"},
    "p": {"p"},
    "option": {"option"},
}


class Node:
    __slots__ = ("tag", "attrs", "children", "text", "tail", "parent")

    def __init__(self, tag: str, attrs: list[tuple[str, str | None]] | None = None):
        self.tag = tag
        self.attrs: list[tuple[str, str]] = [
            (k, v if v is not None else "") for k, v in (attrs or [])
        ]
        self.children: list[Node] = []
        self.text: str = ""
        self.tail: str = ""
        self.parent: Node | None = None

    def get(self, key: str, default: str | None = None) -> str | None:
        for k, v in self.attrs:
            if k == key:
                return v
        return default

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

    def xpath(self) -> str:
        """lxml-``getpath``-style path: 1-based [n] only when the element has
        same-tag siblings."""
        parts: list[str] = []
        node: Node | None = self
        while node is not None and node.parent is not None:
            siblings = [c for c in node.parent.children if c.tag == node.tag]
            if len(siblings) > 1:
                parts.append(f"{node.tag}[{siblings.index(node) + 1}]")
            else:
                parts.append(node.tag)
            node = node.parent
        if node is not None:
            parts.append(node.tag)
        return "/" + "/".join(reversed(parts))

    def __repr__(self) -> str:
        return f"<Node {self.tag} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    """Builds a Node tree; comments are dropped (reference strips them)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]

    # -- helpers -----------------------------------------------------------
    def _top(self) -> Node:
        return self.stack[-1]

    def _add_text(self, data: str) -> None:
        top = self._top()
        if top.children:
            top.children[-1].tail += data
        else:
            top.text += data

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        closers = _IMPLICIT_CLOSE.get(tag)
        if closers:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in closers:
                    del self.stack[i:]
                    break
                if t in ("table", "tr", "ul", "ol", "select", "#root", "body", "html"):
                    break
        node = Node(tag, attrs)
        self._top().append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._top().append(Node(tag, attrs))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore (malformed HTML tolerance)

    def handle_data(self, data: str) -> None:
        self._add_text(data)


# ---------------------------------------------------------------------------
# Fast tokenizer (regex) with stdlib fallback
#
# ``html.parser`` is layered pure Python (goahead -> check_for_whole_start_tag
# -> tagfind -> attrfind loop -> updatepos ...) and dominates the parse
# stage's CPU (profiled: ~30% of fused-extraction time). ``_fast_feed`` drives
# the SAME ``_TreeBuilder`` hooks from a single-pass regex tokenizer for the
# common well-formed subset, and returns False — triggering a from-scratch
# stdlib re-parse — for anything outside the subset it provably matches
# (bug-compat quirks included; each case below is annotated with the stdlib
# behavior it mirrors, from python3.11/html/parser.py).
# ---------------------------------------------------------------------------

#: strict start tag: name + zero-or-more whitespace-separated attributes
#: (double-quoted / single-quoted / non-quote-led bare values, ``=+`` value
#: indicator like stdlib attrfind_tolerant) + optional self-close. Anything
#: else (attr after quote with no space, leading-= names, unterminated
#: quotes, tabs-in-names...) fails the match and falls back.
_STRICT_START = re.compile(
    r"<([a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"((?:\s+[^\s/>=]+(?:\s*=+\s*(?:\"[^\"]*\"|'[^']*'|(?![\"'])[^\s>]+))?)*)"
    r"\s*(/?)>"
)
_STRICT_ATTR = re.compile(
    r"([^\s/>=]+)(\s*=+\s*(\"[^\"]*\"|'[^']*'|(?![\"'])[^\s>]+))?"
)
#: stdlib ``endtagfind``: ``</`` + optional space + name + optional space + >
_STRICT_END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
#: stdlib ``tagfind_tolerant`` name part (for tolerant end tags)
_TOLERANT_NAME = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)")
#: stdlib ``commentclose``
_COMMENT_CLOSE = re.compile(r"--\s*>")
#: CDATA close patterns for the two stdlib CDATA_CONTENT_ELEMENTS
_CDATA_CLOSE = {
    name: (
        re.compile(rf"</\s*{name}\s*>", re.I),
        re.compile(rf"</\s*{name}", re.I),
    )
    for name in ("script", "style")
}


def _fast_feed(builder: "_TreeBuilder", rawdata: str) -> bool:
    """Feed ``rawdata`` through ``builder``'s hooks via regex tokenization.

    Returns True on success; False means "outside the verified subset" — the
    caller must discard the builder and re-parse with stdlib ``HTMLParser``.
    Equivalence contract (tested in tests/test_parser_properties.py): for
    every input where this returns True, the resulting tree is byte-identical
    to the stdlib-built tree."""
    i, n = 0, len(rawdata)
    find = rawdata.find
    handle_data = builder.handle_data
    while i < n:
        j = find("<", i)
        if j < 0:
            j = n
        if i < j:
            # stdlib: handle_data(unescape(chunk)) per inter-tag chunk
            handle_data(unescape(rawdata[i:j]))
        i = j
        if i >= n:
            break
        c = rawdata[i + 1 : i + 2]
        if c.isalpha():
            m = _STRICT_START.match(rawdata, i)
            if m is None:
                return False  # tolerant-only start tag or incomplete at EOF
            name = m.group(1).lower()
            attrs_s = m.group(2)
            attrs: list[tuple[str, str | None]] = []
            if attrs_s and not attrs_s.isspace():
                for am in _STRICT_ATTR.finditer(attrs_s):
                    aname, rest, aval = am.group(1, 2, 3)
                    if not rest:
                        aval = None
                    elif aval[:1] == "'" == aval[-1:] or aval[:1] == '"' == aval[-1:]:
                        aval = aval[1:-1]
                    if aval:
                        aval = unescape(aval)
                    attrs.append((aname.lower(), aval))
            i = m.end()
            if m.group(3):
                builder.handle_startendtag(name, attrs)
                continue
            builder.handle_starttag(name, attrs)
            if name in ("script", "style"):
                # stdlib CDATA mode: raw data (no charref conversion) until a
                # full ``</name>`` end tag; close-ish sequences that are not
                # full end tags pass through verbatim as data either way, so
                # searching for the STRICT close directly is equivalent.
                strict_close, loose_close = _CDATA_CLOSE[name]
                sm = strict_close.search(rawdata, i)
                if sm is not None:
                    if sm.start() > i:
                        handle_data(rawdata[i : sm.start()])
                    builder.handle_endtag(name)
                    i = sm.end()
                elif loose_close.search(rawdata, i):
                    return False  # partial close at EOF: stdlib chunk quirks
                else:
                    break  # unterminated CDATA: stdlib drops it at close()
        elif c == "/":
            m = _STRICT_END.match(rawdata, i)
            if m is not None:
                builder.handle_endtag(m.group(1).lower())
                i = m.end()
            elif rawdata.startswith("</>", i):
                i += 3  # stdlib: consumed, no event
            elif find(">", i + 1) < 0:
                return False  # incomplete end tag at EOF
            else:
                nm = _TOLERANT_NAME.match(rawdata, i + 2)
                if nm is None:
                    i = find(">", i + 2) + 1  # bogus comment: dropped
                    if i == 0:
                        return False
                else:
                    # stdlib tolerant end tag: name, then skip to '>'
                    builder.handle_endtag(nm.group(1).lower())
                    i = find(">", nm.end()) + 1
        elif rawdata.startswith("<!--", i):
            cm = _COMMENT_CLOSE.search(rawdata, i + 4)
            if cm is None:
                return False  # unterminated comment: stdlib data-flush quirks
            i = cm.end()  # comments are dropped (builder has no hook)
        elif c == "?":
            g = find(">", i + 2)
            if g < 0:
                return False
            i = g + 1  # processing instruction: dropped
        elif c == "!":
            if rawdata.startswith("<![", i):
                return False  # marked section (rare): stdlib-only
            g = find(">", i + 2)
            if g < 0:
                return False
            i = g + 1  # doctype / bogus declaration: dropped
        else:
            # stdlib: '<' followed by anything else is literal text
            handle_data("<")
            i += 1
    return True


def parse_html(html: bytes | str) -> Node | None:
    """Parse HTML into a tree; returns the single ``<html>`` element if
    present (reference requires exactly one, ``html_doc_preprocessor.py:18-22``),
    else a synthetic root wrapping everything."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    if not _fast_feed(builder, html):
        builder = _TreeBuilder()
        builder.feed(html)
        builder.close()
    root = builder.root
    html_nodes = [c for c in root.children if c.tag == "html"]
    if len(html_nodes) == 1:
        node = html_nodes[0]
        node.parent = None
        return node
    if not root.children and not root.text.strip():
        return None
    # no (or multiple) <html>: wrap in a synthetic html element
    wrapper = Node("html")
    wrapper.text = root.text
    for c in root.children:
        wrapper.append(c)
    return wrapper


def flatten_tags(node: Node, tags: frozenset[str] | set[str]) -> None:
    """lxml ``strip_tags`` semantics, applied recursively in place: each child
    whose tag is in ``tags`` is removed; its text merges into the previous
    sibling's tail (or parent's text), its children are spliced in place, and
    its tail goes onto the last spliced child (or merges where text went)."""
    for c in node.children:
        flatten_tags(c, tags)
    new_children: list[Node] = []

    def merge_text(s: str) -> None:
        if not s:
            return
        if new_children:
            new_children[-1].tail += s
        else:
            node.text += s

    for c in node.children:
        if c.tag in tags:
            merge_text(c.text)
            for gc in c.children:
                gc.parent = node
                new_children.append(gc)
            merge_text(c.tail)
        else:
            new_children.append(c)
    node.children = new_children


def serialize(node: Node, with_tail: bool = False) -> str:
    """Deterministic serialization; defines the ``document.text`` invariant.

    ``<tag k="v">text + children + tail...</tag>``; attributes in document
    order; text minimally escaped (&, <, >, and " inside attributes); void
    and empty elements serialize as ``<tag/>``."""
    out: list[str] = []
    _serialize_into(node, out)
    if with_tail and node.tail:
        out.append(escape(node.tail, quote=False))
    return "".join(out)


def _serialize_into(node: Node, out: list[str]) -> None:
    attrs = "".join(f' {k}="{escape(v)}"' for k, v in node.attrs)
    if not node.children and not node.text:
        out.append(f"<{node.tag}{attrs}/>")
    else:
        out.append(f"<{node.tag}{attrs}>")
        if node.text:
            out.append(escape(node.text, quote=False))
        for c in node.children:
            _serialize_into(c, out)
            if c.tail:
                out.append(escape(c.tail, quote=False))
        out.append(f"</{node.tag}>")
