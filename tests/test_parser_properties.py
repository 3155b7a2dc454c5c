"""Property-based tests for the parser (SURVEY.md §7.4: "property-test
against an oracle recursive implementation").

Random small HTML trees are generated with hypothesis; the iterative
two-phase DFS of ``parse_document`` is checked against an independent
RECURSIVE oracle for paragraph emission order, and serialization is checked
to be a fixed point (parse(serialize(x)) == serialize(x) byte-identically —
the per-url invariant's testable core without lxml in the environment)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from fonduer_ray.parser.htmltree import parse_html, serialize
from fonduer_ray.parser.parse import ParserConfig, parse_document

TAGS = ["div", "p", "section", "b", "i", "ul", "li", "h1", "td"]
WORDS = ["alpha", "beta", "gamma", "delta", "x1", "Y2"]

text_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=3).map(" ".join)


@st.composite
def html_node(draw, depth=0):
    tag = draw(st.sampled_from(TAGS))
    text = draw(text_st)
    tail = draw(text_st)
    if depth >= 3:
        children = []
    else:
        children = draw(
            st.lists(html_node(depth=depth + 1), min_size=0, max_size=3)
        )
    return (tag, text, children, tail)


def render(node) -> str:
    tag, text, children, tail = node
    return (
        f"<{tag}>{text}" + "".join(render(c) for c in children) + f"</{tag}>{tail}"
    )


@st.composite
def html_doc(draw):
    body = draw(st.lists(html_node(), min_size=0, max_size=4))
    return "<html><body>" + "".join(render(n) for n in body) + "</body></html>"


def recursive_paragraph_oracle(node, out):
    """Reference-semantics recursive DFS: node.text first, children in
    order, each child's TAIL after that child's subtree (two-phase visit,
    reference parser.py:601-609)."""
    if node.text and node.text.strip():
        out.append(node.text.strip())
    for child in node.children:
        recursive_paragraph_oracle(child, out)
        if child.tail and child.tail.strip():
            out.append(child.tail.strip())


@settings(max_examples=60, deadline=None)
@given(html_doc())
def test_dfs_paragraph_order_matches_recursive_oracle(html):
    doc = parse_document("prop", html, ParserConfig())
    got = [
        " ".join(
            s["text"]
            for s in doc["sentences"]
            if s["paragraph_position"] == p["position"]
        )
        for p in doc["paragraphs"]
    ]
    root = parse_html(html)
    expected: list[str] = []
    recursive_paragraph_oracle(root, expected)
    # every expected paragraph text appears, in order (sentencization may
    # split; compare the concatenated character streams)
    assert "".join("".join(t.split()) for t in got) == "".join(
        "".join(t.split()) for t in expected
    )
    assert len(got) == len(expected)


@settings(max_examples=60, deadline=None)
@given(html_doc())
def test_serialized_text_fixed_point(html):
    doc = parse_document("prop", html, ParserConfig())
    text1 = doc["text"]
    doc2 = parse_document("prop", text1, ParserConfig())
    assert doc2["text"] == text1  # byte-identical re-parse
    # and the context tree is identical too
    assert doc2["sentences"] == doc["sentences"]
    assert doc2["paragraphs"] == doc["paragraphs"]


@settings(max_examples=60, deadline=None)
@given(html_doc())
def test_abs_offsets_monotone_and_consistent(html):
    doc = parse_document("prop", html, ParserConfig())
    prev_end = -1
    for s in doc["sentences"]:
        assert s["abs_char_offsets"][0] >= prev_end
        for off, rel, w in zip(
            s["abs_char_offsets"], s["char_offsets"], s["words"]
        ):
            assert off - s["abs_char_offsets"][0] == rel - s["char_offsets"][0]
        prev_end = s["abs_char_offsets"][-1]


@st.composite
def html_doc_with_flatten(draw):
    """Docs containing span/br (the flatten set) — exercises strip_tags'
    text-merging before serialization."""
    global TAGS
    tags = TAGS + ["span", "br", "span"]

    @st.composite
    def node(draw, depth=0):
        tag = draw(st.sampled_from(tags))
        text = draw(text_st)
        tail = draw(text_st)
        children = (
            draw(st.lists(node(depth=depth + 1), min_size=0, max_size=3))
            if depth < 3
            else []
        )
        return (tag, text, children, tail)

    body = draw(st.lists(node(), min_size=0, max_size=4))
    return "<html><body>" + "".join(render(n) for n in body) + "</body></html>"


@settings(max_examples=60, deadline=None)
@given(html_doc_with_flatten())
def test_flatten_fixed_point(html):
    """After span/br flattening, the serialized text is a parse fixed point
    and contains no flatten tags."""
    doc = parse_document("prop", html, ParserConfig())
    text1 = doc["text"]
    assert "<span" not in text1 and "<br" not in text1
    doc2 = parse_document("prop", text1, ParserConfig())
    assert doc2["text"] == text1
    assert doc2["sentences"] == doc["sentences"]


# ---------------------------------------------------------------------------
# Fast-tokenizer equivalence (htmltree._fast_feed)
# ---------------------------------------------------------------------------

from fonduer_ray.parser.htmltree import _TreeBuilder, _fast_feed


def _tree_fingerprint(node):
    out = []

    def rec(n, d):
        out.append((d, n.tag, tuple(n.attrs), n.text, n.tail))
        for c in n.children:
            rec(c, d + 1)

    rec(node, 0)
    return out


def _stdlib_tree(s):
    b = _TreeBuilder()
    b.feed(s)
    b.close()
    return b.root


def _assert_fast_equiv(s):
    """Core contract: whenever _fast_feed claims success, the tree must be
    byte-identical to the stdlib HTMLParser tree. Falling back is always
    allowed; diverging is never allowed."""
    fast = _TreeBuilder()
    if _fast_feed(fast, s):
        assert _tree_fingerprint(fast.root) == _tree_fingerprint(_stdlib_tree(s)), repr(s)


_FAST_ADVERSARIAL = [
    "<p>a &amp; b &lt;c&gt;</p>",
    "<p>unterminated &am",
    "<div class='x' id=\"y\" data-z=1 checked>t</div>",
    "<div a = 'b' c ==\"d\">x</div>",
    "<br/><hr /><img src=x.png/>",
    "<script>if (a<b && c>d) { x(); }</script>",
    "<script>var s = '</scr'+'ipt>';</script>",
    "<style>p>a { color: red }</style>",
    "<SCRIPT>x</SCRIPT>after",
    "<script>unterminated",
    "<script>almost</script",
    "<!-- comment --><p>x</p>",
    "<!-- unterminated",
    "<!--->tricky<p>y</p>",
    "<!DOCTYPE html><html></html>",
    "<?php echo 1; ?><p>x</p>",
    "<![CDATA[raw]]><p>x</p>",
    "</><p>x</p>",
    "</ p><p>x</p>",
    "</123><p>x</p>",
    "</p extra stuff><div>x</div>",
    "3 < 5 and 6 > 2",
    "<p>x<1>y</p>",
    "<p =bad>x</p>",
    "<p a=>x</p>",
    "<p a='unterminated>x",
    "<p a=b/>x",
    "<em><b>nest</em></b>",
    "<table><tr><td>1</td><td rowspan=2 colspan='3'>2</td></tr></table>",
    "<p>&#65;&#x42;&quot;</p>",
    "<p title='&amp; &lt;'>x</p>",
    "<p>tail</p>after<div>mid</div>end",
    "<p>incomplete <span",
    "<div a==b>x</div>",
    "<input value=a>b>",
    "<option selected value='1'>one",
    "<p>&gt</p>",
]


def test_fast_feed_adversarial_equivalence():
    for s in _FAST_ADVERSARIAL:
        _assert_fast_equiv(s)


_FUZZ_TOKENS = [
    "<p>", "</p>", "<div class='x'>", "</div>", "<br/>", "text", "&amp;",
    "&", "<", ">", "'", '"', "<!--", "-->", "<script>", "</script>", "a<b",
    "<em>", "</em>", " ", "=", "/", "<!DOCTYPE html>", "<?pi?>", "</>",
    "</ x>", "\n", "\t", "&#65;", "&bogus;", "<x y=z>", "<x y='z w'>",
    "]]>", "<![CDATA[", "<style>", "</style>",
]


@settings(max_examples=400, deadline=None)
@given(st.lists(st.sampled_from(_FUZZ_TOKENS), min_size=1, max_size=25))
def test_fast_feed_fuzz_equivalence(tokens):
    _assert_fast_equiv("".join(tokens))


def test_fast_feed_handles_generated_corpus():
    """Every page shape the synthetic corpus generator emits must take the
    fast path (no fallback) and match the stdlib tree."""
    import glob

    import pyarrow.parquet as pq

    from fonduer_ray.sources.webpages import generate_corpus

    info = generate_corpus("/tmp/fastfeed_corpus_test", n_docs=120, seed=3)
    for f in sorted(glob.glob(info["corpus"] + "/*.parquet")):
        for raw in pq.read_table(f).column("html").to_pylist():
            s = raw.decode("utf-8", "replace")
            fast = _TreeBuilder()
            assert _fast_feed(fast, s), "corpus page fell off the fast path"
            assert _tree_fingerprint(fast.root) == _tree_fingerprint(_stdlib_tree(s))


@settings(max_examples=120, deadline=None)
@given(html_doc())
def test_incremental_xpath_matches_node_xpath(html):
    """The walk builds each paragraph's xpath incrementally during the
    descent (positional segments only for tags with >1 sibling of the same
    name — lxml getpath convention); it must equal the O(depth·siblings)
    ``Node.xpath()`` upward derivation for every emitted paragraph."""
    import fonduer_ray.parser.parse as P

    orig = P._DocBuilder.add_paragraph
    mismatches = []

    def checked(self, raw_text, node, ctx, xpath):
        if self.cfg.structural and xpath != node.xpath():
            mismatches.append((xpath, node.xpath()))
        return orig(self, raw_text, node, ctx, xpath)

    P._DocBuilder.add_paragraph = checked
    try:
        parse_document("prop", html, ParserConfig())
    finally:
        P._DocBuilder.add_paragraph = orig
    assert not mismatches, mismatches[:3]
