"""Dependency-tree feature family (TreeDLib semantics, reimplemented).

The reference's textual family runs TreeDLib templates over an XML tree
built from ``dep_parents`` (``features/feature_libs/tree_structs.py:44-142``
``corenlp_to_xmltree``: CoreNLP indexing — 0 = root, parents 1-based; base
shift when min>0; singleton top-level nodes pruned; a lone top-level node
collapses into the root). The template set is the one compiled in
``textual_features.py:109-133`` (``_compile_entity_feature_generator``):

- ``Indicator(m, 'lemma'/'dep_label')`` and ``Indicator(m, 'dep_label,lemma')``
- ``Ngrams(Parents(m, 3), 'lemma', (1, 3))`` — lemma ngrams up the parent chain
- ``Ngrams(Children(m), 'lemma', (1, 3))`` — lemma ngrams over the children
- ``LeftNgrams(LeftSiblings(m), a)`` / ``RightNgrams(RightSiblings(m), a)``
  for ``a`` in (lemma, dep_label) — nearest sibling window 1

plus the relation generator's between-path indicators (shortest dep path
between the two mentions). The treedlib package itself is not available in
this environment, so feature STRING formats are engine-defined (prefixed
``TDL_``); the node-set semantics above are the ported surface. Multi-word
mentions use the first word's node for parent/sibling chains and the union
of the mention nodes' children (minus the mention itself) — treedlib's
node-set generality reduced to the cases the engine emits.

Pure functions over the nested sentence dict; no Ray.
"""

from __future__ import annotations


class DepTree:
    """Sentence-local dependency tree with corenlp_to_xmltree's pruning.

    ``parent[i]`` is the WORD INDEX of word i's head, or -1 when the word's
    head is the (synthetic) root. ``top`` is the word index the synthetic
    root collapsed into (-1 if several top-level nodes survive pruning)."""

    __slots__ = ("n", "parent", "children", "top_level")

    def __init__(self, dep_parents: list[int]):
        self.n = len(dep_parents)
        parents = [int(p) for p in dep_parents]
        if parents:
            b = min(parents)
            if b != 0:  # base shift to CoreNLP indexing (tree_structs.py:68-70)
                parents = [p - b for p in parents]
        self.parent = [p - 1 for p in parents]  # -1 = attached to root
        self.children: list[list[int]] = [[] for _ in range(self.n)]
        self.top_level: list[int] = []
        for i, p in enumerate(self.parent):
            if p < 0:
                self.top_level.append(i)
            elif 0 <= p < self.n:
                self.children[p].append(i)

    def ancestors(self, i: int, max_hops: int) -> list[int]:
        out = []
        seen = {i}
        p = self.parent[i]
        while p >= 0 and len(out) < max_hops and p not in seen:
            out.append(p)
            seen.add(p)
            p = self.parent[p]
        return out

    def siblings(self, i: int) -> list[int]:
        p = self.parent[i]
        if p >= 0:
            return self.children[p]
        # top-level nodes are siblings under the synthetic root, but only
        # the surviving (non-pruned) ones: pruning removes childless
        # top-level nodes when more than one top-level node exists
        if len(self.top_level) == 1:
            return self.top_level
        return [t for t in self.top_level if self.children[t]] or self.top_level

    def path(self, a: int, b: int, max_len: int = 10) -> list[int]:
        """Shortest path a..b (inclusive) through the tree; [] if unlinked
        within max_len hops."""
        up_a = [a] + self.ancestors(a, max_len)
        up_b = [b] + self.ancestors(b, max_len)
        set_a = {x: k for k, x in enumerate(up_a)}
        for k, x in enumerate(up_b):
            if x in set_a:
                return up_a[: set_a[x] + 1] + list(reversed(up_b[:k]))
        return []


def _ngrams(seq: list[str], n_min: int, n_max: int) -> list[str]:
    out = []
    for n in range(n_min, n_max + 1):
        for i in range(len(seq) - n + 1):
            out.append(" ".join(seq[i : i + n]))
    return out


def entity_dep_features(span, prefix: str = "") -> list[str]:
    """TreeDLib entity templates for one span (see module docstring)."""
    s = span.sentence
    deps = s.get("dep_parents") or []
    if not deps:
        return []
    tree = DepTree(deps)
    lemmas = s.get("lemmas") or [w.lower() for w in s["words"]]
    labels = s.get("dep_labels") or []

    def lem(i: int) -> str:
        return lemmas[i] if i < len(lemmas) else ""

    def lab(i: int) -> str:
        return labels[i] if i < len(labels) else ""

    ws, we = span.get_word_start_index(), span.get_word_end_index()
    mention = list(range(ws, min(we, tree.n - 1) + 1))
    if not mention:
        return []
    feats = []
    # Indicator(m, attrib) over the mention node sequence
    feats.append(f"{prefix}TDL_MENTION_LEMMA_[{' '.join(lem(i) for i in mention)}]")
    feats.append(f"{prefix}TDL_MENTION_DEP_[{' '.join(lab(i) for i in mention)}]")
    feats.append(
        f"{prefix}TDL_MENTION_DEP_LEMMA_["
        + " ".join(f"{lab(i)}|{lem(i)}" for i in mention)
        + "]"
    )
    # Ngrams(Parents(m, 3), 'lemma', (1, 3)) from the first mention node
    chain = tree.ancestors(mention[0], 3)
    for g in _ngrams([lem(i) for i in chain], 1, 3):
        feats.append(f"{prefix}TDL_PARENT_NGRAM_[{g}]")
    # Ngrams(Children(m), 'lemma', (1, 3)): union of children outside the span
    kids: list[int] = []
    mset = set(mention)
    for i in mention:
        kids.extend(c for c in tree.children[i] if c not in mset)
    for g in _ngrams([lem(i) for i in kids], 1, 3):
        feats.append(f"{prefix}TDL_CHILD_NGRAM_[{g}]")
    # nearest left/right sibling (window 1) of the first mention node
    sibs = tree.siblings(mention[0])
    pos_in = sibs.index(mention[0]) if mention[0] in sibs else -1
    if pos_in > 0:
        l = sibs[pos_in - 1]
        feats.append(f"{prefix}TDL_LEFT_SIB_LEMMA_[{lem(l)}]")
        feats.append(f"{prefix}TDL_LEFT_SIB_DEP_[{lab(l)}]")
    if 0 <= pos_in < len(sibs) - 1:
        r = sibs[pos_in + 1]
        feats.append(f"{prefix}TDL_RIGHT_SIB_LEMMA_[{lem(r)}]")
        feats.append(f"{prefix}TDL_RIGHT_SIB_DEP_[{lab(r)}]")
    return feats


def relation_dep_features(span_a, span_b) -> list[str]:
    """Between-path indicators for a binary relation (same sentence only)."""
    sa, sb = span_a.sentence, span_b.sentence
    if sa.get("position") != sb.get("position"):
        return []
    deps = sa.get("dep_parents") or []
    if not deps:
        return []
    tree = DepTree(deps)
    lemmas = sa.get("lemmas") or [w.lower() for w in sa["words"]]
    labels = sa.get("dep_labels") or []
    a = span_a.get_word_start_index()
    b = span_b.get_word_start_index()
    if a >= tree.n or b >= tree.n:
        return []
    path = tree.path(a, b)
    if not path:
        return []
    feats = [
        "TDL_BTWN_LEMMA_[" + " ".join(lemmas[i] for i in path) + "]",
        "TDL_BTWN_DEP_["
        + " ".join(labels[i] if i < len(labels) else "" for i in path)
        + "]",
        f"TDL_BTWN_LEN_{len(path)}",
    ]
    return feats
