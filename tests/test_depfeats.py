"""Dep-tree feature family on hand-built (non-flat) dependency trees."""

from fonduer_ray.core.spans import Span
from fonduer_ray.functions.depfeats import (
    DepTree,
    entity_dep_features,
    relation_dep_features,
)


def sent(words, dep_parents, dep_labels):
    offs, i = [], 0
    for w in words:
        offs.append(i)
        i += len(w) + 1
    return {
        "doc_name": "d",
        "position": 0,
        "text": " ".join(words),
        "words": list(words),
        "char_offsets": offs,
        "abs_char_offsets": offs,
        "lemmas": [w.lower() for w in words],
        "pos_tags": ["NN"] * len(words),
        "dep_parents": dep_parents,
        "dep_labels": dep_labels,
    }


# "cats chase small mice": chase(2) is root; cats<-chase, mice<-chase,
# small<-mice. CoreNLP indexing: parent 0 = root, else 1-based head index.
WORDS = ["cats", "chase", "small", "mice"]
PARENTS = [2, 0, 4, 2]
LABELS = ["nsubj", "ROOT", "amod", "dobj"]


def test_dep_tree_structure():
    t = DepTree(PARENTS)
    assert t.parent == [1, -1, 3, 1]
    assert t.children[1] == [0, 3]
    assert t.children[3] == [2]
    assert t.ancestors(2, 3) == [3, 1]
    assert t.ancestors(1, 3) == []
    # path climbs through the lowest common ancestor
    assert t.path(0, 2) == [0, 1, 3, 2]
    assert t.path(2, 3) == [2, 3]


def test_entity_dep_features_non_flat():
    s = sent(WORDS, PARENTS, LABELS)
    span_small = Span(s, 11, 15)  # "small"
    feats = set(entity_dep_features(span_small))
    assert "TDL_MENTION_LEMMA_[small]" in feats
    assert "TDL_MENTION_DEP_[amod]" in feats
    assert "TDL_MENTION_DEP_LEMMA_[amod|small]" in feats
    # parent chain small -> mice -> chase, ngrams 1-3
    assert "TDL_PARENT_NGRAM_[mice]" in feats
    assert "TDL_PARENT_NGRAM_[chase]" in feats
    assert "TDL_PARENT_NGRAM_[mice chase]" in feats
    # leaf: no children
    assert not any(f.startswith("TDL_CHILD_NGRAM") for f in feats)

    span_chase = Span(s, 5, 9)  # "chase"
    feats = set(entity_dep_features(span_chase))
    # root's children are cats + mice in word order
    assert "TDL_CHILD_NGRAM_[cats]" in feats
    assert "TDL_CHILD_NGRAM_[mice]" in feats
    assert "TDL_CHILD_NGRAM_[cats mice]" in feats
    assert not any(f.startswith("TDL_PARENT_NGRAM") for f in feats)

    span_mice = Span(s, 17, 20)  # "mice", sibling of cats under chase
    feats = set(entity_dep_features(span_mice))
    assert "TDL_LEFT_SIB_LEMMA_[cats]" in feats
    assert "TDL_LEFT_SIB_DEP_[nsubj]" in feats
    assert not any(f.startswith("TDL_RIGHT_SIB") for f in feats)


def test_relation_dep_features_path():
    s = sent(WORDS, PARENTS, LABELS)
    cats = Span(s, 0, 3)
    small = Span(s, 11, 15)
    feats = set(relation_dep_features(cats, small))
    # path cats -> chase -> mice -> small
    assert "TDL_BTWN_LEMMA_[cats chase mice small]" in feats
    assert "TDL_BTWN_DEP_[nsubj ROOT dobj amod]" in feats
    assert "TDL_BTWN_LEN_4" in feats


def test_base_shifted_parents():
    """corenlp_to_xmltree base shift: all-positive parents (min>0) shift so
    the minimum becomes root (tree_structs.py:66-70)."""
    t = DepTree([3, 1, 1])  # min=1 -> shifted to [2, 0, 0]
    assert t.parent == [1, -1, -1]
