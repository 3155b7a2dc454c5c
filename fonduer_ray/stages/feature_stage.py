"""Featurization stage: multimodal feature library over candidates.

Reimplements the shape and semantics of the reference feature families
(``features/feature_libs/{textual,structural,tabular}_features.py``) as a
doc-local ``map_batches`` stage producing the sparse parallel-array encoding
``(candidate_stable_id, keys: list<string>, values: list<float32>)``
(``features/models/feature.py:15-24``). Per-entity prefixes ``e{i}_`` for
n-ary candidates mirror ``textual_features.py:34-283``.

The global feature-key vocabulary (the reference's ``FeatureKey`` table,
``featurizer.py:285-295``) is built with the engine's only wide aggregation:
explode keys -> distinct -> sort by name -> broadcast via ``ray.put``.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray
import ray.data

from fonduer_ray.core.ngrams import tokens_to_ngrams
from fonduer_ray.core.spans import Span, span_from_record
from fonduer_ray.stages.schemas import FEATURE_SCHEMA
from fonduer_ray.stages.util import map_stage, get_broadcast

FeatureFn = Callable[[list[Span], dict], list[str]]


# ---------------------------------------------------------------------------
# per-span / per-candidate feature generators (pure functions)
# ---------------------------------------------------------------------------

_WINDOW = 3


def _float_fold(lemma: str) -> str:
    """Reference _NUMBER folding (``textual_features.py:175-179``): any
    lemma that parses as a float becomes ``_NUMBER``."""
    try:
        float(lemma)
        return "_NUMBER"
    except ValueError:
        return lemma


def textual_features(spans: list[Span], doc: dict) -> list[str]:
    """Full DDLIB + dep-tree textual family (``textual_features.py:34-283``):

    - sequence features WORD/LEMMA/POS/DEP_SEQ (``_get_seq_features``);
    - isolated lemma+POS windows ``W_LEFT_{n}``/``W_RIGHT_{n}`` (joined
      n-nearest, window 3) and the full left-x-right combination grid
      ``W_LEMMA_L_{i}_R_{j}`` / ``W_POS_L_{i}_R_{j}``
      (``_get_window_features``; the reference's negative-index wraparound
      on the left window is NOT replicated — windows stop at the sentence
      start); float-parse ``_NUMBER`` lemma folding;
    - BASIC word features: ``CONTAINS_WORDS`` 1-2grams of the span,
      ``LEFT_WORDS``/``RIGHT_WORDS`` 1-2grams within a 7-token window
      (``_get_word_feats``), span type / capitalization / length;
    - TreeDLib dep-tree templates per span and the between-path indicators
      for binary relations (``functions/depfeats.py``).

    Engine pair features SAME_SENTENCE / BETWEEN_ / WORD_DIFF_ complete the
    family (the reference keeps these in its tabular module,
    ``tabular_features.py:160-175``)."""
    from fonduer_ray.functions.depfeats import (
        entity_dep_features,
        relation_dep_features,
    )
    from fonduer_ray.functions.dmu import get_left_ngrams, get_right_ngrams

    feats: list[str] = []
    for i, span in enumerate(spans):
        if span is None:
            continue
        p = f"e{i}_" if len(spans) > 1 else ""
        words = span.get_attrib_tokens("words")
        s = span.sentence
        sent_lemmas = s.get("lemmas") or [w.lower() for w in s["words"]]
        sent_pos = s.get("pos_tags") or [""] * len(s["words"])
        sent_deps = s.get("dep_labels") or [""] * len(s["words"])
        ws, we = span.get_word_start_index(), span.get_word_end_index()
        lemmas = [_float_fold(w) for w in span.get_attrib_tokens("lemmas") or [w.lower() for w in words]]
        # sequence features
        feats.append(f"{p}WORD_SEQ_[{' '.join(words)}]")
        feats.append(f"{p}LEMMA_SEQ_[{' '.join(lemmas)}]")
        feats.append(f"{p}POS_SEQ_[{' '.join(sent_pos[ws : we + 1])}]")
        feats.append(f"{p}DEP_SEQ_[{' '.join(sent_deps[ws : we + 1])}]")
        # window features over lemmas/POS (window 3, isolated + combinations)
        left_lemmas = [_float_fold(x) for x in sent_lemmas[max(0, ws - _WINDOW) : ws]]
        left_pos = sent_pos[max(0, ws - _WINDOW) : ws]
        right_lemmas = [_float_fold(x) for x in sent_lemmas[we + 1 : we + 1 + _WINDOW]]
        right_pos = sent_pos[we + 1 : we + 1 + _WINDOW]
        for n in range(len(left_lemmas)):
            feats.append(f"{p}W_LEFT_{n + 1}_[{' '.join(left_lemmas[-n - 1 :])}]")
            feats.append(f"{p}W_LEFT_POS_{n + 1}_[{' '.join(left_pos[-n - 1 :])}]")
        for n in range(len(right_lemmas)):
            feats.append(f"{p}W_RIGHT_{n + 1}_[{' '.join(right_lemmas[: n + 1])}]")
            feats.append(f"{p}W_RIGHT_POS_{n + 1}_[{' '.join(right_pos[: n + 1])}]")
        for li in range(len(left_lemmas)):
            ll = " ".join(left_lemmas[-li - 1 :])
            lp = " ".join(left_pos[-li - 1 :])
            for rj in range(len(right_lemmas)):
                rl = " ".join(right_lemmas[: rj + 1])
                rp = " ".join(right_pos[: rj + 1])
                feats.append(f"{p}W_LEMMA_L_{li + 1}_R_{rj + 1}_[{ll}]_[{rl}]")
                feats.append(f"{p}W_POS_L_{li + 1}_R_{rj + 1}_[{lp}]_[{rp}]")
        # BASIC word features
        for g in tokens_to_ngrams(words, 1, 2):
            feats.append(f"{p}CONTAINS_WORDS_[{g}]")
        for g in get_left_ngrams(span, window=7, n_min=1, n_max=2, attrib="words"):
            feats.append(f"{p}LEFT_WORDS_[{g}]")
        for g in get_right_ngrams(span, window=7, n_min=1, n_max=2, attrib="words"):
            feats.append(f"{p}RIGHT_WORDS_[{g}]")
        if words and words[0][:1].isupper():
            feats.append(f"{p}STARTS_WITH_CAPITAL")
        feats.append(f"{p}LENGTH_{len(words)}")
        feats.append(
            f"{p}SPAN_TYPE_[{'IMPLICIT' if getattr(span, 'expander_key', None) else 'EXPLICIT'}]"
        )
        # TreeDLib dep-tree entity templates
        feats.extend(entity_dep_features(span, prefix=p))
    if len(spans) == 2 and all(s is not None for s in spans):
        a, b = spans
        if a.sentence["position"] == b.sentence["position"]:
            feats.append("SAME_SENTENCE")
            lo = min(a.get_word_end_index(), b.get_word_end_index())
            hi = max(a.get_word_start_index(), b.get_word_start_index())
            between = a.sentence["words"][lo + 1 : hi]
            for w in between[:7]:
                feats.append(f"BETWEEN_[{_float_fold(w.lower())}]")
            feats.append(f"WORD_DIFF_{max(hi - lo - 1, 0)}")
            feats.extend(relation_dep_features(a, b))
    return feats


def structural_features(spans: list[Span], doc: dict) -> list[str]:
    """Tag/attr/ancestor features from the stored xpath
    (``structural_features.py:26-117``)."""
    feats: list[str] = []
    xpaths = []
    for i, span in enumerate(spans):
        if span is None:
            continue
        p = f"e{i}_" if len(spans) > 1 else ""
        s = span.sentence
        tag = s.get("html_tag") or ""
        if tag:
            feats.append(f"{p}TAG_[{tag}]")
        for attr in s.get("html_attrs") or []:
            feats.append(f"{p}HTML_ATTR_[{attr}]")
        xp = s.get("xpath") or ""
        xpaths.append(xp)
        parts = [seg for seg in xp.split("/") if seg]
        if len(parts) >= 2:
            feats.append(f"{p}PARENT_TAG_[{_strip_idx(parts[-2])}]")
        for seg in parts[:-1]:
            feats.append(f"{p}ANCESTOR_TAG_[{_strip_idx(seg)}]")
    if len(xpaths) == 2:
        common = _common_prefix_segments(xpaths[0], xpaths[1])
        feats.append(f"COMMON_ANCESTOR_[{'/'.join(common)}]")
        depth = min(
            len([s for s in xp.split("/") if s]) - len(common) for xp in xpaths
        )
        feats.append(f"LOWEST_ANCESTOR_DEPTH_[{depth}]")
    return feats


def _strip_idx(seg: str) -> str:
    return seg.split("[")[0]


def _common_prefix_segments(a: str, b: str) -> list[str]:
    pa_, pb = [s for s in a.split("/") if s], [s for s in b.split("/") if s]
    out = []
    for x, y in zip(pa_, pb):
        if x != y:
            break
        out.append(x)
    return out


def tabular_features(spans: list[Span], doc: dict) -> list[str]:
    """Row/col position + aligned-ngram features
    (``tabular_features.py:24-191``); relies on the doc-local maps prepared
    by ``_DocView``."""
    feats: list[str] = []
    view = _DocView.get(doc)
    for i, span in enumerate(spans):
        if span is None:
            continue
        p = f"e{i}_" if len(spans) > 1 else ""
        s = span.sentence
        if s.get("table_position") is None or s.get("row_start") is None:
            continue
        feats.append(f"{p}ROW_NUM_[{s['row_start']}]")
        feats.append(f"{p}COL_NUM_[{s['col_start']}]")
        feats.append(f"{p}ROW_SPAN_[{s['row_end'] - s['row_start'] + 1}]")
        feats.append(f"{p}COL_SPAN_[{s['col_end'] - s['col_start'] + 1}]")
        for w in view.row_ngrams(s):
            feats.append(f"{p}ROW_NGRAM_[{w}]")
        for w in view.col_ngrams(s):
            feats.append(f"{p}COL_NGRAM_[{w}]")
        head = view.head_ngrams(s)
        for w in head:
            feats.append(f"{p}ROW_HEAD_NGRAM_[{w}]")
    if len(spans) == 2 and all(sp is not None for sp in spans):
        a, b = spans[0].sentence, spans[1].sentence
        if (
            a.get("table_position") is not None
            and a.get("table_position") == b.get("table_position")
            and a.get("row_start") is not None
            and b.get("row_start") is not None
        ):
            feats.append("SAME_TABLE")
            if a.get("cell_position") == b.get("cell_position"):
                feats.append("SAME_CELL")
            rd = _range_diff(a["row_start"], a["row_end"], b["row_start"], b["row_end"])
            cd = _range_diff(a["col_start"], a["col_end"], b["col_start"], b["col_end"])
            feats.append(f"ROW_DIFF_[{rd}]")
            feats.append(f"COL_DIFF_[{cd}]")
            feats.append(f"MANHATTAN_DIST_[{abs(rd) + abs(cd)}]")
            if rd == 0:
                feats.append("SAME_ROW")
            if cd == 0:
                feats.append("SAME_COL")
    return feats


def _range_diff(a0: int, a1: int, b0: int, b1: int) -> int:
    """Minimal signed difference between two [start,end] ranges
    (alignment math semantics of ``utils/utils_table.py:12-146``)."""
    if a1 < b0:
        return b0 - a1
    if b1 < a0:
        return -(a0 - b1)
    return 0


class _DocView:
    """Per-document lookup maps for tabular features; built once per doc
    (replaces the reference's per-process lru caches,
    ``data_model_utils/tabular.py:31-561``)."""

    _cache_key = "__view__"

    def __init__(self, doc: dict):
        self.rows: dict[tuple[int, int], list[str]] = {}
        self.cols: dict[tuple[int, int], list[str]] = {}
        for s in doc["sentences"]:
            t = s.get("table_position")
            # captions live in a table but not in a cell: no grid coords
            if t is None or s.get("row_start") is None:
                continue
            for r in range(s["row_start"], s["row_end"] + 1):
                self.rows.setdefault((t, r), []).extend(w.lower() for w in s["words"])
            for c in range(s["col_start"], s["col_end"] + 1):
                self.cols.setdefault((t, c), []).extend(w.lower() for w in s["words"])

    @classmethod
    def get(cls, doc: dict) -> "_DocView":
        v = doc.get(cls._cache_key)
        if v is None:
            v = cls(doc)
            doc[cls._cache_key] = v
        return v

    def row_ngrams(self, s: dict, n_max: int = 1) -> list[str]:
        own = {w.lower() for w in s["words"]}
        out = []
        for r in range(s["row_start"], s["row_end"] + 1):
            for w in self.rows.get((s["table_position"], r), []):
                if w not in own:
                    out.append(w)
        return list(dict.fromkeys(out))

    def col_ngrams(self, s: dict, n_max: int = 1) -> list[str]:
        own = {w.lower() for w in s["words"]}
        out = []
        for c in range(s["col_start"], s["col_end"] + 1):
            for w in self.cols.get((s["table_position"], c), []):
                if w not in own:
                    out.append(w)
        return list(dict.fromkeys(out))

    def head_ngrams(self, s: dict) -> list[str]:
        """Words of the topmost cell in this sentence's column."""
        return self.cols.get((s["table_position"], s["col_start"]), [])[:5]


def visual_features(spans: list[Span], doc: dict) -> list[str]:
    """Visual feature family (``visual_features.py:23-108``): per-span
    ``PAGE_[n]`` and alignment-group lemma sharing ``ALIGNED_[lemma]``;
    n-ary ``SAME_PAGE`` / ``HORZ_ALIGNED`` / ``VERT_ALIGNED{_LEFT,_RIGHT,
    _CENTER}`` with the reference's pt tolerances. No-ops for sentences
    without bboxes (non-visual corpora pay ~nothing)."""
    from fonduer_ray.parser import visual as V

    feats: list[str] = []
    boxes = []
    for i, span in enumerate(spans):
        if span is None:
            boxes.append(None)
            continue
        b = V.bbox_from_sentence(span.sentence)
        boxes.append(b)
        if b is None:
            continue
        p = f"e{i}_" if len(spans) > 1 else ""
        feats.append(f"{p}PAGE_[{b[0]}]")
        for lemma in V.get_visual_aligned_lemmas(span, doc):
            feats.append(f"{p}ALIGNED_[{lemma}]")
    live = [s for s, b in zip(spans, boxes) if s is not None and b is not None]
    if len(live) == 2:
        if V.same_page(live):
            feats.append("SAME_PAGE")
        if V.is_horz_aligned(live):
            feats.append("HORZ_ALIGNED")
        if V.is_vert_aligned(live):
            feats.append("VERT_ALIGNED")
        if V.is_vert_aligned_left(live):
            feats.append("VERT_ALIGNED_LEFT")
        if V.is_vert_aligned_right(live):
            feats.append("VERT_ALIGNED_RIGHT")
        if V.is_vert_aligned_center(live):
            feats.append("VERT_ALIGNED_CENTER")
    return feats


DEFAULT_FEATURE_FNS: list[FeatureFn] = [
    textual_features,
    structural_features,
    tabular_features,
    visual_features,
]


# ---------------------------------------------------------------------------
# the stage
# ---------------------------------------------------------------------------


class FeatureStage:
    """Doc rows (with candidates) -> sparse feature rows."""

    def __init__(self, feature_fns: list[FeatureFn] | None = None):
        self.feature_fns = feature_fns or DEFAULT_FEATURE_FNS

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for doc in batch.to_pylist():
            sent_by_pos = {s["position"]: s for s in doc["sentences"]}
            for cand in doc["candidates"]:
                spans = _candidate_spans(cand, sent_by_pos)
                keys: dict[str, float] = {}
                for fn in self.feature_fns:
                    for k in fn(spans, doc):
                        keys[k] = 1.0
                rows.append(
                    {
                        "doc_name": doc["doc_name"],
                        "candidate_stable_id": cand["stable_id"],
                        "relation": cand["relation"],
                        "split": cand["split"],
                        "keys": list(keys.keys()),
                        "values": list(keys.values()),
                    }
                )
        return pa.Table.from_pylist(rows, schema=FEATURE_SCHEMA)


def _candidate_spans(cand: dict, sent_by_pos: dict) -> list[Span | None]:
    spans: list[Span | None] = []
    for j in range(len(cand["arg_types"])):
        if cand["arg_stable_ids"][j] == "" or cand["arg_sentence_positions"][j] < 0:
            spans.append(None)
            continue
        rec = {
            "stable_id": cand["arg_stable_ids"][j],
            "char_start": cand["arg_char_starts"][j],
            "char_end": cand["arg_char_ends"][j],
            "text": cand["arg_texts"][j],
            "implicit": cand["arg_implicit"][j],
            "expander_key": "x" if cand["arg_implicit"][j] else "",
            "position": 0,
            "expanded_words": cand["arg_texts"][j].split() if cand["arg_implicit"][j] else [],
        }
        spans.append(span_from_record(sent_by_pos[cand["arg_sentence_positions"][j]], rec))
    return spans


def featurize(
    ds: "ray.data.Dataset",
    feature_fns: list[FeatureFn] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32,
) -> "ray.data.Dataset":
    return map_stage(ds, FeatureStage, {"feature_fns": feature_fns}, batch_size, concurrency)


def feature_key_vocab(feature_ds: "ray.data.Dataset") -> list[str]:
    """Global sorted feature-key vocabulary — the engine's one wide
    aggregation (replaces the ``FeatureKey`` rebuild,
    ``featurizer.py:285-295``). Keys are sorted by name for deterministic
    matrix columns (``utils/utils_udf.py:101-103``)."""

    def explode_keys(batch: pa.Table) -> pa.Table:
        # per-block pre-dedup before the global distinct (combiner pattern)
        uniq = set()
        for keys in batch["keys"].to_pylist():
            uniq.update(keys)
        return pa.table({"key": pa.array(sorted(uniq), type=pa.string())})

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    uniq = feature_ds.select_columns(["keys"]).map_batches(
        explode_keys, batch_format="pyarrow"
    )
    # key cardinality ~ vocabulary size (4.6k on one datasheet, far more at
    # web scale): hash-partitioned distinct, not the sort-based unique()
    distinct = hash_groupby(
        uniq, ["key"], lambda df: df.drop_duplicates(["key"])
    )
    # iter_batches, NOT take_all: take_all pays per-ROW overhead (measured
    # 119s vs 0.3s on a 216k-key vocabulary)
    return sorted(
        k
        for b in distinct.iter_batches(batch_size=65536, batch_format="pyarrow")
        for k in b["key"].to_pylist()
    )


def feature_matrix(
    feature_ds: "ray.data.Dataset", vocab: list[str], split: int | None = None
):
    """Assemble a dense-ish per-block CSR-equivalent: returns (ids, indptr,
    indices, data) numpy arrays collected to the driver — only for
    small/test scales (matrix fit happens driver-side, like the reference's
    ``get_sparse_matrix``, ``utils/utils_udf.py:125-193``)."""
    index_ref = ray.put({k: i for i, k in enumerate(vocab)})

    def to_rows(batch: pa.Table) -> pa.Table:
        index = get_broadcast(index_ref)
        ids, cols = [], []
        for row in batch.to_pylist():
            idx = sorted(index[k] for k in row["keys"] if k in index)
            ids.append(row["candidate_stable_id"])
            cols.append(idx)
        return pa.table(
            {
                "candidate_stable_id": pa.array(ids, pa.string()),
                "col_indices": pa.array(cols, pa.list_(pa.int64())),
            }
        )

    ds = feature_ds
    if split is not None:
        ds = ds.filter(expr=f"split == {split}")
    out = ds.map_batches(to_rows, batch_format="pyarrow").take_all()
    ids = [r["candidate_stable_id"] for r in out]
    indptr = np.zeros(len(out) + 1, dtype=np.int64)
    indices = []
    for i, r in enumerate(out):
        indices.extend(r["col_indices"])
        indptr[i + 1] = len(indices)
    return ids, indptr, np.asarray(indices, dtype=np.int64), np.ones(len(indices), dtype=np.float32)
