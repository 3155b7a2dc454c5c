"""Declarative pipeline specification — the engine's analog of the
reference's dynamic class factories and packaged-pipeline config
(``candidates/mention.py:66-186`` ``mention_subclass``,
``candidates/candidate.py:71-215`` ``candidate_subclass``,
``packaging/fonduer_model.py:48-173`` MLflow bundle): a plain dict (or YAML
file) declares mention types, relations, throttlers, labeling functions and
scorer settings; user callables (throttlers, LFs, custom matchers/spaces)
are contributed through a registry instead of ORM subclassing.

Example::

    spec = {
        "mentions": [
            {"name": "part",
             "space": {"type": "ngrams", "n_min": 1, "n_max": 1},
             "matcher": {"type": "regex", "rgx": "[A-Z]{2}\\d{3,4}"}},
            {"name": "temp",
             "space": {"type": "ngrams"},
             "matcher": {"type": "regex", "rgx": "\\d{2,3}"}},
        ],
        "relations": [
            {"name": "part_temp", "args": ["part", "temp"],
             "throttler": "same_row_or_sentence"}
        ],
        "lfs": ["lf_same_row", "lf_temp_range"],
        "pred_names": {"part_temp": "stg_temp_max"},
        "threshold": 0.6,
    }
    mention_specs, relation_specs, lfs, cfg = build_pipeline(spec)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from fonduer_ray.core import matchers as M
from fonduer_ray.core import ngrams as N
from fonduer_ray.stages.candidate_stage import RelationSpec
from fonduer_ray.stages.mention_stage import MentionSpec

# ---------------------------------------------------------------------------
# registries: the user-extension surface
# ---------------------------------------------------------------------------

THROTTLERS: dict[str, Callable] = {}
LFS: dict[str, Callable] = {}
MATCHER_TYPES: dict[str, Callable[..., Any]] = {
    "regex": lambda **kw: M.RegexMatchSpan(**kw),
    "regex_each": lambda **kw: M.RegexMatchEach(**kw),
    "dictionary": lambda **kw: M.DictionaryMatch(**kw),
    "person": lambda **kw: M.PersonMatcher(**kw),
    "location": lambda **kw: M.LocationMatcher(**kw),
    "organization": lambda **kw: M.OrganizationMatcher(**kw),
    "date": lambda **kw: M.DateMatcher(**kw),
    "number": lambda **kw: M.NumberMatcher(**kw),
    "do_nothing": lambda **kw: M.DoNothingMatcher(**kw),
}
SPACE_TYPES: dict[str, Callable[..., Any]] = {
    "ngrams": lambda **kw: N.MentionNgrams(**kw),
    "ngrams_range_expand": lambda **kw: N.MentionNgramsRangeExpand(**kw),
    "sentences": lambda **kw: N.MentionSentences(**kw),
    "figures": lambda **kw: N.MentionFigures(**kw),
    "cells": lambda **kw: N.MentionCells(**kw),
    "tables": lambda **kw: N.MentionTables(**kw),
    "paragraphs": lambda **kw: N.MentionParagraphs(**kw),
    "captions": lambda **kw: N.MentionCaptions(**kw),
    "sections": lambda **kw: N.MentionSections(**kw),
    "documents": lambda **kw: N.MentionDocuments(**kw),
}


def register_throttler(name: str):
    def deco(fn):
        THROTTLERS[name] = fn
        return fn

    return deco


def register_lf(name: str):
    def deco(fn):
        LFS[name] = fn
        return fn

    return deco


def _combinator(node: dict):
    kids = [_build_matcher(c) for c in node.get("children", [])]
    t = node["type"]
    opts = {k: v for k, v in node.items() if k not in ("type", "children")}
    if t == "union":
        return M.Union(*kids, **opts)
    if t == "intersect":
        return M.Intersect(*kids, **opts)
    if t == "inverse":
        return M.Inverse(*kids, **opts)
    if t == "concat":
        return M.Concat(*kids, **opts)
    raise ValueError(f"unknown matcher combinator '{t}'")


def _build_matcher(node: dict):
    t = node["type"]
    if t in ("union", "intersect", "inverse", "concat"):
        return _combinator(node)
    if t not in MATCHER_TYPES:
        raise ValueError(f"unknown matcher type '{t}'")
    kw = {k: v for k, v in node.items() if k != "type"}
    if "d" in kw and isinstance(kw["d"], list):
        kw["d"] = tuple(kw["d"])
    return MATCHER_TYPES[t](**kw)


def _build_space(node: dict):
    t = node.get("type", "ngrams")
    if t not in SPACE_TYPES:
        raise ValueError(f"unknown mention space '{t}'")
    return SPACE_TYPES[t](**{k: v for k, v in node.items() if k != "type"})


def build_pipeline(
    spec: dict,
) -> tuple[list[MentionSpec], list[RelationSpec], list[tuple[str, Callable]], dict]:
    """spec dict -> (mention_specs, relation_specs, lfs, scorer config)."""
    mention_specs = [
        MentionSpec(m["name"], _build_space(m.get("space", {})), _build_matcher(m["matcher"]))
        for m in spec["mentions"]
    ]
    relation_specs = []
    for r in spec.get("relations", []):
        throttler = None
        if r.get("throttler"):
            if r["throttler"] not in THROTTLERS:
                raise ValueError(f"unregistered throttler '{r['throttler']}'")
            throttler = THROTTLERS[r["throttler"]]
        relation_specs.append(
            RelationSpec(
                r["name"],
                tuple(r["args"]),
                throttler=throttler,
                nullables=tuple(r.get("nullables", [False] * len(r["args"]))),
                self_relations=r.get("self_relations", False),
                nested_relations=r.get("nested_relations", False),
                symmetric_relations=r.get("symmetric_relations", True),
            )
        )
    lfs = []
    for name in spec.get("lfs", []):
        if name not in LFS:
            raise ValueError(f"unregistered labeling function '{name}'")
        lfs.append((name, LFS[name]))
    scorer_cfg = {
        "pred_names": dict(spec.get("pred_names", {})),
        "weights": dict(spec.get("weights", {})),
        "threshold": float(spec.get("threshold", 0.6)),
    }
    return mention_specs, relation_specs, lfs, scorer_cfg


def load_spec(path: str) -> dict:
    """Load a YAML (or JSON) pipeline spec file."""
    import json

    with open(path) as f:
        text = f.read()
    try:
        import yaml

        return yaml.safe_load(text)
    except ImportError:  # pragma: no cover - yaml ships with ray
        return json.loads(text)


def build_parser_config(node: dict) -> "Any":
    """spec ``parser`` section -> ``ParserConfig``. Accepted keys mirror the
    dataclass fields (``blacklist``, ``flatten``, ``sentence_delim``, ...);
    ``sentencizer`` may be ``"simple"``, ``"punct"``, or a registered /
    user-supplied object with ``split_sentences`` (passed through)."""
    from fonduer_ray.parser.parse import ParserConfig

    fields = {f for f in ParserConfig.__dataclass_fields__}
    kwargs = {}
    for k, v in node.items():
        if k == "linguist":
            continue  # consumed by run_spec, not ParserConfig
        if k not in fields:
            raise ValueError(f"unknown parser config key '{k}'")
        kwargs[k] = tuple(v) if isinstance(v, list) else v
    return ParserConfig(**kwargs)


def run_spec(
    pages, spec: dict
) -> "Any":
    """pages Dataset + spec dict -> deduped canonical triples Dataset.

    The optional ``parser`` section configures the parse step, including
    the NLP plug point: ``{"parser": {"linguist": "spacy"}}`` demands real
    spaCy enrichment (actor-loaded model), ``"heuristic"`` the
    deterministic tagger, ``"auto"`` (default) picks spaCy when installed."""
    from fonduer_ray.stages.fused import pages_to_triples
    from fonduer_ray.stages.linking import canonicalize_triples

    mention_specs, relation_specs, lfs, cfg = build_pipeline(spec)
    parser_node = dict(spec.get("parser", {}))
    linguist = parser_node.get("linguist", "auto")
    parser_cfg = build_parser_config(parser_node) if parser_node else None
    triples = pages_to_triples(
        pages,
        mention_specs,
        relation_specs,
        lfs,
        pred_names=cfg["pred_names"],
        weights=cfg["weights"],
        threshold=cfg["threshold"],
        cfg=parser_cfg,
        linguist=linguist,
    )
    return canonicalize_triples(triples)
