"""Fused doc-local pipeline stage: pages -> triples in ONE map stage.

Parse, mention extraction, candidate generation and LF scoring are all
doc-local transforms; running them as separate ``map_batches`` stages costs
a nested-Arrow serialization round-trip per stage. The fused stage keeps
per-document Python dicts in memory across all four steps and emits only
the small triple rows — the modular stages remain for featurization/
labeling workflows and tests. It runs as plain tasks with a per-worker
cached stage instance (see ``_STAGE_CACHE`` below).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from fonduer_ray.parser.lingual import default_linguist
from fonduer_ray.parser.parse import ParserConfig, parse_document
from fonduer_ray.stages.candidate_stage import CandidateStage, RelationSpec
from fonduer_ray.stages.mention_stage import MentionSpec, MentionStage
from fonduer_ray.stages.schemas import TRIPLE_SCHEMA
from fonduer_ray.stages.triple_stage import TripleStage



class FusedKGStage:
    """(url, html, lang) batches -> triple rows, one pass per document."""

    def __init__(
        self,
        mention_specs: list[MentionSpec],
        relation_specs: list[RelationSpec],
        lfs,
        pred_names: dict[str, str],
        weights: dict[str, float] | None = None,
        threshold: float = 0.6,
        cfg: ParserConfig | None = None,
        enrich: bool = True,
        linguist: "str | object" = "auto",
    ):
        self.cfg = cfg or ParserConfig()
        self.linguist = default_linguist(linguist) if enrich else None
        self.mentions = MentionStage(mention_specs)
        self.candidates = CandidateStage(relation_specs)
        self.triples = TripleStage(lfs, pred_names, weights, threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        langs = (
            batch["lang"].to_pylist()
            if "lang" in batch.column_names
            else [""] * batch.num_rows
        )
        for url, html, lang in zip(
            batch["url"].to_pylist(), batch["html"].to_pylist(), langs
        ):
            if html is None:
                continue
            doc = parse_document(url, html, self.cfg)
            if doc is None:
                continue
            if self.linguist is not None and (lang or "en").startswith("en"):
                self.linguist.enrich_document(doc["sentences"])
            doc["mentions"] = self.mentions.extract_doc(doc)
            doc["candidates"] = self.candidates.extract_doc(doc)
            sent_by_pos = {s["position"]: s for s in doc["sentences"]}
            from fonduer_ray.stages.feature_stage import _candidate_spans
            from fonduer_ray.stages.label_stage import CandidateView

            for cand in doc["candidates"]:
                view = CandidateView(
                    cand["relation"],
                    cand["stable_id"],
                    _candidate_spans(cand, sent_by_pos),
                    doc,
                )
                p = self.triples.prob(view)
                if p < self.triples.threshold:
                    continue
                rows.append(
                    {
                        "subj": cand["arg_texts"][self.triples.subj_arg],
                        "pred": self.triples.pred_names.get(
                            cand["relation"], cand["relation"]
                        ),
                        "obj": cand["arg_texts"][self.triples.obj_arg],
                        "doc_name": doc["doc_name"],
                        "candidate_stable_id": cand["stable_id"],
                        "score": p,
                    }
                )
        return pa.Table.from_pylist(rows, schema=TRIPLE_SCHEMA)


# Per-worker-process stage cache for the task-based path. The fused stage's
# state (compiled regexes, matcher/LF objects) builds in microseconds, so an
# actor pool is the wrong tool: pool ramp-up (cold actor processes paying the
# full import cost, autoscaling from 1) dominated short jobs and capped
# measured scaling efficiency at ~0.3. Plain tasks reuse warm worker
# processes; the instance is rebuilt once per worker per config.
_STAGE_CACHE: dict = {}


def pages_to_triples(
    pages: "ray.data.Dataset",
    mention_specs: list[MentionSpec],
    relation_specs: list[RelationSpec],
    lfs,
    pred_names: dict[str, str],
    weights: dict[str, float] | None = None,
    threshold: float = 0.6,
    cfg: ParserConfig | None = None,
    enrich: bool = True,
    linguist: "str | object" = "auto",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    kwargs = {
        "mention_specs": mention_specs,
        "relation_specs": relation_specs,
        "lfs": lfs,
        "pred_names": pred_names,
        "weights": weights,
        "threshold": threshold,
        "cfg": cfg,
        "enrich": enrich,
        "linguist": linguist,
    }
    from ray import cloudpickle  # plain pickle cannot key lambda/closure state

    key = hash(cloudpickle.dumps(kwargs))

    def fused_fn(batch: pa.Table) -> pa.Table:
        stage = _STAGE_CACHE.get(key)
        if stage is None:
            stage = FusedKGStage(**kwargs)
            _STAGE_CACHE.clear()  # configs change rarely; keep one live entry
            _STAGE_CACHE[key] = stage
        return stage(batch)

    return pages.map_batches(
        fused_fn,
        batch_format="pyarrow",
        batch_size=batch_size,
    )
