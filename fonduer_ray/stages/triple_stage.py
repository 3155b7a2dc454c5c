"""Fused label+score+emit stage: document rows -> raw triple rows.

Runs the labeling functions and the LF-vote scorer doc-locally in one pass
and emits ``(subj, pred, obj, doc_name, candidate_stable_id, score)`` for
candidates whose probability clears the threshold. Fusing avoids a
shuffle-join between a separate label table and the candidate table — both
sides live on the same document row.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from fonduer_ray.stages.feature_stage import _candidate_spans
from fonduer_ray.stages.label_stage import CandidateView, LabelingFunction
from fonduer_ray.stages.schemas import TRIPLE_SCHEMA
from fonduer_ray.stages.util import map_stage


class TripleStage:
    def __init__(
        self,
        lfs: list[tuple[str, LabelingFunction]],
        pred_names: dict[str, str],
        weights: dict[str, float] | None = None,
        threshold: float = 0.6,
        subj_arg: int = 0,
        obj_arg: int = 1,
    ):
        self.lfs = lfs
        self.pred_names = pred_names
        self.weights = weights or {}
        self.threshold = threshold
        self.subj_arg = subj_arg
        self.obj_arg = obj_arg

    def prob(self, view: CandidateView) -> float:
        num = den = 0.0
        for name, fn in self.lfs:
            y = fn(view)
            if y is None:
                continue
            w = self.weights.get(name, 1.0)
            num += w * (1.0 if y > 0 else -1.0)
            den += abs(w)
        return 0.5 if den == 0 else (1.0 + num / den) / 2.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for doc in batch.to_pylist():
            sent_by_pos = {s["position"]: s for s in doc["sentences"]}
            for cand in doc["candidates"]:
                view = CandidateView(
                    cand["relation"],
                    cand["stable_id"],
                    _candidate_spans(cand, sent_by_pos),
                    doc,
                )
                p = self.prob(view)
                if p < self.threshold:
                    continue
                rows.append(
                    {
                        "subj": cand["arg_texts"][self.subj_arg],
                        "pred": self.pred_names.get(cand["relation"], cand["relation"]),
                        "obj": cand["arg_texts"][self.obj_arg],
                        "doc_name": doc["doc_name"],
                        "candidate_stable_id": cand["stable_id"],
                        "score": p,
                    }
                )
        return pa.Table.from_pylist(rows, schema=TRIPLE_SCHEMA)


def extract_triples(
    ds: "ray.data.Dataset",
    lfs: list[tuple[str, LabelingFunction]],
    pred_names: dict[str, str],
    weights: dict[str, float] | None = None,
    threshold: float = 0.6,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32,
) -> "ray.data.Dataset":
    return map_stage(
        ds,
        TripleStage,
        {
            "lfs": lfs,
            "pred_names": pred_names,
            "weights": weights,
            "threshold": threshold,
        },
        batch_size,
        concurrency,
    )
