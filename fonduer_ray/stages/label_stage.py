"""Supervision stage: labeling functions, label matrices, and the LF-vote
scorer that replaces the reference's LSTM discriminative model.

LF semantics mirror ``LabelerUDF.apply`` (``supervision/labeler.py:420-495``):
an LF returns an int label, ``None`` = ABSTAIN; the sparse encoding shifts by
+1 so 0 means abstain (dense view uses -1, ``utils/utils_udf.py:196-203``).

The scorer is a weighted LF vote (the "labeling-function-style scorer
replacing the LSTM" of the north star): votes in {-1, +1}, abstain ignored;
``prob = (1 + sum(w*v)/sum(|w| over non-abstains)) / 2``; all-abstain -> 0.5.
Deterministic, stateless per candidate -> plain map_batches.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyarrow as pa

import ray.data

from fonduer_ray.core.spans import Span
from fonduer_ray.stages.feature_stage import _candidate_spans
from fonduer_ray.stages.schemas import LABEL_SCHEMA
from fonduer_ray.stages.util import map_stage

ABSTAIN = None


@dataclass
class CandidateView:
    """What an LF sees: the argument spans + the full document row."""

    relation: str
    stable_id: str
    spans: list[Span | None]
    doc: dict

    def __getitem__(self, i: int) -> Span | None:
        return self.spans[i]


LabelingFunction = Callable[[CandidateView], int | None]


class LabelStage:
    """Doc rows (with candidates) -> sparse label rows, one per candidate."""

    def __init__(self, lfs: list[tuple[str, LabelingFunction]]):
        self.lfs = lfs

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
                keys, values = [], []
                for name, fn in self.lfs:
                    y = fn(view)
                    keys.append(name)
                    values.append(0 if y is None else int(y) + 1)
                rows.append(
                    {
                        "doc_name": doc["doc_name"],
                        "candidate_stable_id": cand["stable_id"],
                        "relation": cand["relation"],
                        "split": cand["split"],
                        "keys": keys,
                        "values": values,
                    }
                )
        return pa.Table.from_pylist(rows, schema=LABEL_SCHEMA)


def label(
    ds: "ray.data.Dataset",
    lfs: list[tuple[str, LabelingFunction]],
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32,
) -> "ray.data.Dataset":
    return map_stage(ds, LabelStage, {"lfs": lfs}, batch_size, concurrency)


def sparse_to_dense(values: list[int]) -> list[int]:
    """Shifted sparse (0 = abstain) -> dense (-1 = abstain)."""
    return [v - 1 for v in values]


class VoteScorer:
    """Weighted LF-vote scorer over sparse label rows (map_batches fn).

    Emits ``(candidate_stable_id, prob)`` marginals (the reference's
    ``Marginal`` rows, ``learning/models/marginal.py:7-35``)."""

    def __init__(self, weights: dict[str, float] | None = None):
        self.weights = weights or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        probs = []
        for row in batch.to_pylist():
            num = 0.0
            den = 0.0
            for k, v in zip(row["keys"], row["values"]):
                if v == 0:
                    continue
                w = self.weights.get(k, 1.0)
                vote = 1.0 if v - 1 > 0 else -1.0
                num += w * vote
                den += abs(w)
            probs.append(0.5 if den == 0 else (1.0 + num / den) / 2.0)
        return pa.table(
            {
                "doc_name": batch["doc_name"],
                "candidate_stable_id": batch["candidate_stable_id"],
                "relation": batch["relation"],
                "split": batch["split"],
                "prob": pa.array(probs, pa.float64()),
            }
        )


def score(
    label_ds: "ray.data.Dataset",
    weights: dict[str, float] | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    return score_with(label_ds, VoteScorer(weights), concurrency)


def score_with(label_ds, scorer, concurrency=None):
    return map_stage(
        label_ds, type(scorer), {"weights": scorer.weights}, 1024, concurrency
    )


def label_matrix_ds(
    label_ds: "ray.data.Dataset", lf_names: list[str]
) -> "ray.data.Dataset":
    """Distributed dense label matrix (analog of ``get_label_matrices``,
    ``labeler.py:309-417``): one row per candidate with its LF-vote vector
    as ``row: list<int64>`` (-1 = abstain), computed inside ``map_batches``
    — the matrix lives as Dataset blocks in the object store, never as one
    driver-side array. Consumers (the label model's sufficient-statistics
    passes, matrix export sinks) stream over it block by block."""
    import numpy as np

    name_idx = {n: i for i, n in enumerate(lf_names)}
    n_lfs = len(lf_names)

    def to_rows(batch: pa.Table) -> pa.Table:
        mat = -np.ones((len(batch), n_lfs), dtype=np.int64)
        for i, (keys, values) in enumerate(
            zip(batch["keys"].to_pylist(), batch["values"].to_pylist())
        ):
            for k, v in zip(keys, values):
                j = name_idx.get(k)
                if j is not None:
                    mat[i, j] = v - 1
        return pa.table(
            {
                "candidate_stable_id": batch["candidate_stable_id"],
                "row": pa.array(mat.tolist(), pa.list_(pa.int64())),
            }
        )

    return label_ds.map_batches(to_rows, batch_format="pyarrow")


def label_matrix(label_ds: "ray.data.Dataset", lf_names: list[str]):
    """Driver-side (ids, matrix) convenience over ``label_matrix_ds`` for
    small/test scales — the per-candidate vote vectors are computed
    distributed; only the final assembly streams to the driver."""
    import numpy as np

    ids: list[str] = []
    blocks: list[np.ndarray] = []
    for batch in label_matrix_ds(label_ds, lf_names).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        ids.extend(batch["candidate_stable_id"].to_pylist())
        blocks.append(np.asarray(batch["row"].to_pylist(), dtype=np.int64))
    if not blocks:
        return ids, -np.ones((0, len(lf_names)), dtype=np.int64)
    return ids, np.concatenate(blocks, axis=0)
