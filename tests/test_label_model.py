"""Generative label model: EM recovers LF accuracies and beats majority vote."""

import numpy as np
import pyarrow as pa
import pytest


def synth_labels(n=3000, accs=(0.9, 0.75, 0.6, 0.55), abstain=0.3, seed=11):
    """Sparse label rows from planted ground truth + LFs with known
    accuracies (sparse encoding: 0 abstain, 1 negative, 2 positive)."""
    rng = np.random.RandomState(seed)
    y = rng.rand(n) < 0.4
    names = [f"lf{j}" for j in range(len(accs))]
    rows = []
    for i in range(n):
        values = []
        for j, a in enumerate(accs):
            if rng.rand() < abstain:
                values.append(0)
                continue
            correct = rng.rand() < a
            vote = y[i] if correct else not y[i]
            values.append(2 if vote else 1)
        rows.append(
            {
                "doc_name": f"d{i}",
                "candidate_stable_id": f"c{i}",
                "relation": "r",
                "split": 0,
                "keys": names,
                "values": values,
            }
        )
    return rows, y, names


def test_em_recovers_accuracy_order_and_beats_majority(ray_session):
    import ray.data as rd

    from fonduer_ray.stages.label_model import LabelModel

    rows, y, names = synth_labels()
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    lm = LabelModel(n_iter=25).fit(ds, names)

    # learned accuracies preserve the planted order: lf0 > lf1 > lf2 > lf3
    a = [lm.alpha[n] for n in names]
    assert a[0] > a[1] > a[2], a
    assert a[0] > 0.8 and a[3] < 0.68
    # class balance near the planted 0.4
    assert lm.p == pytest.approx(0.4, abs=0.08)

    probs = {
        r["candidate_stable_id"]: r["prob"]
        for r in lm.predict_proba(ds).take_all()
    }
    pred = np.array([probs[f"c{i}"] > 0.5 for i in range(len(y))])

    # unweighted majority vote baseline
    maj = []
    for r in rows:
        votes = [1 if v == 2 else -1 for v in r["values"] if v != 0]
        maj.append(sum(votes) > 0)
    maj = np.array(maj)

    acc_model = (pred == y).mean()
    acc_major = (maj == y).mean()
    assert acc_model > acc_major
    assert acc_model > 0.8

    # learned log-odds weights plug into the VoteScorer serving path
    w = lm.weights()
    assert w["lf0"] > w["lf1"] > w["lf2"] > 0


def test_em_deterministic(ray_session):
    import ray.data as rd

    from fonduer_ray.stages.label_model import LabelModel

    rows, _, names = synth_labels(n=500)
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    a = LabelModel(n_iter=10).fit(ds, names)
    b = LabelModel(n_iter=10).fit(ds, names)
    assert a.alpha == b.alpha and a.p == b.p
