"""Composed weak-supervision e2e gate (the reference CI progression,
``tests/e2e/test_e2e.py:271-425``: LF vote baseline 0.3<F1<0.7 -> trained
discriminative model >0.7): LabelModel -> log-odds fit -> held-out scoring
-> entity-level F1 vs gold, with the trained scorer required to beat the
majority-vote scorer."""

import numpy as np
import pyarrow as pa
import pytest

from fonduer_ray.stages.schemas import FEATURE_SCHEMA, LABEL_SCHEMA


def synth_e2e(n=3000, accs=(0.8, 0.7, 0.6), abstain=0.4, seed=7):
    """Planted ground truth + noisy abstaining LFs + INFORMATIVE features:
    ``F_pos``/``F_neg`` flag the true class exactly (the reference's
    featurizer playing the same role), plus balanced noise keys. The LF
    vote alone is noisy and recall-capped by all-abstain candidates; a
    discriminative fit on the features can denoise past it."""
    rng = np.random.RandomState(seed)
    y = (rng.rand(n) < 0.5).astype(int)
    names = [f"lf{j}" for j in range(len(accs))]
    lab_rows, feat_rows = [], []
    for i in range(n):
        values = []
        for a in accs:
            if rng.rand() < abstain:
                values.append(0)
                continue
            vote = y[i] if rng.rand() < a else 1 - y[i]
            values.append(2 if vote else 1)
        split = 0 if i < n // 2 else 1
        base = {
            "doc_name": f"d{i}",
            "candidate_stable_id": f"c{i}",
            "relation": "r",
            "split": split,
        }
        lab_rows.append({**base, "keys": names, "values": values})
        keys = ["F_pos" if y[i] else "F_neg", f"F_noise_{i % 7}"]
        feat_rows.append(
            {**base, "keys": sorted(keys), "values": [1.0] * len(keys)}
        )
    return lab_rows, feat_rows, y, names


def _f1(pred: set, gold: set) -> float:
    tp = len(pred & gold)
    if not pred or not gold or not tp:
        return 0.0
    p, r = tp / len(pred), tp / len(gold)
    return 2 * p * r / (p + r)


def test_trained_scorer_beats_vote_scorer_f1(ray_session):
    import ray.data as rd

    from fonduer_ray.stages.label_model import LabelModel
    from fonduer_ray.stages.label_stage import score
    from fonduer_ray.stages.train_stage import fit_log_odds, score_log_odds

    lab_rows, feat_rows, y, names = synth_e2e()
    n = len(y)
    lab = rd.from_arrow(pa.Table.from_pylist(lab_rows, schema=LABEL_SCHEMA))
    feats = rd.from_arrow(
        pa.Table.from_pylist(feat_rows, schema=FEATURE_SCHEMA)
    )
    gold = {f"c{i}" for i in range(n // 2, n) if y[i]}

    # majority-vote baseline on the held-out split (reference's LF-only
    # marginal scoring: noisy + recall-capped by all-abstain candidates)
    vote_pred = {
        r["candidate_stable_id"]
        for r in score(lab.filter(expr="split == 1")).take_all()
        if r["prob"] > 0.5
    }
    f1_vote = _f1(vote_pred, gold)

    # composed gate: EM on split-0 votes -> thresholded y -> log-odds fit
    # on split-0 features -> score split 1
    train_lab = lab.filter(expr="split == 0")
    lm = LabelModel(n_iter=15).fit(train_lab, names)

    def to_y(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "candidate_stable_id": t["candidate_stable_id"],
                "y": pa.array(
                    [int(p > 0.5) for p in t["prob"].to_pylist()], pa.int64()
                ),
            }
        )

    y_ds = lm.predict_proba(train_lab).map_batches(
        to_y, batch_format="pyarrow"
    )
    weights, bias = fit_log_odds(feats.filter(expr="split == 0"), y_ds)
    trained_pred = {
        r["candidate_stable_id"]
        for r in score_log_odds(
            feats.filter(expr="split == 1"), weights, bias
        ).take_all()
        if r["score"] > 0.5
    }
    f1_trained = _f1(trained_pred, gold)

    # the reference progression: noisy-but-informative LF baseline,
    # trained model strictly better and strong in absolute terms
    assert 0.3 < f1_vote < 0.9, f1_vote
    assert f1_trained > 0.9, f1_trained
    assert f1_trained > f1_vote, (f1_trained, f1_vote)


def test_e2e_weak_f1_query_shape(ray_session):
    from fonduer_ray.pipelines import docops

    t = docops.e2e_weak_supervision("/root/testdata/sf0.001")
    row = {k: v[0] for k, v in t.to_pydict().items()}
    assert row["n_pred"] > 0 and row["n_gold"] > 0
    assert row["n_tp"] <= min(row["n_pred"], row["n_gold"])
    assert 0 < row["f1_cents"] < 100
    expected = (200 * row["n_tp"]) // (row["n_pred"] + row["n_gold"])
    assert row["f1_cents"] == expected


def test_e2e_gate_progression_at_fixture_scale(ray_session):
    """Entity-level progression on the driver corpus itself: the trained
    scorer's dev-split F1 must beat predicting EVERY dev candidate (what
    the degenerate single-class fit would do)."""
    import ray.data as rd

    from fonduer_ray.pipelines import docops
    from fonduer_ray.stages.candidate_stage import doc_split

    sf = "/root/testdata/sf0.001"
    t = docops.e2e_weak_supervision(sf)
    row = {k: v[0] for k, v in t.to_pydict().items()}

    # all-candidates baseline from the oracle-equivalent driver derivation
    docs = rd.read_parquet(f"{sf}/documents.parquet").take_all()
    pred_all, gold = set(), set()
    from fonduer_ray.functions.dedup import _md5_64

    for d in docs:
        if doc_split(str(d["doc_id"])) != 1:
            continue
        toks = (d["text"] or "").split()
        subj = [(i, w) for i, w in enumerate(toks) if w in docops.SUBJ_DICT]
        obj = [(i, w) for i, w in enumerate(toks) if w in docops.OBJ_DICT]
        for ia, wa in subj:
            for ib, wb in obj:
                if ia // docops.PARA_TOKENS != ib // docops.PARA_TOKENS:
                    continue
                d_ab = abs(ia - ib)
                if d_ab <= docops.WINDOW:
                    pred_all.add((d["doc_id"], wa, wb))
                if (
                    d_ab <= docops.GOLD_WINDOW
                    and _md5_64(f"{d['doc_id']}:{wa}:{wb}") % 2 == 0
                ):
                    gold.add((d["doc_id"], wa, wb))
    f1_all = _f1(pred_all, gold)
    f1_trained = row["f1_cents"] / 100.0
    # the trained scorer prunes candidates, so its F1 differs from (and the
    # gate requires: does not collapse to) the predict-everything baseline
    assert row["n_pred"] < len(pred_all)
    assert row["n_gold"] == len(gold)
    assert f1_trained > 0 and abs(f1_trained - f1_all) > 1e-9
