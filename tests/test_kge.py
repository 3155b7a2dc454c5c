"""KGE training-data ops: brute-force cross-checks for deterministic
negative sampling, rank-indexed adjacency, and hash-driven random walks
(including sink truncation and the forced hash-join path)."""

from __future__ import annotations

import pandas as pd
import pytest

from fonduer_ray.functions import kge, rdb2rdf
from fonduer_ray.functions.dedup import _md5_64


@pytest.fixture(scope="module")
def kb(ray_session, sf_dir):
    triples = rdb2rdf.rdb2rdf_triples(sf_dir).materialize()
    return triples, triples.to_pandas()


def test_negative_samples_brute_and_join_path(kb):
    triples, df = kb
    pos = df[df.pred == "placed_by"]
    vocab = sorted(pos["obj"].unique())
    n = len(vocab)
    want = {}
    for s, o in zip(pos["subj"], pos["obj"]):
        i = _md5_64(f"{s}:{o}") % n
        if vocab[i] == o:
            i = (i + 1) % n
        want[s] = (o, vocab[i])
    for limit in (None, 0):  # broadcast, then forced hash-join path
        got = kge.negative_samples(
            triples, "placed_by", broadcast_limit=limit
        ).to_pandas()
        assert len(got) == len(pos)
        by_subj = dict(zip(got["subj"], zip(got["obj"], got["obj_neg"])))
        assert by_subj == want
        assert (got["obj_neg"] != got["obj"]).all()


def test_indexed_adjacency_brute(ray_session):
    import ray.data

    rows = [
        ("a", "p", "b"), ("a", "p", "c"), ("c", "q", "a"),
        ("a", "z", "zz"),  # pred not selected -> ignored
        ("a", "q", "b"),   # duplicate (a, b) pair via another pred -> dedup
    ]
    ds = ray.data.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(3)
    got = {
        (r["src"], r["idx"]): (r["dst"], r["deg"])
        for r in kge.indexed_adjacency(ds, ["p", "q"]).take_all()
    }
    assert got == {
        ("a", 0): ("b", 2), ("a", 1): ("c", 2), ("c", 0): ("a", 1),
    }
    inv = {
        (r["src"], r["idx"]): (r["dst"], r["deg"])
        for r in kge.indexed_adjacency(
            ds, ["p", "q"], include_inverse=True
        ).take_all()
    }
    # inverse adds b->a, c->a and a->c (from c-q-a); (a,b)/(a,c) dedup
    assert inv == {
        ("a", 0): ("b", 2), ("a", 1): ("c", 2),
        ("b", 0): ("a", 1), ("c", 0): ("a", 1),
    }


def _brute_walks(df: pd.DataFrame, preds, start_pred, n_steps, inverse=True):
    edges = set()
    sel = df[df.pred.isin(preds)]
    for s, o in zip(sel["subj"], sel["obj"]):
        edges.add((s, o))
        if inverse:
            edges.add((o, s))
    adj: dict[str, list] = {}
    for s, o in sorted(edges):
        adj.setdefault(s, []).append(o)
    out = {}
    for start in sorted(df.loc[df.pred == start_pred, "subj"].unique()):
        cur, walk = start, [start]
        for k in range(n_steps):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = nbrs[_md5_64(f"{start}:{k}:{cur}") % len(nbrs)]
            walk.append(cur)
        out[start] = " ".join(walk)
    return out


def test_random_walks_brute(kb):
    triples, df = kb
    preds = ["placed_by", "in_nation", "in_region"]
    got = {
        r["start"]: r["walk"]
        for r in kge.random_walks(triples, preds, "placed_by", 3).take_all()
    }
    assert got == _brute_walks(df, preds, "placed_by", 3)
    # the hash draw must actually branch somewhere (inverse edges fan out)
    seconds = {w.split(" ")[2] for w in got.values() if len(w.split(" ")) > 2}
    assert len(seconds) > 1


def test_random_walks_sink_truncation_and_join_path(ray_session):
    """Without inverse edges the chain a->b->c dead-ends at c: a 2-step
    walk from 'a' truncates after 'c'; the forced hash-join path agrees."""
    import ray.data

    rows = [("a", "p", "b"), ("b", "p", "c")]
    ds = ray.data.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(2)
    for limit in (None, 0):
        got = {
            r["start"]: r["walk"]
            for r in kge.random_walks(
                ds, ["p"], "p", n_steps=3, include_inverse=False,
                broadcast_limit=limit,
            ).take_all()
        }
        assert got == {"a": "a b c", "b": "b c"}
