"""KB reasoning: brute-force cross-check of 2-hop path inference and
bit-identity of the broadcast vs hash-partition-join paths."""

from __future__ import annotations

import pandas as pd
import pytest

from fonduer_ray.functions import kb


def _triples_ds(rows):
    import ray.data

    df = pd.DataFrame(rows, columns=["subj", "pred", "obj", "support"])
    df["support"] = df["support"].astype("int64")
    return ray.data.from_pandas(df).repartition(3)


@pytest.fixture(scope="module")
def triple_rows(ray_session):
    import numpy as np

    rng = np.random.default_rng(17)
    ents = [f"e{i}" for i in range(12)]
    seen = {}
    for _ in range(80):
        s, o = rng.choice(ents, 2, replace=False)
        seen[(s, o)] = seen.get((s, o), 0) + int(rng.integers(1, 9))
    return [(s, "cooccurs", o, w) for (s, o), w in sorted(seen.items())]


def _brute(rows):
    adj: dict[str, list] = {}
    pairs = set()
    for s, _p, o, w in rows:
        adj.setdefault(s, []).append((o, w))
        pairs.add((s, o))
    out: dict[tuple, list] = {}
    for s, _p, b, s1 in rows:
        for z, s2 in adj.get(b, ()):
            if z != s:
                mass, n = out.get((s, z), (0, 0))
                out[(s, z)] = (mass + s1 * s2, n + 1)
    return {
        (s, z): (mass, n, 1 if (s, z) in pairs else 0)
        for (s, z), (mass, n) in out.items()
    }


def test_two_hop_brute(triple_rows):
    got = kb.two_hop_paths(_triples_ds(triple_rows)).to_pandas()
    want = _brute(triple_rows)
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        assert want[(row.subj, row.obj)] == (
            row.path_mass,
            row.n_paths,
            row.direct,
        )
    # sorted by (path_mass desc, subj, obj)
    key = list(zip(-got["path_mass"], got["subj"], got["obj"]))
    assert key == sorted(key)


def test_two_hop_paths_match(triple_rows):
    """broadcast (default) and hash-partition join (forced) are
    bit-identical."""
    a = kb.two_hop_paths(_triples_ds(triple_rows)).to_pandas()
    b = kb.two_hop_paths(
        _triples_ds(triple_rows), broadcast_limit=0
    ).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_two_hop_excludes_self_and_flags_direct(ray_session):
    rows = [
        ("a", "cooccurs", "b", 2),
        ("b", "cooccurs", "c", 3),
        ("a", "cooccurs", "c", 1),  # direct edge for the (a, c) path
        ("b", "cooccurs", "a", 5),  # makes a->b->a a self-loop: excluded
    ]
    got = kb.two_hop_paths(_triples_ds(rows)).to_pandas()
    got = {
        (r.subj, r.obj): (r.path_mass, r.n_paths, r.direct)
        for r in got.itertuples(index=False)
    }
    # a->b->a and b->a->b are self-loops: excluded entirely
    assert ("a", "a") not in got and ("b", "b") not in got
    # a->b->c: mass 2*3 via one bridge; direct a->c edge exists
    # b->a->c: mass 5*1 via one bridge; direct b->c edge exists
    assert got == {("a", "c"): (6, 1, 1), ("b", "c"): (5, 1, 1)}


def _brute_shared(rows):
    inv: dict[str, list] = {}
    for s, _p, o, w in rows:
        inv.setdefault(o, []).append((s, w))
    out: dict[tuple, list] = {}
    for subs in inv.values():
        for i, (a, s1) in enumerate(subs):
            for b, s2 in subs:
                if a < b:
                    mass, n = out.get((a, b), (0, 0))
                    out[(a, b)] = (mass + s1 * s2, n + 1)
    return out


def test_shared_object_pairs_brute(triple_rows):
    got = kb.shared_object_pairs(_triples_ds(triple_rows)).to_pandas()
    want = _brute_shared(triple_rows)
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        assert want[(row.subj_a, row.subj_b)] == (row.path_mass, row.n_shared)
    key = list(zip(-got["path_mass"], got["subj_a"], got["subj_b"]))
    assert key == sorted(key)


def test_shared_object_pairs_paths_match(triple_rows):
    a = kb.shared_object_pairs(_triples_ds(triple_rows)).to_pandas()
    b = kb.shared_object_pairs(
        _triples_ds(triple_rows), broadcast_limit=0
    ).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_provenance_consistent_with_canonical_support(ray_session):
    """Aggregated instance lineage must reproduce the canonical table's
    per-(subj, obj) support exactly, and doc bounds must be ordered."""
    from fonduer_ray.pipelines import docops

    sf = "/root/testdata/sf0.001"
    prov = docops.kb_triple_provenance(sf).to_pandas()
    canon = docops.triples(sf).to_pandas()
    want = {
        (r.subj, r.obj): r.support for r in canon.itertuples(index=False)
    }
    got = {
        (r.subj, r.obj): r.support for r in prov.itertuples(index=False)
    }
    assert got == want
    assert (prov["first_doc"] <= prov["last_doc"]).all()
    assert (prov["n_docs"] <= prov["support"]).all()


def test_truth_fixed_point_hand_case():
    """Hand-computed 2-round Sums/Investment arithmetic: a focused source
    (1 claim) invests its full trust; a spammy source (4 claims) invests a
    quarter per claim, so the fact backed by the focused source wins."""
    from fonduer_ray.pipelines.docops import truth_fixed_point

    claims = [
        ("good", "a", "x"),              # focused: n=1
        ("spam", "a", "y"), ("spam", "b", "y"),
        ("spam", "c", "y"), ("spam", "d", "y"),  # spammy: n=4
        ("mid", "a", "x"), ("mid", "b", "y"),    # n=2
    ]
    got = truth_fixed_point(claims).to_pandas()
    # round 1: c1(a,x)=10000//1 + 10000//2 = 15000;
    #          c1(*,y)=2500 each except (b,y)=2500+5000=7500
    # trusts:  good = 15000//1 = 15000
    #          spam = (2500+7500+2500+2500)//4 = 3750
    #          mid  = (15000+7500)//2 = 11250
    # round 2: conf(a,x) = 15000//1 + 11250//2 = 20625
    #          conf(a,y) = 3750//4 = 937
    #          conf(b,y) = 937 + 11250//2 = 6562
    want = {
        ("a", "x"): (2, 20625),
        ("a", "y"): (1, 937),
        ("b", "y"): (2, 6562),
        ("c", "y"): (1, 937),
        ("d", "y"): (1, 937),
    }
    assert {
        (r.subj, r.obj): (r.n_sources, r.conf)
        for r in got.itertuples(index=False)
    } == want


def test_truth_discovery_matches_brute_on_corpus(ray_session):
    """Full brute re-derivation from the raw documents parquet: claims via
    the same 10-token-window/distance<=3 predicate, then the reference
    fixed point — the distributed path must agree exactly."""
    import pyarrow.parquet as pq

    from fonduer_ray.pipelines.docops import (
        kb_truth_discovery,
        truth_fixed_point,
    )

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    subj_v = {"spark", "hash", "merge", "sort"}
    obj_v = {"window", "batch", "stream", "join"}
    claims = set()
    for text, source in zip(docs["text"], docs["source"]):
        toks = text.split(" ")
        for i, a in enumerate(toks):
            if a not in subj_v:
                continue
            for j in range(max(0, i - 3), min(len(toks), i + 4)):
                if toks[j] in obj_v and i // 10 == j // 10:
                    claims.add((source, a, toks[j]))
    want = truth_fixed_point(sorted(claims)).to_pandas()
    got = kb_truth_discovery(sf).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def _noisy_kb_ds():
    """Hand-built KB where rule lives(x,y) ∧ in(y,z) ⇒ cityOf... has
    PARTIAL confidence: 3 of 4 groundings are confirmed facts."""
    import ray.data

    rows = [
        # body: lives ∘ in
        ("a", "lives", "p"), ("b", "lives", "p"),
        ("c", "lives", "q"), ("d", "lives", "q"),
        ("p", "in", "fr"), ("q", "in", "de"),
        # head extension: 3 of the 4 (person, country) pairs
        ("a", "nat", "fr"), ("b", "nat", "fr"), ("c", "nat", "de"),
        # a duplicate grounding path (second residence, same pair) must
        # not inflate support: e lives in BOTH p and p2, both in fr
        ("e", "lives", "p"), ("e", "lives", "p2"), ("p2", "in", "fr"),
        ("e", "nat", "fr"),
    ]
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(3)


def test_rule_mining_partial_confidence_and_dedup(ray_session):
    from fonduer_ray.functions.kb import rule_mining

    ds = _noisy_kb_ds()
    for limit in (2_000_000, 0):  # broadcast path, then forced join path
        got = rule_mining(ds, broadcast_limit=limit).to_pandas()
        rules = {
            (r.body_p, r.body_q, r.head_r): (r.support, r.n_correct, r.conf_bp)
            for r in got.itertuples(index=False)
        }
        # groundings of lives∘in: (a,fr) (b,fr) (c,de) (d,de) (e,fr) —
        # e's two paths collapse to ONE distinct grounding; 4 of 5 are
        # confirmed nat facts -> 8000 bp
        assert rules[("lives", "in", "nat")] == (5, 4, 8000)
        # no other rule has a correct prediction
        assert set(rules) == {("lives", "in", "nat")}


def _brute_rules(rows):
    adj = {}
    facts = {}
    for s, p, o in rows:
        adj.setdefault(s, []).append((p, o))
        facts.setdefault((s, o), set()).add(p)
    bodies = {}
    for s, p, o in rows:
        for q, z in adj.get(o, ()):
            bodies.setdefault((p, q), set()).add((s, z))
    out = {}
    for (p, q), grounds in bodies.items():
        hits = {}
        for x, z in grounds:
            for r in facts.get((x, z), ()):
                hits[r] = hits.get(r, 0) + 1
        for r, n in hits.items():
            out[(p, q, r)] = (len(grounds), n, n * 10000 // len(grounds))
    return out


def test_rule_mining_random_kbs_match_brute(ray_session):
    """Randomized small KBs (dense enough for 2-hop chains and head
    overlaps) vs a dict brute force, on BOTH plans."""
    import numpy as np
    import ray.data

    from fonduer_ray.functions.kb import rule_mining

    rng = np.random.default_rng(23)
    ents = [f"e{i}" for i in range(8)]
    preds = ["p", "q", "r"]
    for trial in range(3):
        rows = sorted(
            {
                (
                    str(rng.choice(ents)),
                    str(rng.choice(preds)),
                    str(rng.choice(ents)),
                )
                for _ in range(60)
            }
        )
        ds = ray.data.from_pandas(
            pd.DataFrame(rows, columns=["subj", "pred", "obj"])
        ).repartition(3)
        want = _brute_rules(rows)
        for limit in (2_000_000, 0):
            got = {
                (r.body_p, r.body_q, r.head_r): (
                    r.support, r.n_correct, r.conf_bp
                )
                for r in rule_mining(ds, broadcast_limit=limit)
                .to_pandas()
                .itertuples(index=False)
            }
            assert got == want, (trial, limit)
