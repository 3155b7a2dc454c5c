"""End-to-end pipeline tests: P/R vs generated gold, linking, resume."""

import json
import os

import pyarrow.parquet as pq
import pytest

import ray.data as rd

from fonduer_ray.pipelines.kg import KGConfig, build_triples, entity_prf, run_kg
from fonduer_ray.sources.webpages import generate_corpus, read_webpages
from fonduer_ray.stages.linking import (
    build_canonical_map,
    dedup_triples,
    normalize_surface,
)
from fonduer_ray.stages.materialize import completed_buckets, write_triples


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus_e2e")
    return generate_corpus(str(out), n_docs=100)


@pytest.fixture(scope="module")
def kb(corpus, tmp_path_factory):
    """One full run_kg shared by every test in this module."""
    out = str(tmp_path_factory.mktemp("kb_out") / "kb")
    cfg = KGConfig()
    res = run_kg(corpus["corpus"], out, cfg)
    return {"out": out, "cfg": cfg, "res": res}


def gold_set(corpus):
    g = pq.read_table(corpus["gold"]).to_pylist()
    return {(r["subj"], r["pred"], r["obj"]) for r in g}


def test_e2e_precision_recall(corpus, kb):
    assert kb["res"]["rows_written"] > 0
    rows = rd.read_parquet(kb["out"], file_extensions=["parquet"]).take_all()
    pred = {(r["subj"], r["pred"], r["obj"]) for r in rows}
    prf = entity_prf(pred, gold_set(corpus))
    assert prf["precision"] >= 0.95
    assert prf["recall"] >= 0.95
    assert all(r["support"] >= 1 and r["provenance_doc"] for r in rows)


def test_manifest_contents(kb):
    mdir = os.path.join(kb["out"], "_manifests")
    manifests = [json.load(open(os.path.join(mdir, f))) for f in os.listdir(mdir)]
    assert manifests
    total = sum(m["rows"] for m in manifests)
    data = rd.read_parquet(kb["out"], file_extensions=["parquet"])
    assert data.count() == total
    assert all(m["config_hash"] == kb["cfg"].config_hash() for m in manifests)


def test_resume_skips_completed_buckets(kb, corpus, tmp_path):
    out = kb["out"]
    cfg = kb["cfg"]
    done = completed_buckets(out, cfg.config_hash())
    assert done == set(kb["res"]["written_buckets"])
    # re-run over the same output dir: everything checkpointed -> no writes
    pages = read_webpages(corpus["corpus"])
    triples = build_triples(pages, cfg)
    res2 = write_triples(triples, out, cfg.config_hash(), n_buckets=cfg.n_buckets)
    assert res2["rows_written"] == 0
    assert set(res2["skipped_buckets"]) == done
    # run_kg's own fast path short-circuits BEFORE building the pipeline
    # (canonicalize pins the extraction eagerly, so this must be pre-checked)
    from fonduer_ray.pipelines.kg import run_kg

    res3 = run_kg(corpus["corpus"], out, cfg)
    assert res3["rows_written"] == 0
    assert set(res3["skipped_buckets"]) == done


def test_normalize_surface():
    assert normalize_surface("  ab–100 ") == "AB-100"
    assert normalize_surface("Spark.") == "SPARK"
    assert normalize_surface("a  b") == "A B"


def test_canonical_map(ray_session):
    ds = rd.from_items(
        [{"subj": "spark", "obj": "x"}] * 3
        + [{"subj": "Spark", "obj": "x"}] * 5
        + [{"subj": "SPARK.", "obj": "y"}]
    )
    cmap = build_canonical_map(ds, ["subj"], n_salts=4)
    assert cmap["SPARK"] == "Spark"  # most frequent surface wins


def test_entity_support(ray_session):
    from fonduer_ray.stages.linking import entity_support

    rows = (
        [{"subj_norm": "SPARK", "obj_norm": "X"}] * 7
        + [{"subj_norm": "HASH", "obj_norm": "SPARK"}] * 2
    )
    out = {r["norm"]: r["support"] for r in entity_support(rd.from_items(rows), n_salts=4).take_all()}
    assert out == {"SPARK": 9, "X": 7, "HASH": 2}


def test_dedup_triples(ray_session):
    rows = [
        {"subj": "A", "pred": "p", "obj": "1", "doc_name": f"d{i}",
         "candidate_stable_id": f"c{i}", "score": 0.5 + i / 10}
        for i in range(3)
    ]
    out = dedup_triples(rd.from_items(rows)).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["support"] == 3
    assert r["score"] == pytest.approx(0.7)
    assert r["provenance_doc"] == "d0"


def test_incremental_upsert(ray_session, tmp_path):
    """Featurizer.update / clear=False analog: append-generations + newest
    key wins at read (reference tests/e2e/test_incremental.py semantics)."""
    import pyarrow as pa

    import ray.data

    from fonduer_ray.stages.materialize import append_generation, read_upserted

    out = str(tmp_path / "feats")
    g0 = ray.data.from_arrow(
        pa.table({"cid": ["a", "b", "c"], "val": [1, 2, 3]})
    )
    assert append_generation(g0, out, "cid") == 0
    # re-apply over a changed doc: candidate b recomputed, d added
    g1 = ray.data.from_arrow(pa.table({"cid": ["b", "d"], "val": [20, 40]}))
    assert append_generation(g1, out, "cid") == 1
    rows = {r["cid"]: r["val"] for r in read_upserted(out, "cid").take_all()}
    assert rows == {"a": 1, "b": 20, "c": 3, "d": 40}


def test_linking_under_head_entity_skew(ray_session):
    """north_rule skew mitigation: a Zipfian head entity (90% of all rows)
    still canonicalizes and counts correctly through the salted two-phase
    aggregates — per-block combiners bound (norm, surface) rows and salting
    splits the norm-keyed support aggregate."""
    import pyarrow as pa

    import ray.data as rd

    from fonduer_ray.stages.linking import (
        build_canonical_map,
        entity_support,
        link_triples,
    )

    n_head, n_tail = 9000, 1000
    subj = ["RayData"] * (n_head // 2) + ["raydata"] * (n_head // 2) + [
        f"ent{i}" for i in range(n_tail)
    ]
    rows = pa.table(
        {
            "subj": subj,
            "pred": ["p"] * len(subj),
            "obj": ["x"] * len(subj),
            "doc_name": [f"d{i}" for i in range(len(subj))],
            "candidate_stable_id": [f"c{i}" for i in range(len(subj))],
            "score": [1.0] * len(subj),
        }
    )
    ds = rd.from_arrow(rows).repartition(16)
    canon = build_canonical_map(ds, ["subj", "obj"])
    # head entity folds case variants to one canonical surface
    assert canon["RAYDATA"] in ("RayData", "raydata")
    linked = link_triples(ds)
    support = {
        r["norm"]: r["support"] for r in entity_support(linked).take_all()
    }
    # every head occurrence counted exactly once despite salting (subj only;
    # obj "x" contributes its own norm)
    assert support["RAYDATA"] == n_head
    assert support["X"] == len(subj)
    assert sum(v for k, v in support.items() if k.startswith("ENT")) == n_tail

    # the shuffle-join path (vocabulary above the broadcast guard) must
    # produce exactly the broadcast path's output
    joined = link_triples(ds, broadcast_limit=0)
    key = lambda r: (r["subj"], r["pred"], r["obj"], r["doc_name"])
    assert sorted(map(key, joined.take_all())) == sorted(
        map(key, linked.take_all())
    )


def test_relational_lookup_join_guard(ray_session):
    """`attach_lookup`'s Dataset.join path (lookup above the broadcast
    guard) matches the broadcast path exactly, including inner-join drops."""
    import pyarrow as pa

    import ray.data as rd

    from fonduer_ray.pipelines.relational import attach_lookup

    big = rd.from_arrow(
        pa.table({"k": [1, 2, 3, 2, 9], "payload": ["a", "b", "c", "d", "e"]})
    ).repartition(3)
    small = rd.from_arrow(
        pa.table({"id": [1, 2, 3, 4], "name": ["one", "two", "three", "four"]})
    )

    key = lambda r: (r["k"], r["payload"], r["name"])
    bcast = sorted(
        map(key, attach_lookup(big, small, "k", "id", "name").take_all())
    )
    joined = sorted(
        map(key, attach_lookup(big, small, "k", "id", "name", broadcast_limit=0).take_all())
    )
    assert bcast == joined
    assert bcast == [(1, "a", "one"), (2, "b", "two"), (2, "d", "two"), (3, "c", "three")]


def test_orders_per_nation_join_path_equality(ray_session, sf_dir):
    """orders_per_nation through the guarded Dataset.join path equals the
    broadcast path (and hence the DuckDB oracle)."""
    from fonduer_ray.pipelines.relational import orders_per_nation

    rows = lambda ds: sorted(
        (r["n_name"], r["n_orders"]) for r in ds.take_all()
    )
    assert rows(orders_per_nation(sf_dir, broadcast_limit=0)) == rows(
        orders_per_nation(sf_dir)
    )


def test_incremental_triples_equal_batch(ray_session, sf_dir):
    """Generation-appended extraction + re-crawl upsert + canonicalize-at-
    read must be value-identical to the one-shot batch run (the reference's
    clear=False incremental semantics, test_incremental.py analog)."""
    from fonduer_ray.pipelines import docops

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns), ignore_index=True)

    import pandas as pd

    pd.testing.assert_frame_equal(
        canon(docops.triples_incremental(sf_dir)),
        canon(docops.triples(sf_dir)),
    )


def test_triple_confidence_brute(ray_session):
    """Confidence scores must equal the integer-PMI formula computed
    brute-force from the engine's own triple table."""
    from fonduer_ray.pipelines import docops

    sf = "/root/testdata/sf0.001"
    trip = docops.triples(sf).to_pandas()
    got = docops.triple_confidence(sf).to_pandas()

    t_total = int(trip["support"].sum())
    sm = trip.groupby("subj")["support"].sum()
    om = trip.groupby("obj")["support"].sum()
    exp = trip[["subj", "obj", "support"]].copy()
    exp["score"] = [
        int(s) * t_total * t_total // (int(sm[a]) * int(om[b]))
        for a, b, s in zip(exp["subj"], exp["obj"], exp["support"])
    ]
    exp = exp.sort_values(
        ["score", "subj", "obj"], ascending=[False, True, True],
        ignore_index=True,
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)
