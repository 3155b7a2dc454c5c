"""Exact distributed percentiles: brute-force rank checks, a heavy-skew
case (one dominant value), and block-layout invariance. Plus the
end-to-end near-dup survivor manifest."""

import numpy as np
import pytest

import ray.data

from fonduer_ray.functions.dedup import dedup_keep_survivors
from fonduer_ray.functions.sketches import exact_percentiles

PCTS = (1, 10, 25, 50, 75, 90, 99)


def brute(values, pcts=PCTS):
    cents = np.sort(np.rint(np.asarray(values) * 100).astype(np.int64))
    n = len(cents)
    return {p: cents[max(1, (p * n + 99) // 100) - 1] / 100.0 for p in pcts}


def run(values, **kw):
    ds = ray.data.from_items([{"value": float(v)} for v in values])
    return {r["pct"]: r["value"] for r in exact_percentiles(ds, **kw).take_all()}


def test_exact_percentiles_matches_bruteforce(ray_session):
    rng = np.random.RandomState(3)
    values = rng.uniform(0, 987.65, 4000).round(2)
    assert run(values) == brute(values)


def test_exact_percentiles_heavy_skew(ray_session):
    # 95% of the mass on a single value: most target ranks land in one
    # bucket and the within-bucket remainder walk must resolve them all
    values = [42.42] * 1900 + list(np.linspace(0, 100, 100).round(2))
    assert run(values) == brute(values)


def test_exact_percentiles_block_invariance(ray_session):
    rng = np.random.RandomState(11)
    values = rng.uniform(-50, 50, 1000).round(2)
    a = run(values)
    ds = ray.data.from_items(
        [{"value": float(v)} for v in values]
    ).repartition(37)
    b = {r["pct"]: r["value"] for r in exact_percentiles(ds).take_all()}
    assert a == b == brute(values)


def test_exact_percentiles_tiny_bucket_grid(ray_session):
    # n_buckets smaller than the distinct-value count forces real
    # pass-2 refinement inside wide buckets
    values = list(np.arange(1000) / 10.0)
    assert run(values, n_buckets=8) == brute(values)


def test_dedup_keep_survivors_bruteforce(ray_session):
    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"doc {i}"} for i in range(8)]
    )
    pairs = ray.data.from_items(
        [
            {"id_a": 0, "id_b": 3},
            {"id_a": 3, "id_b": 5},  # component {0,3,5}
            {"id_a": 1, "id_b": 2},  # component {1,2}
        ]
    )
    out = {
        r["doc_id"]: r["cluster_size"]
        for r in dedup_keep_survivors(docs, pairs).take_all()
    }
    assert out == {0: 3, 1: 2, 4: 1, 6: 1, 7: 1}


def test_grouped_percentiles_matches_bruteforce(ray_session):
    from fonduer_ray.functions.sketches import grouped_percentiles

    rng = np.random.RandomState(5)
    rows = [
        {"grp": ["a", "b", "c"][i % 3], "value": float(v)}
        for i, v in enumerate(rng.uniform(0, 500, 3000).round(2))
    ]
    # heavy skew inside one group
    rows += [{"grp": "a", "value": 7.77}] * 500
    ds = ray.data.from_items(rows)
    got = {
        (r["grp"], r["pct"]): r["value"]
        for r in grouped_percentiles(ds, "grp", n_buckets=16).take_all()
    }
    import pandas as pd

    df = pd.DataFrame(rows)
    want = {}
    for g, sub in df.groupby("grp"):
        cents = np.sort(np.rint(sub["value"].to_numpy() * 100).astype(np.int64))
        n = len(cents)
        for pct in (50, 90, 99):
            want[(g, pct)] = cents[max(1, (pct * n + 99) // 100) - 1] / 100.0
    assert got == want


def test_percentiles_empty_input(ray_session):
    import pyarrow as pa

    from fonduer_ray.functions.sketches import grouped_percentiles

    empty = ray.data.from_arrow(
        pa.table({"grp": pa.array([], pa.string()),
                  "value": pa.array([], pa.float64())})
    )
    assert exact_percentiles(empty.select_columns(["value"])).count() == 0
    assert grouped_percentiles(empty, "grp").count() == 0
    # an INT group key must keep its type in the empty result (the r3
    # early-return hardcoded string, breaking unions with non-empty runs)
    empty_int = ray.data.from_arrow(
        pa.table({"gid": pa.array([], pa.int64()),
                  "value": pa.array([], pa.float64())})
    )
    out = grouped_percentiles(empty_int, "gid")
    assert out.count() == 0
    assert out.schema().base_schema.field("gid").type == pa.int64()
