"""Mergeable sketches (HLL / count-min / KMV): estimator accuracy against
exact brute-force answers, and merge-exactness (block partials == one-shot).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fonduer_ray.functions import sketches
from fonduer_ray.functions.sketches import (
    _shingles,
    cms_query,
    hll_estimate,
    kmv_estimate,
)


def _corpus(n_docs: int = 60, words_per_doc: int = 120, seed: int = 7):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(400)]
    docs = [
        " ".join(rng.choice(vocab, size=words_per_doc).tolist())
        for _ in range(n_docs)
    ]
    return docs


def _exact_shingle_stats(docs):
    from collections import Counter

    counts: Counter = Counter()
    for d in docs:
        counts.update(_shingles(d))
    return counts


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    docs = _corpus()
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    ).repartition(6)
    return docs, ds


def test_hll_estimate_within_error(docs_ds):
    docs, ds = docs_ds
    exact = len(_exact_shingle_stats(docs))
    regs = hll_registers_rows(ds)
    est = hll_estimate(regs)
    # sigma ~ 1.04/sqrt(4096) = 1.6%; allow 4 sigma
    assert abs(est - exact) / exact < 0.065


def hll_registers_rows(ds, p: int = 12):
    return sketches.hll_registers(ds, p=p).take_all()


def test_hll_merge_is_exact(docs_ds):
    """Register table from 6 blocks == register table from 1 block."""
    docs, ds = docs_ds
    one = sketches.hll_registers(ds.repartition(1)).to_pandas()
    many = sketches.hll_registers(ds).to_pandas()
    key = ["bucket", "max_rho"]
    pd.testing.assert_frame_equal(
        one.sort_values(key, ignore_index=True)[key],
        many.sort_values(key, ignore_index=True)[key],
    )


def test_cms_point_query_upper_bound(docs_ds):
    docs, ds = docs_ds
    exact = _exact_shingle_stats(docs)
    counters = sketches.cms_counters(ds).take_all()
    total = sum(exact.values())
    items = list(exact)[:200]
    for t in items:
        q = cms_query(counters, t)
        assert q >= exact[t]
        # standard CMS guarantee: error < e/width * total mass (w.h.p.)
        assert q - exact[t] <= np.e / 1024 * total * 4


def test_cms_tight_when_sparse(ray_session):
    """With distinct items << width, queries are exact for almost all items."""
    import ray.data

    rng = np.random.default_rng(3)
    vocab = [f"v{i}" for i in range(12)]
    docs = [" ".join(rng.choice(vocab, size=40).tolist()) for _ in range(8)]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    ).repartition(3)
    exact = _exact_shingle_stats(docs)
    counters = sketches.cms_counters(ds).take_all()
    over = sum(cms_query(counters, t) > exact[t] for t in exact)
    assert over <= len(exact) * 0.05


def test_cms_total_mass_preserved(docs_ds):
    docs, ds = docs_ds
    exact_total = sum(_exact_shingle_stats(docs).values())
    df = sketches.cms_counters(ds).to_pandas()
    # each of the 4 rows holds the full occurrence mass
    per_row = df.groupby("row")["count"].sum()
    assert (per_row == exact_total).all()


def test_kmv_estimate_and_merge(docs_ds):
    docs, ds = docs_ds
    exact = len(_exact_shingle_stats(docs))
    rows = sketches.kmv_sketch(ds).take_all()
    est = kmv_estimate(rows)
    # k=256 -> sigma ~ 1/sqrt(254) ~ 6.3%; allow 4 sigma
    assert abs(est - exact) / exact < 0.25
    # ranks are 1..k with strictly increasing hashes
    hashes = [r["hash"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert hashes == sorted(hashes)
    assert len(set(hashes)) == len(hashes)


def test_sampled_quantiles_accuracy_and_partition_invariance(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    vals = rng.normal(50.0, 10.0, size=20_000).round(2)
    df = pd.DataFrame({"event_id": np.arange(len(vals)), "value": vals})

    got3 = sketches.sampled_quantiles(
        ray.data.from_pandas(df).repartition(3), k=2048
    ).to_pandas()
    got8 = sketches.sampled_quantiles(
        ray.data.from_pandas(df).repartition(8), k=2048
    ).to_pandas()
    # bottom-k-by-hash is merge-exact: block layout cannot change the sample
    pd.testing.assert_frame_equal(
        got3.sort_values("pct", ignore_index=True),
        got8.sort_values("pct", ignore_index=True),
    )
    # sampling error: k=2048 -> quantile rank se ~ sqrt(q(1-q)/k) < 1.2%;
    # compare against exact quantiles with a generous 4-sigma band in rank
    exact_sorted = np.sort(vals)
    for _, row in got3.iterrows():
        q = row["pct"] / 100.0
        lo = exact_sorted[int(max(0, (q - 0.05) * len(vals)))]
        hi = exact_sorted[int(min(len(vals) - 1, (q + 0.05) * len(vals)))]
        assert lo <= row["value"] <= hi


def test_sampled_quantiles_small_input_exact(ray_session):
    import ray.data

    df = pd.DataFrame({"event_id": range(100), "value": np.arange(100.0)})
    got = sketches.sampled_quantiles(
        ray.data.from_pandas(df).repartition(4), k=1024
    ).to_pandas()
    # n < k: the "sample" is the full data -> exact discrete quantiles
    want = {1: 0.0, 10: 9.0, 25: 24.0, 50: 49.0, 75: 74.0, 90: 89.0, 99: 98.0}
    assert dict(zip(got["pct"], got["value"])) == want


def test_sample_per_group_deterministic_and_stratified(ray_session):
    import ray.data

    from fonduer_ray.functions.dedup import _md5_64

    rng = np.random.default_rng(23)
    groups = rng.choice(["a", "b", "c"], size=500)
    df = pd.DataFrame({"g": groups, "k": np.arange(500)})

    got4 = sketches.sample_per_group(
        ray.data.from_pandas(df).repartition(4), "g", "k", n_per_group=5
    ).to_pandas()
    got9 = sketches.sample_per_group(
        ray.data.from_pandas(df).repartition(9), "g", "k", n_per_group=5
    ).to_pandas()
    key = ["g", "rank"]
    pd.testing.assert_frame_equal(
        got4.sort_values(key, ignore_index=True),
        got9.sort_values(key, ignore_index=True),
    )
    # brute-force: bottom-5 by hash within each group, rank order by hash
    for g, sub in df.groupby("g"):
        want = sorted(sub["k"], key=lambda k: _md5_64(str(k)))[:5]
        grp = got4[got4["g"] == g].sort_values("rank")
        assert grp["k"].tolist() == want
        assert grp["rank"].tolist() == [1, 2, 3, 4, 5]


def test_sample_per_group_small_groups(ray_session):
    import ray.data

    df = pd.DataFrame({"g": ["x", "x", "y"], "k": [1, 2, 3]})
    got = sketches.sample_per_group(
        ray.data.from_pandas(df).repartition(2), "g", "k", n_per_group=5
    ).to_pandas()
    # groups smaller than n: every row kept, ranks contiguous from 1
    assert len(got) == 3
    assert set(got[got["g"] == "x"]["rank"]) == {1, 2}
    assert set(got[got["g"] == "y"]["rank"]) == {1}


def test_kmv_small_corpus_exact(ray_session):
    import ray.data

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": ["a b c d e"]})
    )
    rows = sketches.kmv_sketch(ds, k=256).take_all()
    # 3 distinct shingles < k: estimate is the exact count
    assert len(rows) == 3
    assert kmv_estimate(rows) == 3.0


def test_hll_per_group_matches_per_group_exact_registers(ray_session):
    import pyarrow as pa

    import ray.data
    from fonduer_ray.functions.dedup import _md5_64
    from fonduer_ray.functions.sketches import hll_estimate, hll_per_group

    groups = [f"g{i % 3}" for i in range(300)]
    keys = [i * 7 % 211 for i in range(300)]  # repeated keys within groups
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(groups), "k": pa.array(keys, pa.int64())})
    )
    out = hll_per_group(ds, "g", "k", p=12).take_all()

    # brute-force registers per group
    want: dict = {}
    for g, k in zip(groups, keys):
        h = _md5_64(str(k))
        bucket, w = h >> 52, h & ((1 << 52) - 1)
        rho = 53 - w.bit_length() if w else 53
        key = (g, bucket)
        want[key] = max(want.get(key, 0), rho)
    got = {(r["g"], r["bucket"]): r["max_rho"] for r in out}
    assert got == want

    # estimator sanity: within 10% of the true per-group distinct count
    for g in set(groups):
        regs = [r for r in out if r["g"] == g]
        true = len({k for gg, k in zip(groups, keys) if gg == g})
        assert abs(hll_estimate(regs) - true) / true < 0.1


def test_bloom_no_false_negatives_and_low_fpr(ray_session):
    import ray.data

    from fonduer_ray.functions.sketches import bloom_positions, bloom_probe

    keys = list(range(0, 2000, 2))  # evens present
    ds = ray.data.from_items([{"k": k} for k in keys])
    pos = bloom_positions(ds, key_col="k").take_all()
    present = bloom_probe(pos, keys)
    assert all(present), "bloom filters must have no false negatives"
    absent = bloom_probe(pos, list(range(1, 2000, 2)))  # odds absent
    fpr = sum(absent) / len(absent)
    assert fpr < 0.05, f"false-positive rate {fpr} too high for m=64k, n=1k, k=4"


def test_heavy_hitters_exact_at_any_sketch_width(ray_session):
    import ray.data
    from collections import Counter

    from fonduer_ray.functions.sketches import heavy_hitters

    docs = ray.data.from_items(
        [{"doc_id": i, "text": ("hot gram one " * 20) + f"cold {i} filler"}
         for i in range(30)]
    )
    truth = Counter()
    for i in range(30):
        toks = (("hot gram one " * 20) + f"cold {i} filler").split()
        for j in range(len(toks) - 2):
            truth[" ".join(toks[j : j + 3])] += 1
    want = {t: n for t, n in truth.items() if n >= 100}
    # a deliberately TINY sketch (width 8): massive overestimates mean a
    # bloated candidate set, but the verify pass must still return the
    # exact heavy-hitter counts
    got = {
        r["token"]: r["n"]
        for r in heavy_hitters(docs, threshold=100, width=8).take_all()
    }
    assert got == want and len(want) > 0


def test_heavy_hitters_broadcast_and_cms_paths_equal(ray_session):
    import ray.data

    from fonduer_ray.functions.sketches import heavy_hitters

    docs = ray.data.from_items(
        [{"doc_id": i, "text": ("hot gram one " * 10) + f"cold {i} tail x"}
         for i in range(20)]
    )
    broad = {
        r["token"]: r["n"]
        for r in heavy_hitters(docs, threshold=50, width=16).take_all()
    }
    # broadcast_limit=0 forces the no-driver-collection CMS-predicate path
    joined = {
        r["token"]: r["n"]
        for r in heavy_hitters(
            docs, threshold=50, width=16, broadcast_limit=0
        ).take_all()
    }
    assert broad == joined and len(broad) > 0


def test_heavy_hitters_rejects_unbounded_driver_sketch(ray_session):
    import pytest
    import ray.data

    from fonduer_ray.functions.sketches import heavy_hitters

    docs = ray.data.from_items([{"doc_id": 0, "text": "a b c d"}])
    with pytest.raises(ValueError, match="driver cell bound"):
        heavy_hitters(docs, depth=8, width=16 * 1024 * 1024)
