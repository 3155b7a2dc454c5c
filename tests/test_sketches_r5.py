"""Round-5 sketch/search additions: grouped MAD, equi-depth histogram,
phrase matching — brute-force cross-checks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _rank_median(vals: np.ndarray) -> int:
    """The engine's rank convention: value at rn = max(1, ceil(n/2))."""
    s = np.sort(vals)
    rn = max(1, (50 * len(s) + 99) // 100)
    return int(s[rn - 1])


def test_grouped_mad_brute(ray_session):
    from fonduer_ray.functions.sketches import grouped_mad

    import ray.data

    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    )
    got = grouped_mad(ev, "event_type").to_pandas()
    df = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    df["cents"] = np.round(df["value"] * 100).astype(np.int64)
    for row in got.itertuples():
        g = df[df["event_type"] == row.event_type]["cents"].to_numpy()
        med = _rank_median(g)
        mad = _rank_median(np.abs(g - med))
        assert row.median_value == med / 100.0
        assert row.mad_value == mad / 100.0
    assert len(got) == df["event_type"].nunique()


def test_grouped_mad_single_value_group(ray_session):
    import pyarrow as pa

    import ray.data

    from fonduer_ray.functions.sketches import grouped_mad

    t = pa.table({"g": ["a", "a", "b"], "value": [1.0, 3.0, 7.0]})
    got = grouped_mad(ray.data.from_arrow(t), "g").to_pandas()
    m = {r.g: (r.median_value, r.mad_value) for r in got.itertuples()}
    assert m["b"] == (7.0, 0.0)  # singleton group: mad 0
    assert m["a"] == (1.0, 0.0)  # rn = ceil(2/2) = 1 -> lower median


def test_equi_depth_histogram_brute(ray_session):
    import ray.data

    from fonduer_ray.functions.sketches import equi_depth_histogram

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["value"])
    got = equi_depth_histogram(ev, k=10).to_pandas()
    cents = np.round(
        pq.read_table(f"{SF}/events.parquet", columns=["value"])
        ["value"].to_numpy() * 100
    ).astype(np.int64)
    s = np.sort(cents)
    n = len(s)
    bounds = np.sort(
        [s[max(1, (p * n + 99) // 100) - 1] for p in range(10, 100, 10)]
    )
    idx = np.searchsorted(bounds, cents, side="left")
    counts = np.bincount(idx, minlength=10)
    want = {b: int(c) for b, c in enumerate(counts) if c > 0}
    assert {r.bucket: r.n for r in got.itertuples()} == want
    # depth within 2x of n/k on this near-continuous distribution
    assert got["n"].sum() == n


def test_phrase_match_counts_brute(ray_session):
    import ray.data

    from fonduer_ray.functions.search import phrase_match_counts

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    got = phrase_match_counts(docs, phrase=("table", "scan")).to_pandas()
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = {}
    for r in df.itertuples():
        toks = r.text.split()
        c = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "table" and toks[i + 1] == "scan"
        )
        if c:
            want[r.doc_id] = c
    assert {r.doc_id: r.n_matches for r in got.itertuples()} == want


def test_phrase_match_counts_three_tokens(ray_session):
    import pyarrow as pa

    import ray.data

    from fonduer_ray.functions.search import phrase_match_counts

    t = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": ["a b c a b c a b", "a b a c b c"]}
    )
    got = phrase_match_counts(
        ray.data.from_arrow(t), phrase=("a", "b", "c")
    ).to_pandas()
    assert {r.doc_id: r.n_matches for r in got.itertuples()} == {1: 2}
