"""Distributed prefix-scan (ordered_prefix_sum) and the operators built on
it: value-grain cume_dist numerators and the interval-stabbing peak
concurrency sweep."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fonduer_ray.stages.util import ordered_prefix_sum


def _ds(df, n_blocks=7):
    import ray.data

    return ray.data.from_pandas(df).repartition(n_blocks)


def test_ordered_prefix_sum_brute(ray_session):
    rng = np.random.default_rng(3)
    keys = rng.permutation(500).astype(np.int64)  # unique, shuffled
    vals = rng.integers(-5, 50, 500).astype(np.int64)
    vals2 = rng.integers(0, 9, 500).astype(np.int64)
    df = pd.DataFrame({"k": keys, "a": vals, "b": vals2})
    got = (
        ordered_prefix_sum(_ds(df), "k", ["a", "b"])
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = df.sort_values("k", ignore_index=True)
    assert (got["a_cum"].to_numpy() == np.cumsum(want["a"].to_numpy())).all()
    assert (got["b_cum"].to_numpy() == np.cumsum(want["b"].to_numpy())).all()
    # input columns pass through untouched
    assert (got["a"].to_numpy() == want["a"].to_numpy()).all()


def test_ordered_prefix_sum_single_row_blocks(ray_session):
    df = pd.DataFrame({"k": np.arange(5, dtype=np.int64),
                       "a": np.ones(5, dtype=np.int64)})
    got = (
        ordered_prefix_sum(_ds(df, n_blocks=5), "k", ["a"])
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert got["a_cum"].tolist() == [1, 2, 3, 4, 5]


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_value_cume_dist_brute(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from fonduer_ray.pipelines.relational import value_cume_dist

    got = value_cume_dist(sf_dir).to_pandas().sort_values(
        "cents", ignore_index=True
    )
    vals = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["value"]
    )["value"].to_numpy()
    cents = np.round(vals * 100).astype(np.int64)
    uq, n = np.unique(cents, return_counts=True)
    n_le = np.cumsum(n)
    assert got["cents"].tolist() == uq.tolist()
    assert got["n"].tolist() == n.tolist()
    assert got["n_le"].tolist() == n_le.tolist()
    assert got["n_lt"].tolist() == (n_le - n).tolist()


def test_max_concurrent_sessions_brute(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from fonduer_ray.pipelines.relational import max_concurrent_sessions

    got = max_concurrent_sessions(sf_dir).to_pandas()
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    df = t.to_pandas()
    gap = np.timedelta64(30 * 60, "s")
    deltas: dict[int, int] = {}
    for _, g in df.groupby("user_id"):
        us = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        breaks = np.flatnonzero(np.diff(us) > gap.astype("timedelta64[us]").astype(np.int64)) + 1
        for seg in np.split(us, breaks):
            deltas[int(seg[0])] = deltas.get(int(seg[0]), 0) + 1
            deltas[int(seg[-1]) + 1] = deltas.get(int(seg[-1]) + 1, 0) - 1
    best, acc = (-1, -1), 0
    for ts in sorted(deltas):
        acc += deltas[ts]
        if acc > best[0]:
            best = (acc, ts)
    assert got["max_concurrent"].iloc[0] == best[0]
    assert got["at_epoch_us"].iloc[0] == best[1]


def test_weighted_systematic_sample_brute(ray_session):
    import pyarrow as pa

    import ray.data

    from fonduer_ray.functions.training import weighted_systematic_sample

    rng = np.random.default_rng(9)
    keys = np.arange(400, dtype=np.int64)
    w = rng.integers(0, 1000, 400).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "w": pa.array(w)})
    ).repartition(5)
    got = weighted_systematic_sample(ds, "k", "w", n_out=37).to_pandas()
    cum = np.cumsum(w)
    total = int(cum[-1])
    keep = (cum * 37) // total > ((cum - w) * 37) // total
    want = keys[keep]
    assert got.sort_values("k")["k"].tolist() == want.tolist()
    # selection count is ~n_out (a zero-weight row never selects; a heavy
    # row can absorb several strata but still appears once)
    assert 0 < len(got) <= 37


def test_weighted_systematic_sample_heavy_row_always_kept(ray_session):
    import pyarrow as pa

    import ray.data

    from fonduer_ray.functions.training import weighted_systematic_sample

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "w": pa.array([1, 10_000, 1], pa.int64())})
    )
    got = weighted_systematic_sample(ds, "k", "w", n_out=10).to_pandas()
    assert 2 in got["k"].tolist()
