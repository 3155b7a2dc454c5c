"""Asserted bounds for every remaining driver-side collection.

Each site that collects to the driver (``take_all`` / ``iter_batches``
merge) must be either size-guarded or provably bounded; these tests pin
the bounds so a refactor that un-bounds one fails loudly.
"""
import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _docs(n=120, seed=3):
    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(words, size=rng.randint(5, 30)))
        for _ in range(n)
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_search_topk_driver_rows_bounded(ray_session):
    """search/bm25 collect only the global top-k AFTER per-block head(k):
    the materialized table is <= k rows regardless of corpus size."""
    from fonduer_ray.functions.search import bm25_topk, search_topk

    ds = _docs()
    k = 7
    out = search_topk(ds, ["w1", "w2"], k=k)
    assert len(out) <= k
    out2 = bm25_topk(ds, ["w1", "w2"], k=k)
    assert len(out2) <= k
    # ranks are 1..len — proof the limit ran before collection
    assert out["rank"].to_pylist() == list(range(1, len(out) + 1))


def test_bpe_candidate_rows_bounded_per_partition(ray_session):
    """The per-iteration BPE argmax collects one best-pair row per hash
    partition — bounded by n_partitions, never vocabulary-sized."""
    from fonduer_ray.stages.util import hash_groupby

    n_partitions = 8
    rows = [
        {"left": f"a{i % 50}", "right": f"b{i % 37}", "n": i % 11 + 1}
        for i in range(2000)
    ]
    ds = ray.data.from_items(rows)
    best = hash_groupby(
        ds,
        ["left", "right"],
        lambda df: df.groupby(["left", "right"], sort=False)["n"]
        .sum()
        .reset_index()
        .sort_values(["n", "left", "right"], ascending=[False, True, True])
        .head(1),
        n_partitions=n_partitions,
    ).take_all()
    assert len(best) <= n_partitions


def test_cms_driver_cell_limit_guard(ray_session):
    """heavy_hitters refuses sketch shapes whose driver-side cell matrix
    would exceed the documented bound instead of silently collecting it."""
    from fonduer_ray.functions.sketches import (
        CMS_DRIVER_CELL_LIMIT,
        heavy_hitters,
    )

    ds = _docs(10)
    too_wide = CMS_DRIVER_CELL_LIMIT + 1
    with pytest.raises(ValueError, match="driver cell bound"):
        heavy_hitters(ds, depth=1, width=too_wide)
