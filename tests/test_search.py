"""Retrieval operators: integer-weighted TF top-k and BM25 top-k."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from fonduer_ray.functions import search

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


def _corpus(n=60, seed=5):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "rare"]
    probs = np.array([0.3, 0.25, 0.2, 0.12, 0.08, 0.04, 0.01])
    return [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 50)), p=probs))
        for _ in range(n)
    ]


def _brute_int(texts, terms, k):
    n = len(texts)
    df = {t: sum(1 for x in texts if t in set(x.split())) for t in terms}
    w = {t: (max(1, n // d) if d else 0) for t, d in df.items()}
    scores = []
    for i, x in enumerate(texts):
        cnt = Counter(x.split())
        s = sum(cnt[t] * w[t] for t in terms)
        if s > 0:
            scores.append((i, s))
    scores.sort(key=lambda p: (-p[1], p[0]))
    return scores[:k]


def test_search_topk_matches_bruteforce():
    texts = _corpus()
    terms = ["gamma", "rare", "zeta", "absent_term"]
    got = search.search_topk(_docs(texts), terms, k=10).to_pandas()
    want = _brute_int(texts, terms, 10)
    assert list(got["doc_id"]) == [d for d, _ in want]
    assert list(got["score"]) == [s for _, s in want]
    assert list(got["rank"]) == list(range(1, len(want) + 1))


def test_search_topk_partition_invariant():
    texts = _corpus(80, seed=9)
    terms = ["alpha", "rare"]
    a = search.search_topk(_docs(texts), terms, k=7).to_pandas()
    b = search.search_topk(_docs(texts).repartition(11), terms, k=7).to_pandas()
    assert a.equals(b)


def _brute_bm25(texts, terms, k, k1=1.2, b=0.75):
    n = len(texts)
    lens = [len(x.split()) for x in texts]
    avgdl = sum(lens) / n
    df = {t: sum(1 for x in texts if t in set(x.split())) for t in terms}
    idf = {
        t: math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for t, d in df.items() if d
    }
    out = []
    for i, x in enumerate(texts):
        toks = x.split()
        if not toks:
            continue
        cnt = Counter(toks)
        norm = k1 * (1 - b + b * len(toks) / avgdl)
        s = sum(
            w * cnt[t] * (k1 + 1) / (cnt[t] + norm)
            for t, w in idf.items()
            if cnt.get(t)
        )
        if s > 0:
            out.append((i, s))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def test_bm25_topk_matches_bruteforce():
    texts = _corpus(50, seed=13)
    terms = ["rare", "zeta", "delta"]
    got = search.bm25_topk(_docs(texts), terms, k=8).to_pandas()
    want = _brute_bm25(texts, terms, 8)
    assert list(got["doc_id"]) == [d for d, _ in want]
    np.testing.assert_allclose(
        got["score"].to_numpy(), [s for _, s in want], rtol=1e-12
    )


def test_search_topk_no_hits_is_empty():
    out = search.search_topk(_docs(["a b c"]), ["zzz"], k=5).to_pandas()
    assert len(out) == 0
