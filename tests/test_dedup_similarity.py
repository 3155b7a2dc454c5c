"""Tests for the similarity-join / ANN operators added on top of the
reference surface (dedup + similarity training-data ops)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from fonduer_ray.functions import dedup, similarity


@pytest.fixture(scope="module")
def doc_ds(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again ok",
        "the quick brown fox jumps over the lazy dog again and again yes",
        "a completely different document about ray data pipelines here",
        "another unrelated text on arrow batches and parquet files now",
        "the quick brown fox jumps over the lazy dog again and again ok",
    ]
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


def test_ngram_jaccard_pairs_exact_vs_bruteforce(ray_session, doc_ds):
    out = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(doc_ds, threshold=0.5, n=3).take_all()
    }
    # brute force the same semantics
    texts = {r["doc_id"]: r["text"] for r in doc_ds.take_all()}
    expect = set()
    for a in texts:
        for b in texts:
            if a >= b:
                continue
            sa = set(dedup._word_ngrams(texts[a], 3))
            sb = set(dedup._word_ngrams(texts[b], 3))
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter / (len(sa) + len(sb) - inter) >= 0.5:
                expect.add((a, b))
    assert out == expect
    assert (0, 4) in out  # exact dup pair
    assert (0, 1) in out  # near dup pair


def test_lsh_candidate_pairs_fully_distributed(ray_session, doc_ds, monkeypatch):
    """`lsh_candidate_pairs` must never collect unbounded state on the
    driver: take_all is patched to fail, the pipeline still finds the dup
    pairs (the collision filter now runs inside the pair-gen groupby)."""
    sigs = dedup.minhash_signatures(doc_ds).materialize()

    def boom(self):
        raise AssertionError("driver-side take_all inside the LSH path")

    monkeypatch.setattr(ray.data.Dataset, "take_all", boom)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(sigs).iter_rows()
    }
    assert (0, 4) in pairs  # exact dup pair collides in every band
    assert (0, 1) in pairs and (1, 4) in pairs  # near dups share bands
    assert all(a < b for a, b in pairs)


def test_simhash_pairs_exact_hamming(ray_session, doc_ds):
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_dup_pairs(doc_ds, max_hamming=3).take_all()
    }
    # identical docs 0 and 4 -> identical simhash -> hamming 0
    assert out[(0, 4)] == 0
    # brute-force check: every pair within hamming<=3 is found
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(doc_ds).take_all()
    }
    for a in sigs:
        for b in sigs:
            if a < b:
                d = bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
                assert ((a, b) in out) == (d <= 3)


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    rng = np.random.RandomState(7)
    vecs = rng.randn(200, 16)
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": list(range(200)),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float64())
                ),
            }
        )
    )


def test_knn_ivf_recall_vs_bruteforce(ray_session, vec_ds):
    qrows = vec_ds.take(3)
    qids = [r["vec_id"] for r in qrows]
    qvecs = [r["embedding"] for r in qrows]
    exact = similarity.knn_bruteforce(
        vec_ds, qids, qvecs, k=5, exclude_query_ids=False
    )
    approx = similarity.knn_ivf(
        vec_ds, qids, qvecs, k=5, n_clusters=8, nprobe=4
    )
    def topsets(tbl):
        out = {}
        for r in tbl.to_pylist():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    ex, ap = topsets(exact), topsets(approx)
    # each query returns k results and recall is decent with nprobe=half
    for q in qids:
        assert len(ap[q]) == 5
        assert len(ex[q] & ap[q]) >= 2
    # rank-1 self-neighbor must survive probing (query vec is in the db)
    rank1 = {r["query_id"]: r["neighbor_id"] for r in approx.to_pylist() if r["rank"] == 1}
    assert rank1 == {q: q for q in qids}


def test_knn_ivf_deterministic(ray_session, vec_ds):
    qrows = vec_ds.take(2)
    qids = [r["vec_id"] for r in qrows]
    qvecs = [r["embedding"] for r in qrows]
    a = similarity.knn_ivf(vec_ds, qids, qvecs, k=3).to_pylist()
    b = similarity.knn_ivf(vec_ds, qids, qvecs, k=3).to_pylist()
    assert a == b


def test_embedding_dup_pairs_exact_sharded(ray_session, vec_ds):
    """The sharded-broadcast exact path (several small matrix shards) finds
    exactly the same pair set as a single-shard run and as brute force."""
    one = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_dup_pairs_exact(vec_ds, threshold=0.3).take_all()
    }
    many = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_dup_pairs_exact(
            vec_ds, threshold=0.3, shard_rows=64
        ).take_all()
    }
    assert one == many and one
    rows = vec_ds.take_all()
    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in rows}
    brute = set()
    for a in vecs:
        for b in vecs:
            if a < b:
                s = vecs[a] @ vecs[b] / (
                    np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])
                )
                if s >= 0.3:
                    brute.add((a, b))
    assert one == brute


def test_pair_bloom_prefilter(ray_session):
    """The Bloom prefilter never drops a pair-referenced id (no false
    negatives) and rejects the vast majority of unrelated ids."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from fonduer_ray.functions.dedup import _bloom_contains, _bloom_of_pair_ids

    pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(list(range(0, 2000, 2)), pa.int64()),
                "id_b": pa.array(list(range(1, 2000, 2)), pa.int64()),
            }
        )
    )
    bits = _bloom_of_pair_ids(pairs, "id_a", "id_b")
    member = _bloom_contains(bits, np.arange(2000))
    assert member.all()  # zero false negatives
    foreign = _bloom_contains(bits, np.arange(1_000_000, 1_100_000))
    assert foreign.mean() < 0.01  # ~no false positives at this fill


def test_dup_clusters_union_find(ray_session, doc_ds):
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(
            doc_ds, dedup.ngram_jaccard_pairs(doc_ds, threshold=0.5, n=3)
        ).take_all()
    }
    # docs 0,1,4 are one near-dup component -> min id 0; 2 and 3 are isolated
    assert out == {0: 0, 1: 0, 2: 2, 3: 3, 4: 0}
    # the distributed min-label-propagation path (above the small-edge
    # guard) produces the identical labeling
    iter_out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(
            doc_ds,
            dedup.ngram_jaccard_pairs(doc_ds, threshold=0.5, n=3),
            small_limit=0,
        ).take_all()
    }
    assert iter_out == out


def test_dup_clusters_empty_pairs_schema(ray_session, doc_ds):
    """Zero edges must still yield int64 label blocks (no object/float
    empties breaking the downstream union's Arrow schema)."""
    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    )
    out = dedup.dup_clusters(doc_ds, empty)
    schema = out.schema()
    assert dict(zip(schema.names, schema.types))["cluster_id"] == pa.int64()
    rows = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert rows == {i: i for i in range(5)}  # every doc its own cluster


def test_duplicate_ngram_coverage_vs_bruteforce(ray_session, doc_ds):
    k = 3
    out = {
        r["doc_id"]: r
        for r in dedup.duplicate_ngram_coverage(doc_ds, k=k).take_all()
    }
    texts = {r["doc_id"]: r["text"] for r in doc_ds.take_all()}
    # brute force: gram -> set of docs; covered positions per doc
    from collections import defaultdict

    gram_docs = defaultdict(set)
    doc_grams = {}
    for d, t in texts.items():
        toks = t.split()
        doc_grams[d] = [
            (" ".join(toks[i : i + k]), i) for i in range(len(toks) - k + 1)
        ]
        for g, _ in doc_grams[d]:
            gram_docs[g].add(d)
    assert set(out) == set(texts)
    for d, t in texts.items():
        n = len(t.split())
        dup_pos = [i for g, i in doc_grams[d] if len(gram_docs[g]) >= 2]
        covered = set()
        for i in dup_pos:
            covered.update(range(i, i + k))
        assert out[d]["n_tokens"] == n
        assert out[d]["n_dup_grams"] == len(dup_pos)
        assert out[d]["dup_coverage"] == pytest.approx(
            len(covered) / n if n else 0.0
        )


def _brute_pairs(ds, threshold):
    rows = ds.take_all()
    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in rows}
    out = set()
    for a in vecs:
        for b in vecs:
            if a < b:
                s = vecs[a] @ vecs[b] / (
                    np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])
                )
                if s >= threshold:
                    out.add((a, b))
    return out


def test_semantic_dedup_full_assign_equals_bruteforce(ray_session, vec_ds):
    """nassign == n_clusters replicates every vector into every cluster, so
    every pair co-clusters and the SemDeDup result is provably the exact
    all-pairs set (the configuration-equality pattern the driver query
    relies on at a lower nassign)."""
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.semantic_dedup_pairs(
            vec_ds, threshold=0.3, n_clusters=4, nassign=4
        ).take_all()
    }
    assert got == _brute_pairs(vec_ds, 0.3) and got


def test_semantic_dedup_single_assign_subset_no_false_positives(
    ray_session, vec_ds
):
    """The paper's nassign=1 configuration may miss Voronoi-boundary pairs
    (recall < 1) but the in-cluster similarity is exact cosine, so every
    emitted pair really clears the threshold — zero false positives."""
    brute = _brute_pairs(vec_ds, 0.3)
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.semantic_dedup_pairs(
            vec_ds, threshold=0.3, n_clusters=4, nassign=1
        ).take_all()
    }
    assert got <= brute and got


def test_semantic_dedup_deterministic(ray_session, vec_ds):
    a = sorted(
        (r["id_a"], r["id_b"])
        for r in similarity.semantic_dedup_pairs(
            vec_ds, threshold=0.3, n_clusters=4, nassign=2
        ).take_all()
    )
    b = sorted(
        (r["id_a"], r["id_b"])
        for r in similarity.semantic_dedup_pairs(
            vec_ds, threshold=0.3, n_clusters=4, nassign=2
        ).take_all()
    )
    assert a == b and a


def test_edit1_pairs_matches_brute(ray_session):
    """SymSpell deletion blocking vs brute-force Levenshtein over strings
    engineered for every edit kind: substitution, insertion at each end,
    deletion, a transposition (distance 2 — must NOT pair), duplicate
    input rows, and an empty string (distance 1 to single chars)."""
    import ray.data

    from fonduer_ray.functions.dedup import _lev_eq1, edit1_pairs

    names = [
        "cat", "cut",            # substitution
        "cats", "scat",          # insertion at tail/head vs cat
        "ca",                    # deletion of cat's tail
        "act",                   # transposition of cat -> distance 2
        "", "a",                 # empty vs single char
        "dog", "dog",            # duplicate rows collapse
        "dogg", "doog",
    ]
    ds = ray.data.from_items([{"name": n} for n in names])
    got = {
        (r["name_a"], r["name_b"])
        for r in edit1_pairs(ds, col="name").take_all()
    }

    def lev(a, b):  # full DP for the brute check
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    uniq = sorted(set(names))
    want = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1:]
        if lev(a, b) == 1
    }
    assert got == want
    # the fast verifier agrees with DP on every pair (incl. distance >= 2)
    for i, a in enumerate(uniq):
        for b in uniq[i + 1:]:
            assert _lev_eq1(a, b) == (lev(a, b) == 1), (a, b)


def test_sorted_neighborhood_pairs_brute(ray_session):
    import pandas as pd
    import ray.data

    from fonduer_ray.functions.dedup import sorted_neighborhood_pairs

    rng = __import__("numpy").random.default_rng(3)
    keys = ["".join(rng.choice(list("abcd"), 3)) for _ in range(40)]
    df = pd.DataFrame({"k": keys, "i": range(40)})
    got = (
        sorted_neighborhood_pairs(
            ray.data.from_pandas(df).repartition(5), "k", "i", window=3
        )
        .to_pandas()
        .sort_values(["id1", "id2"], ignore_index=True)
    )
    order = sorted(range(40), key=lambda j: (keys[j], j))
    want = pd.DataFrame(
        [
            (order[a], order[a + g], g)
            for a in range(40)
            for g in (1, 2)
            if a + g < 40
        ],
        columns=["id1", "id2", "gap"],
    ).sort_values(["id1", "id2"], ignore_index=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_dedup_incremental_brute(ray_session):
    """Keepers = min-doc_id holder of each digest unseen in the prior
    generation; n_dups counts within the new generation only."""
    import hashlib

    import pandas as pd
    import pyarrow.parquet as pq

    from fonduer_ray.functions.dedup import dedup_incremental
    from fonduer_ray.pipelines.docops import read_docs

    sf = "/root/testdata/sf0.001"
    new = read_docs(sf, ["doc_id", "text"]).filter(lambda r: r["doc_id"] % 2 == 1)
    prior = read_docs(sf, ["doc_id", "text"]).filter(lambda r: r["doc_id"] % 2 == 0)
    got = (
        dedup_incremental(new, prior)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    t["digest"] = [hashlib.md5((x or "").encode()).hexdigest() for x in t["text"]]
    prior_set = set(t[t["doc_id"] % 2 == 0]["digest"])
    g2 = t[t["doc_id"] % 2 == 1]
    want = (
        g2.groupby("digest", sort=False)
        .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        .reset_index()
    )
    want = want[~want["digest"].isin(prior_set)].sort_values(
        "doc_id", ignore_index=True
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["digest"]) == list(want["digest"])
    assert list(got["n_dups"]) == list(want["n_dups"])


def test_dedup_incremental_paths_match(ray_session):
    """broadcast_limit=0 forces the left_anti join path; it must emit the
    same rows as the frozenset-broadcast path."""
    from fonduer_ray.functions.dedup import dedup_incremental
    from fonduer_ray.pipelines.docops import read_docs

    sf = "/root/testdata/sf0.001"
    new = read_docs(sf, ["doc_id", "text"]).filter(lambda r: r["doc_id"] % 2 == 1)
    prior = read_docs(sf, ["doc_id", "text"]).filter(lambda r: r["doc_id"] % 2 == 0)
    a = (
        dedup_incremental(new, prior)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        dedup_incremental(new, prior, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)[a.columns]
    )
    assert a.equals(b)
