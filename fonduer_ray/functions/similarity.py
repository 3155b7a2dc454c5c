"""Similarity search over an embedding column (``list<float>``).

- Brute-force cosine top-k: the query matrix is broadcast once via
  ``ray.put``; each ``map_batches`` task does one numpy matmul per batch and
  emits its local top-k; a final small groupby-free reduction on the driver
  merges per-block top-k lists (k * n_queries rows — tiny).
- LSH-bucketed variant (the 100-TB scale path): random-hyperplane signatures
  bucket vectors; only same-bucket vectors are compared, turning the
  all-pairs matmul into a bucket-local one. Probing multiple buckets trades
  recall for cost.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data

from fonduer_ray.stages.util import default_concurrency, get_broadcast


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BlockTopK:
    """Per-block brute-force scorer: one matmul per batch against the
    broadcast query matrix, emit block-local top-k."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = get_broadcast(queries_ref)
        self.qids = q["ids"]
        self.qmat = _normalize(np.asarray(q["vecs"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        mat = _normalize(
            np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64)
        )
        sims = self.qmat @ mat.T  # (n_queries, block)
        k = min(self.k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        # argpartition then exact sort of the k head — O(block) per query
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for qi in range(sims.shape[0]):
            cols = part[qi]
            order = np.lexsort((ids[cols], -sims[qi, cols]))
            for c in cols[order]:
                out_q.append(self.qids[qi])
                out_n.append(ids[c])
                out_s.append(sims[qi, c])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def knn_bruteforce(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    query_vecs: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_query_ids: bool = True,
) -> pa.Table:
    """Exact top-k cosine neighbors for each query. Returns a small pyarrow
    Table ``(query_id, neighbor_id, sim)`` — k rows per query, neighbors
    sorted by (sim desc, neighbor_id asc). The dataset streams; only
    per-block top-k lists come back to the driver."""
    queries_ref = ray.put({"ids": list(query_ids), "vecs": query_vecs})
    partial = ds.map_batches(
        _BlockTopK,
        fn_constructor_kwargs={
            "queries_ref": queries_ref,
            "k": k,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=default_concurrency(),
    )
    # merge per-block top-k (tiny: k * n_queries * n_blocks rows)
    best: dict[int, list] = {qid: [] for qid in query_ids}
    qset = set(query_ids)
    for batch in partial.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qid, nid, sim in zip(
            batch["query_id"].to_pylist(),
            batch["neighbor_id"].to_pylist(),
            batch["sim"].to_pylist(),
        ):
            if exclude_query_ids and nid in qset:
                continue
            heapq.heappush(best[qid], (sim, -nid))
            if len(best[qid]) > k:
                heapq.heappop(best[qid])
    rows = []
    for qid in query_ids:
        ranked = sorted(best[qid], key=lambda t: (-t[0], -t[1]))
        for rank, (sim, neg_nid) in enumerate(ranked, 1):
            rows.append(
                {"query_id": qid, "neighbor_id": -neg_nid, "sim": sim, "rank": rank}
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("sim", pa.float64()),
                ("rank", pa.int64()),
            ]
        ),
    )


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (fixed init:
    evenly spaced sample rows; no RNG so results are run-stable)."""
    sample = _normalize(sample)
    idx = np.linspace(0, len(sample) - 1, n_clusters).astype(int)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    query_vecs: list[list[float]],
    k: int = 5,
    n_clusters: int = 32,
    nprobe: int = 8,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF-style approximate top-k cosine ANN — the scale path next to
    ``knn_bruteforce``: centroids trained once on a driver-side sample and
    broadcast; each block assigns its vectors to their nearest centroid and
    scores ONLY vectors falling in a query's ``nprobe`` closest clusters
    (compute skipped for the rest — the IVF win). Same output schema as
    ``knn_bruteforce``; recall < 1 by construction."""
    sample_rows = ds.select_columns([vec_col]).limit(train_sample).take_all()
    sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = _kmeans(sample, min(n_clusters, len(sample)))
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    # per-query probe sets (queries x nprobe centroid ids)
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    state_ref = ray.put(
        {"cent": cent, "qids": list(query_ids), "qmat": qmat, "probe": probe}
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        st = get_broadcast(state_ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        mat = _normalize(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
        assign = np.argmax(mat @ st["cent"].T, axis=1)
        # restrict the matmul to vectors in ANY probed cluster
        probed = np.unique(st["probe"])
        keep = np.isin(assign, probed)
        if not keep.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        ids, mat, assign = ids[keep], mat[keep], assign[keep]
        sims = st["qmat"] @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(st["qids"]):
            in_probe = np.isin(assign, st["probe"][qi])
            if not in_probe.any():
                continue
            cols = np.where(in_probe)[0]
            kk = min(k, len(cols))
            top = cols[np.argpartition(-sims[qi, cols], kk - 1)[:kk]]
            order = np.lexsort((ids[top], -sims[qi, top]))
            for c in top[order]:
                out_q.append(qid)
                out_n.append(int(ids[c]))
                out_s.append(float(sims[qi, c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partial = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=4096)
    best: dict[int, list] = {qid: [] for qid in query_ids}
    for batch in partial.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qid, nid, sim in zip(
            batch["query_id"].to_pylist(),
            batch["neighbor_id"].to_pylist(),
            batch["sim"].to_pylist(),
        ):
            heapq.heappush(best[qid], (sim, -nid))
            if len(best[qid]) > k:
                heapq.heappop(best[qid])
    rows = []
    for qid in query_ids:
        ranked = sorted(best[qid], key=lambda t: (-t[0], -t[1]))
        for rank, (sim, neg_nid) in enumerate(ranked, 1):
            rows.append(
                {"query_id": qid, "neighbor_id": -neg_nid, "sim": sim, "rank": rank}
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("sim", pa.float64()),
                ("rank", pa.int64()),
            ]
        ),
    )


class _HyperplaneHasher:
    def __init__(self, dim: int, n_bits: int = 8, seed: int = 23):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(n_bits, dim)

    def bucket(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes.T) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)


def lsh_buckets(
    ds: "ray.data.Dataset",
    dim: int,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Add a random-hyperplane LSH ``bucket`` column — the scale path for
    ANN: co-bucketed vectors are each other's candidate neighbors, so a
    downstream ``groupby("bucket")`` compares only within buckets."""

    class AddBucket:
        def __init__(self):
            self.h = _HyperplaneHasher(dim, n_bits)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            b = self.h.bucket(vecs)
            return batch.append_column("bucket", pa.array(b, pa.int64()))

    return ds.map_batches(
        AddBucket,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=default_concurrency(),
    )


def embedding_dup_pairs_exact(
    ds: "ray.data.Dataset",
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shard_rows: int = 250_000,
) -> "ray.data.Dataset":
    """Exact all-pairs cosine duplicates — O(n^2 / p) work by definition,
    but memory-bounded at any n: the (id, vec) matrix ships as a list of
    ``shard_rows``-row shards (one ``ray.put`` each; driver peak = one
    shard, built streaming from ``iter_batches``) and each block matmuls
    against the shards in turn. The result is a streaming Dataset, never a
    driver-side collection. For web-scale corpora prefer the LSH variant
    below, which avoids the quadratic compute entirely."""
    ds = ds.select_columns([id_col, vec_col]).materialize()

    shard_refs: list = []
    buf_ids: list[np.ndarray] = []
    buf_vecs: list[np.ndarray] = []
    buffered = 0

    def flush() -> None:
        nonlocal buffered
        if not buffered:
            return
        ids = np.concatenate(buf_ids)
        vecs = _normalize(np.concatenate(buf_vecs))
        shard_refs.append(ray.put((ids, vecs)))
        buf_ids.clear()
        buf_vecs.clear()
        buffered = 0

    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        buf_ids.append(batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        buf_vecs.append(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
        buffered += len(batch)
        if buffered >= shard_rows:
            flush()
    flush()

    def block_pairs(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        vecs = _normalize(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
        a_parts, b_parts, s_parts = [], [], []
        for ref in shard_refs:
            ids_all, vecs_all = get_broadcast(ref)
            sims = vecs @ vecs_all.T
            ii, jj = np.where(sims >= threshold)
            keep = ids[ii] < ids_all[jj]  # dedup: emit only id_a < id_b
            a_parts.append(ids[ii][keep])
            b_parts.append(ids_all[jj][keep])
            s_parts.append(sims[ii, jj][keep])
        a = np.concatenate(a_parts) if a_parts else np.array([], dtype=np.int64)
        b = np.concatenate(b_parts) if b_parts else np.array([], dtype=np.int64)
        s = np.concatenate(s_parts) if s_parts else np.array([], dtype=np.float64)
        return pa.table(
            {
                "id_a": pa.array(a.astype(np.int64), pa.int64()),
                "id_b": pa.array(b.astype(np.int64), pa.int64()),
                "sim": pa.array(s, pa.float64()),
            }
        )

    return ds.map_batches(
        block_pairs,
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=None,
    )


def embedding_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 6,
    n_tables: int = 1,
    seed: int = 23,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs via multi-table random-
    hyperplane LSH + in-bucket exact cosine (OR-amplification: a pair is
    found if it co-buckets in ANY of the ``n_tables`` independent tables;
    per-pair miss probability (1-p^n_bits)^n_tables for per-bit collision
    p = 1 - theta/pi). Precision is always 1 (in-bucket exact verify);
    choose (n_bits, n_tables) for the target recall — fewer bits / more
    tables for low thresholds, more bits / fewer tables at scale (each
    table replicates the vectors through the shuffle ONCE; at 100 TB keep
    n_tables modest and n_bits high so buckets stay small)."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0].as_py())
    hashers = [_HyperplaneHasher(dim, n_bits, seed=seed + t) for t in range(n_tables)]

    def to_table_rows(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        ids = batch[id_col].cast(pa.int64()).combine_chunks()
        n = len(batch)
        tbls, buckets = [], []
        for t, h in enumerate(hashers):
            tbls.extend([t] * n)
            buckets.extend(h.bucket(vecs).tolist())
        return pa.table(
            {
                "tbl": pa.array(tbls, pa.int32()),
                "bucket": pa.array(buckets, pa.int64()),
                id_col: pa.concat_arrays([ids] * n_tables),
                vec_col: pa.concat_arrays(
                    [batch[vec_col].combine_chunks()] * n_tables
                ),
            }
        )

    rows = ds.map_batches(to_table_rows, batch_format="pyarrow", batch_size=4096)

    def in_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in group.groupby(["tbl", "bucket"], sort=False):
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            vecs = _normalize(np.asarray(list(g[vec_col]), dtype=np.float64))
            sims = vecs @ vecs.T
            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            if not len(ii):
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": np.minimum(ids[ii], ids[jj]),
                        "id_b": np.maximum(ids[ii], ids[jj]),
                        "sim": sims[ii, jj],
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "sim": pd.Series(dtype="float64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    pairs = hash_groupby(rows, ["tbl", "bucket"], in_bucket_pairs)
    # a pair found in several tables appears once
    return hash_groupby(
        pairs, ["id_a", "id_b"], lambda df: df.drop_duplicates(["id_a", "id_b"])
    )


def semantic_dedup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.99,
    n_clusters: int = 32,
    nassign: int = 1,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """SemDeDup-style embedding-cluster near-duplicate pairs (Abbas et al.
    2023: k-means the embedding space, prune within clusters only — the
    semantic tier above MinHash): spherical k-means centroids train once on
    a driver-side sample (the ``knn_ivf`` trainer, deterministic init) and
    broadcast; each vector ships to its ``nassign`` nearest clusters; exact
    cosine runs ONLY inside each cluster's hash partition; pairs co-found
    in several clusters emit once. Compute is sum of per-cluster squares
    instead of the corpus square — the SemDeDup economics.

    ``nassign=1`` is the paper's configuration (recall < 1: pairs
    straddling a Voronoi boundary are missed). Raising ``nassign``
    overlaps the partitions (each vector replicates ``nassign`` times
    through ONE shuffle) and recovers boundary pairs — at ``nassign =
    n_clusters`` the result provably equals the exact all-pairs set;
    moderate values reach set-equality on far smaller compute (the
    ``embedding_dup_pairs_lsh`` configuration-equality pattern)."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    sample_rows = ds.select_columns([vec_col]).limit(train_sample).take_all()
    sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = _kmeans(sample, min(n_clusters, len(sample)))
    nassign = min(nassign, len(cent))
    cent_ref = ray.put(cent)

    def to_cluster_rows(batch: pa.Table) -> pa.Table:
        c = get_broadcast(cent_ref)
        vecs = _normalize(
            np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        )
        ids = batch[id_col].cast(pa.int64()).combine_chunks()
        sims = vecs @ c.T  # (rows, n_clusters)
        near = np.argsort(-sims, axis=1)[:, :nassign].astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(near.T.reshape(-1), pa.int64()),
                id_col: pa.concat_arrays([ids] * nassign),
                vec_col: pa.concat_arrays(
                    [batch[vec_col].combine_chunks()] * nassign
                ),
            }
        )

    rows = ds.map_batches(
        to_cluster_rows, batch_format="pyarrow", batch_size=4096
    )

    def in_cluster_pairs(group: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in group.groupby("cluster", sort=False):
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            vecs = _normalize(np.asarray(list(g[vec_col]), dtype=np.float64))
            sims = vecs @ vecs.T
            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            if not len(ii):
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": np.minimum(ids[ii], ids[jj]),
                        "id_b": np.maximum(ids[ii], ids[jj]),
                        "sim": sims[ii, jj],
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "sim": pd.Series(dtype="float64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    pairs = hash_groupby(rows, ["cluster"], in_cluster_pairs)
    # a pair co-assigned to several clusters appears once
    return hash_groupby(
        pairs, ["id_a", "id_b"], lambda df: df.drop_duplicates(["id_a", "id_b"])
    )
