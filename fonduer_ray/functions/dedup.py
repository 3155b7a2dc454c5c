"""Deduplication operators for large-scale training-data pipelines.

- exact: hash-partitioned groupby, keep the first (min doc_id) per text.
- MinHash + LSH: shingle -> minhash signature -> banded buckets -> groupby
  band bucket -> candidate pairs -> union-find clusters. The shuffle key is
  the (band, bucket-hash) pair; per-bucket pair generation is capped and the
  cap is logged, never silent.
- SimHash: 64-bit near-dup fingerprint per doc (Hamming-adjacent docs are
  near-dups); bucketing by the 4x16-bit blocks.
- n-gram Jaccard verification for candidate pairs (exact re-check after LSH).

Everything streams through ``map_batches``; only the bucket groupbys shuffle,
and signatures (small) shuffle instead of full documents.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count

from fonduer_ray.stages.util import hash_groupby, map_stage


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _hash64(s: str, seed: int = 0) -> int:
    h = hashlib.blake2b(s.encode(), digest_size=8, salt=struct.pack("q", seed))
    return int.from_bytes(h.digest(), "big")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """One row per distinct text: keeper = min doc_id, with duplicate count.
    Hash-partition + per-partition vectorized groupby — the key cardinality
    is ~n_docs, exactly the case Ray's sort-aggregate handles poorly (see
    ``stages.util.hash_groupby``)."""
    import pandas as pd

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("text", sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index()
        )
        return out[["doc_id", "text", "n_dups"]]

    return hash_groupby(ds.select_columns(["doc_id", "text"]), ["text"], agg)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Per-doc minhash signatures (stateful: permutation params built once
    per actor)."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 17):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.int64)
        self.mod = np.int64((1 << 61) - 1)
        self.num_perm = num_perm
        self.k = k
        # per-actor token-hash cache: corpus vocabulary repeats heavily, so
        # blake2b runs ~once per distinct token per actor, not per occurrence
        self._tok_cache: dict[str, int] = {}

    def _token_hashes(self, toks: list[str]) -> np.ndarray:
        cache = self._tok_cache
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = _hash64(t)
                if len(cache) < 2_000_000:
                    cache[t] = h
            out[i] = h
        return out

    def signature(self, text: str) -> np.ndarray:
        toks = text.split()
        if not toks:
            return np.zeros(self.num_perm, dtype=np.int64)
        th = self._token_hashes(toks)
        k = self.k
        if len(toks) < k:
            base = np.array([th[0]], dtype=np.uint64)
        else:
            # shingle hash = polynomial combine of k token hashes, fully
            # vectorized over positions (no per-shingle string join/hash)
            base = np.zeros(len(th) - k + 1, dtype=np.uint64)
            mult = np.uint64(0x9E3779B97F4A7C15)
            for j in range(k):
                base = base * mult + th[j : len(th) - k + 1 + j]
            base = np.unique(base)
        base = (base & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        # (a*x+b) mod p for every (perm, shingle) pair, vectorized
        vals = (np.outer(self.a, base) + self.b[:, None]) % self.mod
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.signature(t or "").tolist() for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "signature": pa.array(sigs, pa.list_(pa.int64())),
            }
        )


def minhash_signatures(
    ds: "ray.data.Dataset", num_perm: int = 64, k: int = 3
) -> "ray.data.Dataset":
    return map_stage(
        ds.select_columns(["doc_id", "text"]),
        MinHasher,
        {"num_perm": num_perm, "k": k},
        2048,
    )


def lsh_candidate_pairs(
    sig_ds: "ray.data.Dataset",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 200,
) -> "ray.data.Dataset":
    """Banded LSH: signature -> (band, bucket) keys -> groupby -> pairs.

    Buckets larger than ``max_bucket`` are truncated to the smallest
    ``max_bucket`` doc_ids (deterministic) — the truncation count is carried
    in the ``truncated`` column rather than dropped silently."""

    def to_buckets(batch: pa.Table) -> pa.Table:
        doc_ids, bnd, bkt = [], [], []
        for doc_id, sig in zip(
            batch["doc_id"].to_pylist(), batch["signature"].to_pylist()
        ):
            for b in range(bands):
                chunk = tuple(sig[b * rows_per_band : (b + 1) * rows_per_band])
                doc_ids.append(doc_id)
                bnd.append(b)
                bkt.append(_hash64(repr(chunk), seed=b) & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bnd, pa.int32()),
                "bucket": pa.array(bkt, pa.int64()),
            }
        )

    # Bucket rows are tiny (3 ints/row, ~bands rows per doc — orders of
    # magnitude smaller than the documents). Materialize once so the count
    # pass and the collision-filter pass don't each recompute signatures.
    buckets = sig_ds.map_batches(to_buckets, batch_format="pyarrow").materialize()

    # The vast majority of LSH buckets are singletons (no near-dup): a
    # map_groups over every bucket pays per-group overhead ~O(corpus).
    # Instead: native Count aggregate -> keep only collision buckets
    # (count>=2, a tiny set at realistic dup rates) -> broadcast that set ->
    # filter the bucket rows -> pair-gen touches only actual collisions.
    import ray

    import pandas as pd

    def hot_agg(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["band", "bucket"], sort=False).size().reset_index(name="n")
        return out[out["n"] >= 2][["band", "bucket"]]

    hot = hash_groupby(buckets, ["band", "bucket"], hot_agg).take_all()
    hot_set = {(r["band"], r["bucket"]) for r in hot}
    hot_ref = ray.put(hot_set)

    def keep_hot(batch: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        bands_col = batch["band"].to_numpy(zero_copy_only=False)
        bkt_col = batch["bucket"].to_numpy(zero_copy_only=False)
        mask = np.fromiter(
            ((int(b), int(k)) in hs for b, k in zip(bands_col, bkt_col)),
            dtype=bool,
            count=len(batch),
        )
        return batch.filter(pa.array(mask))

    collisions = buckets.map_batches(keep_hot, batch_format="pyarrow")

    import pandas as pd

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))
        truncated = 0
        if len(ids) > max_bucket:
            truncated = len(ids) - max_bucket
            ids = ids[:max_bucket]
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame(
            {"doc_a": a, "doc_b": b, "truncated": [truncated] * len(a)}
        )

    _PAIR_EMPTY = pd.DataFrame(
        {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
         "truncated": pd.Series(dtype="int64")}
    )

    def pairs_agg(df: pd.DataFrame) -> pd.DataFrame:
        frames = [emit_pairs(g) for _, g in df.groupby(["band", "bucket"], sort=False)]
        frames = [f for f in frames if len(f)]
        return pd.concat(frames, ignore_index=True) if frames else _PAIR_EMPTY

    pairs = hash_groupby(collisions, ["band", "bucket"], pairs_agg)

    # dedup pairs found in multiple bands
    def dedup_agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["doc_a", "doc_b"], sort=False)
            .agg(truncated=("truncated", "min"))
            .reset_index()
        )

    return hash_groupby(pairs, ["doc_a", "doc_b"], dedup_agg)


def jaccard_of(a: str, b: str, k: int = 3) -> float:
    sa, sb = _shingles(a, k), _shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_dedup(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.8,
) -> "ray.data.Dataset":
    """Full near-dup pipeline: signatures -> LSH pairs -> exact Jaccard
    verification (broadcast text lookup) -> verified duplicate pairs."""
    import ray

    sigs = minhash_signatures(ds, num_perm=num_perm, k=k)
    # Candidate pairs are tiny after LSH pruning: materialize once so the
    # verify stage does not re-execute the signature+bucket pipeline.
    pairs = lsh_candidate_pairs(
        sigs, bands=bands, rows_per_band=num_perm // bands
    ).materialize()
    # broadcast ONLY the texts referenced by candidate pairs (small side
    # after LSH pruning) — never the whole corpus.
    pair_rows = pairs.select_columns(["doc_a", "doc_b"]).take_all()
    needed = {r["doc_a"] for r in pair_rows} | {r["doc_b"] for r in pair_rows}
    needed_ref = ray.put(needed)

    def keep_needed(batch: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.fromiter((int(i) in want for i in ids), dtype=bool, count=len(batch))
        return batch.filter(pa.array(mask))

    texts = {
        r["doc_id"]: r["text"]
        for r in ds.select_columns(["doc_id", "text"])
        .map_batches(keep_needed, batch_format="pyarrow")
        .take_all()
    }
    texts_ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(texts_ref)
        rows = []
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            j = jaccard_of(lookup.get(a, ""), lookup.get(b, ""), k)
            if j >= threshold:
                rows.append({"doc_a": a, "doc_b": b, "jaccard": j})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
            ),
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram Jaccard set-similarity join (exact, prefix-filtered)
# ---------------------------------------------------------------------------


def _word_ngrams(text: str, n: int) -> list[str]:
    """Distinct word n-grams with oracle-identical tokenization: split on a
    single space (DuckDB ``string_split(text, ' ')``), not on runs."""
    toks = (text or "").split(" ")
    if len(toks) < n:
        return []
    return sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.5,
    n: int = 5,
    max_bucket: int = 1000,
) -> "ray.data.Dataset":
    """EXACT all-pairs Jaccard join over word-``n``-gram sets (AllPairs /
    PPJoin-style prefix filtering, Bayardo et al., WWW'07 — public
    algorithm): any pair with ``J >= t`` must share at least one gram within
    each side's prefix of the ``floor((1-t)*|set|)+1`` smallest grams under
    a global (hash) ordering. Candidate generation is therefore a groupby on
    prefix grams only; survivors are verified exactly against broadcast gram
    sets. Partitioning assumption: individual grams are rare (diverse
    vocabulary) — buckets above ``max_bucket`` are truncated WITH logging.
    Columns: ``id_a, id_b, jaccard``."""
    import logging

    import ray

    gram_src = ds.select_columns(["doc_id", "text"])

    def to_prefix_grams(batch: pa.Table) -> pa.Table:
        doc_ids, grams = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            gset = _word_ngrams(text, n)
            if not gset:
                continue
            hashes = sorted(_hash64(g) for g in gset)
            plen = int((1.0 - threshold) * len(hashes)) + 1
            for h in hashes[:plen]:
                doc_ids.append(doc_id)
                grams.append(h & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "gram": pa.array(grams, pa.int64()),
            }
        )

    import pandas as pd

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))
        if len(ids) > max_bucket:
            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: bucket truncated %d -> %d",
                len(ids),
                max_bucket,
            )
            ids = ids[:max_bucket]
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    _JP_EMPTY = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )

    def grams_pairs_agg(df: pd.DataFrame) -> pd.DataFrame:
        frames = [emit_pairs(g) for _, g in df.groupby("gram", sort=False) if len(g) > 1]
        frames = [f for f in frames if len(f)]
        return pd.concat(frames, ignore_index=True) if frames else _JP_EMPTY

    def pair_dedup_agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"])

    gram_rows = gram_src.map_batches(to_prefix_grams, batch_format="pyarrow")
    pairs = hash_groupby(
        hash_groupby(gram_rows, ["gram"], grams_pairs_agg),
        ["id_a", "id_b"],
        pair_dedup_agg,
    ).materialize()

    pair_rows = pairs.take_all()
    needed = {r["id_a"] for r in pair_rows} | {r["id_b"] for r in pair_rows}
    needed_ref = ray.put(needed)

    def keep_needed(batch: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.fromiter((int(i) in want for i in ids), dtype=bool, count=len(batch))
        return batch.filter(pa.array(mask))

    gram_sets = {
        r["doc_id"]: frozenset(_word_ngrams(r["text"], n))
        for r in gram_src.map_batches(keep_needed, batch_format="pyarrow").take_all()
    }
    sets_ref = ray.put(gram_sets)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(sets_ref)
        rows = []
        for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            sa, sb = lookup.get(a, frozenset()), lookup.get(b, frozenset())
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                rows.append({"id_a": a, "id_b": b, "jaccard": j})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
            ),
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash over token hashes (near-dup docs differ in few bits).

    Vectorized: per doc, one (n_tokens x 64) bit matrix + column sum — no
    per-token Python loop; token hashes memoized per worker (Zipfian
    vocabulary)."""

    _SHIFTS = np.arange(64, dtype=np.uint64)
    _POWS = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)

    def __init__(self) -> None:
        self._tok_cache: dict[str, int] = {}

    def _token_hashes(self, toks: list[str]) -> np.ndarray:
        cache = self._tok_cache
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = _hash64(t)
                if len(cache) < 2_000_000:
                    cache[t] = h
            out[i] = h
        return out

    def signature(self, text: str) -> int:
        toks = (text or "").split()
        if not toks:
            return 0
        h = self._token_hashes(toks)
        bits = ((h[:, None] >> self._SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
        acc = bits.sum(axis=0) * 2 - len(toks)
        sim = int(((acc > 0).astype(np.uint64) * self._POWS).sum())
        return sim - (1 << 64) if sim >= 1 << 63 else sim

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())}
        )


def simhash_signatures(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return map_stage(ds.select_columns(["doc_id", "text"]), SimHasher, {}, 2048)


def simhash_dup_pairs(
    ds: "ray.data.Dataset", max_hamming: int = 3, max_bucket: int = 1000
) -> "ray.data.Dataset":
    """EXACT Hamming-ball pair search over 64-bit simhashes: split each
    signature into 4x16-bit bands; by pigeonhole any pair within Hamming
    distance <= 3 agrees exactly on >= 1 band, so banded bucketing finds
    every such pair; survivors are verified by popcount. Requires
    ``max_hamming <= 3`` for the exactness guarantee.
    Columns: ``id_a, id_b, hamming``."""
    assert max_hamming <= 3, "4-band pigeonhole guarantee only holds for <= 3"
    import pandas as pd

    sigs = simhash_signatures(ds)

    def to_bands(batch: pa.Table) -> pa.Table:
        doc_ids, bands, keys, sims = [], [], [], []
        for doc_id, sim in zip(
            batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()
        ):
            u = sim & 0xFFFFFFFFFFFFFFFF
            for b in range(4):
                doc_ids.append(doc_id)
                bands.append(b)
                keys.append((u >> (16 * b)) & 0xFFFF)
                sims.append(sim)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "key": pa.array(keys, pa.int32()),
                "simhash": pa.array(sims, pa.int64()),
            }
        )

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(
            {(int(d), int(s)) for d, s in zip(group["doc_id"], group["simhash"])}
        )
        if len(recs) > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "simhash_dup_pairs: bucket truncated %d -> %d", len(recs), max_bucket
            )
            recs = recs[:max_bucket]
        a, b, h = [], [], []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                d = bin((recs[i][1] ^ recs[j][1]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= max_hamming:
                    a.append(recs[i][0])
                    b.append(recs[j][0])
                    h.append(d)
        return pd.DataFrame({"id_a": a, "id_b": b, "hamming": h})

    _SH_EMPTY = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "hamming": pd.Series(dtype="int64")}
    )

    def band_pairs_agg(df: pd.DataFrame) -> pd.DataFrame:
        frames = [
            emit_pairs(g) for _, g in df.groupby(["band", "key"], sort=False) if len(g) > 1
        ]
        frames = [f for f in frames if len(f)]
        return pd.concat(frames, ignore_index=True) if frames else _SH_EMPTY

    def pair_min_agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["id_a", "id_b"], sort=False)
            .agg(hamming=("hamming", "min"))
            .reset_index()
        )

    band_rows = sigs.map_batches(to_bands, batch_format="pyarrow")
    return hash_groupby(
        hash_groupby(band_rows, ["band", "key"], band_pairs_agg),
        ["id_a", "id_b"],
        pair_min_agg,
    )


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over verified dup pairs)
# ---------------------------------------------------------------------------


def dup_clusters(
    ds: "ray.data.Dataset", pairs: "ray.data.Dataset | pa.Table"
) -> "ray.data.Dataset":
    """(doc_id, cluster_id) for every doc: cluster_id = min doc_id of the
    connected component in the duplicate-pair graph (isolated docs are their
    own cluster). The PAIR SET is orders of magnitude smaller than the
    corpus (it only exists for near-dups), so union-find runs driver-side on
    the collected pairs and the label map broadcasts via ``ray.put``; the
    expensive parts — pair generation and the final per-doc assignment —
    stay distributed."""
    import ray

    rows = (
        pairs.take_all()
        if hasattr(pairs, "take_all")
        else pairs.to_pylist()
    )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in rows:
        a, b = int(r["id_a"] if "id_a" in r else r["doc_a"]), int(
            r["id_b"] if "id_b" in r else r["doc_b"]
        )
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = {x: find(x) for x in list(parent)}
    ref = ray.put(labels)

    def assign(batch: pa.Table) -> pa.Table:
        lab = ray.get(ref)
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(
                    [lab.get(int(i), int(i)) for i in ids], pa.int64()
                ),
            }
        )

    return ds.select_columns(["doc_id"]).map_batches(assign, batch_format="pyarrow")
