"""Distributed text retrieval over a documents table: corpus statistics +
query scoring + top-k, the inverted-index-shaped access path of a web-scale
engine (no fonduer analog — from the large-scale-pipeline brief).

Two scorers share the same two-pass plumbing:

- ``search_topk``: integer rarity-weighted term frequency
  (``weight(t) = max(1, N // df(t))``, ``score(d) = sum tf(t,d)*weight(t)``)
  — exact in int64, so a DuckDB oracle re-derives it bit-for-bit.
- ``bm25_topk``: real Okapi BM25 (k1/b), float scores; verified against a
  brute-force reference in tests.

Scale design (both): pass 1 computes document frequencies for the QUERY
terms only — per-block partial df vectors reduced by a single
``Dataset.sum`` (m+1 numbers total, never a corpus-wide vocabulary).
Pass 2 broadcasts the tiny weight table and scores every document
vectorized per batch, keeping only each block's top-k; the global top-k is
a sort+limit over (num_blocks x k) rows. No inverted index materializes:
at 100 TB the index IS the scan + partial-topk, which streams.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from fonduer_ray.stages.util import get_broadcast


def _corpus_stats(ds: "ray.data.Dataset", terms: list[str]) -> dict:
    """One scan -> {n_docs, total_tokens, df[i] for each query term}."""
    term_ix = {t: i for i, t in enumerate(terms)}
    m = len(terms)

    def partial(batch: pa.Table) -> pa.Table:
        df = np.zeros(m, np.int64)
        total = 0
        for text in batch["text"].to_pylist():
            toks = (text or "").split()
            total += len(toks)
            seen = set(toks)
            for t, i in term_ix.items():
                if t in seen:
                    df[i] += 1
        cols = {"n_docs": pa.array([batch.num_rows], pa.int64()),
                "total_tokens": pa.array([total], pa.int64())}
        for i in range(m):
            cols[f"df_{i}"] = pa.array([int(df[i])], pa.int64())
        return pa.table(cols)

    sums = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n_docs", "total_tokens"] + [f"df_{i}" for i in range(m)]
    )
    return {
        "n_docs": int(sums["sum(n_docs)"]),
        "total_tokens": int(sums["sum(total_tokens)"]),
        "df": [int(sums[f"sum(df_{i})"]) for i in range(m)],
    }


def _topk_scored(scored: "ray.data.Dataset", k: int) -> pa.Table:
    """Global top-k over per-block top-k rows: sort desc by score with
    doc_id tie-break, limit k, attach 1-based rank. The input is at most
    (num_blocks x k) rows, so the final materialization is tiny."""
    top = scored.sort(["score", "doc_id"], descending=[True, False]).limit(k)
    rows = top.take_all()
    return pa.table(
        {
            "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "score": pa.array(
                [r["score"] for r in rows],
                pa.int64() if rows and isinstance(rows[0]["score"], int) else pa.float64(),
            ),
        }
    )


def search_topk(
    ds: "ray.data.Dataset", terms: list[str], k: int = 20
) -> pa.Table:
    """Integer rarity-weighted TF retrieval: exact, oracle-checkable.

    ``weight(t) = max(1, n_docs // df(t))`` (0 when the term is absent from
    the corpus), ``score(d) = sum_t tf(t, d) * weight(t)``; returns the top
    ``k`` docs with score > 0 as ``(rank, doc_id, score)``."""
    stats = _corpus_stats(ds, terms)
    n_docs = stats["n_docs"]
    weights = {
        t: (max(1, n_docs // df) if df > 0 else 0)
        for t, df in zip(terms, stats["df"])
    }
    w_ref = ray.put(weights)

    def score_block(batch: pa.Table) -> pa.Table:
        w = get_broadcast(w_ref)
        ids, scores = [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            cnt = Counter((text or "").split())
            s = sum(cnt[t] * wt for t, wt in w.items() if t in cnt)
            if s > 0:
                ids.append(did)
                scores.append(s)
        blk = pd.DataFrame({"doc_id": ids, "score": scores})
        blk = blk.sort_values(
            ["score", "doc_id"], ascending=[False, True], ignore_index=True
        ).head(k)
        return pa.table(
            {
                "doc_id": pa.array(blk["doc_id"], pa.int64()),
                "score": pa.array(blk["score"], pa.int64()),
            }
        )

    scored = ds.map_batches(score_block, batch_format="pyarrow")
    return _topk_scored(scored, k)


def bm25_topk(
    ds: "ray.data.Dataset",
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Okapi BM25 top-k: ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``,
    per-doc term score ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl))``.
    Same two-pass streaming plumbing as ``search_topk``; float scores, so
    correctness evidence is the brute-force test, not a SQL oracle."""
    stats = _corpus_stats(ds, terms)
    n_docs, total = stats["n_docs"], stats["total_tokens"]
    avgdl = (total / n_docs) if n_docs else 1.0
    idf = {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, df in zip(terms, stats["df"])
        if df > 0
    }
    p_ref = ray.put((idf, avgdl))

    def score_block(batch: pa.Table) -> pa.Table:
        idf_map, adl = get_broadcast(p_ref)
        ids, scores = [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = (text or "").split()
            if not toks:
                continue
            cnt = Counter(toks)
            norm = k1 * (1.0 - b + b * len(toks) / adl)
            s = 0.0
            for t, w in idf_map.items():
                tf = cnt.get(t, 0)
                if tf:
                    s += w * tf * (k1 + 1.0) / (tf + norm)
            if s > 0.0:
                ids.append(did)
                scores.append(s)
        blk = pd.DataFrame({"doc_id": ids, "score": scores})
        blk = blk.sort_values(
            ["score", "doc_id"], ascending=[False, True], ignore_index=True
        ).head(k)
        return pa.table(
            {
                "doc_id": pa.array(blk["doc_id"], pa.int64()),
                "score": pa.array(blk["score"], pa.float64()),
            }
        )

    scored = ds.map_batches(score_block, batch_format="pyarrow")
    return _topk_scored(scored, k)


def inverted_index(
    ds: "ray.data.Dataset",
    n: int = 5,
    max_df: int = 3,
    sample_mod: int = 16,
) -> "ray.data.Dataset":
    """Materialize the rare-phrase slice of an inverted index:
    ``(term, df, postings)`` for every word ``n``-gram whose document
    frequency is at most ``max_df`` — the long-tail posting lists a
    near-verbatim-quote / plagiarism lookup serves point queries from (the
    Zipf head is excluded BY the df bound, which is what keeps every row
    small; single tokens are useless as keys in a small-vocabulary corpus,
    phrases are rare by combinatorics). ``sample_mod`` keeps a
    deterministic 1/mod md5 sample of the gram space so the materialized
    index is a fixed fraction of the corpus at any scale (the standard
    sharding trick — a full index is this same job run mod times).

    Scale design: per-block combiners emit distinct (gram, doc) pairs
    already sample-filtered; one gram-keyed ``hash_groupby`` builds each
    posting list where the gram's rows are colocated — lists longer than
    ``max_df`` are dropped inside the partition, so oversized postings
    never leave it. Postings are comma-joined sorted doc ids (string) so
    the row is value-hashable by the oracle."""
    from fonduer_ray.stages.util import hash_groupby

    src = ds.select_columns(["doc_id", "text"])

    def term_doc(batch: pa.Table) -> pa.Table:
        import hashlib

        doc_ids, terms = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = (text or "").split()
            grams = {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
            for g in grams:
                d = hashlib.md5(g.encode()).hexdigest()
                if int(d[:16], 16) % sample_mod == 0:
                    doc_ids.append(doc_id)
                    terms.append(g)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
            }
        )

    def build_postings(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for term, g in df.groupby("term", sort=False):
            docs = sorted(set(g["doc_id"]))
            if len(docs) <= max_df:
                rows.append(
                    {
                        "term": term,
                        "df": len(docs),
                        "postings": ",".join(str(d) for d in docs),
                    }
                )
        if not rows:
            return pd.DataFrame(
                {
                    "term": pd.Series([], dtype="object"),
                    "df": pd.Series([], dtype="int64"),
                    "postings": pd.Series([], dtype="object"),
                }
            )
        out = pd.DataFrame(rows)
        out["df"] = out["df"].astype("int64")
        return out

    return hash_groupby(
        src.map_batches(term_doc, batch_format="pyarrow"), ["term"], build_postings
    )


def phrase_match_counts(
    ds: "ray.data.Dataset", phrase: tuple = ("table", "scan")
) -> "ray.data.Dataset":
    """Positional phrase matching: per-document count of ADJACENT
    occurrences of the token sequence ``phrase`` in whitespace
    tokenization — the primitive behind quoted-phrase search (a
    positional inverted index replays exactly this adjacency check at
    query time). Stateless vectorized map: tokens shift-compare inside
    each document, docs with zero matches drop. Distinct phrase tokens
    cannot overlap, so counts are unambiguous.
    Returns ``(doc_id, n_matches)``."""

    def count_phrase(t: pa.Table) -> pa.Table:
        import numpy as np

        ids, counts = [], []
        for doc_id, text in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            toks = np.asarray((text or "").split(), dtype=object)
            if len(toks) < len(phrase):
                continue
            hit = toks[: len(toks) - len(phrase) + 1] == phrase[0]
            for j, w in enumerate(phrase[1:], start=1):
                hit &= toks[j: len(toks) - len(phrase) + 1 + j] == w
            n = int(hit.sum())
            if n:
                ids.append(doc_id)
                counts.append(n)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n_matches": pa.array(counts, pa.int64())}
        )

    return ds.map_batches(count_phrase, batch_format="pyarrow")
