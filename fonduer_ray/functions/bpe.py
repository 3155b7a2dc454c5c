"""Distributed byte-pair-encoding (BPE) tokenizer training and encoding
(Sennrich et al. 2016 semantics; no fonduer analog — from the
large-scale-training-data brief).

Scale design: BPE never iterates the corpus. One corpus scan builds the
distinct-word vocabulary with counts (Heaps' law: vocab ≪ corpus — the
standard trick that makes BPE train on TB corpora); every merge iteration
then runs over the small vocab Dataset only:

- pair counting: vectorized per-block partial ``Counter`` → one
  ``hash_groupby`` sum → per-partition top-1 → driver argmax over
  ``n_partitions`` candidate rows (never the full pair table).
- merge application: broadcast the winning pair, ``map_batches`` rewrite
  of the symbol lists, re-materialize the (small) vocab so iteration k+1
  doesn't recompute the whole chain.

The driver holds only the merge list (``n_merges`` tuples) and one row per
partition per iteration. ``bpe_pair_counts`` (the first iteration's full
pair table) is the oracle surface — DuckDB re-derives it exactly.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from fonduer_ray.stages.util import get_broadcast, hash_groupby

END = "</w>"


# ---------------------------------------------------------------------------
# vocabulary & pair counts
# ---------------------------------------------------------------------------


def word_vocab(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, text) -> distinct (word, n) corpus counts. Per-block
    pre-aggregation (Counter) shrinks the shuffle to distinct words per
    block before the exact ``hash_groupby`` sum."""

    def partial(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for text in batch["text"].to_pylist():
            cnt.update((text or "").split())
        return pa.table(
            {
                "word": pa.array(list(cnt.keys()), pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    return hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["word"],
        lambda df: df.groupby("word", sort=False)["n"].sum().reset_index(),
    )


def _initial_syms(word: str) -> list[str]:
    return list(word) + [END]


def _pairs_of(syms: list[str]) -> list[tuple[str, str]]:
    return list(zip(syms, syms[1:]))


def bpe_pair_counts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Adjacent-symbol pair counts of the INITIAL (character-level)
    segmentation, weighted by word frequency — the statistic the first BPE
    merge maximizes. Columns: ``(left, right, n)``."""
    vocab = word_vocab(ds)

    def expand(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for word, n in zip(batch["word"].to_pylist(), batch["n"].to_pylist()):
            if not word:
                continue
            for p in _pairs_of(_initial_syms(word)):
                cnt[p] += n
        lefts = [p[0] for p in cnt]
        rights = [p[1] for p in cnt]
        return pa.table(
            {
                "left": pa.array(lefts, pa.string()),
                "right": pa.array(rights, pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    return hash_groupby(
        vocab.map_batches(expand, batch_format="pyarrow"),
        ["left", "right"],
        lambda df: df.groupby(["left", "right"], sort=False)["n"]
        .sum()
        .reset_index(),
    )


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def _merge_syms(syms: list[str], left: str, right: str) -> list[str]:
    """Left-to-right single pass replacing adjacent (left, right) with the
    concatenated symbol — reference BPE merge semantics."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    ds: "ray.data.Dataset", n_merges: int = 10
) -> tuple[list[tuple[str, str]], "ray.data.Dataset"]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the ordered
    merge list and the final segmented vocab Dataset
    ``(word, n, syms: list<string>)``.

    Ties on pair count break to the lexicographically smallest
    (left, right) so training is deterministic regardless of partitioning.
    """

    def seed(batch: pa.Table) -> pa.Table:
        syms = [
            _initial_syms(w) if w else []
            for w in batch["word"].to_pylist()
        ]
        return batch.append_column(
            "syms", pa.array(syms, pa.list_(pa.string()))
        )

    vocab = (
        word_vocab(ds).map_batches(seed, batch_format="pyarrow").materialize()
    )
    merges: list[tuple[str, str]] = []

    def count_pairs(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for syms, n in zip(batch["syms"].to_pylist(), batch["n"].to_pylist()):
            for p in _pairs_of(syms):
                cnt[p] += n
        return pa.table(
            {
                "left": pa.array([p[0] for p in cnt], pa.string()),
                "right": pa.array([p[1] for p in cnt], pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def partition_best(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["left", "right"], sort=False)["n"].sum().reset_index()
        )
        g = g.sort_values(
            ["n", "left", "right"], ascending=[False, True, True]
        )
        return g.head(1)

    for _ in range(n_merges):
        candidates = hash_groupby(
            vocab.map_batches(count_pairs, batch_format="pyarrow"),
            ["left", "right"],
            partition_best,
        ).take_all()  # bounded: one row per hash partition
        if not candidates:
            break
        # deterministic winner: max count, then smallest (left, right)
        top_n = max(r["n"] for r in candidates)
        best = min(
            (r for r in candidates if r["n"] == top_n),
            key=lambda r: (r["left"], r["right"]),
        )
        if top_n < 1:
            break
        left, right = best["left"], best["right"]
        merges.append((left, right))
        pair_ref = ray.put((left, right))

        def apply_merge(batch: pa.Table) -> pa.Table:
            l, r = get_broadcast(pair_ref)
            syms = [
                _merge_syms(s, l, r) for s in batch["syms"].to_pylist()
            ]
            return pa.table(
                {
                    "word": batch["word"],
                    "n": batch["n"],
                    "syms": pa.array(syms, pa.list_(pa.string())),
                }
            )

        vocab = vocab.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()

    return merges, vocab


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the learned merges in order to one word."""
    syms = _initial_syms(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = _merge_syms(syms, left, right)
    return syms


def bpe_encode(
    ds: "ray.data.Dataset", merges: list[tuple[str, str]]
) -> "ray.data.Dataset":
    """(doc_id, text) -> (doc_id, n_words, n_bpe_tokens): tokenize every
    document with the learned merges. The merge list broadcasts once; a
    per-worker memo caches each distinct word's encoding (Zipf makes the
    hit rate high), so the hot path is a dict lookup per word."""
    merges_ref = ray.put(list(merges))
    _memo: dict[str, int] = {}

    def enc(batch: pa.Table) -> pa.Table:
        mg = get_broadcast(merges_ref)
        n_words, n_toks = [], []
        for text in batch["text"].to_pylist():
            words = (text or "").split()
            total = 0
            for w in words:
                k = _memo.get(w)
                if k is None:
                    k = _memo[w] = len(encode_word(w, mg))
                total += k
            n_words.append(len(words))
            n_toks.append(total)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "n_bpe_tokens": pa.array(n_toks, pa.int64()),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")
