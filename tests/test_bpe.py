"""BPE training/encoding vs a brute-force single-process reference."""

from collections import Counter

import pyarrow as pa
import pytest

import ray.data

from fonduer_ray.functions import bpe

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


# --- brute-force reference (classic Sennrich loop) -------------------------


def _ref_train(texts, n_merges):
    vocab = Counter()
    for t in texts:
        vocab.update(t.split())
    segs = {w: list(w) + [bpe.END] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in segs.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += vocab[w]
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == top)
        merges.append(best)
        l, r = best
        for w in segs:
            segs[w] = bpe._merge_syms(segs[w], l, r)
    return merges, segs


CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new",
    "low lowest newest wider wide wide",
]


def test_bpe_train_matches_reference():
    merges, vocab = bpe.bpe_train(_docs(CORPUS), n_merges=8)
    ref_merges, ref_segs = _ref_train(CORPUS, 8)
    assert merges == ref_merges
    got = {
        r["word"]: list(r["syms"])
        for r in vocab.take_all()
    }
    assert got == ref_segs


def test_bpe_train_partition_invariant():
    a, _ = bpe.bpe_train(_docs(CORPUS), n_merges=6)
    b, _ = bpe.bpe_train(_docs(CORPUS).repartition(5), n_merges=6)
    assert a == b


def test_bpe_pair_counts_bruteforce():
    out = bpe.bpe_pair_counts(_docs(CORPUS)).to_pandas()
    vocab = Counter()
    for t in CORPUS:
        vocab.update(t.split())
    want = Counter()
    for w, n in vocab.items():
        syms = list(w) + [bpe.END]
        for p in zip(syms, syms[1:]):
            want[p] += n
    got = {
        (r.left, r.right): r.n for r in out.itertuples()
    }
    assert got == dict(want)


def test_bpe_encode_counts():
    merges, _ = bpe.bpe_train(_docs(CORPUS), n_merges=8)
    enc = (
        bpe.bpe_encode(_docs(CORPUS), merges)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    for i, text in enumerate(CORPUS):
        words = text.split()
        want = sum(len(bpe.encode_word(w, merges)) for w in words)
        assert enc.loc[i, "n_words"] == len(words)
        assert enc.loc[i, "n_bpe_tokens"] == want
    # merging strictly reduces token count vs chars+end marker
    raw = sum(len(w) + 1 for t in CORPUS for w in t.split())
    assert enc.n_bpe_tokens.sum() < raw


def test_encode_word_applies_merges_in_order():
    merges = [("l", "o"), ("lo", "w")]
    assert bpe.encode_word("low", merges) == ["low", bpe.END]
    assert bpe.encode_word("lot", merges) == ["lo", "t", bpe.END]
