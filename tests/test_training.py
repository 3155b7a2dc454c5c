"""Training-data prep operators: chunking, sequence packing, decontamination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from fonduer_ray.functions import training

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
        )
    )


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_documents_golden():
    ds = _docs(["a b c d e f g", "x y", ""])
    out = training.chunk_documents(ds, max_tokens=4, stride=3).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    # doc 0: 7 tokens -> starts 0,3,6
    d0 = out[out.doc_id == 0]
    assert list(d0.chunk_start) == [0, 3, 6]
    assert list(d0.n_tokens) == [4, 4, 1]
    assert list(d0.chunk_text) == ["a b c d", "d e f g", "g"]
    # doc 1: 2 tokens -> one short chunk
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk_text) == ["x y"]
    # empty doc emits nothing
    assert (out.doc_id == 2).sum() == 0


def test_chunk_documents_covers_every_token():
    rng = np.random.default_rng(7)
    texts = [
        " ".join(f"t{i}_{j}" for j in range(rng.integers(0, 40)))
        for i in range(25)
    ]
    ds = _docs(texts)
    out = training.chunk_documents(ds, max_tokens=8, stride=8).to_pandas()
    for i, text in enumerate(texts):
        toks = text.split()
        got = []
        for _, r in out[out.doc_id == i].sort_values("chunk_idx").iterrows():
            got.extend(r.chunk_text.split())
        assert got == toks  # non-overlapping stride == exact partition


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def _brute_pack(texts, ids, seq_len):
    rows = []
    off = 0
    for did in sorted(ids):
        text = texts[ids.index(did)]
        n = len(text.split())
        if n:
            for seq_id in range(off // seq_len, (off + n - 1) // seq_len + 1):
                s = max(off, seq_id * seq_len)
                e = min(off + n, (seq_id + 1) * seq_len)
                rows.append(
                    {
                        "seq_id": seq_id,
                        "doc_id": did,
                        "doc_tok_start": s - off,
                        "seq_tok_start": s - seq_id * seq_len,
                        "n_toks": e - s,
                    }
                )
        off += n
    return pd.DataFrame(rows)


def test_pack_sequences_matches_bruteforce():
    rng = np.random.default_rng(3)
    ids = list(range(0, 120, 2))  # gappy ids
    texts = [
        " ".join("w" for _ in range(int(rng.integers(0, 30)))) for _ in ids
    ]
    ds = _docs(texts, ids)
    got = (
        training.pack_sequences(ds, seq_len=16, n_buckets=7)
        .to_pandas()
        .sort_values(["seq_id", "doc_id"], ignore_index=True)
    )
    want = _brute_pack(texts, ids, 16).sort_values(
        ["seq_id", "doc_id"], ignore_index=True
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_like=True
    )


def test_pack_sequences_partition_invariant():
    ids = list(range(40))
    texts = [" ".join("w" for _ in range(i % 9)) for i in ids]
    a = (
        training.pack_sequences(_docs(texts, ids), seq_len=10)
        .to_pandas()
        .sort_values(["seq_id", "doc_id"], ignore_index=True)
    )
    b = (
        training.pack_sequences(
            _docs(texts, ids).repartition(13), seq_len=10, n_buckets=3
        )
        .to_pandas()
        .sort_values(["seq_id", "doc_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pack_sequences_slices_are_gapless():
    ids = list(range(30))
    texts = [" ".join("w" for _ in range((i * 7) % 23)) for i in ids]
    out = training.pack_sequences(_docs(texts, ids), seq_len=12).to_pandas()
    total = sum(len(t.split()) for t in texts)
    assert out.n_toks.sum() == total
    # every sequence except the last is exactly full
    per_seq = out.groupby("seq_id").n_toks.sum()
    assert (per_seq.iloc[:-1] == 12).all()
    assert per_seq.index.max() == (total - 1) // 12


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def _brute_decon(texts, bench_texts, n):
    bench = set()
    for t in bench_texts:
        bench |= training._doc_ngrams(t, n)
    return {
        i: len(training._doc_ngrams(t, n) & bench)
        for i, t in enumerate(texts)
    }


def test_decontaminate_bruteforce_and_join_path_equal():
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 25)))
        for _ in range(40)
    ]
    bench_texts = texts[::13]  # overlapping subset -> guaranteed hits
    docs = _docs(texts)
    bench = _docs(bench_texts, ids=list(range(len(bench_texts))))

    want = _brute_decon(texts, bench_texts, 3)

    broadcast = (
        training.decontaminate(docs, bench, n=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    joined = (
        training.decontaminate(docs, bench, n=3, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(broadcast) == len(texts)
    for _, r in broadcast.iterrows():
        assert r.n_matched == want[r.doc_id]
        assert r.contaminated == (1 if want[r.doc_id] else 0)
    pd.testing.assert_frame_equal(
        broadcast.astype("int64"), joined.astype("int64")
    )


def test_decontaminate_clean_corpus_all_zero():
    docs = _docs(["a b c d e", "f g h i j"])
    bench = _docs(["z z z z z"])
    out = training.decontaminate(docs, bench, n=3).to_pandas()
    assert (out.n_matched == 0).all()
    assert (out.contaminated == 0).all()


def test_chunk_documents_rejects_bad_stride():
    with pytest.raises(ValueError):
        training.chunk_documents(_docs(["a"]), stride=0)


# ---------------------------------------------------------------------------
# mixture_sample
# ---------------------------------------------------------------------------


def _brute_mix(groups, keys, weights_pct, total):
    from fonduer_ray.functions.dedup import _md5_64

    quotas = {g: (total * p) // 100 for g, p in weights_pct.items()}
    rows = sorted(
        ((g, k) for g, k in zip(groups, keys) if g in quotas),
        key=lambda r: _md5_64(str(r[1])),
    )
    out, taken = [], {}
    for g, k in rows:
        t = taken.get(g, 0)
        if t < quotas[g]:
            taken[g] = t + 1
            out.append((g, t + 1, k))
    return sorted(out)


def test_mixture_sample_matches_bruteforce():
    rng = np.random.default_rng(23)
    groups = list(rng.choice(["en", "de", "es", "zh"], size=120))
    keys = list(range(120))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(groups),
                "doc_id": pa.array(keys, pa.int64()),
            }
        )
    )
    w = {"en": 50, "de": 30, "zh": 20}  # 'es' excluded
    got = (
        training.mixture_sample(ds, "lang", "doc_id", w, total=40)
        .to_pandas()
        .sort_values(["lang", "rank"], ignore_index=True)
    )
    want = _brute_mix(groups, keys, w, 40)
    assert [tuple(r) for r in got[["lang", "rank", "doc_id"]].to_numpy()] == want
    assert "es" not in set(got.lang)
    # quota respected
    per = got.groupby("lang").size()
    assert per.get("en", 0) <= 20 and per.get("de", 0) <= 12


def test_mixture_sample_partition_invariant():
    groups = [("en" if i % 3 else "de") for i in range(60)]
    keys = list(range(60))
    t = pa.table(
        {"lang": pa.array(groups), "doc_id": pa.array(keys, pa.int64())}
    )
    w = {"en": 60, "de": 40}
    a = (
        training.mixture_sample(ray.data.from_arrow(t), "lang", "doc_id", w, 30)
        .to_pandas()
        .sort_values(["lang", "rank"], ignore_index=True)
    )
    b = (
        training.mixture_sample(
            ray.data.from_arrow(t).repartition(9), "lang", "doc_id", w, 30
        )
        .to_pandas()
        .sort_values(["lang", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_packed_sequence_text_matches_manual_concat():
    ids = list(range(25))
    texts = [
        " ".join(f"d{i}w{j}" for j in range((i * 5) % 17)) for i in ids
    ]
    out = (
        training.packed_sequence_text(_docs(texts, ids), seq_len=10)
        .to_pandas()
        .sort_values("seq_id", ignore_index=True)
    )
    stream = [w for i in ids for w in texts[i].split()]
    for _, r in out.iterrows():
        want = stream[r.seq_id * 10 : (r.seq_id + 1) * 10]
        assert r.text.split() == want
        assert r.n_toks == len(want)
    assert out.n_toks.sum() == len(stream)


def test_packed_text_join_ships_each_doc_once():
    # one 5000-token doc at seq_len=16 spans ~313 sequences; the text join
    # must still carry exactly ONE row (slice lists), not one per slice —
    # the round-3 shape flaw replicated the full text per slice row
    long_doc = " ".join(f"w{j}" for j in range(5000))
    ds = _docs([long_doc, "a b c"], ids=[0, 1])
    mapping = training.pack_sequences(ds, seq_len=16)
    n_slices = mapping.count()
    assert n_slices > 300  # the fanout the join must NOT pay
    joined = training._per_doc_slices(mapping, ds)
    assert joined.count() == 2  # one row per doc: text crosses the join once
    # and the end result is still the exact concat-and-chunk stream
    out = (
        training.packed_sequence_text(ds, seq_len=16)
        .to_pandas()
        .sort_values("seq_id", ignore_index=True)
    )
    stream = long_doc.split() + ["a", "b", "c"]
    assert out.n_toks.sum() == len(stream)
    got = " ".join(out.sort_values("seq_id").text)
    assert got.split() == stream


def test_clean_corpus_composes_component_verdicts():
    texts = [
        # quality-passing English-ish docs need >=20 words, >=2 stopwords
        "the quick brown fox jumps over the lazy dog and runs to the old "
        "mill near the river bank today",
    ] * 3 + [
        "the quick brown fox jumps over the lazy dog and runs to the new "
        "barn near the river bank today",
        "zz xx yy",  # fails quality (too short)
    ]
    docs = _docs(texts)
    bench = _docs([texts[3]], ids=[0])  # contaminates doc 3 (and shares
    # grams with 0-2 where 8-grams overlap)
    out = (
        training.clean_corpus(docs, bench, n=8)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(out) == 5
    # docs 1, 2 are exact dups of doc 0
    assert list(out.is_dup) == [0, 1, 1, 0, 0]
    assert out.loc[4, "keep_quality"] == 0
    assert out.loc[3, "contaminated"] == 1  # exact benchmark member
    # kept = quality and not dup and not contaminated
    for _, r in out.iterrows():
        assert r.kept == int(
            r.keep_quality == 1 and r.is_dup == 0 and r.contaminated == 0
        )


def test_prepare_training_data_resumable(tmp_path):
    import os

    out = str(tmp_path / "train_out")
    # every doc: >=20 words, >=2 stopwords, alpha-heavy, and NO 8-gram
    # shared across docs (a unique token interrupts every 8-window)
    texts = [
        " ".join(f"the w{i}x{j}" for j in range(10)) + " and it is a fine day"
        for i in range(12)
    ]
    texts += [texts[0]]  # one exact dup (dropped)
    docs = _docs(texts)
    bench = _docs([texts[5]], ids=[0])  # contaminates doc 5
    summary = training.prepare_training_data(
        docs, bench, out, seq_len=16, n_buckets=4
    )
    assert summary["rows_written"] > 0
    assert sorted(summary["written_buckets"]) == summary["written_buckets"]
    assert os.path.isdir(os.path.join(out, "_manifests"))

    # re-run: everything skips, nothing rewritten, upstream never executes
    again = training.prepare_training_data(
        _docs(texts), _docs([texts[5]], ids=[0]), out, seq_len=16, n_buckets=4
    )
    assert again["rows_written"] == 0
    assert len(again["skipped_buckets"]) == 4

    # content check: sequences cover exactly the kept docs' token stream
    import pyarrow.parquet as pq

    written = pq.read_table(out).to_pandas()
    kept = (
        training.clean_corpus(_docs(texts), _docs([texts[5]], ids=[0]), n=8)
        .to_pandas()
    )
    kept_ids = sorted(kept[kept.kept == 1].doc_id)
    stream = [w for i in kept_ids for w in texts[i].split()]
    assert written.n_toks.sum() == len(stream)
    full = written.sort_values("seq_id")
    got_stream = " ".join(full.text).split()
    assert got_stream == stream
