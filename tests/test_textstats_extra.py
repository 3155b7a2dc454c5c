"""Brute-force checks for the corpus-analysis additions: global vocab
top-k, LM unigram frequency scoring (both paths), per-source stats,
phrase inverted index, and C4-style line-level dedup (both paths)."""

import hashlib
from collections import Counter

import pandas as pd
import pytest

import ray.data

from fonduer_ray.functions.dedup import line_dedup
from fonduer_ray.functions.search import inverted_index
from fonduer_ray.functions.textstats import (
    lm_unigram_score,
    source_stats,
    vocab_topk,
)

DOCS = [
    # docs 0 and 1 share their first line (10 tokens) exactly; doc 2 is a
    # full duplicate of doc 0; doc 3 is unique; doc 4 short (one partial line)
    (0, "a b c d e f g h i j k l m n o p q r s t"),
    (1, "a b c d e f g h i j z z z z z z z z z z"),
    (2, "a b c d e f g h i j k l m n o p q r s t"),
    (3, "u v w x y u v w x y u v w x y u v w x y"),
    (4, "tail only"),
]


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.from_items(
        [{"doc_id": d, "text": t, "source": f"s{d % 2}", "n_chars": len(t)}
         for d, t in DOCS]
    )


def test_vocab_topk_matches_counter(docs_ds):
    got = [(r["token"], r["n"]) for r in vocab_topk(docs_ds, k=5).take_all()]
    counts = Counter(t for _, text in DOCS for t in text.split())
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want


def test_lm_unigram_score_paths_match_brute(docs_ds):
    counts = Counter(t for _, text in DOCS for t in text.split())
    want = {
        d: (len(text.split()), sum(counts[t] for t in text.split()))
        for d, text in DOCS
    }
    for limit in (None, 0):
        kw = {} if limit is None else {"broadcast_limit": 0}
        out = lm_unigram_score(docs_ds, **kw).take_all()
        got = {r["doc_id"]: (r["n_tokens"], r["sum_freq"]) for r in out}
        assert got == want, f"broadcast_limit={limit}"


def test_source_stats_matches_brute(docs_ds):
    out = {r["source"]: r for r in source_stats(docs_ds).take_all()}
    df = pd.DataFrame(
        [{"source": f"s{d % 2}", "text": t, "n_chars": len(t)} for d, t in DOCS]
    )
    for source, g in df.groupby("source"):
        r = out[source]
        assert r["n_docs"] == len(g)
        assert r["sum_chars"] == int(g["n_chars"].sum())
        assert r["n_distinct_texts"] == g["text"].nunique()


def test_inverted_index_rare_phrases(docs_ds):
    # sample_mod=1 keeps every gram; doc 3's repeated phrase has df == 1
    out = inverted_index(docs_ds, n=5, max_df=3, sample_mod=1).take_all()
    idx = {r["term"]: (r["df"], r["postings"]) for r in out}
    # shared prefix line grams appear in docs 0, 1, 2
    assert idx["a b c d e"] == (3, "0,1,2")
    # doc-0/2-only grams
    assert idx["k l m n o"] == (2, "0,2")
    # doc-3 grams are df=1
    assert idx["u v w x y"] == (1, "3")
    # every df respects the bound
    assert all(df <= 3 for df, _ in idx.values())


def brute_line_dedup(min_docs=2):
    lines_of = {
        d: [" ".join(t.split()[i : i + 10]) for i in range(0, len(t.split()), 10)]
        for d, t in DOCS
    }
    owners = {}
    for d, lines in lines_of.items():
        for ln in set(lines):
            owners.setdefault(ln, set()).add(d)
    dup = {ln for ln, ds_ in owners.items() if len(ds_) >= min_docs}
    out = {}
    for d, lines in lines_of.items():
        kept = [ln for ln in lines if ln not in dup]
        out[d] = (
            len(lines),
            len(lines) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_line_dedup_paths_match_brute(docs_ds):
    want = brute_line_dedup()
    for limit in (None, 0):
        kw = {} if limit is None else {"broadcast_limit": 0}
        out = line_dedup(docs_ds, **kw).take_all()
        got = {
            r["doc_id"]: (r["n_lines"], r["n_removed"], r["kept_md5"])
            for r in out
        }
        assert got == want, f"broadcast_limit={limit}"
    # the engineered corpus must exercise both removal and retention
    assert want[0][1] == 2  # doc 0: both lines duplicated (line1 w/ 1, full dup w/ 2)
    assert want[3][1] == 0  # unique doc untouched


def brute_span_dedup(k=4, min_docs=2):
    toks_of = {d: t.split() for d, t in DOCS}
    owners = {}
    for d, toks in toks_of.items():
        for i in range(len(toks) - k + 1):
            owners.setdefault(tuple(toks[i : i + k]), set()).add(d)
    keeper = {g: min(ds_) for g, ds_ in owners.items() if len(ds_) >= min_docs}
    out = {}
    for d, toks in toks_of.items():
        if not toks:
            continue
        cov = [False] * len(toks)
        for i in range(len(toks) - k + 1):
            kp = keeper.get(tuple(toks[i : i + k]))
            if kp is not None and kp != d:
                for j in range(i, i + k):
                    cov[j] = True
        kept = [w for w, c in zip(toks, cov) if not c]
        out[d] = (
            len(toks),
            len(toks) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_span_dedup_paths_match_brute(docs_ds):
    from fonduer_ray.functions.dedup import span_dedup

    want = brute_span_dedup()
    for limit in (None, 0):
        kw = {} if limit is None else {"broadcast_limit": 0}
        out = span_dedup(docs_ds, k=4, **kw).take_all()
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["kept_md5"])
            for r in out
        }
        assert got == want, f"broadcast_limit={limit}"
    # all-but-one semantics: doc 0 (min holder) keeps its text, the full
    # duplicate doc 2 loses everything, doc 1 loses only the shared prefix
    assert want[0][1] == 0
    assert want[2][1] == 20
    assert want[1][1] == 10
    # doc 3's repeats are intra-doc only (cross-doc dedup leaves them) and
    # doc 4 is shorter than k
    assert want[3][1] == 0 and want[4][1] == 0


def test_importance_weights_paths_match_brute(ray_session):
    from fonduer_ray.functions.textstats import importance_weights

    docs = [
        (0, "a b a c", "en"),
        (1, "a b b d", "en"),
        (2, "a c c d", "fr"),
        (3, "e e e e", "fr"),
        (4, "", "en"),  # zero-token doc: both paths must emit (4, 0, 0)
        (5, "   ", "fr"),  # whitespace-only is zero tokens too
    ]
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t, "lang": lg} for d, t, lg in docs]
    )
    c_all = Counter(t for _, text, _ in docs for t in text.split())
    c_tgt = Counter(
        t for _, text, lg in docs if lg == "en" for t in text.split()
    )
    w = {t: (c_tgt.get(t, 0) * 1_000_000) // c_all[t] for t in c_all}
    want = {
        d: (len(text.split()), sum(w[t] for t in text.split()))
        for d, text, _ in docs
    }
    for kw in ({}, {"broadcast_limit": 0}):
        out = importance_weights(ds, **kw).take_all()
        got = {r["doc_id"]: (r["n_tokens"], r["importance"]) for r in out}
        assert got == want, f"{kw}"
    assert want[4] == (0, 0) and want[5] == (0, 0)
    # target-language docs must rank above off-target on mean importance
    mean = {
        d: want[d][1] / want[d][0] for d, text, _ in docs if text.split()
    }
    assert min(mean[0], mean[1]) > max(mean[2], mean[3])


def test_pmi_collocations_matches_brute(docs_ds):
    from fonduer_ray.functions.textstats import pmi_collocations

    got = [
        (r["w1"], r["w2"], r["n_xy"], r["score"])
        for r in pmi_collocations(docs_ds, k=10, min_count=2).take_all()
    ]
    uni = Counter(t for _, text in DOCS for t in text.split())
    N = sum(uni.values())
    big = Counter(
        (toks[i], toks[i + 1])
        for _, text in DOCS
        for toks in [text.split()]
        for i in range(len(toks) - 1)
    )
    want = [
        (w1, w2, n, (n * N * N) // (uni[w1] * uni[w2]))
        for (w1, w2), n in big.items()
        if n >= 2
    ]
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == want[:10]
    # the integer surrogate must rank identically to float PMI
    import math

    float_rank = sorted(
        ((w1, w2) for (w1, w2), n in big.items() if n >= 2),
        key=lambda p: (
            -math.log(big[p] * N * N / (uni[p[0]] * uni[p[1]])),
            p[0],
            p[1],
        ),
    )
    assert [(w1, w2) for w1, w2, _, _ in want[:10]] == float_rank[:10]


def test_token_zipf_stats_brute(ray_session):
    import collections

    import pandas as pd
    import ray.data

    from fonduer_ray.functions.textstats import token_zipf_stats

    docs = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de", "en"],
            "text": [
                "a b b c c c",
                "a d",
                "x y x",
                "",
                "e",
            ],
        }
    )
    got = (
        token_zipf_stats(ray.data.from_pandas(docs).repartition(3))
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    rows = []
    for lang in ["de", "en"]:
        c = collections.Counter(
            t
            for txt, lg in zip(docs["text"], docs["lang"])
            if lg == lang
            for t in txt.split()
        )
        rows.append(
            (
                lang,
                sum(c.values()),
                len(c),
                sum(1 for v in c.values() if v == 1),
                sum(1 for v in c.values() if v == 2),
                max(c.values()),
            )
        )
    want = pd.DataFrame(
        rows,
        columns=["lang", "n_tokens", "vocab", "hapax", "dis", "max_freq"],
    )
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in want.columns[1:]}), want
    )


def test_lang_vocab_topk_brute(ray_session):
    """Per-lang top-10 must equal a single-process pandas ranking with the
    same (n desc, token asc) tie-break."""
    import pandas as pd
    import pyarrow.parquet as pq

    from fonduer_ray.functions.textstats import lang_vocab_topk
    from fonduer_ray.pipelines.docops import read_docs

    sf = "/root/testdata/sf0.001"
    got = (
        lang_vocab_topk(read_docs(sf, ["lang", "text"]))
        .to_pandas()
        .sort_values(["lang", "n", "token"], ascending=[True, False, True],
                     ignore_index=True)
    )
    t = pq.read_table(f"{sf}/documents.parquet", columns=["lang", "text"]).to_pandas()
    rows = []
    for lang, text in zip(t["lang"], t["text"]):
        for tok in (text or "").split():
            rows.append((lang, tok))
    c = (
        pd.DataFrame(rows, columns=["lang", "token"])
        .groupby(["lang", "token"], sort=False)
        .size()
        .reset_index(name="n")
        .sort_values(["lang", "n", "token"], ascending=[True, False, True])
    )
    want = c.groupby("lang", sort=False).head(10).reset_index(drop=True)
    assert got[["lang", "token", "n"]].values.tolist() == want.values.tolist()


def test_skipgram_pairs_brute(ray_session):
    import ray

    from fonduer_ray.functions.textstats import skipgram_pairs

    texts = [
        "a b c a b",
        "b a a b c d",
        "c c c a",
        "",
        "solo",
    ] * 4
    got = skipgram_pairs(
        ray.data.from_items([{"text": t} for t in texts]),
        window=2,
        k=10,
        min_count=2,
    ).to_pandas()
    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks)):
            for j in range(len(toks)):
                if i != j and abs(i - j) <= 2:
                    c[(toks[i], toks[j])] += 1
    exp = sorted(
        ((w, n) for w, n in c.items() if n >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert list(map(tuple, got[["center", "context", "n"]].itertuples(index=False))) == [
        (w[0], w[1], n) for w, n in exp
    ]
