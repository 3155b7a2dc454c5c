"""Property-based checks (hypothesis) for the corpus operators added in
round 3: line-level dedup and LM unigram scoring must match brute force on
arbitrary corpora, including adversarial repetition and empty docs."""

import hashlib
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from fonduer_ray.functions.dedup import line_dedup
from fonduer_ray.functions.textstats import lm_unigram_score

WORDS = ["aa", "bb", "cc", "dd"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=30).map(" ".join),
    min_size=1,
    max_size=12,
)


def brute_line_dedup(texts, line_tokens=10, min_docs=2):
    lines_of = {
        d: [
            " ".join(t.split()[i : i + line_tokens])
            for i in range(0, len(t.split()), line_tokens)
        ]
        for d, t in enumerate(texts)
    }
    owners = {}
    for d, lines in lines_of.items():
        for ln in set(lines):
            owners.setdefault(ln, set()).add(d)
    dup = {ln for ln, ds_ in owners.items() if len(ds_) >= min_docs}
    out = {}
    for d, lines in lines_of.items():
        if not lines:
            continue
        kept = [ln for ln in lines if ln not in dup]
        out[d] = (
            len(lines),
            len(lines) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_strategy)
def test_line_dedup_property(ray_session, texts):
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in enumerate(texts)]
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["kept_md5"])
        for r in line_dedup(ds).take_all()
    }
    assert got == brute_line_dedup(texts)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_strategy)
def test_lm_unigram_score_property(ray_session, texts):
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in enumerate(texts)]
    )
    counts = Counter(t for text in texts for t in text.split())
    want = {
        d: (len(text.split()), sum(counts[t] for t in text.split()))
        for d, text in enumerate(texts)
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_freq"])
        for r in lm_unigram_score(ds).take_all()
    }
    assert got == want


snapshot_strategy = st.tuples(
    st.dictionaries(
        st.integers(min_value=0, max_value=40),
        st.sampled_from(["p0", "p1", "p2"]),
        max_size=25,
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=40),
        st.sampled_from(["p0", "p1", "p2"]),
        max_size=25,
    ),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snaps=snapshot_strategy)
def test_snapshot_diff_property(ray_session, snaps):
    from fonduer_ray.pipelines.relational import snapshot_diff

    om, nm = snaps
    exp = {}
    for k in set(om) | set(nm):
        if k not in om:
            s = "added"
        elif k not in nm:
            s = "removed"
        elif om[k] != nm[k]:
            s = "changed"
        else:
            s = "unchanged"
        n, ks = exp.get(s, (0, 0))
        exp[s] = (n + 1, ks + k)
    got = snapshot_diff(
        ray.data.from_items([{"k": k, "p": p} for k, p in om.items()] or
                            [{"k": -1, "p": "x"}]).filter(lambda r: r["k"] >= 0),
        ray.data.from_items([{"k": k, "p": p} for k, p in nm.items()] or
                            [{"k": -1, "p": "x"}]).filter(lambda r: r["k"] >= 0),
    ).to_pandas()
    # re-derive expectation against the sentinel-filtered inputs
    assert {
        r["status"]: (r["n"], r["key_sum"]) for _, r in got.iterrows()
    } == exp
