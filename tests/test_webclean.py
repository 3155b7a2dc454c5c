"""Web-text cleaning operators (functions/webclean.py): Gopher/C4-style
quality filter, repetition stats, PII scan/redaction.

The classes are stateless per-batch transforms, so the unit tests drive them
directly on Arrow tables (no Ray session needed); the driver queries
`quality_filter` / `repetition_stats` / `pii_scan` value-check the full
distributed path against DuckDB oracles.
"""

import hashlib

import pyarrow as pa

from fonduer_ray.functions.webclean import (
    MIN_WORDS,
    PiiScan,
    QualityFilter,
    RepetitionStats,
)


def _batch(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )


def test_quality_filter_rules():
    good = "the quick brown fox jumps over the lazy dog and then it ran " * 3
    out = QualityFilter()(
        _batch(
            [
                good.strip(),  # passes every rule
                "word " * (MIN_WORDS - 2),  # too short
                "zz " * 50,  # no stopwords
                "1 2 3 4 5 " * 10,  # no alphabetic words
                "",
            ]
        )
    ).to_pylist()
    assert [r["keep"] for r in out] == [True, False, False, False, False]
    assert out[0]["stopword_hits"] >= 2
    assert out[3]["alpha_word_frac"] == 0.0
    assert out[4]["n_words"] == 0 and out[4]["keep"] is False


def test_quality_filter_signal_values():
    out = QualityFilter()(_batch(["aa bbbb c9 the"])).to_pylist()[0]
    assert out["n_words"] == 4
    assert out["mean_word_len"] == (2 + 4 + 2 + 3) / 4
    assert out["alpha_word_frac"] == 1.0  # c9 contains an alpha char
    assert out["stopword_hits"] == 1


def test_repetition_stats_values():
    out = RepetitionStats()(
        _batch(
            [
                "a b a b a b",  # bigrams: (a,b)x3 (b,a)x2 -> top 3*2/6 = 1.0
                "x y z w",  # all unique, all bigram counts 1 -> 2/4
                "r r r r s",  # run of 4
                "solo",
                "",
            ]
        )
    ).to_pylist()
    assert out[0]["top_bigram_frac"] == 1.0
    assert out[0]["dup_token_frac"] == (6 - 2) / 6
    assert out[1]["top_bigram_frac"] == 0.5
    assert out[1]["dup_token_frac"] == 0.0
    assert out[1]["max_run_len"] == 1
    assert out[2]["max_run_len"] == 4
    assert out[3] == {
        "doc_id": 3,
        "top_bigram_frac": 0.0,
        "dup_token_frac": 0.0,
        "max_run_len": 1,
    }
    assert out[4]["max_run_len"] == 0


def test_pii_scan_counts_and_redaction():
    text = (
        "mail a.b+c@test.org and d@e.io from 192.168.0.1 call +1555-000-1234 done"
    )
    out = PiiScan()(_batch([text])).to_pylist()[0]
    assert out["n_email"] == 2
    assert out["n_ip"] == 1
    assert out["n_phone"] == 1
    expected = (
        "mail <EMAIL> and <EMAIL> from <IP> call <PHONE> done"
    )
    assert out["redacted_md5"] == hashlib.md5(expected.encode()).hexdigest()


def test_pii_scan_clean_text_untouched():
    text = "no pii here just words 3.14 v2.0"
    out = PiiScan()(_batch([text])).to_pylist()[0]
    assert (out["n_email"], out["n_ip"], out["n_phone"]) == (0, 0, 0)
    assert out["redacted_md5"] == hashlib.md5(text.encode()).hexdigest()
