"""Ray Data stage integration tests on a small deterministic corpus."""

import pyarrow.parquet as pq
import pytest

from fonduer_ray.core.matchers import RegexMatchSpan
from fonduer_ray.core.ngrams import MentionNgrams
from fonduer_ray.pipelines import kg
from fonduer_ray.sources.webpages import generate_corpus, read_webpages
from fonduer_ray.stages.candidate_stage import (
    RelationSpec,
    candidates_table,
    doc_split,
    extract_candidates,
)
from fonduer_ray.stages.feature_stage import feature_key_vocab, featurize
from fonduer_ray.stages.label_stage import label, label_matrix, score
from fonduer_ray.stages.mention_stage import extract_mentions, mentions_table
from fonduer_ray.stages.parse_stage import parse_webpages


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus")
    return generate_corpus(str(out), n_docs=60)


@pytest.fixture(scope="module")
def doc_ds(corpus):
    ds = read_webpages(corpus["corpus"])
    docs = parse_webpages(ds)
    docs = extract_mentions(docs, kg.mention_specs())
    docs = extract_candidates(docs, kg.relation_specs())
    return docs.materialize()


def test_parse_counts(corpus):
    ds = read_webpages(corpus["corpus"])
    docs = parse_webpages(ds).materialize()
    import pyarrow.dataset as pads

    n_in = pads.dataset(corpus["corpus"]).count_rows()
    # empty/faulty docs are dropped; everything else parses
    assert 0 < docs.count() <= n_in
    row = docs.take(1)[0]
    assert row["text"].startswith("<html")
    assert isinstance(row["sentences"], list)


def test_mentions(doc_ds):
    m = mentions_table(doc_ds)
    rows = m.take_all()
    assert rows, "no mentions extracted"
    types = {r["mention_type"] for r in rows}
    assert types == {"part", "temp"}
    assert all(r["stable_id"].startswith(r["doc_name"]) for r in rows[:50])


def test_candidates(doc_ds):
    c = candidates_table(doc_ds)
    rows = c.take_all()
    assert rows
    # throttler: args always share a row or a sentence
    assert all(r["relation"] == "part_temp" for r in rows)
    assert all(len(r["arg_types"]) == 2 for r in rows)
    # dedup: stable ids unique per doc
    seen = set()
    for r in rows:
        key = (r["doc_name"], r["stable_id"])
        assert key not in seen
        seen.add(key)


def test_fig_fig_candidates_not_self_dropped():
    """Two non-span args must compare as real contexts, not None==None: a
    figure-figure relation over 2 figures yields the 2 off-diagonal pairs
    (reference candidates.py:291-306 compares mention .context objects)."""
    from fonduer_ray.core.ngrams import ContextMention, FigureMention
    from fonduer_ray.stages.candidate_stage import CandidateStage

    figs = [{"position": i, "url": f"f{i}.png"} for i in range(2)]
    mentions = [FigureMention("d0", f).to_record(t) for f in figs for t in ("figL", "figR")]
    doc = {"doc_name": "d0", "sentences": [], "mentions": mentions}

    seen_args = []

    def throttler(args):
        seen_args.append(args)
        return True

    stage = CandidateStage(
        [RelationSpec("figfig", ("figL", "figR"), throttler=throttler)]
    )
    cands = stage.extract_doc(doc)
    assert len(cands) == 2
    assert {tuple(c["arg_stable_ids"]) for c in cands} == {
        ("d0::figure_mention:0", "d0::figure_mention:1"),
        ("d0::figure_mention:1", "d0::figure_mention:0"),
    }
    # throttlers receive the reconstructed mention objects, never None
    assert seen_args and all(
        isinstance(a, ContextMention) for pair in seen_args for a in pair
    )


def test_split_deterministic():
    assert doc_split("abc") == doc_split("abc")
    splits = {doc_split(f"d{i}") for i in range(200)}
    assert splits == {0, 1, 2}


def test_featurize_and_vocab(doc_ds):
    f = featurize(doc_ds)
    rows = f.take_all()
    assert rows
    assert all(len(r["keys"]) == len(r["values"]) for r in rows)
    assert all(len(set(r["keys"])) == len(r["keys"]) for r in rows)
    vocab = feature_key_vocab(f)
    assert vocab == sorted(vocab)
    all_keys = set()
    for r in rows:
        all_keys.update(r["keys"])
    assert set(vocab) == all_keys
    # tabular + structural + textual families all present
    assert any(k.startswith("e0_WORD_SEQ_") for k in vocab)
    assert any("ROW_NUM_" in k for k in vocab)
    assert any("ANCESTOR_TAG_" in k for k in vocab)


def test_label_and_score(doc_ds):
    lab = label(doc_ds, kg.default_lfs())
    rows = lab.take_all()
    assert rows
    names = [n for n, _ in kg.default_lfs()]
    assert all(r["keys"] == names for r in rows)
    assert all(all(v in (0, 1, 2) for v in r["values"]) for r in rows)
    ids, mat = label_matrix(lab, names)
    assert mat.shape == (len(rows), len(names))
    assert set(mat.flatten()) <= {-1, 0, 1}
    probs = score(lab).take_all()
    assert all(0.0 <= r["prob"] <= 1.0 for r in probs)


def test_log_odds_trained_scorer(ray_session):
    """Closed-form log-odds fit separates candidates by their feature keys:
    a key perfectly correlated with y gets a positive weight and the scorer
    ranks positives above negatives."""
    import pyarrow as pa

    import ray.data as rd

    from fonduer_ray.stages.train_stage import fit_log_odds, score_log_odds

    n = 200
    rows = pa.table(
        {
            "doc_name": [f"d{i}" for i in range(n)],
            "candidate_stable_id": [f"c{i}" for i in range(n)],
            "keys": [
                ["COMMON", "POS_KEY" if i % 2 == 0 else "NEG_KEY"]
                for i in range(n)
            ],
        }
    )
    feats = rd.from_arrow(rows)
    y = rd.from_arrow(
        pa.table(
            {
                "candidate_stable_id": [f"c{i}" for i in range(n)],
                "y": [1 if i % 2 == 0 else 0 for i in range(n)],
            }
        )
    )
    w, bias = fit_log_odds(feats, y)
    assert w["POS_KEY"] > 0 > w["NEG_KEY"]
    scored = {
        r["candidate_stable_id"]: r["score"]
        for r in score_log_odds(feats, w, bias).take_all()
    }
    assert scored["c0"] > 0.5 > scored["c1"]
    # deterministic: same fit twice -> identical weights
    w2, bias2 = fit_log_odds(feats, y)
    assert w == w2 and bias == bias2

    # the sharded-vocabulary path (weights as a Dataset + hash-partition
    # scoring join) must be BIT-identical to the broadcast path, including
    # a featureless candidate that only the sentinel row keeps alive
    import ray.data as rd2  # noqa: F401 - clarity

    feats_plus = rd.from_arrow(
        pa.concat_tables(
            [
                rows,
                pa.table(
                    {
                        "doc_name": ["dz"],
                        "candidate_stable_id": ["cz"],
                        "keys": pa.array([[]], pa.list_(pa.string())),
                    }
                ),
            ]
        )
    )
    w_ds, bias_ds = fit_log_odds(feats_plus, y, vocab_limit=0)
    assert isinstance(w_ds, rd.Dataset) and bias_ds == bias
    assert {
        (r["key"], r["wt"]) for r in w_ds.take_all()
    } == {(k, v) for k, v in w.items()}
    sharded = {
        r["candidate_stable_id"]: r["score"]
        for r in score_log_odds(feats_plus, w_ds, bias_ds, num_partitions=4).take_all()
    }
    bcast = {
        r["candidate_stable_id"]: r["score"]
        for r in score_log_odds(feats_plus, w, bias).take_all()
    }
    assert sharded == bcast  # float-exact, all 201 candidates present
    assert len(sharded) == n + 1 and "cz" in sharded

    # the y-broadcast fast path (default) and the Dataset.join scale path
    # (forced with y_broadcast_limit=0) must produce identical fits
    w_join, bias_join = fit_log_odds(feats, y, y_broadcast_limit=0)
    assert w_join == w and bias_join == bias


def test_split_train_eval_flow(ray_session, tmp_path_factory):
    """Reference e2e flow (test_e2e.py:271-425): train a discriminative
    scorer on the TRAIN split's LF-derived labels, evaluate on the held-out
    splits — the trained scorer must agree with the LF vote well above
    chance on unseen candidates."""
    import pyarrow as pa

    from fonduer_ray.stages.feature_stage import featurize
    from fonduer_ray.stages.label_stage import label, score
    from fonduer_ray.stages.train_stage import fit_log_odds, score_log_odds

    out = tmp_path_factory.mktemp("train_corpus")
    corpus = generate_corpus(str(out), n_docs=400)
    docs = parse_webpages(read_webpages(corpus["corpus"]))
    docs = extract_mentions(docs, kg.mention_specs())
    docs = extract_candidates(docs, kg.relation_specs()).materialize()

    feats = featurize(docs).materialize()

    # gold label: temp argument >= 100 — learnable through the span's
    # WORD_SEQ/CONTAINS feature keys and transferable across splits
    def to_y(t: pa.Table) -> pa.Table:
        ys = []
        for texts in t["arg_texts"].to_pylist():
            try:
                ys.append(1 if int(texts[1]) >= 100 else 0)
            except (ValueError, IndexError):
                ys.append(0)
        return pa.table(
            {
                "candidate_stable_id": t["stable_id"],
                "y": pa.array(ys, pa.int64()),
            }
        )

    cands = candidates_table(docs).materialize()
    y_all = cands.map_batches(to_y, batch_format="pyarrow").materialize()
    truth = {r["candidate_stable_id"]: bool(r["y"]) for r in y_all.take_all()}
    assert 0 < sum(truth.values()) < len(truth), "labels must vary"

    train_ids = {
        r["candidate_stable_id"]
        for r in feats.filter(expr="split == 0").take_all()
    }
    train_y = y_all.filter(
        fn=lambda r: r["candidate_stable_id"] in train_ids
    )
    w, b = fit_log_odds(feats.filter(expr="split == 0"), train_y, num_partitions=4)
    held = score_log_odds(feats.filter(expr="split > 0"), w, b).take_all()
    assert held, "no held-out candidates"
    agree = sum(
        (r["score"] > 0.5) == truth[r["candidate_stable_id"]] for r in held
    )
    assert agree / len(held) > 0.8


def test_custom_feature_fn_extension(doc_ds):
    """User-extension hook: a custom feature function runs alongside (or
    instead of) the built-in families (reference custom FeatureExtractor,
    feature_extractors.py:36-51)."""

    def my_feats(spans, doc):
        return [f"MY_ARITY_{sum(1 for s in spans if s is not None)}"]

    rows = featurize(doc_ds, feature_fns=[my_feats]).take_all()
    assert rows
    assert all(r["keys"] == ["MY_ARITY_2"] for r in rows)


def test_custom_sentencizer_extension(ray_session):
    """User-extension hook: ParserConfig.sentencizer accepts any object
    with split_sentences (reference custom LingualParser,
    lingual_parser.py:7-46)."""
    from fonduer_ray.parser.parse import ParserConfig, parse_document

    class Exclaim:
        def split_sentences(self, text):
            start = 0
            for part in text.split("!"):
                if part.strip():
                    words = part.split()
                    offs, i = [], 0
                    lead = len(part) - len(part.lstrip())
                    stripped = part.strip()
                    offs = []
                    i = 0
                    for w in words:
                        offs.append(stripped.find(w, i))
                        i = offs[-1] + len(w)
                    yield {
                        "text": stripped,
                        "words": words,
                        "char_offsets": offs,
                        "start": start + lead,
                    }
                start += len(part) + 1

    doc = parse_document(
        "d", b"<html><body><p>hello there! goodbye now</p></body></html>",
        ParserConfig(sentencizer=Exclaim()),
    )
    texts = [s["text"] for s in doc["sentences"]]
    assert texts == ["hello there", "goodbye now"]


def test_parse_error_side_channel(ray_session):
    """Unparseable pages surface on an explicit error side-channel instead of
    the reference's silent drop (parser.py:257-264)."""
    import pyarrow as pa

    import ray.data

    from fonduer_ray.stages.parse_stage import ParseStage, split_errors
    from fonduer_ray.stages.util import map_stage

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": ["ok", "empty", "null"],
                "html": [b"<html><body><p>fine.</p></body></html>", b"", None],
                "lang": ["en", "en", "en"],
            }
        )
    )
    out = map_stage(pages, ParseStage, {"emit_errors": True}, 16)
    docs, errors = split_errors(out)
    assert docs.count() == 1
    err = {r["doc_name"]: r["error"] for r in errors.take_all()}
    assert err["null"] == "null_html"
    assert err["empty"] == "unparseable_html"


def test_morton_interleave16_brute():
    import numpy as np

    from fonduer_ray.stages.materialize import morton_interleave16

    rng = np.random.default_rng(7)
    x = rng.integers(-5, 70000, 200)
    y = rng.integers(-5, 70000, 200)
    got = morton_interleave16(x, y)

    def brute(a, b):
        a &= 0xFFFF
        b &= 0xFFFF
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    want = np.array([brute(int(a), int(b)) for a, b in zip(x, y)])
    np.testing.assert_array_equal(got, want)
    # locality sanity: interleave is a bijection on the 32-bit grid
    assert len(set(got.tolist())) == len(
        {(int(a) & 0xFFFF, int(b) & 0xFFFF) for a, b in zip(x, y)}
    )


def test_bucketed_join_counts_matches_plain_join(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fonduer_ray.stages.materialize import bucketed_join_counts

    rng = np.random.default_rng(5)
    orders = pd.DataFrame(
        {
            "o_orderkey": range(300),
            "o_custkey": rng.integers(0, 40, 300),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": range(40),
            "c_nationkey": rng.integers(0, 5, 40),
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    pq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
    got = (
        bucketed_join_counts(
            str(tmp_path), n_buckets=4, out_root=str(tmp_path / "buckets")
        )
        .to_pandas()
        .sort_values("c_nationkey", ignore_index=True)
    )
    want = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .groupby("c_nationkey")
        .size()
        .rename("n_orders")
        .reset_index()
        .sort_values("c_nationkey", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
