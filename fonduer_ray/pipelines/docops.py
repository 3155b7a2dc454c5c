"""Fonduer-style pipelines over the driver's ``documents`` table, with
SQL-expressible semantics so every stage is oracle-checkable in DuckDB.

The table rows are plain text; ``htmlize`` deterministically wraps every
PARA_TOKENS tokens in a ``<p>`` so the *full* HTML parse path (tree build,
serialize, DFS, sentencizer) is exercised on driver data — and the expected
counts stay closed-form for the oracle (one sentence per paragraph: the
texts contain no sentence delimiter).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count

from fonduer_ray.core.matchers import DictionaryMatch
from fonduer_ray.core.ngrams import MentionNgrams
from fonduer_ray.pipelines.kg import KGConfig
from fonduer_ray.stages.candidate_stage import RelationSpec, candidates_table, extract_candidates
from fonduer_ray.stages.linking import dedup_triples, link_triples
from fonduer_ray.stages.mention_stage import MentionSpec, extract_mentions, mentions_table
from fonduer_ray.stages.parse_stage import parse_webpages

PARA_TOKENS = 10
SUBJ_DICT = ("spark", "hash", "merge", "sort")
OBJ_DICT = ("window", "batch", "stream", "join")
WINDOW = 3
PRED = "cooccurs"

#: docs are CPU-heavy per row (parse/mention/LF), so blocks stay small —
#: 128 rows each — but not Ray's default 2x-CPU split of even a 500-row
#: file (one task dispatch per block in every downstream op)
_DOC_ROWS_PER_BLOCK = 128


def read_docs(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    """Row-count-aware documents read (see relational._read)."""
    from fonduer_ray.stages.util import read_blocks_for

    path = f"{sf_dir}/documents.parquet"
    n = read_blocks_for(path, rows_per_block=_DOC_ROWS_PER_BLOCK)
    if n:
        return ray.data.read_parquet(path, columns=columns, override_num_blocks=n)
    return ray.data.read_parquet(path, columns=columns)


def htmlize(sf_dir: str) -> "ray.data.Dataset":
    """documents(doc_id, text) -> (url, html, lang) pages, PARA_TOKENS tokens
    per ``<p>``."""
    ds = read_docs(sf_dir, ["doc_id", "text"])

    def to_pages(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (text or "").split()
            paras = [
                "<p>" + " ".join(toks[i : i + PARA_TOKENS]) + "</p>"
                for i in range(0, len(toks), PARA_TOKENS)
            ]
            urls.append(str(doc_id))
            htmls.append(("<html><body>" + "".join(paras) + "</body></html>").encode())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


#: session-scoped materialized-view cache for the shared pipeline prefixes
#: (parse -> mentions -> candidates): ~8 driver queries consume the same
#: deterministic parsed corpus, and re-parsing it per query dominated the
#: sweep. Keyed by (ray job id, sf_dir) so a cached Dataset can never
#: outlive the Ray session whose object store holds its blocks.
_PREFIX_CACHE: dict = {}


def _cached(kind: str, sf_dir: str, build) -> "ray.data.Dataset":
    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:  # no session yet — build uncached
        return build()
    # evict entries from prior Ray jobs: their Datasets point at object-store
    # blocks that died with that session, and a long-lived driver process
    # would otherwise accumulate dead handles across sessions
    stale = [k for k in _PREFIX_CACHE if k[0] != job]
    for k in stale:
        del _PREFIX_CACHE[k]
    key = (job, kind, sf_dir)
    ds = _PREFIX_CACHE.get(key)
    if ds is None:
        ds = _PREFIX_CACHE[key] = build().materialize()
    return ds


def parsed_docs(sf_dir: str) -> "ray.data.Dataset":
    return _cached(
        "parsed",
        sf_dir,
        lambda: parse_webpages(htmlize(sf_dir), batch_size=128),
    )


def parse_doc_stats(sf_dir: str) -> "ray.data.Dataset":
    """Golden parse counts per doc — the oracle knows them in closed form."""

    def stats(t: pa.Table) -> pa.Table:
        rows = []
        for doc in t.to_pylist():
            rows.append(
                {
                    "doc_id": int(doc["doc_name"]),
                    "n_paragraphs": len(doc["paragraphs"]),
                    "n_sentences": len(doc["sentences"]),
                    "n_tokens": sum(len(s["words"]) for s in doc["sentences"]),
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_paragraphs", pa.int64()),
                    ("n_sentences", pa.int64()),
                    ("n_tokens", pa.int64()),
                ]
            ),
        )

    return parsed_docs(sf_dir).map_batches(stats, batch_format="pyarrow")


def _mention_specs() -> list[MentionSpec]:
    return [
        MentionSpec("subj", MentionNgrams(1, 1), DictionaryMatch(d=SUBJ_DICT)),
        MentionSpec("obj", MentionNgrams(1, 1), DictionaryMatch(d=OBJ_DICT)),
    ]


def mention_docs(sf_dir: str) -> "ray.data.Dataset":
    return extract_mentions(parsed_docs(sf_dir), _mention_specs(), batch_size=128)


def _mention_count_query(
    sf_dir: str, specs: list[MentionSpec]
) -> "ray.data.Dataset":
    """(doc_id, mention, n_mentions) through the real parse+mention stages
    for arbitrary mention specs."""
    m = mentions_table(extract_mentions(parsed_docs(sf_dir), specs, batch_size=128))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(d) for d in t["doc_name"].to_pylist()], pa.int64()
                ),
                "mention": t["text"],
            }
        )

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["doc_id", "mention"], sort=False)
            .size()
            .reset_index(name="n_mentions")
        )

    return hash_groupby(m.map_batches(prep, batch_format="pyarrow"), ["doc_id", "mention"], agg)


def mention_counts(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, mention, n_mentions) via the real mention stage."""
    return _mention_count_query(sf_dir, _mention_specs())


def union_mentions(sf_dir: str) -> "ray.data.Dataset":
    """Matcher-algebra Union (reference ``matchers.py:158-168``): one spec
    whose matcher is ``Union(Dict(SUBJ), Dict(OBJ))``."""
    from fonduer_ray.core.matchers import Union

    spec = MentionSpec(
        "any",
        MentionNgrams(1, 1),
        Union(DictionaryMatch(d=SUBJ_DICT), DictionaryMatch(d=OBJ_DICT)),
    )
    return _mention_count_query(sf_dir, [spec])


def intersect_mentions(sf_dir: str) -> "ray.data.Dataset":
    """Matcher-algebra Intersect: dictionary AND regex ``s.*`` (anchored
    full-match wrap, reference ``matchers.py:171-181, 283-361``)."""
    from fonduer_ray.core.matchers import Intersect, RegexMatchSpan

    spec = MentionSpec(
        "s_word",
        MentionNgrams(1, 1),
        Intersect(
            DictionaryMatch(d=SUBJ_DICT + OBJ_DICT), RegexMatchSpan(rgx=r"s.*")
        ),
    )
    return _mention_count_query(sf_dir, [spec])


def inverse_mentions(sf_dir: str) -> "ray.data.Dataset":
    """Matcher-algebra Inverse: regex ``s.*`` AND NOT in the subject
    dictionary (reference ``matchers.py:184-208``)."""
    from fonduer_ray.core.matchers import Intersect, Inverse, RegexMatchSpan

    spec = MentionSpec(
        "s_not_subj",
        MentionNgrams(1, 1),
        Intersect(RegexMatchSpan(rgx=r"s.*"), Inverse(DictionaryMatch(d=SUBJ_DICT))),
    )
    return _mention_count_query(sf_dir, [spec])


def concat_mentions(sf_dir: str) -> "ray.data.Dataset":
    """Matcher-algebra Concat over bigrams: left half in SUBJ, right half
    in OBJ, adjacent within one sentence (reference ``matchers.py:211-280``)."""
    from fonduer_ray.core.matchers import Concat

    spec = MentionSpec(
        "subj_obj_pair",
        MentionNgrams(2, 2),
        Concat(DictionaryMatch(d=SUBJ_DICT), DictionaryMatch(d=OBJ_DICT)),
    )
    return _mention_count_query(sf_dir, [spec])


def _throttler(spans) -> bool:
    a, b = spans
    return (
        a.sentence["position"] == b.sentence["position"]
        and abs(a.get_word_start_index() - b.get_word_start_index()) <= WINDOW
    )


def _relation_specs() -> list[RelationSpec]:
    return [RelationSpec("cooccur", ("subj", "obj"), throttler=_throttler)]


def candidate_docs(sf_dir: str) -> "ray.data.Dataset":
    return _cached(
        "candidates",
        sf_dir,
        lambda: extract_candidates(
            mention_docs(sf_dir), _relation_specs(), batch_size=128
        ),
    )


def candidate_counts(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_candidates) after the same-sentence +/-WINDOW throttler."""
    c = candidates_table(candidate_docs(sf_dir))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(d) for d in t["doc_name"].to_pylist()], pa.int64()
                )
            }
        )

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", sort=False).size().reset_index(name="n_candidates")

    return hash_groupby(c.map_batches(prep, batch_format="pyarrow"), ["doc_id"], agg)


def _lf_cooccur(view) -> int:
    return 1


# -- labeling-function suite with SQL-expressible semantics ----------------
# Sparse storage follows the reference conversion (labeler.py:420-495):
# y=None -> 0 (abstain), y=-1 -> 0, y=0 -> 1 (a -1 VOTE in the scorer),
# y=1 -> 2 (+1 vote).

def _lf_adjacent(view) -> int | None:
    """+1 when the two mentions are adjacent tokens, else abstain."""
    d = abs(view[0].get_word_start_index() - view[1].get_word_start_index())
    return 1 if d <= 1 else None


def _lf_subj_first(view) -> int | None:
    """+1 when subj precedes obj; -1 (stored 0 = abstain-in-scorer) else."""
    return 1 if view[0].get_word_start_index() < view[1].get_word_start_index() else -1


def _lf_far(view) -> int | None:
    """0 (a -1 vote) when the pair sits at the max throttler distance."""
    d = abs(view[0].get_word_start_index() - view[1].get_word_start_index())
    return 0 if d == WINDOW else None


def _docops_lfs():
    return [
        ("lf_adjacent", _lf_adjacent),
        ("lf_subj_first", _lf_subj_first),
        ("lf_far", _lf_far),
    ]


def lf_label_counts(sf_dir: str) -> "ray.data.Dataset":
    """Global LF vote histogram: (lf_name, value, n) over every candidate —
    exercises the labeler stage end-to-end (sparse int encoding included)."""
    from fonduer_ray.stages.label_stage import label

    lab = label(candidate_docs(sf_dir), _docops_lfs(), batch_size=128)

    def explode(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for keys, values in zip(t["keys"].to_pylist(), t["values"].to_pylist()):
            names.extend(keys)
            vals.extend(values)
        return pa.table(
            {
                "lf_name": pa.array(names, pa.string()),
                "value": pa.array(vals, pa.int64()),
            }
        )

    return (
        lab.map_batches(explode, batch_format="pyarrow")
        .groupby(["lf_name", "value"])
        .aggregate(Count(alias_name="n"))
    )


def lf_marginals_by_doc(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc LF-vote marginal summary: (doc_id, n_candidates, min_prob,
    max_prob) — exercises labeler + VoteScorer (the LF-style scorer
    replacing the reference's trained discriminative model). Min/max are
    order-independent so the float comparison against the SQL oracle is
    exact (a mean would depend on summation order)."""
    from fonduer_ray.stages.label_stage import label, score

    sc = score(label(candidate_docs(sf_dir), _docops_lfs(), batch_size=128))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(d) for d in t["doc_name"].to_pylist()], pa.int64()
                ),
                "prob": t["prob"],
            }
        )

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("doc_id", sort=False)
            .agg(
                n_candidates=("prob", "size"),
                min_prob=("prob", "min"),
                max_prob=("prob", "max"),
            )
            .reset_index()
        )

    return hash_groupby(sc.map_batches(prep, batch_format="pyarrow"), ["doc_id"], agg)


def entity_support_counts(sf_dir: str) -> "ray.data.Dataset":
    """(norm, support) per canonical entity across all scored triples —
    the explicitly SALTED two-phase aggregate (linking.entity_support)."""
    from fonduer_ray.stages.fused import pages_to_triples
    from fonduer_ray.stages.linking import entity_support

    t = pages_to_triples(
        htmlize(sf_dir),
        _mention_specs(),
        _relation_specs(),
        [("lf_cooccur", _lf_cooccur)],
        pred_names={"cooccur": PRED},
        threshold=0.6,
        batch_size=128,
    )
    linked = link_triples(t, n_salts=KGConfig().n_salts)
    return entity_support(linked, n_salts=KGConfig().n_salts)


def triples_via_spec(sf_dir: str) -> "ray.data.Dataset":
    """Same KG construction as ``triples`` but driven entirely through the
    declarative pipeline spec (``pipelines/spec.py``) — proves the config
    surface produces identical results (shares the ``triples_kg`` oracle)."""
    from fonduer_ray.pipelines import spec as S

    S.THROTTLERS.setdefault("docops_same_sentence_window", _throttler)
    S.LFS.setdefault("docops_lf_cooccur", _lf_cooccur)
    pipeline_spec = {
        "mentions": [
            {
                "name": "subj",
                "space": {"type": "ngrams", "n_min": 1, "n_max": 1},
                "matcher": {"type": "dictionary", "d": list(SUBJ_DICT)},
            },
            {
                "name": "obj",
                "space": {"type": "ngrams", "n_min": 1, "n_max": 1},
                "matcher": {"type": "dictionary", "d": list(OBJ_DICT)},
            },
        ],
        "relations": [
            {
                "name": "cooccur",
                "args": ["subj", "obj"],
                "throttler": "docops_same_sentence_window",
            }
        ],
        "lfs": ["docops_lf_cooccur"],
        "pred_names": {"cooccur": PRED},
        "threshold": 0.6,
    }
    out = S.run_spec(htmlize(sf_dir), pipeline_spec)
    return out.select_columns(["subj", "pred", "obj", "support"])


#: driver-session cache of materialized intermediates shared by the
#: feature-family queries (feature_keys / feature_stats / logreg_scores all
#: need the same featurized candidates; re-running the parse+extract+
#:featurize DAG per query triples the work). Object-store backed, keyed by
#: (stage, sf_dir); harmless for one-shot runs, a 3x saver for the driver.
_MATERIALIZED: dict = {}


def _cached_ds(key: tuple, build) -> "ray.data.Dataset":
    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        return build()
    stale = [k for k in _MATERIALIZED if k[0] != job]
    for k in stale:
        del _MATERIALIZED[k]
    key = (job, *key)
    ds = _MATERIALIZED.get(key)
    if ds is None:
        ds = build().materialize()
        _MATERIALIZED[key] = ds
    return ds


def _cached_feats(sf_dir: str) -> "ray.data.Dataset":
    from fonduer_ray.stages.feature_stage import featurize

    cand = _cached_ds(("cand", sf_dir), lambda: candidate_docs(sf_dir))
    return _cached_ds(("feats", sf_dir), lambda: featurize(cand, batch_size=128))


def feature_keys(sf_dir: str) -> pa.Table:
    """Global sorted feature-key vocabulary over all candidates (the
    engine's FeatureKey analog; deterministic order)."""
    from fonduer_ray.stages.feature_stage import feature_key_vocab

    vocab = feature_key_vocab(_cached_feats(sf_dir))
    return pa.table({"key": pa.array(vocab, pa.string())})


def feature_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc featurization stats: (doc_id, n_candidates, n_keys)."""
    feats = _cached_feats(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(d) for d in t["doc_name"].to_pylist()], pa.int64()
                ),
                "n_keys": pa.array(
                    [len(k) for k in t["keys"].to_pylist()], pa.int64()
                ),
            }
        )

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("doc_id", sort=False)
            .agg(n_candidates=("n_keys", "size"), n_keys=("n_keys", "sum"))
            .reset_index()
        )

    return hash_groupby(feats.map_batches(prep, batch_format="pyarrow"), ["doc_id"], agg)


def htmlize_cased(sf_dir: str) -> "ray.data.Dataset":
    """Like ``htmlize`` but deterministically title-cases every token whose
    1-based doc position satisfies ``i % 5 == 2`` — a closed-form corpus for
    exercising the heuristic NER tagger + NER-preset matchers (the engine's
    PERSON rule fires on capitalized non-sentence-initial alpha tokens)."""
    ds = read_docs(sf_dir, ["doc_id", "text"])

    def to_pages(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (text or "").split()
            toks = [
                w[:1].upper() + w[1:] if (i + 1) % 5 == 2 else w
                for i, w in enumerate(toks)
            ]
            paras = [
                "<p>" + " ".join(toks[i : i + PARA_TOKENS]) + "</p>"
                for i in range(0, len(toks), PARA_TOKENS)
            ]
            urls.append(str(doc_id))
            htmls.append(("<html><body>" + "".join(paras) + "</body></html>").encode())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def ner_person_mentions(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, mention, n): PERSON mentions via the NER-preset matcher
    (RegexMatchEach over the heuristic tagger's ner_tags) on the
    deterministically title-cased corpus."""
    from fonduer_ray.core.matchers import PersonMatcher

    docs = parse_webpages(htmlize_cased(sf_dir), batch_size=128)
    docs = extract_mentions(
        docs,
        [MentionSpec("person", MentionNgrams(1, 1), PersonMatcher())],
        batch_size=128,
    )
    m = mentions_table(docs)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(d) for d in t["doc_name"].to_pylist()], pa.int64()
                ),
                "mention": t["text"],
            }
        )

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["doc_id", "mention"], sort=False)
            .size()
            .reset_index(name="n")
        )

    return hash_groupby(m.map_batches(prep, batch_format="pyarrow"), ["doc_id", "mention"], agg)


def hocrize(sf_dir: str) -> "ray.data.Dataset":
    """documents -> deterministic hOCR pages: one ocr_line per PARA_TOKENS
    tokens; line k spans y [20k, 20k+18]; word m in line k spans x
    [10k + 60m, 10k + 60m + 50]; single page (ppageno 0 -> page 1)."""
    from fonduer_ray.sources.preprocessors import hocr_to_html

    ds = read_docs(sf_dir, ["doc_id", "text"])

    def to_pages(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (text or "").split()
            lines = []
            for k, i in enumerate(range(0, len(toks), PARA_TOKENS)):
                block = toks[i : i + PARA_TOKENS]
                top, bottom = 20 * k, 20 * k + 18
                words = "".join(
                    f'<span class="ocrx_word" title="bbox {10*k + 60*m} {top} '
                    f'{10*k + 60*m + 50} {bottom}">{w}</span>'
                    for m, w in enumerate(block)
                )
                right = 10 * k + 60 * (len(block) - 1) + 50
                lines.append(
                    f'<span class="ocr_line" title="bbox {10*k} {top} {right} '
                    f'{bottom}">{words}</span>'
                )
            hocr = (
                '<html><body><div class="ocr_page" title="image x; bbox 0 0 '
                '5000 5000; ppageno 0"><p class="ocr_par">'
                + "".join(lines)
                + "</p></div></body></html>"
            )
            urls.append(str(doc_id))
            htmls.append(hocr_to_html(hocr).encode())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def hocr_visual_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc word-bbox aggregates through the FULL hOCR visual path
    (hocr_to_html bbox hoisting -> parse -> attach_word_bboxes):
    (doc_id, n_sentences, n_words, sum_left, sum_top, max_right) — every
    value derives from per-word boxes the visual stage attached, and the
    oracle knows the layout in closed form."""
    from fonduer_ray.parser.visual import parse_visual

    docs = parse_visual(parse_webpages(hocrize(sf_dir), batch_size=128))

    def stats(t: pa.Table) -> pa.Table:
        rows = []
        for doc in t.to_pylist():
            boxed = [s for s in doc["sentences"] if s.get("page")]
            rows.append(
                {
                    "doc_id": int(doc["doc_name"]),
                    "n_sentences": len(boxed),
                    "n_words": sum(len(s["page"]) for s in boxed),
                    "sum_left": sum(sum(s["left"]) for s in boxed),
                    "sum_top": sum(sum(s["top"]) for s in boxed),
                    "max_right": max(
                        (max(s["right"]) for s in boxed), default=0
                    ),
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_sentences", pa.int64()),
                    ("n_words", pa.int64()),
                    ("sum_left", pa.int64()),
                    ("sum_top", pa.int64()),
                    ("max_right", pa.int64()),
                ]
            ),
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def htmlize_boiler(sf_dir: str) -> "ray.data.Dataset":
    """Pages with deterministic boilerplate around the content: a <nav>
    with one menu token per paragraph, a <footer> with three tokens —
    the fixture for the boilerplate-removal operator."""
    ds = read_docs(sf_dir, ["doc_id", "text"])

    def to_pages(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (text or "").split()
            n_paras = (len(toks) + PARA_TOKENS - 1) // PARA_TOKENS
            nav = (
                "<nav><p>"
                + " ".join(f"menu{k}" for k in range(n_paras))
                + "</p></nav>"
            )
            paras = [
                "<p>" + " ".join(toks[i : i + PARA_TOKENS]) + "</p>"
                for i in range(0, len(toks), PARA_TOKENS)
            ]
            footer = "<footer><p>contact legal privacy</p></footer>"
            urls.append(str(doc_id))
            htmls.append(
                ("<html><body>" + nav + "".join(paras) + footer + "</body></html>").encode()
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def boilerplate_stats(sf_dir: str) -> "ray.data.Dataset":
    """Boilerplate removal (the content-extraction step of a web training
    pipeline): sentences whose xpath passes through nav/footer/aside/header
    are boilerplate; everything else is content. Pure per-doc transform
    over the parsed context tree. Columns: ``(doc_id, n_content_tokens,
    n_boiler_tokens, n_content_sentences)``."""
    import re as _re

    _BOILER = _re.compile(r"/(nav|footer|aside|header)(\[|/|$)")
    docs = parse_webpages(htmlize_boiler(sf_dir), batch_size=128)

    def stats(t: pa.Table) -> pa.Table:
        rows = []
        for doc in t.to_pylist():
            content = boiler = n_sent = 0
            for s in doc["sentences"]:
                n = len(s["words"])
                if _BOILER.search(s.get("xpath") or ""):
                    boiler += n
                else:
                    content += n
                    n_sent += 1
            rows.append(
                {
                    "doc_id": int(doc["doc_name"]),
                    "n_content_tokens": content,
                    "n_boiler_tokens": boiler,
                    "n_content_sentences": n_sent,
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_content_tokens", pa.int64()),
                    ("n_boiler_tokens", pa.int64()),
                    ("n_content_sentences", pa.int64()),
                ]
            ),
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def pdf_visual_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc word-bbox aggregates through the FULL native PDF visual path
    (generate a deterministic text-layer PDF per doc -> pdf_extract_words
    -> 3-pass linker -> attach): word m of paragraph k is drawn at
    x=72+40m, y=700-20k, size 10 -> top=82+20k, right=left+6*len(word).
    Output: (doc_id, n_words, sum_left, sum_top, sum_right, max_bottom)."""
    from fonduer_ray.sources.pdf import attach_pdf_bboxes, generate_simple_pdf

    docs = parsed_docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        rows = []
        for doc in t.to_pylist():
            cmds = []
            for k, s in enumerate(sorted(doc["sentences"], key=lambda x: x["position"])):
                for m, w in enumerate(s["words"]):
                    cmds.append((w, 72 + 40 * m, 700 - 20 * k, 10))
            attach_pdf_bboxes(doc, generate_simple_pdf([cmds]))
            boxed = [s for s in doc["sentences"] if s.get("page")]
            rows.append(
                {
                    "doc_id": int(doc["doc_name"]),
                    "n_words": sum(len(s["page"]) for s in boxed),
                    "sum_left": sum(sum(s["left"]) for s in boxed),
                    "sum_top": sum(sum(s["top"]) for s in boxed),
                    "sum_right": sum(sum(s["right"]) for s in boxed),
                    "max_bottom": max(
                        (max(s["bottom"]) for s in boxed), default=0
                    ),
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_words", pa.int64()),
                    ("sum_left", pa.int64()),
                    ("sum_top", pa.int64()),
                    ("sum_right", pa.int64()),
                    ("max_bottom", pa.int64()),
                ]
            ),
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def logreg_scores(sf_dir: str) -> "ray.data.Dataset":
    """Trained discriminative scorer end-to-end: featurize -> LF-derived
    labels (vote sum > 0) -> distributed closed-form log-odds fit ->
    broadcast-weight scoring; per-doc (doc_id, n_candidates, min_score,
    max_score) so the float compare is order-independent."""
    from fonduer_ray.stages.label_stage import label, score
    from fonduer_ray.stages.train_stage import fit_log_odds, score_log_odds

    cand = _cached_ds(("cand", sf_dir), lambda: candidate_docs(sf_dir))
    feats = _cached_feats(sf_dir)

    sc = score(label(cand, _docops_lfs(), batch_size=128))

    def to_y(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "candidate_stable_id": t["candidate_stable_id"],
                "y": pa.array(
                    [1 if p > 0.5 else 0 for p in t["prob"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    y_ds = sc.map_batches(to_y, batch_format="pyarrow")
    weights, bias = fit_log_odds(feats, y_ds)
    scored = score_log_odds(feats, weights, bias)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(d) for d in t["doc_name"].to_pylist()], pa.int64()
                ),
                "score": t["score"],
            }
        )

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("doc_id", sort=False)
            .agg(
                n_candidates=("score", "size"),
                min_score=("score", "min"),
                max_score=("score", "max"),
            )
            .reset_index()
        )

    return hash_groupby(scored.map_batches(prep, batch_format="pyarrow"), ["doc_id"], agg)


def triples(sf_dir: str) -> "ray.data.Dataset":
    """Full KG path on driver data: candidates -> LF score -> canonicalize
    (salted) -> dedup; returns (subj, pred, obj, support). Doc-local steps
    run fused in one actor pool (see ``stages/fused.py``)."""
    from fonduer_ray.stages.fused import pages_to_triples

    from fonduer_ray.stages.linking import canonicalize_triples

    t = pages_to_triples(
        htmlize(sf_dir),
        _mention_specs(),
        _relation_specs(),
        [("lf_cooccur", _lf_cooccur)],
        pred_names={"cooccur": PRED},
        threshold=0.6,
        batch_size=128,
    )
    deduped = canonicalize_triples(t, n_salts=KGConfig().n_salts)
    return deduped.select_columns(["subj", "pred", "obj", "support"])


class _JpegStatsStage:
    """Deterministic JPEG fixture -> real decode -> closed-form stats.

    Each doc_id derives a uniform-gray baseline JPEG (dims ``16+(id%4)*8 x
    16+(id%3)*8``, color ``id%256``, q=90). Uniform images are DC-only and
    the DC quant step at q=90 keeps the error under half a level, so the
    decode is EXACT — width/height/mean are SQL-expressible in the oracle.
    Encode + decode both run inside the stage (one pass, no payload
    shuffle); the multimodal stage signatures are covered by tests."""

    def __init__(self, quality: int = 90):
        self.quality = quality

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from fonduer_ray.functions import codecs
        from fonduer_ray.functions.jpeg import jpeg_encode

        ids, ws, hs, means = [], [], [], []
        for doc_id in t["doc_id"].to_pylist():
            w = 16 + (doc_id % 4) * 8
            h = 16 + (doc_id % 3) * 8
            c = doc_id % 256
            img = np.full((h, w), c, dtype=np.uint8)
            out, mode = codecs.image_decode(jpeg_encode(img, quality=self.quality))
            ids.append(doc_id)
            hs.append(out.shape[0])
            ws.append(out.shape[1])
            means.append(int(out.mean()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "mean_pixel": pa.array(means, pa.int64()),
            }
        )


def jpeg_decode_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, width, height, mean_pixel) through the real baseline-JPEG
    encode->decode path (``functions/jpeg.py``), oracle-checked in closed
    form against the doc_id-derived fixture parameters."""
    from fonduer_ray.stages.util import map_stage

    ds = read_docs(sf_dir, ["doc_id"])
    return map_stage(ds, _JpegStatsStage, {}, 64)


class _VideoStatsStage:
    """Deterministic MJPEG-AVI fixture -> real container parse + frame
    sample + JPEG decode -> closed-form stats.

    Each doc_id derives an AVI of ``3 + id%3`` uniform-gray frames (dims
    ``16+(id%4)*8 x 16+(id%3)*8``, frame i colored ``(id + 7*i) % 256``,
    q=90); sampling takes every 2nd frame via the RIFF 'idx1' index
    (``functions/avi.py``). Uniform frames are DC-only so each decode is
    EXACT and the per-doc (sampled count, dims, color sum) are
    SQL-expressible in the oracle."""

    def __init__(self, every_n: int = 2, quality: int = 90):
        self.every_n = every_n
        self.quality = quality

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from fonduer_ray.functions.avi import (
            avi_decode_frame,
            avi_encode_mjpeg,
            avi_parse,
        )

        ids, counts, ws, hs, sums = [], [], [], [], []
        for doc_id in t["doc_id"].to_pylist():
            w = 16 + (doc_id % 4) * 8
            h = 16 + (doc_id % 3) * 8
            n = 3 + doc_id % 3
            frames = [
                np.full((h, w), (doc_id + 7 * i) % 256, dtype=np.uint8)
                for i in range(n)
            ]
            data = avi_encode_mjpeg(frames, fps=10, quality=self.quality)
            meta = avi_parse(data)
            color_sum = 0
            sampled = 0
            for fi in range(0, len(meta["frames"]), self.every_n):
                img = avi_decode_frame(data, meta["frames"][fi])
                color_sum += int(img.mean())
                sampled += 1
            ids.append(doc_id)
            counts.append(sampled)
            ws.append(meta["width"])
            hs.append(meta["height"])
            sums.append(color_sum)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sampled_frames": pa.array(counts, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "color_sum": pa.array(sums, pa.int64()),
            }
        )


def video_frame_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, sampled_frames, width, height, color_sum) through the real
    MJPEG-AVI container + baseline-JPEG decode path (``functions/avi.py``),
    oracle-checked in closed form against the doc_id-derived fixtures."""
    from fonduer_ray.stages.util import map_stage

    ds = read_docs(sf_dir, ["doc_id"])
    return map_stage(ds, _VideoStatsStage, {}, 32)


def triples_incremental(sf_dir: str) -> "ray.data.Dataset":
    """Incremental KG construction — the reference's ``clear=False``
    re-apply path (``featurizer.py:65-146``, ``labeler.py:72-115``,
    ``tests/e2e/test_incremental.py``) re-expressed as immutable
    generations: extraction runs as TWO generations over disjoint url
    halves appended to an upsert store keyed by ``candidate_stable_id``
    (``materialize.append_generation``), plus the second half appended
    AGAIN (a re-crawl whose rows must upsert, not duplicate);
    ``read_upserted`` keeps the newest generation per candidate and the
    GLOBAL canonicalization runs at read over the merged store. Because
    doc-local extraction is pure per document and canonicalization sees
    the identical candidate multiset, the result is value-identical to
    the batch ``triples`` — it shares that query's oracle, which is the
    incremental-equals-batch correctness gate."""
    import shutil
    import tempfile

    from fonduer_ray.stages.fused import pages_to_triples
    from fonduer_ray.stages.linking import canonicalize_triples
    from fonduer_ray.stages.materialize import append_generation, read_upserted

    pages = htmlize(sf_dir)

    def half(parity: int) -> "ray.data.Dataset":
        def f(t: pa.Table) -> pa.Table:
            mask = pa.array(
                [int(u) % 2 == parity for u in t["url"].to_pylist()]
            )
            return t.filter(mask)

        return pages.map_batches(f, batch_format="pyarrow")

    def extract(parity: int) -> "ray.data.Dataset":
        return pages_to_triples(
            half(parity),
            _mention_specs(),
            _relation_specs(),
            [("lf_cooccur", _lf_cooccur)],
            pred_names={"cooccur": PRED},
            threshold=0.6,
            batch_size=128,
        )

    out = tempfile.mkdtemp(prefix="fonduer_ray_kg_incr_")
    try:
        append_generation(extract(0), out, "candidate_stable_id")
        # materialize the second half once: the simulated re-crawl appends
        # the SAME rows as a newer generation (dedup-on-read must collapse
        # them) — re-running the extraction for identical output would just
        # triple the doc-pipeline cost
        gen1 = extract(1).materialize()
        append_generation(gen1, out, "candidate_stable_id")
        append_generation(gen1, out, "candidate_stable_id")
        merged = read_upserted(out, "candidate_stable_id").materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)

    deduped = canonicalize_triples(merged, n_salts=KGConfig().n_salts)
    return deduped.select_columns(["subj", "pred", "obj", "support"])


def warc_roundtrip_stats(sf_dir: str) -> "ray.data.Dataset":
    """Common-Crawl container round-trip as a driver-visible operator: the
    documents table renders to pages, writes out as spec-conformant WARC
    (per-record gzip members, ``sources/warc.py``), reads back through the
    WARC source, and reports ``(doc_id, html_md5, ts_us)`` — the html md5
    and the microsecond timestamp prove byte- and field-exact round-trip
    (the oracle rebuilds the page html from the text column in SQL).
    Timestamps are ``2020-01-01 + doc_id seconds``."""
    import glob
    import hashlib
    import shutil
    import tempfile

    from fonduer_ray.sources.warc import read_warc, write_warc

    pages = htmlize(sf_dir)
    base_us = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z

    def add_cols(t: pa.Table) -> pa.Table:
        ids = [int(u) for u in t["url"].to_pylist()]
        ts = [base_us + i * 1_000_000 for i in ids]
        return t.append_column(
            "warc_ts", pa.array(ts, pa.timestamp("us"))
        ).append_column("text", pa.array([""] * len(ids), pa.string()))

    out = tempfile.mkdtemp(prefix="fonduer_ray_warc_rt_")
    try:
        write_warc(pages.map_batches(add_cols, batch_format="pyarrow"), out)
        back = read_warc(sorted(glob.glob(f"{out}/*.warc.gz")))

        def stats(t: pa.Table) -> pa.Table:
            from datetime import timezone

            ids, digests, tss = [], [], []
            for url, html, ts in zip(
                t["url"].to_pylist(),
                t["html"].to_pylist(),
                t["warc_ts"].to_pylist(),
            ):
                ids.append(int(url))
                digests.append(hashlib.md5(html or b"").hexdigest())
                if hasattr(ts, "timestamp"):
                    # naive datetime from Arrow timestamp("us") — WARC
                    # dates are UTC; pin before .timestamp() so the
                    # result doesn't depend on the process timezone.
                    if ts.tzinfo is None:
                        ts = ts.replace(tzinfo=timezone.utc)
                    tss.append(int(ts.timestamp() * 1_000_000))
                else:
                    tss.append(int(ts))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "html_md5": pa.array(digests, pa.string()),
                    "ts_us": pa.array(tss, pa.int64()),
                }
            )

        result = back.map_batches(stats, batch_format="pyarrow").materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return result


# -- gold-label annotation ---------------------------------------------------

#: gold window is WIDER than the candidate throttler's (some gold pairs are
#: unreachable by extraction -> real false negatives) and md5-halved (some
#: predicted pairs are not gold -> real false positives)
GOLD_WINDOW = 5


def _gold_entities(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic external-gold stand-in: distinct (doc_id, subj, obj)
    token pairs within one PARA_TOKENS block at distance <= GOLD_WINDOW,
    kept when md5_64(f"{doc_id}:{subj}:{obj}") is even — the synthesis a
    reference user's hand-curated gold CSV plays in the e2e tests
    (``tests/shared/hardware_utils.py:28-56`` loads exactly such an
    entity-tuple table). Derived per doc row, so 'distinct' needs no
    shuffle: one doc's text lives in one row."""
    from fonduer_ray.functions.dedup import _md5_64

    ds = read_docs(sf_dir, ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        docs, subjs, objs = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (text or "").split()
            seen: set[tuple[str, str]] = set()
            subj_pos = [
                (i, w) for i, w in enumerate(toks) if w in SUBJ_DICT
            ]
            obj_pos = [(i, w) for i, w in enumerate(toks) if w in OBJ_DICT]
            for ia, wa in subj_pos:
                for ib, wb in obj_pos:
                    if ia // PARA_TOKENS != ib // PARA_TOKENS:
                        continue
                    if abs(ia - ib) > GOLD_WINDOW:
                        continue
                    seen.add((wa, wb))
            for wa, wb in sorted(seen):
                if _md5_64(f"{doc_id}:{wa}:{wb}") % 2 == 0:
                    docs.append(int(doc_id))
                    subjs.append(wa)
                    objs.append(wb)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "subj": pa.array(subjs, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def gold_label_eval(sf_dir: str) -> "ray.data.Dataset":
    """First-class gold-label path (reference ``supervision/labeler.py``
    ``table=GoldLabel`` + ``hardware_utils.entity_level_f1``): candidates
    from the REAL parse->mention->candidate stages collapse to distinct
    entity tuples, an external gold entity table joins on via
    :func:`fonduer_ray.stages.gold.attach_gold_labels` (size-guarded
    broadcast vs hash join), and the entity-level confusion aggregates
    per doc. Columns: ``(doc_id, n_pred, n_gold, n_tp)``."""
    import pandas as pd

    from fonduer_ray.stages.gold import attach_gold_labels, entity_confusion
    from fonduer_ray.stages.util import hash_groupby

    cands = candidates_table(candidate_docs(sf_dir))

    def prep(t: pa.Table) -> pa.Table:
        docs, subjs, objs = [], [], []
        for doc_name, texts in zip(
            t["doc_name"].to_pylist(), t["arg_texts"].to_pylist()
        ):
            docs.append(int(doc_name))
            subjs.append(texts[0])
            objs.append(texts[1])
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "subj": pa.array(subjs, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(ignore_index=True)

    pred = hash_groupby(
        cands.map_batches(prep, batch_format="pyarrow"),
        ["doc_id", "subj", "obj"],
        distinct,
    )
    gold = _gold_entities(sf_dir)
    labeled = attach_gold_labels(pred, gold, ["doc_id", "subj", "obj"])
    return entity_confusion(labeled, gold)


#: EM iterations for the e2e weak-supervision gate — small enough that the
#: DuckDB oracle can unroll the loop in closed form, large enough that the
#: LF accuracies genuinely move off their 0.7 init (the fit IS exercised)
E2E_LM_ITERS = 3


# -- e2e-gate LF trio: unlike _docops_lfs (whose votes are nearly all
# positive, collapsing EM to a single class and the discriminative fit to
# the majority shortcut), these three cast REAL negative votes (y=0 ->
# sparse 1), so the Dawid-Skene latent splits into two populated classes
# and the log-odds fit has both counts to learn from.

def _lf_e2e_near(view) -> int | None:
    """+1 adjacent, -vote at max throttler distance, abstain between."""
    d = abs(view[0].get_word_start_index() - view[1].get_word_start_index())
    return 1 if d <= 1 else (0 if d >= WINDOW else None)


def _lf_e2e_order(view) -> int:
    """+1 when subj precedes obj, else a -vote; never abstains."""
    return (
        1
        if view[0].get_word_start_index() < view[1].get_word_start_index()
        else 0
    )


def _lf_e2e_gap2(view) -> int | None:
    """-vote at distance exactly 2, abstain otherwise."""
    d = abs(view[0].get_word_start_index() - view[1].get_word_start_index())
    return 0 if d == 2 else None


def _e2e_lfs():
    return [
        ("lf_e2e_near", _lf_e2e_near),
        ("lf_e2e_order", _lf_e2e_order),
        ("lf_e2e_gap2", _lf_e2e_gap2),
    ]


def _split_of_docs(ds: "ray.data.Dataset", split: int) -> "ray.data.Dataset":
    """Keep rows whose ``doc_id`` hashes into the given train/dev/test
    split under the candidate stage's ``doc_split`` assignment."""
    from fonduer_ray.stages.candidate_stage import doc_split

    def keep(t: pa.Table) -> pa.Table:
        mask = pa.array(
            [doc_split(str(d)) == split for d in t["doc_id"].to_pylist()]
        )
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def e2e_weak_supervision(sf_dir: str) -> pa.Table:
    """The reference's e2e weak-supervision CI gate composed as ONE
    pipeline (``tests/e2e/test_e2e.py:271-425`` +
    ``tests/shared/hardware_utils.py:71-131``): LFs label the split-0
    (train) candidates, a Dawid-Skene :class:`LabelModel` fits
    ``E2E_LM_ITERS`` EM rounds over the sparse votes, its posteriors
    threshold into training labels, a closed-form log-odds discriminative
    model fits on the split-0 features, scores the HELD-OUT split-1 (dev)
    candidates, and the kept (score > 0.5) predictions evaluate
    entity-level against the synthetic gold table on split-1 docs.

    Returns one global row ``(n_pred, n_gold, n_tp, f1_cents)`` with
    ``f1_cents = (200 * tp) // (n_pred + n_gold)`` in exact integer
    arithmetic. Every stage is the production one: the labeler, the EM
    label model (driver holds only the (n_lfs+1)-row sufficient
    statistics), the guarded broadcast-vs-join log-odds fit/score, the
    guarded membership join, and the union-sum entity confusion."""
    from fonduer_ray.stages.gold import attach_gold_labels, entity_confusion
    from fonduer_ray.stages.label_model import LabelModel
    from fonduer_ray.stages.label_stage import label
    from fonduer_ray.stages.train_stage import fit_log_odds, score_log_odds
    from fonduer_ray.stages.util import hash_groupby

    cand = _cached_ds(("cand", sf_dir), lambda: candidate_docs(sf_dir))
    lf_names = [n for n, _ in _e2e_lfs()]

    # -- generative step: EM over the split-0 LF votes ----------------------
    # materialized: the EM fit re-traverses the votes once per iteration
    # and predict_proba once more — without pinning, the whole LF apply
    # re-executes (n_iter + 1) times (measured ~5s of pure re-execution)
    train_lab = label(cand, _e2e_lfs(), batch_size=128).filter(
        expr="split == 0"
    ).materialize()
    lm = LabelModel(n_iter=E2E_LM_ITERS).fit(train_lab, lf_names)

    def to_y(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "candidate_stable_id": t["candidate_stable_id"],
                "y": pa.array(
                    [1 if p > 0.5 else 0 for p in t["prob"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    y_ds = lm.predict_proba(train_lab).map_batches(
        to_y, batch_format="pyarrow"
    ).materialize()

    # -- discriminative step: fit on split 0, score held-out split 1 --------
    feats = _cached_feats(sf_dir)
    weights, bias = fit_log_odds(feats.filter(expr="split == 0"), y_ds)
    scored = score_log_odds(feats.filter(expr="split == 1"), weights, bias)
    kept = scored.filter(expr="score > 0.5").select_columns(
        ["candidate_stable_id"]
    )

    # -- predicted entity set on the dev split -------------------------------
    meta_rows = candidates_table(cand).filter(expr="split == 1")

    def prep(t: pa.Table) -> pa.Table:
        docs, subjs, objs, cids = [], [], [], []
        for doc_name, cid, texts in zip(
            t["doc_name"].to_pylist(),
            t["stable_id"].to_pylist(),
            t["arg_texts"].to_pylist(),
        ):
            docs.append(int(doc_name))
            cids.append(cid)
            subjs.append(texts[0])
            objs.append(texts[1])
        return pa.table(
            {
                "candidate_stable_id": pa.array(cids, pa.string()),
                "doc_id": pa.array(docs, pa.int64()),
                "subj": pa.array(subjs, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )

    meta = meta_rows.map_batches(prep, batch_format="pyarrow")
    # guarded membership semi-join (broadcast set vs hash join) marks which
    # dev candidates the trained scorer kept
    marked = attach_gold_labels(
        meta, kept, ["candidate_stable_id"], normalize=False
    )

    def keep_pred(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["gold"], 1)).select(
            ["doc_id", "subj", "obj"]
        )

    import pandas as pd

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(ignore_index=True)

    pred = hash_groupby(
        marked.map_batches(keep_pred, batch_format="pyarrow"),
        ["doc_id", "subj", "obj"],
        distinct,
    )

    # -- entity-level confusion vs gold on split-1 docs ----------------------
    gold = _split_of_docs(_gold_entities(sf_dir), 1)
    labeled = attach_gold_labels(pred, gold, ["doc_id", "subj", "obj"])
    conf = entity_confusion(labeled, gold)
    sums = conf.sum(["n_pred", "n_gold", "n_tp"]) or {}
    n_pred = int(sums.get("sum(n_pred)", 0) or 0)
    n_gold = int(sums.get("sum(n_gold)", 0) or 0)
    n_tp = int(sums.get("sum(n_tp)", 0) or 0)
    denom = n_pred + n_gold
    return pa.table(
        {
            "n_pred": pa.array([n_pred], pa.int64()),
            "n_gold": pa.array([n_gold], pa.int64()),
            "n_tp": pa.array([n_tp], pa.int64()),
            "f1_cents": pa.array(
                [(200 * n_tp) // denom if denom else 0], pa.int64()
            ),
        }
    )


class _Mp3StatsStage:
    """Deterministic MP3 fixture -> real frame-header walk -> closed-form
    stats. Each doc_id derives a silent CBR MPEG1-L3 stream: ``5 + id%7``
    frames, bitrate ``(96,112,128,160)[id%4]`` kbps at 44100 Hz, stereo
    when id is even, with an ID3v2 tag of ``id%11`` junk bytes prepended
    (exercising the synchsafe skip). All output fields are integers the
    oracle knows in closed form; duration derives as n_samples/44100
    downstream. Encode + parse both run inside the stage (one pass, no
    payload shuffle); AudioDecode covers the same parse via tests."""

    BITRATES = (96, 112, 128, 160)

    def __call__(self, t: pa.Table) -> pa.Table:
        from fonduer_ray.functions.mp3 import mp3_encode_silent, mp3_parse

        ids, frames, samples, rates, chans, kbps = [], [], [], [], [], []
        for doc_id in t["doc_id"].to_pylist():
            data = mp3_encode_silent(
                n_frames=5 + doc_id % 7,
                bitrate_kbps=self.BITRATES[doc_id % 4],
                sample_rate=44100,
                stereo=doc_id % 2 == 0,
                id3v2_junk=doc_id % 11,
            )
            meta = mp3_parse(data)
            ids.append(doc_id)
            frames.append(meta["n_frames"])
            samples.append(meta["n_samples"])
            rates.append(meta["sample_rate"])
            chans.append(meta["n_channels"])
            kbps.append(meta["bitrate_kbps"])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_mp3_frames": pa.array(frames, pa.int64()),
                "n_samples": pa.array(samples, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "n_channels": pa.array(chans, pa.int64()),
                "bitrate_kbps": pa.array(kbps, pa.int64()),
            }
        )


def mp3_audio_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_mp3_frames, n_samples, sample_rate, n_channels,
    bitrate_kbps) through the real MP3 encode->frame-walk path
    (``functions/mp3.py``), oracle-checked in closed form against the
    doc_id-derived fixture parameters."""
    from fonduer_ray.stages.util import map_stage

    ds = read_docs(sf_dir, ["doc_id"])
    return map_stage(ds, _Mp3StatsStage, {}, 64)


class _Mp4StatsStage:
    """Deterministic MP4 fixture -> real ISO-BMFF box walk -> closed-form
    stats. Each doc_id derives a structurally valid container
    (``functions/mp4.py``): movie timescale 1000 with duration
    ``1000 * (2 + id%5)`` ticks, an avc1 video track of
    ``320 + (id%4)*16 x 240 + (id%3)*16`` px carrying ``30 * (2 + id%5)``
    samples (stsz), and an mp4a audio track present when ``id % 3 != 0``.
    All output fields are integers/strings the oracle knows in closed
    form. Encode + parse both run inside the stage (one pass, no payload
    shuffle); FrameSample keeps H.264 frame DECODE honestly stubbed —
    this walk extracts only what the box tree publishes."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from fonduer_ray.functions.mp4 import mp4_encode_stub, mp4_parse

        ids, ntr, ts, dur, w, h, vc, ac, nvs = (
            [], [], [], [], [], [], [], [], [],
        )
        for doc_id in t["doc_id"].to_pylist():
            data = mp4_encode_stub(
                duration_ts=1000 * (2 + doc_id % 5),
                timescale=1000,
                width=320 + (doc_id % 4) * 16,
                height=240 + (doc_id % 3) * 16,
                n_video_samples=30 * (2 + doc_id % 5),
                with_audio=doc_id % 3 != 0,
            )
            meta = mp4_parse(data)
            video = next(
                tr for tr in meta["tracks"] if tr["handler"] == "vide"
            )
            audio = [tr for tr in meta["tracks"] if tr["handler"] == "soun"]
            ids.append(doc_id)
            ntr.append(meta["n_tracks"])
            ts.append(meta["timescale"])
            dur.append(meta["duration_ts"])
            w.append(video["width"])
            h.append(video["height"])
            vc.append(video["codec"])
            ac.append(audio[0]["codec"] if audio else "")
            nvs.append(video["n_samples"])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tracks": pa.array(ntr, pa.int64()),
                "timescale": pa.array(ts, pa.int64()),
                "duration_ms": pa.array(dur, pa.int64()),
                "width": pa.array(w, pa.int64()),
                "height": pa.array(h, pa.int64()),
                "video_codec": pa.array(vc, pa.string()),
                "audio_codec": pa.array(ac, pa.string()),
                "n_video_samples": pa.array(nvs, pa.int64()),
            }
        )


def video_container_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_tracks, timescale, duration_ms, width, height,
    video_codec, audio_codec, n_video_samples) through the real MP4
    encode -> box-walk path (``functions/mp4.py``), oracle-checked in
    closed form against the doc_id-derived fixture parameters."""
    from fonduer_ray.stages.util import map_stage

    ds = read_docs(sf_dir, ["doc_id"])
    return map_stage(ds, _Mp4StatsStage, {}, 64)


def url_canonical_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, host, canonical_url) through the real URL canonicalizer
    (``functions/weburl.py``). Each doc derives a deliberately messy URL
    — uppercase scheme/host, userinfo, default port, tracking params,
    unsorted query, trailing slash, fragment — whose canonical form the
    oracle knows in closed form."""
    from fonduer_ray.functions.weburl import canonicalize_urls

    ds = read_docs(sf_dir, ["doc_id", "source"])

    def mess(t: pa.Table) -> pa.Table:
        urls = [
            f"HTTPS://User:Pw@WWW.{src}.Example.COM:443/Docs/{doc_id}/"
            f"?utm_source=feed&z=9&a={doc_id % 7}&fbclid=xyz#frag"
            for doc_id, src in zip(
                t["doc_id"].to_pylist(), t["source"].to_pylist()
            )
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "url": pa.array(urls, pa.string())}
        )

    out = canonicalize_urls(ds.map_batches(mess, batch_format="pyarrow"))
    return out.select_columns(["doc_id", "host", "canonical_url"])


def _linked_pages(sf_dir: str, alias_anchors: bool = False) -> "ray.data.Dataset":
    """Deterministic linked-web fixture: doc i's page carries ``1 + i%3``
    anchors, link k (1-based) pointing at doc ``t = (7*i + k) % N`` via a
    deliberately messy absolute URL (uppercase host, default port,
    tracking param) whose canonical form is closed-form from ``t``
    (source of doc t is ``src{t % 20}`` in the driver testdata). N is the
    documents row count (Parquet metadata — no scan).

    ``alias_anchors``: anchor text becomes ``name{(i + t) % 3}`` — one of
    three colliding alias strings per target, so alias aggregation has a
    real mode to find (still closed-form for the oracle)."""
    ds = read_docs(sf_dir, ["doc_id"])
    n_docs = ds.count()

    def to_pages(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for doc_id in t["doc_id"].to_pylist():
            anchors = []
            for k in range(1, 2 + doc_id % 3):
                tgt = (7 * doc_id + k) % n_docs
                text = (
                    f"name{(doc_id + tgt) % 3}"
                    if alias_anchors
                    else f"anchor {tgt}"
                )
                anchors.append(
                    f'<a href="HTTPS://WWW.src{tgt % 20}.Example.COM:443'
                    f'/Docs/{tgt}/?utm_source=feed">{text}</a>'
                )
            urls.append(str(doc_id))
            htmls.append(
                ("<html><body><p>page</p>" + "".join(anchors)
                 + "</body></html>").encode()
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def link_graph_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, link_pos, canonical_url, dst_host, anchor) through the
    REAL html-tree link extraction + URL canonicalization
    (``functions/weburl.py``) over the linked-web fixture — one row per
    outlink, value-checked in closed form by the oracle.
    Session-memoized: three driver queries (this one,
    ``host_inlink_counts``, ``host_reciprocity``) consume the same
    extracted-link table and re-parsing the fixture pages dominates each
    one's wall time."""
    return _cached_ds(("links", sf_dir), lambda: _link_graph_stats(sf_dir))


def _link_graph_stats(sf_dir: str) -> "ray.data.Dataset":
    from fonduer_ray.functions.weburl import canonicalize_urls, extract_links

    links = extract_links(_linked_pages(sf_dir))
    out = canonicalize_urls(links, url_col="href")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(u) for u in t["src_url"].to_pylist()], pa.int64()
                ),
                "link_pos": t["link_pos"],
                "canonical_url": t["canonical_url"],
                "dst_host": t["host"],
                "anchor": t["anchor"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def host_inlink_counts(sf_dir: str) -> "ray.data.Dataset":
    """(dst_host, n_inlinks) — the host-graph in-degree aggregate over the
    extracted links (one hash shuffle keyed by canonical target host)."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    links = link_graph_stats(sf_dir).select_columns(["dst_host"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("dst_host", sort=False)
            .size()
            .reset_index(name="n_inlinks")
        )

    return hash_groupby(links, ["dst_host"], agg)


def host_reciprocity(sf_dir: str) -> "ray.data.Dataset":
    """(host, n_out, n_reciprocal) — link-reciprocity report over the
    DISTINCT directed host graph (self-loops excluded): for every host,
    its out-neighbor count and how many of those out-neighbors link
    back. Reciprocity is the standard directed-web-graph mixing metric
    (mutual links separate navigational site pairs from one-way citation
    flows); kept as two exact int64 columns so the distributed result
    hashes bit-for-bit against the closed-form oracle.

    Shape: links flow through the REAL html link extraction + URL
    canonicalization (``link_graph_stats``); the source host is the
    fixture's deterministic host assignment (doc i lives on
    ``www.src{i % 20}.example.com`` — same closed form the oracle uses).
    One hash_groupby dedups directed host edges, one groups each
    undirected pair ``(lo, hi)`` to flag mutual presence (both directions
    of a pair land in the same partition, so the reciprocity test is
    local), one sums per host. Nothing touches the driver."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    links = link_graph_stats(sf_dir).select_columns(["doc_id", "dst_host"])

    def to_host_edges(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_pylist()
        return pa.table(
            {
                "src_host": pa.array(
                    [f"www.src{d % 20}.example.com" for d in doc], pa.string()
                ),
                "dst_host": t["dst_host"],
            }
        )

    edges = hash_groupby(
        links.map_batches(to_host_edges, batch_format="pyarrow"),
        ["src_host", "dst_host"],
        lambda df: df[df["src_host"] != df["dst_host"]].drop_duplicates(
            ignore_index=True
        ),
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t["src_host"]
        d = t["dst_host"]
        fwd = pc.less(s, d)
        return pa.table(
            {
                "lo": pc.if_else(fwd, s, d),
                "hi": pc.if_else(fwd, d, s),
                "is_fwd": fwd,
            }
        )

    def mutual(df: pd.DataFrame) -> pd.DataFrame:
        # a (lo, hi) group holds at most one row per direction (edges are
        # distinct), so count == 2 means the pair is mutual
        g = df.groupby(["lo", "hi"], sort=False)["is_fwd"].agg(
            ["any", "count"]
        )
        has_fwd = g["any"].to_numpy()
        both = g["count"].to_numpy() == 2
        lo = g.index.get_level_values("lo")
        hi = g.index.get_level_values("hi")
        rows = []
        for l_, h_, f_, b_ in zip(lo, hi, has_fwd, both):
            if b_ or f_:
                rows.append((l_, 1, 1 if b_ else 0))
            if b_ or not f_:
                rows.append((h_, 1, 1 if b_ else 0))
        return pd.DataFrame(
            rows, columns=["host", "n_out", "n_reciprocal"]
        ).astype({"n_out": "int64", "n_reciprocal": "int64"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("host", sort=False)[["n_out", "n_reciprocal"]]
            .sum()
            .reset_index()
        )

    pairs = edges.map_batches(to_pairs, batch_format="pyarrow")
    per_edge = hash_groupby(pairs, ["lo", "hi"], mutual)
    return hash_groupby(per_edge, ["host"], finish)


def anchor_alias_stats(sf_dir: str) -> "ray.data.Dataset":
    """(canonical_url, n_mentions, n_aliases, top_anchor) — the KG
    entity-alias aggregate (``weburl.anchor_aliases``) over the
    alias-anchored linked-web fixture: each in-link names its target
    ``name{(src + tgt) % 3}``, so the modal anchor per canonical target
    (ties bytewise-ascending) is closed-form for the oracle."""
    from fonduer_ray.functions.weburl import (
        anchor_aliases,
        canonicalize_urls,
        extract_links,
    )

    links = extract_links(_linked_pages(sf_dir, alias_anchors=True))
    out = anchor_aliases(
        canonicalize_urls(links, url_col="href"), target_col="canonical_url"
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "canonical_url": t["target"],
                "n_mentions": t["n_mentions"],
                "n_aliases": t["n_aliases"],
                "top_anchor": t["top_anchor"],
            }
        ),
        batch_format="pyarrow",
    )


def sitemap_parse_stats(sf_dir: str) -> "ray.data.Dataset":
    """(sitemap_url, kind, pos, loc, lastmod, changefreq, priority)
    through the real sitemaps.org parser (``weburl.parse_sitemaps``).
    Doc i with i%10 == 0 is a ``<sitemapindex>`` of ``1 + i%2`` child
    sitemaps (no changefreq/priority); every other doc is a ``<urlset>``
    of ``1 + i%3`` page entries where entry j carries
    lastmod ``2026-01-(1+(i+j)%28)``, changefreq cycling
    (daily, weekly, monthly, never) by ``(i+j)%4`` — OMITTED when
    ``(i+j)%5 == 0`` (null-field path) — and priority ``0.((i+j)%10)``.
    All closed-form for the oracle, including the nulls."""
    from fonduer_ray.functions.weburl import parse_sitemaps

    ds = read_docs(sf_dir, ["doc_id"])
    freqs = ("daily", "weekly", "monthly", "never")

    def to_sitemaps(t: pa.Table) -> pa.Table:
        urls, xmls = [], []
        for i in t["doc_id"].to_pylist():
            host = f"https://www.src{i % 20}.example.com"
            entries = []
            if i % 10 == 0:
                for j in range(1, 2 + i % 2):
                    entries.append(
                        f"<sitemap><loc>{host}/sitemap{i}_{j}.xml</loc>"
                        f"<lastmod>2026-02-{1 + (i + j) % 28:02d}</lastmod>"
                        f"</sitemap>"
                    )
                body = f"<sitemapindex>{''.join(entries)}</sitemapindex>"
            else:
                for j in range(1, 2 + i % 3):
                    freq = (
                        ""
                        if (i + j) % 5 == 0
                        else f"<changefreq>{freqs[(i + j) % 4]}</changefreq>"
                    )
                    entries.append(
                        f"<url><loc>{host}/Docs/{i}/p{j}</loc>"
                        f"<lastmod>2026-01-{1 + (i + j) % 28:02d}</lastmod>"
                        f"{freq}<priority>0.{(i + j) % 10}</priority></url>"
                    )
                body = f"<urlset>{''.join(entries)}</urlset>"
            urls.append(f"{host}/sitemap.xml")
            xmls.append(
                ('<?xml version="1.0" encoding="UTF-8"?>' + body).encode()
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "xml": pa.array(xmls, pa.binary()),
            }
        )

    return parse_sitemaps(ds.map_batches(to_sitemaps, batch_format="pyarrow"))


def page_meta_stats(sf_dir: str) -> "ray.data.Dataset":
    """(url, title, description, canonical, og_title, og_type, lang)
    through the real head-metadata extractor (``weburl.extract_page_meta``).
    Doc i declares lang (en, de, fr)[i%3], a whitespace-padded title
    (squeeze check) plus a DUPLICATE title (first-wins check), a messy
    canonical link the URL canonicalizer must clean, a description when
    ``i%4 != 0``, og:title when ``i%3 == 0``, og:type 'article' when
    ``i%5 == 0`` — every field and every null closed-form."""
    from fonduer_ray.functions.weburl import extract_page_meta

    ds = read_docs(sf_dir, ["doc_id"])
    langs = ("en", "de", "fr")

    def to_pages(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for i in t["doc_id"].to_pylist():
            head = [f"<title> Title   {i} </title>"]
            if i % 4 != 0:
                head.append(f'<meta name="Description" content="Desc  {i}">')
            if i % 3 == 0:
                head.append(f'<meta property="og:title" content="OG {i}">')
            if i % 5 == 0:
                head.append('<meta property="og:type" content="article">')
            head.append(
                f'<link rel="Canonical" href="HTTPS://WWW.src{i % 20}'
                f'.Example.COM:443/Docs/{i}/?utm_source=x">'
            )
            head.append("<title>late duplicate ignored</title>")
            html = (
                f'<html lang="{langs[i % 3].upper()}"><head>'
                + "".join(head)
                + f"</head><body><p>page {i}</p></body></html>"
            )
            urls.append(str(i))
            htmls.append(html.encode())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return extract_page_meta(ds.map_batches(to_pages, batch_format="pyarrow"))


def charset_decode_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, encoding, method, text_decoded) through the real HTML5
    charset sniff (``functions/charset.py``). Doc i's payload is
    ``Café n{i}`` (the é forces utf-8/cp1252 bytes apart) encoded by
    ``i % 5``: 0 = UTF-8 with BOM, 1 = UTF-16LE with BOM, 2 =
    windows-1252 declared by a ``<meta charset>`` prescan tag, 3 = plain
    UTF-8 (validity detection), 4 = bare windows-1252 bytes (the
    fallback path). Every branch's decoded text and detection method is
    closed-form for the oracle."""
    from fonduer_ray.functions.charset import decode_charsets

    ds = read_docs(sf_dir, ["doc_id"])

    def to_raw(t: pa.Table) -> pa.Table:
        ids, raws = [], []
        for i in t["doc_id"].to_pylist():
            text = f"Café n{i}"
            b = i % 5
            if b == 0:
                raw = b"\xef\xbb\xbf" + text.encode("utf-8")
            elif b == 1:
                raw = b"\xff\xfe" + text.encode("utf-16-le")
            elif b == 2:
                raw = f'<meta charset="windows-1252">{text}'.encode("cp1252")
            elif b == 3:
                raw = text.encode("utf-8")
            else:
                raw = text.encode("cp1252")
            ids.append(i)
            raws.append(raw)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "raw": pa.array(raws, pa.binary()),
            }
        )

    out = decode_charsets(ds.map_batches(to_raw, batch_format="pyarrow"))
    return out.select_columns(["doc_id", "encoding", "method", "text_decoded"])


def redirect_resolution_stats(sf_dir: str) -> "ray.data.Dataset":
    """(url, final_url, n_hops, resolved) through
    ``weburl.resolve_redirects`` on its natural size guard (the fixture
    sits far below the broadcast limit, so the bounded single-worker walk
    runs — the same convention as pagerank/components): doc i (i%16 != 0)
    redirects to i-1, so chains run to the multiple-of-16 terminal below —
    final url and hop count are closed-form (``i - i%16``, ``i % 16``).
    The distributed pointer-doubling path is forced (broadcast_limit=0)
    and equality-tested against the walk in tests/test_weburl2.py."""
    ds = read_docs(sf_dir, ["doc_id"])

    def to_edges(t: pa.Table) -> pa.Table:
        ids = [i for i in t["doc_id"].to_pylist() if i % 16 != 0]
        return pa.table(
            {
                "src_url": pa.array(
                    [f"https://r.example.com/{i}" for i in ids], pa.string()
                ),
                "dst_url": pa.array(
                    [f"https://r.example.com/{i - 1}" for i in ids],
                    pa.string(),
                ),
            }
        )

    from fonduer_ray.functions.weburl import resolve_redirects

    edges = ds.map_batches(to_edges, batch_format="pyarrow")
    return resolve_redirects(edges, max_hops=16)


class _GifStatsStage:
    """Deterministic GIF fixture -> real LZW encode->decode -> closed-form
    stats. Each doc_id derives an animated GIF of ``2 + id%2`` frames
    (dims ``16+(id%4)*8 x 16+(id%3)*8``): frame 0 splits vertically into
    gray ``a = id%256`` (left half, w//2 cols) and ``b = (id*7)%256``
    (right), later frames are solid ``b``. Palette decode is EXACT, so
    the first frame's truncated mean is ``(a*(w//2) + b*(w - w//2)) //
    w`` — SQL-expressible. Encode + parse + decode run inside the stage
    (one pass, no payload shuffle)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from fonduer_ray.functions.gif import (
            gif_decode_frame,
            gif_encode,
            gif_parse,
        )

        ids, ws, hs, nf, means = [], [], [], [], []
        for doc_id in t["doc_id"].to_pylist():
            w = 16 + (doc_id % 4) * 8
            h = 16 + (doc_id % 3) * 8
            a, b = doc_id % 256, (doc_id * 7) % 256
            first = np.full((h, w, 3), b, dtype=np.uint8)
            first[:, : w // 2] = a
            frames = [first] + [
                np.full((h, w, 3), b, dtype=np.uint8)
                for _ in range(1 + doc_id % 2)
            ]
            meta = gif_parse(gif_encode(frames))
            img = gif_decode_frame(meta, 0)
            ids.append(doc_id)
            ws.append(meta["width"])
            hs.append(meta["height"])
            nf.append(meta["n_frames"])
            means.append(int(img.mean()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "n_gif_frames": pa.array(nf, pa.int64()),
                "mean_first": pa.array(means, pa.int64()),
            }
        )


class _MediaSniffStage:
    """Mixed binary payloads through the REAL encoder of each of the 8
    native container families (doc_id % 8 picks the family), then the
    magic-byte sniffer classifies the bytes back — the crawl-side
    content-type dispatcher every multimodal pipeline fronts its decode
    actors with. mp3 alternates ID3v2-tagged and bare-sync streams so
    both sniff branches run."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from fonduer_ray.functions.avi import avi_encode_mjpeg
        from fonduer_ray.functions.codecs import (
            png_encode,
            sniff_format,
            wav_encode,
        )
        from fonduer_ray.functions.gif import gif_encode
        from fonduer_ray.functions.jpeg import jpeg_encode
        from fonduer_ray.functions.mp3 import mp3_encode_silent
        from fonduer_ray.functions.mp4 import mp4_encode_stub
        from fonduer_ray.functions.tiff import tiff_encode

        gray = np.zeros((8, 8), dtype=np.uint8)
        rgb = np.zeros((4, 4, 3), dtype=np.uint8)
        ids, types = [], []
        for doc_id in t["doc_id"].to_pylist():
            k = doc_id % 8
            if k == 0:
                data = png_encode(gray)
            elif k == 1:
                data = wav_encode(np.zeros(16, dtype=np.int16), 8000)
            elif k == 2:
                data = avi_encode_mjpeg([gray])
            elif k == 3:
                data = jpeg_encode(gray)
            elif k == 4:
                data = gif_encode([rgb])
            elif k == 5:
                data = mp3_encode_silent(1, id3v2_junk=(doc_id % 16) // 8 * 4)
            elif k == 6:
                data = mp4_encode_stub(100, n_video_samples=1)
            else:
                data = tiff_encode([rgb], little_endian=(doc_id % 2 == 0))
            ids.append(doc_id)
            types.append(sniff_format(data))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
            }
        )


def media_sniff_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, media_type) — every doc's payload encoded by the real
    codec of family ``doc_id % 8`` and classified back by magic bytes
    (``codecs.sniff_format``); the oracle knows the expected family in
    closed form."""
    from fonduer_ray.stages.util import map_stage

    ds = read_docs(sf_dir, ["doc_id"])
    return map_stage(ds, _MediaSniffStage, {}, 64)


def registered_domain_rollup(sf_dir: str) -> "ray.data.Dataset":
    """(registered_domain, n) — per-site rollup through the REAL
    public-suffix-list matcher (``weburl.registered_domains``: longest
    match, wildcard ``*.ck``, exception ``!www.ck``). Each doc derives a
    host hitting one of six suffix classes closed-form from doc_id, so
    the oracle replays the expected eTLD+1 directly; the wildcard branch
    keeps all three labels and the exception branch collapses to
    ``www.ck``, so every arm of the published algorithm is exercised and
    value-checked. One rollup shuffle keyed by the registered domain."""
    import pandas as pd

    from fonduer_ray.functions.weburl import registered_domains
    from fonduer_ray.stages.util import hash_groupby

    ds = read_docs(sf_dir, ["doc_id"])
    suffixes = ["com", "co.uk", "github.io", "org", "com.au"]

    def to_hosts(t: pa.Table) -> pa.Table:
        hosts = []
        for i in t["doc_id"].to_pylist():
            if i % 6 == 5:
                hosts.append(
                    f"a{i % 7}.www.ck" if i % 12 == 11
                    else f"a{i % 7}.b{i % 3}.ck"
                )
            else:
                hosts.append(f"a{i % 7}.b{i % 3}.{suffixes[i % 6]}")
        return pa.table({"host": pa.array(hosts, pa.string())})

    with_rd = registered_domains(
        ds.map_batches(to_hosts, batch_format="pyarrow")
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("registered_domain", sort=False)
            .size()
            .reset_index(name="n")
        )

    return hash_groupby(
        with_rd.select_columns(["registered_domain"]),
        ["registered_domain"],
        agg,
    )


class _TiffStatsStage:
    """Deterministic TIFF fixture -> real encode -> IFD walk -> decode ->
    closed-form stats. Each doc_id derives a ``1 + id%3``-page baseline
    TIFF (little-endian when id is even, big-endian otherwise —
    exercising both byte orders): page 0 is ``16+(id%5)*4 x
    12+(id%3)*4``, RGB when ``id%4 == 0`` (whose 3-count BitsPerSample
    does NOT fit inline, exercising the offset-value path) else
    grayscale, split vertically into ``a = id%256`` (left w//2 cols) and
    ``b = (id*11)%256``; later pages are solid ``b``. The truncated
    pixel mean is ``(a*(w//2) + b*(w-w//2)) // w`` — SQL-expressible.
    Encode + parse + decode run inside the stage (one pass, no payload
    shuffle)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from fonduer_ray.functions.tiff import (
            tiff_decode_page,
            tiff_encode,
            tiff_parse,
        )

        ids, ws, hs, np_, spp_, means = [], [], [], [], [], []
        for doc_id in t["doc_id"].to_pylist():
            w = 16 + (doc_id % 5) * 4
            h = 12 + (doc_id % 3) * 4
            a, b = doc_id % 256, (doc_id * 11) % 256
            rgb = doc_id % 4 == 0
            shape = (h, w, 3) if rgb else (h, w)
            first = np.full(shape, b, dtype=np.uint8)
            first[:, : w // 2] = a
            pages = [first] + [
                np.full(shape, b, dtype=np.uint8)
                for _ in range(doc_id % 3)
            ]
            data = tiff_encode(pages, little_endian=(doc_id % 2 == 0))
            meta = tiff_parse(data)
            img = tiff_decode_page(meta, data, 0)
            ids.append(doc_id)
            ws.append(meta["pages"][0]["width"])
            hs.append(meta["pages"][0]["height"])
            np_.append(meta["n_pages"])
            spp_.append(meta["pages"][0]["samples_per_pixel"])
            means.append(int(img.sum()) // img.size)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "n_pages": pa.array(np_, pa.int64()),
                "spp": pa.array(spp_, pa.int64()),
                "mean_first": pa.array(means, pa.int64()),
            }
        )


def tiff_meta_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, width, height, n_pages, spp, mean_first) through the real
    TIFF 6.0 encode -> IFD walk -> strip decode path
    (``functions/tiff.py``), oracle-checked in closed form against the
    doc_id-derived fixture parameters."""
    from fonduer_ray.stages.util import map_stage

    ds = read_docs(sf_dir, ["doc_id"])
    return map_stage(ds, _TiffStatsStage, {}, 64)


def gif_decode_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, width, height, n_gif_frames, mean_first) through the real
    GIF LZW encode->decode path (``functions/gif.py``), oracle-checked in
    closed form against the doc_id-derived fixture parameters."""
    from fonduer_ray.stages.util import map_stage

    ds = read_docs(sf_dir, ["doc_id"])
    return map_stage(ds, _GifStatsStage, {}, 64)


def robots_filter_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, host, allowed) through the real robots.txt parser + RFC
    9309 longest-match precedence (``functions/weburl.py``). Hosts whose
    index is a multiple of 4 disallow ``/Docs/`` wholesale; every host
    disallows ``/Docs/9*`` but re-allows ``/Docs/99*`` (the longer Allow
    wins), and carries an unrelated ``badbot`` group that must NOT apply
    to ``*`` — all closed-form for the oracle."""
    from fonduer_ray.functions.weburl import robots_filter

    ds = read_docs(sf_dir, ["doc_id"])

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "host": pa.array(
                    [f"www.src{i % 20}.example.com" for i in ids],
                    pa.string(),
                ),
                "path": pa.array([f"/Docs/{i}" for i in ids], pa.string()),
            }
        )

    pages = ds.map_batches(to_pages, batch_format="pyarrow")

    bodies = []
    for h in range(20):
        rules = ["User-agent: badbot", "Disallow: /", "", "User-agent: *"]
        if h % 4 == 0:
            rules.append("Disallow: /Docs/")
        rules += ["Disallow: /Docs/9", "Allow: /Docs/99"]
        bodies.append(
            {"host": f"www.src{h}.example.com", "body": "\n".join(rules)}
        )
    robots = ray.data.from_items(bodies)

    out = robots_filter(pages, robots)
    return out.select_columns(["doc_id", "host", "allowed"])


def triple_confidence(sf_dir: str) -> "ray.data.Dataset":
    """KB confidence scoring over the engine's own canonical triple table
    — the NELL / DeepDive-style promotion signal: how much more often do
    ``subj`` and ``obj`` co-occur than their marginal supports predict?
    Ranked by the exact-integer PMI surrogate ``score = support * T * T //
    (subj_total * obj_total)`` (T = total support mass; monotone in PMI
    for the shared corpus constants, bit-identical to the SQL oracle —
    the :func:`~fonduer_ray.functions.textstats.pmi_collocations`
    convention). A downstream KB keeps triples above a score floor and
    routes the rest to re-extraction; analog of the reference's
    marginal-threshold KB promotion
    (/root/reference/src/fonduer/candidates/candidates.py apply/threshold
    flow, re-expressed as a post-canonicalization Dataset stage).

    Scale shape: the triple table is already 100-1000x smaller than the
    corpus; the subj/obj marginals are two ``hash_groupby`` sums over it,
    re-attached via the guarded broadcast-vs-join ``attach_lookup``
    switch, so the pattern stays shuffle-bounded even for a KB with
    billions of triples. Columns: ``(subj, obj, support, score)``,
    ordered by (score desc, subj, obj)."""
    import pandas as pd

    from fonduer_ray.pipelines.relational import attach_lookup
    from fonduer_ray.stages.util import hash_groupby

    t = _cached("triples_conf", sf_dir, lambda: triples(sf_dir))

    def marginal(col: str) -> "ray.data.Dataset":
        return hash_groupby(
            t.select_columns([col, "support"]),
            [col],
            lambda df, c=col: df.groupby(c, sort=False)["support"]
            .sum()
            .reset_index()
            .rename(columns={"support": f"{c}_total"}),
            join_safe=True,
        ).materialize()

    subj_m = marginal("subj")
    obj_m = marginal("obj")
    total = int(t.sum("support") or 0)

    scored = attach_lookup(t, subj_m, "subj", "subj", "subj_total")
    scored = attach_lookup(scored, obj_m, "obj", "obj", "obj_total")

    def score(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        num = pc.multiply(pc.multiply(tbl["support"], total), total)
        den = pc.multiply(tbl["subj_total"], tbl["obj_total"])
        return pa.table(
            {
                "subj": tbl["subj"],
                "obj": tbl["obj"],
                "support": tbl["support"],
                "score": pc.divide(num, den),
            }
        )

    return scored.map_batches(score, batch_format="pyarrow").sort(
        ["score", "subj", "obj"], descending=[True, False, False]
    )


def kb_path_inference(sf_dir: str) -> "ray.data.Dataset":
    """KB 2-hop path inference over the engine's own canonical triple
    table.  The ``cooccurs`` KB is bipartite (disjoint subject/object
    dictionaries), so the non-empty PRA path type is the inverse-forward
    ``(r, r^-1)`` path: subject pairs sharing objects — the
    distributional-similarity evidence a KB-construction loop (NELL /
    DeepDive promotion cycle; reference analog
    /root/reference/src/fonduer/candidates/candidates.py threshold flow)
    uses for entity resolution and type induction.  Semantics and scale
    shape: :func:`fonduer_ray.functions.kb.shared_object_pairs`; the
    general directed 2-hop chain (with direct-edge completion flags) is
    :func:`fonduer_ray.functions.kb.two_hop_paths`."""
    from fonduer_ray.functions.kb import shared_object_pairs

    t = _cached("triples_conf", sf_dir, lambda: triples(sf_dir))
    return shared_object_pairs(t)


def kb_triple_provenance(sf_dir: str) -> "ray.data.Dataset":
    """Per-triple provenance/lineage over the PRE-canonicalization
    instance table: for every ``(subj, obj)`` pair, the instance count
    (``support``), how many distinct documents contributed (``n_docs``),
    and the first/last contributing ``doc_id`` — the audit trail a KB
    keeps so every promoted fact can be traced back to its sources
    (reference analog: candidate rows keep ``document_id`` foreign keys,
    /root/reference/src/fonduer/candidates/models/candidate.py; here the
    lineage is aggregated instead of row-per-candidate).

    Scale shape: the fused extraction emits one row per candidate
    instance (doc-local work, no shuffle); provenance is then ONE
    ``hash_groupby`` on (subj, obj) with count/nunique/min/max running
    vectorized inside each hash partition. Columns ``(subj, obj,
    support, n_docs, first_doc, last_doc)``, ordered by (subj, obj)."""
    from fonduer_ray.stages.fused import pages_to_triples
    from fonduer_ray.stages.util import hash_groupby

    inst = _cached(
        "triples_inst",
        sf_dir,
        lambda: pages_to_triples(
            htmlize(sf_dir),
            _mention_specs(),
            _relation_specs(),
            [("lf_cooccur", _lf_cooccur)],
            pred_names={"cooccur": PRED},
            threshold=0.6,
            batch_size=128,
        ).select_columns(["subj", "obj", "doc_name"]),
    )

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "subj": t["subj"],
                "obj": t["obj"],
                "doc_id": pc.cast(t["doc_name"], pa.int64()),
            }
        )

    def agg(df):
        g = df.groupby(["subj", "obj"], sort=False)["doc_id"].agg(
            ["size", "nunique", "min", "max"]
        ).reset_index()
        g.columns = ["subj", "obj", "support", "n_docs", "first_doc", "last_doc"]
        return g

    prov = hash_groupby(
        inst.map_batches(prep, batch_format="pyarrow"), ["subj", "obj"], agg
    )
    return prov.sort(["subj", "obj"])


def kb_ntriples_roundtrip(sf_dir: str) -> "ray.data.Dataset":
    """Canonical triple table serialized to W3C N-Triples and verified
    invertible by the grammar parser — the KB interchange dump.
    Semantics, escaping, and scale shape:
    :mod:`fonduer_ray.functions.rdf`."""
    from fonduer_ray.functions.rdf import kb_ntriples_roundtrip as rt

    t = _cached("triples_conf", sf_dir, lambda: triples(sf_dir))
    return rt(t)


def kb_predicate_stats(sf_dir: str) -> "ray.data.Dataset":
    """PARIS functionality / inverse-functionality profile per predicate
    over the canonical triple table.  Semantics and scale shape:
    :func:`fonduer_ray.functions.kb.predicate_stats`."""
    from fonduer_ray.functions.kb import predicate_stats

    t = _cached("triples_conf", sf_dir, lambda: triples(sf_dir))
    return predicate_stats(t)


def kb_truth_discovery(sf_dir: str) -> "pa.Table":
    """Truth discovery over the extraction's source-claim graph — the
    Sums/Investment-style fixed point of Pasternack & Roth (COLING 2010)
    that Knowledge-Vault-class KB builders run to weigh conflicting
    sources: a source's trust is the average confidence of its claims, a
    claim's confidence the sum of its claimants' per-claim invested trust.

    Claims: source ``s`` claims fact ``(subj, obj)`` iff any of its
    documents emitted that candidate instance. TWO unrolled integer
    rounds (trust starts at 10000 bp; every division floors; sums before
    divisions, so the arithmetic is order-independent and the DuckDB
    oracle reproduces it bit-for-bit):

    - ``c1(f) = Σ_s 10000 // n_claims(s)``
    - ``t1(s) = (Σ_f c1(f)) // n_claims(s)``
    - ``conf(f) = Σ_s t1(s) // n_claims(s)``

    Scale shape: the doc-level instance table (memoized, shared with
    provenance) attaches ``source`` through one guarded lookup on the
    documents dimension; distinct (source, subj, obj) claims collapse in
    ONE hash exchange. The fixed point itself runs driver-side on the
    post-aggregation claim matrix — bounded by |sources| x |fact
    vocabulary|, the same driver-sized finish as ``volume_shipping``.
    Columns ``(subj, obj, n_sources, conf)``, ordered by (subj, obj)."""
    from fonduer_ray.pipelines.relational import attach_lookup
    from fonduer_ray.stages.fused import pages_to_triples
    from fonduer_ray.stages.util import hash_groupby, read_blocks_for

    inst = _cached(
        "triples_inst",
        sf_dir,
        lambda: pages_to_triples(
            htmlize(sf_dir),
            _mention_specs(),
            _relation_specs(),
            [("lf_cooccur", _lf_cooccur)],
            pred_names={"cooccur": PRED},
            threshold=0.6,
            batch_size=128,
        ).select_columns(["subj", "obj", "doc_name"]),
    )

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "subj": t["subj"],
                "obj": t["obj"],
                "doc_id": pc.cast(t["doc_name"], pa.int64()),
            }
        )

    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source"],
        override_num_blocks=read_blocks_for(f"{sf_dir}/documents.parquet"),
    )
    with_src = attach_lookup(
        inst.map_batches(prep, batch_format="pyarrow"),
        docs,
        "doc_id",
        "doc_id",
        "source",
    )
    claims_ds = hash_groupby(
        with_src.select_columns(["source", "subj", "obj"]),
        ["source"],
        lambda df: df.drop_duplicates(["source", "subj", "obj"]),
    )

    claims = [
        (r["source"], r["subj"], r["obj"]) for r in claims_ds.take_all()
    ]
    return truth_fixed_point(claims)


def truth_fixed_point(claims: "list[tuple[str, str, str]]") -> "pa.Table":
    """The two unrolled integer rounds of :func:`kb_truth_discovery`,
    pure (driver-side, claim matrix already aggregated)."""
    n_claims: dict[str, int] = {}
    for s, *_ in claims:
        n_claims[s] = n_claims.get(s, 0) + 1
    c1: dict[tuple, int] = {}
    for s, su, ob in claims:
        c1[(su, ob)] = c1.get((su, ob), 0) + 10000 // n_claims[s]
    t1: dict[str, int] = {}
    for s, su, ob in claims:
        t1[s] = t1.get(s, 0) + c1[(su, ob)]
    t1 = {s: v // n_claims[s] for s, v in t1.items()}
    conf: dict[tuple, int] = {}
    n_src: dict[tuple, int] = {}
    for s, su, ob in claims:
        conf[(su, ob)] = conf.get((su, ob), 0) + t1[s] // n_claims[s]
        n_src[(su, ob)] = n_src.get((su, ob), 0) + 1

    keys = sorted(conf)
    return pa.table(
        {
            "subj": pa.array([k[0] for k in keys], pa.string()),
            "obj": pa.array([k[1] for k in keys], pa.string()),
            "n_sources": pa.array([n_src[k] for k in keys], pa.int64()),
            "conf": pa.array([conf[k] for k in keys], pa.int64()),
        }
    )
