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
from fonduer_ray.stages.triple_stage import extract_triples

PARA_TOKENS = 10
SUBJ_DICT = ("spark", "hash", "merge", "sort")
OBJ_DICT = ("window", "batch", "stream", "join")
WINDOW = 3
PRED = "cooccurs"


def htmlize(sf_dir: str) -> "ray.data.Dataset":
    """documents(doc_id, text) -> (url, html, lang) pages, PARA_TOKENS tokens
    per ``<p>``."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

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


def parsed_docs(sf_dir: str) -> "ray.data.Dataset":
    return parse_webpages(htmlize(sf_dir), batch_size=128)


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


def mention_counts(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, mention, n_mentions) via the real mention stage."""
    m = mentions_table(mention_docs(sf_dir))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(d) for d in t["doc_name"].to_pylist()], pa.int64()
                ),
                "mention": t["text"],
            }
        )

    return (
        m.map_batches(prep, batch_format="pyarrow")
        .groupby(["doc_id", "mention"])
        .aggregate(Count(alias_name="n_mentions"))
    )


def _throttler(spans) -> bool:
    a, b = spans
    return (
        a.sentence["position"] == b.sentence["position"]
        and abs(a.get_word_start_index() - b.get_word_start_index()) <= WINDOW
    )


def _relation_specs() -> list[RelationSpec]:
    return [RelationSpec("cooccur", ("subj", "obj"), throttler=_throttler)]


def candidate_docs(sf_dir: str) -> "ray.data.Dataset":
    return extract_candidates(mention_docs(sf_dir), _relation_specs(), batch_size=128)


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

    return (
        c.map_batches(prep, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_candidates"))
    )


def _lf_cooccur(view) -> int:
    return 1


def triples(sf_dir: str) -> "ray.data.Dataset":
    """Full KG path on driver data: candidates -> LF score -> canonicalize
    (salted) -> dedup; returns (subj, pred, obj, support). Doc-local steps
    run fused in one actor pool (see ``stages/fused.py``)."""
    from fonduer_ray.stages.fused import pages_to_triples

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
    deduped = dedup_triples(linked)
    return deduped.select_columns(["subj", "pred", "obj", "support"])
