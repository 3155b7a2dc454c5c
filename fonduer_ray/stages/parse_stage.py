"""Parse stage: Parquet web pages -> nested context-tree document rows.

The flagship ``map_batches`` stage (reference lifecycle:
``Parser.apply``, ``parser/parser.py:229-264`` + ``utils/udf.py:100-169``,
re-expressed as a Ray Data transform). Runs as plain tasks with a per-worker
cached instance (``stages.util.map_stage``) holding compiled parser config
+ the lingual tagger; each ``__call__`` handles one Arrow batch of pages
and emits one nested row per document. Parse failures go to an explicit error side-channel column instead
of the reference's silent drop (``parser.py:257-264``).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from fonduer_ray.stages.util import map_stage

from fonduer_ray.parser.lingual import default_linguist
from fonduer_ray.parser.parse import ParserConfig, parse_document
from fonduer_ray.stages.schemas import DOC_SCHEMA


class ParseStage:
    """Callable class for ``ds.map_batches(ParseStage, concurrency=N)``.

    ``linguist`` selects NLP enrichment: ``"auto"`` (spaCy when installed,
    else the deterministic heuristic), ``"spacy"``, ``"heuristic"``, or any
    object with ``enrich_document`` (see ``parser.lingual``)."""

    def __init__(
        self,
        cfg: ParserConfig | None = None,
        enrich: bool = True,
        url_col: str = "url",
        html_col: str = "html",
        lang_col: str = "lang",
        emit_errors: bool = False,
        linguist: "str | object" = "auto",
    ):
        self.cfg = cfg or ParserConfig()
        self.linguist = default_linguist(linguist) if enrich else None
        self.url_col = url_col
        self.html_col = html_col
        self.lang_col = lang_col
        self.emit_errors = emit_errors

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        htmls = batch[self.html_col].to_pylist()
        langs = (
            batch[self.lang_col].to_pylist()
            if self.lang_col in batch.column_names
            else [""] * len(urls)
        )
        rows = []
        errors: list[dict] = []
        for url, html, lang in zip(urls, htmls, langs):
            if html is None:
                errors.append({"url": url, "error": "null_html"})
                continue
            try:
                doc = parse_document(url, html, self.cfg)
            except Exception as exc:  # noqa: BLE001 - routed, not swallowed
                errors.append({"url": url, "error": f"parse: {exc}"})
                continue
            if doc is None:
                errors.append({"url": url, "error": "unparseable_html"})
                continue
            # lingual enrichment only for supported languages; other languages
            # keep the SimpleParser output (reference fallback,
            # parser/parser.py:207-221)
            if self.linguist is not None and (lang or "en").startswith("en"):
                self.linguist.enrich_document(doc["sentences"])
            doc["lang"] = lang or ""
            rows.append(doc)
        if not self.emit_errors:
            return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
        out = pa.Table.from_pylist(rows, schema=PARSE_ERROR_DOC_SCHEMA)
        if errors:
            err_rows = [
                {"doc_name": e["url"], "error": e["error"]} for e in errors
            ]
            out = pa.concat_tables(
                [out, pa.Table.from_pylist(err_rows, schema=PARSE_ERROR_DOC_SCHEMA)]
            )
        return out


#: DOC_SCHEMA + nullable ``error`` column: a doc row has error=null, an
#: error row has every doc field null. The reference silently DROPS
#: unparseable docs (``parser.py:257-264``); at 10^12-doc scale silent loss
#: is unauditable, so failures ride an explicit side-channel the caller
#: splits off with ``split_errors``.
PARSE_ERROR_DOC_SCHEMA = DOC_SCHEMA.append(pa.field("error", pa.string()))


def split_errors(
    ds: "ray.data.Dataset",
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """(documents, errors) from an ``emit_errors=True`` parse output; the
    error side is projected down to ``(doc_name, error)``."""
    import pyarrow.compute as pc

    def keep_docs(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch["error"]))

    def keep_errors(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch["error"])).select(
            ["doc_name", "error"]
        )

    return (
        ds.map_batches(keep_docs, batch_format="pyarrow"),
        ds.map_batches(keep_errors, batch_format="pyarrow"),
    )


def parse_webpages(
    ds: "ray.data.Dataset",
    cfg: ParserConfig | None = None,
    enrich: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 64,
    **cols,
) -> "ray.data.Dataset":
    """``(url, html, lang)`` rows -> nested document rows.

    ``batch_size`` is small on purpose: HTML blobs are large and the output
    rows (full context trees) are larger still — keep batch x concurrency
    within worker heap."""
    return map_stage(
        ds, ParseStage, {"cfg": cfg, "enrich": enrich, **cols}, batch_size, concurrency
    )
