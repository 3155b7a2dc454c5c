"""Sources: Common-Crawl-style web-page Parquet reader + deterministic
synthetic corpus generator.

Input table shape (authoritative, BASELINE.json ``input_hint``):
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. The reader prunes columns at the read (only ``url, html,
lang`` ever leave storage for the parse stage).

The generator synthesises that exact shape deterministically (fixed seed,
fixed templates — template coverage per FIXTURES.md F1: plain text, tables
with row/colspan + nested tables, figures, entity-spec pages with known gold
triples, faulty pages, flatten pages, non-English pages). The expected gold
triple set is generated alongside, so P/R is computable without the
reference binary.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

INPUT_COLUMNS = ["url", "html", "lang"]


def read_webpages(
    path: str,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Read the input table with column pruning at the read.

    ``override_num_blocks``: Ray's default block split can land near the
    CPU count, which quantizes a CPU-bound downstream map into 1-2 uneven
    task waves; pass ~8x the cluster CPUs for smooth scheduling."""
    return ray.data.read_parquet(
        path, columns=columns or INPUT_COLUMNS, override_num_blocks=override_num_blocks
    )


# ---------------------------------------------------------------------------
# synthetic corpus
# ---------------------------------------------------------------------------

_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark flink query page index store shard block chunk "
    "filter group count value record field tuple"
).split()

_ATTR = "stg_temp_max"


def _part_name(i: int) -> str:
    return f"AB{100 + i}"


def _spec_page(rng: random.Random, n_rows: int) -> tuple[str, list[tuple[str, str]]]:
    """Entity-spec table page + its gold (subj, obj) pairs for pred=stg_temp_max."""
    rows = []
    gold = []
    for _ in range(n_rows):
        part = _part_name(rng.randrange(0, 200))
        temp = str(rng.choice([85, 100, 125, 150, 175]))
        rows.append(f"<tr><td>{part}</td><td>-{rng.choice([40, 55, 65])}</td><td>{temp}</td></tr>")
        gold.append((part, temp))
    html = (
        "<html><body><h1>Component ratings.</h1>"
        "<table><caption>Storage temperature.</caption>"
        "<tr><th>Part</th><th>Min</th><th rowspan=\"1\">Max</th></tr>"
        + "".join(rows)
        + "</table>"
        + f"<p>The device {gold[0][0]} is rated to {gold[0][1]} degrees.</p>"
        "</body></html>"
    )
    return html, gold


def _text_page(rng: random.Random, n_sents: int) -> str:
    sents = []
    for _ in range(n_sents):
        sents.append(" ".join(rng.choice(_WORDS) for _ in range(rng.randrange(4, 12))) + ".")
    paras = []
    for i in range(0, len(sents), 3):
        paras.append("<p>" + " ".join(sents[i : i + 3]) + "</p>")
    return "<html><body>" + "".join(paras) + "</body></html>"


def _figure_page(rng: random.Random) -> str:
    return (
        "<html><body><p>Diagram follows.</p>"
        f"<figure><img src=\"img{rng.randrange(10)}.png\"/>"
        "<figcaption>System overview.</figcaption></figure>"
        "<img src=\"solo.png\"/></body></html>"
    )


def _flatten_page(rng: random.Random) -> str:
    return (
        "<html><body><p>alpha <span>beta</span> gamma<br/>delta.</p>"
        "<style>p {}</style><script>var q;</script>"
        "<p>epsilon—zeta.</p></body></html>"
    )


def _faulty_page(i: int) -> str:
    return ["", "<html><body></body></html>", "<html><body><p>a<p>b</body></html>"][i % 3]


def generate_corpus(
    out_path: str,
    n_docs: int = 500,
    seed: int = 42,
    mega_doc_every: int = 0,
    rows_per_file: int = 25000,
    row_group_size: int = 1024,
) -> dict:
    """Write a deterministic corpus Parquet + gold triples Parquet.

    Returns ``{"corpus": path, "gold": path, "n_docs": int}``. Skew knob:
    ``mega_doc_every`` > 0 inserts an oversized doc every k docs (straggler
    test). Gold triples are ``(doc, subj, pred, obj)``.

    The corpus is sharded into files of ``rows_per_file`` docs with small
    row groups — Ray Data parallelizes ``read_parquet`` across files and
    row groups, so a single giant row group would serialize the read."""
    rng = random.Random(seed)
    rows = []
    gold_rows = []
    for i in range(n_docs):
        url = f"https://example.org/doc{i:06d}"
        kind = i % 10
        lang = "en"
        if kind < 4:
            html, gold = _spec_page(rng, rng.randrange(2, 6))
            for subj, obj in gold:
                gold_rows.append(
                    {"doc": url, "subj": subj, "pred": _ATTR, "obj": obj}
                )
        elif kind < 7:
            html = _text_page(rng, 40 if (mega_doc_every and i % mega_doc_every == 0) else rng.randrange(3, 9))
        elif kind == 7:
            html = _figure_page(rng)
        elif kind == 8:
            html = _flatten_page(rng)
        else:
            if i % 20 == 9:
                html = _faulty_page(i)
            else:
                html, lang = _text_page(rng, 4), "de"
        rows.append(
            {
                "url": url,
                "warc_ts": 1_700_000_000_000_000 + i,
                "html": html.encode("utf-8"),
                "text": "",
                "lang": lang,
            }
        )
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    import os
    import shutil

    os.makedirs(out_path, exist_ok=True)
    corpus = f"{out_path}/corpus.parquet"
    gold = f"{out_path}/gold.parquet"
    if os.path.isfile(corpus):
        os.remove(corpus)
    shutil.rmtree(corpus, ignore_errors=True)
    os.makedirs(corpus, exist_ok=True)
    for shard, lo in enumerate(range(0, len(rows), rows_per_file)):
        table = pa.Table.from_pylist(rows[lo : lo + rows_per_file], schema=schema)
        pq.write_table(
            table,
            f"{corpus}/part-{shard:05d}.parquet",
            row_group_size=row_group_size,
        )
    gold_schema = pa.schema(
        [("doc", pa.string()), ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
    )
    pq.write_table(pa.Table.from_pylist(gold_rows, schema=gold_schema), gold)
    return {"corpus": corpus, "gold": gold, "n_docs": n_docs}
