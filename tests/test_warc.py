"""WARC/WET source + sink: record parsing, gzip member handling, HTTP
body framing, and a write→read round trip through Ray Data."""

from __future__ import annotations

import gzip

import pyarrow as pa
import pytest

from fonduer_ray.sources import warc as W


def _record(rtype: str, uri: str, date: str, payload: bytes,
            lang: str = "") -> bytes:
    hdrs = [
        b"WARC/1.0",
        f"WARC-Type: {rtype}".encode(),
        f"WARC-Target-URI: {uri}".encode(),
        f"WARC-Date: {date}".encode(),
        f"Content-Length: {len(payload)}".encode(),
    ]
    if lang:
        hdrs.append(f"WARC-Identified-Content-Language: {lang}".encode())
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + payload + b"\r\n\r\n"


HTTP = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
HTML = b"<html><body><p>hello graph</p></body></html>"


def _sample_warc() -> bytes:
    return (
        _record("warcinfo", "", "2020-01-01T00:00:00Z", b"software: test")
        + _record("response", "http://a.example/x", "2020-06-01T12:30:00Z",
                  HTTP + HTML)
        + _record("request", "http://a.example/x", "2020-06-01T12:30:00Z",
                  b"GET /x HTTP/1.1")
        + _record("conversion", "http://b.example/y", "2021-01-02T03:04:05Z",
                  "plain text body".encode(), lang="eng")
    )


def test_parse_records_and_type_routing():
    t = W.warc_bytes_to_rows(_sample_warc())
    assert t.num_rows == 2  # warcinfo + request skipped
    rows = t.to_pylist()
    resp = next(r for r in rows if r["url"] == "http://a.example/x")
    conv = next(r for r in rows if r["url"] == "http://b.example/y")
    assert resp["html"] == HTML  # HTTP headers stripped
    assert resp["text"] == ""
    assert conv["html"] == b""
    assert conv["text"] == "plain text body"
    assert conv["lang"] == "eng"
    # WARC-Date parsed to timestamp[us]
    assert str(resp["warc_ts"]).startswith("2020-06-01 12:30:00")


def test_gzip_whole_file_and_per_record_members():
    raw = _sample_warc()
    whole = gzip.compress(raw, mtime=0)
    assert W.warc_bytes_to_rows(whole).num_rows == 2
    # per-record gzip members, concatenated (Common Crawl layout)
    members = b"".join(
        gzip.compress(chunk, mtime=0)
        for chunk in (
            _record("response", "http://a.example/1",
                    "2020-01-01T00:00:00Z", HTTP + HTML),
            _record("response", "http://a.example/2",
                    "2020-01-01T00:00:01Z", HTTP + HTML),
        )
    )
    t = W.warc_bytes_to_rows(members)
    assert t.num_rows == 2
    assert t["url"].to_pylist() == ["http://a.example/1", "http://a.example/2"]


def test_truncated_and_junk_tails_do_not_raise():
    raw = _sample_warc()
    assert W.warc_bytes_to_rows(raw[: len(raw) - 30]).num_rows >= 1
    assert W.warc_bytes_to_rows(raw + b"garbage trailing bytes").num_rows == 2
    assert W.warc_bytes_to_rows(b"").num_rows == 0


def test_http_body_framing_variants():
    assert W._http_body(b"HTTP/1.1 200 OK\r\nA: b\r\n\r\nBODY") == b"BODY"
    assert W._http_body(b"HTTP/1.0 200 OK\nA: b\n\nBODY") == b"BODY"
    assert W._http_body(b"not http at all") == b"not http at all"


def test_roundtrip_through_ray(ray_session, tmp_path):
    import ray.data

    table = pa.table(
        {
            "url": ["http://r.example/1", "http://r.example/2"],
            "warc_ts": pa.array(
                [1_600_000_000_000_000, 1_600_000_001_000_000],
                pa.timestamp("us"),
            ),
            "html": [HTML, b""],
            "text": ["", "wet text"],
            "lang": ["", "eng"],
        }
    )
    out_dir = str(tmp_path / "warc_out")
    n_files = W.write_warc(ray.data.from_arrow(table), out_dir)
    assert n_files >= 1

    back = (
        W.read_warc(out_dir)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert back["url"].tolist() == ["http://r.example/1", "http://r.example/2"]
    assert bytes(back["html"][0]) == HTML
    assert back["text"][1] == "wet text"
    assert str(back["warc_ts"][0]).startswith("2020-09-13")


def test_read_warc_feeds_the_parse_stage(ray_session, tmp_path):
    """The WARC reader's output schema drops straight into the engine's
    HTML parse path (same columns as sources/webpages.py)."""
    import ray.data

    from fonduer_ray.sources.warc import WEBPAGE_SCHEMA

    p = tmp_path / "one.warc"
    p.write_bytes(
        _record("response", "http://p.example/doc", "2022-02-02T00:00:00Z",
                HTTP + HTML)
    )
    ds = W.read_warc(str(p))
    assert [f.name for f in WEBPAGE_SCHEMA] == ds.schema().names
    from fonduer_ray.pipelines.kg import KGConfig, build_triples

    # the KG extraction pipeline consumes the reader's output unchanged
    # (this page yields no spec triples; the point is schema compatibility)
    out = build_triples(ds.select_columns(["url", "html", "lang"]), KGConfig())
    assert out.count() == 0
