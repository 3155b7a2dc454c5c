"""WARC / WET source and sink: read Common-Crawl-style web archives into
the engine's canonical webpage table ``(url, warc_ts, html, text, lang)``
and write that table back out as spec-conformant WARC.

Format per ISO 28500 (the public WARC 1.0/1.1 spec): a WARC file is a
sequence of records, each ``WARC/1.x CRLF``, CRLF-separated named headers
(``Content-Length`` is mandatory), one blank line, ``Content-Length``
payload bytes, then two CRLFs. Real Common Crawl ships one gzip member
per record; this reader accepts plain files, whole-file gzip, and
multi-member (per-record) gzip — the :func:`_gunzip_members` loop walks
concatenated members exactly like ``zlib`` does.

Record mapping:

- ``WARC-Type: response`` → the HTTP response body becomes the ``html``
  binary column (headers stripped per the HTTP/1.1 framing: everything up
  to the first blank line), ``text`` empty (the parse stage fills it).
- ``WARC-Type: conversion`` (WET text extracts) → payload becomes the
  ``text`` column, ``html`` empty.
- ``WARC-Target-URI`` → ``url``; ``WARC-Date`` (ISO-8601, e.g.
  ``2020-01-01T00:00:00Z``) → ``warc_ts`` (timestamp[us]); language from
  ``WARC-Identified-Content-Language`` when present (WET convention)
  else ``""``.

Scale: :func:`read_warc` maps ``ray.data.read_binary_files`` (one task
per archive file — WARC's per-record gzip members make mid-file splits
impractical without an external CDX offset index, which is how Common
Crawl itself parallelizes finer; our unit of parallelism is the archive
segment file, of which CC has ~72k per crawl) through a pure per-file
``map_batches`` parser — no state, no shuffle. Output rides the same
schema as ``sources/webpages.py`` so every downstream stage (parse,
mention, KG) consumes it unchanged.

Reference analog: fonduer's preprocessors read files from disk one doc
per file (``parser/preprocessors/doc_preprocessor.py:10-84``); a web
archive container is the scale-native equivalent for the BASELINE.json
Common-Crawl input_hint.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

import ray.data

_CRLF = b"\r\n"

#: canonical output schema — identical to sources/webpages.py
WEBPAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


# --------------------------------------------------------------------- parse


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a gzip stream of one or MORE concatenated members
    (Common Crawl gzips each record as its own member); ``unused_data``
    marks each member boundary exactly."""
    import zlib

    out = io.BytesIO()
    buf = data
    while buf:
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(buf))
        out.write(d.flush())
        buf = d.unused_data
    return out.getvalue()


def _parse_warc_date(s: str) -> int:
    """WARC-Date (ISO-8601 UTC) → microseconds since epoch; 0 if absent
    or malformed (a bad date should not drop the record)."""
    try:
        s = s.strip()
        if s.endswith("Z"):
            s = s[:-1] + "+00:00"
        dt = datetime.fromisoformat(s)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except (ValueError, OverflowError):
        return 0


def _http_body(payload: bytes) -> bytes:
    """Strip HTTP response headers: body starts after the first blank
    line (CRLFCRLF per RFC 9112; tolerate bare LFLF). Payloads that do
    not look like an HTTP message pass through whole."""
    if not payload.startswith(b"HTTP/"):
        return payload
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = payload.find(sep)
        if idx >= 0:
            return payload[idx + len(sep):]
    return payload


def parse_warc_records(data: bytes):
    """Yield ``(headers: dict[str,str], payload: bytes)`` per record of a
    raw (already-decompressed) WARC byte stream. Tolerates leading
    whitespace between records; stops cleanly at truncated tails."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            break  # junk tail
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:  # lines[0] is the version line
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.decode("utf-8", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + length > n:
            break  # truncated record
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def warc_bytes_to_rows(data: bytes) -> pa.Table:
    """One WARC archive (plain or gzip) → webpage-schema Arrow table.
    Non-document records (warcinfo, request, metadata) are skipped."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for headers, payload in parse_warc_records(data):
        rtype = headers.get("warc-type", "")
        if rtype not in ("response", "conversion"):
            continue
        urls.append(headers.get("warc-target-uri", ""))
        tss.append(_parse_warc_date(headers.get("warc-date", "")))
        langs.append(headers.get("warc-identified-content-language", ""))
        if rtype == "response":
            htmls.append(_http_body(payload))
            texts.append("")
        else:
            htmls.append(b"")
            texts.append(payload.decode("utf-8", "replace"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=WEBPAGE_SCHEMA,
    )


def read_warc(paths: "str | list[str]") -> "ray.data.Dataset":
    """WARC/WET archive files → webpage-table Dataset; one read task per
    archive file, pure per-file parsing, no shuffle."""

    def parse_files(batch: pa.Table) -> pa.Table:
        tables = [warc_bytes_to_rows(b.as_py()) for b in batch["bytes"]]
        if not tables:
            return WEBPAGE_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(paths).map_batches(
        parse_files, batch_format="pyarrow"
    )


# --------------------------------------------------------------------- write


def _format_warc_date(ts_us: int) -> str:
    return datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def rows_to_warc_bytes(table: pa.Table) -> bytes:
    """Webpage-schema table → WARC 1.0 bytes: ``response`` records for rows
    with html, ``conversion`` records for text-only rows. Record ids are
    content-derived (md5 of url), so output is deterministic."""
    import hashlib

    out = io.BytesIO()
    for row in table.to_pylist():
        html = row.get("html") or b""
        text = row.get("text") or ""
        is_resp = len(html) > 0
        if is_resp:
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
            )
            rtype, ctype = "response", "application/http; msgtype=response"
        else:
            payload = text.encode()
            rtype, ctype = "conversion", "text/plain"
        ts = row.get("warc_ts")
        if hasattr(ts, "timestamp"):  # datetime from Arrow timestamp
            # Arrow timestamp("us") without tz round-trips to a NAIVE
            # datetime whose .timestamp() is local-tz dependent; WARC
            # dates are UTC by spec, so pin UTC before converting.
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            ts_us = int(ts.timestamp() * 1_000_000)
        else:
            ts_us = int(ts or 0)
        rid = hashlib.md5((row.get("url") or "").encode()).hexdigest()
        headers = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
            f"WARC-Date: {_format_warc_date(ts_us)}\r\n"
            f"WARC-Target-URI: {row.get('url') or ''}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        )
        out.write(headers.encode())
        out.write(payload)
        out.write(b"\r\n\r\n")
    return out.getvalue()


def write_warc(ds: "ray.data.Dataset", out_dir: str, compress: bool = True) -> int:
    """Write the webpage table as one ``part-{i:05d}.warc[.gz]`` per block
    (resumable, never one giant file). Returns the number of files."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table, ctx=None) -> pa.Table:
        raw = rows_to_warc_bytes(batch)
        # name by content hash: deterministic and collision-free per block
        import hashlib

        name = hashlib.md5(raw).hexdigest()[:16]
        ext = "warc.gz" if compress else "warc"
        path = os.path.join(out_dir, f"part-{name}.{ext}")
        data = gzip.compress(raw, mtime=0) if compress else raw
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string())})

    paths = ds.map_batches(write_block, batch_format="pyarrow").take_all()
    return len(paths)
