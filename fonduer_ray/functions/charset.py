"""Charset detection + decoding for raw web bytes.

Real crawls are an encoding soup: UTF-8 with and without BOM, UTF-16
both endiannesses, and a long legacy tail that is overwhelmingly
windows-1252 mislabeled as latin-1 or nothing at all. The reference
ingests Python strings and never sees raw bytes; this operator is the
byte-side front door a 100-TB HTML corpus needs before any parse.

Detection precedence follows the HTML5 encoding sniff (WHATWG
"determining the character encoding", published algorithm):

1. **BOM** — UTF-8 / UTF-16LE / UTF-16BE byte-order marks win outright.
2. **meta prescan** — an ASCII scan of the first ``prescan_bytes``
   (default 1024, the spec's window) for ``<meta charset=...>`` or
   ``<meta http-equiv="content-type" content="...; charset=...">``.
3. **UTF-8 validity** — a document that strict-decodes as UTF-8 is
   UTF-8 (ASCII is a subset, so pure-ASCII lands here too).
4. **windows-1252 fallback** — the spec's default for the legacy web;
   the five undefined cp1252 bytes decode via latin-1 passthrough.

Stateless ``map_batches`` — at scale this fuses into the fetch/read
stage, exactly like URL canonicalization.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

_BOMS: tuple[tuple[bytes, str], ...] = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

#: charset name extraction inside a prescanned meta tag (ASCII-safe)
_META_CHARSET = re.compile(
    rb"<meta[^>]+?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-]+)", re.IGNORECASE
)

#: labels normalized to Python codec names (the WHATWG alias set's
#: high-frequency members; unknown labels fall through to the heuristic)
_LABEL_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "iso-8859-1": "windows-1252",  # WHATWG maps latin-1 to cp1252
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "iso-8859-15": "iso-8859-15",
    "windows-1251": "windows-1251",
    "cp1251": "windows-1251",
    "koi8-r": "koi8-r",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "euc-jp": "euc_jp",
    "gbk": "gbk",
    "gb2312": "gbk",  # WHATWG maps gb2312 to gbk
    "big5": "big5",
    "euc-kr": "euc_kr",
    # WHATWG prescan: a meta-declared utf-16 label is treated as UTF-8 —
    # an ASCII-readable <meta> tag cannot occur inside a real UTF-16
    # document, so trusting the label would strict-decode an ASCII/UTF-8
    # page into mojibake. BOM-based UTF-16 detection (above) is unaffected.
    "utf-16": "utf-8",
    "utf-16le": "utf-8",
    "utf-16be": "utf-8",
}


def _decode_1252(raw: bytes) -> str:
    """windows-1252 with the spec's latin-1 passthrough for the five
    undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) — never fails."""
    try:
        return raw.decode("cp1252")
    except UnicodeDecodeError:
        return "".join(
            raw[i : i + 1].decode("cp1252", errors="strict")
            if raw[i] not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else chr(raw[i])
            for i in range(len(raw))
        )


def sniff_charset(raw: bytes, prescan_bytes: int = 1024) -> tuple[str, str]:
    """One document's bytes -> ``(encoding, method)`` where method is
    ``bom`` | ``meta`` | ``utf8-valid`` | ``fallback``."""
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            return enc, "bom"
    m = _META_CHARSET.search(raw[:prescan_bytes])
    if m:
        label = m.group(1).decode("ascii", errors="replace").lower()
        enc = _LABEL_ALIASES.get(label)
        if enc is not None:
            return enc, "meta"
    try:
        raw.decode("utf-8", errors="strict")
        return "utf-8", "utf8-valid"
    except UnicodeDecodeError:
        return "windows-1252", "fallback"


def decode_bytes(raw: bytes, prescan_bytes: int = 1024) -> tuple[str, str, str]:
    """One document's bytes -> ``(text, encoding, method)``; BOMs are
    stripped from the decoded text (they are transport, not content)."""
    enc, method = sniff_charset(raw, prescan_bytes)
    if method == "bom":
        for bom, e in _BOMS:
            if e == enc:
                raw = raw[len(bom) :]
                break
    if enc == "windows-1252":
        return _decode_1252(raw), enc, method
    try:
        return raw.decode(enc, errors="strict"), enc, method
    except (UnicodeDecodeError, LookupError):
        # a meta tag can lie about its own body; degrade per spec habit
        return _decode_1252(raw), "windows-1252", "fallback"


def decode_charsets(
    ds: "ray.data.Dataset",
    bytes_col: str = "raw",
    prescan_bytes: int = 1024,
) -> "ray.data.Dataset":
    """Append ``(text, encoding, method)`` decoded from ``bytes_col``
    (binary) via the HTML5 sniff above. Null/empty payloads decode to
    empty utf-8 text."""

    def decode(t: pa.Table) -> pa.Table:
        texts, encs, methods = [], [], []
        for raw in t[bytes_col].to_pylist():
            if not raw:
                texts.append("")
                encs.append("utf-8")
                methods.append("utf8-valid")
                continue
            text, enc, method = decode_bytes(raw, prescan_bytes)
            texts.append(text)
            encs.append(enc)
            methods.append(method)
        return (
            t.append_column("text_decoded", pa.array(texts, pa.string()))
            .append_column("encoding", pa.array(encs, pa.string()))
            .append_column("method", pa.array(methods, pa.string()))
        )

    return ds.map_batches(decode, batch_format="pyarrow")
