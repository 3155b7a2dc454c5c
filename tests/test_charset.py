"""HTML5-style charset sniffing and decoding (functions/charset.py)."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from fonduer_ray.functions.charset import (
    decode_bytes,
    decode_charsets,
    sniff_charset,
)


def test_sniff_precedence_bom_beats_meta():
    raw = b"\xef\xbb\xbf" + '<meta charset="shift_jis">hi'.encode("utf-8")
    assert sniff_charset(raw) == ("utf-8", "bom")
    assert sniff_charset(b"\xff\xfe" + "x".encode("utf-16-le")) == (
        "utf-16-le",
        "bom",
    )
    assert sniff_charset(b"\xfe\xff" + "x".encode("utf-16-be")) == (
        "utf-16-be",
        "bom",
    )


def test_sniff_meta_variants_and_aliases():
    assert sniff_charset(b'<META CHARSET="UTF-8">x') == ("utf-8", "meta")
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=iso-8859-1">x'
    ) == ("windows-1252", "meta")  # WHATWG maps latin-1 -> cp1252
    assert sniff_charset(b"<meta charset=gb2312>x") == ("gbk", "meta")
    # unknown label falls through to the heuristic
    assert sniff_charset(b"<meta charset=klingon>abc") == (
        "utf-8",
        "utf8-valid",
    )


def test_sniff_prescan_window():
    # a meta tag past the prescan window is not seen
    raw = b" " * 2000 + b'<meta charset="shift_jis">'
    assert sniff_charset(raw, prescan_bytes=1024) == ("utf-8", "utf8-valid")


def test_decode_utf8_validity_and_fallback():
    text, enc, method = decode_bytes("Café".encode("utf-8"))
    assert (text, enc, method) == ("Café", "utf-8", "utf8-valid")
    text, enc, method = decode_bytes("Café".encode("cp1252"))
    assert (text, enc, method) == ("Café", "windows-1252", "fallback")


def test_decode_strips_bom():
    text, enc, method = decode_bytes(b"\xef\xbb\xbfhi")
    assert (text, enc, method) == ("hi", "utf-8", "bom")
    text, enc, method = decode_bytes(b"\xff\xfe" + "hé".encode("utf-16-le"))
    assert (text, enc, method) == ("hé", "utf-16-le", "bom")


def test_decode_undefined_cp1252_bytes_pass_through():
    # 0x81 is undefined in cp1252; spec behavior is latin-1 passthrough
    text, enc, method = decode_bytes(b"a\x81b\xe9")
    assert enc == "windows-1252" and method == "fallback"
    assert text == "a\x81bé"


def test_decode_lying_meta_degrades_to_fallback():
    # meta says utf-16-be but the ODD-length body cannot decode as such;
    # (an even-length ascii body would "succeed" as CJK mojibake — the
    # spec-faithful cost of trusting the declared charset)
    raw = b"<meta charset=utf-16be>x!"
    assert len(raw) % 2 == 1
    text, enc, method = decode_bytes(raw)
    assert enc == "windows-1252" and method == "fallback"
    assert text == "<meta charset=utf-16be>x!"


def test_decode_charsets_dataset(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc": pa.array(["a", "b", "c"], pa.string()),
                "raw": pa.array(
                    [
                        b"\xef\xbb\xbf" + "Café".encode("utf-8"),
                        "Café".encode("cp1252"),
                        None,
                    ],
                    pa.binary(),
                ),
            }
        )
    )
    rows = {r["doc"]: r for r in decode_charsets(ds, bytes_col="raw").take_all()}
    assert rows["a"]["text_decoded"] == "Café"
    assert rows["a"]["encoding"] == "utf-8"
    assert rows["a"]["method"] == "bom"
    assert rows["b"]["encoding"] == "windows-1252"
    assert rows["b"]["text_decoded"] == "Café"
    assert rows["c"]["text_decoded"] == ""
    assert rows["c"]["encoding"] == "utf-8"
