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


def test_meta_declared_utf16_treated_as_utf8():
    # WHATWG prescan: an ASCII-readable <meta> tag cannot occur inside a
    # real UTF-16 document, so a meta-declared utf-16 label maps to UTF-8
    # instead of strict-decoding an ASCII page into mojibake. An odd
    # length would make the lie detectable; the EVEN-length case is the
    # one the remap protects.
    for raw in (b"<meta charset=utf-16be>x!", b"<meta charset=utf-16>ab!!"):
        text, enc, method = decode_bytes(raw)
        assert (enc, method) == ("utf-8", "meta")
        assert text == raw.decode("ascii")


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
