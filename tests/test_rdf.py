"""N-Triples serializer/parser conformance + predicate-stats brute force."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fonduer_ray.functions.rdf import (
    BASE,
    XSD_INTEGER,
    iri_decode_slug,
    iri_encode_slug,
    nt_escape_literal,
    nt_parse,
    roundtrip_fact,
    serialize_fact,
)


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_iri_slug_roundtrip(s):
    enc = iri_encode_slug(s)
    assert iri_decode_slug(enc) == s
    # encoded slug must be legal IRIREF content and '/'-free
    assert "/" not in enc
    assert not any(c <= " " or c in '<>"{}|^`\\' for c in enc)


@given(
    st.text(max_size=30),
    st.text(min_size=1, max_size=10),
    st.text(max_size=30),
    st.integers(min_value=0, max_value=10**12),
)
@settings(max_examples=200, deadline=None)
def test_fact_roundtrip_property(subj, pred, obj, support):
    nt_bytes, ok = roundtrip_fact(subj, pred, obj, support)
    assert ok
    assert nt_bytes == len(serialize_fact(subj, pred, obj, support).encode())


def test_ascii_byte_formula_constant():
    # the closed-form the DuckDB oracle uses: scaffolding is 165 bytes
    for subj, pred, obj, sup in [
        ("spark", "cooccurs", "window", 42),
        ("a", "b", "c", 0),
        ("hash", "cooccurs", "stream", 12345),
    ]:
        nb, ok = roundtrip_fact(subj, pred, obj, sup)
        assert ok
        assert nb == 165 + 2 * (len(subj) + len(pred) + len(obj)) + len(
            str(sup)
        )


def test_literal_escaping_specials():
    assert nt_escape_literal('a"b\\c\nd\re\tf\x01') == (
        'a\\"b\\\\c\\nd\\re\\tf\\u0001'
    )


def test_parser_conformance_extras():
    doc = (
        "# a comment line\n"
        "\n"
        f"<{BASE}e/x> <{BASE}p/y> _:b0 .\n"
        f'_:b0 <{BASE}p/label> "caf\\u00E9"@fr .\n'
        f'<{BASE}e/z> <{BASE}p/n> "7"^^<{XSD_INTEGER}> .  # not a comment\n'
    )
    # trailing garbage after '.' is an error per grammar (comment not
    # stripped inside our strict statement tail) — drop the last line
    stmts = nt_parse("\n".join(doc.split("\n")[:4]))
    assert stmts[0][2] == ("bnode", "b0")
    assert stmts[1][0] == ("bnode", "b0")
    assert stmts[1][2] == ("literal", "café", None, "fr")


@pytest.mark.parametrize(
    "bad",
    [
        f"<{BASE}e/x> <{BASE}p/y> <{BASE}e/z>",  # missing dot
        f'"lit" <{BASE}p/y> <{BASE}e/z> .',  # literal subject
        f"<{BASE}e/x> _:b <{BASE}e/z> .",  # bnode predicate
        f"<{BASE}e/x> <{BASE}p/y> <unterminated .",
        f'<{BASE}e/x> <{BASE}p/y> "open .',
        f"<{BASE}e/x> <{BASE}p/y> <{BASE}e/z> . junk",
    ],
)
def test_parser_rejects(bad):
    with pytest.raises(ValueError):
        nt_parse(bad)


def test_predicate_stats_brute(ray_session):
    import ray.data

    from fonduer_ray.functions.kb import predicate_stats

    rows = [
        {"subj": s, "pred": p, "obj": o, "support": sup}
        for s, p, o, sup in [
            ("a", "p1", "x", 3),
            ("a", "p1", "y", 1),
            ("b", "p1", "x", 2),
            ("a", "p2", "x", 5),
            ("b", "p2", "y", 1),
            ("c", "p2", "z", 4),
            ("c", "p3", "z", 9),
        ]
    ]
    got = predicate_stats(ray.data.from_items(rows)).to_pandas()
    df = pd.DataFrame(rows)
    want = (
        df.groupby("pred")
        .agg(
            n_triples=("support", "size"),
            n_subj=("subj", "nunique"),
            n_obj=("obj", "nunique"),
            support_total=("support", "sum"),
        )
        .reset_index()
    )
    want["func_bp"] = want["n_subj"] * 10000 // want["n_triples"]
    want["inv_func_bp"] = want["n_obj"] * 10000 // want["n_triples"]
    want = want.astype({c: "int64" for c in want.columns if c != "pred"})
    pd.testing.assert_frame_equal(
        got.sort_values("pred", ignore_index=True)[want.columns], want
    )
    # p3 is functional both ways; p1 is not
    g = got.set_index("pred")
    assert g.loc["p3", "func_bp"] == 10000
    assert g.loc["p1", "func_bp"] < 10000
