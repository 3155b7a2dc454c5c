"""W3C N-Triples (RDF 1.1) serialization of the canonical triple table.

A KB-construction pipeline has to hand its graph to downstream consumers
(SPARQL stores, alignment tools, archive dumps), and the lingua franca is
the line-oriented N-Triples format — one RDF statement per line, UTF-8,
spec-defined escaping.  The reference materializes its KB as ORM rows in
Postgres (/root/reference/src/fonduer/candidates/models/candidate.py);
here the materialization target is an interchange text format instead, so
the operator must be *provably invertible*: every serialized line is
parsed back by a real grammar-driven N-Triples reader and compared to the
source row.

Each ``(subj, pred, obj, support)`` fact emits TWO statements:

1. the fact itself, entity IRIs on both ends::

       <{base}e/S> <{base}p/P> <{base}e/O> .

2. a statement-id line carrying the support count as a typed literal
   (reification-lite; the statement IRI packs the three slugs)::

       <{base}s/S/P/O> <{base}p/support> "N"^^<...XMLSchema#integer> .

so both grammar paths — IRI object and typed-literal object — are
exercised on every row.

Escaping follows the spec: IRIs percent-encode the characters IRIREF
forbids (controls, space, ``<>"{}|^`\\``, and ``%`` itself so decoding is
unambiguous; ``/`` inside a slug is encoded so the statement-IRI packing
stays invertible); literals use ECHAR for ``\\ \" \\n \\r \\t`` and
``\\uXXXX`` for the remaining C0 controls.  The parser is NOT the
serializer run backwards: it is a tokenizer for the published grammar
(comments, blank lines, ``\\uXXXX``/``\\UXXXXXXXX`` in both IRIs and
literals, language tags, blank-node labels), so round-trip success is
evidence of conformance, not of symmetry.

Scale shape: serialize -> parse -> compare is ONE stateless
``map_batches`` pass over the triple table (itself 100-1000x smaller than
the corpus); no shuffle, no driver state.  A production dump would write
the line column straight to a partitioned text/Parquet sink; here the
lines are folded into per-row byte counts so the result is a bounded,
SQL-checkable table.
"""

from __future__ import annotations

import pyarrow as pa

import ray

BASE = "http://kb.local/"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"

# IRIREF production forbids x00-x20, <>"{}|^` and \ ; % starts a percent
# triple so raw % must be encoded too; / is our slug separator.
_IRI_UNSAFE = set('<>"{}|^`\\% /') | {chr(c) for c in range(0x21)}


def iri_encode_slug(s: str) -> str:
    """Percent-encode ``s`` (UTF-8) so it can sit inside an IRIREF and
    inside a ``/``-packed statement IRI."""
    out = []
    for ch in s:
        if ch in _IRI_UNSAFE or ord(ch) < 0x21:
            out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
        else:
            out.append(ch)
    return "".join(out)


def iri_decode_slug(s: str) -> str:
    out = bytearray()
    i, n = 0, len(s)
    while i < n:
        if s[i] == "%":
            if i + 3 > n:
                raise ValueError("truncated percent escape in IRI slug")
            out.extend(bytes([int(s[i + 1 : i + 3], 16)]))
            i += 3
        else:
            out.extend(s[i].encode("utf-8"))
            i += 1
    return out.decode("utf-8")


_ECHAR = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def nt_escape_literal(s: str) -> str:
    """STRING_LITERAL_QUOTE body escaping: ECHAR for the five specials,
    ``\\uXXXX`` for remaining C0 controls, everything else raw UTF-8."""
    out = []
    for ch in s:
        if ch in _ECHAR:
            out.append(_ECHAR[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04X}")
        else:
            out.append(ch)
    return "".join(out)


def serialize_fact(subj: str, pred: str, obj: str, support: int) -> str:
    """The two N-Triples lines (newline-terminated) for one fact row."""
    s, p, o = (iri_encode_slug(x) for x in (subj, pred, obj))
    fact = f"<{BASE}e/{s}> <{BASE}p/{p}> <{BASE}e/{o}> .\n"
    supp = (
        f"<{BASE}s/{s}/{p}/{o}> <{BASE}p/support> "
        f'"{support}"^^<{XSD_INTEGER}> .\n'
    )
    return fact + supp


# ---------------------------------------------------------------- parser


def _read_uchar(s: str, i: int) -> tuple[str, int]:
    # s[i] == '\\' and s[i+1] in 'uU'
    width = 4 if s[i + 1] == "u" else 8
    hexs = s[i + 2 : i + 2 + width]
    if len(hexs) != width:
        raise ValueError("truncated \\u escape")
    return chr(int(hexs, 16)), i + 2 + width


def _parse_iriref(line: str, i: int) -> tuple[str, int]:
    if line[i] != "<":
        raise ValueError(f"expected '<' at col {i}")
    i += 1
    out = []
    while i < len(line):
        ch = line[i]
        if ch == ">":
            return "".join(out), i + 1
        if ch == "\\":
            if i + 1 < len(line) and line[i + 1] in "uU":
                dec, i = _read_uchar(line, i)
                out.append(dec)
                continue
            raise ValueError("bad escape in IRIREF")
        if ch <= " " or ch in '<"{}|^`':
            raise ValueError(f"illegal IRIREF char {ch!r}")
        out.append(ch)
        i += 1
    raise ValueError("unterminated IRIREF")


def _parse_literal(line: str, i: int) -> tuple[tuple, int]:
    if line[i] != '"':
        raise ValueError(f"expected '\"' at col {i}")
    i += 1
    out = []
    rev = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t",
           "b": "\b", "f": "\f", "'": "'"}
    while True:
        if i >= len(line):
            raise ValueError("unterminated literal")
        ch = line[i]
        if ch == '"':
            i += 1
            break
        if ch == "\\":
            nxt = line[i + 1] if i + 1 < len(line) else ""
            if nxt in "uU":
                dec, i = _read_uchar(line, i)
                out.append(dec)
                continue
            if nxt in rev:
                out.append(rev[nxt])
                i += 2
                continue
            raise ValueError(f"bad ECHAR \\{nxt}")
        out.append(ch)
        i += 1
    lex = "".join(out)
    dtype, lang = None, None
    if line.startswith("^^", i):
        dtype, i = _parse_iriref(line, i + 2)
    elif i < len(line) and line[i] == "@":
        j = i + 1
        while j < len(line) and (line[j].isalnum() or line[j] == "-"):
            j += 1
        lang, i = line[i + 1 : j], j
    return ("literal", lex, dtype, lang), i


def _skip_ws(line: str, i: int) -> int:
    while i < len(line) and line[i] in " \t":
        i += 1
    return i


def _parse_term(line: str, i: int, *, allow_literal: bool) -> tuple:
    i = _skip_ws(line, i)
    if i >= len(line):
        raise ValueError("unexpected end of statement")
    if line[i] == "<":
        iri, i = _parse_iriref(line, i)
        return ("iri", iri), i
    if line.startswith("_:", i):
        j = i + 2
        while j < len(line) and line[j] not in " \t":
            j += 1
        return ("bnode", line[i + 2 : j]), j
    if allow_literal and line[i] == '"':
        return _parse_literal(line, i)
    raise ValueError(f"unexpected term start {line[i]!r}")


def nt_parse(text: str) -> list[tuple]:
    """Parse an N-Triples document into ``(subject, predicate, object)``
    term tuples — ``('iri', v)`` / ``('bnode', label)`` / ``('literal',
    lexical, datatype_iri|None, lang|None)``. Comments and blank lines
    per the spec."""
    stmts = []
    for raw in text.split("\n"):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        subj, i = _parse_term(line, 0, allow_literal=False)
        if subj[0] == "literal":
            raise ValueError("literal in subject position")
        pred, i = _parse_term(line, i, allow_literal=False)
        if pred[0] != "iri":
            raise ValueError("predicate must be an IRI")
        obj, i = _parse_term(line, i, allow_literal=True)
        i = _skip_ws(line, i)
        if i >= len(line) or line[i] != ".":
            raise ValueError("statement must end with '.'")
        if line[i + 1 :].strip():
            raise ValueError("trailing garbage after '.'")
        stmts.append((subj, pred, obj))
    return stmts


def _slug_of(term: tuple, prefix: str) -> str:
    kind, iri = term[0], term[1]
    full = BASE + prefix + "/"
    if kind != "iri" or not iri.startswith(full):
        raise ValueError(f"expected <{full}...> term, got {term}")
    return iri_decode_slug(iri[len(full) :])


def roundtrip_fact(subj: str, pred: str, obj: str, support: int) -> tuple[int, bool]:
    """Serialize one fact, re-parse it with the grammar parser, rebuild
    the row, and compare.  Returns ``(nt_bytes, ok)`` where ``nt_bytes``
    is the UTF-8 length of both lines including newlines."""
    text = serialize_fact(subj, pred, obj, support)
    nt_bytes = len(text.encode("utf-8"))
    try:
        (s1, p1, o1), (s2, p2, o2) = nt_parse(text)
        got = (
            _slug_of(s1, "e"),
            _slug_of(p1, "p"),
            _slug_of(o1, "e"),
        )
        # statement IRI re-packs the three encoded slugs
        stmt = s2[1]
        enc = tuple(
            iri_encode_slug(x) for x in (subj, pred, obj)
        )
        stmt_ok = stmt == f"{BASE}s/{enc[0]}/{enc[1]}/{enc[2]}"
        lit_ok = (
            o2[0] == "literal"
            and o2[1] == str(support)
            and o2[2] == XSD_INTEGER
            and p2[1] == f"{BASE}p/support"
        )
        ok = got == (subj, pred, obj) and stmt_ok and lit_ok
    except ValueError:
        ok = False
    return nt_bytes, ok


def kb_ntriples_roundtrip(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """Dataset stage: every canonical triple serialized to N-Triples and
    verified invertible by the grammar parser.  Columns ``(subj, pred,
    obj, support, nt_bytes, roundtrip_ok)``, ordered by (subj, obj).

    Scale shape: one stateless ``map_batches`` over the (already
    bounded) triple table; a production dump writes the text column to a
    partitioned sink instead of folding to byte counts — same pass."""

    def run(t: pa.Table) -> pa.Table:
        rows = zip(
            t["subj"].to_pylist(),
            t["pred"].to_pylist(),
            t["obj"].to_pylist(),
            t["support"].to_pylist(),
        )
        nb, ok = [], []
        for s, p, o, sup in rows:
            b, good = roundtrip_fact(s, p, o, int(sup))
            nb.append(b)
            ok.append(1 if good else 0)
        return pa.table(
            {
                "subj": t["subj"],
                "pred": t["pred"],
                "obj": t["obj"],
                "support": t["support"],
                "nt_bytes": pa.array(nb, pa.int64()),
                "roundtrip_ok": pa.array(ok, pa.int64()),
            }
        )

    return triples.map_batches(run, batch_format="pyarrow").sort(
        ["subj", "obj"]
    )
