"""W3C Direct-Mapping-style RDB2RDF export: lift relational tables into a
multi-predicate ``(subj, pred, obj)`` triple table, plus the two classic
KB-side consumers of such an export — characteristic sets and basic graph
pattern (BGP) star joins.

A KB-construction pipeline rarely starts from text alone: structured
sources (databases, CSV dumps, wikitables) are lifted into the same triple
space as the text-extracted facts so one query surface covers both.  The
W3C Direct Mapping (RDB2RDF WG, 2012) is the standard recipe: each row
becomes a subject IRI minted from its primary key, each column/foreign key
becomes a predicate.  The reference stores its KB as ORM rows in Postgres
(/root/reference/src/fonduer/candidates/models/candidate.py); this module
is the inverse direction — materializing the relational side INTO the KB —
so graph-side operators (``kb.predicate_stats``, characteristic sets, BGP
joins) run over one uniform table.

Scale shape: every table maps statelessly (one zero-copy Arrow
``map_batches`` per table emitting all of that table's predicate families
in one pass), and the export is a ``Dataset.union`` — NO shuffle at all.
Downstream consumers bring their own (documented) exchanges.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _tag(prefix: str, keys: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Mint entity slugs: ``prefix + str(key)``, vectorized."""
    s = pc.binary_join_element_wise(prefix, pc.cast(keys, pa.string()), "")
    return s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s


def _triples(*families: tuple[pa.Array, str, pa.Array]) -> pa.Table:
    """Stack (subj, pred-literal, obj) families into one triple table."""
    chunks = []
    for subj, pred, obj in families:
        n = len(subj)
        if isinstance(obj, pa.ChunkedArray):
            obj = obj.combine_chunks()
        chunks.append(
            pa.table(
                {
                    "subj": subj,
                    "pred": pa.array([pred] * n, pa.string()),
                    "obj": pc.cast(obj, pa.string()),
                }
            )
        )
    return pa.concat_tables(chunks)


def rdb2rdf_triples(sf_dir: str) -> "ray.data.Dataset":
    """Direct-mapping export of the nation/region/customer/supplier/orders
    star schema into one ``(subj, pred, obj)`` string triple table.

    Entity slugs: ``n<k>`` nation, ``r<k>`` region, ``c<k>`` customer,
    ``su<k>`` supplier, ``o<k>`` order.  Predicates: foreign keys become
    entity-valued ``in_region`` / ``in_nation`` / ``placed_by``;
    attribute columns become literal-valued ``named`` / ``in_segment`` /
    ``has_priority`` / ``has_status``.  Every (row, pred) pair emits
    exactly one triple, so the export is distinct by construction.

    Scale shape: five stateless column-pruned reads, each one
    ``map_batches`` that emits all the table's predicate families from a
    single pass over the batch; the union is plan-level (no exchange).
    """
    from fonduer_ray.pipelines.relational import _read

    def nation(t: pa.Table) -> pa.Table:
        subj = _tag("n", t["n_nationkey"])
        return _triples(
            (subj, "in_region", _tag("r", t["n_regionkey"])),
            (subj, "named", t["n_name"]),
        )

    def region(t: pa.Table) -> pa.Table:
        return _triples((_tag("r", t["r_regionkey"]), "named", t["r_name"]))

    def customer(t: pa.Table) -> pa.Table:
        subj = _tag("c", t["c_custkey"])
        return _triples(
            (subj, "in_nation", _tag("n", t["c_nationkey"])),
            (subj, "in_segment", t["c_mktsegment"]),
        )

    def supplier(t: pa.Table) -> pa.Table:
        return _triples(
            (_tag("su", t["s_suppkey"]), "in_nation", _tag("n", t["s_nationkey"]))
        )

    def orders(t: pa.Table) -> pa.Table:
        subj = _tag("o", t["o_orderkey"])
        return _triples(
            (subj, "placed_by", _tag("c", t["o_custkey"])),
            (subj, "has_priority", t["o_orderpriority"]),
            (subj, "has_status", t["o_orderstatus"]),
        )

    parts = [
        _read(sf_dir, "nation", ["n_nationkey", "n_regionkey", "n_name"]).map_batches(
            nation, batch_format="pyarrow"
        ),
        _read(sf_dir, "region", ["r_regionkey", "r_name"]).map_batches(
            region, batch_format="pyarrow"
        ),
        _read(
            sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"]
        ).map_batches(customer, batch_format="pyarrow"),
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            supplier, batch_format="pyarrow"
        ),
        _read(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus"]
        ).map_batches(orders, batch_format="pyarrow"),
    ]
    head, *rest = parts
    return head.union(*rest)


def characteristic_sets(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """Characteristic sets (Neumann & Moerkotte, ICDE 2011): group subjects
    by their DISTINCT-predicate signature — the structure summary an RDF
    store computes for cardinality estimation, and a KB-construction loop
    uses for implicit type induction (subjects sharing a predicate set
    behave as one class).

    Per signature (sorted distinct predicates, comma-joined):
    ``n_subjects`` — how many subjects carry exactly that predicate set,
    ``n_triples`` — their total triple mass.

    Scale shape: ONE subject-keyed ``hash_groupby`` co-locates each
    subject's triples; the signature build runs vectorized inside each
    partition (drop_duplicates + sorted group-concat) and collapses to a
    per-partition (signature, count, mass) partial — the final merge
    exchanges only ``#signatures × #partitions`` rows (signature
    vocabularies are tiny: bounded by observed predicate combinations).
    Columns ``(sig, n_subjects, n_triples)``, ordered by sig.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from fonduer_ray.stages.util import hash_groupby

    def per_subject(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return pd.DataFrame(
                {"sig": pd.Series([], dtype=str),
                 "n_subjects": pd.Series([], dtype="int64"),
                 "n_triples": pd.Series([], dtype="int64")}
            )
        mass = df.groupby("subj", sort=False).size()
        sig = (
            df.drop_duplicates(["subj", "pred"])
            .sort_values(["subj", "pred"])
            .groupby("subj", sort=False)["pred"]
            .agg(",".join)
        )
        per = pd.DataFrame({"sig": sig, "n": mass.reindex(sig.index)})
        out = per.groupby("sig", sort=False).agg(
            n_subjects=("n", "size"), n_triples=("n", "sum")
        )
        return out.reset_index()

    partials = hash_groupby(
        triples.select_columns(["subj", "pred"]), ["subj"], per_subject
    )
    return (
        partials.groupby("sig")
        .aggregate(
            Sum("n_subjects", alias_name="n_subjects"),
            Sum("n_triples", alias_name="n_triples"),
        )
        .sort("sig")
    )


def star_join_urgent_by_nation(
    triples: "ray.data.Dataset", broadcast_limit: int | None = None
) -> "ray.data.Dataset":
    """Answer a 3-pattern SPARQL basic graph pattern over the materialized
    KB — the query-side proof the export is a usable graph::

        SELECT ?nation (COUNT(*) AS ?n_orders) WHERE {
          ?o  has_priority  "1-URGENT" .
          ?o  placed_by     ?c .
          ?c  in_nation     ?nation .
        } GROUP BY ?nation

    Plan: the most selective pattern (urgent orders) streams; the two
    join patterns attach through the size-guarded ``attach_lookup``
    (broadcast below the row limit, hash-partition ``Dataset.join``
    above — subjects are primary-key-minted, so each lookup key is
    unique and both strategies agree).  The finish is a nation-keyed
    count over the already-joined (small-cardinality) column.  Columns
    ``(nation, n_orders)``, ordered by nation.
    """
    from ray.data.aggregate import Count

    from fonduer_ray.pipelines.relational import attach_lookup

    def pat(pred: str, obj: str | None = None, names: list[str] | None = None):
        def f(t: pa.Table) -> pa.Table:
            mask = pc.equal(t["pred"], pred)
            if obj is not None:
                mask = pc.and_(mask, pc.equal(t["obj"], obj))
            out = t.filter(mask).select(["subj", "obj"])
            return out.rename_columns(names) if names else out

        return f

    urgent = triples.map_batches(
        pat("has_priority", "1-URGENT"), batch_format="pyarrow"
    ).select_columns(["subj"])
    placed = triples.map_batches(
        pat("placed_by", names=["o", "c"]), batch_format="pyarrow"
    )
    in_nation = triples.map_batches(
        pat("in_nation", names=["ent", "nation"]), batch_format="pyarrow"
    )

    kw = {} if broadcast_limit is None else {"broadcast_limit": broadcast_limit}
    with_cust = attach_lookup(urgent, placed, "subj", "o", "c", **kw)
    with_nation = attach_lookup(with_cust, in_nation, "c", "ent", "nation", **kw)
    return (
        with_nation.select_columns(["nation"])
        .groupby("nation")
        .aggregate(Count(alias_name="n_orders"))
        .sort("nation")
    )


def property_path(
    triples: "ray.data.Dataset",
    path: list[str],
    out_pred: str,
    broadcast_limit: int | None = None,
) -> "ray.data.Dataset":
    """SPARQL property-path materialization (forward chaining): compose a
    chain of entity-valued predicates ``p1/p2/.../pn`` into inferred
    ``(subj, out_pred, obj)`` triples — the saturation step an RDFS/OWL
    reasoner runs when a property chain axiom is declared (OWL 2
    ``owl:propertyChainAxiom``).

    Scale shape: each hop's triple family is extracted by a stateless
    filter; hop subjects are PK-minted (unique), so every composition step
    is a guarded ``attach_lookup`` — broadcast below the row limit, hash
    partition ``Dataset.join`` above; no step materializes driver-side.
    """
    from fonduer_ray.pipelines.relational import attach_lookup

    def hop(pred: str, subj_name: str, obj_name: str):
        def f(t: pa.Table) -> pa.Table:
            out = t.filter(pc.equal(t["pred"], pred)).select(["subj", "obj"])
            return out.rename_columns([subj_name, obj_name])

        return f

    kw = {} if broadcast_limit is None else {"broadcast_limit": broadcast_limit}
    cur = triples.map_batches(
        hop(path[0], "subj", "_o0"), batch_format="pyarrow"
    )
    for i, pred in enumerate(path[1:]):
        nxt = triples.map_batches(
            hop(pred, f"_s{i + 1}", f"_o{i + 1}"), batch_format="pyarrow"
        )
        cur = attach_lookup(
            cur, nxt, f"_o{i}", f"_s{i + 1}", f"_o{i + 1}", **kw
        )

    last = f"_o{len(path) - 1}"

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": t["subj"],
                "pred": pa.array([out_pred] * t.num_rows, pa.string()),
                "obj": t[last],
            }
        )

    return cur.map_batches(finish, batch_format="pyarrow")


def rdfs_types(
    triples: "ray.data.Dataset",
    domains: dict[str, tuple[str | None, str | None]],
) -> "ray.data.Dataset":
    """RDFS domain/range type induction: for each predicate with a declared
    ``(domain_class, range_class)``, infer ``(entity, rdf:type, class)``
    facts from its subjects and objects — the rdfs2/rdfs3 entailment rules,
    the standard first saturation pass of a KB-construction loop.

    Scale shape: one stateless pass emits candidate (entity, class) pairs;
    a single entity-hash-partitioned exchange deduplicates them (an entity
    earns the same type from many triples); output is
    ``(entity, type)`` with ``pred`` implicit. Columns ordered by
    (entity, type) for determinism.
    """
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    dom_items = sorted(domains.items())

    empty = pa.schema([("entity", pa.string()), ("type", pa.string())])

    def emit(t: pa.Table) -> pa.Table:
        chunks = []
        for pred, (d_cls, r_cls) in dom_items:
            f = t.filter(pc.equal(t["pred"], pred))
            if f.num_rows == 0:
                continue
            for col, cls in (("subj", d_cls), ("obj", r_cls)):
                if cls is not None:
                    chunks.append(
                        pa.table(
                            {
                                "entity": pc.cast(f[col], pa.string()),
                                "type": pa.array([cls] * f.num_rows, pa.string()),
                            }
                        )
                    )
        return pa.concat_tables(chunks) if chunks else empty.empty_table()

    pairs = triples.map_batches(emit, batch_format="pyarrow")
    deduped = hash_groupby(
        pairs,
        ["entity"],
        lambda df: df.drop_duplicates(["entity", "type"]),
    )
    return deduped.sort(["entity", "type"])


def optional_segment_profile(
    triples: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """SPARQL OPTIONAL (left-join) over the lifted KB — the algebra piece
    the star join / property path / aggregate queries don't exercise::

        SELECT ?nation ?segment (COUNT(*) AS ?n) WHERE {
          ?e in_nation ?nation .
          OPTIONAL { ?e in_segment ?segment }
        } GROUP BY ?nation ?segment

    Customers bind the OPTIONAL; suppliers have no ``in_segment`` triple,
    so they surface with the unbound marker ``(none)`` — the left-join
    semantics OPTIONAL is defined as (SPARQL 1.1 §6).

    Scale shape: two stateless pattern filters; ONE hash-partitioned
    ``left_outer`` ``Dataset.join`` on the entity key (both sides
    repartition-sanitized — map outputs can carry skipped-block schemas);
    the (nation, segment) matrix is tiny so the finish is one small
    groupby. Columns ``(nation, segment, n_entities)``, ordered.
    """
    from ray.data.aggregate import Count

    from fonduer_ray.stages.util import join_partitions

    def pat(pred: str, names: list[str]):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["pred"], pred)).select(
                ["subj", "obj"]
            ).rename_columns(names)

        return f

    nat = triples.map_batches(
        pat("in_nation", ["ent", "nation"]), batch_format="pyarrow"
    ).repartition(join_partitions())
    seg = triples.map_batches(
        pat("in_segment", ["ent2", "segment"]), batch_format="pyarrow"
    ).repartition(join_partitions())

    joined = nat.join(
        seg,
        "left_outer",
        num_partitions=join_partitions(),
        on=("ent",),
        right_on=("ent2",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nation": t["nation"],
                "segment": pc.fill_null(
                    pc.cast(t["segment"], pa.string()), "(none)"
                ),
            }
        )

    return (
        joined.map_batches(finish, batch_format="pyarrow")
        .groupby(["nation", "segment"])
        .aggregate(Count(alias_name="n_entities"))
        .sort(["nation", "segment"])
    )
