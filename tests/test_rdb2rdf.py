"""RDB2RDF direct-mapping export: brute-force cross-checks for the triple
lift, characteristic sets, and the BGP star join (both join strategies)."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from fonduer_ray.functions import rdb2rdf


@pytest.fixture(scope="module")
def export_df(ray_session, sf_dir) -> pd.DataFrame:
    return rdb2rdf.rdb2rdf_triples(sf_dir).to_pandas()


def _table(sf_dir: str, name: str) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/{name}.parquet").to_pandas()


def test_export_shape_and_distinct(export_df, sf_dir):
    n_nation = len(_table(sf_dir, "nation"))
    n_region = len(_table(sf_dir, "region"))
    n_cust = len(_table(sf_dir, "customer"))
    n_supp = len(_table(sf_dir, "supplier"))
    n_ord = len(_table(sf_dir, "orders"))
    # one triple per (row, predicate family) — distinct by construction
    assert len(export_df) == (
        2 * n_nation + n_region + 2 * n_cust + n_supp + 3 * n_ord
    )
    assert not export_df.duplicated(["subj", "pred", "obj"]).any()
    assert export_df["pred"].value_counts().to_dict() == {
        "in_region": n_nation,
        "named": n_nation + n_region,
        "in_nation": n_cust + n_supp,
        "in_segment": n_cust,
        "placed_by": n_ord,
        "has_priority": n_ord,
        "has_status": n_ord,
    }


def test_export_values_brute(export_df, sf_dir):
    """Every source row's triples appear with the exact minted slugs."""
    nation = _table(sf_dir, "nation")
    got = set(map(tuple, export_df.itertuples(index=False)))
    for r in nation.itertuples(index=False):
        assert (f"n{r.n_nationkey}", "in_region", f"r{r.n_regionkey}") in got
        assert (f"n{r.n_nationkey}", "named", r.n_name) in got
    orders = _table(sf_dir, "orders").head(50)
    for r in orders.itertuples(index=False):
        assert (f"o{r.o_orderkey}", "placed_by", f"c{r.o_custkey}") in got
        assert (f"o{r.o_orderkey}", "has_priority", r.o_orderpriority) in got


def _brute_char_sets(df: pd.DataFrame) -> dict[str, tuple[int, int]]:
    out: dict[str, tuple[int, int]] = {}
    for _subj, grp in df.groupby("subj"):
        sig = ",".join(sorted(grp["pred"].unique()))
        n_s, n_t = out.get(sig, (0, 0))
        out[sig] = (n_s + 1, n_t + len(grp))
    return out


def test_characteristic_sets_brute(ray_session, export_df, sf_dir):
    got = rdb2rdf.characteristic_sets(
        rdb2rdf.rdb2rdf_triples(sf_dir)
    ).to_pandas()
    want = _brute_char_sets(export_df)
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        assert want[row.sig] == (row.n_subjects, row.n_triples)


def test_characteristic_sets_multi_pred_subject(ray_session):
    """Signature is the DISTINCT predicate set; mass counts every triple."""
    import ray.data

    rows = [
        ("a", "p", "1"), ("a", "p", "2"), ("a", "q", "3"),
        ("b", "q", "4"), ("b", "p", "5"),
        ("c", "p", "6"),
    ]
    ds = ray.data.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(3)
    got = {
        r["sig"]: (r["n_subjects"], r["n_triples"])
        for r in rdb2rdf.characteristic_sets(ds).take_all()
    }
    assert got == {"p,q": (2, 5), "p": (1, 1)}


def _brute_star(df: pd.DataFrame) -> dict[str, int]:
    urgent = set(df.loc[(df.pred == "has_priority") & (df.obj == "1-URGENT"), "subj"])
    placed = dict(zip(df.loc[df.pred == "placed_by", "subj"],
                      df.loc[df.pred == "placed_by", "obj"]))
    nation = dict(zip(df.loc[df.pred == "in_nation", "subj"],
                      df.loc[df.pred == "in_nation", "obj"]))
    out: dict[str, int] = {}
    for o in urgent:
        nat = nation.get(placed.get(o))
        if nat is not None:
            out[nat] = out.get(nat, 0) + 1
    return out


def test_star_join_brute_and_path_equality(ray_session, export_df, sf_dir):
    triples = rdb2rdf.rdb2rdf_triples(sf_dir).materialize()
    broadcast = rdb2rdf.star_join_urgent_by_nation(triples).to_pandas()
    want = _brute_star(export_df)
    assert dict(zip(broadcast["nation"], broadcast["n_orders"])) == want
    # lowered limit forces the hash-partition Dataset.join path — must agree
    joined = rdb2rdf.star_join_urgent_by_nation(
        triples, broadcast_limit=10
    ).to_pandas()
    pd.testing.assert_frame_equal(
        broadcast.reset_index(drop=True), joined.reset_index(drop=True)
    )


def test_property_path_brute_and_path_equality(ray_session, export_df, sf_dir):
    """placed_by/in_nation/in_region composition vs a dict-chase brute
    force; lowered limit forces the hash-join path — must agree."""
    triples = rdb2rdf.rdb2rdf_triples(sf_dir).materialize()
    got = rdb2rdf.property_path(
        triples, ["placed_by", "in_nation", "in_region"], "ships_to_region"
    ).to_pandas()
    hop = {
        p: dict(zip(export_df.loc[export_df.pred == p, "subj"],
                    export_df.loc[export_df.pred == p, "obj"]))
        for p in ("placed_by", "in_nation", "in_region")
    }
    want = {
        (o, hop["in_region"][hop["in_nation"][c]])
        for o, c in hop["placed_by"].items()
        if hop["in_nation"].get(c) in hop["in_region"]
    }
    assert set(zip(got["subj"], got["obj"])) == want
    assert (got["pred"] == "ships_to_region").all()
    assert len(got) == len(want)
    joined = rdb2rdf.property_path(
        triples, ["placed_by", "in_nation", "in_region"], "ships_to_region",
        broadcast_limit=10,
    ).to_pandas()
    assert set(zip(joined["subj"], joined["obj"])) == want


def test_rdfs_types_dedup_and_no_domain(ray_session):
    """An entity typed by several predicate positions appears once per
    class; a predicate with domain=None types only its object side."""
    import ray.data

    rows = [
        ("o1", "placed_by", "c1"),     # o1:Order, c1:Customer
        ("o1", "has_priority", "X"),   # o1:Order again -> dedup
        ("c1", "in_segment", "AUTO"),  # c1:Customer again -> dedup
        ("c1", "in_nation", "n1"),     # n1:Nation; c1 NOT typed here
        ("su1", "in_nation", "n1"),    # su1 stays untyped (no domain)
        ("n1", "in_region", "r1"),     # n1:Nation dedup, r1:Region
    ]
    ds = ray.data.from_pandas(
        pd.DataFrame(rows, columns=["subj", "pred", "obj"])
    ).repartition(3)
    from __ray_entry__ import _RDFS_DOMAINS

    got = {
        (r["entity"], r["type"])
        for r in rdb2rdf.rdfs_types(ds, _RDFS_DOMAINS).take_all()
    }
    assert got == {
        ("o1", "Order"), ("c1", "Customer"), ("n1", "Nation"), ("r1", "Region")
    }


def test_optional_segment_unbound_marker(ray_session, export_df, sf_dir):
    """Left-join OPTIONAL semantics: every supplier (no in_segment triple)
    lands in the '(none)' bucket; customer buckets match a brute count."""
    got = rdb2rdf.optional_segment_profile(
        rdb2rdf.rdb2rdf_triples(sf_dir)
    ).to_pandas()
    nat = export_df[export_df.pred == "in_nation"][["subj", "obj"]]
    seg = dict(zip(export_df.loc[export_df.pred == "in_segment", "subj"],
                   export_df.loc[export_df.pred == "in_segment", "obj"]))
    want: dict[tuple, int] = {}
    for ent, nation in zip(nat["subj"], nat["obj"]):
        key = (nation, seg.get(ent, "(none)"))
        want[key] = want.get(key, 0) + 1
    assert {
        (r.nation, r.segment): r.n_entities
        for r in got.itertuples(index=False)
    } == want
    # suppliers exist in every profile at this sf: the unbound bucket fires
    assert (got[got.segment == "(none)"]["n_entities"].sum()
            == (export_df.subj.str.startswith("su")
                & (export_df.pred == "in_nation")).sum())
