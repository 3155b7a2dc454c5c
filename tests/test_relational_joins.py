"""Multi-way join analytics (Q3/Q5-style), CUBE, FULL OUTER join and
covariance statistics: pandas brute-force cross-checks on a synthetic
TPC-H-lite fixture, plus broadcast-vs-join path equality for the
multi-value ``attach_lookup``."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fonduer_ray.pipelines.relational import (
    attach_lookup,
    lineitem_cov_stats,
    nation_balance_full_join,
    nation_revenue,
    orders_cube,
    shipping_priority,
)

SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
STATUSES = ["O", "F"]


@pytest.fixture(scope="module")
def tpch_lite(tmp_path_factory):
    """Deterministic mini TPC-H: 40 customers over 6 nations, 120 orders
    straddling the 1995 cutoffs, 400 lineitems, 12 suppliers (keys chosen
    so the full-outer join has unmatched rows on both sides)."""
    rng = np.random.RandomState(42)
    nation = pd.DataFrame(
        {"n_nationkey": np.arange(6, dtype=np.int64),
         "n_name": [f"NATION_{i}" for i in range(6)],
         "n_regionkey": np.zeros(6, dtype=np.int64)}
    )
    customer = pd.DataFrame(
        {
            "c_custkey": np.arange(1, 41, dtype=np.int64),
            "c_nationkey": rng.randint(0, 6, 40).astype(np.int32),
            "c_mktsegment": [SEGMENTS[i % 3] for i in range(40)],
            "c_acctbal": rng.uniform(-500, 5000, 40).round(2),
            "c_name": [f"cust{i}" for i in range(40)],
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.arange(1, 13, dtype=np.int64),
            "s_nationkey": rng.randint(0, 14, 12).astype(np.int32),
        }
    )
    base = np.datetime64("1994-06-01", "us")
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 121, dtype=np.int64),
            "o_custkey": rng.randint(1, 41, 120).astype(np.int64),
            "o_orderdate": base + (rng.randint(0, 720, 120) * 86_400_000_000
                                   ).astype("timedelta64[us]"),
            "o_orderpriority": [PRIORITIES[i % 3] for i in range(120)],
            "o_orderstatus": [STATUSES[i % 2] for i in range(120)],
            "o_totalprice": rng.uniform(100, 9000, 120).round(2),
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": rng.randint(1, 121, 400).astype(np.int64),
            "l_suppkey": rng.randint(1, 13, 400).astype(np.int64),
            "l_quantity": rng.randint(1, 50, 400).astype(np.float64),
            "l_extendedprice": rng.uniform(10, 5000, 400).round(2),
            "l_discount": (rng.randint(0, 10, 400) / 100.0),
            "l_shipdate": base + (rng.randint(0, 720, 400) * 86_400_000_000
                                  ).astype("timedelta64[us]"),
            "l_returnflag": [["A", "N", "R"][i % 3] for i in range(400)],
        }
    )
    out = tmp_path_factory.mktemp("tpch_lite")
    for name, df in [
        ("nation", nation), ("customer", customer), ("supplier", supplier),
        ("orders", orders), ("lineitem", lineitem),
    ]:
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(out / f"{name}.parquet"),
        )
    return str(out), dict(
        nation=nation, customer=customer, supplier=supplier,
        orders=orders, lineitem=lineitem,
    )


def cents(col):
    return (col * 100).round().astype(np.int64)


def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def brute_shipping(t):
    cust = t["customer"][t["customer"].c_mktsegment == "BUILDING"]
    orders = t["orders"][t["orders"].o_orderdate < np.datetime64("1995-03-15")]
    orders = orders[orders.o_custkey.isin(cust.c_custkey)]
    li = t["lineitem"][t["lineitem"].l_shipdate > np.datetime64("1995-03-15")].copy()
    li["rev_c4"] = cents(li.l_extendedprice) * (100 - cents(li.l_discount))
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    g = (
        j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])["rev_c4"]
        .sum()
        .reset_index()
    )
    g["revenue"] = g.rev_c4 / 10000.0
    g = g.sort_values(
        ["revenue", "l_orderkey"], ascending=[False, True], ignore_index=True
    ).head(10)
    return g[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]


def brute_nation_rev(t):
    o = t["orders"][
        (t["orders"].o_orderdate >= np.datetime64("1995-01-01"))
        & (t["orders"].o_orderdate < np.datetime64("1996-01-01"))
    ]
    j = (
        t["lineitem"]
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
        .merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j.c_nationkey.astype(np.int64) == j.s_nationkey.astype(np.int64)]
    j = j.merge(t["nation"], left_on="c_nationkey", right_on="n_nationkey")
    j["rev_c4"] = cents(j.l_extendedprice) * (100 - cents(j.l_discount))
    g = j.groupby("n_name")["rev_c4"].sum().reset_index()
    g["revenue"] = g.rev_c4 / 10000.0
    return g[["n_name", "revenue"]]


def test_shipping_priority_matches_bruteforce(ray_session, tpch_lite):
    sf_dir, t = tpch_lite
    got = canon(shipping_priority(sf_dir).to_pandas())
    want = canon(brute_shipping(t))
    pd.testing.assert_frame_equal(got, want)


def test_shipping_priority_join_path_equal(ray_session, tpch_lite):
    sf_dir, _ = tpch_lite
    a = canon(shipping_priority(sf_dir).to_pandas())
    b = canon(shipping_priority(sf_dir, broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_nation_revenue_matches_bruteforce(ray_session, tpch_lite):
    sf_dir, t = tpch_lite
    got = canon(nation_revenue(sf_dir).to_pandas())
    want = canon(brute_nation_rev(t))
    pd.testing.assert_frame_equal(got, want)


def test_nation_revenue_join_path_equal(ray_session, tpch_lite):
    sf_dir, _ = tpch_lite
    a = canon(nation_revenue(sf_dir).to_pandas())
    b = canon(nation_revenue(sf_dir, broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_orders_cube_matches_bruteforce(ray_session, tpch_lite):
    sf_dir, t = tpch_lite
    o = t["orders"].copy()
    o["price_cents"] = cents(o.o_totalprice)
    frames = []
    for keys in [
        ["o_orderpriority", "o_orderstatus"],
        ["o_orderpriority"],
        ["o_orderstatus"],
        [],
    ]:
        if keys:
            g = o.groupby(keys)["price_cents"].agg(["size", "sum"]).reset_index()
        else:
            g = pd.DataFrame(
                {"size": [len(o)], "sum": [o.price_cents.sum()]}
            )
        for col in ("o_orderpriority", "o_orderstatus"):
            if col not in g.columns:
                g[col] = "ALL"
        g = g.rename(columns={"size": "n_orders", "sum": "sum_cents"})
        frames.append(g)
    want = pd.concat(frames, ignore_index=True)
    want["sum_price"] = want.sum_cents / 100.0
    want = want[["o_orderpriority", "o_orderstatus", "n_orders", "sum_price"]]
    want["n_orders"] = want["n_orders"].astype(np.int64)
    got = canon(orders_cube(sf_dir).to_pandas())
    pd.testing.assert_frame_equal(got, canon(want))


def test_full_outer_join_has_both_unmatched_sides(ray_session, tpch_lite):
    sf_dir, t = tpch_lite
    got = canon(nation_balance_full_join(sf_dir).to_pandas())
    cust = (
        t["customer"][t["customer"].c_mktsegment == "AUTOMOBILE"]
        .groupby(t["customer"].c_nationkey.astype(np.int64))
        .size()
        .rename("n_customers")
    )
    supp = (
        t["supplier"][t["supplier"].s_nationkey < 12]
        .groupby(t["supplier"].s_nationkey.astype(np.int64))
        .size()
        .rename("n_suppliers")
    )
    want = (
        pd.concat([cust, supp], axis=1)
        .fillna(0)
        .astype(np.int64)
        .rename_axis("nationkey")
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, canon(want))
    # the fixture is engineered so both sides contribute unmatched keys
    assert (got.n_customers == 0).any(), "no supplier-only nations in fixture"
    assert (got.n_suppliers == 0).any(), "no customer-only nations in fixture"


def test_lineitem_cov_stats_matches_bruteforce(ray_session, tpch_lite):
    sf_dir, t = tpch_lite
    li = t["lineitem"].copy()
    li["qty"] = li.l_quantity.astype(np.int64)
    li["price_cents"] = cents(li.l_extendedprice)
    li["qp"] = li.qty * li.price_cents
    g = (
        li.groupby("l_returnflag")
        .agg(
            n=("qty", "size"),
            sum_qty=("qty", "sum"),
            price_cents=("price_cents", "sum"),
            qp=("qp", "sum"),
        )
        .reset_index()
    )
    g["sum_price"] = g.price_cents / 100.0
    g["sum_qty_price"] = g.qp / 100.0
    g["n"] = g["n"].astype(np.int64)
    want = g[["l_returnflag", "n", "sum_qty", "sum_price", "sum_qty_price"]]
    got = canon(lineitem_cov_stats(sf_dir).to_pandas())
    pd.testing.assert_frame_equal(got, canon(want))


def test_attach_lookup_multi_value_paths_agree(ray_session):
    """Multi-column attach: broadcast and hash-join paths must return the
    same rows (and drop non-matching keys identically)."""
    import ray.data

    big = ray.data.from_items(
        [{"k": i % 7, "payload": i} for i in range(50)]
    )
    lkp = ray.data.from_items(
        [{"id": i, "name": f"n{i}", "grp": i * 10} for i in range(5)]
    )

    def rows(ds):
        return sorted(
            (r["k"], r["payload"], r["name"], r["grp"]) for r in ds.take_all()
        )

    a = rows(attach_lookup(big, lkp, "k", "id", ["name", "grp"]))
    b = rows(attach_lookup(big, lkp, "k", "id", ["name", "grp"], broadcast_limit=0))
    assert a == b
    assert all(k < 5 for k, *_ in a)  # keys 5,6 dropped (inner semantics)
    assert len(a) == sum(1 for i in range(50) if i % 7 < 5)


def test_hash_groupby_join_safe_survives_empty_partitions(ray_session):
    """A single-key input with many hash partitions maximizes map_groups'
    empty-partition strays; join_safe output must still join cleanly."""
    import ray.data

    from fonduer_ray.stages.util import hash_groupby

    base = ray.data.from_items([{"g": 0, "x": i} for i in range(5)])
    hg = hash_groupby(
        base,
        ["g"],
        lambda df: df.groupby("g", sort=False)["x"].sum().rename("s").reset_index(),
        n_partitions=32,
        join_safe=True,
    )
    right = ray.data.from_items([{"g": 0, "name": "hit"}, {"g": 9, "name": "miss"}])
    out = hg.join(right, "inner", num_partitions=8, on=("g",))
    rows = out.take_all()
    assert len(rows) == 1 and rows[0]["s"] == 10 and rows[0]["name"] == "hit"


def test_returned_item_report_matches_bruteforce(ray_session, tpch_lite):
    from fonduer_ray.pipelines.relational import returned_item_report

    sf_dir, t = tpch_lite
    o = t["orders"][
        (t["orders"].o_orderdate >= np.datetime64("1995-10-01"))
        & (t["orders"].o_orderdate < np.datetime64("1996-01-01"))
    ]
    li = t["lineitem"][t["lineitem"].l_returnflag == "R"].copy()
    li["rev_c4"] = cents(li.l_extendedprice) * (100 - cents(li.l_discount))
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        t["customer"], left_on="o_custkey", right_on="c_custkey"
    )
    g = j.groupby(["c_custkey", "c_name"])["rev_c4"].sum().reset_index()
    g["revenue"] = g.rev_c4 / 10000.0
    want = g.sort_values(
        ["revenue", "c_custkey"], ascending=[False, True], ignore_index=True
    ).head(20)[["c_custkey", "c_name", "revenue"]]
    got = returned_item_report(sf_dir).to_pandas()
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_impute_values_bruteforce(ray_session, tmp_path):
    from fonduer_ray.pipelines.relational import impute_values

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, 301, dtype=np.int64),
            "event_type": [["a", "b"][i % 2] for i in range(300)],
            "value": rng.uniform(0, 100, 300).round(2),
            "ts": np.datetime64("2024-01-01", "us"),
            "user_id": np.int64(1),
            "props": "",
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = impute_values(str(tmp_path)).to_pandas()
    c = (df.value * 100).round().astype(np.int64)
    present = df.event_id % 13 != 0
    means = {
        et: int(c[present & (df.event_type == et)].sum()
                // (present & (df.event_type == et)).sum())
        for et in ("a", "b")
    }
    want = pd.DataFrame(
        {
            "event_id": df.event_id,
            "filled_cents": np.where(
                ~present, df.event_type.map(means).astype(np.int64), c
            ),
            "imputed": (~present).astype(np.int64),
        }
    )
    pd.testing.assert_frame_equal(canon(got), canon(want))
    assert got[got.imputed == 1].shape[0] == (~present).sum()


@pytest.mark.parametrize(
    "n_keys,n_partitions,join_parts",
    [(1, 64, 4), (3, 16, 8), (7, 32, 2), (50, 8, 16)],
)
def test_join_safe_partition_matrix(ray_session, n_keys, n_partitions, join_parts):
    """The stray-empty-block failure was partition-layout dependent; sweep
    key-cardinality x groupby-partitions x join-partitions combinations."""
    import ray.data

    from fonduer_ray.stages.util import hash_groupby

    base = ray.data.from_items(
        [{"g": i % n_keys, "x": i} for i in range(200)]
    )
    hg = hash_groupby(
        base,
        ["g"],
        lambda df: df.groupby("g", sort=False)["x"].sum().rename("s").reset_index(),
        n_partitions=n_partitions,
        join_safe=True,
    )
    right = ray.data.from_items([{"g": k, "tag": f"t{k}"} for k in range(n_keys)])
    out = hg.join(right, "inner", num_partitions=join_parts, on=("g",))
    rows = {r["g"]: (r["s"], r["tag"]) for r in out.take_all()}
    want = {
        k: (sum(i for i in range(200) if i % n_keys == k), f"t{k}")
        for k in range(n_keys)
    }
    assert rows == want


def test_impute_values_all_missing_type(ray_session, tmp_path):
    """An event_type whose rows are ALL deterministically missing (every
    event_id % 13 == 0) has no mean; the oracle's inner join drops those
    rows — the Ray path must mirror that instead of raising KeyError."""
    from fonduer_ray.pipelines.relational import impute_values

    # type "z" only gets ids that are multiples of 13 → all missing
    ids = [13, 26, 39, 1, 2, 3, 4, 5]
    types = ["z", "z", "z", "a", "a", "a", "a", "a"]
    df = pd.DataFrame(
        {
            "event_id": np.array(ids, dtype=np.int64),
            "event_type": types,
            "value": np.linspace(1.0, 8.0, 8).round(2),
            "ts": np.datetime64("2024-01-01", "us"),
            "user_id": np.int64(1),
            "props": "",
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = impute_values(str(tmp_path)).to_pandas()
    # all three z rows drop (no mean to join); the five a rows survive
    assert set(got.event_id) == {1, 2, 3, 4, 5}
    assert (got.imputed == 0).all()


def test_attach_lookup_debug_asserts_unique_keys(ray_session, monkeypatch):
    """FONDUER_RAY_DEBUG=1 turns the broadcast path's silent last-wins on
    duplicate lookup keys into a loud error (the join path would multiply
    rows instead — results must not flip with broadcast_limit)."""
    import ray.data

    from fonduer_ray.pipelines.relational import attach_lookup

    big = ray.data.from_items([{"k": 1, "x": 10}, {"k": 2, "x": 20}])
    dup = ray.data.from_items(
        [{"lk": 1, "v": "a"}, {"lk": 1, "v": "b"}, {"lk": 2, "v": "c"}]
    )
    monkeypatch.setenv("FONDUER_RAY_DEBUG", "1")
    with pytest.raises(ValueError, match="not unique"):
        attach_lookup(big, dup, "k", "lk", "v")
    monkeypatch.delenv("FONDUER_RAY_DEBUG")
    out = attach_lookup(big, dup, "k", "lk", "v").take_all()  # last-wins
    assert {r["k"]: r["v"] for r in out} == {1: "b", 2: "c"}
