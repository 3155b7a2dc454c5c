"""tpch_extra pipelines vs their DuckDB oracles on an ADVERSARIAL fixture.

The sf* sweeps (scripts/check_oracle.py) already verify these queries on the
driver tables; this file re-runs the exact Ray-query / oracle-SQL pair over a
hand-built star schema engineered for the edge cases the uniform synthetic
data never hits: a revenue TIE at Q15's max, an acctbal TIE at Q2's argmin,
a non-empty Q13 zero bucket, every Q21 exists/not-exists case (sole supplier,
sole returner, double returner, R+N lines of one supplier in one order), and
exact boundary hits for the strict integer inequalities of Q17 and Q22.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry

QUERIES = [
    "customer_order_distribution",
    "promo_revenue",
    "top_supplier",
    "small_qty_revenue",
    "large_volume_customers",
    "disjunctive_revenue",
    "min_balance_supplier",
    "volume_shipping",
    "national_market_share",
    "significant_parts",
    "waiting_suppliers",
    "sales_opportunity",
    "product_type_profit",
    "shipping_delay_priority",
    "part_supplier_relationship",
    "promotable_part_suppliers",
]

TS = lambda s: np.datetime64(s, "us")  # noqa: E731


@pytest.fixture(scope="module")
def star_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("tpch_star")

    region = pd.DataFrame(
        {"r_regionkey": [0, 1], "r_name": ["ASIA", "EUROPE"]}
    )
    # NATION_12 / NATION_13 are the volume_shipping defaults; 5 & 6 sit in
    # ASIA for national_market_share (target NATION_5).
    nation = pd.DataFrame(
        {
            "n_nationkey": [5, 6, 12, 13],
            "n_name": ["NATION_5", "NATION_6", "NATION_12", "NATION_13"],
            "n_regionkey": [0, 0, 1, 1],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4, 5, 6],
            "c_name": [f"Cust{i}" for i in range(1, 7)],
            "c_nationkey": [5, 6, 12, 13, 5, 6],
            # mean positive balance = (100+200+300)/3 = 200.00:
            #  cust4 = 200.00 exactly -> Q22 strict '>' must EXCLUDE it
            #  cust5 = 300.00, no recent orders -> the one Q22 hit
            #  cust6 negative balance, never counted in the mean
            "c_acctbal": [100.0, 200.0, 200.0, 200.0, 300.0, -50.0],
            "c_mktsegment": ["BUILDING", "AUTO", "BUILDING", "AUTO", "HOUSE", "AUTO"],
        }
    )
    # acctbal TIE between suppliers 21 and 22 -> Q2 argmin must take the
    # lower suppkey; supplier 24 never ships anything.
    supplier = pd.DataFrame(
        {
            "s_suppkey": [21, 22, 23, 24],
            "s_name": ["SuppA", "SuppB", "SuppC", "SuppIdle"],
            "s_nationkey": [5, 6, 12, 13],
            "s_acctbal": [50.0, 50.0, 10.0, 999.0],
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": [101, 102, 103, 104],
            # 101/104 hit Q9's '%widget%' filter; 101/103 hit Q20's 'blue'
            # prefix (part-name families, per the synthetic generator)
            "p_name": ["blue widget", "pb", "blue gizmo", "red widget"],
            "p_brand": ["Brand#12", "Brand#23", "Brand#34", "Brand#23"],
            "p_type": ["PROMO", "ECONOMY", "PROMO", "STANDARD"],
            "p_size": [3, 8, 20, 5],
            "p_retailprice": [10.0, 20.0, 30.0, 40.0],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1001, 1002, 1003, 1004, 1005, 1006, 1007],
            "o_custkey": [1, 2, 3, 4, 1, 2, 3],
            "o_orderstatus": ["F", "O", "F", "O", "F", "O", "F"],
            # 1003/1007 price TIE -> large_volume tiebreak by o_orderkey
            "o_totalprice": [500.0, 600.0, 600.0, 700.0, 800.0, 900.0, 600.0],
            # cust1/cust2 have a post-1999 order (Q22 'recent'); 3 & 4 don't
            "o_orderdate": [
                TS("1995-02-01"), TS("1995-06-01"), TS("1996-03-01"),
                TS("1995-09-10"), TS("1999-05-01"), TS("2000-01-01"),
                TS("1997-07-01"),
            ],
            "o_orderpriority": ["1-URGENT"] * 7,
        }
    )

    def li(ok, pk, sk, ln, qty, price, disc, rf, ship):
        return {
            "l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk,
            "l_linenumber": ln, "l_quantity": float(qty),
            "l_extendedprice": float(price), "l_discount": float(disc),
            "l_tax": 0.0, "l_returnflag": rf, "l_linestatus": "F",
            "l_shipdate": TS(ship),
        }

    lineitem = pd.DataFrame(
        [
            # -- Q21 cases --------------------------------------------------
            # order 1001: single supplier with R -> NOT counted (n_supp==1)
            li(1001, 101, 21, 1, 10, 100.0, 0.0, "R", "1995-03-01"),
            # order 1002: two suppliers, only 22 returns -> 22 counted; the
            # returning supplier ALSO has an N line in the same order (r=max)
            li(1002, 102, 22, 1, 4, 200.0, 0.10, "R", "1995-09-15"),
            li(1002, 102, 22, 2, 2, 50.0, 0.0, "N", "1995-09-20"),
            li(1002, 101, 21, 3, 2, 80.0, 0.0, "N", "1995-09-05"),
            # order 1003: two suppliers BOTH return -> neither counted
            li(1003, 103, 21, 1, 25, 300.0, 0.0, "R", "1996-06-01"),
            li(1003, 103, 23, 2, 30, 400.0, 0.05, "R", "1996-06-15"),
            # -- Q15 tie: 21 and 22 both earn exactly 111.00 in 1996-Q1 -----
            li(1004, 104, 21, 1, 1, 111.0, 0.0, "N", "1996-01-10"),
            li(1004, 104, 22, 2, 1, 111.0, 0.0, "N", "1996-03-31"),
            # -- Q17: Brand#23 parts 102 & 104 ------------------------------
            # part 102 qtys: [4, 2, 1, 14] -> sum 21, n 4; strict test:
            #   qty 1 -> 5*1*4=20 < 21 qualifies; qty 2 -> 40 NOT; the
            #   boundary 5*q*n == sum is covered by part 104 (q=2, sum 20, n 2)
            li(1005, 102, 23, 1, 1, 60.0, 0.0, "N", "1997-01-01"),
            li(1005, 102, 23, 2, 14, 70.0, 0.0, "N", "1997-02-01"),
            # part 104 qtys: [2, 18] -> sum 20, n 2; 5*2*2 == 20 -> EXCLUDED
            li(1005, 104, 23, 3, 2, 90.0, 0.0, "N", "1997-03-01"),
            li(1006, 104, 23, 1, 18, 95.0, 0.0, "N", "1997-04-01"),
            # -- Q19 branch hits: (Brand#12, size 3, qty 5) and a miss ------
            li(1006, 101, 23, 2, 5, 120.0, 0.20, "N", "1997-05-01"),
            li(1006, 103, 22, 3, 25, 130.0, 0.0, "N", "1997-06-01"),
            # -- volume_shipping: cust3 (NATION_12) buys from 23 (NATION_12)
            # is same-nation -> excluded; cross 12<->13 pair:
            li(1003, 101, 24, 3, 1, 45.0, 0.0, "N", "1995-07-01"),  # s13->c12
            # -- Q18: order 1007 totals 240 qty (> 200) -> the one hit.
            # Only non-Brand#23 parts (101/103) so Q17's boundary sums hold.
            li(1007, 101, 21, 1, 50, 10.0, 0.0, "N", "1997-07-10"),
            li(1007, 103, 22, 2, 50, 10.0, 0.0, "N", "1997-07-11"),
            li(1007, 101, 23, 3, 50, 10.0, 0.0, "N", "1997-07-12"),
            li(1007, 103, 21, 4, 50, 10.0, 0.0, "N", "1997-07-13"),
            li(1007, 101, 22, 5, 40, 10.0, 0.0, "N", "1997-07-14"),
        ]
    )

    for name, df in [
        ("region", region), ("nation", nation), ("customer", customer),
        ("supplier", supplier), ("part", part), ("orders", orders),
        ("lineitem", lineitem),
    ]:
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(out / f"{name}.parquet"),
        )
    return str(out)


def _duck(star_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{star_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_matches_oracle_on_adversarial_star(name, star_dir, ray_session):
    ray_res = entry.queries()[name](star_dir)
    ray_df = ray_res.to_pandas() if hasattr(ray_res, "to_pandas") else ray_res
    want = _duck(star_dir, entry.oracle_sql()[name])
    got, want = _norm(pd.DataFrame(ray_df)), _norm(want)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (name, got, want)
    for c in got.columns:
        if got[c].dtype.kind == "f" or want[c].dtype.kind == "f":
            assert np.allclose(
                got[c].astype(float), want[c].astype(float), rtol=0, atol=1e-9
            ), (name, c, got, want)
        else:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), (
                name, c, got, want,
            )


def test_q15_tie_surfaces_both_suppliers(star_dir, ray_session):
    from fonduer_ray.pipelines.tpch_extra import top_supplier

    df = top_supplier(star_dir).to_pandas()
    assert sorted(df["s_suppkey"].tolist()) == [21, 22]
    assert (df["total_revenue"] == 111.0).all()


def test_q2_argmin_tie_takes_lower_suppkey(star_dir, ray_session):
    from fonduer_ray.pipelines.tpch_extra import min_balance_supplier

    df = min_balance_supplier(star_dir, max_size=30).to_pandas()
    row = df[df["l_partkey"] == 103].iloc[0]
    # suppliers 21 and 23 both shipped part 103; 23 has the lower balance
    assert row["s_suppkey"] == 23
    # part 102: only supplier 22/23 shipped it (22 in order 1002, 23 in 1005)
    row2 = df[df["l_partkey"] == 102].iloc[0]
    assert row2["s_acctbal"] == min(
        50.0, 10.0
    )  # SuppC (10.0) beats SuppB despite higher key


def test_q13_zero_bucket(star_dir, ray_session):
    from fonduer_ray.pipelines.tpch_extra import customer_order_distribution

    df = customer_order_distribution(star_dir).to_pandas()
    # customers 5 and 6 placed no orders
    assert int(df.loc[df["c_count"] == 0, "custdist"].iloc[0]) == 2


def test_q21_cases(star_dir, ray_session):
    from fonduer_ray.pipelines.tpch_extra import waiting_suppliers

    df = waiting_suppliers(star_dir).to_pandas()
    # only SuppB (order 1002: multi-supplier, sole returner) qualifies;
    # 1001 is single-supplier, 1003 has two returners
    assert df["s_name"].tolist() == ["SuppB"]
    assert df["numwait"].tolist() == [1]


def test_q22_boundary_excluded_and_recency(star_dir, ray_session):
    from fonduer_ray.pipelines.tpch_extra import sales_opportunity

    df = sales_opportunity(star_dir).to_pandas()
    # mean positive balance is exactly 200.00: custs 2-4 sit AT the mean
    # (strict > excludes), cust5 (300, HOUSE, no recent orders) qualifies
    assert df["c_mktsegment"].tolist() == ["HOUSE"]
    assert df["n_cust"].tolist() == [1]
    assert df["total_acctbal"].tolist() == [300.0]


def test_fk_audit_counts_injected_orphans(star_dir, tmp_path, ray_session):
    """Copy the star fixture, inject one orphan lineitem (bogus order key)
    and one orphan customer nation, and check the audit counts exactly."""
    import shutil

    from fonduer_ray.pipelines.relational import fk_integrity_audit

    d = str(tmp_path / "star_orphans")
    shutil.copytree(star_dir, d)
    li = pq.read_table(f"{d}/lineitem.parquet").to_pandas()
    bad = li.iloc[[0]].copy()
    bad["l_orderkey"] = 999_999  # no such order
    li = pd.concat([li, bad], ignore_index=True)
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   f"{d}/lineitem.parquet")
    cu = pq.read_table(f"{d}/customer.parquet").to_pandas()
    cu.loc[cu.index[-1], "c_nationkey"] = 77  # no such nation
    pq.write_table(pa.Table.from_pandas(cu, preserve_index=False),
                   f"{d}/customer.parquet")

    df = fk_integrity_audit(d).to_pandas().set_index("fk")
    assert df.loc["lineitem.l_orderkey->orders", "n_orphans"] == 1
    assert df.loc["lineitem.l_orderkey->orders", "n_rows"] == len(li)
    assert df.loc["customer.c_nationkey->nation", "n_orphans"] == 1
    # untouched edges stay clean (the orphan lineitem still has real
    # part/supplier keys)
    assert df.loc["lineitem.l_partkey->part", "n_orphans"] == 0
    assert df.loc["orders.o_custkey->customer", "n_orphans"] == 0


def test_grouped_trimmed_stats_matches_brute(ray_session):
    import numpy as np
    import ray.data

    from fonduer_ray.functions.sketches import grouped_trimmed_stats

    rng = np.random.RandomState(11)
    rows = [
        {"event_type": t, "value": round(float(v), 2)}
        for t in ("a", "b")
        for v in rng.uniform(0, 100, 237)
    ]
    # a group small enough that p10 == p90 == the only value
    rows += [{"event_type": "tiny", "value": 5.0}]
    got = (
        grouped_trimmed_stats(ray.data.from_items(rows), "event_type")
        .to_pandas()
        .set_index("event_type")
    )
    import math

    for t in ("a", "b", "tiny"):
        cents = sorted(
            int(round(r["value"] * 100)) for r in rows if r["event_type"] == t
        )
        n = len(cents)
        lo = cents[max(1, math.ceil(10 * n / 100)) - 1]
        hi = cents[max(1, math.ceil(90 * n / 100)) - 1]
        kept = [c for c in cents if lo <= c <= hi]
        assert got.loc[t, "n_kept"] == len(kept)
        assert got.loc[t, "sum_kept"] == sum(kept) / 100.0
        assert got.loc[t, "trimmed_mean"] == (sum(kept) / len(kept)) / 100.0


def _write_dir(tmp_path, tables: dict) -> str:
    d = tmp_path / "mini"
    d.mkdir()
    for name, df in tables.items():
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(d / f"{name}.parquet"))
    return str(d)


def test_q20_strict_dominance_boundary(tmp_path, ray_session):
    """qty * n_supp == 2 * total must be EXCLUDED (strict >); one clear
    dominant pair survives."""
    from fonduer_ray.pipelines.tpch_extra import promotable_part_suppliers

    nation = pd.DataFrame({"n_nationkey": [0], "n_name": ["NATION_0"]})
    supplier = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_name": ["S1", "S2", "S3"],
         "s_nationkey": [0, 0, 0], "s_acctbal": [1.0, 1.0, 1.0]}
    )
    part = pd.DataFrame(
        {"p_partkey": [10, 20], "p_name": ["blue anvil", "blue bolt"],
         "p_brand": ["Brand#1"] * 2, "p_type": ["ECONOMY"] * 2,
         "p_size": [1, 1], "p_retailprice": [1.0, 1.0]}
    )
    # part 10: qtys s1=6, s2=2, s3=1 -> total 9, n 3; s1: 6*3=18 == 2*9
    #   -> boundary, EXCLUDED
    # part 20: qtys s1=9, s2=1 -> total 10, n 2; s1: 9*2=18 > 20? no ->
    #   wait: 18 < 20 excluded; use s1=11, s2=1: total 12, 11*2=22 < 24.
    #   Dominance needs qty*n > 2*total: with n=2 impossible (qty<=total).
    #   Use n=3: s1=25, s2=1, s3=1 -> total 27, 25*3=75 > 54 -> KEPT.
    rows = []
    for sk, q in [(1, 6.0), (2, 2.0), (3, 1.0)]:
        rows.append({"l_orderkey": 1, "l_partkey": 10, "l_suppkey": sk,
                     "l_linenumber": sk, "l_quantity": q,
                     "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
                     "l_returnflag": "N", "l_linestatus": "F",
                     "l_shipdate": TS("1996-01-01")})
    for sk, q in [(1, 25.0), (2, 1.0), (3, 1.0)]:
        rows.append({"l_orderkey": 2, "l_partkey": 20, "l_suppkey": sk,
                     "l_linenumber": sk, "l_quantity": q,
                     "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
                     "l_returnflag": "N", "l_linestatus": "F",
                     "l_shipdate": TS("1996-01-01")})
    d = _write_dir(tmp_path, {
        "nation": nation, "supplier": supplier, "part": part,
        "lineitem": pd.DataFrame(rows),
    })
    got = promotable_part_suppliers(d).to_pandas()
    assert got.to_dict("records") == [
        {"l_partkey": 20, "s_name": "S1", "nation": "NATION_0"}
    ]


def test_q16_distinct_across_parts_and_complaint_exclusion(
    tmp_path, ray_session
):
    """A supplier serving TWO parts of one (brand, type, size) group counts
    once; a complaint-listed supplier (acctbal below threshold) never
    counts; the forced hash-join path agrees with broadcast."""
    from fonduer_ray.pipelines.tpch_extra import part_supplier_relationship

    supplier = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_name": ["S1", "S2", "S3"],
         "s_nationkey": [0, 0, 0],
         # s3 sits below the 100000-cent complaint threshold
         "s_acctbal": [2000.0, 2000.0, 999.99]}
    )
    part = pd.DataFrame(
        {"p_partkey": [10, 20, 30], "p_name": ["a", "b", "c"],
         # parts 10 & 20 share one (brand, type, size) group
         "p_brand": ["Brand#1", "Brand#1", "Brand#2"],
         "p_type": ["ECONOMY"] * 3, "p_size": [1, 1, 2],
         "p_retailprice": [1.0] * 3}
    )
    rows = []
    for pk, sk in [(10, 1), (20, 1), (10, 2), (30, 1), (30, 3)]:
        rows.append({"l_orderkey": len(rows), "l_partkey": pk,
                     "l_suppkey": sk, "l_linenumber": 1, "l_quantity": 1.0,
                     "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
                     "l_returnflag": "N", "l_linestatus": "F",
                     "l_shipdate": TS("1996-01-01")})
    d = _write_dir(tmp_path, {
        "supplier": supplier, "part": part, "lineitem": pd.DataFrame(rows),
    })
    want = [
        # group (Brand#1, ECONOMY, 1): s1 (via parts 10 AND 20) + s2 -> 2
        {"p_brand": "Brand#1", "p_type": "ECONOMY", "p_size": 1,
         "supplier_cnt": 2},
        # group (Brand#2, ECONOMY, 2): s1 only (s3 complaint-excluded)
        {"p_brand": "Brand#2", "p_type": "ECONOMY", "p_size": 2,
         "supplier_cnt": 1},
    ]
    got = part_supplier_relationship(d).to_pandas()
    assert got.to_dict("records") == want
    joined = part_supplier_relationship(d, broadcast_limit=0).to_pandas()
    assert joined.to_dict("records") == want
