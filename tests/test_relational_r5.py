"""Round-5 relational additions: skyline, bloom anti-join, frequent
pairs, grouped OLS sufficient statistics — brute-force cross-checks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_part_skyline_brute(ray_session):
    from fonduer_ray.pipelines.relational import part_skyline

    got = part_skyline(SF).to_pandas().sort_values(
        "p_partkey", ignore_index=True
    )
    t = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    ).to_pandas()
    price = np.round(t["p_retailprice"].to_numpy() * 100).astype(np.int64)
    size = t["p_size"].to_numpy().astype(np.int64)
    keep = []
    for i in range(len(t)):
        dominated = (
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        ).any()
        if not dominated:
            keep.append(i)
    want = pd.DataFrame(
        {
            "p_partkey": t["p_partkey"].to_numpy()[keep],
            "price_cents": price[keep],
            "p_size": size[keep],
        }
    ).sort_values("p_partkey", ignore_index=True).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), want)


def test_part_skyline_ties_survive(ray_session, tmp_path):
    """Equal (price, size) tuples never dominate each other: all
    duplicates must survive; a strictly-worse point must not."""
    import ray.data

    from fonduer_ray.pipelines.relational import part_skyline

    df = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4],
            "p_size": [10, 10, 10, 5],
            "p_retailprice": [1.0, 1.0, 2.0, 1.0],
        }
    )
    d = tmp_path / "sky"
    d.mkdir()
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(df), str(d / "part.parquet"))
    got = part_skyline(str(d)).to_pandas()
    assert sorted(got["p_partkey"].tolist()) == [1, 2]


@pytest.mark.parametrize("m_bits", [1 << 20, 64])
def test_bloom_anti_join_exact(ray_session, m_bits):
    """Result is EXACT regardless of filter size: m_bits=64 forces nearly
    every probe through the false-positive verification path."""
    from fonduer_ray.pipelines.relational import (
        customers_without_orders_bloom,
    )

    got = sorted(
        customers_without_orders_bloom(SF, m_bits=m_bits)
        .to_pandas()["c_custkey"]
        .tolist()
    )
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).to_pandas()
    in95 = orders[
        (orders["o_orderdate"] >= np.datetime64("1995-01-01"))
        & (orders["o_orderdate"] < np.datetime64("1996-01-01"))
    ]["o_custkey"]
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"])
    want = sorted(set(cust["c_custkey"].to_pylist()) - set(in95.tolist()))
    assert got == want


def test_frequent_part_pairs_brute(ray_session):
    from fonduer_ray.pipelines.relational import frequent_part_pairs

    got = frequent_part_pairs(SF, min_support=2).to_pandas()
    got_map = {(r.a, r.b): r.support for r in got.itertuples()}
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas().drop_duplicates()
    from collections import Counter
    from itertools import combinations

    c: Counter = Counter()
    for _, g in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(set(g["l_partkey"])), 2):
            c[(a, b)] += 1
    want = {k: v for k, v in c.items() if v >= 2}
    assert got_map == want


def test_nation_ols_slope_brute(ray_session):
    from fonduer_ray.pipelines.relational import nation_ols_slope

    got = nation_ols_slope(SF).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    supp = pq.read_table(
        f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nat = pq.read_table(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    df = li.merge(supp, left_on="l_suppkey", right_on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    df["x"] = df["l_quantity"].astype(np.int64)
    df["y"] = np.round(df["l_extendedprice"] * 100).astype(np.int64)
    for row in got.itertuples():
        g = df[df["n_name"] == row.n_name]
        n = len(g)
        sx, sy = int(g["x"].sum()), int(g["y"].sum())
        sxy = int((g["x"] * g["y"]).sum())
        sxx = int((g["x"] * g["x"]).sum())
        assert row.n_pts == n
        assert row.slope_num == n * sxy - sx * sy
        assert row.slope_den == n * sxx - sx * sx
        # the ratio matches numpy's float OLS slope
        if row.slope_den:
            np.testing.assert_allclose(
                row.slope_num / row.slope_den,
                np.polyfit(g["x"], g["y"], 1)[0],
                rtol=1e-9,
            )
    assert len(got) == df["n_name"].nunique()


def test_orders_pushdown_scan_brute(ray_session):
    """The filter handed to the parquet fragment scanner must be
    row-identical to a post-read pandas filter (pushdown prunes I/O,
    never rows that satisfy the predicate)."""
    from fonduer_ray.pipelines.relational import orders_pushdown_scan

    got = orders_pushdown_scan(SF).to_pandas().sort_values(
        "o_orderpriority", ignore_index=True
    )
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pandas()
    t = t[t["o_totalprice"] > 400000.0]
    cents = np.round(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
    want = (
        pd.DataFrame({"o_orderpriority": t["o_orderpriority"].to_numpy(), "c": cents})
        .groupby("o_orderpriority", as_index=False)
        .agg(n_orders=("c", "size"), price_c=("c", "sum"))
        .sort_values("o_orderpriority", ignore_index=True)
    )
    assert list(got["o_orderpriority"]) == list(want["o_orderpriority"])
    assert list(got["n_orders"]) == list(want["n_orders"])
    assert np.allclose(
        got["sum_price"].to_numpy(),
        want["price_c"].to_numpy() / 100.0,
        rtol=0,
        atol=0,
    )


def test_latest_event_per_user_type_brute(ray_session):
    """Keep-latest compaction equals the pandas idxmax ranking (ts desc,
    event_id desc per key)."""
    from fonduer_ray.pipelines.relational import latest_event_per_user_type

    got = (
        latest_event_per_user_type(SF)
        .to_pandas()
        .sort_values(["user_id", "event_type"], ignore_index=True)
    )
    t = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    ).to_pandas()
    want = (
        t.sort_values(
            ["user_id", "event_type", "ts", "event_id"],
            ascending=[True, True, False, False],
        )
        .groupby(["user_id", "event_type"], sort=False)
        .head(1)
        .sort_values(["user_id", "event_type"], ignore_index=True)
    )
    assert list(got["event_id"]) == list(want["event_id"])
    assert list(got["ts"]) == list(want["ts"])
    assert list(got["value"]) == list(want["value"])


def test_snapshot_diff_brute(ray_session):
    import ray

    from fonduer_ray.pipelines.relational import snapshot_diff

    old = [{"k": i, "p": f"v{i % 4}"} for i in range(200) if i % 11 != 0]
    new = [
        {"k": i, "p": (f"v{i % 4}" + "*" if i % 17 == 0 else f"v{i % 4}")}
        for i in range(200)
        if i % 13 != 0
    ]
    got = (
        snapshot_diff(ray.data.from_items(old), ray.data.from_items(new))
        .to_pandas()
        .set_index("status")
    )
    om = {r["k"]: r["p"] for r in old}
    nm = {r["k"]: r["p"] for r in new}
    exp = {"added": [], "removed": [], "changed": [], "unchanged": []}
    for k in set(om) | set(nm):
        if k not in om:
            exp["added"].append(k)
        elif k not in nm:
            exp["removed"].append(k)
        elif om[k] != nm[k]:
            exp["changed"].append(k)
        else:
            exp["unchanged"].append(k)
    for status, keys in exp.items():
        assert keys, f"fixture must exercise status {status}"
        assert got.loc[status, "n"] == len(keys)
        assert got.loc[status, "key_sum"] == sum(keys)
    assert len(got) == 4


def test_event_type_share_brute(ray_session):
    from fonduer_ray.pipelines.relational import event_type_share

    got = event_type_share(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    ev["cents"] = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    exp = (
        ev.groupby("event_type")["cents"]
        .agg(n="size", cents="sum")
        .reset_index()
        .sort_values("event_type", ignore_index=True)
    )
    exp["n_share_bp"] = exp["n"] * 10000 // int(exp["n"].sum())
    exp["cents_share_bp"] = exp["cents"] * 10000 // int(exp["cents"].sum())
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)
    # shares are exact-integer basis points summing to <= 10000
    assert got["n_share_bp"].sum() <= 10000


def test_curriculum_buckets_uneven_ntile(ray_session):
    """23 docs into 4 buckets: NTILE gives 6,6,6,5 — exercises the uneven
    split the sf fixtures (10 | 500) never hit."""
    import ray

    from fonduer_ray.functions.textstats import STOPWORDS_EN
    from fonduer_ray.functions.training import curriculum_buckets

    stops = sorted(STOPWORDS_EN)[:3]
    docs = []
    for i in range(23):
        toks = [stops[j % 3] for j in range(i % 5)] + ["zz"] * (7 - i % 5)
        docs.append({"doc_id": i, "text": " ".join(toks)})
    got = curriculum_buckets(
        ray.data.from_items(docs), n_buckets=4
    ).to_pandas()

    scored = sorted(
        (
            (
                sum(1 for t in d["text"].split() if t in STOPWORDS_EN)
                * 10000
                // len(d["text"].split()),
                d["doc_id"],
                len(d["text"].split()),
            )
            for d in docs
        )
    )
    exp = {}
    n, nb = len(scored), 4
    small, rem = divmod(n, nb)
    for r, (bp, _d, ntok) in enumerate(scored):
        cut = rem * (small + 1)
        b = (r // (small + 1) + 1) if r < cut else rem + (r - cut) // small + 1
        e = exp.setdefault(b, [0, 0, 10**9, -1])
        e[0] += 1
        e[1] += ntok
        e[2] = min(e[2], bp)
        e[3] = max(e[3], bp)
    assert [tuple(r) for r in got.itertuples(index=False)] == [
        (b, *exp[b]) for b in sorted(exp)
    ]
    assert got["n_docs"].tolist() == [6, 6, 6, 5]


def test_events_window_dedup_brute(ray_session):
    from fonduer_ray.pipelines.relational import events_window_dedup

    # 1-day gap: 368 of the fixture's 925 stream gaps fall inside it,
    # so the throttle genuinely drops rows here (60s drops none at sf0.001)
    gap = 86400
    got = events_window_dedup(SF, gap_seconds=gap).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).to_pandas()
    s = ev.sort_values(["user_id", "event_type", "ts", "event_id"])
    prev = s.groupby(["user_id", "event_type"], sort=False)["ts"].shift(1)
    keep = prev.isna() | ((s["ts"] - prev) > pd.Timedelta(seconds=gap))
    want = (
        s.loc[keep, ["event_id", "user_id", "event_type", "ts"]]
        .sort_values("event_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # the dedup must actually drop something on this fixture
    assert len(got) < len(ev)


def test_source_quality_shrunk_brute(ray_session):
    import ray.data

    from fonduer_ray.functions.textstats import (
        STOPWORDS_EN,
        source_quality_shrunk,
    )

    docs = [
        {"source": f"s{i % 3}", "text": ("the of and word " * (i + 1)).strip()}
        for i in range(9)
    ] + [{"source": "s3", "text": ""}, {"source": "s3", "text": "zq xk"}]
    got = source_quality_shrunk(ray.data.from_items(docs), alpha=20).to_pandas()

    per = {}
    for d in docs:
        toks = d["text"].split()
        bp = (
            sum(1 for t in toks if t in STOPWORDS_EN) * 10000 // len(toks)
            if toks
            else 0
        )
        e = per.setdefault(d["source"], [0, 0])
        e[0] += bp
        e[1] += 1
    mu = sum(v[0] for v in per.values()) // sum(v[1] for v in per.values())
    want = pd.DataFrame(
        [
            {
                "source": s,
                "n_docs": c,
                "mean_bp": sbp // c,
                "shrunk_bp": (sbp + 20 * mu) // (c + 20),
            }
            for s, (sbp, c) in sorted(per.items())
        ]
    ).astype({"n_docs": "int64", "mean_bp": "int64", "shrunk_bp": "int64"})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # small noisy source pulled toward the corpus mean, big source less so
    assert abs(int(got.loc[got["source"] == "s3", "shrunk_bp"].iloc[0]) - mu) < abs(
        int(got.loc[got["source"] == "s3", "mean_bp"].iloc[0]) - mu
    )
