"""The remaining TPC-H-shaped relational patterns over the test tables.

``relational.py`` covers Q1/Q3/Q4/Q5/Q6/Q10 and the window/cube/sample
families; this module adds the decision-support shapes those leave out,
each adapted to the columns the synthetic schema actually has (no
``partsupp``, no ship/commit/receipt-date triple):

- group-size distribution (Q13), argmin-per-group join-back (Q2),
  correlated per-group scalar filter (Q17), group-HAVING semi-join (Q18),
  disjunctive multi-predicate scan (Q19), ratio-of-conditional-sums
  (Q8/Q14), max-with-ties (Q15), global-scalar HAVING (Q11),
  per-group exists/not-exists (Q21), scalar-subquery anti-join (Q22),
  and a two-nation volume matrix (Q7).

Reference semantics: Fonduer's KB tables are consumed with exactly these
relational shapes downstream (the reference delegates them to Postgres —
e.g. grouped counts / distinct / joins in
``src/fonduer/candidates/candidates.py:180-220`` session queries); here
each is a first-class Ray Data plan with the same guarded
broadcast-vs-``Dataset.join`` discipline as ``relational.attach_lookup``.

Money math follows the house rule: exact integer cents (or 1e-4 dollars
for price*(1-discount) products) end-to-end, divided to float only in the
final projection, so DuckDB oracles agree bit-for-bit. Ratio outputs
divide two exact integers in both engines, which is deterministic in IEEE
doubles. Threshold comparisons that TPC-H writes against a float average
(Q17's ``0.2*avg(qty)``, Q22's ``avg(acctbal)``) are restated as exact
integer cross-multiplications (``5*qty*n < sum_qty``) on BOTH sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from fonduer_ray.pipelines.relational import (
    BROADCAST_ROW_LIMIT,
    _cents,
    _read,
    attach_lookup,
)
from fonduer_ray.stages.util import get_broadcast, hash_groupby


def _rev_c4(t: pa.Table) -> "pa.ChunkedArray":
    """Exact 1e-4-dollar revenue: cents(extendedprice) * (100 - cents(discount))."""
    return pc.multiply(
        _cents(t["l_extendedprice"]), pc.subtract(100, _cents(t["l_discount"]))
    )


def _qty_int(t: pa.Table) -> "pa.ChunkedArray":
    """l_quantity as exact int64 (the synthetic data is integral; TPC-H spec
    quantities are integers 1..50)."""
    return pc.cast(pc.round(t["l_quantity"]), pa.int64())


# ---------------------------------------------------------------------------
# Q13 — distribution of per-customer order counts (incl. the zero bucket)
# ---------------------------------------------------------------------------


def customer_order_distribution(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q13: histogram of customers by how many orders they placed,
    including customers with none (the LEFT-OUTER bucket).

    Distributed shape: one hash-partition count groupby on ``o_custkey``
    (never a customer x orders join — the left-outer semantics reduce to
    "zero bucket = |customer| - |custkeys seen in orders|", both cheap
    scalars), then a second tiny groupby over the per-customer counts.
    The FK guard (order custkeys ⊆ customers) is asserted via a guarded
    lookup so the shortcut is sound, not assumed. Columns: ``(c_count,
    custdist)`` sorted by (custdist desc, c_count desc)."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def block_counts(t: pa.Table) -> pa.Table:
        vc = t["o_custkey"].to_pandas().value_counts()
        return pa.table(
            {
                "o_custkey": pa.array(vc.index.to_numpy(), pa.int64()),
                "c_count": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    per_cust = hash_groupby(
        orders.map_batches(block_counts, batch_format="pyarrow"),
        ["o_custkey"],
        lambda df: df.groupby("o_custkey", sort=False)["c_count"]
        .sum()
        .reset_index(),
    )
    # FK guard: inner lookup drops custkeys absent from customer (none in
    # well-formed data) so the zero-bucket arithmetic below stays exact.
    per_cust = attach_lookup(
        per_cust, customer, "o_custkey", "c_custkey", "c_nationkey"
    ).drop_columns(["c_nationkey"])

    dist = hash_groupby(
        per_cust,
        ["c_count"],
        lambda df: df.groupby("c_count", sort=False)
        .size()
        .rename("custdist")
        .reset_index(),
    )
    # The distribution is bounded by the max orders-per-customer (tiny), so
    # the zero bucket derives from ITS row sum — no second execution of the
    # per-customer groupby and no customer x orders join anywhere.
    rows = dist.take_all()
    n_with_orders = sum(int(r["custdist"]) for r in rows)
    zero = customer.count() - n_with_orders
    if zero > 0:
        rows.append({"c_count": 0, "custdist": zero})
    rows.sort(key=lambda r: (-int(r["custdist"]), -int(r["c_count"])))
    return ray.data.from_arrow(
        pa.table(
            {
                "c_count": pa.array([int(r["c_count"]) for r in rows], pa.int64()),
                "custdist": pa.array(
                    [int(r["custdist"]) for r in rows], pa.int64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue percentage (ratio of conditional sums)
# ---------------------------------------------------------------------------


def promo_revenue(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q14: share of September-1995 revenue from PROMO-type parts.
    Part type attaches through one guarded lookup; both conditional sums
    ride one scan as exact 1e-4-dollar ints; the single ratio row divides
    the two ints (deterministic in doubles). Columns: ``(promo_revenue,)``."""
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    lineitem = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    lo = pa.scalar(np.datetime64("1995-09-01", "us"))
    hi = pa.scalar(np.datetime64("1995-10-01", "us"))

    def in_month(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"]
        return t.filter(pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi)))

    lines = attach_lookup(
        lineitem.map_batches(in_month, batch_format="pyarrow"),
        part,
        "l_partkey",
        "p_partkey",
        "p_type",
        broadcast_limit,
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _rev_c4(t)
        promo = pc.if_else(pc.equal(t["p_type"], "PROMO"), rev, pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "promo_c4": pa.array([pc.sum(promo).as_py() or 0], pa.int64()),
                "total_c4": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            }
        )

    totals = lines.map_batches(partial, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table) -> pa.Table:
        promo = pc.sum(t["promo_c4"]).as_py() or 0
        total = pc.sum(t["total_c4"]).as_py() or 0
        val = 100.0 * promo / total if total else 0.0
        return pa.table({"promo_revenue": pa.array([val], pa.float64())})

    # batch_size=None: the single post-repartition block arrives whole, so
    # the scalar finish sees every partial in one call.
    return totals.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue (max with ties)
# ---------------------------------------------------------------------------


def top_supplier(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q15: supplier(s) whose 1996-Q1 shipped revenue equals the
    global maximum (ties all surface — the reference view semantics).
    Per-supplier partials combine in one hash groupby; the max is a
    driver scalar over the |suppliers|-sized aggregate (bounded), never
    over lineitem. Columns: ``(s_suppkey, s_name, total_revenue)``."""
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    lineitem = _read(
        sf_dir,
        "lineitem",
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"]
        f = t.filter(pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi)))
        if f.num_rows == 0:  # typed empty — from_pandas would emit null cols
            return pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "rev_c4": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "s_suppkey": pc.cast(f["l_suppkey"], pa.int64()).to_pandas(),
                "rev_c4": _rev_c4(f).to_pandas(),
            }
        )
        out = df.groupby("s_suppkey", sort=False)["rev_c4"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    per_supp = hash_groupby(
        lineitem.map_batches(partial, batch_format="pyarrow"),
        ["s_suppkey"],
        lambda df: df.groupby("s_suppkey", sort=False)["rev_c4"].sum().reset_index(),
    ).materialize()  # |suppliers| rows; consumed twice (max scalar + filter)
    best = per_supp.max("rev_c4")

    def only_max(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["rev_c4"], pa.scalar(best, pa.int64())))

    winners = attach_lookup(
        per_supp.map_batches(only_max, batch_format="pyarrow"),
        supplier,
        "s_suppkey",
        "s_suppkey",
        "s_name",
        broadcast_limit,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": t["s_name"],
                "total_revenue": pc.divide(
                    pc.cast(t["rev_c4"], pa.float64()), 10000.0
                ),
            }
        )

    return winners.map_batches(finish, batch_format="pyarrow").sort("s_suppkey")


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated per-group scalar filter)
# ---------------------------------------------------------------------------


def small_qty_revenue(
    sf_dir: str, brand: str = "Brand#23", broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q17: weekly revenue lost if sub-20%-of-average-quantity orders
    of one brand's parts stopped. The correlated scalar (per-part avg
    quantity) is a per-part ``(sum_qty, n)`` aggregate attached back to the
    same brand-filtered lines; ``qty < 0.2 * sum/n`` is evaluated as the
    exact integer cross-product ``5 * qty * n < sum_qty`` (no float
    threshold — the oracle states the identical inequality). Columns:
    ``(avg_yearly,)``."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    lineitem = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def brand_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p_brand"], brand))

    brand_lines = attach_lookup(
        lineitem,
        part.map_batches(brand_only, batch_format="pyarrow"),
        "l_partkey",
        "p_partkey",
        "p_brand",
        broadcast_limit,
    ).drop_columns(["p_brand"])

    def qty_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": t["l_partkey"].to_pandas(),
                "sum_qty": _qty_int(t).to_pandas(),
            }
        )
        out = (
            df.groupby("l_partkey", sort=False)
            .agg(sum_qty=("sum_qty", "sum"), n=("sum_qty", "size"))
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    # Materialize the (tiny: one brand's parts) correlated-scalar table:
    # attach_lookup executes its lookup side twice (count + broadcast
    # build), and each execution would otherwise re-scan lineitem.
    per_part = hash_groupby(
        brand_lines.map_batches(qty_partial, batch_format="pyarrow"),
        ["l_partkey"],
        lambda df: df.groupby("l_partkey", sort=False)
        .agg(sum_qty=("sum_qty", "sum"), n=("n", "sum"))
        .reset_index(),
        join_safe=True,
    ).materialize()

    lines2 = attach_lookup(
        brand_lines, per_part, "l_partkey", "l_partkey", ["sum_qty", "n"],
        broadcast_limit,
    )

    def partial_sum(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(pc.multiply(_qty_int(t), 5), pc.cast(t["n"], pa.int64()))
        f = t.filter(pc.less(lhs, pc.cast(t["sum_qty"], pa.int64())))
        s = pc.sum(_cents(f["l_extendedprice"])).as_py() or 0
        return pa.table({"price_cents": pa.array([s], pa.int64())})

    totals = lines2.map_batches(partial_sum, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table) -> pa.Table:
        s = pc.sum(t["price_cents"]).as_py() or 0
        return pa.table(
            {"avg_yearly": pa.array([s / 100.0 / 7.0], pa.float64())}
        )

    return totals.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (group-HAVING semi-join back to facts)
# ---------------------------------------------------------------------------


def large_volume_customers(
    sf_dir: str, min_qty: int = 200, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q18: top-100 orders whose total line quantity exceeds
    ``min_qty``, with their customer. The HAVING set is a per-order sum
    groupby filtered BEFORE any join (orders of interest ≪ orders), then
    two guarded lookups attach order and customer attributes. Columns:
    ``(c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
    sum_qty)``."""
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderkey": t["l_orderkey"].to_pandas(),
                "sum_qty": _qty_int(t).to_pandas(),
            }
        )
        out = df.groupby("o_orderkey", sort=False)["sum_qty"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    per_order = hash_groupby(
        lineitem.map_batches(qty_partial, batch_format="pyarrow"),
        ["o_orderkey"],
        lambda df: df.groupby("o_orderkey", sort=False)["sum_qty"].sum().reset_index(),
    )

    def having(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["sum_qty"], min_qty))

    big = attach_lookup(
        per_order.map_batches(having, batch_format="pyarrow"),
        orders,
        "o_orderkey",
        "o_orderkey",
        ["o_custkey", "o_orderdate", "o_totalprice"],
        broadcast_limit,
    )
    big = attach_lookup(big, customer, "o_custkey", "c_custkey", "c_name",
                        broadcast_limit)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_name": t["c_name"],
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "o_totalprice": t["o_totalprice"],
                "sum_qty": pc.cast(t["sum_qty"], pa.int64()),
            }
        )

    return (
        big.map_batches(finish, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-predicate revenue (OR-of-ANDs, one scan)
# ---------------------------------------------------------------------------


def disjunctive_revenue(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q19: revenue from three disjunctive (brand, size-range,
    quantity-range) branches, evaluated as one vectorized OR-of-ANDs mask
    over a single lineitem scan with part attrs attached by guarded
    lookup. Columns: ``(revenue,)``."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    lineitem = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )
    lines = attach_lookup(
        lineitem, part, "l_partkey", "p_partkey", ["p_brand", "p_size"],
        broadcast_limit,
    )

    branches = [
        ("Brand#12", 1, 5, 1, 11),
        ("Brand#23", 1, 10, 10, 20),
        ("Brand#34", 1, 15, 20, 30),
    ]

    def partial(t: pa.Table) -> pa.Table:
        qty = _qty_int(t)
        size = pc.cast(t["p_size"], pa.int64())
        mask = None
        for b, s_lo, s_hi, q_lo, q_hi in branches:
            m = pc.and_(
                pc.and_(
                    pc.equal(t["p_brand"], b),
                    pc.and_(pc.greater_equal(size, s_lo), pc.less_equal(size, s_hi)),
                ),
                pc.and_(pc.greater_equal(qty, q_lo), pc.less_equal(qty, q_hi)),
            )
            mask = m if mask is None else pc.or_(mask, m)
        f = t.filter(mask)
        s = pc.sum(_rev_c4(f)).as_py() or 0
        return pa.table({"rev_c4": pa.array([s], pa.int64())})

    totals = lines.map_batches(partial, batch_format="pyarrow").repartition(1)

    def finish(t: pa.Table) -> pa.Table:
        s = pc.sum(t["rev_c4"]).as_py() or 0
        return pa.table({"revenue": pa.array([s / 10000.0], pa.float64())})

    return totals.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Q2 (adapted) — argmin-per-group with join-back
# ---------------------------------------------------------------------------


def min_balance_supplier(
    sf_dir: str, max_size: int = 10, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q2 shape without partsupp: for every small part (``p_size <=
    max_size``) that appears in lineitem, the supplier that has shipped it
    with the LOWEST account balance (ties broken by suppkey — a total
    order, so the argmin is deterministic). The distinct (part, supp) pair
    set builds with a per-block combiner before the shuffle; the argmin
    runs as a vectorized per-partition sort + drop_duplicates, never a
    driver loop. Columns: ``(l_partkey, s_suppkey, s_acctbal, s_name)``."""
    part = _read(sf_dir, "part", ["p_partkey", "p_size"])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal"])
    lineitem = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def small_parts(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(pc.cast(t["p_size"], pa.int64()), max_size))

    def block_pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": t["l_partkey"].to_pandas(),
                "l_suppkey": t["l_suppkey"].to_pandas(),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = hash_groupby(
        lineitem.map_batches(block_pairs, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        lambda df: df.drop_duplicates(["l_partkey", "l_suppkey"]),
    )
    pairs = attach_lookup(
        pairs,
        part.map_batches(small_parts, batch_format="pyarrow"),
        "l_partkey",
        "p_partkey",
        "p_size",
        broadcast_limit,
    ).drop_columns(["p_size"])
    pairs = attach_lookup(
        pairs, supplier, "l_suppkey", "s_suppkey", ["s_acctbal", "s_name"],
        broadcast_limit,
    )

    def argmin(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["l_partkey", "s_acctbal", "l_suppkey"])
            .drop_duplicates(["l_partkey"], keep="first")
        )

    best = hash_groupby(pairs, ["l_partkey"], argmin)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "s_acctbal": pc.cast(t["s_acctbal"], pa.float64()),
                "s_name": t["s_name"],
            }
        )

    return best.map_batches(finish, batch_format="pyarrow").sort("l_partkey")


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations by year
# ---------------------------------------------------------------------------


def volume_shipping(
    sf_dir: str,
    nation_a: str = "NATION_12",
    nation_b: str = "NATION_13",
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
) -> "ray.data.Dataset":
    """TPC-H Q7: 1995-1996 revenue shipped between two nations, in both
    directions, by year. Customer nation rides orders through one guarded
    lookup; supplier nation attaches per line; the (supp, cust, year)
    matrix has ≤ 2 x 2 x ... rows so the final groupby is tiny. Columns:
    ``(supp_nation, cust_nation, l_year, revenue)``."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    lineitem = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    # nation name -> key (25 rows: plain driver lookup is free)
    nmap = {
        r["n_name"]: int(r["n_nationkey"])
        for r in nation.take_all()
    }
    key_a, key_b = nmap[nation_a], nmap[nation_b]

    orders_n = attach_lookup(
        orders, customer, "o_custkey", "c_custkey", "c_nationkey", broadcast_limit
    ).select_columns(["o_orderkey", "c_nationkey"])

    lo = pa.scalar(np.datetime64("1995-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def in_window(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"]
        return t.filter(pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi)))

    lines = attach_lookup(
        lineitem.map_batches(in_window, batch_format="pyarrow"),
        orders_n,
        "l_orderkey",
        "o_orderkey",
        "c_nationkey",
        broadcast_limit,
    )
    lines = attach_lookup(
        lines, supplier, "l_suppkey", "s_suppkey", "s_nationkey", broadcast_limit
    )

    def partial(t: pa.Table) -> pa.Table:
        sn = pc.cast(t["s_nationkey"], pa.int64())
        cn = pc.cast(t["c_nationkey"], pa.int64())
        fwd = pc.and_(pc.equal(sn, key_a), pc.equal(cn, key_b))
        rev_dir = pc.and_(pc.equal(sn, key_b), pc.equal(cn, key_a))
        f = t.filter(pc.or_(fwd, rev_dir))
        if f.num_rows == 0:
            return pa.table(
                {
                    "supp_nk": pa.array([], pa.int64()),
                    "cust_nk": pa.array([], pa.int64()),
                    "l_year": pa.array([], pa.int64()),
                    "rev_c4": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "supp_nk": pc.cast(f["s_nationkey"], pa.int64()).to_pandas(),
                "cust_nk": pc.cast(f["c_nationkey"], pa.int64()).to_pandas(),
                "l_year": pc.cast(pc.year(f["l_shipdate"]), pa.int64()).to_pandas(),
                "rev_c4": _rev_c4(f).to_pandas(),
            }
        )
        out = (
            df.groupby(["supp_nk", "cust_nk", "l_year"], sort=False)["rev_c4"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    per_cell = hash_groupby(
        lines.map_batches(partial, batch_format="pyarrow"),
        ["supp_nk", "cust_nk", "l_year"],
        lambda df: df.groupby(["supp_nk", "cust_nk", "l_year"], sort=False)[
            "rev_c4"
        ]
        .sum()
        .reset_index(),
    )
    # <= 2 directions x |years| cells: finish driver-side so the result
    # carries a typed schema even when the pair shipped nothing (an
    # all-empty Dataset would otherwise surface schema-less).
    inv = {v: k for k, v in nmap.items()}
    cells = sorted(
        per_cell.take_all(),
        key=lambda r: (inv[int(r["supp_nk"])], inv[int(r["cust_nk"])], int(r["l_year"])),
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "supp_nation": pa.array(
                    [inv[int(r["supp_nk"])] for r in cells], pa.string()
                ),
                "cust_nation": pa.array(
                    [inv[int(r["cust_nk"])] for r in cells], pa.string()
                ),
                "l_year": pa.array([int(r["l_year"]) for r in cells], pa.int64()),
                "revenue": pa.array(
                    [int(r["rev_c4"]) / 10000.0 for r in cells], pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (ratio of conditional sums per year)
# ---------------------------------------------------------------------------


def national_market_share(
    sf_dir: str,
    target_nation: str = "NATION_5",
    region: str = "ASIA",
    part_type: str = "ECONOMY",
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
) -> "ray.data.Dataset":
    """TPC-H Q8: per order-year share of one supplier nation in the
    revenue of one part type sold to customers of one region, 1995-1996.
    Region membership resolves through the tiny nation table on the
    driver; everything wide is guarded lookups + one conditional-sum
    groupby on year. The share divides two exact ints. Columns:
    ``(o_year, mkt_share)``."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region_t = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    lineitem = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    rkey = {
        r["r_name"]: int(r["r_regionkey"]) for r in region_t.take_all()
    }[region]
    nrows = nation.take_all()
    region_nations = {
        int(r["n_nationkey"]) for r in nrows if int(r["n_regionkey"]) == rkey
    }
    target_key = {r["n_name"]: int(r["n_nationkey"]) for r in nrows}[target_nation]
    region_ref = ray.put(region_nations)

    lo = pa.scalar(np.datetime64("1995-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def window_orders(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"]
        return t.filter(pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi)))

    orders_w = attach_lookup(
        orders.map_batches(window_orders, batch_format="pyarrow"),
        customer,
        "o_custkey",
        "c_custkey",
        "c_nationkey",
        broadcast_limit,
    )

    def region_only(t: pa.Table) -> pa.Table:
        keys = get_broadcast(region_ref)
        mask = pa.array(
            [int(k) in keys for k in t["c_nationkey"].to_pylist()], pa.bool_()
        )
        return t.filter(mask).select(["o_orderkey", "o_orderdate"])

    orders_r = orders_w.map_batches(region_only, batch_format="pyarrow")

    def type_parts(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p_type"], part_type))

    lines = attach_lookup(
        lineitem,
        part.map_batches(type_parts, batch_format="pyarrow"),
        "l_partkey",
        "p_partkey",
        "p_type",
        broadcast_limit,
    ).drop_columns(["p_type"])
    lines = attach_lookup(
        lines, orders_r, "l_orderkey", "o_orderkey", "o_orderdate", broadcast_limit
    )
    lines = attach_lookup(
        lines, supplier, "l_suppkey", "s_suppkey", "s_nationkey", broadcast_limit
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _rev_c4(t)
        is_target = pc.equal(pc.cast(t["s_nationkey"], pa.int64()), target_key)
        nom = pc.if_else(is_target, rev, pa.scalar(0, pa.int64()))
        df = pd.DataFrame(
            {
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()).to_pandas(),
                "nom_c4": nom.to_pandas(),
                "den_c4": rev.to_pandas(),
            }
        )
        out = df.groupby("o_year", sort=False)[["nom_c4", "den_c4"]].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    per_year = hash_groupby(
        lines.map_batches(partial, batch_format="pyarrow"),
        ["o_year"],
        lambda df: df.groupby("o_year", sort=False)[["nom_c4", "den_c4"]]
        .sum()
        .reset_index(),
    )

    def finish(t: pa.Table) -> pa.Table:
        nom = t["nom_c4"].to_pylist()
        den = t["den_c4"].to_pylist()
        return pa.table(
            {
                "o_year": t["o_year"],
                "mkt_share": pa.array(
                    [n / d if d else 0.0 for n, d in zip(nom, den)], pa.float64()
                ),
            }
        )

    return per_year.map_batches(finish, batch_format="pyarrow").sort("o_year")


# ---------------------------------------------------------------------------
# Q11 (adapted) — parts whose revenue exceeds a fraction of the global total
# ---------------------------------------------------------------------------


def significant_parts(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q11 shape without partsupp: parts whose revenue exceeds 1.5x
    the MEAN per-part revenue (a scale-free threshold — TPC-H's fixed
    fraction-of-total empties as |parts| grows). The global scalars
    (total, n_parts) reduce from the small per-part aggregate; the HAVING
    comparison is the exact integer cross-product ``2 * part_rev *
    n_parts > 3 * total``. Columns: ``(l_partkey, part_revenue)`` sorted
    by revenue desc."""
    lineitem = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": t["l_partkey"].to_pandas(),
                "rev_c4": _rev_c4(t).to_pandas(),
            }
        )
        out = df.groupby("l_partkey", sort=False)["rev_c4"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    per_part = hash_groupby(
        lineitem.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey"],
        lambda df: df.groupby("l_partkey", sort=False)["rev_c4"].sum().reset_index(),
    ).materialize()  # |parts| rows; consumed twice (global sum + HAVING scan)
    total = per_part.sum("rev_c4")
    n_parts = per_part.count()

    def having(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(pc.cast(t["rev_c4"], pa.int64()), 2 * n_parts)
        keep = t.filter(pc.greater(lhs, pa.scalar(3 * total, pa.int64())))
        return pa.table(
            {
                "l_partkey": pc.cast(keep["l_partkey"], pa.int64()),
                "part_revenue": pc.divide(
                    pc.cast(keep["rev_c4"], pa.float64()), 10000.0
                ),
            }
        )

    return per_part.map_batches(having, batch_format="pyarrow").sort(
        ["part_revenue", "l_partkey"], descending=[True, False]
    )


# ---------------------------------------------------------------------------
# Q21 (adapted) — per-group exists/not-exists: sole-returning suppliers
# ---------------------------------------------------------------------------


def waiting_suppliers(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q21 shape on available columns: suppliers who, in
    multi-supplier orders, were the ONLY supplier with a returned ('R')
    line — the reference's EXISTS (another supplier) / NOT-EXISTS (another
    returning supplier) pair restated as per-order aggregates. One
    groupby builds per-(order, supplier) return flags, a second reduces
    them to per-order (n_suppliers, n_returning); the order stats attach
    back by guarded lookup and the final per-supplier count is a third
    small groupby. Columns: ``(s_name, numwait)`` top-20 by (numwait desc,
    s_name)."""
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_pandas(),
                "l_suppkey": t["l_suppkey"].to_pandas(),
                "r": pc.equal(t["l_returnflag"], "R").to_pandas().astype(np.int64),
            }
        )
        out = (
            df.groupby(["l_orderkey", "l_suppkey"], sort=False)["r"]
            .max()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    per_pair = hash_groupby(
        lineitem.map_batches(pair_partial, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"],
        lambda df: df.groupby(["l_orderkey", "l_suppkey"], sort=False)["r"]
        .max()
        .reset_index(),
    )

    # Second (order-keyed) shuffle co-locates each order's pair rows, so the
    # per-order stats and the qualifying-pair filter both run inside one
    # partition-local pandas pass — no order-stats broadcast or join-back.
    def order_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", sort=False)["r"]
        stats = g.agg(n_supp="size", n_ret="sum").reset_index()
        merged = df.merge(stats, on="l_orderkey", how="left")
        keep = merged[
            (merged["r"] == 1) & (merged["n_supp"] > 1) & (merged["n_ret"] == 1)
        ]
        return keep[["l_suppkey"]]

    culprits = hash_groupby(per_pair, ["l_orderkey"], order_stats)

    counts = hash_groupby(
        culprits,
        ["l_suppkey"],
        lambda df: df.groupby("l_suppkey", sort=False)
        .size()
        .rename("numwait")
        .reset_index(),
    )
    named = attach_lookup(
        counts, supplier, "l_suppkey", "s_suppkey", "s_name", broadcast_limit
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_name": t["s_name"],
                "numwait": pc.cast(t["numwait"], pa.int64()),
            }
        )

    return (
        named.map_batches(finish, batch_format="pyarrow")
        .sort(["numwait", "s_name"], descending=[True, False])
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 (adapted) — scalar-subquery threshold + anti-join
# ---------------------------------------------------------------------------


def sales_opportunity(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q22 shape keyed by market segment instead of phone prefix:
    customers with above-average positive balance and no RECENT order
    (none since 1999 — a pure never-ordered test is degenerate here, every
    customer has ~10 lifetime orders). The global average is the exact
    integer pair (sum_cents, n) reduced from per-block partials; 'above
    average' is the cross-product ``acctbal_cents * n > sum_cents``
    (stated identically in the oracle); the inactivity test is the
    broadcast NOT-IN of the distinct recent ``o_custkey`` set (guard:
    beyond broadcast scale flip to the hash-partition anti-join, as
    ``customers_without_orders`` documents). Columns: ``(c_mktsegment,
    n_cust, total_acctbal)``."""
    customer = _read(
        sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        pos = pc.filter(cents, pc.greater(cents, 0))
        return pa.table(
            {
                "s": pa.array([pc.sum(pos).as_py() or 0], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    parts = customer.map_batches(bal_partial, batch_format="pyarrow").take_all()
    sum_c = sum(r["s"] for r in parts)
    n_pos = sum(r["n"] for r in parts)

    since = pa.scalar(np.datetime64("1999-01-01", "us"))

    def block_distinct(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater_equal(t["o_orderdate"], since))
        return pa.table({"o_custkey": pc.unique(f["o_custkey"])})

    distinct = hash_groupby(
        orders.map_batches(block_distinct, batch_format="pyarrow"),
        ["o_custkey"],
        lambda df: df.drop_duplicates(["o_custkey"]),
    )
    keys: set = set()
    for b in distinct.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.update(b["o_custkey"].to_pylist())
    keys_ref = ray.put(keys)

    def qualify(t: pa.Table) -> pa.Table:
        have = get_broadcast(keys_ref)
        cents = _cents(t["c_acctbal"])
        rich = pc.greater(pc.multiply(cents, n_pos), sum_c)
        never = pa.array(
            [k not in have for k in t["c_custkey"].to_pylist()], pa.bool_()
        )
        f = t.append_column("bal_cents", cents).filter(pc.and_(rich, never))
        if f.num_rows == 0:  # typed empty — from_pandas would emit null cols
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_cust": pa.array([], pa.int64()),
                    "bal_cents": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "c_mktsegment": f["c_mktsegment"].to_pandas(),
                "bal_cents": f["bal_cents"].to_pandas(),
            }
        )
        out = (
            df.groupby("c_mktsegment", sort=False)["bal_cents"]
            .agg(["size", "sum"])
            .reset_index()
            .rename(columns={"size": "n_cust", "sum": "bal_cents"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    per_seg = hash_groupby(
        customer.map_batches(qualify, batch_format="pyarrow"),
        ["c_mktsegment"],
        lambda df: df.groupby("c_mktsegment", sort=False)
        .agg(n_cust=("n_cust", "sum"), bal_cents=("bal_cents", "sum"))
        .reset_index(),
    )

    # <= |segments| rows: finish driver-side so an all-filtered result still
    # carries the typed (c_mktsegment, n_cust, total_acctbal) schema.
    rows = sorted(per_seg.take_all(), key=lambda r: r["c_mktsegment"])
    return ray.data.from_arrow(
        pa.table(
            {
                "c_mktsegment": pa.array(
                    [r["c_mktsegment"] for r in rows], pa.string()
                ),
                "n_cust": pa.array([int(r["n_cust"]) for r in rows], pa.int64()),
                "total_acctbal": pa.array(
                    [int(r["bal_cents"]) / 100.0 for r in rows], pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by supplier nation and order year
# ---------------------------------------------------------------------------


def product_type_profit(
    sf_dir: str,
    name_substr: str = "widget",
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
) -> "ray.data.Dataset":
    """TPC-H Q9 (adapted — no ``partsupp``, so part cost is proxied by
    ``p_retailprice * quantity``): per (supplier nation, order year) profit
    on parts whose name contains ``name_substr``.

    ``amount = extendedprice*(1-discount) - retailprice*quantity`` in exact
    1e-4-dollar ints end-to-end. Plan: the part side pre-filters to matching
    names BEFORE its (inner, guarded) lookup so non-matching lines drop at
    the attach; order year and supplier nation ride two more guarded
    lookups; the (nation, year) matrix is tiny so one ``hash_groupby``
    finishes it. Columns: ``(nation, o_year, sum_profit)`` ordered by
    nation, year DESC (the reference Q9 order)."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    lineitem = _read(
        sf_dir,
        "lineitem",
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def matching_parts(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.match_substring(t["p_name"], name_substr)
        ).select(["p_partkey", "p_retailprice"])

    lines = attach_lookup(
        lineitem,
        part.map_batches(matching_parts, batch_format="pyarrow"),
        "l_partkey",
        "p_partkey",
        "p_retailprice",
        broadcast_limit,
    )
    lines = attach_lookup(
        lines, orders, "l_orderkey", "o_orderkey", "o_orderdate", broadcast_limit
    )
    lines = attach_lookup(
        lines, supplier, "l_suppkey", "s_suppkey", "s_nationkey", broadcast_limit
    )

    def partial(t: pa.Table) -> pa.Table:
        cost = pc.multiply(
            pc.multiply(_cents(t["p_retailprice"]), pa.scalar(100, pa.int64())),
            _qty_int(t),
        )
        df = pd.DataFrame(
            {
                "s_nationkey": pc.cast(t["s_nationkey"], pa.int64()).to_pandas(),
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()).to_pandas(),
                "amount_c4": pc.subtract(_rev_c4(t), cost).to_pandas(),
            }
        )
        out = (
            df.groupby(["s_nationkey", "o_year"], sort=False)["amount_c4"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    per_cell = hash_groupby(
        lines.map_batches(partial, batch_format="pyarrow"),
        ["s_nationkey", "o_year"],
        lambda df: df.groupby(["s_nationkey", "o_year"], sort=False)["amount_c4"]
        .sum()
        .reset_index(),
    )
    # nation names attach from the 25-row dimension on the driver; the
    # (nation, year) matrix is <= 25 x |years| so the finish is driver-sized
    nmap = {int(r["n_nationkey"]): r["n_name"] for r in nation.take_all()}
    cells = sorted(
        per_cell.take_all(),
        key=lambda r: (nmap[int(r["s_nationkey"])], -int(r["o_year"])),
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "nation": pa.array(
                    [nmap[int(r["s_nationkey"])] for r in cells], pa.string()
                ),
                "o_year": pa.array([int(r["o_year"]) for r in cells], pa.int64()),
                "sum_profit": pa.array(
                    [int(r["amount_c4"]) / 10000.0 for r in cells], pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-delay buckets vs order priority
# ---------------------------------------------------------------------------


def shipping_delay_priority(
    sf_dir: str,
    fast_days: int = 30,
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
) -> "ray.data.Dataset":
    """TPC-H Q12 (adapted — the synthetic schema has no ship mode or
    commit/receipt dates): 1996-shipped lines bucketed by order-to-ship
    delay (``FAST`` <= ``fast_days`` days, else ``SLOW``), counting
    high-priority (1-URGENT / 2-HIGH) vs low-priority lines per bucket —
    Q12's CASE-sum signature over a lineitem x orders join.

    Delay compares exact int64 microseconds on both engines (no calendar
    arithmetic to diverge on). One guarded lookup attaches the order
    columns; counts pre-aggregate per batch so the final exchange is two
    rows. Columns: ``(ship_bucket, high_line_count, low_line_count)``."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def in_window(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"]
        return t.filter(pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi)))

    lines = attach_lookup(
        lineitem.map_batches(in_window, batch_format="pyarrow"),
        orders,
        "l_orderkey",
        "o_orderkey",
        ["o_orderdate", "o_orderpriority"],
        broadcast_limit,
    )

    fast_us = fast_days * 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        delay = pc.subtract(
            pc.cast(t["l_shipdate"], pa.int64()),
            pc.cast(t["o_orderdate"], pa.int64()),
        )
        fast = pc.less_equal(delay, pa.scalar(fast_us, pa.int64()))
        high = pc.is_in(
            t["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"], pa.string()),
        )
        bucket = pc.if_else(fast, "FAST", "SLOW")
        df = pd.DataFrame(
            {
                "ship_bucket": bucket.to_pandas(),
                "high": pc.cast(high, pa.int64()).to_pandas(),
                "low": pc.cast(pc.invert(high), pa.int64()).to_pandas(),
            }
        )
        out = (
            df.groupby("ship_bucket", sort=False)[["high", "low"]]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    per_bucket = hash_groupby(
        lines.map_batches(partial, batch_format="pyarrow"),
        ["ship_bucket"],
        lambda df: df.groupby("ship_bucket", sort=False)[["high", "low"]]
        .sum()
        .reset_index(),
    )
    rows = sorted(per_bucket.take_all(), key=lambda r: r["ship_bucket"])
    return ray.data.from_arrow(
        pa.table(
            {
                "ship_bucket": pa.array([r["ship_bucket"] for r in rows], pa.string()),
                "high_line_count": pa.array([int(r["high"]) for r in rows], pa.int64()),
                "low_line_count": pa.array([int(r["low"]) for r in rows], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Q16 — part/supplier relationship: distinct suppliers per part group
# ---------------------------------------------------------------------------


def part_supplier_relationship(
    sf_dir: str,
    excluded_brand: str = "Brand#13",
    excluded_type: str = "PROMO",
    max_size: int = 25,
    complaint_bal_cents: int = 100_000,
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
) -> "ray.data.Dataset":
    """TPC-H Q16 (adapted — supplier-part relationships come from observed
    ``lineitem`` shipments instead of ``partsupp``, and the "customer
    complaints" NOT-IN subquery excludes suppliers with account balance
    below ``complaint_bal_cents``): distinct supplier count per
    (brand, type, size) group over qualifying parts.

    Plan: the complaint subquery aggregates the supplier table to a key
    set shipped ONCE via ``ray.put`` (it is a filtered dimension — tiny by
    construction; at cluster scale this is the classic broadcast anti-join
    side). Parts pre-filter before their guarded lookup; the
    count-distinct runs as drop-duplicates inside a part-keyed
    ``hash_groupby`` partial (suppliers of one part co-locate), then a
    group-keyed exact count. Columns:
    ``(p_brand, p_type, p_size, supplier_cnt)`` ordered by count DESC then
    group (the reference Q16 order)."""
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    lineitem = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def complained(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.less(_cents(t["s_acctbal"]), pa.scalar(complaint_bal_cents, pa.int64()))
        ).select(["s_suppkey"])

    bad_keys = {
        int(r["s_suppkey"])
        for r in supplier.map_batches(complained, batch_format="pyarrow").take_all()
    }
    bad_ref = ray.put(bad_keys)

    def qualifying_parts(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.not_equal(t["p_brand"], excluded_brand),
                pc.not_equal(t["p_type"], excluded_type),
            ),
            pc.less_equal(t["p_size"], pa.scalar(max_size)),
        )
        return t.filter(mask)

    lines = attach_lookup(
        lineitem,
        part.map_batches(qualifying_parts, batch_format="pyarrow"),
        "l_partkey",
        "p_partkey",
        ["p_brand", "p_type", "p_size"],
        broadcast_limit,
    )

    def drop_bad_and_dedup(df: "pd.DataFrame") -> "pd.DataFrame":
        bad = get_broadcast(bad_ref)
        df = df[~df["l_suppkey"].isin(bad)]
        return df.drop_duplicates(["l_partkey", "l_suppkey"])[
            ["p_brand", "p_type", "p_size", "l_partkey", "l_suppkey"]
        ]

    # part-keyed partition: all (part, supplier) observations of one part
    # co-locate, so drop_duplicates is exact; a second exchange on the
    # (brand, type, size) group key counts distinct suppliers exactly —
    # the same supplier may serve many parts of one group, so the dedup
    # must re-run on the group key, not just the part key
    pairs = hash_groupby(
        lines.select_columns(
            ["l_partkey", "l_suppkey", "p_brand", "p_type", "p_size"]
        ),
        ["l_partkey"],
        drop_bad_and_dedup,
    )

    def count_distinct(df: "pd.DataFrame") -> "pd.DataFrame":
        out = (
            df.drop_duplicates(["p_brand", "p_type", "p_size", "l_suppkey"])
            .groupby(["p_brand", "p_type", "p_size"], sort=False)
            .size()
            .rename("supplier_cnt")
            .reset_index()
        )
        out["p_size"] = out["p_size"].astype("int64")
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out

    counted = hash_groupby(
        pairs.select_columns(["p_brand", "p_type", "p_size", "l_suppkey"]),
        ["p_brand", "p_type", "p_size"],
        count_distinct,
    )
    # post-aggregation result is small (bounded by attribute combinations);
    # materialize it so an all-filtered outcome still returns the typed
    # schema instead of Ray's schema-less empty blocks
    counted = counted.materialize()
    if counted.count() == 0:
        # an empty ray Dataset surfaces schema-less from to_pandas, so the
        # empty case returns the typed Arrow table itself
        return pa.schema(
            [
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int64()),
                ("supplier_cnt", pa.int64()),
            ]
        ).empty_table()
    return counted.sort(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        descending=[True, False, False, False],
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: dominant suppliers of a part family
# ---------------------------------------------------------------------------


def promotable_part_suppliers(
    sf_dir: str,
    name_prefix: str = "blue",
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
) -> "ray.data.Dataset":
    """TPC-H Q20 (adapted — no ``partsupp`` availability column): surface
    (part, supplier) pairs where the supplier shipped more than 2x the
    average per-supplier quantity of that part (``qty * n_supp > 2 *
    total`` in exact ints — Q20's correlated nested-aggregate threshold),
    over parts whose name starts with ``name_prefix``; supplier name and
    nation attach by semi-join afterwards.

    Plan: ONE part-keyed ``hash_groupby`` both builds the (part, supplier)
    quantity pairs AND applies the correlated per-part threshold (all of a
    part's pairs co-locate, so the part total never needs a second
    exchange); the survivors are a tiny fraction, so the supplier/nation
    attaches ride guarded lookups. Columns:
    ``(l_partkey, s_name, nation)`` ordered by part then name."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    lineitem = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    def prefix_parts(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.starts_with(t["p_name"], name_prefix)
        ).select(["p_partkey"])

    lines = attach_lookup(
        lineitem,
        part.map_batches(prefix_parts, batch_format="pyarrow"),
        "l_partkey",
        "p_partkey",
        [],
        broadcast_limit,
    )

    def qty_col(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "qty": _qty_int(t),
            }
        )

    def dominant_pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        pair = (
            df.groupby(["l_partkey", "l_suppkey"], sort=False)["qty"]
            .sum()
            .reset_index()
        )
        grp = pair.groupby("l_partkey", sort=False)["qty"]
        total = grp.transform("sum")
        n_supp = grp.transform("size")
        keep = pair[pair["qty"] * n_supp > 2 * total]
        return keep[["l_partkey", "l_suppkey"]]

    pairs = hash_groupby(
        lines.map_batches(qty_col, batch_format="pyarrow"),
        ["l_partkey"],
        dominant_pairs,
    )
    named = attach_lookup(
        pairs, supplier, "l_suppkey", "s_suppkey", ["s_name", "s_nationkey"],
        broadcast_limit,
    )
    named = attach_lookup(
        named, nation, "s_nationkey", "n_nationkey", "n_name", broadcast_limit
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "s_name": t["s_name"],
                "nation": t["n_name"],
            }
        )

    # the dominant-pair survivors are a small post-aggregation set;
    # materialize so an empty outcome keeps the typed schema
    out = named.map_batches(finish, batch_format="pyarrow").materialize()
    if out.count() == 0:
        # an empty ray Dataset surfaces schema-less from to_pandas, so the
        # empty case returns the typed Arrow table itself
        return pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("s_name", pa.string()),
                ("nation", pa.string()),
            ]
        ).empty_table()
    return out.sort(["l_partkey", "s_name"])
