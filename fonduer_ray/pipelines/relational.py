"""Relational operator pipelines over the TPC-H-ish test tables.

These exercise the engine's generic relational capabilities — vectorized
Arrow map_batches, filters, size-guarded lookup joins (small side broadcast
once via ``ray.put``; above ``BROADCAST_ROW_LIMIT`` a hash-partition
``Dataset.join``), partial-then-global aggregation, two-phase distinct,
multi-key sort/top-k, and grouped window-style logic — each with a DuckDB
oracle in ``__ray_entry__.oracle_sql``.

Money sums use exact integer cents (``round(x*100)`` as int64) so Ray and
the SQL oracle agree bit-for-bit regardless of summation order.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from fonduer_ray.stages.util import get_broadcast


#: target rows per block for the light relational scans below; blocks are
#: capped at 4x the CPU count so big tables still fan out
_READ_ROWS_PER_BLOCK = 32_768


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    """Row-count-aware parquet read: by default Ray splits every file into
    ~2x-CPU blocks regardless of size, so a 25-row dimension table becomes
    64 blocks and every downstream operator pays 64 task dispatches
    (~30ms each — measured 1.8s of pure dispatch on a 15k-row lookup).
    Sizing blocks from the (free) parquet metadata row count keeps tiny
    tables in one block while large tables still split; the per-row work
    in these relational ops is light, so ``4*cpus`` blocks is plenty of
    parallelism at any scale."""
    from fonduer_ray.stages.util import read_blocks_for

    path = f"{sf_dir}/{table}.parquet"
    n = read_blocks_for(path)
    if n:
        return ray.data.read_parquet(path, columns=columns, override_num_blocks=n)
    return ray.data.read_parquet(path, columns=columns)


def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """Q1-style grouped aggregate with exact-cents money sums."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        rev_c4 = pc.multiply(cents, pc.subtract(100, disc_c))  # price*disc in 1e-4 units
        qty = pc.cast(t["l_quantity"], pa.int64())
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "price_cents": cents,
                "rev_c4": rev_c4,
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="price_cents"),
            Sum("rev_c4", alias_name="rev_c4"),
            Count(alias_name="count_order"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": t["sum_qty"],
                "sum_price": pc.divide(pc.cast(t["price_cents"], pa.float64()), 100.0),
                "sum_revenue": pc.divide(pc.cast(t["rev_c4"], pa.float64()), 10000.0),
                "count_order": t["count_order"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_filter(sf_dir: str) -> "ray.data.Dataset":
    """Q6-style scan-filter-aggregate: predicate pushed into the batch
    (vectorized), single-row result in exact cents."""
    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        disc_c = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(np.datetime64("1995-01-01", "us"))),
                pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1997-01-01", "us"))),
            ),
            pc.and_(
                pc.greater_equal(disc_c, 5),
                pc.less(t["l_quantity"], 25.0),
            ),
        )
        f = t.filter(mask)
        cents = pc.cast(pc.round(pc.multiply(f["l_extendedprice"], 100.0)), pa.int64())
        dc = pc.cast(pc.round(pc.multiply(f["l_discount"], 100.0)), pa.int64())
        rev = pc.multiply(cents, dc)
        s = pc.sum(rev).as_py() or 0
        return pa.table(
            {"rev_c4": pa.array([s], pa.int64()), "n": pa.array([f.num_rows], pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    total = partials.aggregate(Sum("rev_c4", alias_name="rev_c4"), Sum("n", alias_name="n_rows"))
    return pa.table(
        {
            "sum_revenue": pa.array([(total["rev_c4"] or 0) / 10000.0], pa.float64()),
            "n_rows": pa.array([total["n_rows"] or 0], pa.int64()),
        }
    )


def top_orders(sf_dir: str) -> "ray.data.Dataset":
    """Multi-key top-k: highest-value orders, deterministic tie-break."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


#: above this many rows a lookup table is no longer collected into a driver
#: dict and broadcast (1.5M x SF customers means a multi-GB dict at a 100x
#: scale-up) — the join switches to a hash-partition ``Dataset.join``, the
#: same guard pattern as ``linking.link_triples``
BROADCAST_ROW_LIMIT = 2_000_000


def attach_lookup(
    ds: "ray.data.Dataset",
    lookup: "ray.data.Dataset",
    key: str,
    lookup_key: str,
    val: str | list[str],
    broadcast_limit: int = BROADCAST_ROW_LIMIT,
) -> "ray.data.Dataset":
    """Inner lookup join: attach ``lookup[val]`` (one column or several) to
    every row of ``ds`` matching ``ds[key] == lookup[lookup_key]``
    (non-matching rows drop).

    Size-guarded strategy: the lookup side is counted first — BEFORE the
    column projection, so a plain ``read_parquet`` lookup counts from
    Parquet metadata without executing (projection would add a Project op
    and force a full scan just to count, doubling the lookup's execution).
    At or below ``broadcast_limit`` it is shipped ONCE via ``ray.put`` and
    applied as a vectorized dict lookup inside ``map_batches`` — no
    shuffle of the big side. Above the limit both sides hash-partition
    through ``Dataset.join`` so nothing driver-sized ever materializes.

    PRECONDITION: ``lookup_key`` must be UNIQUE on the lookup side (it is
    a dimension/primary key at every call site). The two strategies
    diverge on duplicates — the broadcast dict silently keeps the last
    row per key while ``Dataset.join`` multiplies rows (SQL semantics) —
    so a non-unique lookup would flip results with ``broadcast_limit``.
    Under ``FONDUER_RAY_DEBUG=1`` the broadcast path asserts uniqueness."""
    vals = [val] if isinstance(val, str) else list(val)
    n_lookup = lookup.count()
    lookup = lookup.select_columns([lookup_key] + vals)

    if n_lookup <= broadcast_limit:
        schema = lookup.schema()
        types = dict(zip(schema.names, schema.types))
        lkp = {
            row[0]: row[1:]
            for batch in lookup.iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
            for row in zip(
                batch[lookup_key].to_pylist(),
                *(batch[v].to_pylist() for v in vals),
            )
        }
        if os.environ.get("FONDUER_RAY_DEBUG") == "1" and len(lkp) != n_lookup:
            raise ValueError(
                f"attach_lookup: lookup key '{lookup_key}' is not unique "
                f"({n_lookup} rows, {len(lkp)} distinct keys); broadcast "
                "and join paths would diverge"
            )
        lkp_ref = ray.put(lkp)

        def attach(t: pa.Table) -> pa.Table:
            lkp = get_broadcast(lkp_ref)
            hits = [lkp.get(k) for k in t[key].to_pylist()]
            mask = pa.array([h is not None for h in hits])
            out = t
            for i, v in enumerate(vals):
                col = [h[i] if h is not None else None for h in hits]
                out = out.append_column(v, pa.array(col, type=types[v]))
            return out.filter(mask)

        return ds.map_batches(attach, batch_format="pyarrow")

    from fonduer_ray.stages.util import join_partitions

    # Acero's hash join (unlike the dict-based broadcast path above) needs
    # exactly matching key dtypes — an int32 parquet dimension key against a
    # derived int64 key fails the whole join. Align by casting the (small)
    # lookup side's key to the big side's type; a key that can't represent
    # in that type couldn't have matched anyway, and the cast is loud (safe
    # cast raises) rather than silently dropping.
    ds_schema = ds.schema()
    ds_types = dict(zip(ds_schema.names, ds_schema.types))
    lkp_types = dict(zip(lookup.schema().names, lookup.schema().types))
    if ds_types[key] != lkp_types[lookup_key]:
        target = ds_types[key]

        def align_key(t: pa.Table, _k=lookup_key, _ty=target) -> pa.Table:
            idx = t.schema.get_field_index(_k)
            return t.set_column(idx, _k, pc.cast(t[_k], _ty))

        lookup = lookup.map_batches(align_key, batch_format="pyarrow")

    # Ray's map_groups emits ZERO-COLUMN empty blocks for empty partitions;
    # the per-partition acero join then fails with "no match for key field
    # on left side". Rebuild such blocks as typed empty tables so every
    # block carries the key column.
    empty_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(ds_schema.names, ds_schema.types)]
    )

    def norm_empty(t: pa.Table, _s=empty_schema) -> pa.Table:
        return _s.empty_table() if t.num_columns == 0 else t

    ds = ds.map_batches(norm_empty, batch_format="pyarrow")

    joined = ds.join(
        lookup,
        "inner",
        num_partitions=join_partitions(),
        on=(key,),
        right_on=(lookup_key,),
    )
    drop = [c for c in (lookup_key,) if c != key and c in joined.columns()]
    return joined.drop_columns(drop) if drop else joined


def orders_per_nation(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """orders |x| customer |x| nation, then a partial-aggregated count.
    Both lookups go through the size-guarded ``attach_lookup`` (customer is
    the side that outgrows a broadcast at web scale; nation never does)."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])

    with_nk = attach_lookup(
        orders, customer, "o_custkey", "c_custkey", "c_nationkey", broadcast_limit
    )
    with_name = attach_lookup(
        with_nk, nation, "c_nationkey", "n_nationkey", "n_name", broadcast_limit
    )
    return (
        with_name.select_columns(["n_name"])
        .groupby("n_name")
        .aggregate(Count(alias_name="n_orders"))
    )


def supplier_region(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """supplier -> nation -> region multi-hop guarded lookup join + count."""
    supplier = _read(sf_dir, "supplier", ["s_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])

    with_rk = attach_lookup(
        supplier, nation, "s_nationkey", "n_nationkey", "n_regionkey", broadcast_limit
    )
    with_name = attach_lookup(
        with_rk, region, "n_regionkey", "r_regionkey", "r_name", broadcast_limit
    )
    return (
        with_name.select_columns(["r_name"])
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"))
    )


def part_brands(sf_dir: str) -> "ray.data.Dataset":
    """Two-phase distinct: distinct (type, brand) pairs first (combiner
    collapses dupes in the shuffle), then count brands per type."""
    ds = _read(sf_dir, "part", ["p_type", "p_brand"])
    pairs = ds.groupby(["p_type", "p_brand"]).aggregate(Count(alias_name="_c"))
    return (
        pairs.groupby("p_type")
        .aggregate(Count(alias_name="n_brands"), Sum("_c", alias_name="n_parts"))
    )


def events_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Grouped aggregate with exact-cents min/max/count over the stream table."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )


def user_topk(sf_dir: str) -> "ray.data.Dataset":
    """Top 20 most active users (count desc, user_id asc tie-break)."""
    ds = _read(sf_dir, "events", ["user_id"])
    counts = ds.groupby("user_id").aggregate(Count(alias_name="n_events"))
    return counts.sort(["n_events", "user_id"], descending=[True, False]).limit(20)


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Sessionization (window-style): per user, count sessions delimited by
    >gap gaps — grouped sort inside ``map_groups``, no global sort."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values().to_numpy()
        if len(ts) == 0:
            return pd.DataFrame({"user_id": [], "n_sessions": [], "n_events": []})
        gaps = np.diff(ts) > np.timedelta64(gap_minutes * 60, "s")
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(gaps.sum()) + 1],
                "n_events": [len(ts)],
            }
        )

    from fonduer_ray.stages.util import hash_groupby

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        frames = [sessions(g) for _, g in df.groupby("user_id", sort=False)]
        return pd.concat(frames, ignore_index=True) if frames else sessions(df)

    return hash_groupby(ds, ["user_id"], per_user)


def order_priority_counts(sf_dir: str) -> "ray.data.Dataset":
    """Filter + groupby on orders (date-range predicate at the batch)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(np.datetime64("1995-01-01", "us"))),
            pc.less(t["o_orderdate"], pa.scalar(np.datetime64("1996-01-01", "us"))),
        )
        return t.filter(mask).select(["o_orderpriority"])

    return (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
    )


def events_tumbling_window(sf_dir: str, window_minutes: int = 60) -> "ray.data.Dataset":
    """Tumbling-window aggregate (the custom "windowed aggregate" operator
    Ray Data lacks natively): assign each event to its window start via
    vectorized timestamp truncation inside ``map_batches`` — a pure
    per-record map, so NO shuffle beyond the final (window, type) groupby,
    which a per-block combiner could further shrink at scale. Columns:
    ``(window_start, event_type, n_events, sum_value)``."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    step = np.timedelta64(window_minutes * 60, "s").astype("timedelta64[us]")

    def assign(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy()
        win = ts - ((ts - np.datetime64(0, "us")) % step)
        # integer cents so the distributed sum is order-independent and
        # exactly comparable to the SQL oracle (same trick as pricing_summary)
        cents = np.rint(t["value"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "window_start": pa.array(win),
                "event_type": t["event_type"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def win_agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["window_start", "event_type"], sort=False)
            .agg(n_events=("cents", "size"), cents=("cents", "sum"))
            .reset_index()
        )

    agg = hash_groupby(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["window_start", "event_type"],
        win_agg,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                # Ray's aggregate round-trips timestamps to [s]; restore us
                "window_start": t["window_start"].cast(pa.timestamp("us")),
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pa.array(
                    t["cents"].to_numpy(zero_copy_only=False) / 100.0, pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def events_hopping_window(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 30
) -> "ray.data.Dataset":
    """HOPPING (overlapping sliding) window aggregate: each event lands in
    ``window/hop`` windows, assigned by a vectorized flat-map inside
    ``map_batches`` (event at t belongs to every window start w = t
    truncated to hop, minus k*hop for k < window/hop) — again no shuffle
    beyond the final keyed groupby. Columns: ``(window_start, event_type,
    n_events, sum_value)``."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    hop = np.timedelta64(hop_minutes * 60, "s").astype("timedelta64[us]")
    n_hops = window_minutes // hop_minutes

    def assign(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy()
        base = ts - ((ts - np.datetime64(0, "us")) % hop)
        cents = np.rint(t["value"].to_numpy() * 100).astype(np.int64)
        types = t["event_type"].combine_chunks()
        wins, typ_idx = [], []
        for k in range(n_hops):
            wins.append(base - k * hop)
        win = np.concatenate(wins)
        return pa.table(
            {
                "window_start": pa.array(win),
                "event_type": pa.concat_arrays([types] * n_hops),
                "cents": pa.concat_arrays(
                    [pa.array(cents, pa.int64())] * n_hops
                ),
            }
        )

    from fonduer_ray.stages.util import hash_groupby

    def win_agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["window_start", "event_type"], sort=False)
            .agg(n_events=("cents", "size"), cents=("cents", "sum"))
            .reset_index()
        )

    agg = hash_groupby(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["window_start", "event_type"],
        win_agg,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": t["window_start"].cast(pa.timestamp("us")),
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pa.array(
                    t["cents"].to_numpy(zero_copy_only=False) / 100.0, pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def top_events_per_user(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Grouped top-k (a windowed-rank operator Ray Data lacks natively):
    per-block combiner keeps each block's local top-k per user, then one
    hash-partition groupby finishes the exact global top-k. Deterministic
    tie-break (value desc, ts asc). Columns: ``(user_id, rank, value)``."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": pa.array(
                    np.rint(t["value"].to_numpy() * 100).astype(np.int64), pa.int64()
                ),
            }
        )

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["user_id", "cents", "ts"], ascending=[True, False, True])
        return pa.Table.from_pandas(
            df.groupby("user_id", sort=False).head(k), preserve_index=False
        )

    from fonduer_ray.stages.util import hash_groupby

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "cents", "ts"], ascending=[True, False, True])
        out = df.groupby("user_id", sort=False).head(k).copy()
        out["rank"] = out.groupby("user_id", sort=False).cumcount() + 1
        return out[["user_id", "rank", "cents"]]

    agg = hash_groupby(
        ds.map_batches(prep, batch_format="pyarrow").map_batches(
            block_topk, batch_format="pyarrow"
        ),
        ["user_id"],
        final_topk,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "rank": t["rank"].cast(pa.int64()),
                "value": pa.array(
                    t["cents"].to_numpy(zero_copy_only=False) / 100.0, pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def orders_sample_split(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic hash-based train/dev/test splitting (the engine's
    sampling primitive, reference analog: sorted-name fractions,
    ``test_e2e.py:112-124``): split = first md5 byte of the order key mod 3
    — content-derived, so identical across runs, engines and partitionings.
    Columns: ``(split, n_orders, sum_price)``."""
    import hashlib

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def assign(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_pylist()
        splits = [
            hashlib.md5(str(k).encode()).digest()[0] % 3 for k in keys
        ]
        cents = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "split": pa.array(splits, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="cents"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "split": t["split"],
                "n_orders": t["n_orders"],
                "sum_price": pa.array(
                    t["cents"].to_numpy(zero_copy_only=False) / 100.0, pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def customers_without_orders(sf_dir: str) -> "ray.data.Dataset":
    """ANTI-join: customers that placed no orders during 1995. The distinct
    order custkey set is built with a per-block combiner + hash-partition
    distinct, then broadcast once via ``ray.put`` for a streaming NOT-IN
    filter over customers (guard: at web scale, where the distinct key set
    outgrows a broadcast, flip to the hash-partition join pattern of
    ``linking._apply_canonical``). Columns: ``(c_custkey, c_name)``."""
    from fonduer_ray.stages.util import hash_groupby

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def block_distinct(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        ts = t["o_orderdate"]
        mask = pc2.and_(
            pc2.greater_equal(ts, pa.scalar(np.datetime64("1995-01-01", "us"))),
            pc2.less(ts, pa.scalar(np.datetime64("1996-01-01", "us"))),
        )
        return pa.table({"o_custkey": pc2.unique(t.filter(mask)["o_custkey"])})

    distinct = hash_groupby(
        orders.map_batches(block_distinct, batch_format="pyarrow"),
        ["o_custkey"],
        lambda df: df.drop_duplicates(["o_custkey"]),
    )
    keys = set()
    for b in distinct.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.update(b["o_custkey"].to_pylist())
    keys_ref = ray.put(keys)

    def anti(t: pa.Table) -> pa.Table:
        have = get_broadcast(keys_ref)
        mask = pa.array(
            [k not in have for k in t["c_custkey"].to_pylist()], pa.bool_()
        )
        return t.filter(mask)

    return _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        anti, batch_format="pyarrow"
    )


def events_value_median(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-group discrete median (quantile_disc 0.5 semantics: the
    sorted value at index ceil(n/2)-1). Event-type cardinality is tiny but
    per-group row counts are not — values hash-partition by group and each
    partition computes its groups' order statistics exactly. Columns:
    ``(event_type, n_events, median_value)``."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": pa.array(
                    np.rint(t["value"].to_numpy() * 100).astype(np.int64), pa.int64()
                ),
            }
        )

    from fonduer_ray.stages.util import hash_groupby

    def med_agg(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.groupby("event_type", sort=False):
            vals = np.sort(g["cents"].to_numpy())
            n = len(vals)
            rows.append(
                {
                    "event_type": etype,
                    "n_events": n,
                    "median_cents": int(vals[int(np.ceil(n / 2)) - 1]),
                }
            )
        return pd.DataFrame(rows)

    agg = hash_groupby(
        ds.map_batches(prep, batch_format="pyarrow"), ["event_type"], med_agg
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_events": t["n_events"].cast(pa.int64()),
                "median_value": pa.array(
                    t["median_cents"].to_numpy(zero_copy_only=False) / 100.0,
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def events_asof_join(
    sf_dir: str, left_type: str = "click", right_type: str = "view"
) -> "ray.data.Dataset":
    """As-of (most-recent-prior) join: for each ``left_type`` event, the
    latest ``right_type`` event by the same user at or before its timestamp
    (reference has no analog; ties on ``ts`` break to the max ``event_id``
    so the result is deterministic).

    Scale design: ONE hash shuffle on ``user_id`` co-locates each user's
    history, then a single vectorized ``pd.merge_asof`` (C merge over
    ts-sorted rows, ``by=user_id``) per partition — no per-user Python
    loop, nothing on the driver. Per-user history is naturally bounded, so
    no salting is needed (and none is possible: the join requires the whole
    key group co-located).
    """
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array([left_type, right_type]))
        return t.filter(m)

    from fonduer_ray.stages.util import hash_groupby

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        lf = df[df["event_type"] == left_type].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )[["ts", "user_id", "event_id"]]
        rt = df[df["event_type"] == right_type].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )[["ts", "user_id", "event_id"]]
        rt = rt.rename(columns={"event_id": "matched_event_id"})
        rt["matched_ts"] = rt["ts"]
        out = pd.merge_asof(
            lf, rt, on="ts", by="user_id", direction="backward"
        )
        # unmatched -> -1 sentinel (nullable int round-trips as float in
        # pandas, which breaks exact dtype comparison with the oracle)
        out["matched_event_id"] = (
            out["matched_event_id"].fillna(-1).astype("int64")
        )
        return out[["event_id", "user_id", "ts", "matched_event_id", "matched_ts"]]

    return hash_groupby(ds.map_batches(keep, batch_format="pyarrow"), ["user_id"], asof)


def events_range_join(
    sf_dir: str,
    left_type: str = "error",
    right_type: str = "purchase",
    band_minutes: int = 5,
) -> "ray.data.Dataset":
    """Time-band (range) join: every (left, right) event pair with
    ``|right.ts - left.ts| <= band`` across ALL users (no equi-key).

    Scale design: bucketize time into band-sized granules. Left rows go to
    their own granule only; right rows replicate to the <=3 granules whose
    left rows could match them — so each qualifying pair materializes in
    exactly one granule and no dedup pass is needed. One hash shuffle on
    the granule id, then vectorized two-sided ``searchsorted`` pair
    expansion inside each granule. Replication factor is a constant 3x of
    the (filtered) right side regardless of data size.
    """
    band_us = band_minutes * 60 * 1_000_000
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def explode(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        etype = t["event_type"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy()
        lmask = etype == left_type
        rmask = etype == right_type
        l_ts, l_id = ts_us[lmask], eid[lmask]
        r_ts, r_id = ts_us[rmask], eid[rmask]
        gran = np.concatenate(
            [l_ts // band_us, r_ts // band_us - 1, r_ts // band_us, r_ts // band_us + 1]
        )
        side = np.concatenate(
            [np.zeros(len(l_ts), np.int8), np.ones(3 * len(r_ts), np.int8)]
        )
        return pa.table(
            {
                "gran": pa.array(gran, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "event_id": pa.array(np.concatenate([l_id, np.tile(r_id, 3)])),
                "ts_us": pa.array(np.concatenate([l_ts, np.tile(r_ts, 3)])),
            }
        )

    from fonduer_ray.stages.util import hash_groupby

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("gran", sort=False):
            lf = g[g["side"] == 0]
            rt = g[g["side"] == 1].sort_values("ts_us", kind="mergesort")
            if len(lf) == 0 or len(rt) == 0:
                continue
            r_ts = rt["ts_us"].to_numpy()
            r_id = rt["event_id"].to_numpy()
            l_ts = lf["ts_us"].to_numpy()
            l_id = lf["event_id"].to_numpy()
            lo = np.searchsorted(r_ts, l_ts - band_us, side="left")
            hi = np.searchsorted(r_ts, l_ts + band_us, side="right")
            n = hi - lo
            keep = n > 0
            if not keep.any():
                continue
            lo, n, l_idk = lo[keep], n[keep], l_id[keep]
            # flat indices of each left row's [lo, hi) right-range
            idx = np.repeat(lo, n) + (
                np.arange(n.sum()) - np.repeat(np.cumsum(n) - n, n)
            )
            outs.append(
                pd.DataFrame(
                    {"left_id": np.repeat(l_idk, n), "right_id": r_id[idx]}
                )
            )
        if not outs:
            return pd.DataFrame(
                {"left_id": pd.Series([], dtype="int64"),
                 "right_id": pd.Series([], dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    return hash_groupby(ds.map_batches(explode, batch_format="pyarrow"), ["gran"], pairs)


# ---------------------------------------------------------------------------
# analytic (window) functions
# ---------------------------------------------------------------------------


def _events_cents(sf_dir: str) -> "ray.data.Dataset":
    """events projected to (event_id, user_id, ts, cents) — exact integer
    cents so running sums match the oracle bit-for-bit in any order."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": pa.array(
                    np.rint(t["value"].to_numpy() * 100).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def _per_user_window(sf_dir: str, fn) -> "ray.data.Dataset":
    """Shared per-key window-function skeleton: ONE hash shuffle on
    ``user_id`` co-locates each user's ordered history, then ``fn`` runs a
    vectorized pandas window op per user group inside the partition.

    Per-user history is naturally bounded (sessions, not the corpus), so a
    whole key group fits a partition — the same partitioning argument as
    ``events_asof_join``. No driver-side work, no global sort."""
    from fonduer_ray.stages.util import hash_groupby

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        return fn(df)

    return hash_groupby(_events_cents(sf_dir), ["user_id"], agg)


def events_running_total(sf_dir: str) -> "ray.data.Dataset":
    """Per-user running sum of value (cents) in (ts, event_id) order —
    ``SUM() OVER (PARTITION BY user ORDER BY ts, event_id)`` semantics.
    Columns: ``(event_id, user_id, running_cents)``."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        df["running_cents"] = df.groupby("user_id", sort=False)[
            "cents"
        ].cumsum()
        return df[["event_id", "user_id", "running_cents"]]

    return _per_user_window(sf_dir, run)


def events_lag_delta(sf_dir: str) -> "ray.data.Dataset":
    """Per-user delta vs the previous event's value —
    ``cents - LAG(cents) OVER (PARTITION BY user ORDER BY ts, event_id)``;
    the first event of each user gets a 0 delta (COALESCE semantics, kept
    non-null so the int64 schema is stable). Columns:
    ``(event_id, user_id, delta_cents)``."""

    def lag(df: pd.DataFrame) -> pd.DataFrame:
        prev = df.groupby("user_id", sort=False)["cents"].shift(1)
        df["delta_cents"] = (
            (df["cents"] - prev).fillna(0).astype("int64")
        )
        return df[["event_id", "user_id", "delta_cents"]]

    return _per_user_window(sf_dir, lag)


def events_value_rank(sf_dir: str) -> "ray.data.Dataset":
    """Per-user dense ordering of events by value —
    ``ROW_NUMBER() OVER (PARTITION BY user ORDER BY cents DESC, event_id)``
    (event_id tie-break makes it deterministic). Columns:
    ``(event_id, user_id, value_rank)``."""

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "cents", "event_id"],
            ascending=[True, False, True],
            ignore_index=True,
        )
        df["value_rank"] = df.groupby("user_id", sort=False).cumcount() + 1
        return df[["event_id", "user_id", "value_rank"]]

    return _per_user_window(sf_dir, rank)


# ---------------------------------------------------------------------------
# pivot / rollup
# ---------------------------------------------------------------------------

#: fixed pivot column set — event_type is a closed enum in this corpus;
#: the oracle SQL hardcodes the same list (keep in sync)
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> "ray.data.Dataset":
    """Pivot events to one row per user with a count column per event type
    (+ total). Per-block partial (user, type) counts shrink the shuffle to
    distinct pairs per block; one user-keyed ``hash_groupby`` merges and
    widens — the pivot width is the enum size, so rows stay narrow at any
    scale. Columns: ``(user_id, n_click, n_error, n_purchase, n_signup,
    n_view, n_total)``."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby(["user_id", "event_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    from fonduer_ray.stages.util import hash_groupby

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        w = (
            df.groupby(["user_id", "event_type"], sort=False)["n"]
            .sum()
            .unstack("event_type", fill_value=0)
        )
        for et in EVENT_TYPES:
            if et not in w.columns:
                w[et] = 0
        w = w[list(EVENT_TYPES)].astype("int64")
        w.columns = [f"n_{c}" for c in w.columns]
        w["n_total"] = w.sum(axis=1)
        return w.reset_index()

    return hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["user_id"], widen
    )


def orders_rollup(sf_dir: str) -> "ray.data.Dataset":
    """``GROUP BY ROLLUP(o_orderpriority, o_orderstatus)`` counts with
    'ALL' sentinels for the rolled-up levels (no NULL keys — stable
    hashing). Leaf counts aggregate distributed; the rollup expansion is a
    flat map over the already-aggregated leaves (tiny) plus one more
    leaf-sized groupby — the raw table is scanned exactly once."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    from fonduer_ray.stages.util import hash_groupby

    leaves = hash_groupby(
        ds,
        ["o_orderpriority", "o_orderstatus"],
        lambda df: df.groupby(
            ["o_orderpriority", "o_orderstatus"], sort=False
        )
        .size()
        .rename("n_orders")
        .reset_index(),
    )

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        lvl1 = df.assign(o_orderstatus="ALL")
        lvl0 = df.assign(o_orderpriority="ALL", o_orderstatus="ALL")
        return pa.Table.from_pandas(
            pd.concat([df, lvl1, lvl0], ignore_index=True),
            preserve_index=False,
        )

    return hash_groupby(
        leaves.map_batches(expand, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"],
        lambda df: df.groupby(
            ["o_orderpriority", "o_orderstatus"], sort=False
        )["n_orders"]
        .sum()
        .reset_index(),
    )


def customers_with_orders_semi(sf_dir: str) -> "ray.data.Dataset":
    """SEMI-join via the native hash-partition ``Dataset.join``
    (``left_semi``): customers that placed at least one 1995 order,
    counted per nation key. Complements ``customers_without_orders``
    (broadcast NOT-IN anti-join) with the fully-shuffled path — both sides
    hash-partition, so nothing driver-sized materializes at any scale.
    Columns: ``(c_nationkey, n_customers)``."""
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def keys_1995(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"]
        mask = pc.and_(
            pc.greater_equal(ts, pa.scalar(np.datetime64("1995-01-01", "us"))),
            pc.less(ts, pa.scalar(np.datetime64("1996-01-01", "us"))),
        )
        return pa.table({"o_custkey": pc.unique(t.filter(mask)["o_custkey"])})

    from fonduer_ray.stages.util import join_partitions

    hit = customer.join(
        orders.map_batches(keys_1995, batch_format="pyarrow"),
        "left_semi",
        num_partitions=join_partitions(),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return (
        hit.select_columns(["c_nationkey"])
        .groupby("c_nationkey")
        .aggregate(Count(alias_name="n_customers"))
    )


def signup_purchase_funnel(
    sf_dir: str, within_days: int = 7
) -> "ray.data.Dataset":
    """Conversion funnel: for each user with at least one signup, did a
    purchase follow the FIRST signup within ``within_days``? One
    ``user_id`` hash shuffle, vectorized min/any per user inside the
    partition. Columns: ``(converted 0/1, n_users)`` — two rows max."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(["signup", "purchase"]))
        return t.filter(m)

    from fonduer_ray.stages.util import hash_groupby

    horizon = np.timedelta64(within_days, "D")

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        su = df[df["event_type"] == "signup"].groupby("user_id", sort=False)[
            "ts"
        ].min()
        if su.empty:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "converted": pd.Series([], dtype="int64")}
            )
        pu = df[df["event_type"] == "purchase"][["user_id", "ts"]]
        first = su.rename("first_signup").reset_index()
        j = pu.merge(first, on="user_id")
        hit = j[
            (j["ts"] >= j["first_signup"])
            & (j["ts"] <= j["first_signup"] + horizon)
        ]["user_id"].unique()
        out = first[["user_id"]].copy()
        out["converted"] = out["user_id"].isin(set(hit)).astype("int64")
        return out

    per_user = hash_groupby(
        ds.map_batches(keep, batch_format="pyarrow"), ["user_id"], funnel
    )
    return (
        per_user.select_columns(["converted"])
        .groupby("converted")
        .aggregate(Count(alias_name="n_users"))
    )


def events_props_stats(sf_dir: str) -> "ray.data.Dataset":
    """Semi-structured extraction: parse the JSON ``props`` column, pull
    the integer field ``k``, aggregate per event type (count, sum, max).
    The parse is a per-row scalar op inside ``map_batches`` (a compiled
    regex fast path with a json.loads fallback — props are machine-written
    one-key objects); aggregation is the usual per-block partial +
    single small groupby. Columns: ``(event_type, n, sum_k, max_k)``."""
    import json as _json
    import re as _re

    ds = _read(sf_dir, "events", ["event_type", "props"])
    pat = _re.compile(r'"k"\s*:\s*(-?\d+)')

    def extract(t: pa.Table) -> pa.Table:
        ks = []
        for p in t["props"].to_pylist():
            m = pat.search(p or "")
            if m:
                ks.append(int(m.group(1)))
            else:
                try:
                    ks.append(int(_json.loads(p or "{}").get("k", 0)))
                except Exception:
                    ks.append(0)
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pylist(), "k": ks}
        )
        out = df.groupby("event_type", sort=False)["k"].agg(
            n="size", sum_k="sum", max_k="max"
        )
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    from fonduer_ray.stages.util import hash_groupby

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("event_type", sort=False)
            .agg(n=("n", "sum"), sum_k=("sum_k", "sum"), max_k=("max_k", "max"))
            .reset_index()
        )

    return hash_groupby(
        ds.map_batches(extract, batch_format="pyarrow"), ["event_type"], merge
    )


def _cents(col: "pa.ChunkedArray") -> "pa.ChunkedArray":
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def shipping_priority(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q3-style shipping priority: top-10 unshipped orders of
    BUILDING-segment customers by outstanding revenue.

    Plan (all three joins size-guarded through ``attach_lookup``): orders
    are date-filtered then semi-joined to BUILDING customers by attaching
    (and dropping) the segment; lineitem is shipdate-filtered and
    partially aggregated to per-order revenue in exact 1e-4-dollar
    integers BEFORE the join, so the join input is one row per qualifying
    order, not one per lineitem; order date/priority attach in one guarded
    lookup carrying two value columns. The final sort runs over the
    already-aggregated (small) order set. Columns: ``(l_orderkey, revenue,
    o_orderdate, o_orderpriority)``."""
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    lineitem = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )
    cutoff = pa.scalar(np.datetime64("1995-03-15", "us"))

    def building(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))

    def early(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["o_orderdate"], cutoff))

    orders_b = attach_lookup(
        orders.map_batches(early, batch_format="pyarrow"),
        customer.map_batches(building, batch_format="pyarrow"),
        "o_custkey",
        "c_custkey",
        "c_mktsegment",
        broadcast_limit,
    ).drop_columns(["c_mktsegment", "o_custkey"])

    def rev_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t["l_shipdate"], cutoff))
        rev = pc.multiply(
            _cents(f["l_extendedprice"]), pc.subtract(100, _cents(f["l_discount"]))
        )
        df = pd.DataFrame(
            {"l_orderkey": f["l_orderkey"].to_pandas(), "rev_c4": rev.to_pandas()}
        )
        out = df.groupby("l_orderkey", sort=False)["rev_c4"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    from fonduer_ray.stages.util import hash_groupby

    per_order = hash_groupby(
        lineitem.map_batches(rev_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        lambda df: df.groupby("l_orderkey", sort=False)["rev_c4"].sum().reset_index(),
        join_safe=True,  # feeds attach_lookup's Dataset.join path
    )
    joined = attach_lookup(
        per_order,
        orders_b,
        "l_orderkey",
        "o_orderkey",
        ["o_orderdate", "o_orderpriority"],
        broadcast_limit,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue": pc.divide(pc.cast(t["rev_c4"], pa.float64()), 10000.0),
                "o_orderdate": t["o_orderdate"],
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    return (
        joined.map_batches(finish, batch_format="pyarrow")
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(10)
    )


def nation_revenue(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q5-style local-supplier volume: per-nation 1995 revenue where
    the ordering customer and the supplying supplier share a nation.

    Five tables, zero unguarded shuffles: the 1995 orders acquire the
    customer nation through one guarded lookup; lineitem rows attach that
    nation by order key (simultaneously dropping non-1995 lines), attach
    the supplier nation by supp key, keep only matching-nation rows, and
    partially aggregate revenue per nation key before the tiny nation-name
    lookup. Revenue is exact integer 1e-4 dollars until the final divide.
    Columns: ``(n_name, revenue)``."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    lineitem = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def in_1995(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"]
        mask = pc.and_(
            pc.greater_equal(ts, pa.scalar(np.datetime64("1995-01-01", "us"))),
            pc.less(ts, pa.scalar(np.datetime64("1996-01-01", "us"))),
        )
        return t.filter(mask).select(["o_orderkey", "o_custkey"])

    orders_95 = attach_lookup(
        orders.map_batches(in_1995, batch_format="pyarrow"),
        customer,
        "o_custkey",
        "c_custkey",
        "c_nationkey",
        broadcast_limit,
    ).select_columns(["o_orderkey", "c_nationkey"])

    lines = attach_lookup(
        lineitem, orders_95, "l_orderkey", "o_orderkey", "c_nationkey", broadcast_limit
    )
    lines = attach_lookup(
        lines, supplier, "l_suppkey", "s_suppkey", "s_nationkey", broadcast_limit
    )

    def local_rev(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.equal(
                pc.cast(t["c_nationkey"], pa.int64()),
                pc.cast(t["s_nationkey"], pa.int64()),
            )
        )
        rev = pc.multiply(
            _cents(f["l_extendedprice"]), pc.subtract(100, _cents(f["l_discount"]))
        )
        df = pd.DataFrame(
            {
                "n_nationkey": pc.cast(f["c_nationkey"], pa.int64()).to_pandas(),
                "rev_c4": rev.to_pandas(),
            }
        )
        out = df.groupby("n_nationkey", sort=False)["rev_c4"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    from fonduer_ray.stages.util import hash_groupby

    per_nation = hash_groupby(
        lines.map_batches(local_rev, batch_format="pyarrow"),
        ["n_nationkey"],
        lambda df: df.groupby("n_nationkey", sort=False)["rev_c4"].sum().reset_index(),
        join_safe=True,  # feeds attach_lookup's Dataset.join path
    )
    named = attach_lookup(
        per_nation, nation, "n_nationkey", "n_nationkey", "n_name", broadcast_limit
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": t["n_name"],
                "revenue": pc.divide(pc.cast(t["rev_c4"], pa.float64()), 10000.0),
            }
        )

    return named.map_batches(finish, batch_format="pyarrow")


def orders_cube(sf_dir: str) -> "ray.data.Dataset":
    """``GROUP BY CUBE(o_orderpriority, o_orderstatus)`` counts and exact
    money sums with 'ALL' sentinels (no NULL keys — stable hashing). Like
    ``orders_rollup`` but expands all four cube levels; the raw table is
    scanned once and the expansion runs over the already-aggregated leaf
    set (|priorities| x |statuses| rows). Columns: ``(o_orderpriority,
    o_orderstatus, n_orders, sum_price)``."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
    from fonduer_ray.stages.util import hash_groupby

    def leaf_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_pandas(),
                "o_orderstatus": t["o_orderstatus"].to_pandas(),
                "price_cents": _cents(t["o_totalprice"]).to_pandas(),
            }
        )
        out = (
            df.groupby(["o_orderpriority", "o_orderstatus"], sort=False)["price_cents"]
            .agg(n_orders="size", price_cents="sum")
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["o_orderpriority", "o_orderstatus"], sort=False)
            .agg(n_orders=("n_orders", "sum"), price_cents=("price_cents", "sum"))
            .reset_index()
        )

    leaves = hash_groupby(
        ds.map_batches(leaf_partial, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"],
        merge,
    )

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        lvl_p = df.assign(o_orderstatus="ALL")
        lvl_s = df.assign(o_orderpriority="ALL")
        lvl_0 = df.assign(o_orderpriority="ALL", o_orderstatus="ALL")
        return pa.Table.from_pandas(
            pd.concat([df, lvl_p, lvl_s, lvl_0], ignore_index=True),
            preserve_index=False,
        )

    cube = hash_groupby(
        leaves.map_batches(expand, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"],
        merge,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderstatus": t["o_orderstatus"],
                "n_orders": t["n_orders"],
                "sum_price": pc.divide(pc.cast(t["price_cents"], pa.float64()), 100.0),
            }
        )

    return cube.map_batches(finish, batch_format="pyarrow")


def nation_balance_full_join(sf_dir: str) -> "ray.data.Dataset":
    """FULL OUTER join through the native hash-partition ``Dataset.join``:
    AUTOMOBILE-segment customer counts per nation vs low-key supplier
    counts per nation — each side deliberately filtered so both produce
    unmatched keys, exercising null-fill on both sides. Missing counts
    coalesce to 0 after the join (the key column is taken from whichever
    side is non-null). Columns: ``(nationkey, n_customers, n_suppliers)``."""
    customer = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    supplier = _read(sf_dir, "supplier", ["s_nationkey"])

    def cust_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["c_mktsegment"], "AUTOMOBILE"))
        df = pd.DataFrame({"nationkey": pc.cast(f["c_nationkey"], pa.int64()).to_pandas()})
        out = df.groupby("nationkey", sort=False).size().rename("n_customers").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def supp_partial(t: pa.Table) -> pa.Table:
        keys = pc.cast(t["s_nationkey"], pa.int64())
        f = keys.filter(pc.less(keys, 12))
        df = pd.DataFrame({"supp_nationkey": f.to_pandas()})
        out = (
            df.groupby("supp_nationkey", sort=False).size().rename("n_suppliers").reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from fonduer_ray.stages.util import hash_groupby, join_partitions

    cust = hash_groupby(
        customer.map_batches(cust_partial, batch_format="pyarrow"),
        ["nationkey"],
        lambda df: df.groupby("nationkey", sort=False)["n_customers"].sum().reset_index(),
        join_safe=True,  # both sides feed the full_outer Dataset.join
    )
    supp = hash_groupby(
        supplier.map_batches(supp_partial, batch_format="pyarrow"),
        ["supp_nationkey"],
        lambda df: df.groupby("supp_nationkey", sort=False)["n_suppliers"].sum().reset_index(),
        join_safe=True,
    )
    joined = cust.join(
        supp,
        "full_outer",
        num_partitions=join_partitions(),
        on=("nationkey",),
        right_on=("supp_nationkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer join coalesces `on`/`right_on` into one key
        # column named after the left key; older versions kept both.
        key = pc.cast(t["nationkey"], pa.int64())
        if "supp_nationkey" in t.schema.names:
            key = pc.coalesce(key, pc.cast(t["supp_nationkey"], pa.int64()))
        return pa.table(
            {
                "nationkey": key,
                "n_customers": pc.coalesce(
                    pc.cast(t["n_customers"], pa.int64()), pa.scalar(0, pa.int64())
                ),
                "n_suppliers": pc.coalesce(
                    pc.cast(t["n_suppliers"], pa.int64()), pa.scalar(0, pa.int64())
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def lineitem_cov_stats(sf_dir: str) -> "ray.data.Dataset":
    """Covariance sufficient statistics per return flag: exact integer
    ``(n, sum_qty, sum_price, sum_qty_price)`` so cov(qty, price) is
    reconstructable bit-exactly downstream — the mergeable-moments pattern
    (never average inside a partial; sums and counts merge, means don't).
    Money in cents until the final divide. Columns: ``(l_returnflag, n,
    sum_qty, sum_price, sum_qty_price)``."""
    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        qty = pc.cast(t["l_quantity"], pa.int64())
        cents = _cents(t["l_extendedprice"])
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "qty": qty,
                "price_cents": cents,
                "qp_cents": pc.multiply(qty, cents),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n"),
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="price_cents"),
            Sum("qp_cents", alias_name="qp_cents"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n": t["n"],
                "sum_qty": t["sum_qty"],
                "sum_price": pc.divide(pc.cast(t["price_cents"], pa.float64()), 100.0),
                "sum_qty_price": pc.divide(pc.cast(t["qp_cents"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def retention_cohorts(
    sf_dir: str, horizon_weeks: int = 3
) -> "ray.data.Dataset":
    """Weekly cohort retention — the standard product-analytics triangle:
    cohort = ISO-epoch week of a user's FIRST event; for each offset
    0..``horizon_weeks``, how many of that cohort's users were active in
    cohort week + offset. Columns: ``(cohort_week, week_offset, n_users)``.

    ONE user-keyed hash shuffle computes first-week + active-week set per
    user and emits its (cohort, offset) pairs; the final groupby runs over
    cohort x offset rows (tiny at any scale). Weeks are integer epoch-week
    indices (epoch seconds // 604800) so the SQL oracle matches exactly."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    from fonduer_ray.stages.util import hash_groupby

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        # via datetime64[s]: unit-safe whether pandas holds ns or us
        wk = pd.Series(
            df["ts"].values.astype("datetime64[s]").astype("int64") // 604_800,
            index=df.index,
        )
        u = pd.DataFrame({"user_id": df["user_id"], "wk": wk})
        first = u.groupby("user_id", sort=False)["wk"].transform("min")
        offs = u["wk"] - first
        keep = (offs >= 0) & (offs <= horizon_weeks)
        out = (
            pd.DataFrame(
                {
                    "cohort_week": first[keep],
                    "week_offset": offs[keep],
                    "user_id": u["user_id"][keep],
                }
            )
            .drop_duplicates()
            .groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .rename("n_users")
            .reset_index()
        )
        return out.astype(
            {"cohort_week": "int64", "week_offset": "int64", "n_users": "int64"}
        )

    per_user_counts = hash_groupby(ds, ["user_id"], per_user)
    return hash_groupby(
        per_user_counts,
        ["cohort_week", "week_offset"],
        lambda df: df.groupby(["cohort_week", "week_offset"], sort=False)[
            "n_users"
        ]
        .sum()
        .reset_index(),
    )


def value_histogram(sf_dir: str, bin_cents: int = 5000) -> "ray.data.Dataset":
    """Fixed-width value histogram over events: bin index =
    ``cents // bin_cents`` ($50 bins by default), with exact counts and
    exact cent sums per bin. Per-block partials bound the exchange to the
    bin count; one tiny groupby merges.
    Columns: ``(bin, n, sum_value)``."""
    ds = _read(sf_dir, "events", ["value"])
    from fonduer_ray.stages.util import hash_groupby

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        c = cents.to_numpy(zero_copy_only=False)
        b = c // bin_cents
        df = pd.DataFrame({"bin": b, "cents": c})
        out = df.groupby("bin", sort=False)["cents"].agg(n="size", cents="sum")
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    agg = hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"],
        lambda df: df.groupby("bin", sort=False)
        .agg(n=("n", "sum"), cents=("cents", "sum"))
        .reset_index(),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bin": t["bin"],
                "n": t["n"],
                "sum_value": pc.divide(pc.cast(t["cents"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """First-order Markov transition counts between consecutive events of
    the same user (the what-happens-after-X product question, and the
    lead()-window complement of ``events_lag_delta``): for each user's
    events ordered by (ts, event_id), count (event_type -> next event_type)
    pairs. Columns: ``(src, dst, n)``.

    ONE user-keyed hash shuffle; inside each partition the ordering,
    pairwise shift and count all run vectorized in pandas; the final
    rollup is enum-squared-sized."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    from fonduer_ray.stages.util import hash_groupby

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        same_user = df["user_id"].shift(-1) == df["user_id"]
        out = pd.DataFrame(
            {"src": df["event_type"], "dst": df["event_type"].shift(-1)}
        )[same_user]
        return (
            out.groupby(["src", "dst"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    per_user = hash_groupby(ds, ["user_id"], transitions)
    return hash_groupby(
        per_user,
        ["src", "dst"],
        lambda df: df.groupby(["src", "dst"], sort=False)["n"].sum().reset_index(),
    )


def events_zorder_keys(sf_dir: str) -> "ray.data.Dataset":
    """(event_id, zcode) — the 16+16-bit Morton (Z-order) layout key over
    (user_id, value-cents) via ``materialize.morton_interleave16``.
    Sorting the table by ``zcode`` before the partitioned-parquet write
    clusters rows close in BOTH dimensions into the same row groups, so
    min-max statistics prune two-dimensional range scans — the layout
    companion to ``bucketed_join_counts``. Stateless vectorized map; the
    oracle replays the identical 32-term unrolled interleave."""
    from fonduer_ray.stages.materialize import morton_interleave16

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def add_code(t: pa.Table) -> pa.Table:
        x = t["user_id"].to_numpy(zero_copy_only=False).astype("int64")
        y = _cents(t["value"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t["event_id"],
                "zcode": pa.array(morton_interleave16(x, y), pa.int64()),
            }
        )

    return ds.map_batches(add_code, batch_format="pyarrow")


def event_type_trigrams(sf_dir: str) -> "ray.data.Dataset":
    """Second-order sequential pattern counts: for each user's events
    ordered by (ts, event_id), count every run of THREE consecutive
    event types — the length-3 behavioral n-gram report that funnels and
    Markov chains summarize away (``(t1, t2, t3, n)``). Same shape as
    :func:`event_transitions`: ONE user-keyed hash shuffle, vectorized
    double shift inside the partition, enum-cubed-sized rollup."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    from fonduer_ray.stages.util import hash_groupby

    def trigrams(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        same1 = df["user_id"].shift(-1) == df["user_id"]
        same2 = df["user_id"].shift(-2) == df["user_id"]
        out = pd.DataFrame(
            {
                "t1": df["event_type"],
                "t2": df["event_type"].shift(-1),
                "t3": df["event_type"].shift(-2),
            }
        )[same1 & same2]
        return (
            out.groupby(["t1", "t2", "t3"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    per_user = hash_groupby(ds, ["user_id"], trigrams)
    return hash_groupby(
        per_user,
        ["t1", "t2", "t3"],
        lambda df: df.groupby(["t1", "t2", "t3"], sort=False)["n"]
        .sum()
        .reset_index(),
    )


def returned_item_report(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """TPC-H Q10-style returned-item report: top-20 customers by revenue
    lost to returns ('R' lineitems of Q4-1995 orders). Same guarded-lookup
    composition as ``shipping_priority``: lineitem pre-aggregates per
    order BEFORE any join, the date-filtered orders attach the customer
    key, and the per-customer rollup attaches the name last (one row per
    customer by then). Columns: ``(c_custkey, c_name, revenue)``."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    lineitem = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    from fonduer_ray.stages.util import hash_groupby

    def q4_1995(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"]
        mask = pc.and_(
            pc.greater_equal(ts, pa.scalar(np.datetime64("1995-10-01", "us"))),
            pc.less(ts, pa.scalar(np.datetime64("1996-01-01", "us"))),
        )
        return t.filter(mask).select(["o_orderkey", "o_custkey"])

    def returned_rev(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.multiply(
            _cents(f["l_extendedprice"]), pc.subtract(100, _cents(f["l_discount"]))
        )
        df = pd.DataFrame(
            {"l_orderkey": f["l_orderkey"].to_pandas(), "rev_c4": rev.to_pandas()}
        )
        out = df.groupby("l_orderkey", sort=False)["rev_c4"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    per_order = hash_groupby(
        lineitem.map_batches(returned_rev, batch_format="pyarrow"),
        ["l_orderkey"],
        lambda df: df.groupby("l_orderkey", sort=False)["rev_c4"].sum().reset_index(),
        join_safe=True,
    )
    with_cust = attach_lookup(
        per_order,
        orders.map_batches(q4_1995, batch_format="pyarrow"),
        "l_orderkey",
        "o_orderkey",
        "o_custkey",
        broadcast_limit,
    )
    per_cust = hash_groupby(
        with_cust.select_columns(["o_custkey", "rev_c4"]),
        ["o_custkey"],
        lambda df: df.groupby("o_custkey", sort=False)["rev_c4"].sum().reset_index(),
        join_safe=True,
    )
    named = attach_lookup(
        per_cust, customer, "o_custkey", "c_custkey", "c_name", broadcast_limit
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "c_name": t["c_name"],
                "revenue": pc.divide(pc.cast(t["rev_c4"], pa.float64()), 10000.0),
            }
        )

    return (
        named.map_batches(finish, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(20)
    )


def impute_values(sf_dir: str, null_every: int = 13) -> "ray.data.Dataset":
    """Group-mean imputation — the missing-value repair step of a feature
    pipeline, demonstrated on a DETERMINISTIC corruption (events whose
    ``event_id % null_every == 0`` treat ``value`` as missing, since the
    synthetic table has no real nulls; the oracle mirrors the same rule).
    Missing values fill with the floor-integer-cents mean of the event
    type's PRESENT values. Columns: ``(event_id, filled_cents, imputed)``.

    Two passes, both bounded: per-type (sum, count) partials merge in one
    tiny groupby and broadcast; the fill is then a pure vectorized map."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    from fonduer_ray.stages.util import get_broadcast, hash_groupby

    def present_partial(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "cents": cents.to_numpy(zero_copy_only=False),
            }
        )[ids % null_every != 0]
        out = df.groupby("event_type", sort=False)["cents"].agg(
            s="sum", n="size"
        )
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    means_rows = hash_groupby(
        ds.map_batches(present_partial, batch_format="pyarrow"),
        ["event_type"],
        lambda df: df.groupby("event_type", sort=False)
        .agg(s=("s", "sum"), n=("n", "sum"))
        .reset_index(),
    ).take_all()
    means = {r["event_type"]: r["s"] // r["n"] for r in means_rows}
    means_ref = ray.put(means)

    def fill(t: pa.Table) -> pa.Table:
        m = get_broadcast(means_ref)
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(t["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        missing = ids % null_every == 0
        # An event_type with NO present rows has no mean; the oracle's
        # inner join to the per-type means drops such rows, so mirror
        # that: fill with m.get(..., 0) then mask out rows whose type
        # is absent from the means table (np.where evaluates both
        # branches, so a bare m[et] would KeyError on them).
        types = t["event_type"].to_pylist()
        has_mean = np.array([et in m for et in types])
        filled = np.where(
            missing,
            np.array([m.get(et, 0) for et in types]),
            cents,
        )
        keep = has_mean
        return pa.table(
            {
                "event_id": pa.array(ids[keep], pa.int64()),
                "filled_cents": pa.array(filled[keep], pa.int64()),
                "imputed": pa.array(
                    missing[keep].astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(fill, batch_format="pyarrow")


def profile_columns(
    ds: "ray.data.Dataset", spec: dict[str, str]
) -> "ray.data.Dataset":
    """Distributed table profiler — the schema/statistics pass a pipeline
    runs before deciding partitioning keys and filters: per column
    ``(column, n_rows, n_nulls, n_distinct, min_i, max_i)``.

    ``spec`` maps column -> kind: ``"int"`` (integer-valued; min/max
    reported directly), ``"cents"`` (float money; min/max as
    round(v*100)), ``"ts"`` (timestamp; min/max as epoch microseconds),
    ``"str"`` (min/max NULL — no cross-locale collation guarantees;
    distinct still exact via md5). All arithmetic integer-exact.

    Scale: ONE pass emits per-block partial rows of two kinds — a
    bounded stats row per (block, column) carrying (n, nulls, min, max),
    and per-(column, value-key) distinct markers pre-deduped inside the
    block — then one hash shuffle keyed by (column, value-key) merges
    distincts and a tiny column-keyed rollup finishes. Value keys are
    int64 (value itself or md5-low-64 for strings), so the shuffle never
    carries raw strings."""
    from fonduer_ray.functions.dedup import _md5_64
    from fonduer_ray.stages.util import hash_groupby

    cols = list(spec)
    src = ds.select_columns(cols)

    def partial(t: pa.Table) -> pa.Table:
        out_col, out_key, out_n, out_null, out_min, out_max = (
            [], [], [], [], [], [],
        )
        for c in cols:
            kind = spec[c]
            arr = t[c]
            n = len(arr)
            nulls = arr.null_count
            valid = arr.drop_null()
            if kind == "int":
                vals = valid.to_numpy(zero_copy_only=False).astype(np.int64)
            elif kind == "cents":
                vals = (
                    pc.cast(
                        pc.round(pc.multiply(valid, 100.0)), pa.int64()
                    ).to_numpy(zero_copy_only=False)
                )
            elif kind == "ts":
                vals = pc.cast(valid, pa.int64()).to_numpy(
                    zero_copy_only=False
                )
            else:  # str
                vals = None
            # stats row (pos = -1 marks it; one per column per block)
            out_col.append(c)
            out_key.append(0)
            out_n.append(n)
            out_null.append(nulls)
            if vals is not None and len(vals):
                out_min.append(int(vals.min()))
                out_max.append(int(vals.max()))
            else:
                out_min.append(None)
                out_max.append(None)
            # distinct markers, block-deduped
            if vals is not None:
                keys = np.unique(vals)
            else:
                keys = np.unique(
                    np.fromiter(
                        (
                            _md5_64(s) - (1 << 63)
                            for s in valid.to_pylist()
                        ),
                        dtype=np.int64,
                        count=len(valid),
                    )
                )
            for k in keys:
                out_col.append(c)
                out_key.append(int(k))
                out_n.append(None)
                out_null.append(None)
                out_min.append(None)
                out_max.append(None)
        return pa.table(
            {
                "column": pa.array(out_col, pa.string()),
                "vkey": pa.array(out_key, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "nulls": pa.array(out_null, pa.int64()),
                "mn": pa.array(out_min, pa.int64()),
                "mx": pa.array(out_max, pa.int64()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        stats = df[df["n"].notna()]
        dst = df[df["n"].isna()]
        s = stats.groupby("column", sort=False).agg(
            n_rows=("n", "sum"),
            n_nulls=("nulls", "sum"),
            min_i=("mn", "min"),
            max_i=("mx", "max"),
        )
        d = (
            dst.drop_duplicates(["column", "vkey"])
            .groupby("column", sort=False)
            .size()
            .rename("n_distinct")
        )
        out = s.join(d, how="outer").reset_index()
        return out

    # shuffle keyed on (column, vkey): distinct markers of one value land
    # together; stats rows (vkey=0) ride the same exchange. A second tiny
    # column-keyed pass merges the per-partition partials.
    part1 = hash_groupby(
        src.map_batches(partial, batch_format="pyarrow"),
        ["column", "vkey"],
        merge,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("column", sort=False).agg(
            n_rows=("n_rows", "sum"),
            n_nulls=("n_nulls", "sum"),
            n_distinct=("n_distinct", "sum"),
            min_i=("min_i", "min"),
            max_i=("max_i", "max"),
        )
        g = g.reset_index()
        for c in ("n_rows", "n_nulls", "n_distinct"):
            g[c] = g[c].fillna(0).astype("int64")
        return g

    return hash_groupby(part1, ["column"], finish)


def profile_events(sf_dir: str) -> "ray.data.Dataset":
    """Driver query: profile every events column. Columns: ``(column,
    n_rows, n_nulls, n_distinct, min_i, max_i)`` — min/max NULL for the
    string columns."""
    ds = _read(
        sf_dir,
        "events",
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    return profile_columns(
        ds,
        {
            "event_id": "int",
            "ts": "ts",
            "user_id": "int",
            "event_type": "str",
            "value": "cents",
            "props": "str",
        },
    )


#: foreign-key edges of the star schema: (label, child table, child key,
#: parent table, parent key) — the audit below checks every one
FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


def fk_integrity_audit(
    sf_dir: str, broadcast_limit: int = BROADCAST_ROW_LIMIT
) -> "ray.data.Dataset":
    """Referential-integrity audit over every FK edge of the star schema:
    per edge, the child row count and the count of orphans (child keys
    with no parent row) — the first data-quality report any warehouse
    ingest runs.

    Per edge the parent KEY SET builds from a per-block ``unique`` combine
    (the stream reaching the driver is bounded by blocks x block-distinct,
    and the merged sorted array by the parent size — which the broadcast
    guard already bounds) and broadcasts once (``ray.put``) for a
    vectorized searchsorted NOT-IN count over the child — the anti-join
    count without shuffling the child (guard: a parent beyond
    ``broadcast_limit`` flips to the hash-partition anti-join of
    ``_apply_canonical``, as ``customers_without_orders`` documents).
    Each child table is scanned once PER EDGE it participates in, keeping
    edges independent and resumable. Columns: ``(fk, n_rows, n_orphans)``
    sorted by fk."""
    rows: list[dict] = []
    for label, child, ckey, parent, pkey in FK_EDGES:
        parent_ds = _read(sf_dir, parent, [pkey])

        def block_distinct(t: pa.Table, _k=pkey) -> pa.Table:
            return pa.table({_k: pc.unique(t[_k])})

        chunks = [np.array([], dtype=np.int64)]
        for b in parent_ds.map_batches(
            block_distinct, batch_format="pyarrow"
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            chunks.append(
                b[pkey].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        keys = np.unique(np.concatenate(chunks))  # sorted
        keys_ref = ray.put(keys)

        def count_partial(t: pa.Table, _k=ckey, _ref=keys_ref) -> pa.Table:
            have = get_broadcast(_ref)
            vals = t[_k].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(have):
                idx = np.clip(np.searchsorted(have, vals), 0, len(have) - 1)
                orphans = int((have[idx] != vals).sum())
            else:
                orphans = len(vals)
            return pa.table(
                {
                    "n_rows": pa.array([len(vals)], pa.int64()),
                    "n_orphans": pa.array([orphans], pa.int64()),
                }
            )

        parts = (
            _read(sf_dir, child, [ckey])
            .map_batches(count_partial, batch_format="pyarrow")
            .take_all()
        )  # <= one row per block
        rows.append(
            {
                "fk": label,
                "n_rows": sum(r["n_rows"] for r in parts),
                "n_orphans": sum(r["n_orphans"] for r in parts),
            }
        )
    rows.sort(key=lambda r: r["fk"])
    return ray.data.from_arrow(
        pa.table(
            {
                "fk": pa.array([r["fk"] for r in rows], pa.string()),
                "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
                "n_orphans": pa.array(
                    [r["n_orphans"] for r in rows], pa.int64()
                ),
            }
        )
    )


def session_duration_stats(
    sf_dir: str, gap_minutes: int = 30, pcts: tuple = (50, 90, 99)
) -> "ray.data.Dataset":
    """Composition query: sessionize (the ``user_sessions`` 30-minute-gap
    rule), then EXACT percentiles of session duration — the p50/p90/p99
    session-length report.

    Durations are whole seconds via integer-microsecond floor division
    (event timestamps carry sub-second microseconds; float epoch seconds
    would truncate differently across engines). Sessionization is a
    per-user grouped sort inside one hash partition (never a global
    sort); the duration column then rides the two-pass exact percentile
    walk (:func:`fonduer_ray.functions.sketches.exact_percentiles`, rank
    ``rn = max(1, ceil(pct*n/100))``). Columns: ``(pct, duration_s)``."""
    from fonduer_ray.functions.sketches import exact_percentiles
    from fonduer_ray.stages.util import hash_groupby

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000

    def durations(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("user_id", sort=False):
            us = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
            if len(us) == 0:
                continue
            breaks = np.flatnonzero(np.diff(us) > gap_us) + 1
            for seg in np.split(us, breaks):
                out.append((seg[-1] - seg[0]) // 1_000_000)
        return pd.DataFrame({"duration_s": np.asarray(out, dtype=np.float64)})

    durs = hash_groupby(ds, ["user_id"], durations)
    res = exact_percentiles(durs, val_col="duration_s", pcts=pcts)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"pct": t["pct"], "duration_s": t["value"]})

    return res.map_batches(rename, batch_format="pyarrow")


def value_cume_dist(sf_dir: str) -> "ray.data.Dataset":
    """Cumulative distribution of the event value column at distinct-value
    grain: for every distinct integer-cents value, the row count ``n``
    plus the global ranks ``n_le`` (rows <= value) and ``n_lt`` (rows <
    value) — exactly the numerators of SQL ``cume_dist()`` /
    ``percent_rank()`` for every row carrying that value, kept as exact
    integers so the oracle comparison is bitwise.

    Distribution: ONE hash shuffle collapses rows to distinct values
    (``hash_groupby`` count), then the two-pass distributed scan
    (:func:`fonduer_ray.stages.util.ordered_prefix_sum`) turns the sorted
    value counts into global prefix sums — per-block partials only;
    driver state is O(#blocks), never O(distinct values)."""
    from fonduer_ray.stages.util import hash_groupby, ordered_prefix_sum

    ds = _read(sf_dir, "events", ["value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                              pa.int64())}
        )

    def count_agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cents", sort=False).size().rename("n").reset_index()
        return g.astype({"cents": "int64", "n": "int64"})

    counts = hash_groupby(
        ds.map_batches(to_cents, batch_format="pyarrow"), ["cents"], count_agg
    )
    scanned = ordered_prefix_sum(counts, "cents", ["n"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cents": t["cents"],
                "n": t["n"],
                "n_le": t["n_cum"],
                "n_lt": pc.subtract(t["n_cum"], t["n"]),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


def max_concurrent_sessions(
    sf_dir: str, gap_minutes: int = 30
) -> "ray.data.Dataset":
    """Peak session concurrency: sessionize every user's event stream (the
    ``user_sessions`` 30-minute-gap rule), then find the maximum number of
    sessions simultaneously active (inclusive [start, end] intervals) and
    the earliest microsecond timestamp where that peak holds.

    The interval-stabbing sweep: each session emits (+1 at start_us,
    -1 at end_us + 1) deltas, deltas collapse to one row per timestamp
    (hash shuffle), and the running concurrency is the distributed
    prefix scan over sorted timestamps. The final max reduces per block
    first (one (max, argmin-ts) pair per block reaches the driver).
    Returns one row ``(max_concurrent, at_epoch_us)``."""
    from fonduer_ray.stages.util import hash_groupby, ordered_prefix_sum

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        ts_out, dl_out = [], []
        for _, g in df.groupby("user_id", sort=False):
            us = np.sort(
                g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            )
            if len(us) == 0:
                continue
            breaks = np.flatnonzero(np.diff(us) > gap_us) + 1
            for seg in np.split(us, breaks):
                ts_out.extend((int(seg[0]), int(seg[-1]) + 1))
                dl_out.extend((1, -1))
        return pd.DataFrame(
            {"ts_us": np.asarray(ts_out, dtype=np.int64),
             "dl": np.asarray(dl_out, dtype=np.int64)}
        )

    raw = hash_groupby(ds, ["user_id"], deltas)

    def sum_agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ts_us", sort=False)["dl"].sum().reset_index()
        return g.astype({"ts_us": "int64", "dl": "int64"})

    merged = hash_groupby(raw, ["ts_us"], sum_agg)
    scanned = ordered_prefix_sum(merged, "ts_us", ["dl"])

    def block_max(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"conc": pa.array([], pa.int64()),
                 "ts_us": pa.array([], pa.int64())}
            )
        conc = t["dl_cum"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        i = int(np.argmax(conc))  # rows sorted by ts -> first max wins
        return pa.table(
            {"conc": pa.array([int(conc[i])], pa.int64()),
             "ts_us": pa.array([int(ts[i])], pa.int64())}
        )

    best = (-1, -1)
    for b in scanned.map_batches(
        block_max, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for c, t in zip(b["conc"].to_pylist(), b["ts_us"].to_pylist()):
            if c > best[0] or (c == best[0] and t < best[1]):
                best = (c, t)
    return ray.data.from_arrow(
        pa.table(
            {"max_concurrent": pa.array([best[0]], pa.int64()),
             "at_epoch_us": pa.array([best[1]], pa.int64())}
        )
    )


def part_skyline(sf_dir: str) -> "ray.data.Dataset":
    """Pareto frontier (skyline) of the part table: minimize retail price,
    maximize size. A part survives iff no other part has price <= AND
    size >= with at least one strict — the classic block-nested-loop
    skyline made distributed.

    Two-phase exactness: each block reduces to its LOCAL skyline with a
    vectorized sort-scan (a global survivor must survive every subset
    containing it, so the global skyline is a subset of the union of
    block skylines), then the candidate union — bounded by
    blocks x per-block frontier size, tiny next to the input — collapses
    to one block for the identical final scan. Equal (price, size)
    tuples never dominate each other, so duplicates all survive.
    Columns: ``(p_partkey, price_cents, p_size)``."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def local_skyline(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"p_partkey": pa.array([], pa.int64()),
                 "price_cents": pa.array([], pa.int64()),
                 "p_size": pa.array([], pa.int64())}
            )
        key = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = np.round(
            t["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((-size, price))  # price asc, size desc
        p, s, k = price[order], size[order], key[order]
        first = np.ones(len(p), dtype=bool)
        first[1:] = p[1:] != p[:-1]
        # per-price max size = size of the group's first row (sorted desc)
        gmax = np.repeat(s[first], np.diff(np.flatnonzero(
            np.append(first, True))))
        # exclusive running max over strictly-cheaper price groups
        group_maxes = s[first]
        excl = np.empty(len(group_maxes), dtype=np.int64)
        excl[0] = np.iinfo(np.int64).min
        np.maximum.accumulate(group_maxes[:-1], out=excl[1:])
        excl_row = np.repeat(excl, np.diff(np.flatnonzero(
            np.append(first, True))))
        keep = (s == gmax) & (gmax > excl_row)
        return pa.table(
            {"p_partkey": pa.array(k[keep]),
             "price_cents": pa.array(p[keep]),
             "p_size": pa.array(s[keep])}
        )

    candidates = ds.map_batches(local_skyline, batch_format="pyarrow")

    def final_skyline(t: pa.Table) -> pa.Table:
        wrapped = pa.table(
            {"p_partkey": t["p_partkey"],
             "p_size": t["p_size"],
             "p_retailprice": pc.divide(
                 pc.cast(t["price_cents"], pa.float64()), 100.0
             )}
        )
        return local_skyline(wrapped)

    # candidate union is frontier-sized: one block, one final exact scan
    return candidates.repartition(1).map_batches(
        final_skyline, batch_format="pyarrow", batch_size=None
    )


def customers_without_orders_bloom(
    sf_dir: str, m_bits: int = 1 << 20, k_hashes: int = 4
) -> "ray.data.Dataset":
    """Bloom-accelerated exact anti-join: customers with no 1995 order
    (the ``customers_without_orders`` result set, recomputed through a
    different scale shape): the probe side ships a FIXED-SIZE bitmap
    (m_bits/8 bytes, independent of key count) instead of the distinct
    key set, so the broadcast never outgrows a worker heap. Bloom
    negatives are definite non-members (emitted directly); the
    false-positive tail — a small fraction at reasonable m/n — gets an
    exact verification against the distinct key set. At web scale, swap
    the verification's key-set broadcast for the hash-partition join;
    the bloom prune shrinks that join's left side by the true-negative
    rate. Columns: ``(c_custkey, c_name)``."""
    from fonduer_ray.functions.dedup import _md5_64
    from fonduer_ray.stages.util import hash_groupby

    def in_1995(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"]
        mask = pc.and_(
            pc.greater_equal(ts, pa.scalar(np.datetime64("1995-01-01", "us"))),
            pc.less(ts, pa.scalar(np.datetime64("1996-01-01", "us"))),
        )
        return pa.table({"o_custkey": t.filter(mask)["o_custkey"]})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        in_1995, batch_format="pyarrow"
    )

    def block_bits(t: pa.Table) -> pa.Table:
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        for x in set(t["o_custkey"].to_pylist()):
            for r in range(k_hashes):
                pos = _md5_64(f"{r}:{x}") % m_bits
                words[pos >> 6] |= np.uint64(1 << (pos & 63))
        return pa.table({"word": pa.array(words)})

    # bitmap = bitwise-OR of per-block partials: fixed m_bits/64 words per
    # block regardless of row count; driver merge is O(blocks * words)
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    for b in orders.map_batches(
        block_bits, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        w = b["word"].to_numpy(zero_copy_only=False)
        for i in range(0, len(w), m_bits // 64):
            bits |= w[i:i + m_bits // 64]
    bits_ref = ray.put(bits)

    customers = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def probe(t: pa.Table) -> pa.Table:
        bm = get_broadcast(bits_ref)
        maybe = []
        for x in t["c_custkey"].to_pylist():
            hit = True
            for r in range(k_hashes):
                pos = _md5_64(f"{r}:{x}") % m_bits
                if not (int(bm[pos >> 6]) >> (pos & 63)) & 1:
                    hit = False
                    break
            maybe.append(hit)
        return t.append_column("_maybe", pa.array(maybe, pa.bool_()))

    probed = customers.map_batches(probe, batch_format="pyarrow").materialize()
    negatives = probed.filter(expr="_maybe == False").drop_columns(["_maybe"])

    # exact verification of the (small) bloom-positive tail
    distinct = hash_groupby(
        orders.map_batches(
            lambda t: pa.table({"o_custkey": pc.unique(t["o_custkey"])}),
            batch_format="pyarrow",
        ),
        ["o_custkey"],
        lambda df: df.drop_duplicates(["o_custkey"]),
    )
    keys = set()
    for b in distinct.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.update(b["o_custkey"].to_pylist())
    keys_ref = ray.put(keys)

    def verify(t: pa.Table) -> pa.Table:
        have = get_broadcast(keys_ref)
        mask = pa.array(
            [k not in have for k in t["c_custkey"].to_pylist()], pa.bool_()
        )
        return t.filter(mask)

    fp_survivors = (
        probed.filter(expr="_maybe == True")
        .drop_columns(["_maybe"])
        .map_batches(verify, batch_format="pyarrow")
    )
    return negatives.union(fp_survivors)


def frequent_part_pairs(sf_dir: str, min_support: int = 2) -> "ray.data.Dataset":
    """Market-basket frequent pairs: part pairs appearing together in at
    least ``min_support`` orders. The a-priori counting core: baskets
    hash-partition by order key, pairs generate inside each partition
    (bounded by per-basket size squared, never a global cross product),
    and supports reduce through one pair-keyed shuffle.
    Columns: ``(a, b, support)`` with ``a < b``."""
    from fonduer_ray.stages.util import hash_groupby

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def block_distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    items = ds.map_batches(block_distinct, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # one stable sort per partition, then numpy slicing per basket —
        # no per-group pandas machinery (the groupby-objects loop cost
        # ~2.5s on sf0.1's ~150k baskets; this path runs in ~0.3s)
        df = df.drop_duplicates()
        codes, _ = pd.factorize(df["l_orderkey"], sort=False)
        parts = df["l_partkey"].to_numpy()
        order = np.argsort(codes, kind="stable")
        codes_s, parts_s = codes[order], parts[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        ends = np.r_[starts[1:], len(codes_s)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ps = np.unique(parts_s[s:e])
            if len(ps) < 2:
                continue
            ia, ib = np.triu_indices(len(ps), k=1)
            out_a.append(ps[ia])
            out_b.append(ps[ib])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        ).astype({"a": "int64", "b": "int64"})

    pair_rows = hash_groupby(items, ["l_orderkey"], pairs)

    def support(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], sort=False).size().rename("support")
        g = g[g >= min_support].reset_index()
        return g.astype({"a": "int64", "b": "int64", "support": "int64"})

    return hash_groupby(pair_rows, ["a", "b"], support)


def nation_ols_slope(sf_dir: str) -> "ray.data.Dataset":
    """Per-nation OLS sufficient statistics for price-on-quantity
    regression, kept as EXACT integers: ``slope = slope_num / slope_den``
    with ``slope_num = n*sum(xy) - sum(x)*sum(y)`` and ``slope_den =
    n*sum(xx) - sum(x)^2`` (x = quantity, y = price cents). Same
    mergeable-moments discipline as :func:`lineitem_cov_stats` — only
    sums and counts cross the shuffle; the division happens wherever the
    consumer wants its precision. One guarded supplier->nation lookup
    plus one 25-group aggregate. Columns: ``(n_name, n_pts, slope_num,
    slope_den)``."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_quantity", "l_extendedprice"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])

    with_nat = attach_lookup(li, supp, "l_suppkey", "s_suppkey", "s_nationkey")
    with_name = attach_lookup(
        with_nat, nat, "s_nationkey", "n_nationkey", "n_name"
    )

    def prep(t: pa.Table) -> pa.Table:
        x = pc.cast(t["l_quantity"], pa.int64())
        y = _cents(t["l_extendedprice"])
        return pa.table(
            {
                "n_name": t["n_name"],
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "xx": pc.multiply(x, x),
            }
        )

    agg = (
        with_name.map_batches(prep, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Count(alias_name="n_pts"),
            Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"),
            Sum("xy", alias_name="sxy"),
            Sum("xx", alias_name="sxx"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_pts"], pa.int64())
        sx, sy = t["sx"], t["sy"]
        return pa.table(
            {
                "n_name": t["n_name"],
                "n_pts": n,
                "slope_num": pc.subtract(
                    pc.multiply(n, t["sxy"]), pc.multiply(sx, sy)
                ),
                "slope_den": pc.subtract(
                    pc.multiply(n, t["sxx"]), pc.multiply(sx, sx)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def orders_pushdown_scan(sf_dir: str, price_floor: float = 400000.0) -> "ray.data.Dataset":
    """Predicate pushdown at the READ: the ``o_totalprice`` filter is handed
    to the parquet fragment scanner (``read_parquet(filter=...)``), so row
    groups whose min/max statistics exclude the floor never leave storage —
    at 100 TB this prunes I/O, not just compute, which a post-read
    ``map_batches`` filter (e.g. :func:`revenue_filter`) cannot do. Columns
    are pruned in the same call. Result: per-priority order counts and the
    exact-cents price sum over the surviving rows, so the oracle check
    verifies the pushdown scan is row-identical to a full-scan ``WHERE``."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
        filter=(pc.field("o_totalprice") > price_floor),
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "price_c": cents,
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n_orders": t["n_orders"],
                "sum_price": pc.divide(pc.cast(t["price_c"], pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def latest_event_per_user_type(sf_dir: str) -> "ray.data.Dataset":
    """Keep-latest compaction: one surviving row per ``(user_id,
    event_type)`` — the newest event by ``ts`` (tie-break: max
    ``event_id``). The read-side half of a CDC/upsert log: at 100 TB the
    change log hash-partitions on the key and each partition picks its
    winners vectorized, so the exchange moves each key's rows exactly
    once and no driver-side state exists. Columns: ``(user_id,
    event_type, event_id, ts, value)``."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def pick_latest(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(
            ["user_id", "event_type", "ts", "event_id"],
            ascending=[True, True, False, False],
        )
        out = s.groupby(["user_id", "event_type"], sort=False).head(1)
        return out[["user_id", "event_type", "event_id", "ts", "value"]].reset_index(
            drop=True
        )

    return hash_groupby(ds, ["user_id", "event_type"], pick_latest)


def snapshot_diff(
    old_ds: "ray.data.Dataset",
    new_ds: "ray.data.Dataset",
    key: str = "k",
    payload: str = "p",
) -> "ray.data.Dataset":
    """Snapshot (table) diff: compare two keyed snapshots of a table and
    report, per status in ``added / removed / changed / unchanged``, the
    row count and the exact sum of keys — the summary a CDC pipeline or
    an anti-entropy repair job reads before shipping a delta. ``added`` =
    key only in ``new``, ``removed`` = only in ``old``, ``changed`` =
    both sides but payload differs. The write side of the CDC pair whose
    read side is :func:`latest_event_per_user_type`; analog of the
    reference's incremental-parse delta detection
    (``/root/reference/src/fonduer/parser/parser.py`` clear=False path),
    generalized to any keyed table.

    Scale shape: both snapshots are tagged and union'd, then ONE key-hash
    exchange co-locates each key's (at most two) rows; the per-partition
    outer merge and status classification run vectorized in pandas, and
    each partition collapses to <=4 summary rows before the final
    status-keyed merge. No driver-side state, no broadcast: the exchange
    moves each snapshot exactly once regardless of overlap.
    Columns: ``(status, n, key_sum)``, ordered by status."""
    from fonduer_ray.stages.util import hash_groupby

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "k": t[key],
                    "p": t[payload],
                    "side": pa.array(
                        np.full(t.num_rows, side, np.int8), pa.int8()
                    ),
                }
            )

        return fn

    both = old_ds.map_batches(tag(0), batch_format="pyarrow").union(
        new_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def diff_part(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        m = a.merge(b, on="k", how="outer", suffixes=("_a", "_b"), indicator=True)
        status = np.where(
            m["_merge"] == "left_only",
            "removed",
            np.where(
                m["_merge"] == "right_only",
                "added",
                np.where(m["p_a"] == m["p_b"], "unchanged", "changed"),
            ),
        )
        out = (
            pd.DataFrame({"status": status, "k": m["k"]})
            .groupby("status", sort=False)["k"]
            .agg(n="size", key_sum="sum")
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        out["key_sum"] = out["key_sum"].astype("int64")
        return out

    parts = hash_groupby(both, ["k"], diff_part)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("status", sort=False)
            .agg(n=("n", "sum"), key_sum=("key_sum", "sum"))
            .reset_index()
            .sort_values("status", ignore_index=True)
        )

    # bounded post-agg table (<=4 rows per hash partition): single-block
    # finish instead of a second status-keyed exchange
    return parts.repartition(1).map_batches(merge, batch_format="pandas")


def orders_snapshot_diff(sf_dir: str) -> "ray.data.Dataset":
    """Driver instantiation of :func:`snapshot_diff`: two deterministic
    snapshots derived from ``orders`` — snapshot A drops keys divisible
    by 11, snapshot B drops keys divisible by 13 and rewrites the
    priority payload (suffix ``*``) for keys divisible by 17 — so all
    four statuses occur. Payload column: ``o_orderpriority``."""
    base = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def snap_a(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        return t.filter(pa.array(k % 11 != 0))

    def snap_b(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        t = t.filter(pa.array(k % 13 != 0))
        mut = pa.array(t["o_orderkey"].to_numpy() % 17 == 0)
        p = pc.if_else(
            mut,
            pc.binary_join_element_wise(t["o_orderpriority"], "*", ""),
            t["o_orderpriority"],
        )
        return pa.table({"o_orderkey": t["o_orderkey"], "o_orderpriority": p})

    return snapshot_diff(
        base.map_batches(snap_a, batch_format="pyarrow"),
        base.map_batches(snap_b, batch_format="pyarrow"),
        key="o_orderkey",
        payload="o_orderpriority",
    )


def event_type_share(sf_dir: str) -> "ray.data.Dataset":
    """Percent-of-total (``ratio_to_report``) report per event type:
    exact row count, exact cent sum, and each as integer basis points of
    the corpus total (``x * 10000 // total`` — floor division on
    positives, bit-identical to the SQL oracle; no float ratio whose
    last ulp varies with summation order). The share-of-traffic /
    share-of-revenue breakdown every source-mixing decision reads.

    Scale shape: per-block (type, n, cents) partials bound the exchange
    to the type cardinality; one tiny groupby merges; the totals and
    shares are computed in a single-block finish over the (few-row)
    aggregate — the input never re-flows. Columns: ``(event_type, n,
    cents, n_share_bp, cents_share_bp)``, ordered by type."""
    from fonduer_ray.stages.util import hash_groupby

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_numpy(zero_copy_only=False), "cents": cents}
        )
        out = df.groupby("event_type", sort=False)["cents"].agg(n="size", cents="sum")
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    agg = hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        lambda df: df.groupby("event_type", sort=False)
        .agg(n=("n", "sum"), cents=("cents", "sum"))
        .reset_index(),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("event_type").reset_index(drop=True)
        df["n_share_bp"] = df["n"] * 10000 // int(df["n"].sum())
        df["cents_share_bp"] = df["cents"] * 10000 // int(df["cents"].sum())
        return df

    # bounded post-agg table (one row per event type): single-block finish
    return agg.repartition(1).map_batches(finish, batch_format="pandas")


def events_window_dedup(sf_dir: str, gap_seconds: int = 60) -> "ray.data.Dataset":
    """Time-gap stream dedup (throttle): within each ``(user_id,
    event_type)`` stream, drop an event whose predecessor (by ``ts``,
    tie-break ``event_id``) is at most ``gap_seconds`` older — the
    standard burst-collapse / at-least-once-delivery cleanup before
    sessionization.  Predecessor means the previous RAW event (the SQL
    ``lag`` window semantics), not the last kept one, so the operator is
    a pure per-key vectorized scan with no running state.

    Scale shape: ONE key-hash exchange co-locates each stream
    (``hash_groupby``), then the shift/compare runs vectorized inside
    each partition; no driver-side state. Columns ``(event_id, user_id,
    event_type, ts)``, ordered by event_id."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        prev = s.groupby(["user_id", "event_type"], sort=False)["ts"].shift(1)
        keep = prev.isna() | ((s["ts"] - prev) > pd.Timedelta(seconds=gap_seconds))
        return s.loc[keep, ["event_id", "user_id", "event_type", "ts"]].reset_index(
            drop=True
        )

    return hash_groupby(ds, ["user_id", "event_type"], dedup).sort("event_id")
