"""Small shared helpers for stage construction."""

from __future__ import annotations

import ray

#: per-worker-process instance cache for task-based stages (see
#: ``cached_stage_fn``); at most a handful of live configs, so unbounded
_FN_CACHE: dict = {}

#: per-worker-process deserialized-broadcast cache (see ``get_broadcast``)
_BCAST_MEMO: dict[str, object] = {}


def get_broadcast(ref):
    """Memoized ``ray.get`` for ``ray.put`` broadcast objects inside
    ``map_batches`` functions: plasma shares the serialized bytes
    zero-copy, but ``ray.get`` rebuilds the PYTHON object (e.g. a
    multi-million-entry dict) on every call — once per batch adds up.
    Each worker process rebuilds it once and reuses it."""
    key = ref.hex()
    obj = _BCAST_MEMO.get(key)
    if obj is None:
        if len(_BCAST_MEMO) > 8:  # a job broadcasts a handful of objects
            _BCAST_MEMO.clear()
        obj = _BCAST_MEMO[key] = ray.get(ref)
    return obj


def cached_stage_fn(cls, kwargs: dict):
    """Wrap a callable-class stage as a plain ``map_batches`` function with
    a per-worker cached instance.

    Stage state that builds in microseconds-to-milliseconds (compiled
    regexes, matcher objects, spec lists) does NOT justify an actor pool:
    pools ramp from cold actor processes that re-pay the import cost, and
    a fixed pool reserves CPUs other stages could use. Plain tasks reuse
    warm worker processes; the instance is constructed once per worker per
    config (keyed by the pickled constructor kwargs). Reserve actor pools
    for genuinely heavy state (models, big dictionaries)."""
    from ray import cloudpickle  # plain pickle cannot key lambda/closure state

    key = (cls.__module__, cls.__qualname__, cloudpickle.dumps(kwargs))

    def stage_fn(batch):
        inst = _FN_CACHE.get(key)
        if inst is None:
            inst = cls(**kwargs)
            _FN_CACHE[key] = inst
        return inst(batch)

    stage_fn.__name__ = cls.__name__
    return stage_fn


def map_stage(
    ds,
    cls,
    kwargs: dict,
    batch_size: int,
    concurrency: int | tuple[int, int] | None = None,
):
    """``map_batches`` a callable-class stage: task-based with a per-worker
    cached instance by default (cheap state), an actor pool only when the
    caller explicitly passes ``concurrency`` (heavy state)."""
    if concurrency is not None:
        return ds.map_batches(
            cls,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(
        cached_stage_fn(cls, kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def hash_groupby(
    ds,
    keys: list[str],
    agg: "callable",
    n_partitions: int | None = None,
    join_safe: bool = False,
):
    """High-cardinality groupby: hash-partition rows on a SMALL derived key,
    then run a vectorized pandas groupby inside each partition.

    Ray's native sort-based ``groupby().aggregate()`` iterates result groups
    in Python (~0.1-0.2ms per group), which dominates wall time when the
    number of groups approaches the number of rows (measured: 10s for a
    65k-group count on 80k rows vs 0.4s this way). The shuffle key here has
    only ``n_partitions`` distinct values, and the real grouping runs in C.

    ``agg``: pandas DataFrame (one hash partition, ``_part`` column already
    dropped) -> aggregated DataFrame; typically
    ``lambda df: df.groupby(keys, sort=False).agg(...).reset_index()``.
    Rows of one key always land in one partition, so per-partition
    aggregation is exact.

    ``join_safe``: when the result feeds a ``Dataset.join``, pass True.
    Ray's sort-based ``map_groups`` emits schema-less ZERO-COLUMN empty
    blocks for hash partitions with no rows; the join aggregator's
    per-partition table build then fails ("no match or multiple matches
    for key field ... on left side") whenever a join partition receives
    only such shards. Map-based operators (map_batches / select_columns /
    filter) SKIP empty blocks entirely and pass them through, so the only
    reliable sanitizer is an all-to-all: ``repartition`` rebuilds blocks by
    slicing typed ones (the same fix train_stage's weight table and
    prepare_training_data use). Costs one extra exchange of the (already
    aggregated, small) output; off by default for shuffle-free consumers."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    if n_partitions is None:
        cpus = 4
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 4))
        n_partitions = max(2 * cpus, 8)

    def add_part(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        return batch.append_column(
            "_part", pa.array((h % n_partitions).astype(np.int32))
        )

    def run_agg(g: pd.DataFrame):
        out_df = agg(g.drop(columns=["_part"]))
        # Emit ARROW blocks: row-wise consumers (take_all / iter_rows) cost
        # ~1 ms/row on pandas blocks vs ~2 us/row on arrow (measured 15s vs
        # 0.03s at 17k rows), and downstream pyarrow-format map_batches
        # skip a per-batch pandas->arrow conversion. Empty frames stay
        # pandas: from_pandas would type object columns as null and the
        # null-typed schema poisons downstream unions/joins.
        if len(out_df):
            return pa.Table.from_pandas(out_df, preserve_index=False)
        return out_df

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(run_agg, batch_format="pandas")
    )
    if not join_safe:
        return out
    return out.repartition(join_partitions())


def default_concurrency(cap: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool size ``(1, num_cpus)``.

    Letting the pool scale between 1 and the CPU count means concurrent
    stages share the node without one pool starving the others; the
    streaming executor adds actors only while a stage is the bottleneck."""
    cpus = 4
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
    if cap is not None:
        cpus = min(cpus, cap)
    return (1, max(cpus, 1))


def join_partitions(cap: int | None = None) -> int:
    """Partition count for ``Dataset.join``'s hash-shuffle aggregators.

    Unlike map tasks, each join partition is a long-lived aggregator ACTOR
    whose cold-start (~0.5s) is paid before any row flows; at 32 CPUs,
    ``2*cpus`` partitions cost ~25s of ramp-up before a join of any size
    (measured in train_stage: 25s -> 2.4s at 8 partitions on the same
    input). ``cpus // 4`` keeps the shuffle wide enough to scale on real
    clusters (pass an explicit count for 100 TB runs) while amortizing
    actor spin-up on a single node."""
    cpus = 4
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
    n = max(cpus // 4, 4)
    return min(n, cap) if cap else n


def read_blocks_for(
    path: str, rows_per_block: int = 32_768, cap_factor: int = 4
) -> int:
    """Block count for a parquet read sized from its metadata row count:
    ``ceil(rows / rows_per_block)`` clamped to [1, cap_factor * cpus].
    Keeps tiny dimension tables in one block (Ray's default splits every
    file into ~2x-CPU blocks, making downstream ops pay one task dispatch
    per block) while big tables still fan out to the full CPU count."""
    import pyarrow.parquet as pq

    try:
        rows = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return 0  # fall back to Ray's default sizing
    cpus = 4
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, min((rows + rows_per_block - 1) // rows_per_block,
                      cap_factor * cpus))


def ordered_prefix_sum(ds, order_col: str, val_cols: list[str]):
    """Global inclusive prefix sums of ``val_cols`` in ascending
    ``order_col`` order — the classic two-pass distributed scan.

    PRECONDITION: ``order_col`` values are UNIQUE (aggregate to one row
    per key first); duplicate keys could split across block boundaries
    where the per-block offset lookup (keyed by each block's first key)
    would collide.

    One range shuffle (``Dataset.sort``), then pass 1 reduces each block
    to one partial-sum row (driver state = O(#blocks), never O(rows)),
    the driver turns those into exclusive block offsets, and pass 2 adds
    a vectorized local cumsum + the block's offset. Appends
    ``{col}_cum`` int64 columns; input columns pass through."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    cum_names = [f"{c}_cum" for c in val_cols]
    base = ds.sort(order_col).materialize()

    def block_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"_key": pa.array([], pa.int64()),
                 **{c: pa.array([], pa.int64()) for c in val_cols}}
            )
        return pa.table(
            {
                "_key": pa.array([t[order_col][0].as_py()], pa.int64()),
                **{
                    c: pa.array(
                        [int(pc.sum(t[c]).as_py() or 0)], pa.int64()
                    )
                    for c in val_cols
                },
            }
        )

    partials = []
    for b in base.map_batches(
        block_partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        partials.extend(
            zip(b["_key"].to_pylist(),
                *(b[c].to_pylist() for c in val_cols))
        )
    partials.sort()
    offsets: dict[int, tuple] = {}
    acc = [0] * len(val_cols)
    for row in partials:
        offsets[row[0]] = tuple(acc)
        for i, v in enumerate(row[1:]):
            acc[i] += v
    off_ref = ray.put(offsets)

    def add_cum(t: pa.Table) -> pa.Table:
        import pyarrow as pa  # noqa: re-import for worker scope

        out = t
        if len(t) == 0:
            for name in cum_names:
                out = out.append_column(name, pa.array([], pa.int64()))
            return out
        off = get_broadcast(off_ref)[t[order_col][0].as_py()]
        for c, name, o in zip(val_cols, cum_names, off):
            vals = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            out = out.append_column(
                name, pa.array(np.cumsum(vals) + o, pa.int64())
            )
        return out

    return base.map_batches(add_cum, batch_format="pyarrow", batch_size=None)
