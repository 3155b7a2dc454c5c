"""Distributed mergeable sketches over a documents table: HyperLogLog
(distinct count), count-min (frequency upper bounds), and KMV / bottom-k
(distinct count + set similarity).

These are the sketch primitives a 100 TB pipeline uses where exact
distinct/frequency aggregation would shuffle the full key space. The
distributed shape is identical for all three: a vectorized per-block
partial sketch inside ``map_batches`` (bounded size, independent of block
row count) merged by ONE tiny ``hash_groupby`` whose key cardinality is
the sketch width (≤ a few thousand groups) — never the data cardinality.

Every sketch is deterministic and DuckDB-reproducible: token hashes are
md5-low-64 (``dedup._md5_64``), so `__ray_entry__.oracle_sql` re-derives
register/counter tables exactly and CORRECTNESS value-checks them.
Estimator helpers (`hll_estimate`, `kmv_estimate`, `cms_query`) are pure
driver-side formulas over the materialized sketch.

No reference analog (fonduer has no sketches); part of the LLM-pipeline
operator suite alongside `functions/dedup.py`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from fonduer_ray.functions.dedup import _md5_64
from fonduer_ray.stages.util import get_broadcast, hash_groupby

#: token-hash memo shared per worker process (corpus vocab repeats heavily)
_TOK_MEMO: dict[str, int] = {}


def _shingles(text: str, k: int = 3) -> list:
    """Space-joined k-word shingles (the corpus vocabulary is tiny, so the
    sketched item space is k-gram shingles — same choice as the minhash
    pipeline; k=3 gives a ~10^4-10^5 item space on the test corpus)."""
    toks = (text or "").split()
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _token_hashes(toks) -> np.ndarray:
    out = np.empty(len(toks), dtype=np.uint64)
    memo = _TOK_MEMO
    for i, t in enumerate(toks):
        h = memo.get(t)
        if h is None:
            h = _md5_64(t)
            if len(memo) < 2_000_000:
                memo[t] = h
        out[i] = h
    return out


# ---------------------------------------------------------------- HyperLogLog


def hll_registers(ds: "ray.data.Dataset", p: int = 12) -> "ray.data.Dataset":
    """HLL register table over the corpus 3-shingle vocabulary: for each of the
    m=2**p buckets (top p hash bits), the max leading-zero rank rho of the
    remaining 64-p bits (+1). Returns (bucket:int64, max_rho:int64), only
    buckets that were hit.

    Per block: dedup tokens, vectorized bucket/rho via exact float64 frexp
    (values < 2**53, so the exponent is the exact bit length), partial
    per-block register max — output is ≤ m rows per block no matter how
    many tokens the block held. Merge: one groupby over ≤ m keys.
    """
    m = 1 << p
    wbits = 64 - p
    mask = np.uint64((1 << wbits) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        items = set()
        for text in batch["text"].to_pylist():
            items.update(_shingles(text))
        if not items:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 "max_rho": pa.array([], pa.int64())}
            )
        h = _token_hashes(list(items))
        bucket = (h >> np.uint64(wbits)).astype(np.int64)
        w = h & mask
        # exact bit length of w (< 2**53) via the float64 exponent
        _, exp = np.frexp(w.astype(np.float64))
        rho = (wbits + 1 - exp).astype(np.int64)  # w=0 -> exp=0 -> wbits+1
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        hit = np.nonzero(regs)[0]
        return pa.table(
            {"bucket": pa.array(hit, pa.int64()),
             "max_rho": pa.array(regs[hit], pa.int64())}
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("bucket", sort=False)["max_rho"].max().reset_index()
        )

    return hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["bucket"], merge
    )


def hll_estimate(registers, p: int = 12) -> float:
    """Standard HLL estimate (Flajolet et al. 2007) from a materialized
    register table (list of {bucket, max_rho} rows); small-range linear
    counting correction included."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    for r in registers:
        regs[int(r["bucket"])] = int(r["max_rho"])
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# ------------------------------------------------------------------ count-min


def cms_counters(
    ds: "ray.data.Dataset", depth: int = 4, width: int = 1024
) -> "ray.data.Dataset":
    """Count-min sketch of corpus 3-shingle OCCURRENCES: depth x width counter
    matrix as (row:int64, col:int64, count:int64), zero cells omitted.
    Row r hashes item t with md5-low-64 of ``"{r}:{t}"``.

    Per block: token multiplicity via one pandas value_counts, then depth
    bincounts — partial output ≤ depth*width rows per block. Merge: one
    groupby-sum over ≤ depth*width keys. Counter updates commute, so
    block-level partials merge exactly.
    """

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            for t in _shingles(text):
                counts[t] = counts.get(t, 0) + 1
        if not counts:
            return pa.table(
                {"row": pa.array([], pa.int64()),
                 "col": pa.array([], pa.int64()),
                 "count": pa.array([], pa.int64())}
            )
        toks = list(counts)
        mult = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
        rows, cols, vals = [], [], []
        for r in range(depth):
            h = _token_hashes([f"{r}:{t}" for t in toks])
            col = (h % np.uint64(width)).astype(np.int64)
            acc = np.bincount(col, weights=mult, minlength=width).astype(np.int64)
            hit = np.nonzero(acc)[0]
            rows.append(np.full(len(hit), r, dtype=np.int64))
            cols.append(hit)
            vals.append(acc[hit])
        return pa.table(
            {"row": pa.array(np.concatenate(rows)),
             "col": pa.array(np.concatenate(cols)),
             "count": pa.array(np.concatenate(vals))}
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["row", "col"], sort=False)["count"].sum().reset_index()
        )

    return hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["row", "col"], merge
    )


def cms_query(counters, token: str, depth: int = 4, width: int = 1024) -> int:
    """Point-query the materialized sketch: min over rows — an upper bound
    on the token's true occurrence count, exact for heavy tokens when the
    sketch is sparse."""
    cells = {(int(r["row"]), int(r["col"])): int(r["count"]) for r in counters}
    return min(
        cells.get((r, _md5_64(f"{r}:{token}") % width), 0) for r in range(depth)
    )


# ---------------------------------------------------------------- KMV (bottom-k)


def kmv_sketch(ds: "ray.data.Dataset", k: int = 256) -> "ray.data.Dataset":
    """Bottom-k (KMV) sketch of the corpus 3-shingle vocabulary: the k smallest
    distinct 63-bit shingle hashes (md5-low-64 ``>> 1``, the minhash int64
    convention) as (rank:int64 [1-based], hash:int64). Dedup happens AFTER
    the shift on both the engine and oracle side, so block partials merge
    exactly. Per-block bottom-k partial, one single-group merge (output
    size k, constant).
    """

    def partial(batch: pa.Table) -> pa.Table:
        items = set()
        for text in batch["text"].to_pylist():
            items.update(_shingles(text))
        if not items:
            return pa.table({"hash": pa.array([], pa.int64())})
        h = np.unique(_token_hashes(list(items)) >> np.uint64(1))[:k]
        return pa.table({"hash": pa.array(h.astype(np.int64), pa.int64())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(df["hash"].to_numpy())[:k]
        return pd.DataFrame(
            {"rank": np.arange(1, len(h) + 1, dtype=np.int64), "hash": h}
        )

    # single merge group: k values per block is tiny, so one task finishes it
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return hash_groupby(
        parts.map_batches(
            lambda t: t.append_column("_g", pa.array([0] * len(t), pa.int64())),
            batch_format="pyarrow",
        ),
        ["_g"],
        lambda df: merge(df.drop(columns=["_g"])),
        n_partitions=1,
    )


# ------------------------------------------------ per-group bottom-k sample


def sample_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    key_col: str,
    n_per_group: int = 3,
    extra_cols: tuple = (),
) -> "ray.data.Dataset":
    """Deterministic stratified sample: for each group, the ``n_per_group``
    rows whose md5-low-64 of ``key_col`` is smallest — a uniform sample
    within each stratum that is mergeable (per-block bottom-k partials,
    one group-keyed merge) and reproducible (DuckDB: ``row_number() OVER
    (PARTITION BY group ORDER BY hv)``). Returns
    (group_col, rank:int64 [1-based within group], key_col, *extra_cols).

    Scale: partial output is ≤ n_per_group rows per (block, group); the
    merge groupby is keyed on the group column — group count, not row
    count. The classic "N examples per class" training-data op.
    ``key_col`` values must be unique within a group (hash ties would make
    the rank order undefined in both engine and oracle)."""
    cols = [group_col, key_col, *extra_cols]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        hv = np.fromiter(
            (_md5_64(str(i)) for i in df[key_col]),
            dtype=np.uint64,
            count=len(df),
        )
        df["_hv"] = hv
        df = df.sort_values("_hv", kind="stable")
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(n_per_group),
            preserve_index=False,
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("_hv", kind="stable")
        out = df.groupby(group_col, sort=False).head(n_per_group).copy()
        out["rank"] = out.groupby(group_col, sort=False).cumcount() + 1
        out["rank"] = out["rank"].astype("int64")
        return out.drop(columns=["_hv"])[[group_col, "rank", key_col, *extra_cols]]

    return hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), [group_col], merge
    )


# ------------------------------------------------------- sampled quantiles


def sampled_quantiles(
    ds: "ray.data.Dataset",
    key_col: str = "event_id",
    val_col: str = "value",
    k: int = 1024,
    pcts: tuple = (1, 10, 25, 50, 75, 90, 99),
) -> "ray.data.Dataset":
    """Approximate quantiles from a bottom-k-by-hash uniform sample: keep
    the ``k`` rows whose md5-low-64 of ``key_col`` is smallest (a
    deterministic, mergeable, bounded-size uniform sample — the same
    bottom-k trick as :func:`kmv_sketch`), then take discrete quantiles of
    ``val_col`` over the sample. Returns (pct:int64, value:float64).

    Quantile index is computed in INTEGER arithmetic — ``rn =
    max(1, (pct * n + 99) // 100)`` into the cents-quantized sorted sample
    — so the DuckDB oracle reproduces the exact row (float ``q * n`` would
    diverge between decimal and binary arithmetic at integer boundaries).

    Scale: per-block partial bottom-k (output ≤ k rows per block no matter
    the block size), ONE single-group merge of ≤ k·n_blocks rows. Memory
    is bounded by k everywhere; the data never sorts globally."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_pylist()
        hv = np.fromiter(
            (_md5_64(str(i)) for i in ids), dtype=np.uint64, count=len(ids)
        )
        vals = t[val_col].to_numpy(zero_copy_only=False)
        keep = np.argsort(hv, kind="stable")[:k]
        return pa.table(
            {
                "hv": pa.array(hv[keep], pa.uint64()),
                "value": pa.array(vals[keep], pa.float64()),
                "_g": pa.array(np.zeros(len(keep), dtype=np.int64)),
            }
        )

    def merge(df: pd.DataFrame, _pcts=tuple(pcts), _k=k) -> pd.DataFrame:
        d = df.sort_values("hv", kind="stable").head(_k)
        cents = np.sort(np.rint(d["value"].to_numpy() * 100).astype(np.int64))
        n = len(cents)
        out_p, out_v = [], []
        for pct in _pcts:
            rn = max(1, (pct * n + 99) // 100)
            out_p.append(pct)
            out_v.append(cents[rn - 1] / 100.0)
        return pd.DataFrame(
            {"pct": np.array(out_p, dtype=np.int64), "value": out_v}
        )

    return hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["_g"],
        lambda df: merge(df.drop(columns=["_g"])),
        n_partitions=1,
    )


def kmv_estimate(rows, k: int = 256) -> float:
    """Distinct-count estimate (k-1) * 2**63 / h_k over the 63-bit hash
    space from the materialized bottom-k table; returns the exact size when
    fewer than k hashes exist."""
    hashes = sorted(int(r["hash"]) for r in rows)
    if len(hashes) < k:
        return float(len(hashes))
    return (k - 1) * float(1 << 63) / float(hashes[k - 1])


def hll_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    key_col: str,
    p: int = 12,
) -> "ray.data.Dataset":
    """Grouped HLL: one register table PER GROUP (e.g. distinct users per
    event type) — the mergeable approximate COUNT(DISTINCT x) GROUP BY g.
    Returns (group_col, bucket:int64, max_rho:int64), hit buckets only.

    Same shape as :func:`hll_registers` with the group column joined into
    the partial/merge keys: per-block output is ≤ m rows per (block,
    group); the merge groupby is keyed on (group, bucket) — sketch width ×
    group count, never the key cardinality. ``hll_estimate`` applies
    unchanged to one group's rows."""
    wbits = 64 - p
    mask = np.uint64((1 << wbits) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, key_col]).to_pandas()
        df = df.drop_duplicates()
        if not len(df):
            return pa.table(
                {
                    group_col: pa.array([], batch[group_col].type),
                    "bucket": pa.array([], pa.int64()),
                    "max_rho": pa.array([], pa.int64()),
                }
            )
        h = _token_hashes([str(k) for k in df[key_col]])
        bucket = (h >> np.uint64(wbits)).astype(np.int64)
        w = h & mask
        _, exp = np.frexp(w.astype(np.float64))
        rho = (wbits + 1 - exp).astype(np.int64)
        out = (
            pd.DataFrame(
                {group_col: df[group_col].to_numpy(), "bucket": bucket,
                 "max_rho": rho}
            )
            .groupby([group_col, "bucket"], sort=False)["max_rho"]
            .max()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([group_col, "bucket"], sort=False)["max_rho"]
            .max()
            .reset_index()
        )

    return hash_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "bucket"],
        merge,
    )


def exact_percentiles(
    ds: "ray.data.Dataset",
    val_col: str = "value",
    pcts: tuple = (1, 10, 25, 50, 75, 90, 99),
    n_buckets: int = 65536,
) -> "ray.data.Dataset":
    """EXACT distributed percentiles of a numeric column without a global
    sort — the classic two-pass histogram refinement (complements
    :func:`sampled_quantiles`, which trades exactness for one pass).

    Values quantize to integer cents (the engine's money convention, and
    what makes per-value equality exact). Pass 1: per-block bucket-count
    partials over a fixed ``n_buckets`` grid between the column min/max —
    the exchanged state is <= n_buckets rows per block and the merged
    histogram (driver-side) is bounded by n_buckets regardless of data
    size. The driver walks cumulative counts to find each target rank's
    bucket + within-bucket remainder. Pass 2: ONE filtered scan aggregates
    exact per-value counts inside only the target buckets (bounded by
    bucket width in distinct cents, n_buckets times smaller than the value
    range) and the driver resolves the remainder ranks. Rank convention
    ``rn = max(1, ceil(pct*n/100))`` in integer arithmetic, identical to
    ``sampled_quantiles`` and re-derivable in SQL via ``row_number()``.

    Returns ``(pct:int64, value:float64)``."""
    from ray.data.aggregate import Max, Min

    src = ds.select_columns([val_col])

    def to_cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"cents": pc.cast(pc.round(pc.multiply(t[val_col], 100.0)), pa.int64())}
        )

    # materialize: consumed three times (min/max, histogram, refinement).
    # The column is one int64 per row; at extreme scale where even that
    # spills, drop the materialize and pay re-scans instead — the passes
    # are pure maps over the source.
    cents_ds = src.map_batches(to_cents, batch_format="pyarrow").materialize()
    stats = cents_ds.aggregate(Min("cents"), Max("cents"))
    if stats is None or stats.get("min(cents)") is None:
        return ray.data.from_arrow(
            pa.table({"pct": pa.array([], pa.int64()),
                      "value": pa.array([], pa.float64())})
        )
    mn, mx = int(stats["min(cents)"]), int(stats["max(cents)"])
    width = max(1, (mx - mn + n_buckets) // n_buckets)

    def bucket_partial(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        b = (c - mn) // width
        ub, counts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(ub, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    # driver-side merge of the per-block partials: each partial is already
    # <= n_buckets rows, so the stream is bounded by blocks x n_buckets and
    # the merged dict by n_buckets — measured 0.4s vs 20s for a bucket-keyed
    # shuffle of the same rows (the shuffle's fixed task-matrix cost dwarfs
    # this bounded reduction)
    hist: dict[int, int] = {}
    for b in cents_ds.map_batches(
        bucket_partial, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for k, v in zip(b["bucket"].to_pylist(), b["n"].to_pylist()):
            hist[k] = hist.get(k, 0) + v
    hist_rows = [{"bucket": k, "n": v} for k, v in sorted(hist.items())]
    total = sum(hist.values())

    # rank -> (bucket, remainder-within-bucket)
    targets: dict[int, list[tuple[int, int]]] = {}
    for pct in pcts:
        rn = max(1, (pct * total + 99) // 100)
        acc = 0
        for r in hist_rows:
            if acc + r["n"] >= rn:
                targets.setdefault(int(r["bucket"]), []).append((pct, rn - acc))
                break
            acc += r["n"]

    want_buckets = sorted(targets)

    def in_targets(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        b = (c - mn) // width
        mask = np.isin(b, want_buckets)
        c = c[mask]
        uv, counts = np.unique(c, return_counts=True)
        return pa.table(
            {
                "cents": pa.array(uv, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    # bounded: distinct cents inside <= len(pcts) buckets x bucket width
    vals: dict[int, int] = {}
    for b in cents_ds.map_batches(
        in_targets, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for k, v in zip(b["cents"].to_pylist(), b["n"].to_pylist()):
            vals[k] = vals.get(k, 0) + v
    val_rows = [{"cents": k, "n": v} for k, v in sorted(vals.items())]

    out_p, out_v = [], []
    for bucket, wants in targets.items():
        lo, hi = mn + bucket * width, mn + (bucket + 1) * width
        rows = [r for r in val_rows if lo <= r["cents"] < hi]
        for pct, rem in wants:
            acc = 0
            for r in rows:
                if acc + r["n"] >= rem:
                    out_p.append(pct)
                    out_v.append(r["cents"] / 100.0)
                    break
                acc += r["n"]
    order = np.argsort(out_p)
    return ray.data.from_arrow(
        pa.table(
            {
                "pct": pa.array(np.array(out_p, dtype=np.int64)[order]),
                "value": pa.array(np.array(out_v, dtype=np.float64)[order]),
            }
        )
    )


#: guard for the grouped-percentile target broadcast: one row per
#: (group, pct) — beyond this the report is no longer human-sized and the
#: caller should shard by group range
GROUP_TARGET_LIMIT = 1_000_000


def grouped_percentiles(
    ds: "ray.data.Dataset",
    group_col: str,
    val_col: str = "value",
    pcts: tuple = (50, 90, 99),
    n_buckets: int = 65536,
) -> "ray.data.Dataset":
    """EXACT percentiles per group (the per-service latency report:
    p50/p90/p99 of ``val_col`` for every ``group_col``) — the grouped
    generalization of :func:`exact_percentiles`, same integer-cents rank
    convention ``rn = max(1, ceil(pct*n/100))``.

    Fully distributed rank walk: pass 1 aggregates (group, bucket) counts
    (per-block partials, one hash shuffle), then a group-keyed groupby
    walks each group's bucket histogram to its target (bucket, remainder)
    pairs — output one row per (group, pct), which broadcasts under a
    guard (``GROUP_TARGET_LIMIT``). Pass 2 aggregates exact (group, cents)
    counts inside only each group's target buckets and a final group-keyed
    groupby resolves the remainders. Driver state = the (group, pct)
    target table, never value-sized. Returns ``(group_col, pct, value)``."""
    import pandas as pd
    from ray.data.aggregate import Max, Min

    src = ds.select_columns([group_col, val_col])

    def to_cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "g": t[group_col],
                "cents": pc.cast(
                    pc.round(pc.multiply(t[val_col], 100.0)), pa.int64()
                ),
            }
        )

    cents_ds = src.map_batches(to_cents, batch_format="pyarrow").materialize()
    stats = cents_ds.aggregate(Min("cents"), Max("cents"))
    if stats is None or stats.get("min(cents)") is None:
        # derive the empty group column's type from the input schema so
        # the empty result unions/compares cleanly with non-empty runs
        # (a hardcoded string type diverges for int group keys)
        g_field = ds.schema().base_schema.field(group_col)
        return ray.data.from_arrow(
            pa.table({group_col: pa.array([], g_field.type),
                      "pct": pa.array([], pa.int64()),
                      "value": pa.array([], pa.float64())})
        )
    mn, mx = int(stats["min(cents)"]), int(stats["max(cents)"])
    width = max(1, (mx - mn + n_buckets) // n_buckets)

    def bucket_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": t["g"].to_pylist(),
                "bucket": (t["cents"].to_numpy(zero_copy_only=False) - mn)
                // width,
            }
        )
        out = df.groupby(["g", "bucket"], sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    gb_counts = hash_groupby(
        cents_ds.map_batches(bucket_partial, batch_format="pyarrow"),
        ["g", "bucket"],
        lambda df: df.groupby(["g", "bucket"], sort=False)["n"].sum().reset_index(),
    )

    def walk_targets(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, grp in df.groupby("g", sort=False):
            grp = grp.sort_values("bucket")
            total = int(grp["n"].sum())
            buckets = grp["bucket"].tolist()
            counts = grp["n"].tolist()
            for pct in pcts:
                rn = max(1, (pct * total + 99) // 100)
                acc = 0
                for b, c in zip(buckets, counts):
                    if acc + c >= rn:
                        rows.append(
                            {"g": g, "pct": pct, "bucket": int(b), "rem": rn - acc}
                        )
                        break
                    acc += c
        out = pd.DataFrame(rows, columns=["g", "pct", "bucket", "rem"])
        return out.astype({"pct": "int64", "bucket": "int64", "rem": "int64"})

    targets = hash_groupby(gb_counts, ["g"], walk_targets).materialize()
    n_targets = targets.count()
    if n_targets > GROUP_TARGET_LIMIT:
        raise ValueError(
            f"{n_targets} (group, pct) targets exceed GROUP_TARGET_LIMIT; "
            "shard the input by group range and run per shard"
        )
    want: dict = {}
    for b in targets.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for g, pct, bucket, rem in zip(
            b["g"].to_pylist(), b["pct"].to_pylist(),
            b["bucket"].to_pylist(), b["rem"].to_pylist(),
        ):
            want.setdefault(g, {}).setdefault(bucket, []).append((pct, rem))
    want_ref = ray.put(want)

    def value_partial(t: pa.Table) -> pa.Table:
        lkp = get_broadcast(want_ref)
        gs = t["g"].to_pylist()
        cs = t["cents"].to_numpy(zero_copy_only=False)
        keep_g, keep_c = [], []
        for g, c in zip(gs, cs):
            tb = lkp.get(g)
            if tb is not None and int(c - mn) // width in tb:
                keep_g.append(g)
                keep_c.append(int(c))
        df = pd.DataFrame({"g": keep_g, "cents": keep_c})
        out = df.groupby(["g", "cents"], sort=False).size().rename("n").reset_index()
        out = out.astype({"cents": "int64", "n": "int64"})
        return pa.Table.from_pandas(out, preserve_index=False)

    gv_counts = hash_groupby(
        cents_ds.map_batches(value_partial, batch_format="pyarrow"),
        ["g"],
        lambda df: df.groupby(["g", "cents"], sort=False)["n"].sum().reset_index(),
    )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        lkp = get_broadcast(want_ref)
        rows = []
        for g, grp in df.groupby("g", sort=False):
            grp = grp.sort_values("cents")
            by_bucket = lkp.get(g, {})
            for bucket, wants_ in by_bucket.items():
                lo, hi = mn + bucket * width, mn + (bucket + 1) * width
                sub = grp[(grp["cents"] >= lo) & (grp["cents"] < hi)]
                cs = sub["cents"].tolist()
                ns = sub["n"].tolist()
                for pct, rem in wants_:
                    acc = 0
                    for c, n in zip(cs, ns):
                        if acc + n >= rem:
                            rows.append({"g": g, "pct": pct, "value": c / 100.0})
                            break
                        acc += n
        out = pd.DataFrame(rows, columns=["g", "pct", "value"])
        return out.astype({"pct": "int64", "value": "float64"})

    final = hash_groupby(gv_counts, ["g"], resolve)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([group_col, "pct", "value"])

    return final.map_batches(rename, batch_format="pyarrow")


# ------------------------------------------------------------------ Bloom


def bloom_positions(
    ds: "ray.data.Dataset",
    key_col: str = "o_orderkey",
    m_bits: int = 65536,
    k_hashes: int = 4,
) -> "ray.data.Dataset":
    """First-class Bloom filter build over a key column: the SET BIT
    POSITIONS of an (m_bits, k_hashes) filter, as sorted distinct
    ``(position)`` rows — the exchangeable representation of the bitmap (a
    bitmap is the bitwise-OR of its rows' positions, so per-block partial
    position sets merge by distinct-union; the dedup suite's internal
    membership prefilter uses the same construction at 2^27 bits,
    ``dedup._bloom_of_pair_ids``). Hash row ``r`` maps key ``x`` to
    ``md5_low64(f"{r}:{x}") % m_bits`` — DuckDB-reproducible, so the full
    bit table is value-checked. Output bounded by ``m_bits`` rows.

    Scale: per-block distinct-position partials (bounded by m_bits) merged
    by one position-keyed groupby; the filter never exists as a single
    object until a consumer ORs the rows."""

    def partial(t: pa.Table) -> pa.Table:
        pos: set[int] = set()
        for x in t[key_col].to_pylist():
            for r in range(k_hashes):
                pos.add(_md5_64(f"{r}:{x}") % m_bits)
        return pa.table({"position": pa.array(sorted(pos), pa.int64())})

    return hash_groupby(
        ds.select_columns([key_col]).map_batches(partial, batch_format="pyarrow"),
        ["position"],
        lambda df: df.drop_duplicates(ignore_index=True),
    )


def bloom_probe(
    positions, keys, m_bits: int = 65536, k_hashes: int = 4
) -> list[bool]:
    """Membership probe against a materialized position table (list of
    {position} rows): True = possibly present (no false negatives),
    False = definitely absent."""
    bits = {int(r["position"]) for r in positions}
    return [
        all(_md5_64(f"{r}:{x}") % m_bits in bits for r in range(k_hashes))
        for x in keys
    ]


# ------------------------------------------------------- heavy hitters


#: above this many sketch-surviving candidate tokens the candidate set is
#: no longer collected/broadcast as a driver frozenset — the verify pass
#: filters per-block against the (bounded, broadcast-once) CMS directly,
#: which is EXACTLY the candidate-membership predicate, so both paths are
#: bit-identical (the guarded switch shared with textstats.lm_unigram_score)
HH_CANDIDATE_BROADCAST_LIMIT = 1_000_000

#: hard bound on driver-side CMS state: depth x width cells collect to the
#: driver once (take_all below); at 64M int64 cells that is ~512MB — past
#: it the sketch should be widened via sharded sub-sketches instead
CMS_DRIVER_CELL_LIMIT = 64 * 1024 * 1024


def heavy_hitters(
    ds: "ray.data.Dataset",
    threshold: int = 1000,
    depth: int = 4,
    width: int = 1024,
    broadcast_limit: int = HH_CANDIDATE_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """EXACT heavy hitters (3-shingles occurring >= ``threshold`` times)
    via the sketch-guided candidate + exact-verify pattern: pass 1 builds
    the count-min sketch (:func:`cms_counters` — bounded depth x width
    state); because CMS never underestimates, every true heavy hitter
    survives the sketch filter, so pass 2 only has to count EXACTLY the
    shingles whose estimate clears the threshold and drop the false
    positives. Output: ``(token, n)`` exact counts — the sketch bounds the
    state, the verify pass restores exactness.

    Scale guard: the candidate set (true heavy hitters + CMS-collision
    false positives — vocabulary-sized when width is too small for the
    corpus) is counted BEFORE any driver collection. At or below
    ``broadcast_limit`` it ships once as a frozenset (fast set lookups in
    the verify pass); above it nothing is collected — the verify pass
    re-evaluates the CMS min-count predicate per block against the
    broadcast (depth x width, bounded) cell matrix, which defines
    candidate membership, so the two paths return identical rows."""
    if depth * width > CMS_DRIVER_CELL_LIMIT:
        raise ValueError(
            f"CMS sketch {depth}x{width} exceeds the driver cell bound "
            f"({CMS_DRIVER_CELL_LIMIT}); use sharded sub-sketches instead"
        )

    # bounded by construction: cms_counters emits <= depth*width rows
    sketch = cms_counters(ds, depth=depth, width=width).take_all()
    cells = np.zeros((depth, width), dtype=np.int64)
    for r in sketch:
        cells[int(r["row"]), int(r["col"])] = int(r["count"])
    cells_ref = ray.put(cells)

    from fonduer_ray.stages.util import get_broadcast as _gb

    def _survives(c: "np.ndarray", s: str) -> bool:
        return all(
            c[r, _md5_64(f"{r}:{s}") % width] >= threshold
            for r in range(depth)
        )

    def candidate_partial(t: pa.Table) -> pa.Table:
        c = _gb(cells_ref)
        seen: set[str] = set()
        for text in t["text"].to_pylist():
            seen.update(_shingles(text))
        cands = [s for s in seen if _survives(c, s)]
        return pa.table({"token": pa.array(sorted(cands), pa.string())})

    cand_ds = hash_groupby(
        ds.select_columns(["text"]).map_batches(
            candidate_partial, batch_format="pyarrow"
        ),
        ["token"],
        lambda df: df.drop_duplicates(ignore_index=True),
    ).materialize()

    if cand_ds.count() <= broadcast_limit:
        cand_ref = ray.put(
            frozenset(
                tok
                for b in cand_ds.iter_batches(
                    batch_size=65536, batch_format="pyarrow"
                )
                for tok in b["token"].to_pylist()
            )
        )

        def is_candidate(c, cand, s):  # set-membership fast path
            return s in cand

    else:
        cand_ref = ray.put(None)  # nothing driver-side above the limit

        def is_candidate(c, cand, s):  # CMS predicate == membership
            return _survives(c, s)

    def exact_partial(t: pa.Table) -> pa.Table:
        c = _gb(cells_ref)
        cand = _gb(cand_ref)
        counts: dict[str, int] = {}
        for text in t["text"].to_pylist():
            for s in _shingles(text):
                if is_candidate(c, cand, s):
                    counts[s] = counts.get(s, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    exact = hash_groupby(
        ds.select_columns(["text"]).map_batches(
            exact_partial, batch_format="pyarrow"
        ),
        ["token"],
        lambda df: df.groupby("token", sort=False)["n"].sum().reset_index(),
    )

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["n"], threshold))

    return exact.map_batches(keep, batch_format="pyarrow")


def grouped_trimmed_stats(
    ds: "ray.data.Dataset",
    group_col: str,
    val_col: str = "value",
    lo_pct: int = 10,
    hi_pct: int = 90,
) -> "ray.data.Dataset":
    """Robust (trimmed) per-group aggregate: count / sum / mean of values
    inside the group's [p``lo_pct``, p``hi_pct``] band — the
    outlier-resistant mean every latency/quality dashboard wants next to
    the raw one.

    The band edges come from :func:`grouped_percentiles` (the exact
    distributed rank walk, same ``rn = max(1, ceil(pct*n/100))``
    convention), so this costs the percentile passes plus ONE more
    filtered-aggregate scan. The per-(group, pct) edge table is bounded
    by 2x|groups| (GROUP_TARGET_LIMIT guards the percentile walk) and
    broadcasts once. Sums stay integer cents; the mean divides two exact
    ints. Columns: ``(group_col, n_kept, sum_kept, trimmed_mean)``."""
    import pyarrow.compute as pc

    import ray

    from fonduer_ray.stages.util import get_broadcast, hash_groupby

    edges = grouped_percentiles(ds, group_col, val_col, pcts=(lo_pct, hi_pct))
    band: dict = {}
    for r in edges.take_all():  # <= 2 x |groups| rows (guarded upstream)
        g = r[group_col]
        cents = int(round(r["value"] * 100))
        lo, hi = band.get(g, (None, None))
        if int(r["pct"]) == lo_pct:
            band[g] = (cents, hi)
        else:
            band[g] = (lo, cents)
    band_ref = ray.put(band)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        b = get_broadcast(band_ref)
        cents = pc.cast(pc.round(pc.multiply(t[val_col], 100.0)), pa.int64())
        groups = t[group_col].to_pylist()
        cl = cents.to_pylist()
        keep_g, keep_c = [], []
        for g, c in zip(groups, cl):
            lo, hi = b[g]
            if lo <= c <= hi:
                keep_g.append(g)
                keep_c.append(c)
        df = pd.DataFrame({"g": keep_g, "c": keep_c})
        out = (
            df.groupby("g", sort=False)["c"]
            .agg(["size", "sum"])
            .reset_index()
            .rename(columns={"size": "n_kept", "sum": "sum_c"})
        )
        return pa.table(
            {
                "g": pa.array(out["g"], pa.string()),
                "n_kept": pa.array(out["n_kept"], pa.int64()),
                "sum_c": pa.array(out["sum_c"], pa.int64()),
            }
        )

    agg = hash_groupby(
        ds.select_columns([group_col, val_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["g"],
        lambda df: df.groupby("g", sort=False)
        .agg(n_kept=("n_kept", "sum"), sum_c=("sum_c", "sum"))
        .reset_index(),
    )

    def finish(t: pa.Table) -> pa.Table:
        sums = t["sum_c"].to_pylist()
        ns = t["n_kept"].to_pylist()
        return pa.table(
            {
                group_col: t["g"],
                "n_kept": t["n_kept"],
                "sum_kept": pa.array([s / 100.0 for s in sums], pa.float64()),
                "trimmed_mean": pa.array(
                    [(s / n) / 100.0 for s, n in zip(sums, ns)], pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(group_col)


def grouped_mad(
    ds: "ray.data.Dataset",
    group_col: str,
    val_col: str = "value",
    n_buckets: int = 65536,
) -> "ray.data.Dataset":
    """Median absolute deviation per group — the robust dispersion
    companion to :func:`grouped_trimmed_stats`: ``mad = median(|x -
    median(x)|)``, both medians EXACT under the engine's rank convention
    ``rn = max(1, ceil(50*n/100))`` in integer cents.

    Two chained :func:`grouped_percentiles` rank walks: the first yields
    one median row per group (bounded by the GROUP_TARGET_LIMIT contract,
    broadcast once), the second runs over the |x - med| deviations
    computed in a stateless map. Nothing value-sized touches the driver.
    Returns ``(group_col, median_value, mad_value)`` (cents / 100)."""
    meds = grouped_percentiles(
        ds, group_col, val_col, pcts=(50,), n_buckets=n_buckets
    ).materialize()
    med_map: dict = {}
    for b in meds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for g, v in zip(b[group_col].to_pylist(), b["value"].to_pylist()):
            med_map[g] = int(round(v * 100))
    if not med_map:
        g_field = ds.schema().base_schema.field(group_col)
        return ray.data.from_arrow(
            pa.table({group_col: pa.array([], g_field.type),
                      "median_value": pa.array([], pa.float64()),
                      "mad_value": pa.array([], pa.float64())})
        )
    med_ref = ray.put(med_map)

    def deviations(t: pa.Table) -> pa.Table:
        from fonduer_ray.stages.util import get_broadcast as _gb

        med = _gb(med_ref)
        gs = t[group_col].to_pylist()
        cents = np.round(
            t[val_col].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dev = np.abs(cents - np.asarray([med[g] for g in gs], dtype=np.int64))
        return pa.table(
            {group_col: t[group_col],
             "value": pa.array(dev / 100.0, pa.float64())}
        )

    devs = ds.select_columns([group_col, val_col]).map_batches(
        deviations, batch_format="pyarrow"
    )
    mads = grouped_percentiles(
        devs, group_col, "value", pcts=(50,), n_buckets=n_buckets
    )
    # final assembly: one row per group (bounded, same contract as the
    # med_map broadcast above)
    mad_map: dict = {}
    for b in mads.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for g, v in zip(b[group_col].to_pylist(), b["value"].to_pylist()):
            mad_map[g] = v
    groups = sorted(med_map)
    return ray.data.from_arrow(
        pa.table(
            {
                group_col: pa.array(groups),
                "median_value": pa.array(
                    [med_map[g] / 100.0 for g in groups], pa.float64()
                ),
                "mad_value": pa.array(
                    [mad_map[g] for g in groups], pa.float64()
                ),
            }
        )
    )


def equi_depth_histogram(
    ds: "ray.data.Dataset",
    val_col: str = "value",
    k: int = 10,
    n_buckets: int = 65536,
) -> "ray.data.Dataset":
    """Equi-depth (equal-frequency) histogram: ``k`` buckets delimited by
    the exact p(100/k)..p(100(k-1)/k) percentiles of ``val_col`` (the
    :func:`exact_percentiles` rank walk), then ONE counting scan. Bucket
    of a row = number of boundaries strictly below its cents value
    (``searchsorted left``), so duplicate boundary values produce empty
    middle buckets rather than ambiguity. Complements the equi-WIDTH
    ``relational.value_histogram``. Returns ``(bucket, n)``."""
    pcts = tuple((100 * i) // k for i in range(1, k))
    bounds_ds = exact_percentiles(
        ds, val_col=val_col, pcts=pcts, n_buckets=n_buckets
    )
    bounds = np.sort(
        np.round(
            bounds_ds.to_pandas()["value"].to_numpy() * 100.0
        ).astype(np.int64)
    )
    if len(bounds) == 0:
        return ray.data.from_arrow(
            pa.table({"bucket": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
        )
    b_ref = ray.put(bounds)

    def bucket_counts(t: pa.Table) -> pa.Table:
        from fonduer_ray.stages.util import get_broadcast as _gb

        bds = _gb(b_ref)
        cents = np.round(
            t[val_col].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        idx = np.searchsorted(bds, cents, side="left")
        counts = np.bincount(idx, minlength=len(bds) + 1)
        return pa.table(
            {"bucket": pa.array(np.arange(len(counts), dtype=np.int64)),
             "n": pa.array(counts.astype(np.int64))}
        )

    # per-block partials are k-sized; the driver merge is O(blocks * k)
    total = np.zeros(len(bounds) + 1, dtype=np.int64)
    for b in ds.select_columns([val_col]).map_batches(
        bucket_counts, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        np.add.at(
            total, b["bucket"].to_numpy(), b["n"].to_numpy()
        )
    keep = total > 0
    return ray.data.from_arrow(
        pa.table(
            {
                "bucket": pa.array(
                    np.arange(len(total), dtype=np.int64)[keep]
                ),
                "n": pa.array(total[keep]),
            }
        )
    )
