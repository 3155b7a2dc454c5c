"""KB materialization: partitioned Parquet triple tables with per-partition
lineage manifests and checkpoint-resumable stage boundaries (north_rule).

Layout::

    out_dir/
      bucket=<k>/*.parquet        # hash(subj) % n_buckets
      _manifests/bucket-<k>.json  # {bucket, rows, config_hash, stage}

Resume: a bucket whose manifest exists with a matching ``config_hash`` is
skipped on re-run (the write filters those buckets out before the sink), so a
failed run re-does only unfinished partitions. The same helpers serve any
stage boundary (``checkpoint_dataset`` / ``load_checkpoint``).
"""

from __future__ import annotations

import json
import os
import zlib

import pyarrow as pa

import ray.data

MANIFEST_DIR = "_manifests"


def _bucket_of(key: str, n_buckets: int) -> int:
    return zlib.crc32(key.encode()) % n_buckets


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"bucket-{bucket}.json")


def completed_buckets(out_dir: str, config_hash: str) -> set[int]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            if m.get("config_hash") == config_hash:
                done.add(int(m["bucket"]))
        except (ValueError, OSError, KeyError):
            continue
    return done


def write_triples(
    ds: "ray.data.Dataset",
    out_dir: str,
    config_hash: str,
    n_buckets: int = 16,
    key_col: str = "subj",
    stage: str = "triples",
) -> dict:
    """Write a bucketed, resumable Parquet table; returns a summary dict.

    Buckets with a matching manifest are filtered out before the write —
    that filter is the checkpoint-resume path."""
    done = completed_buckets(out_dir, config_hash)
    if len(done) >= n_buckets:
        # fully complete: the input dataset is lazy, so returning here skips
        # the ENTIRE upstream pipeline, not just the write
        return {
            "out_dir": out_dir,
            "written_buckets": [],
            "skipped_buckets": sorted(done),
            "rows_written": 0,
        }

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [
            _bucket_of(k or "", n_buckets) for k in batch[key_col].to_pylist()
        ]
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    if done:
        import pyarrow.compute as pc

        done_arr = pa.array(sorted(done), pa.int32())

        def drop_done(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(pc.is_in(batch["bucket"], value_set=done_arr))
            )

        bucketed = bucketed.map_batches(drop_done, batch_format="pyarrow")
    # pin: consumed twice below (manifest counts + parquet write); without
    # this the upstream DAG would execute twice
    bucketed = bucketed.materialize()
    # dedup output inherits the upstream shuffle's block count; coalesce so
    # the partitioned write emits ~one file per bucket, not one per block
    if bucketed.num_blocks() > 2 * n_buckets:
        bucketed = bucketed.repartition(n_buckets).materialize()
    # count per bucket rides along for the manifests (small aggregate)
    from ray.data.aggregate import Count

    counts = {
        int(r["bucket"]): int(r["count()"])
        for r in bucketed.groupby("bucket").aggregate(Count()).take_all()
    }
    if counts:
        bucketed.write_parquet(out_dir, partition_cols=["bucket"])
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    for b, n in counts.items():
        with open(_manifest_path(out_dir, b), "w") as f:
            json.dump(
                {
                    "bucket": b,
                    "rows": n,
                    "config_hash": config_hash,
                    "stage": stage,
                },
                f,
            )
    return {
        "out_dir": out_dir,
        "written_buckets": sorted(counts),
        "skipped_buckets": sorted(done),
        "rows_written": sum(counts.values()),
    }


def checkpoint_dataset(
    ds: "ray.data.Dataset", out_dir: str, config_hash: str, stage: str
) -> str:
    """Materialize any stage output as a resumable Parquet checkpoint; returns
    the directory. If a valid manifest exists, the write is skipped."""
    mpath = os.path.join(out_dir, MANIFEST_DIR, "stage.json")
    if os.path.exists(mpath):
        try:
            with open(mpath) as f:
                m = json.load(f)
            if m.get("config_hash") == config_hash:
                return out_dir
        except (ValueError, OSError):
            pass
    ds.write_parquet(out_dir)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    with open(mpath, "w") as f:
        json.dump({"config_hash": config_hash, "stage": stage}, f)
    return out_dir


def load_checkpoint(out_dir: str, config_hash: str) -> "ray.data.Dataset | None":
    mpath = os.path.join(out_dir, MANIFEST_DIR, "stage.json")
    if not os.path.exists(mpath):
        return None
    try:
        with open(mpath) as f:
            m = json.load(f)
    except (ValueError, OSError):
        return None
    if m.get("config_hash") != config_hash:
        return None
    return ray.data.read_parquet(out_dir, file_extensions=["parquet"])


# ---------------------------------------------------------------------------
# incremental upsert (the reference's Featurizer.update / Labeler.update /
# clear=False path, featurizer.py:65-146, labeler.py:72-115)
# ---------------------------------------------------------------------------


def append_generation(
    ds: "ray.data.Dataset", out_dir: str, key_col: str
) -> int:
    """Append ``ds`` as a new numbered generation under ``out_dir``.
    Upsert-by-key happens at READ time (``read_upserted``): re-running a
    stage over changed documents just appends, and the newest generation
    wins per key — no in-place mutation, every generation is immutable
    (what Postgres upserts did for the reference, done shuffle-free on
    write)."""
    os.makedirs(out_dir, exist_ok=True)
    gens = [
        int(name.split("=")[1])
        for name in os.listdir(out_dir)
        if name.startswith("gen=")
    ]
    gen = (max(gens) + 1) if gens else 0

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_gen", pa.array([gen] * len(batch), pa.int64())
        )

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, f"gen={gen}")
    )
    return gen


def read_upserted(out_dir: str, key_col: str) -> "ray.data.Dataset":
    """Read all generations, keeping the NEWEST row per key — one
    hash-partitioned groupby on the key (dedup-on-read upsert).

    Uses ``hash_groupby`` (vectorized per-partition dedup) rather than the
    native per-key ``map_groups``, which iterates one Python call per
    distinct key (~0.3 ms each — 8s for a 23k-key store, measured)."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    ds = ray.data.read_parquet(out_dir, file_extensions=["parquet"])

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        # Secondary sort on a content hash: among duplicate keys within
        # the SAME generation the survivor must not depend on partition
        # row order, or repeated reads of one store could differ.
        row_hash = pd.util.hash_pandas_object(
            df.drop(columns=["_gen"]), index=False
        ).to_numpy()
        df = (
            df.assign(_rh=row_hash)
            .sort_values(["_gen", "_rh"], kind="stable")
            .drop(columns=["_rh"])
        )
        return df.drop_duplicates(key_col, keep="last").drop(columns=["_gen"])

    return hash_groupby(ds, [key_col], latest)


# ------------------------------------------------------------- data layout


def morton_interleave16(x, y):
    """Vectorized 16-bit Morton (Z-order) interleave: bit i of ``x`` lands
    at position 2i, bit i of ``y`` at 2i+1. Sorting / range-partitioning
    on the code clusters rows that are close in BOTH dimensions into the
    same parquet row groups, so min-max row-group statistics prune
    two-dimensional range predicates — the standard layout trick for
    scan-heavy 100-TB tables (public technique; e.g. Morton 1966).
    Inputs are masked to 16 bits (two's-complement semantics for
    negatives, matching SQL bitwise ops)."""
    import numpy as np

    def spread(v: "np.ndarray") -> "np.ndarray":
        v = v.astype(np.int64) & np.int64(0xFFFF)
        v = (v | (v << 8)) & np.int64(0x00FF00FF)
        v = (v | (v << 4)) & np.int64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.int64(0x33333333)
        v = (v | (v << 1)) & np.int64(0x55555555)
        return v

    return spread(x) | (spread(y) << np.int64(1))


def morton16_sql(x_expr: str, y_expr: str) -> str:
    """Unrolled SQL expression computing :func:`morton_interleave16` —
    bit-identical (32 masked shift-add terms over the 16-bit masked
    inputs)."""
    terms = []
    for i in range(16):
        terms.append(
            f"(((({x_expr}) & 65535) >> {i}) & 1) * {1 << (2 * i)}"
        )
        terms.append(
            f"(((({y_expr}) & 65535) >> {i}) & 1) * {1 << (2 * i + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


# -------------------------------------------------- co-partitioned joins


def bucketed_join_counts(
    sf_dir: str,
    n_buckets: int = 8,
    out_root: str = "/tmp/fonduer_ray_bucketed",
) -> "ray.data.Dataset":
    """Co-partitioned (bucketed) join demo: both ``orders`` and
    ``customer`` are written ONCE to hive-partitioned parquet bucketed by
    ``custkey % n_buckets``; the join then runs bucket-by-bucket with NO
    shuffle — each task reads the two matching bucket directories and
    merges locally, because co-bucketing at WRITE time guarantees every
    join key lives in the same bucket on both sides. This is the classic
    warehouse bucketed-table layout that turns a repeated all-to-all join
    exchange into a metadata-only task assignment (pay one bucketed write,
    join shuffle-free forever after). Returns ``(c_nationkey, n_orders)``.

    The per-bucket task parallelism is the bucket count; the final rollup
    is nation-sized. Bucket directories land under
    ``out_root/<ray job id>`` and are removed once the (tiny) result
    materializes."""
    import shutil

    import pandas as pd
    import pyarrow.parquet as pq_

    from fonduer_ray.stages.util import hash_groupby, read_blocks_for

    job = ray.get_runtime_context().get_job_id()
    base = f"{out_root}/{job}"
    shutil.rmtree(base, ignore_errors=True)

    def read(table: str, columns: list[str]):
        path = f"{sf_dir}/{table}.parquet"
        n = read_blocks_for(path)
        kw = {"override_num_blocks": n} if n else {}
        return ray.data.read_parquet(path, columns=columns, **kw)

    def with_bucket(key: str):
        def add(t: pa.Table) -> pa.Table:
            import numpy as np

            b = (
                t[key].to_numpy(zero_copy_only=False).astype(np.int64)
                % n_buckets
            )
            return t.append_column("bucket", pa.array(b, pa.int64()))

        return add

    read("orders", ["o_orderkey", "o_custkey"]).map_batches(
        with_bucket("o_custkey"), batch_format="pyarrow"
    ).write_parquet(f"{base}/orders", partition_cols=["bucket"])
    read("customer", ["c_custkey", "c_nationkey"]).map_batches(
        with_bucket("c_custkey"), batch_format="pyarrow"
    ).write_parquet(f"{base}/customer", partition_cols=["bucket"])

    buckets = ray.data.from_arrow(
        pa.table({"bucket": pa.array(range(n_buckets), pa.int64())})
    ).repartition(n_buckets)

    def join_bucket(t: pa.Table) -> pa.Table:
        frames = []
        for b in t["bucket"].to_pylist():
            o = pq_.read_table(
                f"{base}/orders/bucket={b}", columns=["o_custkey"]
            ).to_pandas()
            c = pq_.read_table(
                f"{base}/customer/bucket={b}",
                columns=["c_custkey", "c_nationkey"],
            ).to_pandas()
            m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
            frames.append(
                m.groupby("c_nationkey", sort=False)
                .size()
                .rename("n_orders")
                .reset_index()
            )
        out = pd.concat(frames) if frames else pd.DataFrame(
            {"c_nationkey": [], "n_orders": []}
        )
        return pa.Table.from_pandas(
            out.astype({"c_nationkey": "int64", "n_orders": "int64"}),
            preserve_index=False,
        )

    partials = buckets.map_batches(
        join_bucket, batch_format="pyarrow", batch_size=1
    )
    result = hash_groupby(
        partials,
        ["c_nationkey"],
        lambda df: df.groupby("c_nationkey", sort=False)["n_orders"]
        .sum()
        .reset_index(),
    ).materialize()
    shutil.rmtree(base, ignore_errors=True)
    return result
