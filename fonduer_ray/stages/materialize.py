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
