"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ours.columns) != sorted(oracle.columns):
        problems.append(f"columns {sorted(ours.columns)} vs {sorted(oracle.columns)}")
        return problems
    if len(ours) != len(oracle):
        problems.append(f"rows {len(ours)} vs {len(oracle)}")
        return problems
    a, b = canon(ours), canon(oracle)
    for col in a.columns:
        ca, cb = a[col], b[col]
        if str(ca.dtype) != str(cb.dtype):
            problems.append(f"dtype[{col}] {ca.dtype} vs {cb.dtype}")
        if ca.dtype.kind == "f":
            import numpy as np

            if not np.allclose(ca.to_numpy(), cb.to_numpy(), rtol=0, atol=0, equal_nan=True):
                mx = float(abs(ca.to_numpy() - cb.to_numpy()).max())
                problems.append(f"float values[{col}] differ (max abs {mx:.3e})")
        else:
            if not ca.equals(cb):
                neq = (ca != cb).sum()
                problems.append(f"values[{col}] differ in {neq} rows")
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"weak  {name}: rows={len(ours)} ({dt:.1f}s, no oracle)")
            n_weak += 1
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL raised {e}")
            n_bad += 1
            continue
        problems = compare(name, ours, oracle)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"ok    {name}: rows={len(ours)} ({dt:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_weak} weak (rows-only), {n_bad} FAIL")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
