"""Hardware scaling-ceiling probe: the fused KG stage run under BARE
multiprocessing (no Ray, no object store, no scheduler), each process
streaming DISTINCT documents.

Purpose: on a single shared-memory box, an allocation-heavy Python parse
workload stops scaling linearly once the processes saturate DRAM bandwidth
and boost clocks drop — independent of any framework. This probe measures
that ceiling so the Ray pipeline's N->4N efficiency can be compared against
what the hardware itself allows (see BASELINE.md). On a real 4N-node
cluster each node brings its own memory controllers, so this ceiling does
not apply there.

Each worker parses its OWN corpus shard (part-<i % n_parts>), offset by a
per-worker stride, so the combined working set streams from DRAM exactly
like the real pipeline. (An earlier version of this probe handed every
worker the same 1.8 MiB shard; 16 workers then shared a cache-resident
working set and reported near-perfect 0.99 "scaling" that the streaming
pipeline can never see — a control must stream if the job streams.)

Usage: python scripts/scaling_ceiling.py [corpus_parquet_dir] [counts]
"""

from __future__ import annotations

import glob
import os
import sys
import time
from multiprocessing import Process, Queue

# workers import fonduer_ray after fork and inherit THIS sys.path; when the
# script runs as scripts/scaling_ceiling.py, sys.path[0] is scripts/, so the
# repo root must be added explicitly (a bare `python scripts/...` run
# otherwise deadlocks: every worker dies on the import and q.get() blocks)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_DIR = "/tmp/fonduer_ray_bench_corpus/corpus.parquet"
DOCS_PER_PROC = int(os.environ.get("CEILING_DOCS_PER_PROC", "12000"))


def _worker(q: Queue, shard: str, offset: int) -> None:
    import pyarrow.parquet as pq

    from fonduer_ray.pipelines.kg import (
        PRED,
        default_lfs,
        mention_specs,
        relation_specs,
    )
    from fonduer_ray.stages.fused import FusedKGStage

    full = pq.read_table(shard)
    # wrap-around slice so any offset yields DOCS_PER_PROC distinct docs
    import pyarrow as pa

    n = full.num_rows
    lo = offset % n
    if lo + DOCS_PER_PROC <= n:
        t = full.slice(lo, DOCS_PER_PROC)
    else:
        t = pa.concat_tables(
            [full.slice(lo), full.slice(0, (lo + DOCS_PER_PROC) - n)]
        )
    stage = FusedKGStage(
        mention_specs(), relation_specs(), default_lfs(), pred_names={"part_temp": PRED}
    )
    stage(t.slice(0, 200))  # warm caches/imports before timing
    t0 = time.time()
    for s in range(0, DOCS_PER_PROC, 500):
        stage(t.slice(s, 500))
    q.put(DOCS_PER_PROC / (time.time() - t0))


def main() -> None:
    """argv: [corpus_parquet_dir] [comma-separated proc counts, default 1,6,24].

    The last two counts form the N -> 4N pair for the printed ceiling
    efficiency (run e.g. ``... dir 4,16`` for the pair bench.py uses)."""
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DIR
    counts = (
        tuple(int(x) for x in sys.argv[2].split(","))
        if len(sys.argv) > 2
        else (1, 6, 24)
    )
    if os.path.isdir(src):
        shards = sorted(glob.glob(os.path.join(src, "*.parquet")))
    else:
        shards = [src]
    out = {}
    for n in counts:
        q: Queue = Queue()
        ps = [
            Process(
                target=_worker,
                # distinct shard per worker (cycled), strided offset so
                # workers that share a shard still parse disjoint rows
                args=(q, shards[i % len(shards)], (i // len(shards)) * DOCS_PER_PROC),
            )
            for i in range(n)
        ]
        for p in ps:
            p.start()
        # bounded get: a worker that dies before q.put would otherwise hang
        # the probe forever
        rates = [q.get(timeout=300) for _ in ps]
        for p in ps:
            p.join()
        out[n] = sum(rates)
        print(f"nproc={n} per_proc={sum(rates)/len(rates):.0f} total={sum(rates):.0f}")
    lo, hi = counts[-2], counts[-1]
    print(
        f"ceiling_efficiency_{lo}_to_{hi}="
        f"{(out[hi] / out[lo]) / (hi / lo):.3f}"
    )


if __name__ == "__main__":
    main()
