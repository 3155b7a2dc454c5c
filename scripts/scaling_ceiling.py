"""Hardware scaling-ceiling probe: the fused KG stage run under BARE
multiprocessing (no Ray, no object store, no scheduler) at 1 / N / 4N
processes on pre-loaded in-memory batches.

Purpose: on a single shared-memory box, an allocation-heavy Python parse
workload stops scaling linearly once the processes saturate DRAM bandwidth
and boost clocks drop — independent of any framework. This probe measures
that ceiling so the Ray pipeline's N->4N efficiency can be compared against
what the hardware itself allows (see BASELINE.md). On a real 4N-node
cluster each node brings its own memory controllers, so this ceiling does
not apply there.

Usage: python scripts/scaling_ceiling.py [corpus_parquet_shard]
"""

from __future__ import annotations

import sys
import time
from multiprocessing import Process, Queue

DEFAULT_SHARD = "/tmp/fonduer_ray_bench_corpus/corpus.parquet/part-00000.parquet"
DOCS_PER_PROC = 4000


def _worker(q: Queue, shard: str) -> None:
    import pyarrow.parquet as pq

    from fonduer_ray.pipelines.kg import (
        PRED,
        default_lfs,
        mention_specs,
        relation_specs,
    )
    from fonduer_ray.stages.fused import FusedKGStage

    t = pq.read_table(shard).slice(0, DOCS_PER_PROC)
    stage = FusedKGStage(
        mention_specs(), relation_specs(), default_lfs(), pred_names={"part_temp": PRED}
    )
    stage(t.slice(0, 200))  # warm caches/imports before timing
    t0 = time.time()
    for lo in range(0, DOCS_PER_PROC, 500):
        stage(t.slice(lo, 500))
    q.put(DOCS_PER_PROC / (time.time() - t0))


def main() -> None:
    """argv: [corpus_shard] [comma-separated proc counts, default 1,6,24].

    The last two counts form the N -> 4N pair for the printed ceiling
    efficiency (run e.g. ``... shard 1,8,32`` for the pair bench.py uses)."""
    shard = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SHARD
    counts = (
        tuple(int(x) for x in sys.argv[2].split(","))
        if len(sys.argv) > 2
        else (1, 6, 24)
    )
    out = {}
    for n in counts:
        q: Queue = Queue()
        ps = [Process(target=_worker, args=(q, shard)) for _ in range(n)]
        for p in ps:
            p.start()
        rates = [q.get() for _ in ps]
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
