"""KG-construction job entrypoint — the ``ray job submit`` surface.

On a real cluster::

    ray job submit --working-dir . -- \
        python scripts/run_kg_job.py \
        --input s3://bucket/webpages/ --output s3://bucket/kb/ \
        --spec pipeline.yaml --n-buckets 256

Locally (also how the scaling evidence is produced, see bench.py)::

    python scripts/run_kg_job.py --input /tmp/corpus.parquet --output /tmp/kb

The job is checkpoint-resumable: re-submitting with the same output dir and
config skips completed buckets (per-partition lineage manifests,
``stages/materialize.py``). Prints one JSON line with rows written, skipped
buckets and wall time — the per-partition metrics live in the manifests.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="webpages parquet path/dir")
    ap.add_argument("--output", required=True, help="KB output dir")
    ap.add_argument(
        "--spec", default=None, help="optional YAML pipeline spec (pipelines/spec.py)"
    )
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.6)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` this attaches to the cluster; standalone it
        # starts a local instance
        ray.init()

    sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])
    from fonduer_ray.pipelines.kg import KGConfig, run_kg
    from fonduer_ray.stages.materialize import write_triples
    from fonduer_ray.sources.webpages import read_webpages

    t0 = time.time()
    if args.spec:
        from fonduer_ray.pipelines.spec import load_spec, run_spec

        deduped = run_spec(read_webpages(args.input), load_spec(args.spec))
        cfg = KGConfig(threshold=args.threshold, n_buckets=args.n_buckets)
        res = write_triples(
            deduped, args.output, cfg.config_hash(), n_buckets=args.n_buckets
        )
    else:
        cfg = KGConfig(threshold=args.threshold, n_buckets=args.n_buckets)
        res = run_kg(args.input, args.output, cfg)
    print(
        json.dumps(
            {
                "rows_written": res["rows_written"],
                "written_buckets": len(res["written_buckets"]),
                "skipped_buckets": len(res["skipped_buckets"]),
                "seconds": round(time.time() - t0, 2),
                "output": args.output,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
