"""Trained discriminative scorer over the sparse feature matrix.

Replaces the reference's sparse-feature LogisticRegression head
(``learning/task.py:178-204``: an Emmental ``SparseLinear`` over FeatureKey
indices) with a **closed-form log-odds fit** that keeps the same serving
shape — per-key weights + bias, scored as ``sigmoid(bias + sum of weights
over the candidate's present keys)`` — while being exactly reproducible by
the DuckDB oracle (an iterative SGD fit would not be).

Distributed layout (nothing trains driver-side):

1. features ``(candidate_stable_id, keys)`` join labels ``(candidate_
   stable_id, y)`` — a hash-partition ``Dataset.join`` on the stable id.
2. per-key class counts: per-block combiner dicts -> ``hash_groupby`` sum
   (the partial-gradient pattern: each block contributes one partial count
   row per key it saw).
3. weights ``w_k = ln((n_k1+a)/(n1+2a)) - ln((n_k0+a)/(n0+2a))``, bias
   ``ln((n1+a)/(n0+a))`` (Laplace-smoothed log odds).
4. scoring: size-guarded on vocabulary. At or below
   ``VOCAB_BROADCAST_LIMIT`` keys, weights broadcast once via ``ray.put``
   and a stateless ``map_batches`` computes ``sigmoid(bias + sum w_k)``,
   summing in sorted key order so the float result is order-deterministic
   (bit-identical to the oracle's ``list_reduce`` over ``list(wt ORDER BY
   key)``). Above the limit (a 10^8-key web vocabulary is a multi-GB dict)
   the weight table stays a Dataset: candidates explode to (candidate, key)
   rows, hash-partition ``Dataset.join`` against the weight shard, and the
   per-candidate sum runs as ``np.add.reduceat`` over rows sorted by
   (candidate, key) — sequential left-to-right IEEE adds, so both paths
   produce bit-identical scores.
"""

from __future__ import annotations

import math

import pyarrow as pa

import ray
import ray.data

from fonduer_ray.stages.util import hash_groupby, get_broadcast


#: above this many feature keys the weight table is no longer collected into
#: a driver dict — ``fit_log_odds`` returns it as a Dataset and
#: ``score_log_odds`` scores through a hash-partition join (same guard
#: pattern as ``linking.link_triples``)
VOCAB_BROADCAST_LIMIT = 2_000_000


#: above this many labeled candidates the (cid -> y) map no longer
#: broadcasts; the fit joins feats against y_ds with ``Dataset.join``
Y_BROADCAST_LIMIT = 5_000_000


def fit_log_odds(
    feats: "ray.data.Dataset",
    y_ds: "ray.data.Dataset",
    alpha: float = 1.0,
    num_partitions: int | None = None,
    vocab_limit: int = VOCAB_BROADCAST_LIMIT,
    y_broadcast_limit: int = Y_BROADCAST_LIMIT,
) -> "tuple[dict[str, float] | ray.data.Dataset, float]":
    """Closed-form discriminative fit; returns ``(weights, bias)``.

    ``feats``: rows with ``candidate_stable_id`` and ``keys`` (distinct per
    candidate). ``y_ds``: rows ``(candidate_stable_id, y)`` with y in {0,1}.
    ``weights`` is a plain dict when the vocabulary fits under
    ``vocab_limit`` (the reference's FeatureKey table analog), else a
    ``(key, wt)`` Dataset kept sharded in the object store;
    ``score_log_odds`` accepts either and picks the matching strategy.

    The feats×y alignment is size-guarded like every other small-side join
    in this repo: up to ``y_broadcast_limit`` labels, the (cid -> y) map is
    streamed to the driver once (one int per candidate), broadcast via
    ``ray.put`` and applied inside the count pass — no join actors, and
    n0/n1 come from the same single pass over ``y_ds`` instead of separate
    ``sum``/``count`` re-executions of the labeling pipeline. Above the
    limit, ``Dataset.join`` keeps everything sharded."""
    import pandas as pd

    def sum_counts(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("key", sort=False)
            .agg(n0=("n0", "sum"), n1=("n1", "sum"))
            .reset_index()
        )

    # -- try the broadcast path: stream y until the limit trips ------------
    y_map: dict[str, int] | None = {}
    for batch in y_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        y_map.update(
            zip(
                batch["candidate_stable_id"].to_pylist(),
                batch["y"].to_pylist(),
            )
        )
        if len(y_map) > y_broadcast_limit:
            y_map = None
            break

    if y_map is not None:
        n1 = sum(y_map.values())
        n0 = len(y_map) - n1
        y_ref = ray.put(y_map)

        def counts_broadcast(batch: pa.Table) -> pa.Table:
            ym = get_broadcast(y_ref)
            counts: dict[str, list[int]] = {}
            for cid, keys in zip(
                batch["candidate_stable_id"].to_pylist(),
                batch["keys"].to_pylist(),
            ):
                y = ym.get(cid)
                if y is None:  # inner-join semantics: unlabeled rows drop
                    continue
                for k in keys:
                    c = counts.get(k)
                    if c is None:
                        c = counts[k] = [0, 0]
                    c[y] += 1
            return pa.table(
                {
                    "key": pa.array(list(counts), pa.string()),
                    "n0": pa.array([c[0] for c in counts.values()], pa.int64()),
                    "n1": pa.array([c[1] for c in counts.values()], pa.int64()),
                }
            )

        per_key = hash_groupby(
            feats.map_batches(counts_broadcast, batch_format="pyarrow"),
            ["key"],
            sum_counts,
        )
        return _finish_fit(per_key, n0, n1, alpha, vocab_limit)

    # -- scale path: hash-partition join, nothing driver-sized -------------
    if num_partitions is None:
        # Dataset.join spawns one aggregator ACTOR per partition; actor
        # cold-start dominates small fits (measured 25s at 64 partitions vs
        # 2.4s at 8 on the same input). Scale runs pass num_partitions
        # explicitly.
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(cpus // 4, 4)

    y_ds = y_ds.materialize()  # consumed 3x below (join + sum + count)

    # Arrow hash joins reject list-typed payload columns — carry the key
    # list through the join as one newline-delimited string
    def pack_keys(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "candidate_stable_id": batch["candidate_stable_id"],
                "packed_keys": pa.array(
                    ["\n".join(k) for k in batch["keys"].to_pylist()], pa.string()
                ),
            }
        )

    joined = feats.map_batches(pack_keys, batch_format="pyarrow").join(
        y_ds,
        "inner",
        num_partitions=num_partitions,
        on=("candidate_stable_id",),
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        counts: dict[str, list[int]] = {}
        for packed, y in zip(
            batch["packed_keys"].to_pylist(), batch["y"].to_pylist()
        ):
            for k in packed.split("\n") if packed else []:
                c = counts.get(k)
                if c is None:
                    c = counts[k] = [0, 0]
                c[y] += 1
        return pa.table(
            {
                "key": pa.array(list(counts), pa.string()),
                "n0": pa.array([c[0] for c in counts.values()], pa.int64()),
                "n1": pa.array([c[1] for c in counts.values()], pa.int64()),
            }
        )

    per_key = hash_groupby(
        joined.map_batches(partial_counts, batch_format="pyarrow"), ["key"], sum_counts
    )

    n1 = int(y_ds.sum("y") or 0)
    n0 = int(y_ds.count()) - n1
    return _finish_fit(per_key, n0, n1, alpha, vocab_limit)


def _finish_fit(
    per_key: "ray.data.Dataset",
    n0: int,
    n1: int,
    alpha: float,
    vocab_limit: int,
) -> "tuple[dict[str, float] | ray.data.Dataset, float]":
    """Shared tail of both fit paths: per-key counts -> weights (dict below
    ``vocab_limit``, sharded ``(key, wt)`` Dataset above) + bias."""
    if n1 == 0 or n0 == 0:
        # single-class training set: per-key likelihood ratios are
        # meaningless (every key looks "rare" against the empty class and
        # the summed negatives swamp the bias) — predict the majority class
        return {}, math.log((n1 + alpha) / (n0 + alpha))

    bias = math.log((n1 + alpha) / (n0 + alpha))
    per_key = per_key.materialize()  # vocab-sized, stays sharded in the store

    if per_key.count() > vocab_limit:
        def to_weights(batch: pa.Table) -> pa.Table:
            # math.log (not np.log, which can differ in the last ulp) so the
            # sharded weights are bit-identical to the dict path's
            wt = [
                math.log((c1 + alpha) / (n1 + 2 * alpha))
                - math.log((c0 + alpha) / (n0 + 2 * alpha))
                for c0, c1 in zip(batch["n0"].to_pylist(), batch["n1"].to_pylist())
            ]
            # explicit cast: empty partitions otherwise yield null-typed key
            # blocks whose schema breaks the downstream scoring join
            return pa.table(
                {
                    "key": batch["key"].cast(pa.string()),
                    "wt": pa.array(wt, pa.float64()),
                }
            )

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        # repartition: coalesces fragmented map_groups output AND drops the
        # schemaless zero-row blocks empty hash partitions emit (acero's
        # join rejects a right side containing a block without the key col)
        weights_ds = per_key.map_batches(to_weights, batch_format="pyarrow").repartition(
            max(2 * cpus, 8)
        )
        return weights_ds, bias

    weights: dict[str, float] = {}
    for batch in per_key.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for k, c0, c1 in zip(
            batch["key"].to_pylist(), batch["n0"].to_pylist(), batch["n1"].to_pylist()
        ):
            weights[k] = math.log((c1 + alpha) / (n1 + 2 * alpha)) - math.log(
                (c0 + alpha) / (n0 + 2 * alpha)
            )
    return weights, bias


def score_log_odds(
    feats: "ray.data.Dataset",
    weights: "dict[str, float] | ray.data.Dataset",
    bias: float,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Apply the trained weights: ``(doc_name, candidate_stable_id, score)``.
    Keys are summed in sorted order so float accumulation is deterministic.
    ``weights`` as a dict scores via broadcast; as a ``(key, wt)`` Dataset
    (the over-``VOCAB_BROADCAST_LIMIT`` fit output) via a hash-partition
    join — both bit-identical."""
    if isinstance(weights, ray.data.Dataset):
        return _score_log_odds_sharded(feats, weights, bias, num_partitions)
    weights_ref = ray.put(weights)

    def apply(batch: pa.Table) -> pa.Table:
        w = get_broadcast(weights_ref)
        scores = []
        for keys in batch["keys"].to_pylist():
            z = bias
            for k in sorted(keys):
                z += w.get(k, 0.0)
            scores.append(1.0 / (1.0 + math.exp(-z)))
        return pa.table(
            {
                "doc_name": batch["doc_name"],
                "candidate_stable_id": batch["candidate_stable_id"],
                "score": pa.array(scores, pa.float64()),
            }
        )

    return feats.map_batches(apply, batch_format="pyarrow")


def _score_log_odds_sharded(
    feats: "ray.data.Dataset",
    weights_ds: "ray.data.Dataset",
    bias: float,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Web-vocabulary scoring: candidates explode to one row per key, join
    the sharded weight table on the key, and the per-candidate sum runs
    sequentially over rows sorted by (candidate, key) — the same
    left-to-right float64 add order as the broadcast path's sorted-key
    loop, so scores are bit-identical (numpy's pairwise/SIMD reductions
    would not be). An empty-key sentinel row per candidate (key "", weight
    0.0, sorts first and adds exactly nothing) keeps featureless candidates
    in the output."""
    import pandas as pd

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(cpus // 4, 4)

    def explode(batch: pa.Table) -> pa.Table:
        cands, docs, keys = [], [], []
        for cand, doc, ks in zip(
            batch["candidate_stable_id"].to_pylist(),
            batch["doc_name"].to_pylist(),
            batch["keys"].to_pylist(),
        ):
            cands.append(cand)
            docs.append(doc)
            keys.append("")  # sentinel: candidate survives with zero keys
            for k in ks:
                cands.append(cand)
                docs.append(doc)
                keys.append(k)
        return pa.table(
            {
                "candidate_stable_id": pa.array(cands, pa.string()),
                "doc_name": pa.array(docs, pa.string()),
                "key": pa.array(keys, pa.string()),
            }
        )

    joined = feats.map_batches(explode, batch_format="pyarrow").join(
        weights_ds,
        "left_outer",
        num_partitions=num_partitions,
        on=("key",),
    )

    def score_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["candidate_stable_id", "key"], kind="mergesort", ignore_index=True
        )
        wts = df["wt"].fillna(0.0).tolist()
        cands = df["candidate_stable_id"].tolist()
        docs = df["doc_name"].tolist()
        out_doc, out_cand, out_score = [], [], []
        i, n = 0, len(cands)
        while i < n:
            cand, z, j = cands[i], bias, i
            while j < n and cands[j] == cand:
                z += wts[j]
                j += 1
            out_doc.append(docs[i])
            out_cand.append(cand)
            out_score.append(1.0 / (1.0 + math.exp(-z)))
            i = j
        return pd.DataFrame(
            {
                "doc_name": pd.Series(out_doc, dtype="object"),
                "candidate_stable_id": pd.Series(out_cand, dtype="object"),
                "score": pd.Series(out_score, dtype="float64"),
            }
        )

    return hash_groupby(joined, ["candidate_stable_id"], score_part)
