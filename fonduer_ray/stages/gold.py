"""Gold-label annotation: join an external gold set onto candidates.

Reference surface: ``src/fonduer/supervision/labeler.py:48-417`` — the
``Labeler.apply(table=GoldLabel)`` path writes a per-candidate gold
annotation from a user gold function, ``get_gold_labels`` retrieves the
matrix, and the e2e tests' ``gold(c)`` function
(``tests/shared/hardware_utils.py:28-69``) is membership of the
candidate's UPPERCASED entity tuple ``(doc, span0, span1)`` in a CSV-
loaded gold set. Here the gold set is a first-class Dataset (any external
table reads into one), the membership test is a size-guarded
broadcast-or-hash-join, and the entity-level confusion of
``entity_level_f1`` (``hardware_utils.py:72-130``) is a per-doc
union-sum aggregate — no driver-side sets at any scale.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from fonduer_ray.stages.util import get_broadcast, hash_groupby, join_partitions

#: shared with the relational lookup joins — above this many gold rows the
#: membership test switches from a broadcast frozenset to a hash join
GOLD_BROADCAST_LIMIT = 2_000_000

#: unit separator — cannot occur in whitespace-tokenized span text
_SEP = "\x1f"


def _norm_key(parts: list, normalize: bool) -> str:
    s = _SEP.join("" if p is None else str(p) for p in parts)
    return s.upper() if normalize else s


def attach_gold_labels(
    ds: "ray.data.Dataset",
    gold: "ray.data.Dataset",
    key_cols: list[str],
    gold_key_cols: list[str] | None = None,
    normalize: bool = True,
    broadcast_limit: int = GOLD_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Append a ``gold`` int64 column (1 when the row's ``key_cols`` tuple
    is present in ``gold``'s ``gold_key_cols`` tuple set, else 0).

    ``normalize=True`` uppercases both sides before comparing — the
    reference gold functions compare ``.upper()`` tuples
    (``hardware_utils.py:60-69``).

    Scale: the gold side is counted first. At or below
    ``broadcast_limit`` its (deduplicated) key set ships ONCE via
    ``ray.put`` and membership is a per-batch set lookup — the big
    candidate side never shuffles. Above the limit both sides
    hash-partition through a left-outer ``Dataset.join`` on the derived
    key, so nothing driver-sized materializes; the two paths agree
    because both reduce gold to its DISTINCT key set first (membership
    is idempotent in duplicates)."""
    gold_key_cols = gold_key_cols or key_cols
    n_gold = gold.count()

    def add_key(t: pa.Table, cols: list[str]) -> pa.Table:
        keys = [
            _norm_key(parts, normalize)
            for parts in zip(*(t[c].to_pylist() for c in cols))
        ]
        return t.append_column("_gk", pa.array(keys, pa.string()))

    if n_gold <= broadcast_limit:
        gold_set = frozenset(
            _norm_key(parts, normalize)
            for batch in gold.select_columns(gold_key_cols).iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
            for parts in zip(*(batch[c].to_pylist() for c in gold_key_cols))
        )
        set_ref = ray.put(gold_set)

        def mark(t: pa.Table) -> pa.Table:
            gs = get_broadcast(set_ref)
            keys = [
                _norm_key(parts, normalize)
                for parts in zip(*(t[c].to_pylist() for c in key_cols))
            ]
            return t.append_column(
                "gold", pa.array([int(k in gs) for k in keys], pa.int64())
            )

        return ds.map_batches(mark, batch_format="pyarrow")

    keyed = ds.map_batches(
        lambda t: add_key(t, key_cols), batch_format="pyarrow"
    )
    gold_keys = hash_groupby(
        gold.select_columns(gold_key_cols).map_batches(
            lambda t: add_key(t, gold_key_cols).select(["_gk"]),
            batch_format="pyarrow",
        ),
        ["_gk"],
        lambda df: df.drop_duplicates(ignore_index=True).assign(_hit=1),
        join_safe=True,
    )
    joined = keyed.join(
        gold_keys,
        "left_outer",
        num_partitions=join_partitions(),
        on=("_gk",),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hit = pc.cast(pc.is_valid(t["_hit"]), pa.int64())
        return t.drop_columns(["_gk", "_hit"]).append_column("gold", hit)

    return joined.map_batches(finish, batch_format="pyarrow")


def entity_confusion(
    pred: "ray.data.Dataset",
    gold: "ray.data.Dataset",
    doc_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Entity-level per-doc confusion counts — the distributed form of the
    reference's ``entity_level_f1`` (``hardware_utils.py:72-130``, which
    builds two driver-side python sets and intersects them).

    ``pred`` must already carry the ``gold`` 0/1 membership column from
    :func:`attach_gold_labels` and be entity-DISTINCT; ``gold`` is the
    entity-distinct gold table. Emits ``(doc_col, n_pred, n_gold, n_tp)``
    via a single union-sum groupby: each pred entity contributes
    ``(1, 0, gold)`` and each gold entity ``(0, 1, 0)`` — one bounded
    shuffle keyed by doc, no set ever collects to the driver. P/R/F1
    derive per doc or globally from the three sums."""

    def pred_contrib(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                doc_col: t[doc_col],
                "n_pred": pa.array([1] * n, pa.int64()),
                "n_gold": pa.array([0] * n, pa.int64()),
                "n_tp": t["gold"],
            }
        )

    def gold_contrib(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                doc_col: t[doc_col],
                "n_pred": pa.array([0] * n, pa.int64()),
                "n_gold": pa.array([1] * n, pa.int64()),
                "n_tp": pa.array([0] * n, pa.int64()),
            }
        )

    contrib = pred.map_batches(pred_contrib, batch_format="pyarrow").union(
        gold.map_batches(gold_contrib, batch_format="pyarrow")
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(doc_col, sort=False)[["n_pred", "n_gold", "n_tp"]]
            .sum()
            .reset_index()
        )

    return hash_groupby(contrib, [doc_col], agg)
