"""Entity linking & canonicalization: salted groupby-aggregate shuffles keyed
by normalized surface form, with explicit skew mitigation for head entities.

New code with no reference analog (north_rule): the reference stops at
candidate scoring; a KG needs linked, canonicalized entities. Strategy:

1. ``normalize_surface`` folds case/whitespace/punctuation/dashes — the
   shuffle key.
2. Canonical form per key = the most frequent raw surface (ties ->
   lexicographically smallest). Skew handling is two-pronged: the
   (norm, surface)-keyed aggregate uses a **per-block combiner** (head pairs
   collapse to <=1 row per block before the shuffle), and norm-keyed
   aggregates that a combiner cannot bound (``entity_support``) use an
   **explicit salted two-phase groupby** — salt splits a head norm across
   reducers, a second tiny groupby merges the <= n_salts partials.
3. The canonical map is small (entity vocabulary); it is broadcast once via
   ``ray.put`` and applied inside ``map_batches`` — a broadcast join, not a
   shuffle join.
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa

import ray

from fonduer_ray.stages.util import get_broadcast
import ray.data

_PUNCT_EDGE = re.compile(r"^[\W_]+|[\W_]+$", re.UNICODE)
_WS = re.compile(r"\s+")
_DASH = re.compile("[‐‑‒–—―−]")


def normalize_surface(s: str) -> str:
    """Normalization key for entity linking (upper, dash-fold, punctuation
    edges stripped, whitespace collapsed)."""
    s = _DASH.sub("-", s)
    s = _PUNCT_EDGE.sub("", s)
    s = _WS.sub(" ", s).strip()
    return s.upper()


def _salt_of(surface: str, n_salts: int) -> int:
    return zlib.crc32(surface.encode()) % n_salts


def build_canonical_table(
    ds: "ray.data.Dataset",
    columns: list[str],
    n_salts: int = 16,
    weight_col: str | None = None,
) -> "ray.data.Dataset":
    """Distributed {norm -> canonical surface} table ``(norm, canonical)``:
    the fully-streaming form of the canonical map (nothing driver-side),
    used directly by the shuffle-join path of ``link_triples`` when the
    entity vocabulary is too large to broadcast.

    ``weight_col``: when the input is already aggregated (e.g. a deduped
    triple table with a ``support`` column), weight each surface occurrence
    by it — equivalent to counting the raw occurrences."""

    def to_pairs(batch: pa.Table) -> pa.Table:
        # per-block combiner: collapse duplicate (norm, surface) pairs early
        counts: dict[tuple[str, str], int] = {}
        weights = (
            batch[weight_col].to_pylist()
            if weight_col is not None
            else [1] * batch.num_rows
        )
        for col in columns:
            for v, wt in zip(batch[col].to_pylist(), weights):
                if not v:
                    continue
                key = (normalize_surface(v), v)
                counts[key] = counts.get(key, 0) + wt
        norms, surfs, cnts = [], [], []
        for (n, s), c in counts.items():
            norms.append(n)
            surfs.append(s)
            cnts.append(c)
        return pa.table(
            {
                "norm": pa.array(norms, pa.string()),
                "surface": pa.array(surfs, pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    pairs = ds.map_batches(to_pairs, batch_format="pyarrow")
    # single shuffle: the per-block combiner above already collapsed any
    # head (norm, surface) pair to <=1 row per block, so rows-per-group at
    # the reducer are bounded by the block count — a Zipfian head entity
    # never lands raw on one reducer. (For aggregates keyed on ``norm``
    # alone, where combining can't bound the group, see the explicitly
    # salted ``entity_support``.) Entity vocabularies are large at web
    # scale, so the final merge uses hash_groupby (vectorized per-partition
    # grouping) rather than the per-group sort-aggregate.
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def sum_agg(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["norm", "surface"], sort=False)
            .agg(cnt=("cnt", "sum"))
            .reset_index()
        )

    summed = hash_groupby(pairs, ["norm", "surface"], sum_agg)

    # canonical = most frequent surface, ties lexicographically smallest
    def best_agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["norm", "cnt", "surface"], ascending=[True, False, True])
        out = df.drop_duplicates("norm", keep="first")
        return out[["norm", "surface"]].rename(columns={"surface": "canonical"})

    # join_safe: the table feeds link_triples' shuffle-join path above the
    # broadcast limit; map_groups' zero-column empty blocks would otherwise
    # break the per-partition acero join (layout-dependent, latent)
    return hash_groupby(summed, ["norm"], best_agg, join_safe=True)


def build_canonical_map(
    ds: "ray.data.Dataset", columns: list[str], n_salts: int = 16
) -> dict[str, str]:
    """Driver-side dict form of ``build_canonical_table`` for the broadcast
    join path. Only call when the vocabulary is known/guarded small —
    ``link_triples`` counts first and falls back to the shuffle join."""
    out: dict[str, str] = {}
    tbl = build_canonical_table(ds, columns, n_salts=n_salts)
    for batch in tbl.iter_batches(batch_size=65536, batch_format="pyarrow"):
        out.update(
            zip(batch["norm"].to_pylist(), batch["canonical"].to_pylist())
        )
    return out


def entity_support(
    linked: "ray.data.Dataset", n_salts: int = 16
) -> "ray.data.Dataset":
    """Per-entity mention support: one row ``(norm, support)`` per canonical
    entity, counting every subj/obj occurrence across the triple table.

    This aggregate is keyed on ``norm`` ALONE, so a head entity (e.g. a
    Zipfian top subject at web scale) cannot be bounded by a per-block
    combiner the way the (norm, surface) canonical-map aggregate can — this
    is where **explicit salting** applies (north_rule skew mitigation):

    phase 1: groupby ``(norm, salt)`` with ``salt = crc32(norm ^ block rows)
    % n_salts`` — head-norm rows split across ``n_salts`` reducers;
    phase 2: groupby ``norm`` over at most ``n_salts`` partial rows per key.
    """

    def to_salted(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, int], int] = {}
        for col in ("subj_norm", "obj_norm"):
            col_vals = batch[col].to_pylist()
            for i, n in enumerate(col_vals):
                if not n:
                    continue
                key = (n, (zlib.crc32(n.encode()) ^ i) % n_salts)
                counts[key] = counts.get(key, 0) + 1
        return pa.table(
            {
                "norm": pa.array([k[0] for k in counts], pa.string()),
                "salt": pa.array([k[1] for k in counts], pa.int32()),
                "support": pa.array(list(counts.values()), pa.int64()),
            }
        )

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def sum_support(keys):
        def agg(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.groupby(keys, sort=False)
                .agg(support=("support", "sum"))
                .reset_index()
            )

        return agg

    salted = linked.map_batches(to_salted, batch_format="pyarrow")
    partial = hash_groupby(salted, ["norm", "salt"], sum_support(["norm", "salt"]))
    final = hash_groupby(partial, ["norm"], sum_support(["norm"]))

    def drop_salt(t: pa.Table) -> pa.Table:
        return t.select(["norm", "support"])

    return final.map_batches(drop_salt, batch_format="pyarrow")


#: above this many distinct norms the canonical map is not broadcast as a
#: driver dict (a 100 TB web KG's vocabulary easily reaches 10^8 rows /
#: multi-GB) — link_triples switches to a hash-partition shuffle join
BROADCAST_NORM_LIMIT = 2_000_000


def link_triples(
    triples: "ray.data.Dataset",
    n_salts: int = 16,
    broadcast_limit: int = BROADCAST_NORM_LIMIT,
) -> "ray.data.Dataset":
    """Canonicalize subj/obj of a raw triple table; emits the same schema
    with canonical surfaces + ``subj_norm``/``obj_norm`` keys.

    Size-guarded join strategy: the distinct-norm count is measured first
    (a cheap aggregate over the already-materialized canonical table).
    Below ``broadcast_limit`` the map broadcasts once via ``ray.put`` and
    applies inside ``map_batches`` (no shuffle of the triples). Above it,
    canonicalization becomes two hash-partition ``Dataset.join``s against
    the distributed canonical table — nothing driver-sized.

    The input is materialized first: it is consumed twice (canonical-map
    aggregate + canonical application), and without pinning, the second pass
    would re-execute the whole upstream parse/extract DAG. The triple table
    is orders of magnitude smaller than the document corpus, so pinning it
    in the object store (with spill) is the right stage boundary — the same
    place ``checkpoint_dataset`` persists on disk for resumable runs."""
    triples = triples.materialize()
    # The upstream parse stage runs best over many small input blocks
    # (fine-grained task scheduling), but the triple table is ~100-1000x
    # smaller than the corpus — carrying the corpus' block count into the
    # groupby shuffles below pays per-block overhead on near-empty blocks.
    # Coalesce fragmented output before the shuffle stages.
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    n_blocks = triples.num_blocks()
    if n_blocks > 2 * cpus and triples.count() / max(n_blocks, 1) < 50_000:
        triples = triples.repartition(2 * cpus).materialize()

    canon_tbl = build_canonical_table(triples, ["subj", "obj"], n_salts=n_salts).materialize()
    return _apply_canonical(triples, canon_tbl, broadcast_limit)


def _apply_canonical(
    triples: "ray.data.Dataset",
    canon_tbl: "ray.data.Dataset",
    broadcast_limit: int = BROADCAST_NORM_LIMIT,
) -> "ray.data.Dataset":
    """Replace subj/obj with their canonical surfaces (adds ``subj_norm``/
    ``obj_norm``), choosing broadcast vs shuffle join by vocabulary size."""
    import ray  # noqa: F811 - keep local for clarity

    n_norms = canon_tbl.count()

    def add_norms(batch: pa.Table) -> pa.Table:
        subj_norm = [normalize_surface(s) for s in batch["subj"].to_pylist()]
        obj_norm = [normalize_surface(s) for s in batch["obj"].to_pylist()]
        out = batch.append_column("subj_norm", pa.array(subj_norm, pa.string()))
        return out.append_column("obj_norm", pa.array(obj_norm, pa.string()))

    with_norms = triples.map_batches(add_norms, batch_format="pyarrow")

    if n_norms <= broadcast_limit:
        canon: dict[str, str] = {}
        for batch in canon_tbl.iter_batches(batch_size=65536, batch_format="pyarrow"):
            canon.update(zip(batch["norm"].to_pylist(), batch["canonical"].to_pylist()))
        canon_ref = ray.put(canon)

        def apply_canon(batch: pa.Table) -> pa.Table:
            cmap = get_broadcast(canon_ref)
            subj_norm = batch["subj_norm"].to_pylist()
            obj_norm = batch["obj_norm"].to_pylist()
            out = batch.drop_columns(["subj", "obj"])
            out = out.append_column(
                "subj", pa.array([cmap.get(n, n) for n in subj_norm], pa.string())
            )
            return out.append_column(
                "obj", pa.array([cmap.get(n, n) for n in obj_norm], pa.string())
            )

        return with_norms.map_batches(apply_canon, batch_format="pyarrow")

    # shuffle-join path: hash-partition the triples and the canonical table
    # on the norm key, once per side (subj, then obj)
    from fonduer_ray.stages.util import join_partitions

    n_parts = join_partitions()

    def _renamer(names: list[str]):
        def rename(t: pa.Table) -> pa.Table:
            return t.rename_columns(names)

        return rename

    canon_subj = canon_tbl.map_batches(
        _renamer(["norm", "_subj_canon"]), batch_format="pyarrow"
    )
    canon_obj = canon_tbl.map_batches(
        _renamer(["_obj_key", "_obj_canon"]), batch_format="pyarrow"
    )
    joined = with_norms.drop_columns(["subj"]).join(
        canon_subj,
        "left_outer",
        num_partitions=n_parts,
        on=("subj_norm",),
        right_on=("norm",),
    )
    joined = joined.join(
        canon_obj,
        "left_outer",
        num_partitions=n_parts,
        on=("obj_norm",),
        right_on=("_obj_key",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        subj = [
            c if c is not None else n
            for c, n in zip(batch["_subj_canon"].to_pylist(), batch["subj_norm"].to_pylist())
        ]
        obj_c = [
            c if c is not None else n
            for c, n in zip(batch["_obj_canon"].to_pylist(), batch["obj_norm"].to_pylist())
        ]
        out = batch.drop_columns(
            [c for c in ("obj", "_subj_canon", "_obj_canon", "norm", "_obj_key")
             if c in batch.column_names]
        )
        out = out.append_column("subj", pa.array(subj, pa.string()))
        return out.append_column("obj", pa.array(obj_c, pa.string()))

    return joined.map_batches(finish, batch_format="pyarrow")


def dedup_triples(linked: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact triple dedup + aggregation: one row per (subj, pred, obj) with
    support count, max score and one provenance sample. A per-block combiner
    collapses duplicates before the global groupby (partial aggregation)."""

    def combine(batch: pa.Table) -> pa.Table:
        agg: dict[tuple, list] = {}
        for r in batch.select(
            ["subj", "pred", "obj", "doc_name", "candidate_stable_id", "score"]
        ).to_pylist():
            key = (r["subj"], r["pred"], r["obj"])
            cur = agg.get(key)
            if cur is None:
                agg[key] = [1, r["score"], r["doc_name"], r["candidate_stable_id"]]
            else:
                cur[0] += 1
                if r["score"] > cur[1]:
                    cur[1] = r["score"]
                if r["doc_name"] < cur[2]:
                    cur[2], cur[3] = r["doc_name"], r["candidate_stable_id"]
        rows = [
            {
                "subj": k[0],
                "pred": k[1],
                "obj": k[2],
                "support": v[0],
                "score": v[1],
                "provenance_doc": v[2],
                "provenance_candidate": v[3],
            }
            for k, v in agg.items()
        ]
        return pa.Table.from_pylist(rows, schema=_DEDUP_SCHEMA)

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # independent column minima — same semantics as the previous
        # Sum/Max/Min aggregate combination, fully deterministic
        return (
            df.groupby(["subj", "pred", "obj"], sort=False)
            .agg(
                support=("support", "sum"),
                score=("score", "max"),
                provenance_doc=("provenance_doc", "min"),
                provenance_candidate=("provenance_candidate", "min"),
            )
            .reset_index()
        )

    partial = linked.map_batches(combine, batch_format="pyarrow")
    return hash_groupby(partial, ["subj", "pred", "obj"], merge)


_DEDUP_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("support", pa.int64()),
        ("score", pa.float64()),
        ("provenance_doc", pa.string()),
        ("provenance_candidate", pa.string()),
    ]
)


#: below this many aggregated rows the canonicalization finish (canonical
#: apply + merge) runs as ONE coalesced worker task instead of another
#: shuffle round — shuffle fixed latency is the Amdahl term that caps
#: single-node scaling, and the aggregated KB is tiny next to the corpus
SMALL_FINISH_LIMIT = 2_000_000

_LINK_SCHEMA = pa.schema(
    [
        ("gkind", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("support", pa.int64()),
        ("score", pa.float64()),
        ("provenance_doc", pa.string()),
        ("provenance_candidate", pa.string()),
        ("norm", pa.string()),
        ("canonical", pa.string()),
    ]
)


def canonicalize_triples(
    triples: "ray.data.Dataset",
    n_salts: int = 16,
    broadcast_limit: int = BROADCAST_NORM_LIMIT,
    small_finish_limit: int = SMALL_FINISH_LIMIT,
) -> "ray.data.Dataset":
    """Single-shuffle canonicalization + dedup (the composed fast form of
    ``link_triples`` -> ``dedup_triples``; identical output).

    Shuffle count is the scaling killer on the post-extraction phase (each
    round pays fixed scheduling/sort latency regardless of data size), so
    ONE hash-partition pass computes BOTH aggregates: every block of raw
    triples emits (a) per-block-combined triple partials keyed by the raw
    (subj, pred, obj) and (b) (norm, surface) count partials keyed by norm
    — the same salted-combiner skew story as ``build_canonical_map``. The
    partition agg finishes each key group exactly (triples aggregated,
    canonical winner per norm picked). The remaining work — applying the
    canonical map and merging raw triples that collide on canonical keys —
    touches only the aggregated rows: below ``small_finish_limit`` it runs
    as one coalesced worker task; above it, the guarded broadcast/shuffle
    join of ``_apply_canonical`` + a final hash_groupby (the 100 TB path)."""
    import os

    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    if os.environ.get("FONDUER_RAY_CANON_STREAM", "0") != "1":
        # Pin the extraction output before the aggregate. Counter-intuitive
        # but measured (A/B in one process, 32 CPUs, 480k docs): streaming
        # extraction straight into the dual-partial pass + Sort runs ~40%
        # SLOWER (19-25s vs 11-13s) because the streaming executor's
        # per-operator resource reservation splits the CPU budget across the
        # whole 7-operator DAG, capping the expensive extraction map at ~13
        # effective CPUs while the downstream operators sit mostly idle.
        # With the barrier, extraction owns the node, and the post-extraction
        # phase (partials -> one shuffle -> finish) costs ~1.5s fixed. The
        # triple table is 100-1000x smaller than the corpus, so pinning it
        # in the object store (with spill) is the right stage boundary.
        # FONDUER_RAY_CANON_STREAM=1 restores the fully-streaming form.
        triples = triples.materialize()
    def dual_partials(batch: pa.Table) -> pa.Table:
        df = batch.select(
            ["subj", "pred", "obj", "doc_name", "candidate_stable_id", "score"]
        ).to_pandas()
        tri = (
            df.groupby(["subj", "pred", "obj"], sort=False)
            .agg(
                support=("score", "size"),
                score=("score", "max"),
                provenance_doc=("doc_name", "min"),
                provenance_candidate=("candidate_stable_id", "min"),
            )
            .reset_index()
        )
        tri_out = pd.DataFrame(
            {
                "gkind": 0,
                "subj": tri["subj"],
                "pred": tri["pred"],
                "obj": tri["obj"],
                "support": tri["support"].astype("int64"),
                "score": tri["score"],
                "provenance_doc": tri["provenance_doc"],
                "provenance_candidate": tri["provenance_candidate"],
                "norm": "T|" + tri["subj"] + "|" + tri["pred"] + "|" + tri["obj"],
                "canonical": None,
            }
        )
        surf = pd.concat([df["subj"], df["obj"]], ignore_index=True)
        surf = surf[surf.notna() & (surf != "")]
        counts = surf.value_counts()  # one normalize call per DISTINCT surface
        can_out = pd.DataFrame(
            {
                "gkind": 1,
                "subj": None,
                "pred": None,
                "obj": None,
                "support": counts.to_numpy().astype("int64"),
                "score": 0.0,
                "provenance_doc": None,
                "provenance_candidate": None,
                "norm": [normalize_surface(s) for s in counts.index],
                "canonical": counts.index.to_numpy(),
            }
        )
        out = pd.concat([tri_out, can_out], ignore_index=True)
        return pa.Table.from_pandas(out, schema=_LINK_SCHEMA, preserve_index=False)

    def dual_agg(df: pd.DataFrame) -> pd.DataFrame:
        tri = df[df["gkind"] == 0]
        tri = (
            tri.groupby(["subj", "pred", "obj"], sort=False)
            .agg(
                support=("support", "sum"),
                score=("score", "max"),
                provenance_doc=("provenance_doc", "min"),
                provenance_candidate=("provenance_candidate", "min"),
            )
            .reset_index()
        )
        tri["gkind"] = 0
        tri["norm"] = None
        tri["canonical"] = None
        can = df[df["gkind"] == 1]
        can = (
            can.groupby(["norm", "canonical"], sort=False)
            .agg(support=("support", "sum"))
            .reset_index()
            .sort_values(["norm", "support", "canonical"], ascending=[True, False, True])
            .drop_duplicates("norm", keep="first")
        )
        can = pd.DataFrame(
            {
                "gkind": 1,
                "subj": None,
                "pred": None,
                "obj": None,
                "support": can["support"].astype("int64"),
                "score": 0.0,
                "provenance_doc": None,
                "provenance_candidate": None,
                "norm": can["norm"],
                "canonical": can["canonical"],
            }
        )
        return pd.concat([tri, can], ignore_index=True)

    # ``num_cpus=0.25`` deliberately differs from the upstream extraction
    # map's remote args: identical args would let Ray FUSE extraction with
    # this combiner, and the combiner's ``batch_size`` would then govern the
    # fused operator's input bundling — collapsing extraction from ~hundreds
    # of tasks to a handful (measured: 14 tasks / 2x wall time at 32 CPUs).
    # Unfused, extraction keeps per-block granularity and the combiner
    # bundles its SMALL triple output into full batches.
    partials = triples.map_batches(
        dual_partials, batch_format="pyarrow", batch_size=32768, num_cpus=0.25
    )
    agg = hash_groupby(partials, ["norm"], dual_agg).materialize()
    n_rows = agg.count()

    tri_ds = agg.filter(expr="gkind == 0")
    canon_ds = agg.filter(expr="gkind == 1")

    if n_rows <= small_finish_limit:
        # one coalesced task: build the canonical dict, apply, merge
        def finish(df: pd.DataFrame) -> pd.DataFrame:
            can = df[df["gkind"] == 1]
            cmap = dict(zip(can["norm"], can["canonical"]))
            tri = df[df["gkind"] == 0].copy()
            tri["subj"] = [
                cmap.get(normalize_surface(s), s) for s in tri["subj"]
            ]
            tri["obj"] = [cmap.get(normalize_surface(s), s) for s in tri["obj"]]
            return (
                tri.groupby(["subj", "pred", "obj"], sort=False)
                .agg(
                    support=("support", "sum"),
                    score=("score", "max"),
                    provenance_doc=("provenance_doc", "min"),
                    provenance_candidate=("provenance_candidate", "min"),
                )
                .reset_index()
            )

        return agg.repartition(1).map_batches(
            finish, batch_format="pandas", batch_size=None
        )

    # 100 TB path: guarded broadcast/shuffle canonical join + one more merge
    def project_canon(batch: pa.Table) -> pa.Table:
        return batch.select(["norm", "canonical"])

    def project_tri(batch: pa.Table) -> pa.Table:
        return batch.select(
            ["subj", "pred", "obj", "support", "score",
             "provenance_doc", "provenance_candidate"]
        )

    # repartition: canon_ds inherits map_groups' zero-column empty blocks
    # (map_batches skips them), which break _apply_canonical's shuffle join
    # when a join partition receives only such shards; vocab-sized, cheap
    from fonduer_ray.stages.util import join_partitions as _jp

    canon_tbl = canon_ds.map_batches(
        project_canon, batch_format="pyarrow"
    ).repartition(_jp())
    linked = _apply_canonical(
        tri_ds.map_batches(project_tri, batch_format="pyarrow"),
        canon_tbl.materialize(),
        broadcast_limit,
    )

    def strip_norms(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(
            [c for c in ("subj_norm", "obj_norm") if c in batch.column_names]
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["subj", "pred", "obj"], sort=False)
            .agg(
                support=("support", "sum"),
                score=("score", "max"),
                provenance_doc=("provenance_doc", "min"),
                provenance_candidate=("provenance_candidate", "min"),
            )
            .reset_index()
        )

    return hash_groupby(
        linked.map_batches(strip_norms, batch_format="pyarrow"),
        ["subj", "pred", "obj"],
        merge,
    )
