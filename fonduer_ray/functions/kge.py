"""KG-embedding training-data preparation over a ``(subj, pred, obj)``
triple table: deterministic negative sampling (TransE/DistMult corrupt-
object protocol, Bordes et al. 2013) and hash-driven random-walk corpus
generation (DeepWalk, Perozzi et al. 2014 / node2vec p=q=1).

Both operators are DETERMINISTIC — randomness is replaced by the repo's
md5-based hash discipline (``_md5_64``) so the DuckDB oracle reproduces
every sample bit-for-bit and re-runs are stable for checkpoint/resume.

The reference has no KGE path (its discriminative model is an LSTM over
candidates, /root/reference/src/fonduer/learning/disc_models/lstm.py);
these are the training-data exports a 10^12-doc KB pipeline feeds to a
downstream embedding trainer.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from fonduer_ray.functions.dedup import _md5_64


def _ranked_vocab(distinct_obj: "ray.data.Dataset") -> "ray.data.Dataset":
    """Global 0-based rank over a DISTINCT string column ``obj`` — the
    string-keyed variant of ``util.ordered_prefix_sum``'s two-pass scan:
    one range sort, per-block (first_key, n_rows) partials (driver state
    O(#blocks)), exclusive offsets broadcast back, vectorized local
    arange. Columns ``(idx, v)``."""
    import ray

    base = distinct_obj.sort("obj").materialize()
    partials = []
    for b in base.map_batches(
        lambda t: pa.table(
            {
                "_first": pa.array(
                    [t["obj"][0].as_py()] if t.num_rows else [], pa.string()
                ),
                "_n": pa.array([t.num_rows] if t.num_rows else [], pa.int64()),
            }
        ),
        batch_size=None,
        batch_format="pyarrow",
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        partials.extend(zip(b["_first"].to_pylist(), b["_n"].to_pylist()))
    partials.sort()
    offsets = {}
    acc = 0
    for first, cnt in partials:
        offsets[first] = acc
        acc += cnt
    off_ref = ray.put(offsets)

    def attach_rank(t: pa.Table) -> pa.Table:
        from fonduer_ray.stages.util import get_broadcast

        if t.num_rows == 0:
            return pa.table(
                {"idx": pa.array([], pa.int64()), "v": pa.array([], pa.string())}
            )
        off = get_broadcast(off_ref)[t["obj"][0].as_py()]
        return pa.table(
            {
                "idx": pa.array(range(off, off + t.num_rows), pa.int64()),
                "v": t["obj"],
            }
        )

    return base.map_batches(
        attach_rank, batch_size=None, batch_format="pyarrow"
    )


def negative_samples(
    triples: "ray.data.Dataset",
    pred: str,
    broadcast_limit: int | None = None,
) -> "ray.data.Dataset":
    """Corrupt-object negative sampling for one entity-valued predicate:
    each positive ``(s, pred, o)`` yields one negative ``(s, pred, o')``
    with ``o'`` drawn from the predicate's object vocabulary at index
    ``md5_64(f"{s}:{o}") % n_vocab``, stepping to the next index when the
    draw collides with the true object (so ``obj_neg != obj`` whenever the
    vocabulary has >= 2 entries).

    Scale shape: the object vocabulary is the predicate's DISTINCT object
    set — one dedup exchange, then a two-pass distributed rank (driver
    state O(#blocks)). The draw resolves through TWO guarded lookups on
    the rank key (fetch the hashed slot, bump on collision, fetch the
    final slot) — broadcast below ``broadcast_limit``, hash-partition
    ``Dataset.join`` above, so a head-heavy vocabulary never materializes
    driver-side. Columns ``(subj, obj, obj_neg)``; ``pred`` is the
    argument, constant.
    """
    from fonduer_ray.pipelines.relational import attach_lookup
    from fonduer_ray.stages.util import hash_groupby, join_partitions

    def only_pred(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["pred"], pred)).select(["subj", "obj"])

    pos = triples.map_batches(only_pred, batch_format="pyarrow")

    distinct_obj = hash_groupby(
        pos.select_columns(["obj"]),
        ["obj"],
        lambda df: df.drop_duplicates(["obj"]),
    )
    vocab = _ranked_vocab(distinct_obj).materialize()
    n_vocab = vocab.count()
    if n_vocab < 2:
        return pa.schema(
            [("subj", pa.string()), ("obj", pa.string()),
             ("obj_neg", pa.string())]
        ).empty_table()
    # vocab feeds two raw-key joins below the guarded lookup; sanitize the
    # scan's empty blocks once
    vocab = vocab.repartition(join_partitions()).materialize()

    def slot0(t: pa.Table) -> pa.Table:
        i0 = [
            _md5_64(f"{s}:{o}") % n_vocab
            for s, o in zip(t["subj"].to_pylist(), t["obj"].to_pylist())
        ]
        return t.append_column("i0", pa.array(i0, pa.int64()))

    kw = {} if broadcast_limit is None else {"broadcast_limit": broadcast_limit}
    with_v0 = attach_lookup(
        pos.map_batches(slot0, batch_format="pyarrow"),
        vocab.map_batches(
            lambda t: t.rename_columns(["idx", "v0"]), batch_format="pyarrow"
        ),
        "i0",
        "idx",
        "v0",
        **kw,
    )

    def bump(t: pa.Table) -> pa.Table:
        hit = pc.equal(t["v0"], t["obj"])
        i = pc.if_else(
            hit,
            pc.cast(
                # modulo via subtract: i0+1 == n_vocab only when i0 == n-1
                pc.subtract(
                    pc.add(t["i0"], 1),
                    pc.multiply(
                        pc.cast(
                            pc.equal(t["i0"], n_vocab - 1), pa.int64()
                        ),
                        pa.scalar(n_vocab, pa.int64()),
                    ),
                ),
                pa.int64(),
            ),
            t["i0"],
        )
        return pa.table(
            {"subj": t["subj"], "obj": t["obj"], "i": i}
        )

    final = attach_lookup(
        with_v0.map_batches(bump, batch_format="pyarrow"),
        vocab.map_batches(
            lambda t: t.rename_columns(["idx", "obj_neg"]),
            batch_format="pyarrow",
        ),
        "i",
        "idx",
        "obj_neg",
        **kw,
    )
    return final.select_columns(["subj", "obj", "obj_neg"])


def indexed_adjacency(
    triples: "ray.data.Dataset",
    preds: list[str],
    include_inverse: bool = False,
) -> "ray.data.Dataset":
    """Rank-indexed adjacency over the union of entity-valued predicates:
    ``(src, idx, dst, deg)`` where ``idx`` is ``dst``'s 0-based rank among
    ``src``'s distinct sorted neighbors and ``deg`` the neighbor count —
    the addressable form hash-driven walks (and alias-table samplers)
    need. ``include_inverse`` adds the reverse edge of every triple (the
    ``r⁻¹`` relations PRA-style walkers traverse) — in a KB whose forward
    predicates are all functional, that is what makes walks branch.

    Scale shape: ONE src-keyed ``hash_groupby``; rank and degree are
    vectorized pandas within each partition (all of a node's edges
    co-locate). Skewed hubs cost one partition their degree — the same
    bound the graph family documents.
    """
    from fonduer_ray.stages.util import hash_groupby

    pred_set = pa.array(sorted(preds), pa.string())

    def edges(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t["pred"], value_set=pred_set))
        fwd = pa.table(
            {"src": pc.cast(f["subj"], pa.string()),
             "dst": pc.cast(f["obj"], pa.string())}
        )
        if not include_inverse:
            return fwd
        inv = pa.table(
            {"src": pc.cast(f["obj"], pa.string()),
             "dst": pc.cast(f["subj"], pa.string())}
        )
        return pa.concat_tables([fwd, inv])

    def rank(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.drop_duplicates(["src", "dst"]).sort_values(["src", "dst"])
        grp = df.groupby("src", sort=False)
        df = df.assign(
            idx=grp.cumcount().astype("int64"),
            deg=grp["dst"].transform("size").astype("int64"),
        )
        return df

    return hash_groupby(
        triples.map_batches(edges, batch_format="pyarrow"), ["src"], rank
    )


def random_walks(
    triples: "ray.data.Dataset",
    preds: list[str],
    start_pred: str,
    n_steps: int = 3,
    include_inverse: bool = True,
    broadcast_limit: int | None = None,
) -> "ray.data.Dataset":
    """DeepWalk-style walk corpus: from every subject of ``start_pred``,
    take ``n_steps`` hash-driven steps over the directed adjacency of
    ``preds``; at node ``v`` on step ``k`` the walk moves to neighbor
    index ``md5_64(f"{start}:{k}:{v}") % deg(v)``. A walk reaching a sink
    node (no outgoing edge) stops early — DeepWalk's dangling-node
    truncation.

    Scale shape — size-guarded like every lookup in this repo: when the
    adjacency fits the broadcast budget, the sorted neighbor-list dict
    ships ONCE via ``ray.put`` and ALL steps run as stateless maps over
    the frontier (zero per-step exchanges — the common case: the KB's
    entity adjacency is orders of magnitude smaller than the corpus).
    Above the budget, each step is ONE guarded composite-key
    ``attach_lookup`` against the rank-indexed adjacency table, so nothing
    driver-sized ever materializes. The frontier stays a Dataset in both
    paths — no driver-side walk state. Columns ``(start, walk)`` with
    ``walk`` the space-joined node sequence including the start.
    """
    from fonduer_ray.pipelines.relational import BROADCAST_ROW_LIMIT
    from fonduer_ray.stages.util import hash_groupby

    adj = indexed_adjacency(
        triples, preds, include_inverse=include_inverse
    ).materialize()

    def starts(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["pred"], start_pred))
        s = pc.cast(f["subj"], pa.string())
        return (
            pa.table({"start": s, "cur": s, "walk": s})
            .group_by(["start", "cur", "walk"])
            .aggregate([])
        )

    # a start may appear in several blocks: one exact distinct exchange
    frontier = hash_groupby(
        triples.map_batches(starts, batch_format="pyarrow"),
        ["start"],
        lambda df: df.drop_duplicates(["start"]),
    ).materialize()

    limit = BROADCAST_ROW_LIMIT if broadcast_limit is None else broadcast_limit
    if adj.count() <= limit:
        return _walks_broadcast(adj, frontier, n_steps)
    return _walks_join(adj, frontier, n_steps, broadcast_limit)


def _walks_broadcast(
    adj: "ray.data.Dataset", frontier: "ray.data.Dataset", n_steps: int
) -> "ray.data.Dataset":
    """Fast path: one neighbor-list broadcast, every step a pure map."""
    import ray

    from fonduer_ray.stages.util import get_broadcast

    import numpy as np

    # CSR-style broadcast: one vectorized sort builds (dst array + per-src
    # offset/count) — ~10x cheaper to construct and ship than a dict of
    # Python lists at millions of edges
    df = adj.select_columns(["src", "dst"]).to_pandas()
    df = df.sort_values(["src", "dst"], ignore_index=True)
    srcs, offs, cnts = np.unique(
        df["src"].to_numpy(), return_index=True, return_counts=True
    )
    span = {s: (int(o), int(c)) for s, o, c in zip(srcs, offs, cnts)}
    dst_arr = df["dst"].to_numpy()
    nbrs_ref = ray.put((span, dst_arr))

    def walk_all(t: pa.Table) -> pa.Table:
        span_, dst_ = get_broadcast(nbrs_ref)
        starts_ = t["start"].to_pylist()
        outs = []
        for s in starts_:
            cur, walk = s, [s]
            for k in range(n_steps):
                sp = span_.get(cur)
                if sp is None:
                    break
                off, cnt = sp
                cur = dst_[off + _md5_64(f"{s}:{k}:{cur}") % cnt]
                walk.append(cur)
            outs.append(" ".join(walk))
        return pa.table(
            {
                "start": pa.array(starts_, pa.string()),
                "walk": pa.array(outs, pa.string()),
            }
        )

    return frontier.select_columns(["start"]).map_batches(
        walk_all, batch_format="pyarrow"
    )


def _walks_join(
    adj: "ray.data.Dataset",
    frontier: "ray.data.Dataset",
    n_steps: int,
    broadcast_limit: int | None,
) -> "ray.data.Dataset":
    """Scale path: per step one guarded composite-key lookup; sinks split
    off through the degree rows (idx == 0 carries each node's deg)."""
    from fonduer_ray.pipelines.relational import attach_lookup

    def pack(t: pa.Table, a: str, b: str, out: str) -> pa.Table:
        return t.append_column(
            out,
            pc.binary_join_element_wise(
                pc.cast(t[a], pa.string()), pc.cast(t[b], pa.string()), "\x1f"
            ),
        )

    from fonduer_ray.stages.util import join_partitions

    adj_packed = (
        adj.map_batches(
            lambda t: pack(t, "src", "idx", "_k").select(["_k", "dst"]),
            batch_format="pyarrow",
        )
        # adj's zero-column empties skip the pack map: sanitize
        .repartition(join_partitions())
        .materialize()
    )
    # adj also carries hash_groupby's zero-column empties — sanitize once
    deg0 = (
        adj.filter(expr="idx == 0")
        .select_columns(["src", "deg"])
        .repartition(join_partitions())
        .materialize()
    )

    kw = {} if broadcast_limit is None else {"broadcast_limit": broadcast_limit}
    done_parts: list = []
    for step in range(n_steps):
        # every walk finished early: nothing left to advance (and an
        # all-empty Dataset is schema-less — downstream joins would fail)
        if frontier.count() == 0:
            frontier = None
            break
        # map ops SKIP empty blocks, so blocks that missed a map carry a
        # stale schema (hash_groupby's zero-column empties on entry; the
        # previous join's wide schema later); an all-to-all is the only
        # reliable block-schema sanitizer before a raw Dataset.join
        # (hash_groupby's documented join_safe fix)
        frontier = frontier.repartition(join_partitions())
        # LEFT-OUTER degree attach: deg == null marks a sink (finished
        # walk), non-null rows carry the fan-out for the index draw —
        # the sink split stays distributed, no driver-side key set
        with_deg = frontier.join(
            deg0,
            "left_outer",
            num_partitions=join_partitions(),
            on=("cur",),
            right_on=("src",),
        ).materialize()
        def sinks(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_null(t["deg"])).select(["start", "walk"])

        def movers(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_valid(t["deg"]))

        done_parts.append(
            with_deg.map_batches(sinks, batch_format="pyarrow")
        )
        with_deg = with_deg.map_batches(
            movers, batch_format="pyarrow"
        ).materialize()
        if with_deg.count() == 0:  # every remaining walk hit a sink
            frontier = None
            break

        def pick(t: pa.Table, _step=step) -> pa.Table:
            idx = [
                _md5_64(f"{s}:{_step}:{c}") % d
                for s, c, d in zip(
                    t["start"].to_pylist(),
                    t["cur"].to_pylist(),
                    t["deg"].to_pylist(),
                )
            ]
            return t.append_column("idx", pa.array(idx, pa.int64()))

        keyed = (
            with_deg.map_batches(pick, batch_format="pyarrow")
            .map_batches(
                lambda t: pack(t, "cur", "idx", "_k"), batch_format="pyarrow"
            )
            # zero-row blocks skipped the maps above and lack _k: sanitize
            .repartition(join_partitions())
        )
        moved = attach_lookup(keyed, adj_packed, "_k", "_k", "dst", **kw)

        def advance(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "start": t["start"],
                    "cur": pc.cast(t["dst"], pa.string()),
                    "walk": pc.binary_join_element_wise(
                        t["walk"], pc.cast(t["dst"], pa.string()), " "
                    ),
                }
            )

        frontier = moved.map_batches(advance, batch_format="pyarrow").materialize()

    parts = list(done_parts)
    if frontier is not None and frontier.count() > 0:
        parts.append(frontier.select_columns(["start", "walk"]))
    if not parts:
        return pa.schema(
            [("start", pa.string()), ("walk", pa.string())]
        ).empty_table()
    head, *rest = parts
    return head.union(*rest)
