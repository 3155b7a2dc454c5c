"""KB-reasoning operators over a canonical triple table.

The engine's KG path ends in a deduplicated ``(subj, pred, obj, support)``
table (``pipelines/docops.triples``); a KB-construction loop then *reasons*
over that table to decide what to promote and what to send back for
re-extraction.  This module holds the reasoning stages, each expressed over
a ``ray.data.Dataset`` of triples so it composes with any upstream
extraction — the distributed analog of the reference's promotion step on
top of candidate marginals (/root/reference/src/fonduer/candidates/
candidates.py apply/threshold flow), extended with the path-based KB
completion signal from the Path-Ranking-Algorithm literature (Lao & Cohen
2010): entity pairs connected by strong 2-hop paths but no direct edge are
the highest-value extraction targets.

Scale notes: the triple table is 100-1000x smaller than the corpus, but a
KB at 100 TB corpus scale can still hold billions of triples — so the
bridge join is a guarded broadcast-vs-hash-partition switch (the
``attach_lookup`` convention), the (subj, obj) aggregation is one
``hash_groupby``, and nothing driver-sized materializes on the join path.
"""

from __future__ import annotations

import pyarrow as pa

import ray

#: triples at or below this count broadcast the adjacency / pair set once
#: via ``ray.put``; above it both sides hash-partition through
#: ``Dataset.join`` (same convention as relational.BROADCAST_ROW_LIMIT)
KB_BROADCAST_LIMIT = 2_000_000


def two_hop_paths(
    triples: "ray.data.Dataset",
    broadcast_limit: int = KB_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """2-hop path inference — KB-completion candidates.

    For every ordered entity pair ``(subj, obj)``, ``subj != obj``,
    connected through at least one bridge entity ``b`` with triples
    ``(subj, b, s1)`` and ``(b, obj, s2)``, emit:

    - ``path_mass`` — ``sum(s1 * s2)`` over all bridges (the unnormalized
      2-step random-walk mass; exact integers, bit-identical to the SQL
      oracle),
    - ``n_paths`` — the number of distinct bridges,
    - ``direct`` — 1 if a direct ``(subj, obj)`` triple already exists,
      else 0.  High ``path_mass`` with ``direct = 0`` is the classic
      completion-candidate set.

    Input must be unique on ``(subj, obj)`` (the canonical table is — it
    is grouped there), so ``n_paths`` counts bridges exactly.

    Strategy: at or below ``broadcast_limit`` rows the out-adjacency
    ``bridge -> [(obj, s2), ...]`` and the direct-pair set ship ONCE via
    ``ray.put`` and the expansion runs inside ``map_batches`` — no shuffle.
    Above it, the bridge join and the direct-flag attach both run as
    hash-partitioned ``Dataset.join``s; the two paths are bit-identical
    (tests force the join path with a lowered limit).

    Columns ``(subj, obj, path_mass, n_paths, direct)``, ordered by
    (path_mass desc, subj, obj).
    """
    from fonduer_ray.stages.util import get_broadcast, hash_groupby, join_partitions

    t = triples.select_columns(["subj", "obj", "support"])
    n = t.count()

    if n <= broadcast_limit:
        adj: dict = {}
        pairs = set()
        for batch in t.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for s, o, w in zip(
                batch["subj"].to_pylist(),
                batch["obj"].to_pylist(),
                batch["support"].to_pylist(),
            ):
                adj.setdefault(s, []).append((o, w))
                pairs.add((s, o))
        adj_ref = ray.put(adj)
        pairs_ref = ray.put(frozenset(pairs))

        def explode(tbl: pa.Table) -> pa.Table:
            out_adj = get_broadcast(adj_ref)
            xs: list = []
            zs: list = []
            ms: list = []
            for x, b, s1 in zip(
                tbl["subj"].to_pylist(),
                tbl["obj"].to_pylist(),
                tbl["support"].to_pylist(),
            ):
                for z, s2 in out_adj.get(b, ()):
                    if z != x:
                        xs.append(x)
                        zs.append(z)
                        ms.append(s1 * s2)
            return pa.table(
                {
                    "subj": pa.array(xs, pa.string()),
                    "obj": pa.array(zs, pa.string()),
                    "mass": pa.array(ms, pa.int64()),
                }
            )

        paths = t.map_batches(explode, batch_format="pyarrow")
        agg = _sum_paths(paths, hash_groupby, join_safe=False)

        def flag(tbl: pa.Table) -> pa.Table:
            direct_pairs = get_broadcast(pairs_ref)
            direct = [
                1 if (s, o) in direct_pairs else 0
                for s, o in zip(tbl["subj"].to_pylist(), tbl["obj"].to_pylist())
            ]
            return tbl.append_column("direct", pa.array(direct, pa.int64()))

        flagged = agg.map_batches(flag, batch_format="pyarrow")
    else:
        n_parts = join_partitions()
        right = t.map_batches(
            lambda tb: tb.rename_columns(["_bridge", "_z", "_s2"]),
            batch_format="pyarrow",
        )
        joined = t.join(
            right,
            "inner",
            num_partitions=n_parts,
            on=("obj",),
            right_on=("_bridge",),
        )

        def product(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.invert(pc.equal(tbl["_z"], tbl["subj"]))
            kept = tbl.filter(keep)
            return pa.table(
                {
                    "subj": kept["subj"],
                    "obj": kept["_z"],
                    "mass": pc.multiply(kept["support"], kept["_s2"]),
                }
            )

        paths = joined.map_batches(product, batch_format="pyarrow")
        agg = _sum_paths(paths, hash_groupby, join_safe=True)
        direct_tbl = t.map_batches(
            lambda tb: pa.table(
                {
                    "_ds": tb["subj"],
                    "_do": tb["obj"],
                    "_direct": pa.array([1] * tb.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).repartition(n_parts)
        out = agg.join(
            direct_tbl,
            "left_outer",
            num_partitions=n_parts,
            on=("subj", "obj"),
            right_on=("_ds", "_do"),
        )

        def finish(tbl: pa.Table) -> pa.Table:
            direct = [
                1 if d is not None else 0 for d in tbl["_direct"].to_pylist()
            ]
            return pa.table(
                {
                    "subj": tbl["subj"],
                    "obj": tbl["obj"],
                    "path_mass": tbl["path_mass"],
                    "n_paths": tbl["n_paths"],
                    "direct": pa.array(direct, pa.int64()),
                }
            )

        flagged = out.map_batches(finish, batch_format="pyarrow")

    return flagged.sort(
        ["path_mass", "subj", "obj"], descending=[True, False, False]
    )


def _sum_paths(paths, hash_groupby, join_safe: bool):
    """One (subj, obj)-keyed aggregation of per-bridge partial products."""

    def agg(df):
        g = (
            df.groupby(["subj", "obj"], sort=False)["mass"]
            .agg(["sum", "size"])
            .reset_index()
        )
        g.columns = ["subj", "obj", "path_mass", "n_paths"]
        return g

    return hash_groupby(paths, ["subj", "obj"], agg, join_safe=join_safe)


def shared_object_pairs(
    triples: "ray.data.Dataset",
    broadcast_limit: int = KB_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """PRA inverse-forward 2-hop inference: subject pairs sharing objects.

    On a bipartite KB (disjoint subject/object vocabularies — the engine's
    ``cooccurs`` table is one) the only non-empty length-2 path type is
    ``(r, r^-1)``: ``subj_a -> b <- subj_b``.  Its aggregate is the classic
    distributional-similarity signal KB construction uses for entity
    resolution and type induction (Lao & Cohen 2010 path features; NELL's
    coupled sibling evidence).  For every unordered subject pair
    ``subj_a < subj_b`` sharing at least one object ``b``:

    - ``path_mass`` — ``sum_b s(subj_a, b) * s(subj_b, b)`` (exact ints),
    - ``n_shared`` — the number of distinct shared objects.

    Strategy mirrors :func:`two_hop_paths`: at or below ``broadcast_limit``
    the inverse adjacency ``obj -> [(subj, s)]`` ships once and pair
    generation runs inside ``map_batches``; above it a self
    ``Dataset.join`` on ``obj`` hash-partitions both sides.  Pair
    generation is per-object O(fan-in^2) — same partitioning assumption as
    the LSH band-bucket pair generator (``functions/dedup.py``): object
    fan-in is bounded (cap hot objects upstream if a corpus violates it).

    Columns ``(subj_a, subj_b, path_mass, n_shared)``, ordered by
    (path_mass desc, subj_a, subj_b).
    """
    from fonduer_ray.stages.util import get_broadcast, hash_groupby, join_partitions

    t = triples.select_columns(["subj", "obj", "support"])
    n = t.count()

    if n <= broadcast_limit:
        inv: dict = {}
        for batch in t.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for s, o, w in zip(
                batch["subj"].to_pylist(),
                batch["obj"].to_pylist(),
                batch["support"].to_pylist(),
            ):
                inv.setdefault(o, []).append((s, w))
        inv_ref = ray.put(inv)

        def explode(tbl: pa.Table) -> pa.Table:
            inv_adj = get_broadcast(inv_ref)
            aa: list = []
            bb: list = []
            ms: list = []
            for x, b, s1 in zip(
                tbl["subj"].to_pylist(),
                tbl["obj"].to_pylist(),
                tbl["support"].to_pylist(),
            ):
                for z, s2 in inv_adj.get(b, ()):
                    if x < z:
                        aa.append(x)
                        bb.append(z)
                        ms.append(s1 * s2)
            return pa.table(
                {
                    "subj_a": pa.array(aa, pa.string()),
                    "subj_b": pa.array(bb, pa.string()),
                    "mass": pa.array(ms, pa.int64()),
                }
            )

        pairs = t.map_batches(explode, batch_format="pyarrow")
    else:
        n_parts = join_partitions()
        right = t.map_batches(
            lambda tb: tb.rename_columns(["_sb", "_ob", "_s2"]),
            batch_format="pyarrow",
        )
        joined = t.join(
            right,
            "inner",
            num_partitions=n_parts,
            on=("obj",),
            right_on=("_ob",),
        )

        def product(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.less(tbl["subj"], tbl["_sb"])
            kept = tbl.filter(keep)
            return pa.table(
                {
                    "subj_a": kept["subj"],
                    "subj_b": kept["_sb"],
                    "mass": pc.multiply(kept["support"], kept["_s2"]),
                }
            )

        pairs = joined.map_batches(product, batch_format="pyarrow")

    def agg(df):
        g = (
            df.groupby(["subj_a", "subj_b"], sort=False)["mass"]
            .agg(["sum", "size"])
            .reset_index()
        )
        g.columns = ["subj_a", "subj_b", "path_mass", "n_shared"]
        return g

    out = hash_groupby(pairs, ["subj_a", "subj_b"], agg)
    return out.sort(
        ["path_mass", "subj_a", "subj_b"], descending=[True, False, False]
    )


def predicate_stats(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """PARIS-style predicate profile: functionality and inverse
    functionality per predicate (Suchanek, Abiteboul & Senellart, PARIS,
    VLDB 2012 §4) — the statistic every KB-alignment / constraint-mining
    loop computes first.  For a deduplicated ``(subj, pred, obj,
    support)`` table, per ``pred``:

    - ``n_triples`` — distinct (subj, obj) pairs (the table is already
      canonical, so a plain count),
    - ``n_subj`` / ``n_obj`` — distinct subjects / objects,
    - ``support_total`` — instance mass behind the predicate,
    - ``func_bp = n_subj * 10000 // n_triples`` — 10000 means every
      subject has exactly one object (a functional predicate; a KB would
      flag multi-object subjects as constraint violations),
    - ``inv_func_bp = n_obj * 10000 // n_triples`` — the inverse.

    Exact integer basis points (the repo-wide convention), bit-identical
    to the SQL oracle.

    Scale shape: two distinct-pair reductions, each ONE ``hash_groupby``
    on a (pred, entity) key — so the heavy distinct runs partitioned by
    entity, never collapsing onto the (few, highly skewed) predicate
    keys — followed by per-block partial counts and a driver merge of
    the partials, each bounded by (#preds x #blocks) (predicate
    vocabularies are tens to thousands at web scale — the percentile
    operators' bounded-partial-merge convention). Columns ``(pred, n_triples, n_subj,
    n_obj, support_total, func_bp, inv_func_bp)``, ordered by pred."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def distinct_count(col: str) -> "ray.data.Dataset":
        # distinct (pred, col) pairs, partitioned by the PAIR key (no
        # predicate-key hotspot), then per-block partial counts per pred
        pairs = hash_groupby(
            triples.select_columns(["pred", col]),
            ["pred", col],
            lambda df, c=col: df.drop_duplicates(["pred", c]),
            join_safe=True,
        )

        def partial(t: pa.Table, name: str = f"n_{col}") -> pa.Table:
            import pyarrow.compute as pc

            vc = pc.value_counts(t["pred"])
            return pa.table(
                {
                    "pred": vc.field("values"),
                    name: pc.cast(vc.field("counts"), pa.int64()),
                }
            )

        return pairs.map_batches(partial, batch_format="pyarrow")

    def totals(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = pa.table(
            {"pred": t["pred"], "support": t["support"]}
        ).group_by("pred").aggregate([("support", "sum"), ("support", "count")])
        return pa.table(
            {
                "pred": g["pred"],
                "n_triples": pc.cast(g["support_count"], pa.int64()),
                "support_total": pc.cast(g["support_sum"], pa.int64()),
            }
        )

    tot = triples.select_columns(["pred", "support"]).map_batches(
        totals, batch_format="pyarrow"
    )
    ns = distinct_count("subj")
    no = distinct_count("obj")

    def finish(dfs: list[pd.DataFrame]) -> pd.DataFrame:
        t, s, o = dfs
        out = (
            t.groupby("pred", sort=True)[["n_triples", "support_total"]]
            .sum()
            .join(s.groupby("pred")["n_subj"].sum())
            .join(o.groupby("pred")["n_obj"].sum())
            .reset_index()
        )
        out["func_bp"] = (out["n_subj"] * 10000 // out["n_triples"]).astype(
            "int64"
        )
        out["inv_func_bp"] = (
            out["n_obj"] * 10000 // out["n_triples"]
        ).astype("int64")
        return out.astype(
            {c: "int64" for c in out.columns if c != "pred"}
        )

    # all three partial tables are bounded by (#preds x #blocks); the
    # merge is a single-block pandas finish
    parts = [d.to_pandas() for d in (tot, ns, no)]
    merged = finish(parts)
    return ray.data.from_pandas(merged)


#: rule mining crosses over to the hash-join plan far earlier than the
#: lookup ops: its broadcast path ships TWO python structures (adjacency +
#: fact index) and expands bodies in python loops, while the join path is
#: all acero/pandas kernels — measured 79s (broadcast) vs 7.4s (join) on a
#: 781k-triple KB at 32 cpus
RULE_BROADCAST_LIMIT = 50_000


def rule_mining(
    triples: "ray.data.Dataset",
    broadcast_limit: int = RULE_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """AMIE-style 2-hop horn-rule mining (Galárraga et al., WWW 2013):
    for every predicate pair ``(p, q)`` whose composition has at least one
    grounding, and every head predicate ``r`` with at least one correct
    prediction, emit the rule ``p(x,y) ∧ q(y,z) ⇒ r(x,z)`` with

    - ``support`` — distinct ``(x, z)`` groundings of the body,
    - ``n_correct`` — body groundings already present as ``r(x, z)``,
    - ``conf_bp`` — standard confidence ``n_correct * 10000 // support``
      (exact integer basis points).

    Rules with ``n_correct = 0`` are suppressed (AMIE's head-coverage
    pruning); bodies with no matching head never surface.

    Strategy: at or below ``broadcast_limit`` triples, the out-adjacency
    ``y -> [(q, z)]`` and the fact index ``(x, z) -> {r}`` ship ONCE via
    ``ray.put`` and the body expansion + head check run inside
    ``map_batches``; above it, both the bridge join and the head join run
    as hash-partitioned ``Dataset.join``s (bit-identical — tests force the
    join path). Either way the distinct-grounding dedup is ONE
    ``(x, z)``-keyed hash exchange and the final per-rule aggregate is
    tiny (bounded by |preds|^3). Columns
    ``(body_p, body_q, head_r, support, n_correct, conf_bp)``, ordered.
    """
    import pandas as pd

    from fonduer_ray.stages.util import (
        get_broadcast,
        hash_groupby,
        join_partitions,
    )

    # pinned: the table is consumed three times (count, index build /
    # join sides, body expansion) — without pinning the upstream plan
    # re-executes per consumer
    t = triples.select_columns(["subj", "pred", "obj"]).materialize()
    n = t.count()

    if n <= broadcast_limit:
        adj: dict = {}
        facts: dict = {}
        for batch in t.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for s, p, o in zip(
                batch["subj"].to_pylist(),
                batch["pred"].to_pylist(),
                batch["obj"].to_pylist(),
            ):
                adj.setdefault(s, []).append((p, o))
                facts.setdefault((s, o), []).append(p)
        adj_ref = ray.put(adj)
        facts_ref = ray.put(facts)

        def explode(tbl: pa.Table) -> pa.Table:
            out_adj = get_broadcast(adj_ref)
            ps, qs, xs, zs = [], [], [], []
            for x, p, y in zip(
                tbl["subj"].to_pylist(),
                tbl["pred"].to_pylist(),
                tbl["obj"].to_pylist(),
            ):
                for q, z in out_adj.get(y, ()):
                    ps.append(p)
                    qs.append(q)
                    xs.append(x)
                    zs.append(z)
            return pa.table(
                {
                    "body_p": pa.array(ps, pa.string()),
                    "body_q": pa.array(qs, pa.string()),
                    "x": pa.array(xs, pa.string()),
                    "z": pa.array(zs, pa.string()),
                }
            )

        bodies = t.map_batches(explode, batch_format="pyarrow")

        def dedup_and_check(df: "pd.DataFrame") -> "pd.DataFrame":
            fx = get_broadcast(facts_ref)
            df = df.drop_duplicates(["body_p", "body_q", "x", "z"])
            agg: dict = {}
            for bp, bq, x, z in df.itertuples(index=False):
                key = (bp, bq, "")
                agg[key] = (agg.get(key, (0, 0))[0] + 1, 0)
                for r in fx.get((x, z), ()):
                    k2 = (bp, bq, r)
                    s, h = agg.get(k2, (0, 0))
                    agg[k2] = (s, h + 1)
            rows = [(bp, bq, r, s, h) for (bp, bq, r), (s, h) in agg.items()]
            return pd.DataFrame(
                rows, columns=["body_p", "body_q", "head_r", "sup", "hit"]
            )

        # per-partition aggregation: the exchange carries only
        # |preds|^2-ish rows per partition, never raw groundings
        partials = hash_groupby(bodies, ["x", "z"], dedup_and_check)
    else:
        n_parts = join_partitions()

        def _renamed(names: list[str]):
            def f(tbl: pa.Table, _n=tuple(names)) -> pa.Table:
                return tbl.select(["subj", "pred", "obj"]).rename_columns(
                    list(_n)
                )

            return f

        # rename via an arrow map (Dataset.rename_columns chokes on
        # pandas-backed blocks, e.g. from_pandas test inputs)
        left = t.map_batches(
            _renamed(["x", "body_p", "y"]), batch_format="pyarrow"
        )
        right = t.map_batches(
            _renamed(["y2", "body_q", "z"]), batch_format="pyarrow"
        )
        bodies = left.join(
            right,
            "inner",
            num_partitions=n_parts,
            on=("y",),
            right_on=("y2",),
        ).select_columns(["body_p", "body_q", "x", "z"])

        distinct = hash_groupby(
            bodies,
            ["x", "z"],
            lambda df: df.drop_duplicates(["body_p", "body_q", "x", "z"]),
            join_safe=True,
        )
        heads = t.map_batches(
            _renamed(["hx", "head_r", "hz"]), batch_format="pyarrow"
        )
        joined = distinct.join(
            heads,
            "left_outer",
            num_partitions=n_parts,
            on=("x", "z"),
            right_on=("hx", "hz"),
        )

        # support counts each distinct (x, z) grounding ONCE — derived from
        # `distinct` directly (a pair with K matching heads would otherwise
        # appear K times in the outer join); hits come from matched rows.
        # Both pre-aggregate per batch so the tail exchanges rule-sized
        # rows only.
        def sup_agg(df: "pd.DataFrame") -> "pd.DataFrame":
            out = (
                df.groupby(["body_p", "body_q"], sort=False)
                .size()
                .rename("sup")
                .reset_index()
            )
            out["head_r"] = ""
            out["hit"] = 0
            return out[["body_p", "body_q", "head_r", "sup", "hit"]]

        def hit_agg(df: "pd.DataFrame") -> "pd.DataFrame":
            df = df[df["head_r"].notna()]
            out = (
                df.groupby(["body_p", "body_q", "head_r"], sort=False)
                .size()
                .rename("hit")
                .reset_index()
            )
            out["sup"] = 0
            return out[["body_p", "body_q", "head_r", "sup", "hit"]]

        sup_rows = distinct.map_batches(
            sup_agg, batch_format="pandas", batch_size=None
        )
        hit_rows = joined.map_batches(
            hit_agg, batch_format="pandas", batch_size=None
        )
        partials = sup_rows.union(hit_rows)

    # final per-rule aggregate: |preds|^2 support rows + |preds|^3 hit rows
    sup_by: dict = {}
    hit_by: dict = {}
    for b in partials.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for bp, bq, r, s, h in zip(
            b["body_p"].to_pylist(),
            b["body_q"].to_pylist(),
            b["head_r"].to_pylist(),
            b["sup"].to_pylist(),
            b["hit"].to_pylist(),
        ):
            if s:
                sup_by[(bp, bq)] = sup_by.get((bp, bq), 0) + s
            if h:
                hit_by[(bp, bq, r)] = hit_by.get((bp, bq, r), 0) + h

    keys = sorted(hit_by)
    return pa.table(
        {
            "body_p": pa.array([k[0] for k in keys], pa.string()),
            "body_q": pa.array([k[1] for k in keys], pa.string()),
            "head_r": pa.array([k[2] for k in keys], pa.string()),
            "support": pa.array(
                [sup_by[(k[0], k[1])] for k in keys], pa.int64()
            ),
            "n_correct": pa.array([hit_by[k] for k in keys], pa.int64()),
            "conf_bp": pa.array(
                [hit_by[k] * 10000 // sup_by[(k[0], k[1])] for k in keys],
                pa.int64(),
            ),
        }
    )
