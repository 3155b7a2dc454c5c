"""Graph analytics: brute-force cross-checks on small random graphs and a
pure-Python replay of the fixed-point PageRank semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fonduer_ray.functions import graph as G


def _edges_ds(pairs, cols=("src", "dst")):
    import ray.data

    df = pd.DataFrame(pairs, columns=list(cols)).astype("int64")
    return ray.data.from_pandas(df).repartition(3)


@pytest.fixture(scope="module")
def directed(ray_session):
    rng = np.random.default_rng(11)
    pairs = {(int(a), int(b))
             for a, b in zip(rng.integers(0, 40, 300), rng.integers(0, 40, 300))
             if a != b}
    return sorted(pairs)


@pytest.fixture(scope="module")
def undirected(ray_session):
    rng = np.random.default_rng(5)
    pairs = {(int(min(a, b)), int(max(a, b)))
             for a, b in zip(rng.integers(0, 30, 200), rng.integers(0, 30, 200))
             if a != b}
    return sorted(pairs)


def test_degrees_brute(directed):
    got = G.degrees(_edges_ds(directed)).to_pandas()
    out: dict[int, int] = {}
    inn: dict[int, int] = {}
    for a, b in directed:
        out[a] = out.get(a, 0) + 1
        inn[b] = inn.get(b, 0) + 1
        out.setdefault(b, 0)
        inn.setdefault(a, 0)
    want = pd.DataFrame(
        {"node": sorted(out), "out_deg": [out[n] for n in sorted(out)],
         "in_deg": [inn[n] for n in sorted(out)]}
    ).astype("int64")
    got = got.sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(got[["node", "out_deg", "in_deg"]], want)


def _pagerank_reference(pairs, iters, scale=G.PR_SCALE):
    """Single-threaded replay of the exact integer semantics."""
    nodes = sorted({n for e in pairs for n in e})
    n = len(nodes)
    outdeg = {v: 0 for v in nodes}
    for a, _ in pairs:
        outdeg[a] += 1
    base = scale // n
    teleport = (15 * base) // 100
    r = {v: base for v in nodes}
    for _ in range(iters):
        share = sum(r[v] for v in nodes if outdeg[v] == 0) // n
        inc = {v: 0 for v in nodes}
        for a, b in pairs:
            inc[b] += r[a] // outdeg[a]
        r = {v: teleport + (85 * (inc[v] + share)) // 100 for v in nodes}
    return r


def test_pagerank_matches_integer_reference(directed):
    got = G.pagerank(_edges_ds(directed), iters=4).to_pandas()
    want = _pagerank_reference(directed, iters=4)
    got_map = dict(zip(got["node"], got["rank"]))
    assert got_map == want


def test_pagerank_paths_bit_identical(directed):
    """The driver-numpy fast path and the all-Dataset scale path produce
    the identical integer rank vector (broadcast_limit=0 forces the
    Dataset path)."""
    fast = G.pagerank(_edges_ds(directed), iters=3).to_pandas()
    slow = G.pagerank(_edges_ds(directed), iters=3, broadcast_limit=0).to_pandas()
    fm = dict(zip(fast["node"], fast["rank"]))
    sm = dict(zip(slow["node"], slow["rank"]))
    assert fm == sm


def test_pagerank_mass_approximately_conserved(directed):
    got = G.pagerank(_edges_ds(directed), iters=3).to_pandas()
    total = int(got["rank"].sum())
    # quantization drops < 1 unit per node per division per iteration
    assert abs(total - G.PR_SCALE) < G.PR_SCALE * 0.01


def test_triangles_brute(undirected):
    got = G.triangle_counts(_edges_ds(undirected, cols=("a", "b"))).to_pandas()
    eset = set(undirected)
    nodes = sorted({n for e in undirected for n in e})
    want: dict[int, int] = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in eset:
                continue
            for c in nodes:
                if c > b and (a, c) in eset and (b, c) in eset:
                    for v in (a, b, c):
                        want[v] = want.get(v, 0) + 1
    got_map = dict(zip(got["node"], got["n_triangles"]))
    assert got_map == want


def test_triangle_wedges_degree_bounded_on_star():
    # hub node 0 with 400 leaves: lowest-ID orientation would wedge
    # O(N^2)=79800 pairs at the hub; degree orientation points every edge
    # leaf->hub, so NO node has 2 out-edges and zero wedges are generated
    star = [(0, i) for i in range(1, 401)]
    wedges = G._oriented_wedges(_edges_ds(star, cols=("a", "b")))
    assert wedges.count() == 0
    assert G.triangle_counts(_edges_ds(star, cols=("a", "b"))).count() == 0


def test_triangles_on_hub_with_closures():
    # hub 0 + leaves 1..50, plus a few leaf-leaf closing edges: each
    # closing edge (i, j) forms exactly one triangle (0, i, j)
    edges = [(0, i) for i in range(1, 51)] + [(1, 2), (3, 4), (5, 6)]
    got = G.triangle_counts(_edges_ds(edges, cols=("a", "b"))).to_pandas()
    got_map = dict(zip(got["node"], got["n_triangles"]))
    assert got_map == {0: 3, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}
    # degree orientation keeps wedge fanout linear: the only wedges come
    # from degree<=3 leaf apexes, never the hub's C(50,2)
    n_wedges = G._oriented_wedges(_edges_ds(edges, cols=("a", "b"))).count()
    assert n_wedges <= len(edges)


def test_oriented_wedges_broadcast_and_join_paths_equal():
    edges = [(0, i) for i in range(1, 20)] + [(1, 2), (3, 4), (2, 3)]
    fast = (
        G._oriented_wedges(_edges_ds(edges, cols=("a", "b")))
        .to_pandas()
        .sort_values(["apex", "wa", "wb"], ignore_index=True)
    )
    # broadcast_limit=0 forces the endpoint-exploded join path
    joined = (
        G._oriented_wedges(_edges_ds(edges, cols=("a", "b")), broadcast_limit=0)
        .to_pandas()
        .sort_values(["apex", "wa", "wb"], ignore_index=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(fast, joined)
    assert len(fast) > 0


def test_components_brute(undirected):
    got = G.components(_edges_ds(undirected, cols=("a", "b"))).to_pandas()
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in undirected:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({n for e in undirected for n in e})
    want = {n: find(n) for n in nodes}
    got_map = dict(zip(got["node"], got["component"]))
    assert got_map == want


def test_khop_paths_identical(directed):
    seed = min(n for e in directed for n in e)
    fast = G.khop(_edges_ds(directed), seeds=[seed], k=2).to_pandas()
    slow = G.khop(
        _edges_ds(directed), seeds=[seed], k=2, broadcast_limit=0
    ).to_pandas()
    assert dict(zip(fast["node"], fast["dist"])) == dict(
        zip(slow["node"], slow["dist"])
    )


def test_khop_brute(directed):
    k = 3
    seed = min(n for e in directed for n in e)
    got = G.khop(_edges_ds(directed), seeds=[seed], k=k).to_pandas()
    adj: dict[int, set] = {}
    for a, b in directed:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {seed: 0}
    frontier = [seed]
    for d in range(1, k + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    got_map = dict(zip(got["node"], got["dist"]))
    assert got_map == dist


def test_part_cooccur_edges_sampled_and_canonical(ray_session):
    df = G.part_cooccur_edges("/root/testdata/sf0.001").to_pandas()
    assert (df["a"] < df["b"]).all()
    assert not df.duplicated(["a", "b"]).any()
    from fonduer_ray.functions.dedup import _md5_64

    assert all(
        _md5_64(f"{a}:{b}") % 8 == 0 for a, b in zip(df["a"], df["b"])
    )


def _ppr_reference(pairs, pred, iters, scale=G.PR_SCALE):
    """Single-threaded replay of personalized_pagerank's exact integer
    semantics (teleport + dangling mass paid only to the source set)."""
    nodes = sorted({n for e in pairs for n in e})
    outdeg = {v: 0 for v in nodes}
    for a, _ in pairs:
        outdeg[a] += 1
    src = {v for v in nodes if pred(v)}
    s = len(src)
    base = scale // s
    teleport = (15 * base) // 100
    r = {v: (base if v in src else 0) for v in nodes}
    for _ in range(iters):
        share = sum(r[v] for v in nodes if outdeg[v] == 0) // s
        inc = {v: 0 for v in nodes}
        for a, b in pairs:
            inc[b] += r[a] // outdeg[a]
        r = {
            v: (teleport if v in src else 0)
            + (85 * (inc[v] + (share if v in src else 0))) // 100
            for v in nodes
        }
    return r


def test_personalized_pagerank_matches_integer_reference(directed):
    import numpy as np

    pred_np = lambda a: a % 2 == 0  # noqa: E731
    got = G.personalized_pagerank(
        _edges_ds(directed), source_pred=pred_np, iters=4
    ).to_pandas()
    want = _ppr_reference(directed, lambda v: v % 2 == 0, iters=4)
    assert dict(zip(got["node"], got["rank"])) == want
    # off-source nodes with no in-links hold zero rank; sources hold mass
    assert any(v > 0 for v in want.values())


def test_personalized_pagerank_paths_bit_identical(directed):
    pred = lambda a: a % 2 == 0  # noqa: E731
    fast = G.personalized_pagerank(
        _edges_ds(directed), source_pred=pred, iters=3
    ).to_pandas()
    slow = G.personalized_pagerank(
        _edges_ds(directed), source_pred=pred, iters=3, broadcast_limit=0
    ).to_pandas()
    assert dict(zip(fast["node"], fast["rank"])) == dict(
        zip(slow["node"], slow["rank"])
    )


def test_personalized_pagerank_empty_source_set(directed):
    out = G.personalized_pagerank(
        _edges_ds(directed), source_pred=lambda a: a < -1, iters=2
    ).take_all()
    assert out == []


def _hits_reference(pairs, iters, scale=G.HITS_SCALE):
    """Single-threaded replay of the exact integer HITS semantics."""
    nodes = sorted({n for e in pairs for n in e})
    h = {v: scale for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        a_raw = {v: 0 for v in nodes}
        for u, v in pairs:
            a_raw[v] += h[u]
        d = max(1, sum(a_raw.values()) // scale)
        a = {v: a_raw[v] // d for v in nodes}
        h_raw = {v: 0 for v in nodes}
        for u, v in pairs:
            h_raw[u] += a[v]
        d = max(1, sum(h_raw.values()) // scale)
        h = {v: h_raw[v] // d for v in nodes}
    return h, a


def test_hits_matches_integer_reference(directed):
    got = G.hits(_edges_ds(directed), iters=3).to_pandas()
    want_h, want_a = _hits_reference(directed, iters=3)
    assert dict(zip(got["node"], got["hub"])) == want_h
    assert dict(zip(got["node"], got["authority"])) == want_a


def test_hits_paths_bit_identical(directed):
    """Driver-numpy fast path == all-Dataset scale path (broadcast_limit=0
    forces the attach_lookup/hash_groupby path), bit for bit."""
    fast = G.hits(_edges_ds(directed), iters=2).to_pandas()
    slow = G.hits(_edges_ds(directed), iters=2, broadcast_limit=0).to_pandas()
    fm = {r.node: (r.hub, r.authority) for r in fast.itertuples()}
    sm = {r.node: (r.hub, r.authority) for r in slow.itertuples()}
    assert fm == sm


def test_hits_bipartite_roles():
    """On a pure bipartite graph, left nodes get zero authority and right
    nodes zero hub score; the biggest in-degree node is the top authority."""
    pairs = [(1, 10), (2, 10), (3, 10), (1, 11), (2, 12)]
    got = G.hits(_edges_ds(pairs), iters=3).to_pandas()
    m = {r.node: (r.hub, r.authority) for r in got.itertuples()}
    assert all(m[n][1] == 0 for n in (1, 2, 3))
    assert all(m[n][0] == 0 for n in (10, 11, 12))
    assert max((m[n][1], n) for n in (10, 11, 12))[1] == 10


# ------------------------------------------------------------------- k-core


def _peel_core_numbers(pairs):
    """Brute-force coreness: repeatedly remove the min-degree node."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core: dict[int, int] = {}
    k = 0
    live = dict(adj)
    while live:
        v = min(live, key=lambda n: (len(live[n]), n))
        k = max(k, len(live[v]))
        core[v] = k
        for u in live[v]:
            live[u].discard(v)
        del live[v]
    return core


def test_kcore_converges_to_peel(undirected):
    # enough iterations to hit the fixpoint on a 30-node graph
    got = (
        G.kcore(_edges_ds(undirected, cols=("a", "b")), iters=30)
        .to_pandas()
        .set_index("node")["coreness"]
        .to_dict()
    )
    assert got == _peel_core_numbers(undirected)


def test_kcore_first_iterate_is_hindex_of_degrees(undirected):
    deg: dict[int, int] = {}
    adj: dict[int, set[int]] = {}
    for a, b in undirected:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(ns) for n, ns in adj.items()}

    def hindex(vals):
        vals = sorted(vals, reverse=True)
        return max(min(i + 1, v) for i, v in enumerate(vals))

    want = {n: hindex([deg[u] for u in ns]) for n, ns in adj.items()}
    got = (
        G.kcore(_edges_ds(undirected, cols=("a", "b")), iters=1)
        .to_pandas()
        .set_index("node")["coreness"]
        .to_dict()
    )
    assert got == want


def test_kcore_paths_bit_identical(undirected):
    ds = _edges_ds(undirected, cols=("a", "b"))
    fast = G.kcore(ds, iters=3).to_pandas().sort_values("node", ignore_index=True)
    slow = G.kcore(ds, iters=3, broadcast_limit=0).to_pandas().sort_values(
        "node", ignore_index=True
    )
    pd.testing.assert_frame_equal(fast, slow)


def test_kcore_star_is_one_core():
    # star K_{1,n}: every node has coreness 1
    pairs = [(0, i) for i in range(1, 12)]
    got = (
        G.kcore(_edges_ds(pairs, cols=("a", "b")), iters=10)
        .to_pandas()["coreness"]
        .unique()
        .tolist()
    )
    assert got == [1]


# -------------------------------------------------- clustering / assortativity


def test_local_clustering_brute(undirected):
    got = (
        G.local_clustering(_edges_ds(undirected, cols=("a", "b")))
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    adj: dict[int, set[int]] = {}
    for a, b in undirected:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for n in sorted(adj):
        ns = adj[n]
        tri = sum(
            1
            for u in ns
            for v in ns
            if u < v and v in adj[u]
        )
        d = len(ns)
        rows.append((n, tri, d * (d - 1) // 2))
    want = pd.DataFrame(rows, columns=["node", "n_triangles", "n_wedges"]).astype(
        "int64"
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want)


def test_assortativity_terms_brute(undirected):
    got = G.assortativity_terms(_edges_ds(undirected, cols=("a", "b"))).to_pandas()
    deg: dict[int, int] = {}
    for a, b in undirected:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(undirected)
    sp = sum(deg[a] * deg[b] for a, b in undirected)
    ss = sum(deg[a] + deg[b] for a, b in undirected)
    sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in undirected)
    assert got.iloc[0].to_dict() == {
        "m": m, "sum_prod": sp, "sum_sum": ss, "sum_sq": sq
    }


def test_assortativity_paths_bit_identical(undirected):
    ds = _edges_ds(undirected, cols=("a", "b"))
    fast = G.assortativity_terms(ds).to_pandas()
    slow = G.assortativity_terms(ds, broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(fast, slow)


# ---------------------------------------------------------- weighted pagerank


@pytest.fixture(scope="module")
def weighted(ray_session):
    rng = np.random.default_rng(23)
    pairs = {}
    for a, b in zip(rng.integers(0, 30, 250), rng.integers(0, 30, 250)):
        if a != b:
            k = (int(a), int(b))
            pairs[k] = pairs.get(k, 0) + 1
    return sorted((a, b, w) for (a, b), w in pairs.items())


def _wpr_reference(triples, iters, scale=G.PR_SCALE):
    nodes = sorted({a for a, _, _ in triples} | {b for _, b, _ in triples})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    wout = [0] * n
    for a, _, w in triples:
        wout[idx[a]] += w
    base = scale // n
    r = [base] * n
    tp = (15 * base) // 100
    for _ in range(iters):
        share = sum(r[i] for i in range(n) if wout[i] == 0) // n
        inc = [0] * n
        for a, b, w in triples:
            if wout[idx[a]] > 0:
                inc[idx[b]] += (r[idx[a]] * w) // wout[idx[a]]
        r = [tp + (85 * (inc[i] + share)) // 100 for i in range(n)]
    return dict(zip(nodes, r))


def test_wpagerank_matches_integer_reference(weighted):
    ds = _edges_ds(weighted, cols=("src", "dst", "w"))
    got = (
        G.pagerank_weighted(ds, iters=4)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    assert got == _wpr_reference(weighted, iters=4)


def test_wpagerank_paths_bit_identical(weighted):
    ds = _edges_ds(weighted, cols=("src", "dst", "w"))
    fast = G.pagerank_weighted(ds, iters=3).to_pandas().sort_values(
        "node", ignore_index=True
    )
    slow = G.pagerank_weighted(ds, iters=3, broadcast_limit=0).to_pandas(
    ).sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_wpagerank_unit_weights_equal_plain_pagerank(weighted):
    # with w == 1 everywhere the weighted recurrence IS plain pagerank
    uniq = sorted({(a, b) for a, b, _ in weighted})
    unit = [(a, b, 1) for a, b in uniq]
    got = (
        G.pagerank_weighted(_edges_ds(unit, cols=("src", "dst", "w")), iters=3)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    plain = (
        G.pagerank(_edges_ds(uniq, cols=("src", "dst")), iters=3)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, plain)
