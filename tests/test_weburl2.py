"""Anchor-alias aggregation and redirect resolution (functions/weburl.py)."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from fonduer_ray.functions.weburl import anchor_aliases, resolve_redirects


def _links(targets, anchors):
    return ray.data.from_arrow(
        pa.table(
            {
                "canonical_url": pa.array(targets, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        )
    )


def test_anchor_aliases_mode_ties_and_whitespace(ray_session):
    ds = _links(
        ["u1", "u1", "u1", "u1", "u2", "u2", "u3"],
        ["  Apple  Inc ", "apple", "Apple Inc", "apple", "b", "a", ""],
    )
    rows = {r["target"]: r for r in anchor_aliases(ds).take_all()}
    # u1: "Apple Inc" (squeezed) x2 vs "apple" x2 — bytewise tie-break
    # picks "Apple Inc" ('A' < 'a')
    assert rows["u1"]["n_mentions"] == 4
    assert rows["u1"]["n_aliases"] == 2
    assert rows["u1"]["top_anchor"] == "Apple Inc"
    # u2: singleton counts, tie broken ascending
    assert rows["u2"]["top_anchor"] == "a"
    # u3: its only anchor is empty -> target dropped entirely
    assert "u3" not in rows


def test_anchor_aliases_matches_bruteforce(ray_session):
    import collections

    targets, anchors = [], []
    for i in range(400):
        targets.append(f"t{i % 23}")
        anchors.append(f"name{(i * 7) % 5}")
    counts: dict = collections.defaultdict(collections.Counter)
    for t, a in zip(targets, anchors):
        counts[t][a] += 1
    rows = {r["target"]: r for r in anchor_aliases(_links(targets, anchors)).take_all()}
    assert set(rows) == set(counts)
    for t, c in counts.items():
        assert rows[t]["n_mentions"] == sum(c.values())
        assert rows[t]["n_aliases"] == len(c)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert rows[t]["top_anchor"] == best


def test_extract_page_meta_first_wins_squeeze_and_nulls(ray_session):
    from fonduer_ray.functions.weburl import extract_page_meta

    html = (
        b'<html LANG="EN-us"><head>'
        b"<title> A  \n B </title><title>second</title>"
        b'<meta name="DESCRIPTION" content="d  1">'
        b'<meta property="og:title" content="OT">'
        b'<link rel="canonical" href="HTTPS://Ex.COM:443/p/?utm_source=x">'
        b'<link rel="stylesheet" href="/css">'
        b"</head><body>x</body></html>"
    )
    bare = b"<html><body>no head</body></html>"
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["p1", "p2"], pa.string()),
                "html": pa.array([html, bare], pa.binary()),
            }
        )
    )
    rows = {r["url"]: r for r in extract_page_meta(ds).take_all()}
    r = rows["p1"]
    assert r["title"] == "A B"  # squeezed, first wins
    assert r["description"] == "d 1"  # case-insensitive name, squeezed
    assert r["og_title"] == "OT"
    assert r["og_type"] is None
    assert r["canonical"] == "https://ex.com/p"  # canonicalized
    assert r["lang"] == "en-us"
    r2 = rows["p2"]
    assert all(
        r2[k] is None
        for k in ("title", "description", "canonical", "og_title",
                  "og_type", "lang")
    )


def test_parse_sitemaps_urlset_index_and_edge_cases(ray_session):
    from fonduer_ray.functions.weburl import parse_sitemaps

    urlset = (
        b'<?xml version="1.0" encoding="UTF-8"?>'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>  https://ex.com/a  </loc><lastmod>2026-01-02</lastmod>"
        b"<changefreq>daily</changefreq><priority>0.8</priority></url>"
        b"<url><loc>https://ex.com/b</loc></url>"
        b"<url><lastmod>2026-01-03</lastmod></url>"  # no loc -> dropped
        b"</urlset>"
    )
    index = (
        b"<sitemapindex><sitemap><loc>https://ex.com/s1.xml</loc>"
        b"<lastmod>2026-02-01</lastmod></sitemap></sitemapindex>"
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["m1", "m2"], pa.string()),
                "xml": pa.array([urlset, index], pa.binary()),
            }
        )
    )
    rows = sorted(
        parse_sitemaps(ds).take_all(),
        key=lambda r: (r["sitemap_url"], r["pos"]),
    )
    assert [(r["sitemap_url"], r["kind"], r["pos"], r["loc"]) for r in rows] == [
        ("m1", "url", 1, "https://ex.com/a"),
        ("m1", "url", 2, "https://ex.com/b"),
        ("m2", "sitemap", 1, "https://ex.com/s1.xml"),
    ]
    assert rows[0]["lastmod"] == "2026-01-02"
    assert rows[0]["changefreq"] == "daily"
    assert rows[0]["priority"] == "0.8"
    # optional fields absent -> null
    assert rows[1]["lastmod"] is None
    assert rows[1]["changefreq"] is None
    assert rows[1]["priority"] is None
    assert rows[2]["lastmod"] == "2026-02-01"
    assert rows[2]["priority"] is None


def _redirects(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([p[0] for p in pairs], pa.string()),
                "dst_url": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def _by_url(rows):
    return {r["url"]: r for r in rows}


def test_resolve_redirects_walk_chains_and_cycle(ray_session):
    ds = _redirects(
        [("1", "2"), ("2", "3"), ("3", "T"), ("c1", "c2"), ("c2", "c1")]
    )
    rows = _by_url(resolve_redirects(ds, max_hops=8).take_all())
    assert rows["1"] == {"url": "1", "final_url": "T", "n_hops": 3, "resolved": 1}
    assert rows["2"]["n_hops"] == 2 and rows["2"]["resolved"] == 1
    assert rows["3"]["n_hops"] == 1
    # 2-cycle: unresolved, stopped at the hop cap
    assert rows["c1"]["resolved"] == 0
    assert rows["c2"]["resolved"] == 0


def test_resolve_redirects_paths_agree(ray_session):
    """Forced pointer-doubling path == single-worker walk path, on a mix
    of chain lengths (1..20 hops incl. > max_hops), a shared sink, and a
    3-cycle. For unresolved rows only (url, resolved) are canonical."""
    pairs = []
    # chains: head h{L}_{i} -> ... -> sink "S" (length L)
    for length in (1, 2, 3, 7, 15, 16, 20):
        prev = f"h{length}_0"
        for i in range(1, length):
            cur = f"h{length}_{i}"
            pairs.append((prev, cur))
            prev = cur
        pairs.append((prev, "S"))
    pairs += [("x", "y"), ("y", "z"), ("z", "x")]  # 3-cycle
    ds = _redirects(pairs)

    walk = _by_url(resolve_redirects(ds, max_hops=16).take_all())
    dist = _by_url(
        resolve_redirects(
            ds, max_hops=16, broadcast_limit=0, n_partitions=2
        ).take_all()
    )
    assert set(walk) == set(dist)
    for url, w in walk.items():
        d = dist[url]
        assert w["resolved"] == d["resolved"], url
        if w["resolved"]:
            assert (w["final_url"], w["n_hops"]) == (
                d["final_url"],
                d["n_hops"],
            ), url
    # closed-form spot checks: chain heads resolve in exactly L hops when
    # L <= max_hops, and are unresolved beyond the cap
    for length in (1, 2, 3, 7, 15, 16):
        assert walk[f"h{length}_0"] == {
            "url": f"h{length}_0",
            "final_url": "S",
            "n_hops": length,
            "resolved": 1,
        }
    assert walk["h20_0"]["resolved"] == 0
    assert dist["h20_0"]["resolved"] == 0


def test_resolve_redirects_star_skew(ray_session):
    """A hub everything redirects into (then one more hop) stays O(n):
    every src resolves in <= 2 hops regardless of fan-in."""
    n = 300
    pairs = [(f"s{i}", "hub") for i in range(n)] + [("hub", "T")]
    rows = resolve_redirects(
        _redirects(pairs), max_hops=4, broadcast_limit=0, n_partitions=2
    ).take_all()
    by = _by_url(rows)
    assert len(by) == n + 1
    assert by["hub"]["n_hops"] == 1
    assert all(
        by[f"s{i}"] == {
            "url": f"s{i}",
            "final_url": "T",
            "n_hops": 2,
            "resolved": 1,
        }
        for i in range(n)
    )


def test_host_reciprocity_brute(ray_session, tmp_path):
    """Replay the linked-web fixture closed form in pure Python and check
    the full per-host reciprocity report."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fonduer_ray.pipelines.docops import host_reciprocity

    n = 60
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["page"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([4] * n, pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")

    got = (
        host_reciprocity(str(tmp_path))
        .to_pandas()
        .sort_values("host", ignore_index=True)
    )

    edges = set()
    for i in range(n):
        for k in range(1, 2 + i % 3):
            t = (7 * i + k) % n
            if i % 20 != t % 20:
                edges.add((i % 20, t % 20))
    rows = []
    for h in sorted({e[0] for e in edges}):
        out = [d for (s, d) in edges if s == h]
        rows.append(
            (
                f"www.src{h}.example.com",
                len(out),
                sum(1 for d in out if (d, h) in edges),
            )
        )
    want = (
        pd.DataFrame(rows, columns=["host", "n_out", "n_reciprocal"])
        .sort_values("host", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_out": "int64", "n_reciprocal": "int64"}), want
    )


def test_registered_domain_psl_algorithm():
    from fonduer_ray.functions.weburl import psl_compile, registered_domain

    c = psl_compile()
    # plain rules, longest match wins
    assert registered_domain("example.com", c) == "example.com"
    assert registered_domain("www.example.com", c) == "example.com"
    assert registered_domain("foo.bar.co.uk", c) == "bar.co.uk"
    assert registered_domain("x.ac.uk", c) == "x.ac.uk"
    assert registered_domain("user.github.io", c) == "user.github.io"
    assert registered_domain("a.user.github.io", c) == "user.github.io"
    # wildcard: every label under ck is itself a public suffix
    assert registered_domain("a.b.ck", c) == "a.b.ck"
    assert registered_domain("x.a.b.ck", c) == "a.b.ck"
    # exception carves www.ck back out of the wildcard
    assert registered_domain("www.ck", c) == "www.ck"
    assert registered_domain("sub.www.ck", c) == "www.ck"
    # host IS a public suffix -> no registered domain
    assert registered_domain("com", c) is None
    assert registered_domain("co.uk", c) is None
    assert registered_domain("b.ck", c) is None
    # unknown TLD falls back to rightmost label as the suffix
    assert registered_domain("foo.bar.zz", c) == "bar.zz"
    # case/trailing-dot normalization
    assert registered_domain("WWW.Example.COM.", c) == "example.com"
