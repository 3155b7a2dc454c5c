"""URL canonicalization for web corpora.

Common-Crawl-scale pipelines dedupe and group by CANONICAL url — the raw
``url`` column carries case noise, default ports, tracking parameters,
fragments, and unsorted query strings that make byte-equality useless.
(The reference ingests documents by name and never normalizes URLs; this
is one of the LLM-data operators the brief adds on top of its surface.)

Rules (the common subset of RFC 3986 normalization + tracker stripping):

- scheme and host lowercase; userinfo dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment dropped
- query: split on ``&``, drop tracking keys (``utm_*``, ``fbclid``,
  ``gclid``, ``msclkid``, ``ref``, ``mc_eid``), sort the rest bytewise
  by ``key=value`` pair, re-join; an emptied query drops its ``?``
- path kept verbatim except a single trailing ``/`` on a non-root path
  is removed (root ``/`` survives)

Pure ``map_batches`` — no state, no shuffle; at 100 TB this runs fused
into the read stage.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

_TRACKING_EXACT = frozenset({"fbclid", "gclid", "msclkid", "ref", "mc_eid"})


def _is_tracking(key: str) -> bool:
    return key.startswith("utm_") or key in _TRACKING_EXACT


def canonicalize_url(url: str) -> str:
    """One URL -> canonical form (see module rules). Malformed inputs
    (no ``://``) are returned lowercased-scheme-less as-is."""
    if "://" not in url:
        return url
    scheme, rest = url.split("://", 1)
    scheme = scheme.lower()
    # authority ends at the first /, ?, or #
    end = len(rest)
    for ch in "/?#":
        i = rest.find(ch)
        if i != -1 and i < end:
            end = i
    authority, tail = rest[:end], rest[end:]
    if "@" in authority:  # userinfo
        authority = authority.rsplit("@", 1)[1]
    host, _, port = authority.partition(":")
    host = host.lower()
    if port and not (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
    ):
        host = f"{host}:{port}"
    # split off fragment first, then query
    tail = tail.split("#", 1)[0]
    path, _, query = tail.partition("?")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    keep = sorted(
        p
        for p in query.split("&")
        if p and not _is_tracking(p.partition("=")[0])
    )
    out = f"{scheme}://{host}{path}"
    if keep:
        out += "?" + "&".join(keep)
    return out


def url_host(canonical: str) -> str:
    """Host (incl. any non-default port) of a canonical URL; '' when the
    input has no authority."""
    if "://" not in canonical:
        return ""
    rest = canonical.split("://", 1)[1]
    end = len(rest)
    for ch in "/?#":
        i = rest.find(ch)
        if i != -1 and i < end:
            end = i
    return rest[:end]


def canonicalize_urls(
    ds: "ray.data.Dataset", url_col: str = "url"
) -> "ray.data.Dataset":
    """Append ``canonical_url`` and ``host`` columns."""

    def canon(t: pa.Table) -> pa.Table:
        urls = t[url_col].to_pylist()
        canonical = [canonicalize_url(u or "") for u in urls]
        hosts = [url_host(c) for c in canonical]
        return t.append_column(
            "canonical_url", pa.array(canonical, pa.string())
        ).append_column("host", pa.array(hosts, pa.string()))

    return ds.map_batches(canon, batch_format="pyarrow")


def _subtree_text(node) -> str:
    """Concatenated text of a node's subtree (its own text + each child's
    text and tail), document order — the anchor text of an <a> element."""
    parts = [node.text or ""]
    for ch in node.children:
        parts.append(_subtree_text(ch))
        parts.append(ch.tail or "")
    return "".join(parts)


def extract_links(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    html_col: str = "html",
) -> "ray.data.Dataset":
    """HTML pages -> one row per ``<a href>`` link: ``(src_url, link_pos,
    href, anchor)`` in document (DFS) order, 1-based ``link_pos`` per page.

    The web-graph primitive for Common-Crawl-style corpora (outlink
    extraction feeding host-graph construction); uses the same tolerant
    HTML tree parser as the document pipeline (``parser/htmltree.py``),
    so link extraction and text extraction agree on malformed markup.
    Pure ``map_batches`` — downstream host-graph aggregation is one
    hash shuffle on the canonical target host."""
    from fonduer_ray.parser.htmltree import parse_html

    def links(t: pa.Table) -> pa.Table:
        srcs, poss, hrefs, anchors = [], [], [], []
        for url, html in zip(
            t[url_col].to_pylist(), t[html_col].to_pylist()
        ):
            root = parse_html(html or b"")
            if root is None:
                continue
            pos = 0
            stack = [root]
            while stack:
                node = stack.pop()
                # children pushed reversed so pop order is document order
                stack.extend(reversed(node.children))
                if node.tag != "a":
                    continue
                href = next(
                    (v for k, v in node.attrs if k == "href"), None
                )
                if not href:
                    continue
                pos += 1
                srcs.append(url)
                poss.append(pos)
                hrefs.append(href)
                anchors.append(_subtree_text(node))
        return pa.table(
            {
                "src_url": pa.array(srcs, pa.string()),
                "link_pos": pa.array(poss, pa.int64()),
                "href": pa.array(hrefs, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        )

    return ds.map_batches(links, batch_format="pyarrow")


# ------------------------------------------------------------- robots.txt


def parse_robots(body: str, agent: str = "*") -> list[tuple[str, bool, "re.Pattern"]]:
    """robots.txt -> the rule list applying to ``agent`` (RFC 9309): the
    group whose ``User-agent`` line case-insensitively equals ``agent``
    if present, else the ``*`` group. Each rule is ``(raw_path, allow,
    compiled_regex)`` supporting the ``*`` wildcard and ``$`` end anchor.
    Empty ``Disallow:`` lines (allow-all markers) are dropped."""
    import re as _re

    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    collecting_agents = True
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not collecting_agents:
                current = []
            collecting_agents = True
            current.append(value.lower())
            for a in current:
                groups.setdefault(a, [])
        elif field in ("allow", "disallow"):
            collecting_agents = False
            if not value:
                continue
            for a in current:
                groups.setdefault(a, []).append((value, field == "allow"))

    rules = groups.get(agent.lower())
    if rules is None:
        rules = groups.get("*", [])

    compiled = []
    for path, allow in rules:
        pat = "".join(
            ".*" if ch == "*" else _re.escape(ch) for ch in path.rstrip("$")
        )
        if path.endswith("$"):
            pat += "$"
        compiled.append((path, allow, _re.compile(pat)))
    return compiled


def robots_allowed(rules, path: str) -> bool:
    """RFC 9309 precedence: the matching rule with the longest raw path
    wins; Allow beats Disallow on equal length; no match -> allowed."""
    best_len = -1
    best_allow = True
    for raw, allow, rx in rules:
        if rx.match(path) is None:
            continue
        ln = len(raw)
        if ln > best_len or (ln == best_len and allow and not best_allow):
            best_len, best_allow = ln, allow
    return best_allow


#: above this many robots hosts the compiled-rule map is no longer
#: broadcast — pages hash-join the robots table on host instead
ROBOTS_BROADCAST_HOST_LIMIT = 1_000_000


def robots_filter(
    ds: "ray.data.Dataset",
    robots: "ray.data.Dataset",
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
    broadcast_limit: int = ROBOTS_BROADCAST_HOST_LIMIT,
) -> "ray.data.Dataset":
    """Append ``allowed`` (int64 0/1) to ``ds`` by evaluating each row's
    ``path`` against its host's robots.txt. ``robots`` has columns
    ``(host, body)``; hosts absent from it allow everything.

    Scale: the robots side is per-HOST (tiny next to pages). At or below
    ``broadcast_limit`` hosts the compiled rule map ships once via
    ``ray.put``; above it the raw bodies hash-join onto pages by host
    and rules compile per batch (compilation is memoized per worker by
    body hash)."""
    n_hosts = robots.count()

    if n_hosts <= broadcast_limit:
        rules_by_host = {
            h: parse_robots(b or "", agent)
            for batch in robots.select_columns(["host", "body"]).iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
            for h, b in zip(batch["host"].to_pylist(), batch["body"].to_pylist())
        }
        ref = ray.put(rules_by_host)

        def mark(t: pa.Table) -> pa.Table:
            from fonduer_ray.stages.util import get_broadcast

            rbh = get_broadcast(ref)
            flags = [
                int(robots_allowed(rbh.get(h, ()), p))
                for h, p in zip(
                    t[host_col].to_pylist(), t[path_col].to_pylist()
                )
            ]
            return t.append_column("allowed", pa.array(flags, pa.int64()))

        return ds.map_batches(mark, batch_format="pyarrow")

    from fonduer_ray.stages.util import join_partitions

    joined = ds.join(
        robots.select_columns(["host", "body"]),
        "left_outer",
        num_partitions=join_partitions(),
        on=(host_col,),
        right_on=("host",),
    )
    _cache: dict = {}

    def mark_joined(t: pa.Table) -> pa.Table:
        flags = []
        for body, p in zip(t["body"].to_pylist(), t[path_col].to_pylist()):
            if body is None:
                flags.append(1)
                continue
            rules = _cache.get(body)
            if rules is None:
                rules = _cache[body] = parse_robots(body, agent)
            flags.append(int(robots_allowed(rules, p)))
        return t.drop_columns(["body"]).append_column(
            "allowed", pa.array(flags, pa.int64())
        )

    return joined.map_batches(mark_joined, batch_format="pyarrow")


# ---------------------------------------------------------- page metadata


def extract_page_meta(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    html_col: str = "html",
) -> "ray.data.Dataset":
    """HTML pages -> one row per page with the standard head metadata a
    web-KG ingest keys on: ``(url, title, description, canonical,
    og_title, og_type, lang)``. Missing fields come back null; title and
    description are whitespace-squeezed. ``canonical`` is the
    ``<link rel=canonical>`` href run through the URL canonicalizer (the
    page's self-declared identity — the join key that merges syndicated
    copies before dedup even runs). ``lang`` is the root ``<html lang>``
    attribute, lowercased.

    First occurrence wins per field (browser behavior). Same tolerant
    tree parser as the doc pipeline; stateless ``map_batches``."""
    from fonduer_ray.parser.htmltree import parse_html

    def first_attr(node, name):
        return next((v for k, v in node.attrs if k == name), None)

    def meta(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "url": [],
            "title": [],
            "description": [],
            "canonical": [],
            "og_title": [],
            "og_type": [],
            "lang": [],
        }
        for url, html in zip(t[url_col].to_pylist(), t[html_col].to_pylist()):
            root = parse_html(html or b"")
            if root is None:
                continue
            out: dict[str, str | None] = dict.fromkeys(
                ("title", "description", "canonical", "og_title",
                 "og_type", "lang")
            )
            stack = [root]
            while stack:
                node = stack.pop()
                stack.extend(reversed(node.children))
                tag = node.tag
                if tag == "html" and out["lang"] is None:
                    lang = first_attr(node, "lang")
                    if lang:
                        out["lang"] = lang.strip().lower()
                elif tag == "title" and out["title"] is None:
                    out["title"] = " ".join(_subtree_text(node).split())
                elif tag == "link":
                    rel = (first_attr(node, "rel") or "").strip().lower()
                    if rel == "canonical" and out["canonical"] is None:
                        href = first_attr(node, "href")
                        if href:
                            out["canonical"] = canonicalize_url(href)
                elif tag == "meta":
                    content = first_attr(node, "content")
                    if content is None:
                        continue
                    name = (first_attr(node, "name") or "").strip().lower()
                    prop = (
                        first_attr(node, "property") or ""
                    ).strip().lower()
                    if name == "description" and out["description"] is None:
                        out["description"] = " ".join(content.split())
                    elif prop == "og:title" and out["og_title"] is None:
                        out["og_title"] = content
                    elif prop == "og:type" and out["og_type"] is None:
                        out["og_type"] = content
            cols["url"].append(url)
            for k in ("title", "description", "canonical", "og_title",
                      "og_type", "lang"):
                cols[k].append(out[k])
        return pa.table(
            {k: pa.array(v, pa.string()) for k, v in cols.items()}
        )

    return ds.map_batches(meta, batch_format="pyarrow")


# --------------------------------------------------------------- sitemaps


def parse_sitemaps(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    xml_col: str = "xml",
) -> "ray.data.Dataset":
    """Sitemap documents (sitemaps.org protocol) -> one row per entry:
    ``(sitemap_url, kind, pos, loc, lastmod, changefreq, priority)``.
    ``kind`` is ``'url'`` for ``<urlset>`` page entries and ``'sitemap'``
    for ``<sitemapindex>`` child references (the crawler recurses on
    those); ``pos`` is the 1-based document-order position. Optional
    fields absent from an entry come back null; field values are kept as
    the VERBATIM sitemap strings (no date/float coercion — parse
    fidelity, and callers cast downstream).

    Completes the crawl-side trio with ``canonicalize_urls`` and
    ``robots_filter``. Uses the same tolerant tree parser as the doc
    pipeline (XML prolog dropped as a processing instruction), pure
    ``map_batches`` — at scale this fuses into the fetch/read stage."""
    from fonduer_ray.parser.htmltree import parse_html

    def walk(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "sitemap_url": [],
            "kind": [],
            "pos": [],
            "loc": [],
            "lastmod": [],
            "changefreq": [],
            "priority": [],
        }
        for url, xml in zip(t[url_col].to_pylist(), t[xml_col].to_pylist()):
            root = parse_html(xml or b"")
            if root is None:
                continue
            pos = 0
            stack = [root]
            while stack:
                node = stack.pop()
                stack.extend(reversed(node.children))
                if node.tag not in ("url", "sitemap"):
                    continue
                fields = {
                    ch.tag: (ch.text or "").strip() for ch in node.children
                }
                loc = fields.get("loc")
                if not loc:
                    continue  # loc is mandatory per the protocol
                pos += 1
                cols["sitemap_url"].append(url)
                cols["kind"].append(node.tag)
                cols["pos"].append(pos)
                cols["loc"].append(loc)
                cols["lastmod"].append(fields.get("lastmod") or None)
                cols["changefreq"].append(fields.get("changefreq") or None)
                cols["priority"].append(fields.get("priority") or None)
        return pa.table(
            {
                "sitemap_url": pa.array(cols["sitemap_url"], pa.string()),
                "kind": pa.array(cols["kind"], pa.string()),
                "pos": pa.array(cols["pos"], pa.int64()),
                "loc": pa.array(cols["loc"], pa.string()),
                "lastmod": pa.array(cols["lastmod"], pa.string()),
                "changefreq": pa.array(cols["changefreq"], pa.string()),
                "priority": pa.array(cols["priority"], pa.string()),
            }
        )

    return ds.map_batches(walk, batch_format="pyarrow")


# -------------------------------------------------------- anchor aliases


def anchor_aliases(
    links: "ray.data.Dataset",
    target_col: str = "canonical_url",
    anchor_col: str = "anchor",
) -> "ray.data.Dataset":
    """(target, n_mentions, n_aliases, top_anchor) over an extracted link
    table — the KG entity-alias aggregate: the anchor texts pointing at
    one canonical target are the web's names for that entity (the
    Wikipedia-anchor alias-mining move; no reference analog — reference
    never looks at links). ``top_anchor`` is the modal anchor, ties
    broken bytewise-ascending.

    Scale: anchors are whitespace-squeezed, then (target, anchor) counts
    pre-aggregate INSIDE each block (the combiner), so only distinct
    pairs per block ride the single target-keyed hash shuffle; the modal
    pick runs vectorized per partition. Anchor text never shuffles more
    than once per distinct (block, target, anchor)."""
    import pandas as pd

    from fonduer_ray.stages.util import hash_groupby

    def partial(t: pa.Table) -> pa.Table:
        anchors = [
            " ".join((a or "").split()) for a in t[anchor_col].to_pylist()
        ]
        df = pd.DataFrame(
            {"target": t[target_col].to_pylist(), "anchor": anchors}
        )
        df = df[df["anchor"] != ""]
        g = (
            df.groupby(["target", "anchor"], sort=False)
            .size()
            .reset_index(name="n")
        )
        # explicit schema: an empty block would otherwise infer null-typed
        # string columns and poison the downstream shuffle
        return pa.table(
            {
                "target": pa.array(g["target"], pa.string()),
                "anchor": pa.array(g["anchor"], pa.string()),
                "n": pa.array(g["n"], pa.int64()),
            }
        )

    pairs = links.map_batches(partial, batch_format="pyarrow")

    def agg(df: "pd.DataFrame") -> "pd.DataFrame":
        g = (
            df.groupby(["target", "anchor"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        g = g.sort_values(
            ["target", "n", "anchor"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = g.drop_duplicates("target", keep="first")[
            ["target", "anchor"]
        ].rename(columns={"anchor": "top_anchor"})
        stats = (
            g.groupby("target", sort=False)
            .agg(n_mentions=("n", "sum"), n_aliases=("n", "size"))
            .reset_index()
        )
        return stats.merge(top, on="target")

    return hash_groupby(pairs, ["target"], agg)


# ----------------------------------------------------- redirect resolution


REDIRECT_BROADCAST_EDGE_LIMIT = 2_000_000


def resolve_redirects(
    redirects: "ray.data.Dataset",
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_hops: int = 64,
    broadcast_limit: int = REDIRECT_BROADCAST_EDGE_LIMIT,
    n_partitions: int | None = None,
) -> "ray.data.Dataset":
    """(url, final_url, n_hops, resolved) — follow each source URL of a
    redirect edge table (a functional graph: one outgoing edge per src)
    to its terminal target. The URL-alias canonicalization step of web
    KG construction: entity pages reached via 301-chains must collapse
    to one node before linking.

    Scale: at or below ``broadcast_limit`` edges the map resolves on ONE
    bounded worker task (dict walk, memoized per terminal). Above it,
    distributed POINTER DOUBLING: each round self-joins the live
    (url -> next, hops) state on ``next = url``, squaring the distance
    covered — ceil(log2 max_hops) rounds total, each one hash join, so
    a 100-hop chain at 100 TB costs 7 shuffles, not 100. Rows whose
    ``next`` has no outgoing edge are terminal and retire from the live
    set immediately (a left-outer self-join marks them), so join input
    shrinks every round. Cycles (and chains longer than ``max_hops``)
    surface as ``resolved = 0`` with the last URL reached — pointer
    doubling makes that URL deterministic (f^(2^k) of the source).
    Both paths are equality-tested (tests/test_weburl2.py)."""
    n_edges = redirects.count()

    if n_edges <= broadcast_limit:
        nxt: dict = {}
        for batch in redirects.select_columns([src_col, dst_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            nxt.update(
                zip(batch[src_col].to_pylist(), batch[dst_col].to_pylist())
            )

        @ray.remote
        def walk(nxt: dict, max_hops: int) -> pa.Table:
            urls, finals, hops_l, res = [], [], [], []
            for src in nxt:
                cur, hops = src, 0
                while cur in nxt and hops < max_hops:
                    cur = nxt[cur]
                    hops += 1
                urls.append(src)
                finals.append(cur)
                hops_l.append(hops)
                res.append(int(cur not in nxt))
            return pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "final_url": pa.array(finals, pa.string()),
                    "n_hops": pa.array(hops_l, pa.int64()),
                    "resolved": pa.array(res, pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([walk.remote(nxt, max_hops)])

    from fonduer_ray.stages.util import join_partitions

    # each round is a full hash-shuffle whose aggregator-actor spin-up is
    # the fixed cost (see join_partitions) — callers at cluster scale pass
    # an explicit n_partitions
    n_parts = n_partitions or join_partitions()

    # state: (url, nxt, hops) for live rows; terminal rows peel off into
    # `done` datasets as soon as their nxt leaves the edge-key set
    state = redirects.map_batches(
        lambda t: pa.table(
            {
                "url": t[src_col].cast(pa.string()),
                "nxt": t[dst_col].cast(pa.string()),
                "hops": pa.array([1] * len(t), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    # the full (src -> dst) hop-1 map is the loop-invariant join target:
    # joining live state against it (not against the shrinking live set)
    # keeps retired rows reachable as intermediate hops
    base = state
    done_parts: list = []
    # +1: a row resolves via a left-outer MISS the round AFTER its pointer
    # lands on the terminal, so coverage needs one detection round past
    # the ceil(log2) doubling rounds
    rounds = max(1, (max_hops - 1).bit_length()) + 1
    span = 1  # max distance covered by `base` per application

    for _ in range(rounds):
        joined = state.join(
            base.map_batches(
                lambda t: pa.table(
                    {
                        "j_url": t["url"],
                        "j_nxt": t["nxt"],
                        "j_hops": t["hops"],
                    }
                ),
                batch_format="pyarrow",
            ),
            "left_outer",
            num_partitions=n_parts,
            on=("nxt",),
            right_on=("j_url",),
        )

        def split(t: pa.Table, _cap=max_hops) -> pa.Table:
            import pyarrow.compute as pc

            # miss: nxt has no outgoing edge -> this row is RESOLVED at
            # its current position. over: accumulated distance exceeds the
            # cap without terminating (strict >, so a chain of exactly
            # max_hops hops still resolves, matching the walk path) ->
            # retire UNRESOLVED. hops along a real path never exceed the
            # true chain length, so `over` can only fire for cycles or
            # chains longer than the cap.
            miss = pc.is_null(t["j_nxt"])
            new_hops = pc.add(t["hops"], pc.fill_null(t["j_hops"], 0))
            over = pc.and_(pc.invert(miss), pc.greater(new_hops, _cap))
            terminal = pc.or_(miss, over)
            return pa.table(
                {
                    "url": t["url"],
                    "nxt": pc.if_else(miss, t["nxt"], t["j_nxt"]),
                    "hops": pc.if_else(miss, t["hops"], new_hops),
                    "terminal": terminal.cast(pa.int8()),
                    "resolved": miss.cast(pa.int8()),
                }
            )

        stepped = joined.map_batches(split, batch_format="pyarrow").materialize()
        done_parts.append(stepped.filter(expr="terminal == 1"))
        # repartition: filter passes through zero-column empty blocks that
        # crash the next round's join aggregator (see hash_groupby join_safe)
        state = (
            stepped.filter(expr="terminal == 0")
            .drop_columns(["terminal", "resolved"])
            .repartition(n_parts)
            .materialize()
        )
        span *= 2
        if state.count() == 0:
            break
        # double the base map as well so round k covers 2^k hops
        if span < max_hops:
            base = _double_map(base, n_parts)

    # anything still live hit the round cap without terminating (cycle)
    leftover = state.map_batches(
        lambda t: t.append_column(
            "terminal", pa.array([1] * len(t), pa.int8())
        ).append_column("resolved", pa.array([0] * len(t), pa.int8())),
        batch_format="pyarrow",
    )
    done_parts.append(leftover)
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.union(p)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # hops > cap can only happen on a non-pow2 cap where the last
        # doubling overshoots; the walk path reports such rows unresolved
        # at the cap, so mirror that (for unresolved rows only
        # (url, resolved) are canonical — final_url/n_hops are
        # path-dependent positions on the walk)
        return pa.table(
            {
                "url": t["url"],
                "final_url": t["nxt"],
                "n_hops": t["hops"],
                "resolved": pc.and_(
                    t["resolved"].cast(pa.bool_()),
                    pc.less_equal(t["hops"], max_hops),
                ).cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _double_map(base: "ray.data.Dataset", n_parts: int) -> "ray.data.Dataset":
    """One pointer-doubling step on the (url -> nxt, hops) map itself:
    url's pointer jumps to its pointer's pointer where one exists."""
    joined = base.join(
        base.map_batches(
            lambda t: pa.table(
                {"j_url": t["url"], "j_nxt": t["nxt"], "j_hops": t["hops"]}
            ),
            batch_format="pyarrow",
        ),
        "left_outer",
        num_partitions=n_parts,
        on=("nxt",),
        right_on=("j_url",),
    )

    def step(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        miss = pc.is_null(t["j_nxt"])
        return pa.table(
            {
                "url": t["url"],
                "nxt": pc.if_else(miss, t["nxt"], t["j_nxt"]),
                "hops": pc.if_else(
                    miss,
                    t["hops"],
                    pc.add(t["hops"], pc.fill_null(t["j_hops"], 0)),
                ),
            }
        )

    # repartition: the join emits zero-column blocks for empty partitions
    # and map_batches passes them through; this map feeds the NEXT round's
    # join, so sanitize (see hash_groupby join_safe)
    return (
        joined.map_batches(step, batch_format="pyarrow")
        .repartition(n_parts)
        .materialize()
    )


# ----------------------------------------------------------- public suffix

#: demo-scale rule set in the public-suffix-list format (publicsuffix.org):
#: plain rules, one wildcard (`*.ck` — every label under ck is a public
#: suffix) and one exception (`!www.ck` — carved back out of the
#: wildcard). Real deployments pass the full downloaded PSL to
#: :func:`psl_compile`; the ALGORITHM below is the complete published one.
DEFAULT_PSL_RULES = (
    "com", "org", "net", "io", "uk", "co.uk", "ac.uk",
    "au", "com.au", "github.io", "*.ck", "!www.ck",
)


def psl_compile(rules=DEFAULT_PSL_RULES) -> dict:
    """Compile PSL-format rules into {labels_tuple: is_exception},
    label tuples stored reversed (TLD first) for tail matching."""
    compiled = {}
    for r in rules:
        exc = r.startswith("!")
        labels = tuple(reversed(r.lstrip("!").split(".")))
        compiled[labels] = exc
    return compiled


def registered_domain(host: str, compiled: dict | None = None) -> str | None:
    """eTLD+1 of ``host`` by the published PSL algorithm
    (publicsuffix.org/list): among rules whose labels match the host's
    tail labels (``*`` matches exactly one label), an exception rule wins
    outright (its public suffix is the rule minus its leftmost label);
    otherwise the rule with the most labels wins; no match falls back to
    the rightmost label. The registered domain is the public suffix plus
    one more label — None when the host IS a public suffix."""
    if compiled is None:
        compiled = psl_compile()
    labels = host.lower().rstrip(".").split(".")
    rev = list(reversed(labels))
    best = 0  # no-match fallback: suffix = rightmost label
    exc_len = None
    for rule, exc in compiled.items():
        if len(rule) > len(rev):
            continue
        if all(r == "*" or r == h for r, h in zip(rule, rev)):
            if exc:
                exc_len = len(rule) - 1
            else:
                best = max(best, len(rule))
    suffix_len = exc_len if exc_len is not None else max(best, 1)
    if len(labels) <= suffix_len:
        return None
    return ".".join(labels[-(suffix_len + 1):])


def registered_domains(
    ds: "ray.data.Dataset",
    host_col: str = "host",
    rules=DEFAULT_PSL_RULES,
) -> "ray.data.Dataset":
    """Append a ``registered_domain`` column — the canonical grouping key
    for per-site aggregation (crawl budgets, host-level dedup, spam
    rollups). Stateless map; the compiled rule table builds once per
    worker via the closure (the full PSL is ~10k rules, trivially
    broadcastable)."""
    compiled = psl_compile(rules)

    def add_rd(t: pa.Table) -> pa.Table:
        hosts = t[host_col].to_pylist()
        return t.append_column(
            "registered_domain",
            pa.array(
                [registered_domain(h, compiled) if h else None for h in hosts],
                pa.string(),
            ),
        )

    return ds.map_batches(add_rd, batch_format="pyarrow")
