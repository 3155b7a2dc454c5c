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
