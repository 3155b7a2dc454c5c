"""URL canonicalization (functions/weburl.py)."""
import pyarrow as pa

import ray.data

from fonduer_ray.functions.weburl import (
    canonicalize_url,
    canonicalize_urls,
    url_host,
)


def test_canonicalize_rules():
    cases = {
        # scheme/host lowercase, default port + userinfo + fragment drop
        "HTTPS://U:p@WWW.Ex.COM:443/A/b#frag": "https://www.ex.com/A/b",
        "HTTP://ex.com:80/": "http://ex.com/",
        # non-default port survives
        "http://ex.com:8080/x": "http://ex.com:8080/x",
        # tracking params drop, rest sorted; emptied query drops '?'
        "https://ex.com/p?utm_source=a&z=1&a=2": "https://ex.com/p?a=2&z=1",
        "https://ex.com/p?utm_campaign=x&fbclid=y": "https://ex.com/p",
        # trailing slash removed on non-root path, root kept
        "https://ex.com/a/b/": "https://ex.com/a/b",
        "https://ex.com/": "https://ex.com/",
        # path case preserved; query with no '=' kept
        "https://ex.com/CaseD?flag": "https://ex.com/CaseD?flag",
        # no scheme -> returned as-is
        "not a url": "not a url",
    }
    for raw, want in cases.items():
        assert canonicalize_url(raw) == want, raw


def test_url_host():
    assert url_host("https://a.b.com/x?q=1") == "a.b.com"
    assert url_host("http://a.b.com:8080") == "a.b.com:8080"
    assert url_host("garbage") == ""


def test_canonicalize_urls_dataset(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [
                        "HTTPS://Ex.COM:443/a/?utm_source=x&b=1",
                        "http://other.org/p#f",
                    ],
                    pa.string(),
                )
            }
        )
    )
    rows = canonicalize_urls(ds).take_all()
    assert rows[0]["canonical_url"] == "https://ex.com/a?b=1"
    assert rows[0]["host"] == "ex.com"
    assert rows[1]["canonical_url"] == "http://other.org/p"
    assert rows[1]["host"] == "other.org"


def test_extract_links_document_order_and_nesting(ray_session):
    from fonduer_ray.functions.weburl import extract_links

    html = (
        b"<html><body>"
        b'<p>intro <a href="/one">first <b>bold</b> text</a> mid</p>'
        b'<a name="no-href">skipped</a>'
        b'<div><a href="/two"></a></div>'
        b'<a href="/three">tail</a>'
        b"</body></html>"
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["p1"], pa.string()),
                "html": pa.array([html], pa.binary()),
            }
        )
    )
    rows = sorted(extract_links(ds).take_all(), key=lambda r: r["link_pos"])
    assert [(r["link_pos"], r["href"], r["anchor"]) for r in rows] == [
        (1, "/one", "first bold text"),
        (2, "/two", ""),
        (3, "/three", "tail"),
    ]
    assert all(r["src_url"] == "p1" for r in rows)


def test_parse_robots_groups_and_precedence():
    from fonduer_ray.functions.weburl import parse_robots, robots_allowed

    body = """
# crawl policy
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /tmp*$
Disallow:
"""
    rules = parse_robots(body, agent="*")
    assert robots_allowed(rules, "/public/x")
    assert not robots_allowed(rules, "/private/secret")
    # longer Allow overrides the shorter Disallow
    assert robots_allowed(rules, "/private/okay")
    # wildcard + end anchor
    assert not robots_allowed(rules, "/tmpfile")
    # badbot group must not leak into *
    assert robots_allowed(rules, "/anything")
    bad = parse_robots(body, agent="BadBot")  # case-insensitive agent
    assert not robots_allowed(bad, "/anything")
    # agent with no group falls back to *
    other = parse_robots(body, agent="goodbot")
    assert not robots_allowed(other, "/private/secret")
    # empty body allows everything
    assert robots_allowed(parse_robots(""), "/x")


def test_robots_filter_broadcast_vs_join_paths(ray_session):
    from fonduer_ray.functions.weburl import robots_filter

    pages = ray.data.from_items(
        [
            {"host": "a.com", "path": "/keep"},
            {"host": "a.com", "path": "/blocked/x"},
            {"host": "b.com", "path": "/blocked/x"},  # no robots -> allowed
        ]
    )
    robots = ray.data.from_items(
        [{"host": "a.com", "body": "User-agent: *\nDisallow: /blocked"}]
    )
    want = {("a.com", "/keep"): 1, ("a.com", "/blocked/x"): 0,
            ("b.com", "/blocked/x"): 1}
    for kw in ({}, {"broadcast_limit": 0}):
        rows = robots_filter(pages, robots, **kw).take_all()
        got = {(r["host"], r["path"]): r["allowed"] for r in rows}
        assert got == want, kw
