"""robots.txt parsing + URL filtering tests (operators/robots.py):
RFC 9309 group selection, longest-match precedence, wildcard/anchor
patterns, defaults, and the broadcast-join distributed check."""

from accelerator_spark.operators.robots import (
    RobotsRules, _url_path, parse_robots, robots_allowed, robots_check)

_TXT = """
# demo robots
User-agent: trainbot
User-agent: otherbot
Disallow: /
Crawl-delay: 10

User-agent: *
Disallow: /private/
Allow: /private/open
Disallow: /*.pdf$
Disallow: /search?q=
Crawl-delay: 2.5
Sitemap: https://h.example/sitemap.xml
"""


def test_group_selection_and_merge():
    r = parse_robots(_TXT)
    assert r.matched_agent == "*"
    assert r.crawl_delay == 2.5
    assert r.sitemaps == ("https://h.example/sitemap.xml",)
    # a named agent matches its group (case-insensitively), and a
    # multi-UA header applies to both names
    for name in ("TrainBot", "otherbot"):
        rb = parse_robots(_TXT, name)
        assert rb.matched_agent == name.lower()
        assert rb.crawl_delay == 10
        assert not robots_allowed(rb, "/anything")
    # an agent with no matching group falls back to *
    assert parse_robots(_TXT, "unknownbot").matched_agent == "*"
    # no groups at all -> everything allowed
    empty = parse_robots("Sitemap: https://x/s.xml")
    assert empty.matched_agent is None
    assert robots_allowed(empty, "/any")
    assert robots_allowed(parse_robots(None), "/any")
    assert robots_allowed(parse_robots(""), "/any")


def test_longest_match_and_patterns():
    r = parse_robots(_TXT)
    assert robots_allowed(r, "/public/a")
    assert not robots_allowed(r, "/private/a")
    # longest match wins: Allow /private/open beats Disallow /private/
    assert robots_allowed(r, "/private/open")
    assert robots_allowed(r, "/private/open/deep")
    # wildcard + end anchor
    assert not robots_allowed(r, "/doc.pdf")
    assert not robots_allowed(r, "/a/b/c.pdf")
    assert robots_allowed(r, "/doc.pdfx")      # anchor holds
    assert robots_allowed(r, "/a.pdf?x=1")     # query breaks the anchor
    # query-string rule matches path+query
    assert not robots_allowed(r, "/search?q=test")
    assert robots_allowed(r, "/search")
    # allow wins a length tie
    tie = parse_robots("User-agent: *\nDisallow: /x/\nAllow: /x*\n")
    assert robots_allowed(tie, "/x/a")
    # empty Disallow: is allow-all (no rule), not 'disallow nothing-prefix'
    assert robots_allowed(parse_robots("User-agent: *\nDisallow:\n"),
                          "/deep/path")
    # a path missing its leading slash still evaluates
    assert not robots_allowed(r, "private/a")


def test_url_path():
    assert _url_path("https://h.example/a/b?q=1#frag") == "/a/b?q=1"
    assert _url_path("http://h.example") == "/"
    assert _url_path("/already/path") == "/already/path"
    assert _url_path("") == "/"


def test_robots_check_distributed(spark):
    urls = spark.createDataFrame(
        [(1, "a.example", "http://a.example/public/x"),
         (2, "a.example", "http://a.example/private/x"),
         (3, "a.example", "http://a.example/private/open/x"),
         (4, "b.example", "http://b.example/anything"),  # no robots row
         (5, "a.example", None)],
        "doc_id long, host string, url string")
    robots = spark.createDataFrame(
        [("a.example",
          "User-agent: *\nDisallow: /private/\nAllow: /private/open\n")],
        "host string, robots_txt string")
    got = {r["doc_id"]: r["allowed"]
           for r in robots_check(urls, robots).collect()}
    assert got == {1: True, 2: False, 3: True, 4: True, 5: None}
    # the robots side is broadcast, not shuffled
    plan = robots_check(urls, robots)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_hostile_robots():
    # garbage lines, absurd sizes, rules before any UA line
    junk = "Disallow: /early\n" * 3 + "???\n:::\nUser-agent: *\n" \
        + "Disallow: /x\n" + "Noise-Field: y\n" * 5
    r = parse_robots(junk)
    assert robots_allowed(r, "/early")       # pre-group rules ignored
    assert not robots_allowed(r, "/x")
    # a pattern of only wildcards compiles and matches everything
    allstar = parse_robots("User-agent: *\nDisallow: ***\n")
    assert not robots_allowed(allstar, "/any")
    assert isinstance(allstar, RobotsRules)
    # crawl-delay garbage is skipped, not fatal
    assert parse_robots("User-agent: *\nCrawl-delay: soon\n"
                        ).crawl_delay is None


def test_sitemap_parse_and_build():
    from accelerator_spark.operators.robots import (
        SitemapError, parse_sitemap, sitemap_build)

    b = sitemap_build([
        dict(loc="https://x/a", lastmod="2026-01-01", priority="0.8"),
        dict(loc=" https://x/b ", changefreq="daily")])
    kind, entries = parse_sitemap(b)
    assert kind == "urlset"
    assert entries[0] == ("https://x/a", "2026-01-01", None, 0.8)
    assert entries[1] == ("https://x/b", None, "daily", None)  # loc strips
    # gzipped sitemapindex
    bi = sitemap_build([dict(loc="https://x/s1.xml")],
                       kind="sitemapindex", gzipped=True)
    assert bi[:2] == b"\x1f\x8b"
    assert parse_sitemap(bi) == \
        ("sitemapindex", [("https://x/s1.xml", None, None, None)])
    # hostile: bad gzip, bad xml, wrong root, entry budget, bad
    # priority tolerated as NULL, entries without <loc> skipped
    import pytest as _pytest

    with _pytest.raises(SitemapError, match="bad gzip"):
        parse_sitemap(b"\x1f\x8bxx")
    with _pytest.raises(SitemapError, match="malformed"):
        parse_sitemap(b"<urlset>")
    with _pytest.raises(SitemapError, match="unexpected root"):
        parse_sitemap(b"<feed/>")
    with _pytest.raises(SitemapError, match="budget"):
        parse_sitemap(sitemap_build(
            [dict(loc=f"https://x/{i}") for i in range(5)]),
            max_entries=3)
    ns = "http://www.sitemaps.org/schemas/sitemap/0.9"
    odd = (f'<urlset xmlns="{ns}"><url><lastmod>2026</lastmod></url>'
           f"<url><loc>https://x/ok</loc><priority>high</priority>"
           f"</url></urlset>").encode()
    kind, entries = parse_sitemap(odd)
    assert entries == [("https://x/ok", None, None, None)]


def test_sitemap_entries_distributed(spark):
    from accelerator_spark.operators.robots import (
        sitemap_build, sitemap_entries)

    df = spark.createDataFrame(
        [(1, sitemap_build([dict(loc="https://a/1"),
                            dict(loc="https://a/2")])),
         (2, sitemap_build([dict(loc="https://b/s.xml")],
                           kind="sitemapindex", gzipped=True))],
        "doc_id long, payload binary")
    rows = sorted((r["doc_id"], r["seq"], r["kind"], r["loc"])
                  for r in sitemap_entries(df).collect())
    assert rows == [(1, 0, "urlset", "https://a/1"),
                    (1, 1, "urlset", "https://a/2"),
                    (2, 0, "sitemapindex", "https://b/s.xml")]


def test_review_r9_fixes(spark):
    """Review r9: gzip-bomb budget, on_error containment, and
    query-only URL paths."""
    import gzip

    import pytest

    from accelerator_spark.operators.robots import (
        SitemapError, parse_robots, parse_sitemap, robots_allowed,
        sitemap_build, sitemap_entries)

    # (1) decompressed-size budget fails a bomb BEFORE materializing
    bomb = gzip.compress(b"0" * (1 << 20))
    with pytest.raises(SitemapError, match="budget"):
        parse_sitemap(bomb, max_bytes=1000)
    # (2) on_error="null": NULL and malformed payloads become one
    # all-NULL row instead of failing the job
    df = spark.createDataFrame(
        [(1, sitemap_build([dict(loc="https://a/1")])),
         (2, None), (3, b"<not a sitemap")],
        "doc_id long, payload binary")
    with pytest.raises(Exception):
        sitemap_entries(df).collect()
    rows = {r["doc_id"]: r
            for r in sitemap_entries(df, on_error="null").collect()}
    assert rows[1]["loc"] == "https://a/1"
    assert rows[2]["kind"] is None and rows[2]["seq"] is None
    assert rows[3]["loc"] is None
    # (3) query-only and scheme-relative URLs keep their query in the
    # match target
    from accelerator_spark.operators.robots import _url_path

    assert _url_path("http://host?q=secret") == "/?q=secret"
    assert _url_path("//host/p?a=1") == "/p?a=1"
    assert _url_path("//host?a=1") == "/?a=1"
    r = parse_robots("User-agent: *\nDisallow: /?q=\n")
    assert not robots_allowed(r, _url_path("http://host?q=secret"))


def test_review_r9b_sitemap_escaping_and_fragments():
    """Review r9 pass 2: ampersand URLs survive the builder (entity
    escaping) and fragments never leak into the robots match
    target."""
    from accelerator_spark.operators.robots import (
        _url_path, parse_sitemap, sitemap_build)

    kind, entries = parse_sitemap(sitemap_build(
        [dict(loc="https://x/p?a=1&b=<2>")]))
    assert entries[0][0] == "https://x/p?a=1&b=<2>"
    assert _url_path("http://host#f?q=1") == "/"
    assert _url_path("http://host#f/x") == "/"
    assert _url_path("http://host/p?a=1#f") == "/p?a=1"
