"""RFC 9309 kernel goldens (ferenda_spark/robots.py) and the zero-
shuffle verdict operator (operators/crawl.py)."""

from ferenda_spark.robots import parse_robots, rule_pattern


def test_rule_pattern_translation():
    assert rule_pattern("/private/") == "^/private/"
    assert rule_pattern("/*?utm_") == "^/.*\\?utm_"
    assert rule_pattern("/tmp$") == "^/tmp$"
    assert rule_pattern("/a.b+c$x") == "^/a\\.b\\+c\\$x"  # inner $ literal


def test_group_selection_and_merging():
    txt = ("User-agent: foo\nDisallow: /f\n\n"
           "User-agent: bar\nUser-agent: *\nDisallow: /a\n\n"
           "User-agent: *\nAllow: /b\n")
    # '*' crawler: both star groups combine, foo's group ignored
    got = parse_robots(txt, "*")
    assert [(a, r) for a, r, _, _ in got] == [(False, "/a"), (True, "/b")]
    # exact token beats star groups entirely
    got = parse_robots(txt, "FOO")
    assert [(a, r) for a, r, _, _ in got] == [(False, "/f")]
    # 'bar' matches via its exact listing in the multi-UA group
    got = parse_robots(txt, "bar")
    assert [(a, r) for a, r, _, _ in got] == [(False, "/a")]


def test_comments_blanks_unknown_directives_empty_rules():
    txt = ("# top comment\n"
           "User-agent: *  # trailing\n"
           "Crawl-delay: 10\n"
           "Disallow:\n"          # empty = no-op
           "Disallow: /x # why\n"
           "Sitemap: https://a/s.xml\n")
    got = parse_robots(txt)
    assert [(a, r) for a, r, _, _ in got] == [(False, "/x")]


def test_priority_is_pattern_length():
    got = parse_robots("User-agent: *\nAllow: /private/ok\n"
                       "Disallow: /private/\n")
    assert [(r, p) for _, r, _, p in got] == [("/private/ok", 11),
                                              ("/private/", 9)]


def test_operator_verdicts(spark):
    from ferenda_spark.operators.crawl import robots_filter
    robots = spark.createDataFrame(
        [("a.example",
          "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
          "Disallow: /*?utm_\nDisallow: /tmp$\n"
          "Allow: /t1/\nDisallow: /t1/\n")],
        "host string, robots_txt string")
    cases = [
        ("https://a.example/public/1", True),      # no rule
        ("https://a.example/private/2", False),    # prefix
        ("https://a.example/private/ok/3", True),  # longer Allow
        ("https://a.example/p?utm_x=1", False),    # wildcard
        ("https://a.example/tmp", False),          # $ anchor
        ("https://a.example/tmp/5", True),         # $ miss
        ("https://a.example/t1/6", True),          # tie → Allow
        ("https://a.example", True),               # bare → path '/'
        ("https://other.example/private/7", True),  # no robots
        ("https://www.A.example/private/8", False),  # host normalize
    ]
    urls = spark.createDataFrame([(u,) for u, _ in cases],
                                 "url string")
    got = {r["url"]: r["allowed"]
           for r in robots_filter(urls, robots).collect()}
    assert got == dict(cases)


def test_sitemap_entries_rules(spark):
    from ferenda_spark.operators.crawl import sitemap_entries
    xml1 = ('<?xml version="1.0"?><urlset>'
            '<url><loc> https://a.example/p?a=1&amp;b=2 </loc>'
            '<lastmod>2026-01-15</lastmod>'
            '<changefreq>daily</changefreq>'
            '<priority>0.3</priority></url>'
            '<url><loc>\nhttps://a.example/q\n</loc>'
            '<priority>high</priority></url>'
            '<url><lastmod>2026-01-01</lastmod></url>'  # no loc: drop
            '</urlset>')
    xml2 = ('<sitemapindex><sitemap>'
            '<loc>https://a.example/sm-1.xml</loc>'
            '<lastmod>2026-03-01</lastmod></sitemap>'
            '<sitemap><loc>https://a.example/sm-2.xml</loc>'
            '</sitemap></sitemapindex>')
    df = spark.createDataFrame(
        [("https://a.example/s1.xml", xml1),
         ("https://a.example/si.xml", xml2),
         ("https://a.example/null.xml", None)],
        "sitemap_url string, xml string")
    got = sorted(tuple(r) for r in sitemap_entries(df).collect())
    assert got == sorted([
        ("https://a.example/s1.xml", "url",
         "https://a.example/p?a=1&b=2", "2026-01-15", "daily", 0.3),
        ("https://a.example/s1.xml", "url", "https://a.example/q",
         None, None, None),                  # junk priority → NULL
        ("https://a.example/si.xml", "sitemap",
         "https://a.example/sm-1.xml", "2026-03-01", None, None),
        ("https://a.example/si.xml", "sitemap",
         "https://a.example/sm-2.xml", None, None, None),
    ])


def test_politeness_schedule_slots(spark):
    from ferenda_spark.operators.crawl import politeness_schedule
    urls = spark.createDataFrame(
        [("https://a.example/p/%d" % i,) for i in range(25)] +
        [("https://b.example/q",)], "url string")
    got = politeness_schedule(urls, per_host_rate=10).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r["slot"])
    # 25 URLs at rate 10 → slots 10+10+5; the small host stays slot 0
    assert sorted(by_host["a.example"]) == [0] * 10 + [1] * 10 + [2] * 5
    assert by_host["b.example"] == [0]
    # deterministic across runs (md5 rank, not partition order)
    again = politeness_schedule(urls, per_host_rate=10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_frontier_expand_semantics(spark):
    """Relative links dropped, fragments stripped (and deduped with
    the bare URL), seen URLs anti-joined, empty-anchor links kept,
    per-host cap enforced."""
    from ferenda_spark.operators.crawl import frontier_expand
    pages = spark.createDataFrame([
        ('<a href="https://a.com/1">x</a> <a href="/rel">r</a>',),
        ('<a href="https://a.com/1#frag">x</a>'
         ' <a href="https://a.com/2"></a>',),        # empty anchor kept
        ('<a href="https://b.com/1">y</a> <a href="https://b.com/2">y</a>'
         ' <a href="https://b.com/3">y</a>',),
        ('<a href="ftp://c.com/1">z</a>',),           # non-http dropped
    ], "text string")
    seen = spark.createDataFrame([("https://a.com/2",)], "url string")
    got = frontier_expand(pages, seen, per_host_cap=2)
    rows = {(r.url, r.host) for r in got.collect()}
    urls = {u for u, _ in rows}
    assert "https://a.com/1" in urls          # fragment variant deduped
    assert "https://a.com/2" not in urls      # seen
    assert not any(u.startswith(("ftp", "/")) for u in urls)
    assert len([u for u in urls if u.startswith("https://b.com")]) == 2
    assert {h for _, h in rows} == {"a.com", "b.com"}
    assert {r["rank"] for r in got.collect()} <= {1, 2}


def test_resolve_redirects_semantics(spark):
    """Chains resolve with exact hop counts, cycles and self-loops
    come back unresolved, duplicate sources collapse to min dst, and
    a chain longer than max_hops is unresolved."""
    from ferenda_spark.operators.crawl import resolve_redirects
    rows = [("a", "b"), ("b", "c"),                 # a -2-> c
            ("x", "x"),                             # self-loop, dropped
            ("c1", "c2"), ("c2", "c1"),             # 2-cycle
            ("dup", "z2"), ("dup", "z1")]           # collapses to z1
    rows += [("l%d" % i, "l%d" % (i + 1)) for i in range(20)]  # 20-chain
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {r["url"]: (r["final"], r["hops"], r["status"])
           for r in resolve_redirects(df, max_hops=16).collect()}
    assert got["a"] == ("c", 2, "resolved")
    assert got["b"] == ("c", 1, "resolved")
    assert "x" not in got                   # self-redirect is no-op
    assert got["c1"] == (None, None, "unresolved")
    assert got["c2"] == (None, None, "unresolved")
    assert got["dup"] == ("z1", 1, "resolved")
    assert got["l0"] == (None, None, "unresolved")   # 20 > 16 hops
    assert got["l4"] == ("l20", 16, "resolved")      # exactly 16
    assert got["l19"] == ("l20", 1, "resolved")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        resolve_redirects(df, max_hops=10)  # not a power of two


def test_recrawl_priority_golden(spark):
    """Change rate × staleness: a changed re-crawl outranks an
    unchanged one at equal age; staleness breaks rate ties."""
    from ferenda_spark.operators.crawl import recrawl_priority
    caps = spark.createDataFrame([
        ("a", "2026-01-01T00:00:00Z", "v1"),
        ("a", "2026-03-01T00:00:00Z", "v2"),     # changed re-crawl
        ("b", "2026-01-01T00:00:00Z", "w1"),
        ("b", "2026-03-01T00:00:00Z", "w1"),     # unchanged re-crawl
        ("c", "2026-01-01T00:00:00Z", "x1"),     # stale single capture
    ], "url string, warc_date string, digest string")
    got = {r["url"]: (r["n_captures"], r["n_versions"], r["age_days"],
                      r["priority"])
           for r in recrawl_priority(caps, "2026-03-31").collect()}
    assert got["a"] == (2, 2, 30, 30.0)
    assert got["b"] == (2, 1, 30, 15.0)
    assert got["c"] == (1, 1, 89, 89.0)
    order = [r["url"] for r in
             recrawl_priority(caps, "2026-03-31").collect()]
    assert order == ["c", "a", "b"]
