"""SQL robots gate (frontier.robots_match_sql): RFC 9309 longest-match
semantics, agreement with the urllib Arrow-UDF twin where their
semantics coincide, and the pinned first-match-vs-longest-match
divergence that separates them."""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

from crawler_spark import frontier as FR

ROBOTS = (
    "# comment\n"
    "User-agent: bot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: *\n"
    "Allow: /d1/ok\n"
    "Disallow: /d1/\n"
    "Disallow: /tmp\n"
)

URLS = [
    ("https://h1/d1/x", False, "/d1/"),
    ("https://h1/d1/ok/page", True, "/d1/ok"),
    ("https://h1/d1/okay", True, "/d1/ok"),  # prefix, not segment, match
    ("https://h1/tmp/file", False, "/tmp"),
    ("https://h1/pub", True, ""),
    ("https://h1/", True, ""),
]


def _gate(spark, robots_txt, urls):
    robots = spark.createDataFrame(
        [("h1", robots_txt)], "host string, robots_txt string"
    )
    fr = spark.createDataFrame(
        [("h1", u) for u in urls], "host string, url string"
    )
    return {
        r["url"]: (r["allowed"], r["rule"])
        for r in FR.robots_match_sql(fr, robots).collect()
    }


def test_longest_match_hand_cases(spark):
    got = _gate(spark, ROBOTS, [u for u, _, _ in URLS])
    for u, allowed, rule in URLS:
        assert got[u] == (allowed, rule), (u, got[u])


def test_agrees_with_urllib_twin(spark):
    """With Allow listed before Disallow, CPython's first-match order
    coincides with RFC longest-match on this corpus — the SQL gate and
    the urllib UDF twin must agree verdict-for-verdict."""
    rp = RobotFileParser()
    rp.parse(ROBOTS.splitlines())
    got = _gate(spark, ROBOTS, [u for u, _, _ in URLS])
    for u, _, _ in URLS:
        assert got[u][0] == rp.can_fetch("*", u), u


def test_pinned_divergence_first_match_vs_longest(spark):
    """Disallow-before-Allow: urllib (first match in file order) denies
    /d1/ok/page, RFC 9309 (longest match) allows it.  The SQL gate is
    the RFC side; the urllib UDF stays the reference-faithful twin."""
    txt = "User-agent: *\nDisallow: /d1/\nAllow: /d1/ok\n"
    rp = RobotFileParser()
    rp.parse(txt.splitlines())
    got = _gate(spark, txt, ["https://h1/d1/ok/page"])
    assert got["https://h1/d1/ok/page"] == (True, "/d1/ok")
    assert rp.can_fetch("*", "https://h1/d1/ok/page") is False


def test_consecutive_user_agent_lines_share_rules(spark):
    """'User-agent: *' anywhere in a CONSECUTIVE run of UA lines makes
    the run's rules apply to * (RFC group semantics via the lag+cumsum
    run detector)."""
    txt = "User-agent: a\nUser-agent: *\nDisallow: /x\n"
    got = _gate(spark, txt, ["https://h1/x/1", "https://h1/y"])
    assert got["https://h1/x/1"] == (False, "/x")
    assert got["https://h1/y"] == (True, "")


def test_plan_stays_jvm_side(spark):
    robots = spark.createDataFrame(
        [("h1", ROBOTS)], "host string, robots_txt string"
    )
    fr = spark.createDataFrame(
        [("h1", "https://h1/a")], "host string, url string"
    )
    plan = (
        FR.robots_match_sql(fr, robots)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_crawl_delay_star_group_min_wins(spark):
    """Crawl-delay: decoy bot-group value ignored; duplicate '*'
    declarations take the min; hosts without a delay emit no row."""
    robots = spark.createDataFrame(
        [
            ("h1", "User-agent: bot\nCrawl-delay: 99\n\n"
                   "User-agent: *\nCrawl-delay: 4\nDisallow: /x\nCrawl-delay: 7\n"),
            ("h2", "User-agent: *\nDisallow: /y\n"),
        ],
        "host string, robots_txt string",
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in FR.robots_crawl_delay_sql(robots).collect()
    }
    assert got == {"h1": 4}


def test_robots_sitemaps_discovery(spark):
    """Sitemap: directives are group-independent and key-case-
    insensitive; comments and relative/non-http values drop; repeats
    dedupe; a directive inside a bot group still counts."""
    from crawler_spark.frontier import robots_sitemaps

    body = (
        "User-agent: bot\n"
        "Disallow: /\n"
        "Sitemap: https://a.example.com/inside-group.xml\n"
        "\n"
        "User-agent: *\n"
        "SITEMAP:https://a.example.com/s.xml\n"
        "sitemap:  https://cdn.example.net/a.xml.gz  \n"
        "# Sitemap: https://a.example.com/commented.xml\n"
        "Sitemap: /relative.xml\n"
        "Sitemap: ftp://a.example.com/ftp.xml\n"
        "Sitemap: https://a.example.com/s.xml\n"
    )
    df = spark.createDataFrame(
        [("a.example.com", body)], "host string, robots_txt string"
    )
    got = sorted(r["sitemap_url"] for r in robots_sitemaps(df).collect())
    assert got == [
        "https://a.example.com/inside-group.xml",
        "https://a.example.com/s.xml",
        "https://cdn.example.net/a.xml.gz",
    ]
