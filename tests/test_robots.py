"""robots.txt REP filtering (operators/robots).

Covers: RFC 9309 parsing (group selection, shared agent lines,
empty Disallow, comments, crawl-delay, sitemaps), the longest-match /
Allow-wins-ties rule against the RFC's own examples, wildcard/$
compilation to LIKE, and the distributed filter (join semantics,
missing-domain default-allow, duplicate URLs, audit view)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators import robots as R

TXT = """
# example file
User-agent: googlebot
Disallow: /private/

User-agent: *
User-agent: legacybot
Disallow: /tmp/
Allow: /tmp/public*
Disallow: /*.pdf$
Crawl-delay: 2.5

Sitemap: https://example.com/sitemap.xml
"""


def test_group_selection():
    star = R.parse_robots(TXT, "*")
    assert ("/tmp/" in [p for _, p in star["rules"]])
    assert star["crawl_delay"] == 2.5
    goog = R.parse_robots(TXT, "GoogleBot")
    assert [p for _, p in goog["rules"]] == ["/private/"]
    assert goog["crawl_delay"] is None
    legacy = R.parse_robots(TXT, "legacybot")
    assert legacy["rules"] == star["rules"]
    assert star["sitemaps"] == ["https://example.com/sitemap.xml"]


def test_empty_disallow_is_allow_all():
    r = R.parse_robots("User-agent: *\nDisallow:\n", "*")
    assert r["rules"] == []


def test_multiple_groups_after_body():
    txt = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert R.parse_robots(txt, "b")["rules"] == [(False, "/y")]


def test_matching_groups_are_combined():
    # RFC 9309 §2.2.1: two 'User-agent: *' blocks merge — the later
    # block's Disallow must not be lost (ADVICE r9, medium)
    txt = (
        "User-agent: *\nDisallow: /a/\nCrawl-delay: 1\n\n"
        "User-agent: bot\nDisallow: /only-bot/\n\n"
        "User-agent: *\nDisallow: /b/\nCrawl-delay: 9\n"
    )
    star = R.parse_robots(txt, "*")
    assert star["rules"] == [(False, "/a/"), (False, "/b/")]
    assert star["crawl_delay"] == 1.0  # first group's delay wins
    # exact-agent groups outrank '*' and merge only among themselves
    bot = R.parse_robots(txt, "bot")
    assert bot["rules"] == [(False, "/only-bot/")]


@pytest.mark.parametrize(
    "path,like",
    [
        ("/private/", "/private/%"),
        ("/*.pdf$", "/%.pdf"),
        ("/a*b", "/a%b%"),
        ("/100%_off", "/100\\%\\_off%"),
    ],
)
def test_rule_to_like(path, like):
    assert R.rule_to_like(path) == like


def _rules(spark, txt, agent="*"):
    robots = spark.createDataFrame(
        pd.DataFrame(
            {"domain": ["example.com"], "robots_txt": [txt]}
        )
    )
    return R.robots_rules_df(robots, agent)


def _filter(spark, rules, urls, **kw):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return [r["url"] for r in R.robots_filter(df, rules, **kw).collect()]


def test_longest_match_allow_wins(spark):
    rules = _rules(spark, TXT)
    urls = [
        "http://www.example.com/tmp/secret.html",  # blocked by /tmp/
        "http://example.com/tmp/public/doc.html",  # allowed: longer Allow
        "http://example.com/docs/report.pdf",  # blocked by /*.pdf$
        "http://example.com/docs/report.pdf.html",  # $ anchor: allowed
        "http://example.com/open/page.html",  # no rule: allowed
        "http://other.net/tmp/whatever",  # no robots for domain: allowed
    ]
    kept = _filter(spark, rules, urls)
    assert kept == [
        "http://example.com/tmp/public/doc.html",
        "http://example.com/docs/report.pdf.html",
        "http://example.com/open/page.html",
        "http://other.net/tmp/whatever",
    ]
    blocked = _filter(spark, rules, urls, keep_disallowed=True)
    assert blocked == [
        "http://www.example.com/tmp/secret.html",
        "http://example.com/docs/report.pdf",
    ]


def test_duplicate_urls_each_decided(spark):
    rules = _rules(spark, TXT)
    urls = ["http://example.com/open/a"] * 3
    assert len(_filter(spark, rules, urls)) == 3


def test_query_string_participates(spark):
    rules = _rules(spark, "User-agent: *\nDisallow: /search?q=*\n")
    kept = _filter(
        spark,
        rules,
        [
            "http://example.com/search?q=x",
            "http://example.com/search",
        ],
    )
    assert kept == ["http://example.com/search"]


def test_host_keyed_rules(spark):
    # strict REP scope: rules for sub.example.com must not govern
    # www.example.com when keyed by host
    rules = spark.createDataFrame(
        pd.DataFrame(
            {
                "domain": ["sub.example.com"],
                "robots_txt": ["User-agent: *\nDisallow: /\n"],
            }
        )
    )
    parsed = R.robots_rules_df(rules)
    urls = [
        "http://sub.example.com/x",
        "http://www.example.com/x",
    ]
    kept = _filter(spark, parsed, urls, key="host")
    assert kept == ["http://www.example.com/x"]
    with pytest.raises(ValueError, match="key"):
        R.robots_filter(
            spark.createDataFrame(pd.DataFrame({"url": urls})),
            parsed,
            key="nope",
        )


def test_tie_allow_wins(spark):
    rules = _rules(
        spark, "User-agent: *\nDisallow: /page\nAllow: /page\n"
    )
    assert _filter(spark, rules, ["http://example.com/page"]) == [
        "http://example.com/page"
    ]


def test_robots_delays_df(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "domain": ["a.com", "b.com", "c.com", "d.com"],
                "robots_txt": [
                    "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n",
                    "User-agent: *\nDisallow: /\n",  # no delay -> no row
                    None,
                    "User-agent: bot\nCrawl-delay: 9\n"
                    "User-agent: *\nCrawl-delay: 1\n",
                ],
            }
        )
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in R.robots_delays_df(df).collect()
    }
    assert got == {"a.com": 2.5, "d.com": 1.0}
    bot = {
        r["host"]: r["crawl_delay"]
        for r in R.robots_delays_df(df, agent="bot").collect()
    }
    assert bot["d.com"] == 9.0
    # the frame plugs straight into the frontier
    from timeseries_data_provider_spark.operators import frontier

    cands = spark.createDataFrame(
        [(f"http://a.com/p{i}", float(i)) for i in range(40)],
        "url string, priority double",
    )
    out = frontier.frontier_schedule(
        cands, window_seconds=30.0, delays=R.robots_delays_df(df)
    ).collect()
    assert len(out) == 12  # floor(30 / 2.5)


def test_robots_profile_single_pass_covers_both_frames(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "domain": ["a.com", "b.com", "c.com"],
                "robots_txt": [
                    "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
                    "Allow: /x/pub\n",
                    "User-agent: *\nCrawl-delay: 7\n",  # delay only
                    "User-agent: *\nDisallow: /q\n",    # rules only
                ],
            }
        )
    )
    prof = R.robots_profile_df(df).localCheckpoint(eager=True)
    rules = prof.filter(F.col("like_pattern").isNotNull()).drop(
        "crawl_delay"
    )
    delays = (
        prof.filter(F.col("crawl_delay").isNotNull())
        .select(F.col("domain").alias("host"), "crawl_delay")
        .distinct()
    )
    got_rules = {
        (r["domain"], r["like_pattern"], r["allow"])
        for r in rules.collect()
    }
    assert got_rules == {
        ("a.com", "/x%", False),
        ("a.com", "/x/pub%", True),
        ("c.com", "/q%", False),
    }
    got_delays = {
        r["host"]: r["crawl_delay"] for r in delays.collect()
    }
    assert got_delays == {"a.com": 2.0, "b.com": 7.0}
    # the derived rules frame drives the filter identically
    kept = _filter(spark, rules, ["http://a.com/x/secret",
                                  "http://a.com/x/pub/ok"])
    assert kept == ["http://a.com/x/pub/ok"]
