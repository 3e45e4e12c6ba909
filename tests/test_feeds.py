"""Sitemap + feed parsing (operators/feeds).

Covers: urlset rows (loc/lastmod/priority), sitemapindex recursion
rows, RSS items (text links, CDATA titles), Atom entries (href
links), entity decoding, hostile/truncated tolerance (fewer rows,
never an exception), and the Spark fan-out."""

import pandas as pd

from timeseries_data_provider_spark.operators import feeds as FD

SITEMAP = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://example.com/a?x=1&amp;y=2</loc>
       <lastmod>2026-01-02</lastmod><priority>0.8</priority></url>
  <url><loc> https://example.com/b </loc></url>
  <url><lastmod>no loc, skipped</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://example.com/sitemap-1.xml</loc>
           <lastmod>2026-02-01</lastmod></sitemap>
</sitemapindex>"""

RSS = """<rss version="2.0"><channel>
  <title>Chan</title>
  <item><title><![CDATA[Post <1>]]></title>
        <link>https://example.com/post1</link>
        <pubDate>Mon, 02 Feb 2026 00:00:00 GMT</pubDate></item>
  <item><link>https://example.com/post2</link></item>
  <item><title>linkless, skipped</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>A Feed</title>
  <entry><title>E1</title>
    <link rel="alternate" href="https://example.com/e1"/>
    <updated>2026-03-01T00:00:00Z</updated></entry>
</feed>"""


def test_sitemap_rows():
    rows = FD.parse_sitemap(SITEMAP)
    assert len(rows) == 2
    assert rows[0] == {
        "kind": "url",
        "url": "https://example.com/a?x=1&y=2",
        "lastmod": "2026-01-02",
        "priority_milli": 800,
    }
    assert rows[1]["url"] == "https://example.com/b"
    assert rows[1]["priority_milli"] is None


def test_sitemap_index_rows():
    (r,) = FD.parse_sitemap(INDEX)
    assert r["kind"] == "sitemap"
    assert r["url"] == "https://example.com/sitemap-1.xml"
    assert r["lastmod"] == "2026-02-01"


def test_rss_items():
    rows = FD.parse_feed(RSS)
    assert len(rows) == 2
    assert rows[0]["title"] == "Post <1>"  # CDATA kept verbatim
    assert rows[0]["url"] == "https://example.com/post1"
    assert rows[0]["published"].startswith("Mon, 02 Feb")
    assert rows[1]["title"] is None


def test_atom_entries():
    (r,) = FD.parse_feed(ATOM)
    assert r["url"] == "https://example.com/e1"
    assert r["title"] == "E1"
    assert r["published"] == "2026-03-01T00:00:00Z"


def test_hostile_tolerance():
    # garbage and truncations yield rows without raising
    assert FD.frontier_urls("not xml at all") == []
    assert FD.frontier_urls(SITEMAP[: len(SITEMAP) // 2]) is not None
    assert FD.parse_sitemap("<url><loc>") == []
    # bad priority is dropped, row kept
    bad = "<url><loc>http://x/p</loc><priority>high</priority></url>"
    (r,) = FD.parse_sitemap(bad)
    assert r["priority_milli"] is None


def test_frontier_unified_and_spark(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "body": [SITEMAP, RSS, ATOM],
            }
        )
    )
    rows = FD.frontier_features(df).collect()
    by_kind: dict = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert len(by_kind["url"]) == 2
    assert len(by_kind["item"]) == 3
    assert {r["doc_id"] for r in by_kind["item"]} == {2, 3}
