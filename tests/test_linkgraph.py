"""Link-graph PageRank + host graph (operators/linkgraph).

Covers: exact equality against an independent Python replay of the
integer recurrence (several graph shapes incl. dangling nodes and
parallel edges), ordering sanity (hub > leaf), mass conservation
bound, empty/zero-iteration edges, html_links extraction, and the
host-edge aggregation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators import htmltext, linkgraph


def _py_pagerank(edges, iterations=10, d=850, scale=10**12):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    base = (1000 - d) * (scale // n)
    for _ in range(iterations):
        dangling = sum(r for v, r in rank.items() if v not in out)
        incoming = {v: 0 for v in nodes}
        for s, t in edges:
            incoming[t] += rank[s] // out[s]
        rank = {
            v: (base + d * (incoming[v] + dangling // n)) // 1000
            for v in nodes
        }
    return rank


GRAPHS = {
    "triangle": [(1, 2), (2, 3), (3, 1)],
    "hub": [(1, 4), (2, 4), (3, 4), (4, 1)],
    "dangling": [(1, 2), (1, 3), (2, 3)],  # 3 has no out-edges
    "parallel": [(1, 2), (1, 2), (2, 1)],
}


@pytest.mark.parametrize("name", list(GRAPHS))
def test_matches_python_replay_exactly(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"])
    )
    got = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank_exact(df, iterations=8).collect()
    }
    assert got == _py_pagerank(edges, iterations=8)


def test_hub_outranks_leaves(spark):
    df = spark.createDataFrame(
        pd.DataFrame(GRAPHS["hub"], columns=["src", "dst"])
    )
    got = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank_exact(df, iterations=30).collect()
    }
    # the 4<->1 cycle oscillates at low iteration counts; by 30 the
    # hub leads and both cycle members dominate the leaves
    assert got[4] > got[1] > got[2] == got[3]


def test_mass_bound(spark):
    df = spark.createDataFrame(
        pd.DataFrame(GRAPHS["dangling"], columns=["src", "dst"])
    )
    total = (
        linkgraph.pagerank_exact(df, iterations=5)
        .agg(F.sum("rank"))
        .first()[0]
    )
    # floors only ever LEAK mass, never create it
    assert 0 < total <= 10**12


def test_zero_iterations_is_uniform(spark):
    df = spark.createDataFrame(
        pd.DataFrame(GRAPHS["triangle"], columns=["src", "dst"])
    )
    got = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank_exact(df, iterations=0).collect()
    }
    assert set(got.values()) == {10**12 // 3}


def test_html_links_extraction(spark):
    page = (
        '<p>x <a href="http://a.com/1">one</a></p>'
        '<svg><a href="http://ghost/">no</a></svg>'
        '<div><a href="/rel">rel</a><a>no-href</a>'
        '<a href="http://b.net/2">two</a></div>'
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "html": [page]})
    )
    rows = sorted(
        htmltext.html_links(df).collect(), key=lambda r: r["link_idx"]
    )
    # svg subtree is skip-guarded? anchors inside svg still carry
    # hrefs in the document — the extractor records links OUTSIDE
    # skip subtrees only
    assert [r["href"] for r in rows] == [
        "http://a.com/1",
        "/rel",
        "http://b.net/2",
    ]


def test_host_edges(spark):
    links = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "http://a.com/p1",
                    "http://a.com/p1",
                    "http://a.com/p2",
                    "http://b.net/x",
                ],
                "href": [
                    "http://b.net/t",
                    "http://b.net/u",
                    "/relative/skipped",
                    "http://sub.a.com/back",
                ],
            }
        )
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in linkgraph.host_edges(links).collect()
    }
    assert got == {("a.com", "b.net"): 2, ("b.net", "a.com"): 1}


def test_html_links_anchor_text(spark):
    from timeseries_data_provider_spark.operators import htmltext

    html = (
        '<p><a href="/a">First  Link</a> and '
        '<a href="/b"><b>bold</b> text</a> and '
        '<a href="/c"><img src="i.png"></a> and '
        '<a href="/d">outer <a href="/e">inner</a></a></p>'
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = {
        r["href"]: r["anchor_text"]
        for r in htmltext.html_links(df).collect()
    }
    assert rows["/a"] == "First Link"  # whitespace collapsed
    assert rows["/b"] == "bold text"   # inline markup transparent
    assert rows["/c"] == ""            # image-only anchor
    # nested anchors: inner text counts toward both open anchors
    assert rows["/e"] == "inner"
    assert "inner" in rows["/d"] and "outer" in rows["/d"]


def test_anchor_text_agg_profile(spark):
    from timeseries_data_provider_spark.operators import linkgraph

    links = spark.createDataFrame(
        [
            # three pages call /target "Home Page", one calls it "hp"
            ("http://a.com/1", "/target", "Home Page"),
            ("http://a.com/2", "http://A.com:80/target#x", "Home Page"),
            ("http://a.com/3", "/target", "Home Page"),
            ("http://a.com/4", "/target", "hp"),
            # an empty (image) anchor counts refs, not texts
            ("http://a.com/5", "/target", ""),
            # unrelated target
            ("http://a.com/1", "http://b.org/z", "Other"),
        ],
        "base_url string, href string, anchor_text string",
    )
    got = {
        r["url"]: r
        for r in linkgraph.anchor_text_agg(links).collect()
    }
    t = got["http://a.com/target"]
    assert t["n_refs"] == 5
    assert t["n_texts"] == 2
    assert t["top_text"] == "Home Page" and t["top_text_n"] == 3
    o = got["http://b.org/z"]
    assert (o["n_refs"], o["n_texts"], o["top_text"]) == (1, 1, "Other")


def test_anchor_text_agg_tie_breaks_lexicographically(spark):
    from timeseries_data_provider_spark.operators import linkgraph

    links = spark.createDataFrame(
        [
            ("http://a.com/1", "/t", "zebra"),
            ("http://a.com/2", "/t", "apple"),
        ],
        "base_url string, href string, anchor_text string",
    )
    r = linkgraph.anchor_text_agg(links).collect()[0]
    assert r["top_text"] == "apple" and r["top_text_n"] == 1


def test_hrefless_inner_anchor_does_not_steal_close(spark):
    # review finding: </a> of an href-less inner <a> must not pop the
    # outer link's text accumulator early
    from timeseries_data_provider_spark.operators import htmltext

    html = '<p><a href="/x">Read <a>more</a> now</a></p>'
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = {
        r["href"]: r["anchor_text"]
        for r in htmltext.html_links(df).collect()
    }
    assert rows == {"/x": "Read more now"}
