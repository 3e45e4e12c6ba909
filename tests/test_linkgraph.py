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
