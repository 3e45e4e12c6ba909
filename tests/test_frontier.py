"""Crawl-frontier scheduling (operators/frontier): politeness
budgets, per-host ranking, delay clamping, exclusion join."""

from __future__ import annotations

import pytest

from timeseries_data_provider_spark.operators import frontier


def _cands(spark):
    rows = [
        # host a: 5 candidates, delay 10s -> budget floor(30/10)=3
        ("http://a.com/p1", 5.0),
        ("http://a.com/p2", 4.0),
        ("http://a.com/p3", 3.0),
        ("http://a.com/p4", 2.0),
        ("http://a.com/p5", 1.0),
        # host b: no delay row -> default 1s -> budget 30, keeps all
        ("http://b.org/x", 9.0),
        ("http://b.org/y", 9.0),  # tie -> url ASC breaks it
        # host c: hostile zero delay -> clamps to default
        ("http://c.net/only", 1.0),
    ]
    return spark.createDataFrame(rows, "url string, priority double")


def _delays(spark):
    return spark.createDataFrame(
        [("a.com", 10.0), ("c.net", 0.0)], "host string, crawl_delay double"
    )


def test_budget_rank_and_offsets(spark):
    out = frontier.frontier_schedule(
        _cands(spark), window_seconds=30.0, delays=_delays(spark)
    ).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    a = sorted(by_host["a.com"], key=lambda r: r["rank"])
    assert [r["url"] for r in a] == [
        "http://a.com/p1", "http://a.com/p2", "http://a.com/p3"
    ]  # budget 3 of 5, priority order
    assert [r["scheduled_offset_ms"] for r in a] == [0, 10000, 20000]
    b = sorted(by_host["b.org"], key=lambda r: r["rank"])
    assert [r["url"] for r in b] == ["http://b.org/x", "http://b.org/y"]
    assert [r["scheduled_offset_ms"] for r in b] == [0, 1000]
    # zero delay clamped to default, not unbounded / div-zero
    assert len(by_host["c.net"]) == 1
    assert by_host["c.net"][0]["scheduled_offset_ms"] == 0


def test_max_per_host_caps_budget(spark):
    out = frontier.frontier_schedule(
        _cands(spark), window_seconds=30.0, max_per_host=1
    ).collect()
    hosts = [r["host"] for r in out]
    assert sorted(hosts) == ["a.com", "b.org", "c.net"]
    assert all(r["rank"] == 1 for r in out)


def test_exclude_fetched(spark):
    fetched = spark.createDataFrame(
        [("http://a.com/p1",), ("http://b.org/x",)], "url string"
    )
    out = frontier.exclude_fetched(_cands(spark), fetched)
    urls = {r["url"] for r in out.collect()}
    assert "http://a.com/p1" not in urls and "http://b.org/x" not in urls
    assert len(urls) == 6


def test_guards(spark):
    with pytest.raises(ValueError):
        frontier.frontier_schedule(_cands(spark), window_seconds=0)
    with pytest.raises(ValueError):
        frontier.frontier_schedule(_cands(spark), default_delay=-1)


def test_resolve_links_matrix(spark):
    from timeseries_data_provider_spark.operators import urls as U

    base = "https://ex.com/a/b/page.html?q=1"
    rows = [
        (1, base, "https://other.org/x"),        # absolute
        (2, base, "//cdn.ex.com/img"),           # protocol-relative
        (3, base, "/root/path"),                 # root-relative
        (4, base, "sib.html"),                   # sibling
        (5, base, "../up/doc"),                  # dot segments
        (6, base, "?page=2"),                    # query-only
        (7, base, "#frag"),                      # fragment-only
        (8, base, "mailto:x@y.z"),               # non-fetchable
        (9, base, "javascript:void(0)"),         # non-fetchable
        (10, None, "x"),                         # no base
        (11, base, None),                        # no href
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, base_url string, href string"
    )
    got = {
        r["doc_id"]: r["url"]
        for r in U.resolve_links(df).collect()
    }
    assert got[1] == "https://other.org/x"
    assert got[2] == "https://cdn.ex.com/img"
    assert got[3] == "https://ex.com/root/path"
    assert got[4] == "https://ex.com/a/b/sib.html"
    assert got[5] == "https://ex.com/a/up/doc"
    assert got[6] == "https://ex.com/a/b/page.html?page=2"
    # fragment-only resolves to the page itself (fragment dropped) —
    # exclude_fetched then removes it against the fetched set
    assert got[7] == "https://ex.com/a/b/page.html?q=1"
    assert got[8] is None and got[9] is None
    assert got[10] is None and got[11] is None


def test_frontier_from_crawl_closes_the_loop(spark):
    # pages from the LAST batch emit raw hrefs; the composition must
    # resolve, canonicalize, dedupe, drop fetched, attach host
    # priority, and schedule under budgets
    links = spark.createDataFrame(
        [
            # two pages discover the same target (distinct collapses)
            ("http://a.com/p1", "/next"),
            ("http://a.com/p2", "http://A.com:80/next#frag"),
            ("http://a.com/p1", "/other"),
            # already-fetched target must vanish
            ("http://a.com/p1", "/p2"),
            # cross-host discovery with a priority row
            ("http://a.com/p1", "http://b.org/new"),
            # junk
            ("http://a.com/p1", "mailto:x@y"),
        ],
        "base_url string, href string",
    )
    fetched = spark.createDataFrame(
        [("http://a.com/p1",), ("http://a.com/p2",)], "url string"
    )
    prio = spark.createDataFrame(
        [("b.org", 9.0)], "host string, priority double"
    )
    from timeseries_data_provider_spark.operators import frontier

    out = frontier.frontier_from_crawl(
        links, fetched, host_priorities=prio
    ).collect()
    rows = {(r["host"], r["url"]): r for r in out}
    assert set(rows) == {
        ("a.com", "http://a.com/next"),
        ("a.com", "http://a.com/other"),
        ("b.org", "http://b.org/new"),
    }
    assert rows[("b.org", "http://b.org/new")]["priority"] == 9.0
    assert rows[("a.com", "http://a.com/next")]["priority"] == 0.0
    # per-host ranks restart at 1 and offsets follow the default delay
    a_rows = sorted(
        (r["rank"], r["scheduled_offset_ms"])
        for (h, _), r in rows.items()
        if h == "a.com"
    )
    assert a_rows == [(1, 0), (2, 1000)]


def test_long_delay_host_not_starved(spark):
    # review finding: crawl-delay > window floored the budget to 0
    # and starved the host in EVERY window; the default floors to one
    # fetch per window, min_per_host=0 restores strict budgets
    cands = spark.createDataFrame(
        [("http://slow.com/a", 1.0), ("http://slow.com/b", 2.0)],
        "url string, priority double",
    )
    delays = spark.createDataFrame(
        [("slow.com", 120.0)], "host string, crawl_delay double"
    )
    out = frontier.frontier_schedule(
        cands, window_seconds=60.0, delays=delays
    ).collect()
    assert len(out) == 1 and out[0]["url"] == "http://slow.com/b"
    strict = frontier.frontier_schedule(
        cands, window_seconds=60.0, delays=delays, min_per_host=0
    ).collect()
    assert strict == []


def test_duplicate_delay_rows_schedule_each_url_once(spark):
    # review finding (r10): the delays frame joined without per-host
    # dedup — two rows for one host (a re-fetched robots.txt)
    # duplicated every candidate URL into conflicting schedules
    cands = spark.createDataFrame(
        [("http://a.com/p1", 2.0), ("http://a.com/p2", 1.0)],
        "url string, priority double",
    )
    delays = spark.createDataFrame(
        [("a.com", 10.0), ("a.com", 15.0)],
        "host string, crawl_delay double",
    )
    out = frontier.frontier_schedule(
        cands, window_seconds=30.0, delays=delays
    ).collect()
    assert sorted(r["url"] for r in out) == [
        "http://a.com/p1", "http://a.com/p2"
    ]
    # the politest (largest) delay wins the conflict: budget
    # floor(30/15)=2, spacing 15s
    assert sorted(r["scheduled_offset_ms"] for r in out) == [0, 15000]


def test_delay_clamped_flag_surfaces_compliance(spark):
    # ADVICE (r10): a delay longer than the window silently clamps to
    # min_per_host fetches — the flag makes that auditable
    cands = spark.createDataFrame(
        [("http://slow.com/a", 1.0), ("http://fast.com/b", 1.0)],
        "url string, priority double",
    )
    delays = spark.createDataFrame(
        [("slow.com", 120.0)], "host string, crawl_delay double"
    )
    out = {
        r["host"]: r
        for r in frontier.frontier_schedule(
            cands, window_seconds=60.0, delays=delays
        ).collect()
    }
    assert out["slow.com"]["delay_clamped"] is True
    assert out["fast.com"]["delay_clamped"] is False


def test_resolve_links_replaces_existing_out_col(spark):
    # review finding (r10): re-resolving a frame that already carries
    # out_col built a duplicate-column schema and failed at runtime;
    # the column is now replaced
    from timeseries_data_provider_spark.operators import urls as U

    df = spark.createDataFrame(
        [("https://ex.com/", "a", "stale")],
        "base_url string, href string, url string",
    )
    rows = U.resolve_links(df).collect()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://ex.com/a"
    assert rows[0].asDict().keys() == {"base_url", "href", "url"}
