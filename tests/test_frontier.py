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
