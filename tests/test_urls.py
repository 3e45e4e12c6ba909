"""URL canonicalization + domain operators (operators/urls).

Covers: every normalization rule (case, default/non-default ports,
slash collapse, fragment drop, query sort), NULL propagation on
invalid URLs, the PSL-lite registered-domain heuristic incl. its
stated limits, path depth, domain stats, and the broadcast blocklist
anti-join (plan pinned broadcast)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators import urls as U


def _one(spark, url, col):
    df = spark.createDataFrame(pd.DataFrame({"url": [url]}))
    return df.select(col.alias("v")).first()["v"]


@pytest.mark.parametrize(
    "raw,norm",
    [
        # case + default port + slash collapse + fragment + query sort
        (
            "HTTP://Example.COM:80//doc//5?b=2&a=1#frag",
            "http://example.com/doc/5?a=1&b=2",
        ),
        # https default port
        ("HTTPS://a.ORG:443/x", "https://a.org/x"),
        # non-default port kept
        (
            "https://cdn.example.net:8443/img//9.png?x=%20y",
            "https://cdn.example.net:8443/img/9.png?x=%20y",
        ),
        # empty path -> "/"
        ("http://example.com", "http://example.com/"),
        # empty query drops "?"
        ("http://example.com/a?", "http://example.com/a"),
        # lone "&" separators filtered
        ("http://example.com/a?&&b=1&", "http://example.com/a?b=1"),
        # already canonical is a fixpoint
        ("http://example.com/a/b?x=1", "http://example.com/a/b?x=1"),
    ],
)
def test_normalize(spark, raw, norm):
    assert _one(spark, raw, U.url_normalize(F.col("url"))) == norm


def test_normalize_is_idempotent(spark):
    raw = "HTTP://Example.COM:80//doc//5?b=2&a=1#frag"
    once = _one(spark, raw, U.url_normalize(F.col("url")))
    again = _one(spark, once, U.url_normalize(F.col("url")))
    assert once == again


@pytest.mark.parametrize(
    "url", ["not a url at all", "::::", "", None]
)
def test_invalid_propagates_null(spark, url):
    df = spark.createDataFrame(pd.DataFrame({"url": [url]}))
    r = df.select(
        U.url_normalize(F.col("url")).alias("n"),
        U.url_host(F.col("url")).alias("h"),
        U.url_registered_domain(U.url_host(F.col("url"))).alias("d"),
    ).first()
    assert r["n"] is None and r["h"] is None and r["d"] is None


@pytest.mark.parametrize(
    "host,dom",
    [
        ("www.blog.example.co.uk", "example.co.uk"),
        ("a.b.example.com.au", "example.com.au"),
        ("cdn.example.net", "example.net"),
        ("example.net", "example.net"),
        ("localhost", "localhost"),
        # stated heuristic limit: 2-char TLD + known second level
        # always takes 3 labels, even for a real 2-label domain
        ("co.uk", "co.uk"),
    ],
)
def test_registered_domain(spark, host, dom):
    df = spark.createDataFrame(pd.DataFrame({"h": [host]}))
    assert (
        df.select(U.url_registered_domain(F.col("h")).alias("d")).first()[
            "d"
        ]
        == dom
    )


@pytest.mark.parametrize(
    "url,depth",
    [
        ("http://x.com", 0),
        ("http://x.com/", 0),
        ("http://x.com/a", 1),
        ("http://x.com//a//b/c.png?q=1", 3),
    ],
)
def test_path_depth(spark, url, depth):
    assert _one(spark, url, U.url_path_depth(F.col("url"))) == depth


def test_domain_stats(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "http://a.example.com/1",
                    "https://b.example.com/2",
                    "http://other.net/3",
                ],
                "text": ["xx", "yyy", "z"],
            }
        )
    )
    rows = {
        r["domain"]: r.asDict() for r in U.domain_stats(df).collect()
    }
    assert rows["example.com"]["n_docs"] == 2
    assert rows["example.com"]["n_chars"] == 5
    assert rows["other.net"]["n_docs"] == 1


def test_drop_blocklisted_broadcasts(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "http://spam.example.com/1",
                    "http://keep.net/2",
                ]
            }
        )
    )
    blocked = spark.createDataFrame(
        pd.DataFrame({"domain": ["example.com"]})
    )
    out = U.drop_blocklisted(df, blocked)
    assert [r["url"] for r in out.collect()] == ["http://keep.net/2"]
    assert "__dom" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
