"""Streaming crawl ingestion (streaming/crawl_ingest).

Two-wave drive of the full loop: WARC archives land as files; wave 1
ingests three pages; wave 2 brings one NEW page, one near-dup of a
wave-1 page (same text, different URL — must be dropped by the
incremental dedup against the persisted index), and one RE-CRAWL
(same canonical URL -> same doc_id -> exact re-append prevented).
Also: robots rules excluding a path, non-200/non-HTML rows kept in
crawl_meta but not in docs, and replay reconciliation."""

import gzip
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_data_provider_spark.operators import robots as robots_ops
from timeseries_data_provider_spark.sources import warc as W
from timeseries_data_provider_spark.streaming import crawl_ingest as C


def _page(text):
    return f"<html><body><p>{text}</p></body></html>".encode()


def _archive(entries):
    """entries: list of (url, status, mime, html_bytes)"""
    recs = [
        {"type": "warcinfo", "uri": None, "body": b"software: t\r\n"}
    ]
    for url, status, mime, page in entries:
        recs.append(
            {
                "type": "response",
                "uri": url,
                "body": W.http_response_bytes(
                    page, status, content_type=mime
                ),
            }
        )
    return W.encode_warc(recs)


def _write(d, name, blob):
    tmp = os.path.join(d, "." + name)
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(d, name))  # rename-into-place contract


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    return str(src), str(tmp_path / "corpus")


def _docs(spark, root):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(root + "/docs").collect()
    }


def test_two_wave_crawl_dedup(spark, dirs):
    src, root = dirs
    long_a = "alpha beta gamma delta epsilon zeta eta theta " * 3
    long_b = "one two three four five six seven eight nine ten " * 3
    _write(
        src,
        "w1.warc.gz",
        _archive(
            [
                ("http://a.com/p1", 200, "text/html", _page(long_a)),
                ("http://b.com/p2", 200, "text/html", _page(long_b)),
                ("http://a.com/404", 404, "text/html", _page("gone")),
                ("http://a.com/img", 200, "image/png", b"\x89PNG"),
            ]
        ),
    )
    q = C.ingest_crawl_stream(
        spark, src, root, min_est=1.0, max_df=None, max_bucket=None
    )
    try:
        q.processAllAvailable()
        docs1 = _docs(spark, root)
        assert len(docs1) == 2
        # wave 2: new page + near-dup text at a NEW url + re-crawl
        _write(
            src,
            "w2.warc.gz",
            _archive(
                [
                    (
                        "http://c.net/fresh",
                        200,
                        "text/html",
                        _page("totally new words here now"),
                    ),
                    ("http://mirror.org/copy", 200, "text/html", _page(long_a)),
                    ("HTTP://A.com:80/p1", 200, "text/html", _page(long_a)),
                ]
            ),
        )
        q.processAllAvailable()
    finally:
        q.stop()
    docs2 = _docs(spark, root)
    # + the fresh page only: the mirror copy near-dups wave 1, and the
    # re-crawl normalizes to the same canonical URL/doc_id
    assert len(docs2) == 3
    new_texts = set(docs2.values()) - set(docs1.values())
    assert new_texts == {"totally new words here now"}
    # dup audit recorded the mirror-vs-settled pair
    dups = spark.read.parquet(root + "/dups").collect()
    assert len(dups) >= 1
    # crawl_meta keeps the excluded rows (404, image) for provenance
    meta = spark.read.parquet(root + "/crawl_meta")
    assert meta.filter(F.col("http_status") == 404).count() == 1
    assert meta.filter(F.col("mime") == "image/png").count() == 1
    # re-crawl rows share the canonical doc_id
    recrawl = meta.filter(
        F.col("url_norm") == "http://a.com/p1"
    ).select("doc_id").distinct()
    assert recrawl.count() == 1


def test_robots_rules_enforced(spark, dirs):
    src, root = dirs
    rules = robots_ops.robots_rules_df(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "domain": ["blocked.com"],
                    "robots_txt": ["User-agent: *\nDisallow: /\n"],
                }
            )
        )
    )
    _write(
        src,
        "w.warc.gz",
        _archive(
            [
                ("http://blocked.com/secret", 200, "text/html",
                 _page("should never land")),
                ("http://open.org/fine", 200, "text/html",
                 _page("allowed words here")),
            ]
        ),
    )
    q = C.ingest_crawl_stream(
        spark, src, root, robots_rules=rules,
        min_est=1.0, max_df=None, max_bucket=None,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    texts = set(_docs(spark, root).values())
    assert texts == {"allowed words here"}


def test_same_canonical_url_twice_in_batch_is_deterministic(spark, dirs):
    src, root = dirs
    # one archive fetches the same canonical URL twice with different
    # bodies: the landed text must be the DETERMINISTIC min(text)
    _write(
        src,
        "w.warc.gz",
        _archive(
            [
                ("http://a.com/p", 200, "text/html", _page("zzz later body")),
                ("HTTP://A.com:80/p", 200, "text/html", _page("aaa first body")),
            ]
        ),
    )
    q = C.ingest_crawl_stream(
        spark, src, root, min_est=1.0, max_df=None, max_bucket=None
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    docs = _docs(spark, root)
    assert list(docs.values()) == ["aaa first body"]


def test_normalize_unicode_dedups_mojibake_recrawl(spark, dirs):
    src, root = dirs
    clean = "café culture words here now"
    mojibake = clean.encode("utf-8").decode("cp1252")
    _write(
        src,
        "w.warc.gz",
        _archive(
            [
                ("http://a.com/p1", 200, "text/html", _page(clean)),
                # the same page served mojibake at another URL: with
                # normalization on, it repairs to the identical text
                # and the incremental dedup drops it
                ("http://b.net/p2", 200, "text/html", _page(mojibake)),
            ]
        ),
    )
    q = C.ingest_crawl_stream(
        spark, src, root, normalize_unicode=True,
        min_est=1.0, max_df=None, max_bucket=None,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    texts = list(_docs(spark, root).values())
    assert texts == [clean]


def test_replay_reconciliation(spark, dirs):
    src, root = dirs
    _write(
        src,
        "w.warc.gz",
        _archive(
            [("http://a.com/x", 200, "text/html", _page("some page text"))]
        ),
    )
    q = C.ingest_crawl_stream(
        spark, src, root, min_est=1.0, max_df=None, max_bucket=None
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # simulate a crash replay: re-run the batch body directly
    archives = spark.read.format("binaryFile").load(src)
    C.process_crawl_batch(
        spark, archives, 0, root, min_est=1.0, max_df=None, max_bucket=None
    )
    meta = spark.read.parquet(root + "/crawl_meta")
    assert meta.count() == 2  # duplicated audit rows present
    stats = C.reconcile_crawl_root(spark, root)
    assert stats["crawl_meta"]["after"] == 1
    assert spark.read.parquet(root + "/crawl_meta").count() == 1
    docs = spark.read.parquet(root + "/docs")
    assert docs.count() == 1  # corpus reconciliation collapsed docs too
    # idempotent
    again = C.reconcile_crawl_root(spark, root)
    assert "crawl_meta" in again


def test_frontier_emission_closes_the_loop(spark, dirs):
    """frontier_kw: each batch's out-links become the NEXT
    politeness-scheduled fetch batch at <root>/frontier_next —
    already-fetched pages (incl. THIS batch's) never reschedule, and
    a URL fetched in wave 2 disappears from the wave-2 frontier."""
    src, root = dirs
    body = "alpha beta gamma delta epsilon zeta eta theta " * 3

    def _linked_page(text, hrefs):
        anchors = "".join(f'<a href="{h}">x</a> ' for h in hrefs)
        return (
            f"<html><body><p>{text}</p><p>{anchors}</p></body></html>"
        ).encode()

    _write(
        src,
        "w1.warc.gz",
        _archive(
            [
                (
                    "http://a.com/p1",
                    200,
                    "text/html",
                    _linked_page(
                        body,
                        [
                            "/p2",           # new, same host
                            "http://b.com/x",  # new, other host
                            "/p1",           # self — must not reschedule
                            "mailto:x@y",    # junk
                        ],
                    ),
                ),
            ]
        ),
    )
    q = C.ingest_crawl_stream(
        spark,
        src,
        root,
        min_est=1.0,
        max_df=None,
        max_bucket=None,
        frontier_kw={"window_seconds": 30.0},
    )
    try:
        q.processAllAvailable()
        nxt1 = {
            r["url"]: r
            for r in spark.read.parquet(root + "/frontier_next").collect()
        }
        assert set(nxt1) == {"http://a.com/p2", "http://b.com/x"}
        assert all(r["rank"] == 1 for r in nxt1.values())
        # wave 2 fetches one of the scheduled URLs; it must vanish
        # from the new frontier while its OWN links appear
        _write(
            src,
            "w2.warc.gz",
            _archive(
                [
                    (
                        "http://a.com/p2",
                        200,
                        "text/html",
                        _linked_page(
                            "one two three four five six seven " * 3,
                            ["/p3", "http://a.com/p1"],  # p1 fetched
                        ),
                    ),
                ]
            ),
        )
        q.processAllAvailable()
        nxt2 = {
            r["url"]
            for r in spark.read.parquet(root + "/frontier_next").collect()
        }
        assert nxt2 == {"http://a.com/p3"}
    finally:
        q.stop()


def test_qualifying_fetch_beats_truncated_duplicate(spark):
    """review finding: with a text-first winner struct, an
    empty-bodied duplicate of a canonical URL sorted first and
    shadowed the good fetch — the doc vanished. The qualifies-first
    flag must land the full page (and meta must describe IT)."""
    body = "alpha beta gamma delta epsilon zeta eta theta " * 3
    archives = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1],
                "payload": [
                    _archive(
                        [
                            ("http://a.com/p", 200, "text/html",
                             _page("")),  # truncated fetch
                            ("http://a.com/p", 200, "text/html",
                             _page(body)),  # full fetch
                        ]
                    )
                ],
            }
        )
    )
    docs, meta = C.crawl_batch_to_docs(archives, min_text_chars=10)
    rows = docs.collect()
    assert len(rows) == 1
    assert rows[0]["text"].strip() == body.strip()
    m = meta.filter(F.col("n_text_chars").isNotNull()).collect()
    # both fetches share the canonical URL -> one meta feature row
    # per page row, and it describes the fetch that landed
    assert all(r["n_text_chars"] == len(rows[0]["text"]) for r in m)
