#!/usr/bin/env python
"""End-to-end CRAWL -> training-shards demo (the crawl-front-end
counterpart of tools/build_corpus_demo.py; every stage's contract is
asserted, output checked into build_crawl_demo_output.txt).

Pipeline driven here, all real operators:

 1. synthesize a small crawl: 6 .warc.gz archives (Common Crawl
    layout) holding 240 HTML pages across 4 domains — including a
    robots-blocked domain, 404s, image responses, boilerplate-heavy
    pages, exact mirrors (same text at new URLs), and re-crawls
    (same canonical URL, messy casing);
 2. stream them through streaming/crawl_ingest.ingest_crawl_stream
    (robots compliance + URL canonicalization + HTML->text +
    incremental MinHash dedup against the growing signature index);
 3. crash-replay one batch body and reconcile_crawl_root back to the
    no-crash state;
 4. curate the landed corpus (lang gate vacuous here) -> BPE-counted
    token-budget selection -> chunk/pack -> fixed training shards
    with manifest;
 5. close the crawl LOOP (r10): the stream also emits each batch's
    politeness-scheduled NEXT fetch list (frontier_kw) — assert the
    schedule excludes everything already fetched;
 6. structure-preserving Markdown conversion of the same pages
    (operators/markdown) and a seeded deterministic shuffled
    training order in the shard writer;
 7. print per-stage counts; exit nonzero on any broken contract.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from timeseries_data_provider_spark.operators import pipeline, robots  # noqa: E402
from timeseries_data_provider_spark.session import get_spark  # noqa: E402
from timeseries_data_provider_spark.sources import warc  # noqa: E402
from timeseries_data_provider_spark.streaming import crawl_ingest  # noqa: E402

WORDS = (
    "data spark shard corpus token window filter sample batch merge "
    "scan join group order value stream page text crawl model"
).split()


def page_html(i: int) -> str:
    body = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(30))
    nav = '<div><a href="/a">one</a> <a href="/b">two</a></div>'
    return (
        f"<html lang=\"en\"><head><title>Page {i}</title></head>"
        f"<body><h1>Heading {i}</h1><p>{body} unique{i}</p>{nav}"
        "</body></html>"
    )


def main() -> int:
    spark = get_spark("crawl-demo")
    tmp = tempfile.mkdtemp(prefix="crawl_demo_")
    src = os.path.join(tmp, "incoming")
    root = os.path.join(tmp, "corpus")
    shards = os.path.join(tmp, "shards")
    os.makedirs(src)
    failures = 0

    def check(name, ok, detail=""):
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
        if not ok:
            failures += 1

    # 1. synthesize the crawl -------------------------------------------
    domains = ["good.com", "blog.net", "news.org", "spam.example"]
    n_pages = 240
    entries_per_archive = n_pages // 6
    archive_id = 0
    for a in range(6):
        entries = []
        for j in range(entries_per_archive):
            i = a * entries_per_archive + j
            dom = domains[i % 4]
            if i % 29 == 0:
                entries.append(
                    (f"http://{dom}/gone/{i}", 404, "text/html",
                     page_html(i).encode())
                )
            elif i % 31 == 0:
                entries.append(
                    (f"http://{dom}/img/{i}.png", 200, "image/png",
                     b"\x89PNG fake")
                )
            elif i % 13 == 0 and i >= 40:
                # exact mirror of an earlier page at a NEW url
                entries.append(
                    (f"http://{dom}/mirror/{i}", 200, "text/html",
                     page_html(i - 40).encode())
                )
            elif i % 17 == 0 and i >= 40:
                # re-crawl: messy casing of an earlier canonical URL
                orig = i - 40
                odom = domains[orig % 4]
                entries.append(
                    (f"HTTP://{odom.upper()}:80/page/{orig}", 200,
                     "text/html", page_html(orig).encode())
                )
            else:
                entries.append(
                    (f"http://{dom}/page/{i}", 200, "text/html",
                     page_html(i).encode())
                )
        recs = [{"type": "warcinfo", "uri": None, "body": b"demo\r\n"}]
        for url, status, mime, body in entries:
            recs.append(
                {
                    "type": "response",
                    "uri": url,
                    "body": warc.http_response_bytes(body, status, mime),
                }
            )
        blob = warc.encode_warc(recs)
        t = os.path.join(src, f".a{archive_id}.warc.gz")
        with open(t, "wb") as f:
            f.write(blob)
        os.replace(t, os.path.join(src, f"a{archive_id}.warc.gz"))
        archive_id += 1

    rules = robots.robots_rules_df(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "domain": ["spam.example"],
                    "robots_txt": ["User-agent: *\nDisallow: /\n"],
                }
            )
        )
    )

    # 2. stream it in ----------------------------------------------------
    q = crawl_ingest.ingest_crawl_stream(
        spark, src, root, robots_rules=rules,
        min_est=1.0, max_df=None, max_bucket=None,
        frontier_kw={"window_seconds": 30.0},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    docs = spark.read.parquet(root + "/docs")
    meta = spark.read.parquet(root + "/crawl_meta")
    n_docs = docs.count()
    check("stream landed docs", n_docs > 100, f"docs={n_docs}")
    check(
        "robots: blocked domain never lands",
        meta.filter(F.col("url_norm").contains("spam.example")).count()
        == 0
        and docs.count() > 0,
    )
    check(
        "provenance keeps excluded rows",
        meta.filter(F.col("http_status") == 404).count() > 0
        and meta.filter(F.col("mime") == "image/png").count() > 0,
        f"meta={meta.count()}",
    )
    dups = spark.read.parquet(root + "/dups")
    check("mirrors detected as dups", dups.count() > 0, f"dups={dups.count()}")
    # every landed text is unique (mirrors dropped, re-crawls converged)
    check(
        "corpus is exact-dedup-clean",
        docs.select("text").distinct().count() == n_docs,
    )

    # 2b. the crawl loop is CLOSED: the last batch emitted the next
    # politeness-scheduled fetch list; nothing already fetched may
    # reschedule
    frontier_next = spark.read.parquet(root + "/frontier_next")
    fetched_urls = {
        r["url_norm"]
        for r in meta.select("url_norm").distinct().collect()
        if r["url_norm"]
    }
    nxt = frontier_next.collect()
    check(
        "frontier schedules discovered URLs",
        len(nxt) > 0 and all(r["url"] not in fetched_urls for r in nxt),
        f"next={len(nxt)}",
    )
    # pin the ACTUAL per-host politeness ladder (review finding: a
    # rank>=1 / offset>=0 check was vacuous — row_number and
    # (rank-1)*delay satisfy it by construction): with the default
    # 1 s delay, each host's offsets must be exactly 0,1000,2000,...
    by_host: dict = {}
    for r in nxt:
        by_host.setdefault(r["host"], []).append(r)
    ladders_ok = all(
        sorted((r["rank"], r["scheduled_offset_ms"]) for r in rows)
        == [(k + 1, 1000 * k) for k in range(len(rows))]
        for rows in by_host.values()
    )
    check(
        "frontier politeness ladders exact",
        ladders_ok,
        f"hosts={len(by_host)}",
    )

    # 2c. structure-preserving Markdown of the same pages (r10)
    from timeseries_data_provider_spark.operators import markdown as md

    pages_df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(range(20)),
             "html": [page_html(i) for i in range(20)]}
        )
    )
    mdrows = md.html_markdown(pages_df).collect()
    check(
        "markdown keeps structure",
        all(r["markdown"].startswith(f"# Heading {r['doc_id']}")
            for r in mdrows)
        and all("[one](/a) [two](/b)" in r["markdown"] for r in mdrows),
        f"pages={len(mdrows)}",
    )

    # 3. crash-replay + reconcile ---------------------------------------
    # a crash replays a batch under ITS OWN batch_id (the checkpoint
    # re-delivers the same files with the same id) — reproduce that by
    # looking the chosen archive's original batch_id up in the audit
    n_meta = meta.count()  # pre-replay row count, captured eagerly
    archives = (
        spark.read.format("binaryFile").load(src).limit(1)
    ).localCheckpoint(eager=True)
    aid = archives.select(F.xxhash64("path").alias("a")).first()["a"]
    orig_bid = (
        meta.filter(F.col("archive_id") == aid)
        .select("batch_id")
        .first()["batch_id"]
    )
    crawl_ingest.process_crawl_batch(
        spark, archives, orig_bid, root, rules,
        min_est=1.0, max_df=None, max_bucket=None,
    )
    stats = crawl_ingest.reconcile_crawl_root(spark, root)
    docs_after = spark.read.parquet(root + "/docs").count()
    check(
        "replay + reconcile == no-crash state",
        docs_after == n_docs
        and stats["crawl_meta"]["after"] == n_meta
        and stats["crawl_meta"]["after"] < stats["crawl_meta"]["before"],
        f"{stats.get('crawl_meta')}",
    )

    # 4. budget -> pack -> shards ----------------------------------------
    corpus = (
        spark.read.parquet(root + "/docs")
        .select("doc_id", "text")
        .withColumn("n_chars", F.length("text"))
    )
    budget = 3000
    sel = pipeline.budget_select(corpus, token_budget=budget)
    n_tok = sel.agg(F.sum("n_tokens")).first()[0]
    check(
        "budget respected",
        n_tok is not None and n_tok <= budget,
        f"tokens={n_tok}/{budget}",
    )
    picked = corpus.join(sel.select("doc_id"), "doc_id").withColumn(
        "source", (F.col("doc_id") % 4).cast("string")
    )
    packed = pipeline.chunk_and_pack(picked, chunk_tokens=16, budget=64)
    check("packs exist", packed.count() > 0, f"packs={packed.count()}")
    pipeline.write_training_shards(
        picked.select("doc_id", "text"), shards, n_shards=4,
        shuffle_seed=11,
    )
    back = spark.read.parquet(shards + "/data")
    check(
        "shards lossless",
        back.count() == picked.count(),
        f"shards rows={back.count()}",
    )

    print(f"\n{'ALL STAGES PASS' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
