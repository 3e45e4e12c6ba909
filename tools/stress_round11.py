#!/usr/bin/env python
"""Round-11 scale-stress probes (BASELINE.md §C rows; same
assert-then-time protocol as tools/stress_round4-10.py — each probe
asserts the operator's correctness invariant, then prints one JSON
line).

bm25hot    BM25 retrieval with a STOP-WORD query term over a 64x
           corpus (320k docs, every doc contains 'the'): `matched`
           becomes corpus-sized through one per-query window
           partition. Asserts the WindowGroupLimit partial top-k is
           in the plan (it bounds the exchange to k rows per
           partition before the shuffle — the cosine_topk_batch
           methodology) and that the top-k is exactly the 10 planted
           equal-length needle docs in tf order; the stop word's idf
           floors to 0 milli so it cannot perturb ranking. Also
           exercises the r11 dl semi-join prune (degrades gracefully
           here: the stop word matches every doc).

anchorsc   Anchor-text profiles under the SELF-CLOSING <a/> adversary
           (the r10 review finding: a stale <a/> stack entry stole
           the NEXT anchor's text): 200k pages each carrying a
           self-closing anchor to /x immediately before a labeled
           anchor to /page on the same target. Asserts ALL /x edges
           have empty anchor text and ALL /page edges carry their
           exact label — then the aggregated per-target profiles
           credit labels only to /page targets. Extends the r10
           anchortext row (clean-class HTML only) to the adversary.

Usage: python tools/stress_round11.py [bm25hot|anchorsc]
Env: STRESS_BM25_N (default 320000), STRESS_ANCHORSC_N (default
200000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from timeseries_data_provider_spark.session import get_spark  # noqa: E402


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


def probe_bm25hot(spark) -> None:
    n = int(os.environ.get("STRESS_BM25_N", "320000"))
    from timeseries_data_provider_spark.operators import text as T

    # doc i: 'the' + (1 + i%5) copies of a doc-unique filler; docs
    # 0..9 additionally carry 'needle' with tf = 20-i and filler
    # padding i so their dl is a CONSTANT 21 — ranking among them is
    # purely tf DESC, i.e. doc_id ASC
    k = 10
    filler = F.concat(F.lit(" x"), F.col("id").cast("string"))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the"),
            F.repeat(
                filler,
                F.when(F.col("id") < k, F.col("id").cast("int")).otherwise(
                    (F.col("id") % 5).cast("int") + 1
                ),
            ),
            F.when(
                F.col("id") < k,
                F.repeat(F.lit(" needle"), 20 - F.col("id").cast("int")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    out = T.bm25_topk(docs, ["the needle"], k=k)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, (
        "partial top-k must bound the per-query exchange"
    )
    t0 = time.perf_counter()
    rows = out.collect()
    dt = round(time.perf_counter() - t0, 2)
    assert len(rows) == k, len(rows)
    got = [(r["rank"], r["doc_id"], r["n_terms_hit"]) for r in rows]
    want = [(r + 1, r, 2) for r in range(k)]
    assert sorted(got) == want, got[:12]
    # the stop word hits every doc but its idf ~ ln(1 + 0.5/(N+0.5))
    # floors to 0 milli-units — corpus-sized matched, zero signal
    assert all(r["bm25_milli"] > 0 for r in rows)
    _emit(
        "bm25hot",
        n_docs=n,
        k=k,
        secs=dt,
        docs_per_sec=int(n / dt),
        window_group_limit=True,
    )


def probe_anchorsc(spark) -> None:
    n = int(os.environ.get("STRESS_ANCHORSC_N", "200000"))
    from timeseries_data_provider_spark.operators import htmltext, linkgraph

    tgt = (F.col("id") % 50_000).cast("string")
    pages = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit('<p><a href="http://t'),
            tgt,
            F.lit('.org/x"/>filler text <a href="http://t'),
            tgt,
            F.lit('.org/page">Label '),
            tgt,
            F.lit("</a></p>"),
        ).alias("html"),
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    links = htmltext.html_links(pages).localCheckpoint(eager=True)
    dt_parse = round(time.perf_counter() - t0, 2)
    x_bad = (
        F.col("href").endswith("/x") & (F.col("anchor_text") != "")
    ).cast("long")
    page_ok = (
        F.col("href").endswith("/page")
        & (
            F.col("anchor_text")
            == F.concat(F.lit("Label "), F.regexp_extract("href", r"t(\d+)\.org", 1))
        )
    ).cast("long")
    agg = links.agg(
        F.count(F.lit(1)).alias("edges"),
        F.sum(x_bad).alias("n_bad_x"),
        F.sum(page_ok).alias("n_page_ok"),
    ).first()
    assert int(agg["edges"]) == 2 * n, agg
    assert int(agg["n_bad_x"]) == 0, (
        "self-closing <a/> stole a later anchor's text"
    )
    assert int(agg["n_page_ok"]) == n, agg
    # aggregated profiles: labels credit only /page targets
    prof = linkgraph.anchor_text_agg(
        links.select(
            F.lit("http://src.com/").alias("base_url"),
            F.col("href"),
            F.col("anchor_text"),
        )
    )
    bad_prof = prof.filter(
        F.col("url").endswith("/x")
        & F.col("top_text").startswith("Label")
    ).count()
    assert bad_prof == 0, bad_prof
    _emit(
        "anchorsc",
        n_pages=n,
        n_edges=2 * n,
        parse_secs=dt_parse,
        pages_per_sec=int(n / dt_parse),
    )


def main() -> None:
    which = sys.argv[1:] or ["bm25hot", "anchorsc"]
    spark = get_spark("tdps-stress-r11")
    for name in which:
        globals()[f"probe_{name}"](spark)
    spark.stop()


if __name__ == "__main__":
    main()
