#!/usr/bin/env python
"""Round-10 scale-stress probes (BASELINE.md §C rows; same
assert-then-time protocol as tools/stress_round4-9b.py — each probe
asserts the operator's correctness invariant, then prints one JSON
line).

mdconvert  HTML -> Markdown conversion throughput (operators/markdown)
           over the q64 plant family: every converted document must
           equal the closed-form Markdown string (ONE full-table JVM
           equality aggregate — the q64-oracle expression rebuilt as a
           Spark column). Honestly a Python-rate tier (HTMLParser
           loop), recorded next to the crawl/codec rows.
knlm       Interpolated modified Kneser-Ney at 64x: trigram model
           trained on 320k docs, every doc scored with one planted-
           unique token appended (the q64-lm shape). Exact-integer
           coverage assertions + strict negativity; per-value math is
           pytest territory (tests/test_lm.py pins parity with an
           independent Python reference and per-context sum-to-1).
phash      DCT perceptual hashing (operators/imagehash.image_phash)
           over 65k unique images incl. 1,000 planted brightness-
           shifted re-encode pairs (a +6 shift on mid-range pixels
           moves only the DC coefficient): the found pair set at
           Hamming <= 2 must be exactly the plants.
zorder     Z-order clustered layout at 6.4M rows x 2 independent
           columns: decoded-row counts for a narrow slice on EACH
           column, against a linear (x-range-clustered) control that
           wins x outright and decodes ~everything for y. Measured
           via executed-plan scan metrics (planstats), the
           write_range_clustered methodology.
frontier   Politeness-capped frontier scheduling over 6.4M candidate
           URLs across 100k hosts (64 candidates each; 1k hosts carry
           a 5s crawl-delay -> budget 12, the rest default 1s ->
           budget 60): total scheduled rows and a planted host's
           exact rank/offset ladder are asserted closed-form.

zratio     zlib compression-ratio quality signal at 64x: half
           prose-like, half template-stuffed docs; EVERY template doc
           must compress better than EVERY prose doc, and a 1k-row
           sample is recomputed exactly with driver-side zlib.

cdcchunk   FastCDC gear chunking over 640 MB of binary payloads with
           planted exact AND prefix-shifted duplicates: total bytes
           exact, dedup must beat the exact-duplicate floor by 1.5x
           (the content-defined property at scale).

Usage: python tools/stress_round10.py
       [mdconvert|knlm|phash|zorder|frontier|zratio|cdcchunk]
Env: STRESS_MD_N (default 64000), STRESS_KN_N (default 320000),
STRESS_PHASH_N (default 65000), STRESS_ZORDER_N (default 6400000),
STRESS_FRONTIER_HOSTS (default 100000), STRESS_ZRATIO_N (default
320000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from timeseries_data_provider_spark.session import get_spark  # noqa: E402


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


def probe_mdconvert(spark) -> None:
    n = int(os.environ.get("STRESS_MD_N", "64000"))
    import __spark_entry__ as entry

    from timeseries_data_provider_spark.operators import markdown as md

    builder = entry._crawl_page

    def synth(batches):
        for pdf in batches:
            out = {"doc_id": [], "html": []}
            for i in pdf["doc_id"]:
                i = int(i)
                text = (
                    "alpha beta gamma delta epsilon zeta eta theta "
                    f"doc {i}"
                )
                out["doc_id"].append(i)
                out["html"].append(builder(i, text))
            yield pd.DataFrame(out)

    pages = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .mapInPandas(synth, "doc_id long, html string")
        .localCheckpoint(eager=True)
    )
    total_bytes = pages.agg(F.sum(F.length("html"))).first()[0]
    sid = F.col("doc_id").cast("string")
    text_expr = F.concat(
        F.lit("alpha beta gamma delta epsilon zeta eta theta doc "), sid
    )
    expect = F.concat(
        F.lit("# Heading "), sid, F.lit("\n\n"),
        F.lit("Alpha & beta **gamma**.\n\n"), text_expr,
        F.lit("\n\n[one](/a) [two](/b)"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("\n\n- item A\n- item B"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("\n\nshort [link text here longer](/c) tail"),
        ).otherwise(F.lit("")),
    )
    t0 = time.perf_counter()
    got = md.html_markdown(pages)
    stats = (
        got.join(pages.select("doc_id"), "doc_id")
        .agg(
            F.sum((F.col("markdown") != expect).cast("long")).alias("bad"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    dt = time.perf_counter() - t0
    assert stats["bad"] == 0, f"{stats['bad']} rows deviated"
    assert stats["n"] == n
    _emit(
        "mdconvert",
        n_pages=n,
        html_mb=round(total_bytes / 1e6, 1),
        secs=round(dt, 2),
        pages_per_sec=int(n / dt),
        mb_per_sec=round(total_bytes / 1e6 / dt, 1),
    )


def probe_knlm(spark) -> None:
    n = int(os.environ.get("STRESS_KN_N", "320000"))
    from timeseries_data_provider_spark.operators import lm

    # 40 zipf-ish common tokens per doc + one planted-unique closer:
    # every doc exercises the unseen-context backoff path at score
    # time while the model trains on real distributed counts
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"),
            ((F.col("id") * 31 + i * i) % 99991).cast("string"),
        ),
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    model = lm.kneser_ney_lm(docs, n=3)
    sizes = [t.count() for t in model["tables"]]
    train_s = round(time.perf_counter() - t0, 2)
    probe = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" zq"), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    t0 = time.perf_counter()
    agg = (
        lm.kneser_ney_score(probe, model)
        .agg(
            F.sum("n_ngrams").alias("ng"),
            F.sum((F.col("logprob_milli") < 0).cast("long")).alias("neg"),
            F.count(F.lit(1)).alias("rows"),
        )
        .first()
    )
    score_s = round(time.perf_counter() - t0, 2)
    # 41 tokens -> 39 trigrams per doc
    assert int(agg["ng"]) == n * 39, agg
    assert int(agg["neg"]) == n, agg  # every doc strictly negative
    assert int(agg["rows"]) == n
    _emit(
        "knlm",
        n_docs=n,
        corpus_tokens=n * 41,
        model_rows={o + 1: s for o, s in enumerate(sizes)},
        discounts=[
            [round(x, 4) for x in d] for d in model["discounts"]
        ],
        train_secs=train_s,
        score_secs=score_s,
        tokens_per_sec_scored=int(n * 41 / score_s),
    )


def probe_phash(spark) -> None:
    n = int(os.environ.get("STRESS_PHASH_N", "65000"))
    n_pairs = 1000
    from timeseries_data_provider_spark.operators import imagehash as IH
    from timeseries_data_provider_spark.operators import multimodal as mm

    def synth(batches):
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for i in pdf["id"]:
                i = int(i)
                if i < 2 * n_pairs:
                    base_id, shift = divmod(i, 2)
                    rng = np.random.RandomState(900000 + base_id)
                    # mid-range so the +6 shift clips nothing
                    px = (40 + rng.randint(0, 128, (48, 64))).astype(
                        np.int64
                    )
                    px = (px + 6 * shift).astype(np.uint8)
                else:
                    rng = np.random.RandomState(i)
                    px = rng.randint(0, 256, (48, 64)).astype(np.uint8)
                out["doc_id"].append(i)
                out["payload"].append(mm.encode_bmp(64, 48, px))
            yield pd.DataFrame(out)

    media = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(synth, "doc_id long, payload binary")
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    sk = IH.image_phash(media).localCheckpoint(eager=True)
    n_hashed = sk.count()
    hash_s = round(time.perf_counter() - t0, 2)
    assert n_hashed == n
    t0 = time.perf_counter()
    pairs = IH.hamming_pairs(sk, max_distance=2).collect()
    pair_s = round(time.perf_counter() - t0, 2)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    want = {(2 * k, 2 * k + 1) for k in range(n_pairs)}
    missing = want - got
    false = got - want
    assert not missing, f"{len(missing)} planted pairs missed"
    assert not false, f"{len(false)} false pairs: {sorted(false)[:5]}"
    _emit(
        "phash",
        n_images=n,
        planted_pairs=n_pairs,
        hash_secs=hash_s,
        images_per_sec=int(n / hash_s),
        pair_secs=pair_s,
        found_pairs=len(got),
    )


def probe_zorder(spark) -> None:
    import shutil
    import tempfile

    from timeseries_data_provider_spark import planstats, tables

    n = int(os.environ.get("STRESS_ZORDER_N", "6400000"))
    df = spark.range(n).select(
        F.col("id").alias("x"),
        ((F.col("id") * 48271) % n).alias("y"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    root = tempfile.mkdtemp(prefix="tdps_stress_zorder_")
    try:
        t0 = time.perf_counter()
        tables.write_zorder(
            df, f"{root}/z", ["x", "y"], num_files=32, bits=6,
            row_group_bytes=1024 * 1024,
        )
        z_write = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        tables.write_range_clustered(
            df, f"{root}/l", ["x"], num_files=32,
            row_group_bytes=1024 * 1024,
        )
        l_write = round(time.perf_counter() - t0, 2)

        def decoded(path, col):
            lo, hi = 3_200_000, 3_206_400  # 0.1% slice
            q = (
                spark.read.parquet(path)
                .filter((F.col(col) >= lo) & (F.col(col) < hi))
                .select(col)
            )
            assert q.count() == hi - lo
            q.collect()
            return max(
                s["output_rows"] for s in planstats.scan_stats(q)
            )

        zx = decoded(f"{root}/z", "x")
        zy = decoded(f"{root}/z", "y")
        lx = decoded(f"{root}/l", "x")
        ly = decoded(f"{root}/l", "y")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    assert lx <= n * 0.02, lx  # linear wins its own column outright
    assert zy * 4 <= ly, (zy, ly)  # z-order must win the OTHER column
    assert zx <= n * 0.5 and zy <= n * 0.5, (zx, zy)
    _emit(
        "zorder",
        n_rows=n,
        write_secs={"zorder": z_write, "linear": l_write},
        decoded_rows={"zx": zx, "zy": zy, "lx": lx, "ly": ly},
        y_prune_ratio=round(ly / max(zy, 1), 1),
    )


def probe_frontier(spark) -> None:
    n_hosts = int(os.environ.get("STRESS_FRONTIER_HOSTS", "100000"))
    per_host = 64
    n = n_hosts * per_host
    from timeseries_data_provider_spark.operators import frontier

    cands = spark.range(n).select(
        F.concat(
            F.lit("http://h"),
            (F.col("id") % n_hosts).cast("string"),
            F.lit(".com/p"),
            F.col("id").cast("string"),
        ).alias("url"),
        ((F.col("id") * 13) % 997).cast("double").alias("priority"),
    )
    slow = spark.range(1000).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".com"))
        .alias("host"),
        F.lit(5.0).alias("crawl_delay"),
    )
    t0 = time.perf_counter()
    sched = frontier.frontier_schedule(
        cands, window_seconds=60.0, delays=slow
    ).localCheckpoint(eager=True)
    total = sched.count()
    dt = round(time.perf_counter() - t0, 2)
    # 1k slow hosts keep 12 of 64; 99k default hosts keep 60 of 64
    assert total == 1000 * 12 + (n_hosts - 1000) * 60, total
    h0 = sorted(
        (r["rank"], r["scheduled_offset_ms"], r["priority"])
        for r in sched.filter(F.col("host") == "h0.com").collect()
    )
    assert len(h0) == 12
    assert [r[1] for r in h0] == [5000 * k for k in range(12)], h0
    # ranks follow priority DESC exactly
    pr = [r[2] for r in h0]
    assert pr == sorted(pr, reverse=True), pr
    _emit(
        "frontier",
        n_candidates=n,
        n_hosts=n_hosts,
        scheduled=total,
        secs=dt,
        urls_per_sec=int(n / dt),
    )


def probe_zratio(spark) -> None:
    n = int(os.environ.get("STRESS_ZRATIO_N", "320000"))
    from timeseries_data_provider_spark.operators import text as T

    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # half prose-like (varied tokens), half template-stuffed
        # (pathologically repetitive) — the signal the gate uses
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit("alpha beta gamma delta epsilon zeta eta "),
                ((F.col("id") * 31) % 9973).cast("string"),
                F.lit(" theta iota kappa lambda mu nu xi omicron "),
                ((F.col("id") * 17) % 9973).cast("string"),
            ),
        ).otherwise(F.lit("spam ham " * 40)).alias("text"),
    ).localCheckpoint(eager=True)
    total_bytes = docs.agg(F.sum(F.length("text"))).first()[0]
    t0 = time.perf_counter()
    got = T.compression_ratio(docs).localCheckpoint(eager=True)
    agg = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_zbytes").alias("zb"),
        F.min(
            F.when(F.col("doc_id") % 2 == 0, F.col("compression_ratio"))
        ).alias("prose_min"),
        F.max(
            F.when(F.col("doc_id") % 2 == 1, F.col("compression_ratio"))
        ).alias("spam_max"),
    ).first()
    dt = time.perf_counter() - t0
    assert agg["n"] == n
    # the ordering the quality gate relies on: EVERY template doc
    # compresses better than EVERY prose doc
    assert agg["spam_max"] < agg["prose_min"], agg
    # spot-exactness: 1k rows recomputed with driver-side zlib
    import zlib

    sample = got.join(docs, "doc_id").limit(1000).collect()
    for r in sample:
        raw = r["text"].encode()
        assert r["n_zbytes"] == len(zlib.compress(raw, 6)), r["doc_id"]
    _emit(
        "zratio",
        n_docs=n,
        text_mb=round(total_bytes / 1e6, 1),
        secs=round(dt, 2),
        mb_per_sec=round(total_bytes / 1e6 / dt, 1),
        prose_min=agg["prose_min"],
        spam_max=agg["spam_max"],
    )


def probe_cdcchunk(spark) -> None:
    n = int(os.environ.get("STRESS_CDC_N", "6400"))
    from timeseries_data_provider_spark.operators import cdc

    # 100 KB per payload; every 4th doc is an exact duplicate of its
    # predecessor and every 8th is its predecessor with a 5 KB prefix
    # inserted (the CDC win: fixed blocks would dedup NONE of those
    # shifted bytes)
    def synth(batches):
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for i in pdf["id"]:
                i = int(i)
                base = i - (i % 4 == 1) - 2 * (i % 8 == 2)
                rng = np.random.RandomState(base)
                data = rng.randint(0, 256, 100_000, dtype=np.uint8)
                payload = data.tobytes()
                if i % 8 == 2:
                    rng2 = np.random.RandomState(10_000_000 + i)
                    payload = (
                        rng2.randint(0, 256, 5_000, dtype=np.uint8)
                        .tobytes() + payload
                    )
                out["doc_id"].append(i)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    media = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(synth, "doc_id long, payload binary")
        .localCheckpoint(eager=True)
    )
    total_bytes = media.agg(F.sum(F.length("payload"))).first()[0]
    t0 = time.perf_counter()
    chunks = cdc.cdc_chunks(
        media, min_size=2048, avg_size=8192, max_size=65536
    ).localCheckpoint(eager=True)
    stats = cdc.chunk_dedup_stats(chunks).first()
    dt = time.perf_counter() - t0
    assert stats["total_bytes"] == total_bytes
    # exact duplicates alone guarantee >= n/4 payloads' bytes saved;
    # the n/8 prefix-shifted copies must contribute a further ~0.3x+
    # on top (their ~100 KB tails re-chunk identically once the gear
    # window resynchronizes — the content-defined property at scale)
    exact_dup_bytes = (n // 4) * 100_000
    assert stats["dup_bytes"] > exact_dup_bytes * 1.3, stats
    _emit(
        "cdcchunk",
        n_payloads=n,
        payload_mb=round(total_bytes / 1e6, 1),
        n_chunks=int(stats["n_chunks"]),
        dedup_ratio=float(stats["dedup_ratio"]),
        secs=round(dt, 2),
        mb_per_sec=round(total_bytes / 1e6 / dt, 1),
    )


def probe_anchortext(spark) -> None:
    n = int(os.environ.get("STRESS_ANCHOR_N", "6400000"))
    from timeseries_data_provider_spark.operators import linkgraph

    # 6.4M raw out-links: 100k distinct targets, each referenced 64x
    # from pages on 1k hosts. id%4 is CONSTANT within a target (the
    # 100k stride is divisible by 4), so targets split into two
    # closed-form classes: t%4==0 -> all 64 refs share the planted
    # common label (top_n=64, n_texts=1); otherwise all refs are
    # unique (top_n=1, n_texts=64)
    links = spark.range(n).select(
        F.concat(
            F.lit("http://h"),
            (F.col("id") % 1000).cast("string"),
            F.lit(".com/p"),
            F.col("id").cast("string"),
        ).alias("base_url"),
        F.concat(
            F.lit("http://t"),
            (F.col("id") % 100_000).cast("string"),
            F.lit(".org/page"),
        ).alias("href"),
        F.when(
            F.col("id") % 4 == 0,
            F.concat(
                F.lit("Common Label "),
                (F.col("id") % 100_000).cast("string"),
            ),
        )
        .otherwise(
            F.concat(F.lit("unique "), F.col("id").cast("string"))
        )
        .alias("anchor_text"),
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    prof = linkgraph.anchor_text_agg(links).localCheckpoint(eager=True)
    n_targets = prof.count()
    dt = round(time.perf_counter() - t0, 2)
    assert n_targets == 100_000, n_targets
    common_ok = (
        (F.col("top_text_n") == 64)
        & (F.col("n_texts") == 1)
        & F.col("top_text").startswith("Common Label ")
    )
    unique_ok = (
        (F.col("top_text_n") == 1)
        & (F.col("n_texts") == 64)
        & F.col("top_text").startswith("unique ")
    )
    agg = prof.agg(
        F.sum("n_refs").alias("refs"),
        F.sum(common_ok.cast("long")).alias("n_common"),
        F.sum(unique_ok.cast("long")).alias("n_unique"),
    ).first()
    assert int(agg["refs"]) == n
    assert int(agg["n_common"]) == 25_000, agg
    assert int(agg["n_unique"]) == 75_000, agg
    _emit(
        "anchortext",
        n_links=n,
        n_targets=n_targets,
        secs=dt,
        links_per_sec=int(n / dt),
    )


def main() -> None:
    which = sys.argv[1:] or [
        "mdconvert",
        "knlm",
        "phash",
        "zorder",
        "frontier",
        "zratio",
        "cdcchunk",
        "anchortext",
    ]
    spark = get_spark("tdps-stress-r10")
    for name in which:
        globals()[f"probe_{name}"](spark)
    spark.stop()


if __name__ == "__main__":
    main()
