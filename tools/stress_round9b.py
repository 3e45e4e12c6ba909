#!/usr/bin/env python
"""Late-round-9 scale-stress probes (BASELINE.md §C rows; same
protocol as tools/stress_round4-9.py — every probe asserts its
correctness invariant, then prints one JSON line).

crawl    End-to-end crawl-front-end throughput: N per-doc WARC
         archives (3 gzip members each, Common Crawl layout) through
         warc_responses -> html_text_features. The pages are the q64
         plant family, so every title/lang/block-count/boiler-count/
         cleaned-text is closed-form and asserted for ALL rows. An
         honest Python-rate tier (gzip + HTMLParser loops) like the
         codec rows — recorded so the crawl stage has a measured
         envelope next to jpeg/vp8l/gif.
urlnorm  JVM URL canonicalization rate: N messy URLs (three planted
         classes) through url_normalize/url_host/url_registered_
         domain/url_path_depth in ONE projection. Invariant: every
         row's normalized form equals the closed-form expectation
         (checked as a full-table JVM comparison — zero mismatches),
         and the registered-domain distinct count is exactly the
         planted class count. This is the scan-rate tier — the point
         of the row is the contrast with the Python-rate crawl tier.
clfscore Hashed-logistic scoring rate over synthetic 20-token docs:
         exact-integer milli-logits under the seeded model; invariant
         is a full-table equality against the per-class closed form
         (each doc's tokens are class-determined, so its logit is).
mkvmeta / mp3meta / exifmeta
         Metadata-walk rates for the three new routing parsers
         (EBML tracks, MP3 frame headers, EXIF IFDs) over worker-
         replicated class payloads; per-class fields asserted
         bit-for-bit against the driver-side parse.

flacdecode  FLAC decode throughput through ``audio_features``
         (codec_setup=flac.register): class clips rotate verbatim /
         fixed / mid-side stereo subframes so every prediction +
         Rice path runs worker-side; per-row peak/zc/rms asserted
         equal to the driver-side decode (the codec-tier protocol).
pdfextract  PDF build->extract chain: per-class two-page Flate PDFs;
         full-table JVM closed-form assertions on pages/title/text.
cavnar   Cavnar-Trenkle language ID at 64x: profiles trained on a
         4-language planted corpus, the same corpus classified;
         invariant is 100% accuracy (languages are genuinely
         distinct) plus the throughput envelope.

Usage: python tools/stress_round9b.py
       [crawl|urlnorm|clfscore|mkvmeta|mp3meta|exifmeta|flacdecode|
        pdfextract|cavnar]
Env: STRESS_CRAWL_N (default 64000), STRESS_URL_N (default 6400000),
STRESS_CLF_N (default 640000), STRESS_META_N (default 64000),
STRESS_FLAC_N (default 16000), STRESS_PDF_N (default 64000),
STRESS_CAVNAR_N (default 320000).
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

from timeseries_data_provider_spark.operators import (  # noqa: E402
    classifier,
    exif,
    htmltext,
    jpeg,
    mkv,
    mp3,
    urls,
)
from timeseries_data_provider_spark.session import get_spark  # noqa: E402
from timeseries_data_provider_spark.sources import warc  # noqa: E402


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


def probe_crawl(spark) -> None:
    n = int(os.environ.get("STRESS_CRAWL_N", "64000"))
    import __spark_entry__ as entry

    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta doc "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    archives = warc.synth_warc_corpus(
        docs,
        html_builder=entry._crawl_page,
        url_builder=entry._crawl_url,
    ).localCheckpoint(eager=True)
    total_bytes = archives.agg(
        F.sum(F.length("payload")).alias("b")
    ).first()["b"]
    t0 = time.perf_counter()
    pages = warc.warc_responses(archives).select(
        "doc_id",
        "http_status",
        F.col("body").cast("string").alias("html"),
    )
    feats = htmltext.html_text_features(pages)
    # full-table closed-form check, all JVM, ONE action: zero rows
    # may deviate
    deviates = (
        (F.col("title") != F.concat(
            F.lit("Doc "), F.col("doc_id").cast("string"),
            F.lit(" & friends")))
        | (F.col("n_blocks") != F.lit(4)
           + 2 * (F.col("doc_id") % 2 == 0).cast("int")
           + (F.col("doc_id") % 3 == 0).cast("int"))
        | (F.col("n_boiler_blocks") != F.lit(1)
           + (F.col("doc_id") % 3 == 0).cast("int"))
        | (~F.col("text").startswith(
            F.concat(F.lit("Heading "), F.col("doc_id").cast("string"))))
    )
    stats = feats.agg(
        F.sum(deviates.cast("long")).alias("bad"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    dt = time.perf_counter() - t0
    assert stats["bad"] == 0, f"{stats['bad']} rows deviated"
    assert stats["n"] == n, (stats["n"], n)
    _emit(
        "crawl",
        n_archives=n,
        archive_mb=round(total_bytes / 1e6, 1),
        secs=round(dt, 2),
        mb_per_sec=round(total_bytes / 1e6 / dt, 1),
        archives_per_sec=int(n / dt),
    )


def probe_urlnorm(spark) -> None:
    n = int(os.environ.get("STRESS_URL_N", "6400000"))
    import __spark_entry__ as entry  # noqa: F401  (class parity with crawl)

    raw = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 3 == 0,
            F.concat(
                F.lit("HTTP://Example"), (F.col("id") % 7).cast("string"),
                F.lit(".COM:80//doc//"), F.col("id").cast("string"),
                F.lit("?b=2&a=1#frag"),
            ),
        )
        .when(
            F.col("id") % 3 == 1,
            F.concat(
                F.lit("https://WWW.blog"), (F.col("id") % 7).cast("string"),
                F.lit(".example.CO.UK/post/"), F.col("id").cast("string"),
                F.lit("/comments"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://cdn"), (F.col("id") % 7).cast("string"),
                F.lit(".example.net:8443/img//"), F.col("id").cast("string"),
                F.lit(".png?x=1"),
            ),
        )
        .alias("url"),
    ).localCheckpoint(eager=True)
    expect = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("http://example"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".com/doc/"), F.col("doc_id").cast("string"),
                F.lit("?a=1&b=2"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("https://www.blog"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".example.co.uk/post/"), F.col("doc_id").cast("string"),
                F.lit("/comments"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://cdn"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".example.net:8443/img/"), F.col("doc_id").cast("string"),
                F.lit(".png?x=1"),
            ),
        )
    )
    t0 = time.perf_counter()
    out = raw.select(
        "doc_id",
        urls.url_normalize(F.col("url")).alias("norm"),
        urls.url_registered_domain(urls.url_host(F.col("url"))).alias(
            "dom"
        ),
        urls.url_path_depth(F.col("url")).alias("depth"),
    )
    stats = out.agg(
        F.sum((F.col("norm") != expect).cast("long")).alias("bad"),
        F.count_distinct("dom").alias("doms"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    dt = time.perf_counter() - t0
    assert stats["bad"] == 0, stats
    # classes: example{0..6}.com (7) + example.co.uk + example.net
    assert stats["doms"] == 9, stats
    assert stats["n"] == n
    _emit(
        "urlnorm",
        n_urls=n,
        secs=round(dt, 2),
        urls_per_sec=int(n / dt),
    )


def probe_clfscore(spark) -> None:
    n = int(os.environ.get("STRESS_CLF_N", "640000"))
    import hashlib

    dim = 4096
    words = [f"tok{c}" for c in range(40)]
    # per-class closed-form logit under the seeded model
    def w_of(tok: str) -> int:
        b = int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % dim
        return b % 201 - 100

    class_logit = {
        c: 7 + sum(w_of(words[(c + j) % 40]) for j in range(20))
        for c in range(10)
    }
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("tok"),
                    ((F.col("id") % 10 + j) % 40).cast("string"),
                )
                for j in range(20)
            ],
        ).alias("text"),
    ).localCheckpoint(eager=True)
    weights = classifier.seed_weights(spark, dim)
    t0 = time.perf_counter()
    scored = classifier.score_documents(docs, weights, dim, bias_milli=7)
    expect = F.element_at(
        F.array(*[F.lit(class_logit[c]) for c in range(10)]),
        (F.col("doc_id") % 10 + 1).cast("int"),
    )
    stats = scored.agg(
        F.sum((F.col("logit_milli") != expect).cast("long")).alias("bad"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    dt = time.perf_counter() - t0
    assert stats["bad"] == 0 and stats["n"] == n, stats
    tokens = n * 20
    _emit(
        "clfscore",
        n_docs=n,
        n_tokens=tokens,
        dim=dim,
        secs=round(dt, 2),
        docs_per_sec=int(n / dt),
        tokens_per_sec=int(tokens / dt),
    )


def _meta_probe(spark, probe, payloads, features_fn, expect_fn, n) -> None:
    """Shared worker-replication metadata-walk probe: class payloads
    encoded once on the driver, replicated worker-side (the encoder
    never pollutes the measurement), every output row asserted equal
    to the driver-side parse of its class."""

    def synth(batches):
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for i in pdf["doc_id"]:
                out["doc_id"].append(int(i))
                out["payload"].append(payloads[int(i) % len(payloads)])
            yield pd.DataFrame(out)

    blobs = (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .mapInPandas(synth, "doc_id long, payload binary")
        .localCheckpoint(eager=True)
    )
    total_bytes = sum(len(p) for p in payloads) * (n // len(payloads))
    t0 = time.perf_counter()
    rows = features_fn(blobs).collect()
    dt = time.perf_counter() - t0
    bad = [r for r in rows if not expect_fn(r)]
    assert not bad, bad[:3]
    _emit(
        probe,
        n_files=n,
        payload_mb=round(total_bytes / 1e6, 2),
        secs=round(dt, 2),
        files_per_sec=int(n / dt),
        rows=len(rows),
    )


def probe_mkvmeta(spark) -> None:
    n = int(os.environ.get("STRESS_META_N", "64000"))
    payloads = []
    for c in range(10):
        payloads.append(
            mkv.encode_mkv_skeleton(
                doctype="webm" if c % 2 == 0 else "matroska",
                duration_ticks=float(1000 + c),
                tracks=[
                    {
                        "track_number": 1,
                        "type_code": 1,
                        "codec_id": "V_VP9",
                        "width": 640 + c,
                        "height": 360,
                    }
                ],
                unknown_segment_size=c % 2 == 0,
            )
        )
    _meta_probe(
        spark,
        "mkvmeta",
        payloads,
        mkv.track_features,
        lambda r: r["duration_ms"] == 1000 + r["doc_id"] % 10
        and r["width"] == 640 + r["doc_id"] % 10
        and r["codec"] == "V_VP9",
        n,
    )


def probe_mp3meta(spark) -> None:
    n = int(os.environ.get("STRESS_META_N", "64000"))
    payloads = [
        mp3.encode_mp3_skeleton(
            n_frames=20 + c, bitrate_idx=9, rate_idx=0, id3_size=100 * c
        )
        for c in range(10)
    ]
    _meta_probe(
        spark,
        "mp3meta",
        payloads,
        mp3.mp3_features,
        lambda r: r["n_frames"] == 20 + r["doc_id"] % 10
        and r["duration_ms"]
        == (20 + r["doc_id"] % 10) * 1152 * 1000 // 44100
        and r["bitrate_kbps"] == 128
        and r["clean_eof"],
        n,
    )


def probe_exifmeta(spark) -> None:
    n = int(os.environ.get("STRESS_META_N", "64000"))
    payloads = []
    for c in range(10):
        img = jpeg.encode_baseline_jpeg(
            np.full((8, 8), 16 * c, dtype=np.uint8)
        )
        payloads.append(
            exif.insert_app1(
                img,
                exif.build_exif_app1(
                    make=f"Cam{c}",
                    orientation=1 + c % 8,
                    width=640 + c,
                    height=480,
                    gps=(("N", c, 30, 0, 1), ("E", 2 * c, 0, 0, 1)),
                ),
            )
        )
    _meta_probe(
        spark,
        "exifmeta",
        payloads,
        exif.exif_features,
        lambda r: r["make"] == f"Cam{r['doc_id'] % 10}"
        and r["orientation"] == 1 + r["doc_id"] % 10 % 8
        and r["exif_width"] == 640 + r["doc_id"] % 10
        and r["gps_lat_micro"]
        == (r["doc_id"] % 10) * 1_000_000 + 500_000,
        n,
    )


def probe_flacdecode(spark) -> None:
    from timeseries_data_provider_spark.operators import flac, multimodal

    n = int(os.environ.get("STRESS_FLAC_N", "16000"))
    payloads = []
    expects = []
    for c in range(10):
        rng = np.random.RandomState(6000 + c)
        if c % 3 == 2:
            s = rng.randint(-8000, 8000, 8192)
            blob = flac.encode_flac(
                s, channels=2, stereo_mode="mid_side", blocksize=2048
            )
        else:
            s = rng.randint(-8000, 8000, 8192)
            blob = flac.encode_flac(
                s,
                blocksize=2048,
                subframe="verbatim" if c % 3 == 0 else None,
            )
        payloads.append(blob)
        fs = multimodal.feature_samples(flac.decode_flac(blob))
        expects.append(
            (
                int(np.abs(fs).max()),
                int(
                    np.floor(
                        np.sqrt(
                            (1_000_000 * int((fs.astype(np.int64) ** 2).sum()))
                            // fs.size
                        )
                    )
                ),
            )
        )

    def synth(batches):
        for pdf in batches:
            out = {"doc_id": [], "kind": [], "payload": [], "byte_len": []}
            for i in pdf["doc_id"]:
                p = payloads[int(i) % 10]
                out["doc_id"].append(int(i))
                out["kind"].append("flac")
                out["payload"].append(p)
                out["byte_len"].append(len(p))
            yield pd.DataFrame(out)

    media = (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .mapInPandas(synth, multimodal.MEDIA_SCHEMA)
        .localCheckpoint(eager=True)
    )
    total_bytes = sum(len(p) for p in payloads) * (n // 10)
    t0 = time.perf_counter()
    rows = multimodal.audio_features(
        media, codec_setup=flac.register
    ).collect()
    dt = time.perf_counter() - t0
    assert len(rows) == n
    bad = [
        r
        for r in rows
        if (r["peak_abs"], r["rms_milli"]) != expects[r["doc_id"] % 10]
    ]
    assert not bad, bad[:3]
    _emit(
        "flacdecode",
        n_clips=n,
        payload_mb=round(total_bytes / 1e6, 1),
        secs=round(dt, 2),
        mb_per_sec=round(total_bytes / 1e6 / dt, 1),
        clips_per_sec=int(n / dt),
    )


def probe_pdfextract(spark) -> None:
    from timeseries_data_provider_spark.operators import pdf as pdfmod

    n = int(os.environ.get("STRESS_PDF_N", "64000"))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("spark extracts document text at scale row "),
            F.col("id").cast("string"),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    blobs = pdfmod.synth_pdf_corpus(docs).localCheckpoint(eager=True)
    total_bytes = blobs.agg(F.sum(F.length("payload"))).first()[0]
    t0 = time.perf_counter()
    feats = pdfmod.pdf_features(blobs)
    deviates = (
        (F.col("n_pages") != 2)
        | (F.col("title") != F.concat(
            F.lit("Doc "), F.col("doc_id").cast("string")))
        | (F.col("text") != F.concat(
            F.lit("spark extracts document text at scale row "),
            F.col("doc_id").cast("string"),
            F.lit("\x0cArchive copy "),
            F.col("doc_id").cast("string"),
            F.lit("."),
        ))
    )
    stats = feats.agg(
        F.sum(deviates.cast("long")).alias("bad"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    dt = time.perf_counter() - t0
    assert stats["bad"] == 0 and stats["n"] == n, stats
    _emit(
        "pdfextract",
        n_docs=n,
        payload_mb=round(total_bytes / 1e6, 1),
        secs=round(dt, 2),
        mb_per_sec=round(total_bytes / 1e6 / dt, 1),
        docs_per_sec=int(n / dt),
    )


def probe_cavnar(spark) -> None:
    from timeseries_data_provider_spark.operators import langid

    n = int(os.environ.get("STRESS_CAVNAR_N", "320000"))
    phrases = [
        ("en", "the quick brown fox jumps over the lazy dog again"),
        ("de", "der schnelle braune fuchs springt ueber den faulen hund"),
        ("es", "el rapido zorro marron salta sobre el perro perezoso"),
        ("fr", "le renard brun rapide saute par dessus le chien"),
    ]
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(l) for l, _ in phrases]),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
        F.concat(
            F.element_at(
                F.array(*[F.lit(t) for _, t in phrases]),
                (F.col("id") % 4 + 1).cast("int"),
            ),
            F.lit(" marker "),
            (F.col("id") % 97).cast("string"),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    prof = langid.train_langid_profiles(docs, top_k=200)
    pred = langid.langid_classify(docs, prof, top_k=200)
    stats = (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .agg(
            F.sum((F.col("lang_pred") != F.col("lang")).cast("long")).alias(
                "wrong"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    dt = time.perf_counter() - t0
    assert stats["wrong"] == 0 and stats["n"] == n, stats
    _emit(
        "cavnar",
        n_docs=n,
        secs=round(dt, 2),
        docs_per_sec=int(n / dt),
    )


def probe_imagededup(spark) -> None:
    """dHash image near-dup at 64k images: every image is UNIQUE
    random noise (uniform hashes keep the quarter blocks cold — the
    planted-identical-class alternative would be the LSH hot-bucket
    adversary by construction), except 1,000 planted re-encode pairs
    (same pixels as BMP vs PNG, ids i and 1,000,000+i). Invariant:
    the pair set is EXACTLY the plants at distance 0 (the false-pair
    expectation at these sizes is ~3e-2 across the whole run)."""
    from timeseries_data_provider_spark.operators import imagehash as IH
    from timeseries_data_provider_spark.operators import multimodal as mm

    n = int(os.environ.get("STRESS_IMG_N", "64000"))
    n_pairs = 1000

    def synth(batches):
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for i in pdf["doc_id"]:
                i = int(i)
                seed = i % 1_000_000
                rng = np.random.RandomState(seed)
                px = rng.randint(0, 256, (48, 64)).astype(np.uint8)
                blob = (
                    mm.encode_png(64, 48, px)
                    if i >= 1_000_000
                    else mm.encode_bmp(64, 48, px)
                )
                out["doc_id"].append(i)
                out["payload"].append(blob)
            yield pd.DataFrame(out)

    ids = spark.range(n).selectExpr("id as doc_id").unionAll(
        spark.range(1_000_000, 1_000_000 + n_pairs).selectExpr(
            "id as doc_id"
        )
    )
    media = (
        ids.repartition(32)
        .mapInPandas(synth, "doc_id long, payload binary")
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    sk = IH.image_dhash(media).localCheckpoint(eager=True)
    hash_s = time.perf_counter() - t0
    t1 = time.perf_counter()
    pairs = IH.hamming_pairs(sk, max_distance=4).collect()
    pair_s = time.perf_counter() - t1
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    want = {(i, 1_000_000 + i) for i in range(n_pairs)}
    assert got == want, (len(got), len(want), list(got - want)[:3])
    assert all(r["hamming"] == 0 for r in pairs)
    _emit(
        "imagededup",
        n_images=n + n_pairs,
        hash_secs=round(hash_s, 2),
        pair_secs=round(pair_s, 2),
        images_per_sec=int((n + n_pairs) / hash_s),
        pairs_found=len(got),
    )


def probe_pagerank(spark) -> None:
    """Exact-integer PageRank at 64x: a 6.4M-edge synthetic web
    (400k nodes; each node links to 16 hash-derived targets, node 0
    is a planted super-hub every 40th node also links to). Invariants:
    node 0 holds the TOP rank, total mass <= scale (floor leakage
    only), and a 3-iteration run over a 100-edge subgraph matches the
    independent Python replay exactly (the correctness leg at probe
    scale — full-graph exactness is the pytest property)."""
    from timeseries_data_provider_spark.operators import linkgraph

    n_nodes = int(os.environ.get("STRESS_PR_NODES", "400000"))
    fanout = 16
    edges = spark.range(n_nodes).selectExpr("id as src").selectExpr(
        "src",
        f"explode(sequence(1, {fanout})) as j",
    ).selectExpr(
        "src",
        f"CASE WHEN src % 40 = 0 AND j = 1 THEN 0 "
        f"ELSE pmod(xxhash64(src * 31 + j), {n_nodes}) END as dst",
    ).localCheckpoint(eager=True)
    n_edges = edges.count()
    t0 = time.perf_counter()
    ranks = linkgraph.pagerank_exact(edges, iterations=5)
    top = ranks.orderBy(F.col("rank").desc()).limit(1).collect()[0]
    total = ranks.agg(F.sum("rank")).first()[0]
    dt = time.perf_counter() - t0
    assert top["node"] == 0, top
    assert 0 < total <= 10**12, total
    # correctness leg: small-subgraph exact replay
    small = [(s, (s * 7 + 3) % 20) for s in range(20)] + [(5, 0), (9, 0)]
    sdf = spark.createDataFrame(pd.DataFrame(small, columns=["src", "dst"]))
    got = {
        r["node"]: r["rank"]
        for r in linkgraph.pagerank_exact(sdf, iterations=3).collect()
    }
    nodes = sorted({s for s, _ in small} | {t for _, t in small})
    out: dict = {}
    for s, _ in small:
        out[s] = out.get(s, 0) + 1
    scale = 10**12
    rank = {v: scale // len(nodes) for v in nodes}
    base = 150 * (scale // len(nodes))
    for _ in range(3):
        dang = sum(r for v, r in rank.items() if v not in out)
        inc = {v: 0 for v in nodes}
        for s, t in small:
            inc[t] += rank[s] // out[s]
        rank = {
            v: (base + 850 * (inc[v] + dang // len(nodes))) // 1000
            for v in nodes
        }
    assert got == rank
    _emit(
        "pagerank",
        n_nodes=n_nodes,
        n_edges=int(n_edges),
        iterations=5,
        secs=round(dt, 2),
        edges_x_iters_per_sec=int(n_edges * 5 / dt),
    )


def main() -> None:
    which = sys.argv[1:] or [
        "crawl",
        "urlnorm",
        "clfscore",
        "mkvmeta",
        "mp3meta",
        "exifmeta",
        "flacdecode",
        "pdfextract",
        "cavnar",
        "imagededup",
        "pagerank",
    ]
    spark = get_spark("tdps-stress-r9b")
    for name in which:
        globals()[f"probe_{name}"](spark)
    spark.stop()


if __name__ == "__main__":
    main()
