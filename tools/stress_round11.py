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
           floors to 0 milli so it cannot perturb ranking. Runs WITH
           prune_dl=True on its worst case (the stop word matches
           every doc — the prune degrades gracefully to corpus-sized).

anchorsc   Anchor-text profiles under the SELF-CLOSING <a/> adversary
           (the r10 review finding: a stale <a/> stack entry stole
           the NEXT anchor's text): 200k pages each carrying a
           self-closing anchor to /x immediately before a labeled
           anchor to /page on the same target. Asserts ALL /x edges
           have empty anchor text and ALL /page edges carry their
           exact label — then the aggregated per-target profiles
           credit labels only to /page targets. Extends the r10
           anchortext row (clean-class HTML only) to the adversary.

dsir       DSIR importance resampling at 64x: 320k raw docs, a 20k
           target sample with a planted vocabulary shift (target docs
           carry domain tokens), hashed uni+bigram models over 8192
           buckets. Asserts the weight ORDER separates the classes
           exactly (every domain-heavy doc outweighs every plain doc),
           a 1k-row sample recomputes exactly against driver-side
           Python (features, floor-milli ratios, integer weight sum),
           and the Gumbel-top-k draw is reproducible.

officertf  Document-tier extraction envelope: 50k docs rotating
           TEN formats (DOCX/XLSX/PPTX/RTF/EML/IPYNB + OLE2
           .doc/.ppt/.xls/.msg) with closed-form text; every
           extraction checked equal JVM-side (per-format separator
           rule), reported in docs/s.

scandedup  Scanned-page dedup chain: 20k single-page CCITT-G4 scan
           PDFs with 4k planted exact re-scan pairs; asserts the
           exact (pixel_sha256) tier recovers exactly the planted
           set and the quartered-dHash hamming_pairs tier finds
           every planted pair with zero false pairs.

ccittfax   CCITT fax decode envelope: 2,000 scan-shaped 1728x512
           bilevel pages rotating MH/G3/G4 x sparse-text and
           dense-noise content classes through media_features; the
           r9 codec probes' bit-exact driver-vs-worker invariant,
           reported in decoded megapixels/s (the honest fax rate).

Usage: python tools/stress_round11.py [bm25hot|anchorsc|dsir|ccittfax]
Env: STRESS_BM25_N (default 320000), STRESS_ANCHORSC_N (default
200000), STRESS_DSIR_N (default 320000), STRESS_CCITT_N (default
2000).
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
    out = T.bm25_topk(docs, ["the needle"], k=k, prune_dl=True)
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


def probe_dsir(spark) -> None:
    n = int(os.environ.get("STRESS_DSIR_N", "320000"))
    from timeseries_data_provider_spark.operators import dsir as D

    dim = 8192
    # raw pool: half "domain" docs (medical-ish planted tokens), half
    # plain; per-doc unique filler defeats accidental dedup. Target =
    # an independent all-domain sample (ids above the pool).
    dom = F.col("id") % 2 == 0
    raw = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(
                dom, F.lit("dose trial cohort placebo endpoint ")
            ).otherwise(F.lit("garden recipe travel football ")),
            F.lit("u"),
            F.col("id").cast("string"),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    target = spark.range(20_000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit("dose trial cohort placebo endpoint t"),
            F.col("id").cast("string"),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    lr = D.dsir_logratios(target, raw, dim=dim).localCheckpoint(
        eager=True
    )
    weighted = D.dsir_weights(raw, lr, dim=dim).localCheckpoint(
        eager=True
    )
    n_scored = weighted.count()
    dt = round(time.perf_counter() - t0, 2)
    assert n_scored == n
    # class separation: EVERY domain doc outweighs EVERY plain doc
    cls = weighted.select(
        "dsir_milli", (F.col("doc_id") % 2 == 0).alias("is_dom")
    ).groupBy("is_dom").agg(
        F.min("dsir_milli").alias("lo"), F.max("dsir_milli").alias("hi")
    )
    rows = {r["is_dom"]: r for r in cls.collect()}
    assert rows[True]["lo"] > rows[False]["hi"], rows
    # 1k-row exact driver-side recompute (features -> ratio -> sum)
    import hashlib
    import math

    lrmap = {r["bucket"]: r["lr_milli"] for r in lr.collect()}
    sample = weighted.filter(F.col("doc_id") % 320 == 0).collect()
    assert len(sample) == (n + 319) // 320
    for r in sample:
        did = r["doc_id"]
        kind = (
            "dose trial cohort placebo endpoint "
            if did % 2 == 0
            else "garden recipe travel football "
        )
        ws = (kind + "u" + str(did)).split()
        grams = ws + [
            " ".join(ws[i : i + 2]) for i in range(len(ws) - 1)
        ]
        want = sum(
            lrmap[
                int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % dim
            ]
            for g in grams
        )
        assert r["dsir_milli"] == want, did
    # the draw: reproducible, k rows, ranks 1..k
    k = 1000
    s1 = D.dsir_select(weighted, k=k).collect()
    s2 = D.dsir_select(weighted, k=k).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    assert [r["rank"] for r in s1] == list(range(1, k + 1))
    # importance resampling must pull overwhelmingly from the domain
    # class (weights differ by thousands of milli-nats)
    n_dom = sum(1 for r in s1 if r["doc_id"] % 2 == 0)
    assert n_dom == k, n_dom
    _emit(
        "dsir",
        n_raw=n,
        n_target=20_000,
        dim=dim,
        secs=dt,
        docs_per_sec=int(n / dt),
    )


def probe_ccittfax(spark) -> None:
    """CCITT fax decode envelope (r11 late): 2,000 scan-shaped
    1728x512 bilevel pages through media_features, rotating
    Compression 2 (MH) / 3 (G3 1D) / 4 (G4 MMR) and two content
    classes — sparse text-like marks (the archive-scan common case)
    and dense random noise (runs of ~1-2, the run-coding worst
    case). Same driver-vs-worker bit-exact invariant as the r9
    codec probes. The HONEST rate for fax is decoded megapixels/s,
    not payload MB/s (the payload is ~1000x smaller than the
    raster — that is the point of the format)."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import stress_round9 as r9

    from timeseries_data_provider_spark.operators import (
        multimodal,
        tiff,
    )

    n = int(os.environ.get("STRESS_CCITT_N", "2000"))
    h, w = 512, 1728
    forms = ["mh", "g3", "g4"]
    payloads = []
    for c in range(r9.N_CLASSES):
        rng = np.random.RandomState(7000 + c)
        if c % 5 < 4:  # sparse text-like marks
            img = np.full((h, w), 255, np.uint8)
            for _ in range(300):
                y = rng.randint(0, h)
                x0 = rng.randint(0, w - 60)
                img[y, x0 : x0 + rng.randint(5, 60)] = 0
        else:  # dense noise: the run-coding worst case
            img = np.where(rng.rand(h, w) < 0.5, 0, 255).astype(
                np.uint8
            )
        payloads.append(
            tiff.encode_tiff(
                w,
                h,
                img,
                ccitt=forms[c % 3],
                big_endian=(c % 2 == 1),
                rows_per_strip=128,
            )
        )
    tiff.register()
    expect = {}
    for c, p in enumerate(payloads):
        img = multimodal.decode_image(p)
        px = img["pixels"]
        expect[c] = (1000 * int(px.sum(dtype=np.int64))) // px.size
    media = r9._replicated_media(spark, payloads, "ccittfax", n)
    t0 = time.perf_counter()
    rows = multimodal.media_features(
        media, codec_setup=tiff.register
    ).collect()
    dt = time.perf_counter() - t0
    assert len(rows) == n, len(rows)
    bad = [
        r
        for r in rows
        if r["feat_milli"] != expect[r["doc_id"] % r9.N_CLASSES]
        or (r["width"], r["height"]) != (w, h)
    ]
    assert not bad, bad[:3]
    total_bytes = sum(len(p) for p in payloads) * (n // r9.N_CLASSES)
    _emit(
        "ccittfax",
        n_pages=n,
        page=f"{w}x{h}",
        payload_mb=round(total_bytes / 1e6, 1),
        secs=round(dt, 2),
        megapixels_per_sec=round(n * w * h / 1e6 / dt, 1),
        pages_per_sec=round(n / dt, 1),
    )


def probe_scandedup(spark) -> None:
    """Scanned-page dedup at scale (r11 late): 20k single-page
    CCITT-G4 scan PDFs, every id%5==4 page an EXACT re-scan of the
    previous doc's raster (4k planted duplicate pairs across distinct
    documents — the digitized-twice book case). The full chain runs
    distributed: build -> pdf_image_features (page walk + T.4/T.6
    decode + sha256 + dHash quarters) -> exact tier (pixel_sha256
    group) -> perceptual tier (quartered hamming_pairs). Asserts the
    exact tier recovers exactly the planted pairs, the dHash tier
    finds every planted pair at distance 0, and NO cross-content
    pair leaks in (precision on distinct-pattern pages)."""
    import numpy as np
    import pandas as pd

    from timeseries_data_provider_spark.operators import (
        imagehash,
        pdf as pdfmod,
    )

    n = int(os.environ.get("STRESS_SCANDEDUP_N", "20000"))
    h, w = 64, 128

    def synth(batches):
        from timeseries_data_provider_spark.operators import (
            pdf as _pdf,
        )

        for b in batches:
            out = {"doc_id": [], "payload": []}
            for rid in b["id"]:
                i = int(rid)
                k = i - 1 if i % 5 == 4 else i  # content key
                # seeded-RNG raster: genuinely distinct per content
                # key (a closed-form k-modulus pattern repeats across
                # keys — the first draft planted 2M accidental dups)
                rng = np.random.default_rng(k)
                page = np.where(
                    rng.random((h, w)) < 0.35, 0, 255
                ).astype(np.uint8)
                out["doc_id"].append(i)
                out["payload"].append(
                    _pdf.encode_scan_pdf([("ccitt-g4", page)])
                )
            yield pd.DataFrame(out)

    media = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(synth, "doc_id long, payload binary")
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    feats = pdfmod.pdf_image_features(media).localCheckpoint(
        eager=True
    )
    t_extract = time.perf_counter() - t0
    planted = {(i - 1, i) for i in range(n) if i % 5 == 4}
    # exact tier: pixel_sha256 groups
    t0 = time.perf_counter()
    exact = (
        feats.alias("a")
        .join(feats.alias("b"), "pixel_sha256")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y")
        )
        .collect()
    )
    t_exact = time.perf_counter() - t0
    got_exact = {(r["x"], r["y"]) for r in exact}
    assert got_exact == planted, (
        len(got_exact - planted),
        len(planted - got_exact),
    )
    # perceptual tier: quartered dHash pairs at distance <= 3 (the
    # exact pigeonhole regime) — planted pairs are distance 0
    t0 = time.perf_counter()
    pairs = imagehash.hamming_pairs(
        feats.select("doc_id", "q0", "q1", "q2", "q3"),
        max_distance=3,
    ).collect()
    t_hash = time.perf_counter() - t0
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    missing = planted - got
    assert not missing, f"{len(missing)} planted pairs missed"
    # precision: tolerate dHash collisions between distinct patterns
    # only if tiny (the 64-bit gradient sketch on structured noise)
    extra = got - planted
    assert len(extra) <= n // 1000, f"{len(extra)} non-planted pairs"
    _emit(
        "scandedup",
        n_pages=n,
        planted_pairs=len(planted),
        extract_secs=round(t_extract, 2),
        pages_per_sec=round(n / t_extract, 1),
        exact_secs=round(t_exact, 2),
        dhash_pair_secs=round(t_hash, 2),
        nonplanted_dhash_pairs=len(extra),
    )


def probe_officertf(spark) -> None:
    """Document-tier extraction envelope (r11 late): 50k documents
    rotating TEN formats — DOCX / XLSX / PPTX / RTF / EML / IPYNB
    plus the OLE2 legacy family (.doc / .ppt / .xls / .msg) — each
    carrying closed-form id-derived text, through every document
    feature operator at once. Asserts every extracted text
    round-trips exactly (full-table equality against the JVM-side
    reconstruction), reports docs/s — the honest Python-rate
    envelope for the whole document tier."""
    import pandas as pd

    from timeseries_data_provider_spark.sources import (
        doc as docsrc,
        eml as emlsrc,
        msg as msgsrc,
        notebook,
        office,
        ppt as pptsrc,
        rtf,
        xls as xlssrc,
    )

    n = int(os.environ.get("STRESS_OFFICERTF_N", "50000"))
    kinds = [
        "docx", "xlsx", "pptx", "rtf", "eml",
        "ipynb", "doc", "ppt", "xls", "msg",
    ]

    def synth(batches):
        from timeseries_data_provider_spark.sources import (
            doc as _d,
            eml as _e,
            msg as _m,
            notebook as _n,
            office as _o,
            ppt as _p,
            rtf as _r,
            xls as _x,
        )

        for b in batches:
            out = {"doc_id": [], "kind": [], "payload": []}
            for rid in b["id"]:
                i = int(rid)
                paras = [
                    f"Document {i} line one.",
                    f"Line two of {i} with naïve — text.",
                ]
                k = i % 10
                if k == 0:
                    p = _o.encode_docx(paras, title=f"T{i}")
                elif k == 1:
                    p = _o.encode_xlsx([[[paras[0]], [paras[1]]]])
                elif k == 2:
                    p = _o.encode_pptx([paras])
                elif k == 3:
                    p = _r.encode_rtf(paras, title=f"T{i}")
                elif k == 4:
                    p = _e.encode_eml(f"T{i}", "\n".join(paras))
                elif k == 5:
                    # one markdown + one raw cell: joined with the
                    # blank-line separator -> reconstructable
                    p = _n.encode_notebook(
                        [("markdown", paras[0]), ("raw", paras[1])]
                    )
                elif k == 6:
                    p = _d.encode_doc("\r".join(paras), pieces=2, mixed=True)
                elif k == 7:
                    p = _p.encode_ppt(paras)
                elif k == 8:
                    p = _x.encode_xls(paras)
                else:
                    p = _m.encode_msg(f"T{i}", "\r\n".join(paras))
                out["doc_id"].append(i)
                out["kind"].append(
                    ["docx", "xlsx", "pptx", "rtf", "eml", "ipynb",
                     "doc", "ppt", "xls", "msg"][k]
                )
                out["payload"].append(p)
            yield pd.DataFrame(out)

    media = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(synth, "doc_id long, kind string, payload binary")
        .localCheckpoint(eager=True)
    )
    def sel(dfx, kind):
        return dfx.select(
            "doc_id", F.lit(kind).alias("kind"), "text"
        )

    t0 = time.perf_counter()
    got = (
        office.office_features(
            media.where("kind in ('docx', 'xlsx', 'pptx')")
        )
        .select("doc_id", "kind", "text")
        .unionByName(sel(rtf.rtf_features(media.where("kind = 'rtf'")), "rtf"))
        .unionByName(sel(emlsrc.eml_features(media.where("kind = 'eml'")), "eml"))
        .unionByName(sel(notebook.notebook_features(media.where("kind = 'ipynb'")), "ipynb"))
        .unionByName(sel(docsrc.doc_features(media.where("kind = 'doc'")), "doc"))
        .unionByName(sel(pptsrc.ppt_features(media.where("kind = 'ppt'")), "ppt"))
        .unionByName(sel(xlssrc.xls_features(media.where("kind = 'xls'")), "xls"))
        .unionByName(sel(msgsrc.msg_features(media.where("kind = 'msg'")), "msg"))
        .localCheckpoint(eager=True)
    )
    n_got = got.count()
    dt = time.perf_counter() - t0
    assert n_got == n, n_got
    # closed-form reconstruction, all JVM: pptx joins with newline
    # (one slide), xlsx rows with newline, docx/rtf lines with \n
    l1 = F.concat(F.lit("Document "), F.col("doc_id"), F.lit(" line one."))
    l2 = F.concat(
        F.lit("Line two of "), F.col("doc_id"), F.lit(" with naïve — text.")
    )
    # notebook cells join with a BLANK line; the others with one \n
    sep = F.when(
        F.col("kind") == "ipynb", F.lit("\n\n")
    ).otherwise(F.lit("\n"))
    expect = F.concat(l1, sep, l2)
    bad = got.where(F.col("text") != expect).count()
    assert bad == 0, f"{bad} mismatched extractions"
    _emit(
        "officertf",
        n_docs=n,
        secs=round(dt, 2),
        docs_per_sec=round(n / dt, 1),
    )


def main() -> None:
    which = sys.argv[1:] or [
        "bm25hot",
        "anchorsc",
        "dsir",
        "ccittfax",
        "scandedup",
        "officertf",
    ]
    spark = get_spark("tdps-stress-r11")
    for name in which:
        globals()[f"probe_{name}"](spark)
    spark.stop()


if __name__ == "__main__":
    main()
