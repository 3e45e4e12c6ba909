#!/usr/bin/env python
"""Round-9 scale-stress probes (BASELINE.md §C rows; same protocol as
tools/stress_round4-8.py — each probe asserts the operator's
correctness invariant, then prints one JSON line).

vp8ldecode  Throughput envelope for the pure-Python VP8L lossless
            decoder (VERDICT r8 "What's wrong" #3): N 128x128 RGB
            images through media_features(codec_setup=vp8l.register)
            on local[32]. Half the classes are full-range noise
            (plain prefix-coded literals), half are coarse-quantized
            noise encoded with color-cache + LZ77 on, so the probe
            drives every decoder symbol class. Like the 17.1 MB/s
            jpegdecode row this is an honest Python-loop rate — the
            module docstring's named cost — recorded so nobody
            mistakes the codec tier for a JVM-rate path.
            Invariant: every worker-decoded mean-pixel feature equals
            the driver-side decode of the same payload bit-for-bit.
gifdecode   Same envelope for the stdlib GIF decoder (round-9 GIF
            addition): N 256x256 paletted images (256-entry palette,
            LZW raster; half interlaced — the deinterlace path runs
            worker-side). Same bit-exact driver-vs-worker invariant.
tiffdecode  Same envelope for the baseline TIFF decoder (round-9):
            N 256x256 RGB images rotating byte order and
            plain/PackBits with 32-row strips; a second 'tifflzw' row
            measures the LZW+Predictor-2 tier separately (a per-code
            Python loop — the symbol-loop rate class, kept out of the
            numpy strip tier's average). Same invariant.

substrpartner  Partner-attributed substring dedup at 64x: planted
            disjoint pairs must each attribute exactly one exact-
            boundary span to exactly their mate while a 32k-doc
            boilerplate template (whose uncapped attribution join
            would fan out 32k^2 pairs) is excluded by
            max_docs_per_window; plain substring_spans timed as the
            coverage control.

bytebpe     Byte-level BPE counting at 64x: the r8 'bpe' row's
            protocol plus a per-doc run of 2-byte characters; the
            distributed byte-level total must equal the independent
            JVM closed form (ASCII identity + 1 + 2m per doc).

lm          N-gram LM train + add-k scoring at 64x: closed-form
            integer coverage assertions (every original bigram hits,
            the appended one misses), train/score wall times.

pq          Product quantization: size/encode throughput on
            realistic-entropy noise vectors (float32 table vs m-byte
            code table on disk), two-stage ADC retrieve + re-rank vs
            brute on planted exact-duplicate clusters (top-10 must be
            identical; within-cluster structure sits below code
            resolution by construction -- the honest PQ contract).

Usage: python tools/stress_round9.py
       [vp8ldecode|gifdecode|tiffdecode|substrpartner|bytebpe|pq|lm]
Env: STRESS_VP8L_N (default 2000), STRESS_GIF_N (default 5000),
STRESS_PARTNER_N / STRESS_BYTEBPE_N (default 320000, multiple of 10),
STRESS_PQ_N (default 1600000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402  (kept: parity with siblings)

from timeseries_data_provider_spark.operators import (  # noqa: E402
    gif,
    multimodal,
    vp8l,
)
from timeseries_data_provider_spark.session import get_spark  # noqa: E402


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


N_CLASSES = 10

# the canonical media schema — reusing the module constant so the
# probe can never drift from what media_features consumes
_MEDIA_SCHEMA = multimodal.MEDIA_SCHEMA


def _replicated_media(spark, payloads: list[bytes], kind: str, n: int):
    """Worker-side replication of the driver-encoded class payloads —
    the Python ENCODER's cost never pollutes the decode measurement
    (same shape as stress_round8.probe_jpegdecode)."""

    def synth(batches):
        for pdf in batches:
            rows = {f.name: [] for f in _MEDIA_SCHEMA.fields}
            for i in pdf["doc_id"]:
                p = payloads[int(i) % N_CLASSES]
                rows["doc_id"].append(int(i))
                rows["kind"].append(kind)
                rows["payload"].append(p)
                rows["byte_len"].append(len(p))
            yield pd.DataFrame(rows)

    return (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .mapInPandas(synth, _MEDIA_SCHEMA)
        .localCheckpoint(eager=True)
    )


def _run_decode_probe(
    spark, probe: str, payloads: list[bytes], register, n: int, dims: tuple
) -> None:
    # driver-side ground truth: the SAME decoder run locally — the
    # worker path must agree bit-for-bit (feat is exact integer math)
    register()
    expect = {}
    for c, p in enumerate(payloads):
        img = multimodal.decode_image(p)
        px = img["pixels"]
        expect[c] = (1000 * int(px.sum(dtype=np.int64))) // px.size
        assert (img["width"], img["height"]) == dims, (img["width"], img["height"])
    total_bytes = sum(len(p) for p in payloads) * (n // N_CLASSES)
    media = _replicated_media(spark, payloads, probe, n)
    t0 = time.perf_counter()
    rows = multimodal.media_features(media, codec_setup=register).collect()
    dt = time.perf_counter() - t0
    assert len(rows) == n, len(rows)
    bad = [
        r
        for r in rows
        if r["feat_milli"] != expect[r["doc_id"] % N_CLASSES]
        or (r["width"], r["height"]) != dims
    ]
    assert not bad, bad[:3]
    _emit(
        probe,
        n_images=n,
        image=f"{dims[0]}x{dims[1]}",
        payload_mb=round(total_bytes / 1e6, 1),
        secs=round(dt, 2),
        mb_per_sec=round(total_bytes / 1e6 / dt, 1),
        images_per_sec=round(n / dt, 1),
    )


def probe_vp8ldecode(spark) -> None:
    n = int(os.environ.get("STRESS_VP8L_N", "2000"))
    payloads = []
    for c in range(N_CLASSES):
        rng = np.random.RandomState(3000 + c)
        if c < 5:
            # full-range noise: plain prefix-coded literals
            img = rng.randint(0, 256, (128, 128, 3), np.uint8)
            payloads.append(vp8l.encode_vp8l(img))
        else:
            # coarse 8-level noise: color-cache hits + LZ77 runs
            img = (rng.randint(0, 8, (128, 128, 3)) * 32).astype(np.uint8)
            payloads.append(
                vp8l.encode_vp8l(img, use_cache=True, use_lz77=True)
            )
    _run_decode_probe(
        spark, "vp8ldecode", payloads, vp8l.register, n, (128, 128)
    )


def probe_gifdecode(spark) -> None:
    n = int(os.environ.get("STRESS_GIF_N", "5000"))
    payloads = []
    palette = np.arange(768, dtype=np.int64).reshape(256, 3) % 256
    palette = palette.astype(np.uint8)
    for c in range(N_CLASSES):
        rng = np.random.RandomState(4000 + c)
        idx = rng.randint(0, 256, (256, 256), np.uint8)
        payloads.append(
            gif.encode_gif(256, 256, idx, palette, interlace=(c % 2 == 1))
        )
    _run_decode_probe(
        spark, "gifdecode", payloads, gif.register, n, (256, 256)
    )


def probe_tiffdecode(spark) -> None:
    n = int(os.environ.get("STRESS_TIFF_N", "5000"))
    from timeseries_data_provider_spark.operators import tiff

    payloads = []
    for c in range(N_CLASSES):
        rng = np.random.RandomState(5000 + c)
        px = rng.randint(0, 256, (256, 256, 3), np.uint8)
        payloads.append(
            tiff.encode_tiff(
                256,
                256,
                px,
                big_endian=(c % 2 == 1),
                packbits=(c % 4 >= 2),
                rows_per_strip=32,
            )
        )
    _run_decode_probe(
        spark, "tiffdecode", payloads, tiff.register, n, (256, 256)
    )
    # LZW tier, its own row: a per-CODE Python loop, so its rate class
    # is the VP8L/GIF symbol-loop tier, not the numpy strip tier above
    # — measured separately so the numpy rate isn't averaged away.
    # Content is coarse 8-level noise (textured but compressible, the
    # vp8l probe's class) with Predictor 2 — the real-world LZW-TIFF
    # shape; full-range noise is LZW's pathological worst case and is
    # covered by pytest roundtrips instead.
    n_lzw = int(os.environ.get("STRESS_TIFF_LZW_N", "2000"))
    payloads = []
    for c in range(N_CLASSES):
        rng = np.random.RandomState(5100 + c)
        px = (rng.randint(0, 8, (256, 256, 3)) * 32).astype(np.uint8)
        payloads.append(
            tiff.encode_tiff(
                256,
                256,
                px,
                big_endian=(c % 2 == 1),
                lzw=True,
                predictor=2,
                rows_per_strip=32,
            )
        )
    _run_decode_probe(
        spark, "tifflzw", payloads, tiff.register, n_lzw, (256, 256)
    )


def probe_substrpartner(spark) -> None:
    """Partner-attributed substring dedup at 64x (round-9 addition):
    N docs x 40 tokens; 10% carry a 12-token boilerplate template
    shared by ALL carriers (the hot-window adversary — uncapped, its
    attribution join would fan out carriers^2 pairs), and 20% form
    disjoint PAIRS sharing a pair-unique 8-token template. With
    max_docs_per_window=64 the boilerplate windows are excluded from
    attribution while every planted pair attributes exactly its one
    [6, 13] span to exactly its mate; plain substring_spans on the
    same frame is timed as the uncapped-coverage control (it reduces
    the hot windows to one group row each — the shape that stays
    safe without any cap)."""
    from timeseries_data_provider_spark.operators import dedup

    n = int(os.environ.get("STRESS_PARTNER_N", "320000"))
    doc = F.col("id")
    mod = doc % 10
    pair_base = F.when(mod == 4, doc - 1).otherwise(doc)

    def filler(lo, hi):
        return [
            F.concat(F.lit("d"), doc, F.lit(f"w{j}"))
            for j in range(lo, hi)
        ]

    pair_toks = [
        F.concat(F.lit("p"), pair_base, F.lit(f"x{j}")) for j in range(8)
    ]
    hot = F.lit(" ".join(f"h{j}" for j in range(12)))
    text = F.concat_ws(
        " ",
        *filler(0, 5),
        F.when(mod.isin(3, 4), F.concat_ws(" ", *pair_toks)).otherwise(
            F.concat_ws(" ", *filler(5, 13))
        ),
        *filler(13, 21),
        F.when(mod == 0, hot).otherwise(F.concat_ws(" ", *filler(21, 33))),
        *filler(33, 40),
    )
    docs = (
        spark.range(n)
        .select(doc.alias("doc_id"), text.alias("text"))
        .localCheckpoint()  # freeze: both probes read the same frame
    )

    t0 = time.perf_counter()
    agg = (
        dedup.substring_span_partners(docs, k=8, max_docs_per_window=64)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("start_tok").alias("min_start"),
            F.max("start_tok").alias("max_start"),
            F.min("end_tok").alias("min_end"),
            F.max("end_tok").alias("max_end"),
            F.max("n_windows").alias("max_nw"),
            F.sum(
                (
                    F.col("partner_id")
                    != F.col("doc_id") + F.when(F.col("doc_id") % 10 == 3, 1).otherwise(-1)
                ).cast("long")
            ).alias("bad_partner"),
        )
        .collect()[0]
    )
    dt_partner = time.perf_counter() - t0
    # every planted pair member attributes exactly one [6, 13] span to
    # exactly its mate; the 32k-doc boilerplate never reaches the join
    assert agg["rows"] == 2 * (n // 10), agg
    assert (agg["min_start"], agg["max_start"]) == (6, 6), agg
    assert (agg["min_end"], agg["max_end"]) == (13, 13), agg
    assert agg["max_nw"] == 1 and agg["bad_partner"] == 0, agg

    t0 = time.perf_counter()
    plain = (
        dedup.substring_spans(docs, k=8)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                ((F.col("start_tok") == 22) & (F.col("end_tok") == 33)).cast("long")
            ).alias("hot_spans"),
        )
        .collect()[0]
    )
    dt_plain = time.perf_counter() - t0
    # coverage view: carriers' hot span [22,33] + pair spans [6,13]
    assert plain["hot_spans"] == n // 10, plain
    assert plain["rows"] == n // 10 + 2 * (n // 10), plain

    _emit(
        "substrpartner",
        n_docs=n,
        n_pairs=n // 10,
        hot_carriers=n // 10,
        cap=64,
        partner_secs=round(dt_partner, 2),
        plain_secs=round(dt_plain, 2),
    )


def probe_bytebpe(spark) -> None:
    """Byte-level BPE counting at 64x (round-9 addition; the r8 'bpe'
    row's protocol at the byte level): the same English filler PLUS a
    per-doc run of m = id%16 'e-acute' characters — 2 UTF-8 bytes
    each, exactly where char-level counting goes wrong. The
    distributed byte-level total must equal the independent JVM
    closed form: the ASCII part keeps the r8 identity
    (len - occ('th') - occ('the')), and the accent piece contributes
    1 + 2m stand-in symbols (space + m two-byte letters; no ranked
    pair touches them)."""
    from timeseries_data_provider_spark.operators import bpe

    n_docs = int(os.environ.get("STRESS_BYTEBPE_N", "320000"))
    base_words = (
        "the quick brown fox jumps over the lazy dog then another "
        "thing with themes that gather through thirty paths "
    )
    m = F.col("doc_id") % 16
    ascii_text = F.concat(
        F.lit(base_words * 2),
        F.lit("tail id "),
        F.col("doc_id").cast("string"),
    )
    docs = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            ascii_text.alias("ascii"),
            F.concat(
                ascii_text, F.lit(" "), F.repeat(F.lit("é"), m)
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    occ = lambda c, s: (  # noqa: E731 — occurrence count via replace
        F.length(c) - F.length(F.replace(c, F.lit(s), F.lit("")))
    ) / len(s)
    jvm_expect = docs.select(
        F.sum(
            F.length("ascii")
            - occ(F.col("ascii"), "th")
            - occ(F.col("ascii"), "the")
            + 1
            + 2 * (F.col("doc_id") % 16)
        ).alias("t"),
        F.sum(F.octet_length("text")).alias("bytes"),
    ).collect()[0]
    cnt = bpe.count_udf([("t", "h"), ("th", "e")], byte_level=True)
    t0 = time.perf_counter()
    got = docs.select(F.sum(cnt(F.col("text"))).alias("t")).collect()[0]
    dt = time.perf_counter() - t0
    assert int(got["t"]) == int(jvm_expect["t"]), (
        got["t"],
        jvm_expect["t"],
    )
    mb = int(jvm_expect["bytes"]) / 1e6
    _emit(
        "bytebpe",
        n_docs=n_docs,
        corpus_mb=round(mb, 1),
        secs=round(dt, 2),
        mb_per_sec=round(mb / dt, 1),
        total_tokens=int(got["t"]),
    )


def probe_pq(spark) -> None:
    """Product quantization at scale (round-9 addition; the sq8 row's
    protocol at the next compression tier): N dim-64 planted-cluster
    vectors materialized as a float32 table vs an m=8 PQ code table —
    compare bytes on disk, the one-time encode pass, and two-stage
    retrieval (ADC table-lookups over the CODE table + float re-rank
    of k*refine rows) against the brute float scan. Books are trained
    with distributed Lloyd's on a 1%% sample (standard PQ practice —
    codebooks are statistics, not an index over every row)."""
    import shutil
    import subprocess

    from timeseries_data_provider_spark.operators import similarity

    n = int(os.environ.get("STRESS_PQ_N", "1600000"))
    work = os.environ.get("STRESS_WORK", "/tmp/tdps_stress_round9")
    os.makedirs(work, exist_ok=True)
    vec_path = work + "/pq_vectors.parquet"
    codes_path = work + "/pq_codes.parquet"
    noise_path = work + "/pq_noise.parquet"
    ncodes_path = work + "/pq_noise_codes.parquet"

    # --- size/throughput leg: REALISTIC-entropy pseudo-noise vectors
    # (a duplicate-heavy plant lets parquet dictionary-compress the
    # float table to nothing and fakes the ratio — found on the first
    # draft: 64 distinct vectors compressed 1.6M rows to 13 MB)
    noise = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: (
            ((F.col("id") * 2654435761 + d * 40503 + F.col("id") * d)
             % 65536).cast("double")
            / 32768.0
            - 1.0
        ).cast("float"),
    )
    if not os.path.exists(noise_path + "/_SUCCESS"):
        (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), noise.alias("embedding"))
            .write.mode("overwrite")
            .parquet(noise_path)
        )
    nvecs = spark.read.parquet(noise_path)
    nbooks = similarity.train_pq_codebooks(
        nvecs.filter(F.col("vec_id") % 100 == 3), m=8, ncodes=16,
        iterations=2,
    )
    t0 = time.perf_counter()
    similarity.pq_encode(nvecs, nbooks).select(
        "vec_id", "codes"
    ).write.mode("overwrite").parquet(ncodes_path)
    encode_s = round(time.perf_counter() - t0, 2)

    # 64 planted clusters of EXACT duplicates on deterministic integer
    # base patterns: within-cluster structure sits BELOW code
    # resolution by construction (the honest PQ contract — same
    # resolution-envelope framing as the ivfsq8 row), so the two-stage
    # top-10 must equal brute exactly: one code combo per cluster, the
    # query's own combo wins ADC, and both stages tie-break sim-1.0
    # duplicates by vec_id. A first draft varied member SCALES inside
    # clusters; that split a cluster across combos and the candidate
    # stage dropped brute's tie-break winners — real PQ behavior worth
    # recording: ADC cannot order what the codes cannot distinguish.
    c = F.col("id") % 64
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: ((c * 17 + d * 13) % 31 - 15).cast("double").cast("float"),
    )
    n2 = n // 5
    if not os.path.exists(vec_path + "/_SUCCESS"):
        (
            spark.range(n2)
            .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
            .write.mode("overwrite")
            .parquet(vec_path)
        )
    vecs = spark.read.parquet(vec_path)

    books = similarity.train_pq_codebooks(
        vecs.filter(F.col("vec_id") % 100 == 3),
        m=8,
        ncodes=16,
        iterations=2,
    )
    similarity.pq_encode(vecs, books).select(
        "vec_id", "codes"
    ).write.mode("overwrite").parquet(codes_path)

    def du(p):
        return int(subprocess.check_output(["du", "-sb", p]).split()[0])

    float_bytes, code_bytes = du(noise_path), du(ncodes_path)

    qrow = vecs.filter(F.col("vec_id") == 3).select(
        similarity.as_double(F.col("embedding")).alias("qv")
    )
    t0 = time.perf_counter()
    brute = (
        vecs.filter(F.col("vec_id") != 3)
        .join(F.broadcast(qrow))
        .select(
            "vec_id",
            similarity.cosine(
                similarity.as_double(F.col("embedding")), F.col("qv")
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
        .collect()
    )
    brute_s = round(time.perf_counter() - t0, 2)

    # ADC over the materialized CODE table, through the OPERATOR's
    # codes= path (review finding: the probe used to duplicate the
    # ADC/candidate/re-rank logic inline)
    codes = spark.read.parquet(codes_path)
    t0 = time.perf_counter()
    rerank = similarity.pq_topk(
        vecs, books, query_vec_id=3, k=10, refine=4, codes=codes
    ).collect()
    pq_s = round(time.perf_counter() - t0, 2)
    assert [r["vec_id"] for r in rerank] == [r["vec_id"] for r in brute], (
        "pq two-stage must recover the brute top-10 on planted clusters"
    )
    shutil.rmtree(work, ignore_errors=True)
    _emit(
        "pq_topk",
        noise_vectors=n,
        planted_vectors=n2,
        dim=64,
        m=8,
        float_mb=round(float_bytes / 1e6, 1),
        code_mb=round(code_bytes / 1e6, 1),
        size_ratio=round(float_bytes / code_bytes, 2),
        encode_once_s=encode_s,
        brute_float_s=brute_s,
        pq_retrieve_rerank_s=pq_s,
        topk_identical=True,
    )


def probe_lm(spark) -> None:
    """N-gram LM quality scoring at 64x (round-9 addition): train a
    bigram count model on N docs of English-ish filler, score the
    same corpus with one planted-unique token appended per doc (the
    q64 shape — every row exercises the OOV path). Coverage is
    closed-form: every original bigram hits (the model was trained on
    these docs), the one appended bigram misses, so
    sum(n_ngrams) == sum(tokens) and sum(n_hits) == sum(tokens − 1)
    are exact integer assertions; per-value log math is q64's oracle
    territory."""
    from timeseries_data_provider_spark.operators import lm

    n_docs = int(os.environ.get("STRESS_LM_N", "320000"))
    base_words = (
        "the quick brown fox jumps over the lazy dog then another "
        "thing with themes that gather through thirty paths "
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(base_words * 2),
                F.lit("tail id "),
                F.col("id").cast("string"),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    n_tokens = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0]["t"]

    t0 = time.perf_counter()
    model = lm.ngram_lm(docs, n=2).localCheckpoint(eager=True)
    train_s = round(time.perf_counter() - t0, 2)
    n_grams_model = model.count()

    probe = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" zq"), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    t0 = time.perf_counter()
    agg = (
        lm.ngram_lm_score(probe, model, n=2)
        .groupBy()
        .agg(
            F.sum("n_ngrams").alias("ng"),
            F.sum("n_hits").alias("hits"),
            F.max("logprob_milli").alias("max_lp"),
        )
        .collect()[0]
    )
    score_s = round(time.perf_counter() - t0, 2)
    assert int(agg["ng"]) == int(n_tokens), (agg["ng"], n_tokens)
    assert int(agg["hits"]) == int(n_tokens) - n_docs, agg
    assert int(agg["max_lp"]) < 0, agg  # every doc pays surprise
    _emit(
        "lm",
        n_docs=n_docs,
        corpus_tokens=int(n_tokens),
        model_ngrams=int(n_grams_model),
        train_secs=train_s,
        score_secs=score_s,
        tokens_per_sec_scored=int(n_tokens / score_s),
    )


def main() -> None:
    which = sys.argv[1:] or [
        "vp8ldecode",
        "gifdecode",
        "tiffdecode",
        "substrpartner",
        "bytebpe",
        "pq",
        "lm",
    ]
    spark = get_spark("tdps-stress-r9")
    for name in which:
        globals()[f"probe_{name}"](spark)
    spark.stop()


if __name__ == "__main__":
    main()
