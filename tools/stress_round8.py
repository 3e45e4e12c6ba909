#!/usr/bin/env python
"""Round-8 scale-stress probes (BASELINE.md §C rows; same protocol as
tools/stress_round4-6.py — each probe asserts the operator's
correctness invariant, then prints one JSON line).

jpegdecode  Throughput envelope for the pure-Python baseline JPEG
            decoder on the real distribution path (VERDICT r6 item 4):
            N 256x256 4:2:0 quantized JPEGs through
            media_features(codec_setup=jpeg.register) on local[32].
            The codec's Huffman stage is a per-MCU Python loop — the
            honest cost stated in the module docstring — so this row
            records the MB/s / images/s envelope next to the 25.7 MB/s
            PII row, so nobody mistakes it for a JVM-rate path.
            Invariant: every worker-decoded mean-pixel feature equals
            the driver-side decode of the same payload bit-for-bit.
substr      Planted-span substring dedup at 64x (VERDICT r6 item 8
            evidence row): 320k docs of 40 unique words each, 10% of
            them carrying a shared 12-token template paragraph;
            asserts exactly the planted docs yield exactly the planted
            span, then times the full spans + clean pipeline.
bpe         BPE token-counting throughput (VERDICT r6 item 3's MB/s
            row): 320k synthetic English-ish docs (~250 chars each)
            through bpe.count_udf under the [(t,h),(th,e)] table;
            asserts the total equals the closed-form
            length − occ('th') − occ('the') identity computed JVM-side,
            then records MB/s — the memoized-Arrow envelope next to
            the PII and jpegdecode rows.

Usage: python tools/stress_round8.py [jpegdecode|substr|bpe]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from timeseries_data_provider_spark.operators import (  # noqa: E402
    dedup,
    jpeg,
    multimodal,
)
from timeseries_data_provider_spark.session import get_spark  # noqa: E402


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


N_IMAGES = int(os.environ.get("STRESS_JPEG_N", "5000"))
N_CLASSES = 10


def _class_payloads() -> list[bytes]:
    """Ten distinct 256x256 RGB images (deterministic noise, quant=8,
    4:2:0) encoded ONCE on the driver — replication happens worker-side
    by class id, so the Python ENCODER's cost never pollutes the
    decode measurement."""
    out = []
    for c in range(N_CLASSES):
        rng = np.random.RandomState(1000 + c)
        img = rng.randint(0, 256, (256, 256, 3), np.uint8)
        out.append(
            jpeg.encode_baseline_jpeg(img, quant=8, subsample="420")
        )
    return out


def probe_jpegdecode(spark) -> None:
    payloads = _class_payloads()
    # driver-side ground truth: the SAME decoder, run locally — the
    # worker path must agree bit-for-bit (mean_milli is exact integer
    # math, so equality is exact, not tolerance)
    expect = {}
    for c, p in enumerate(payloads):
        px = jpeg.decode_baseline_jpeg(p)["pixels"].astype(np.int64)
        expect[c] = (1000 * int(px.sum())) // int(px.size)
    total_bytes = sum(len(p) for p in payloads) * (N_IMAGES // N_CLASSES)

    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
            StructField("byte_len", LongType()),
        ]
    )

    def synth(batches):
        for pdf in batches:
            rows = {f.name: [] for f in schema.fields}
            for i in pdf["doc_id"]:
                p = payloads[int(i) % N_CLASSES]
                rows["doc_id"].append(int(i))
                rows["kind"].append("jpeg")
                rows["payload"].append(p)
                rows["byte_len"].append(len(p))
            yield pd.DataFrame(rows)

    media = (
        spark.range(N_IMAGES)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .mapInPandas(synth, schema)
        .localCheckpoint(eager=True)  # materialize: exclude synth cost
    )
    t0 = time.perf_counter()
    rows = multimodal.media_features(
        media, codec_setup=jpeg.register
    ).collect()
    dt = time.perf_counter() - t0
    assert len(rows) == N_IMAGES, len(rows)
    bad = [
        r
        for r in rows
        if r["feat_milli"] != expect[r["doc_id"] % N_CLASSES]
        or (r["width"], r["height"]) != (256, 256)
    ]
    assert not bad, bad[:3]
    _emit(
        "jpegdecode",
        n_images=N_IMAGES,
        image="256x256 RGB noise, quant=8, 4:2:0",
        payload_mb=round(total_bytes / 1e6, 1),
        secs=round(dt, 2),
        images_per_sec=round(N_IMAGES / dt, 1),
        mb_per_sec=round(total_bytes / 1e6 / dt, 2),
        decode_exact_vs_driver=True,
    )


def probe_substr(spark) -> None:
    n_docs = 320_000
    para = " ".join(f"tpl{j}" for j in range(12))
    base = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit(f"u{k}x"),
                            (F.col("doc_id") * 40 + k).cast("string"),
                        )
                        for k in range(20)
                    ],
                ),
                # every 10th doc carries the shared template paragraph
                F.when(F.col("doc_id") % 10 == 0, F.lit(para)).otherwise(
                    F.concat(
                        F.lit("solo"), F.col("doc_id").cast("string")
                    )
                ),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    k = 8
    t0 = time.perf_counter()
    spans = dedup.substring_spans(base, k=k).localCheckpoint(eager=True)
    span_secs = time.perf_counter() - t0
    agg = spans.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("start_tok").alias("min_s"),
        F.max("start_tok").alias("max_s"),
        F.min("end_tok").alias("min_e"),
        F.max("end_tok").alias("max_e"),
        F.countDistinct("doc_id").alias("docs"),
    ).collect()[0]
    # planted invariant: exactly the doc_id % 10 == 0 docs, each with
    # ONE span covering exactly the 12-token paragraph (tokens 21-32)
    assert agg["n"] == agg["docs"] == n_docs // 10, dict(agg.asDict())
    assert (agg["min_s"], agg["max_s"]) == (21, 21), dict(agg.asDict())
    assert (agg["min_e"], agg["max_e"]) == (32, 32), dict(agg.asDict())
    t1 = time.perf_counter()
    cleaned = dedup.substring_dedup_clean(base, k=k, spans=spans)
    csum = cleaned.agg(
        F.sum("n_kept").alias("kept"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    clean_secs = time.perf_counter() - t1
    # carriers (32 tokens) lose exactly the 12 paragraph tokens and
    # keep their 20 unique words; non-carriers keep all 21 tokens
    carriers = n_docs // 10
    assert csum["n"] == n_docs
    assert (
        csum["kept"] == carriers * 20 + (n_docs - carriers) * 21
    ), csum["kept"]
    _emit(
        "substr",
        n_docs=n_docs,
        carriers=carriers,
        span_secs=round(span_secs, 2),
        clean_secs=round(clean_secs, 2),
        planted_spans=agg["n"],
    )


def _substr_docs(spark, n: int, id_offset: int, para: str):
    return (
        spark.range(n)
        .select((F.col("id") + id_offset).alias("doc_id"))
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit(f"u{k}x"),
                            (F.col("doc_id") * 40 + k).cast("string"),
                        )
                        for k in range(20)
                    ],
                ),
                F.when(F.col("doc_id") % 10 == 0, F.lit(para)).otherwise(
                    F.concat(
                        F.lit("solo"), F.col("doc_id").cast("string")
                    )
                ),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )


def probe_substrincr(spark) -> None:
    """Incremental vs full substring dedup over settled data — the
    settled-data claim measured (same protocol as the r5 minhash
    incremental row): a 10k batch against a 320k-doc corpus
    represented only by its persisted window index."""
    n_corpus, n_batch = 320_000, 10_000
    para = " ".join(f"tpl{j}" for j in range(12))
    corpus = _substr_docs(spark, n_corpus, 0, para)
    batch = _substr_docs(spark, n_batch, 10_000_000, para)
    k = 8
    t0 = time.perf_counter()
    idx = dedup.substring_window_index(corpus, k=k).localCheckpoint(
        eager=True
    )
    t_index = time.perf_counter() - t0
    t1 = time.perf_counter()
    inc = dedup.substring_spans_incremental(
        batch, idx, k=k
    ).localCheckpoint(eager=True)
    t_inc = time.perf_counter() - t1
    agg = inc.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("start_tok").alias("min_s"),
        F.max("start_tok").alias("max_s"),
        F.min("end_tok").alias("min_e"),
        F.max("end_tok").alias("max_e"),
    ).collect()[0]
    # exactly the batch's 1,000 carriers, each with exactly the
    # settled template span — found WITHOUT re-reading corpus text
    assert agg["n"] == n_batch // 10, dict(agg.asDict())
    assert (agg["min_s"], agg["max_s"]) == (21, 21)
    assert (agg["min_e"], agg["max_e"]) == (32, 32)
    t2 = time.perf_counter()
    full_batch_spans = (
        dedup.substring_spans(corpus.unionByName(batch), k=k)
        .filter(F.col("doc_id") >= 10_000_000)
        .count()
    )
    t_full = time.perf_counter() - t2
    assert full_batch_spans == n_batch // 10
    _emit(
        "substrincr",
        corpus_docs=n_corpus,
        batch_docs=n_batch,
        index_secs=round(t_index, 2),
        incremental_secs=round(t_inc, 2),
        full_recompute_secs=round(t_full, 2),
        planted_spans=agg["n"],
    )


def probe_bpe(spark) -> None:
    n_docs = 320_000
    # English-ish filler with real 'th'/'the' density: per-doc
    # variation via the doc_id suffix so memoization is realistic
    # (words repeat across docs, ids do not)
    base_words = (
        "the quick brown fox jumps over the lazy dog then another "
        "thing with themes that gather through thirty paths "
    )
    docs = (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.concat(
                F.lit(base_words * 2),
                F.lit("tail id "),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    from timeseries_data_provider_spark.operators import bpe

    jvm_expect = docs.select(
        F.sum(
            F.length("text")
            - (F.length("text") - F.length(F.replace(F.col("text"), F.lit("th"), F.lit("")))) / 2
            - (F.length("text") - F.length(F.replace(F.col("text"), F.lit("the"), F.lit("")))) / 3
        ).alias("t"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]
    cnt = bpe.count_udf([("t", "h"), ("th", "e")])
    t0 = time.perf_counter()
    got = docs.select(F.sum(cnt(F.col("text"))).alias("t")).collect()[0]
    dt = time.perf_counter() - t0
    assert int(got["t"]) == int(jvm_expect["t"]), (
        got["t"], jvm_expect["t"],
    )
    mb = int(jvm_expect["chars"]) / 1e6
    _emit(
        "bpe",
        n_docs=n_docs,
        corpus_mb=round(mb, 1),
        secs=round(dt, 2),
        mb_per_sec=round(mb / dt, 1),
        total_tokens=int(got["t"]),
    )


def main() -> None:
    which = sys.argv[1:] or ["jpegdecode", "substr", "bpe", "substrincr"]
    spark = get_spark("tdps-stress-r8")
    for name in which:
        globals()[f"probe_{name}"](spark)
    spark.stop()


if __name__ == "__main__":
    main()
