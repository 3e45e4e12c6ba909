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

Usage: python tools/stress_round9.py [vp8ldecode|gifdecode]
Env: STRESS_VP8L_N (default 2000), STRESS_GIF_N (default 5000).
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
from pyspark.sql.types import (  # noqa: E402
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from timeseries_data_provider_spark.operators import (  # noqa: E402
    gif,
    multimodal,
    vp8l,
)
from timeseries_data_provider_spark.session import get_spark  # noqa: E402


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


N_CLASSES = 10

_MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
    ]
)


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


def main() -> None:
    which = sys.argv[1:] or ["vp8ldecode", "gifdecode"]
    spark = get_spark("tdps-stress-r9")
    for name in which:
        globals()[f"probe_{name}"](spark)
    spark.stop()


if __name__ == "__main__":
    main()
