#!/usr/bin/env python
"""Round-13 scale-stress probes (BASELINE.md §C rows; the
assert-then-time protocol of tools/stress_round4-12.py — each probe
asserts the operator's correctness invariant on every row, then
prints one JSON line).

vp8   Lossy-VP8 WebP decode throughput on the real distribution
      path: N frames built by the in-repo spec-driven encoder with
      DENSE random coefficient content (every MB carries Y2 + AC
      levels; B_PRED on half the MBs; the normal loop filter on) —
      a far heavier token load than the flat q63 plant — decoded by
      operators/vp8 inside media_features(codec_setup=
      register_builtin_codecs) on local[32]. Asserts every worker
      feature equals the driver-side decode of the same payload
      bit-for-bit, and reports frames/s plus decoded kilopixels/s
      (an honest pure-Python boolean-coder rate, recorded next to
      the 17 MB/s JPEG and ~76 MP/s CCITT rows).

jpx   JPEG 2000 lossless 5/3 decode throughput on the PDF scan
      chain: N single-page scan PDFs whose raster rides /JPXDecode
      (gradient gray, 2 decomposition levels — EBCOT Tier-1 over
      real DWT coefficient statistics) through pdf_image_features.
      Asserts every page's pixel_milli equals its closed form and
      reports pages/s and decoded kilopixels/s (pure-Python MQ +
      context modelling, the JBIG2 row's honest framing).

Usage: python tools/stress_round13.py [vp8|jpx]
Env: STRESS_VP8_N (default 2000), STRESS_JPX_N (default 1000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

from timeseries_data_provider_spark.session import get_spark  # noqa: E402


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


def _vp8_payload(i: int) -> tuple[bytes, int, int]:
    """One dense 32x32 (4-MB) lossy frame from a seeded rng."""
    from timeseries_data_provider_spark.operators import vp8

    rng = np.random.default_rng(1000 + i)
    mbs = []
    for k in range(4):
        co = rng.integers(-6, 7, (25, 16)).astype(np.int64)
        bpred = (i + k) % 2 == 0
        if bpred:
            co[0] = 0
        mb = {
            "ymode": vp8.B_PRED if bpred else int(rng.integers(0, 4)),
            "uvmode": int(rng.integers(0, 4)),
            "skip": False,
            "segment": 0,
            "coeffs": co,
        }
        if bpred:
            mb["submodes"] = [
                int(rng.integers(0, 10)) for _ in range(16)
            ]
        mbs.append(mb)
    body = vp8.encode_vp8_frame(
        32, 32, mbs, q_index=8, filter_level=20 + i % 40
    )
    return vp8.encode_webp(body), 32, 32


def probe_vp8() -> None:
    import pandas as pd

    from timeseries_data_provider_spark.operators import multimodal

    n = int(os.environ.get("STRESS_VP8_N", "2000"))
    spark = get_spark("stress-vp8")
    rows = []
    t_build = time.time()
    for i in range(n):
        payload, w, h = _vp8_payload(i)
        rows.append((i, "webp", payload, len(payload)))
    t_build = time.time() - t_build
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "kind", "payload", "byte_len"]
    )
    media = spark.createDataFrame(pdf).repartition(32)
    media = media.localCheckpoint()  # price decode, not synth
    setup = multimodal.register_builtin_codecs
    t0 = time.time()
    feats = multimodal.media_features(media, codec_setup=setup)
    got = {
        r["doc_id"]: r["feat_milli"] for r in feats.collect()
    }
    dt = time.time() - t0
    # assert: every worker feature equals the driver-side decode
    setup()
    bad = 0
    for i, _k, payload, _b in rows:
        d = multimodal.decode_image(bytes(payload))
        px = d["pixels"]
        want = (1000 * int(px.sum(dtype=np.int64))) // px.size
        if got[i] != want:
            bad += 1
    assert bad == 0, f"{bad} features disagree with driver decode"
    px_total = n * 32 * 32
    _emit(
        "vp8",
        n=n,
        sec=round(dt, 2),
        frames_per_s=round(n / dt, 1),
        kpx_per_s=round(px_total / dt / 1000, 1),
        build_sec=round(t_build, 2),
        bytes_total=int(pdf["byte_len"].sum()),
    )
    spark.stop()


def probe_jpx() -> None:
    import pandas as pd

    from timeseries_data_provider_spark.operators import pdf as pdfmod

    n = int(os.environ.get("STRESS_JPX_N", "1000"))
    spark = get_spark("stress-jpx")
    w, h = 64, 48
    rows = []
    t_build = time.time()
    ys, xs = np.mgrid[0:h, 0:w]
    for i in range(n):
        page = ((i + xs + 2 * ys) % 256).astype(np.uint8)
        blob = pdfmod.encode_scan_pdf([("jpx", page)])
        rows.append((i, blob))
    t_build = time.time() - t_build
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"])
    ).repartition(32).localCheckpoint()
    t0 = time.time()
    feats = pdfmod.pdf_image_features(sdf)
    out = feats.select("doc_id", "pixel_milli").collect()
    dt = time.time() - t0
    # closed form: mean of (i+x+2y)%256 over the page
    for r in out:
        i = r["doc_id"]
        want = (
            1000 * int(((i + xs + 2 * ys) % 256).sum())
        ) // (w * h)
        assert r["pixel_milli"] == want, i
    _emit(
        "jpx",
        n=n,
        sec=round(dt, 2),
        pages_per_s=round(n / dt, 1),
        kpx_per_s=round(n * w * h / dt / 1000, 1),
        build_sec=round(t_build, 2),
    )
    spark.stop()


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("vp8", "all"):
        probe_vp8()
    if which in ("jpx", "all"):
        probe_jpx()


if __name__ == "__main__":
    main()
