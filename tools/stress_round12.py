#!/usr/bin/env python
"""Round-12 scale-stress probes (BASELINE.md §C rows; same
assert-then-time protocol as tools/stress_round4-11.py — each probe
asserts the operator's correctness invariant, then prints one JSON
line).

quarantine  The tolerant extraction envelope (r11 VERDICT top-next)
            at batch scale: 50k docs rotating the TEN document
            formats (DOCX/XLSX/PPTX/RTF/EML/IPYNB + OLE2
            .doc/.ppt/.xls/.msg) with ONE doc in every 1,000
            poisoned (crawl damage). errors='quarantine' must keep
            the batch alive: every poisoned doc becomes exactly one
            (id, err_class, err_msg) side row, every healthy doc
            extracts, and the run completes — where the default
            raise posture (correctly) kills the job on the first
            damaged file. Also times the envelope on the SAME corpus
            with zero poison against the r11 officertf baseline
            shape: the try/except adds no measurable cost next to
            parsing (docs/s reported for both).

lzfu        The [MS-OXRTFCP] compressed-RTF chain at batch scale:
            N Outlook .msg containers whose bodies exist ONLY as
            PR_RTF_COMPRESSED (no plain body property — the common
            real-Outlook shape) through msg_features: CFB walk →
            LZFu decompress → RTF parse per document. Asserts every
            extracted text equals its closed-form reconstruction
            (full-table JVM equality) and reports docs/s — the
            officertf envelope extended with the LZFu class.

jbig2       The T.88 generic-region envelope: N single-page JBIG2
            scan PDFs rotating MQ template 0 / MQ+TPGDON / MMR over
            closed-form stripe rasters through pdf_image_features —
            asserts every page's pixel_milli equals its closed form
            (driver-vs-worker, the ccittfax methodology) and reports
            pages/s and decoded kilopixels/s (the honest pure-Python
            MQ rate next to ccittfax's 76 MP/s run-level rate).

offcrypto   Encrypted-OOXML extraction at batch scale: N encrypted
            DOCX containers (half Standard SHA-1/AES-ECB at the
            spec's 50k iterations, half Agile SHA-512/AES-CBC at
            the fixture's 10k spin) with closed-form text, through
            office_features' transparent decrypt routing. Asserts
            full-table text equality and reports docs/s — the
            honest KDF-bound rate (per-file salts make the
            derivation uncacheable BY DESIGN; real Agile files spin
            100k, so scale the agile share's rate by ~10x down).

Usage: python tools/stress_round12.py [quarantine|lzfu|jbig2|offcrypto]
Env: STRESS_QUAR_N (default 50000), STRESS_LZFU_N (default 20000),
STRESS_JBIG2_N (default 2000), STRESS_OFFCRYPTO_N (default 2000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from timeseries_data_provider_spark.session import get_spark  # noqa: E402

POISON = b"\xff\xfe crawl damage \x00\x01" * 3


def _emit(probe: str, **kw) -> None:
    print(json.dumps({"probe": probe, **kw}))


def _synth_corpus(spark, n: int, poison_every: int):
    """The officertf ten-format rotation, with doc_id % poison_every
    == poison_every-1 docs replaced by undecodable garbage
    (poison_every=0 disables poisoning)."""
    import pandas as pd

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
                k = i % 10
                kind = [
                    "docx", "xlsx", "pptx", "rtf", "eml",
                    "ipynb", "doc", "ppt", "xls", "msg",
                ][k]
                if poison_every and i % poison_every == poison_every - 1:
                    p = POISON
                else:
                    paras = [
                        f"Document {i} line one.",
                        f"Line two of {i} with naïve — text.",
                    ]
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
                        p = _n.encode_notebook(
                            [("markdown", paras[0]), ("raw", paras[1])]
                        )
                    elif k == 6:
                        p = _d.encode_doc(
                            "\r".join(paras), pieces=2, mixed=True
                        )
                    elif k == 7:
                        p = _p.encode_ppt(paras)
                    elif k == 8:
                        p = _x.encode_xls(paras)
                    else:
                        p = _m.encode_msg(f"T{i}", "\r\n".join(paras))
                out["doc_id"].append(i)
                out["kind"].append(kind)
                out["payload"].append(p)
            yield pd.DataFrame(out)

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(synth, "doc_id long, kind string, payload binary")
        .localCheckpoint(eager=True)
    )


def probe_quarantine(spark) -> None:
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

    n = int(os.environ.get("STRESS_QUAR_N", "50000"))
    poison_every = 1000
    ops = {
        "docx": office.office_features,
        "xlsx": office.office_features,
        "pptx": office.office_features,
        "rtf": rtf.rtf_features,
        "eml": emlsrc.eml_features,
        "ipynb": notebook.notebook_features,
        "doc": docsrc.doc_features,
        "ppt": pptsrc.ppt_features,
        "xls": xlssrc.xls_features,
        "msg": msgsrc.msg_features,
    }

    def run_all(media, errors: str) -> tuple[float, int, int]:
        """Run every family's feature operator over its slice in one
        unioned job; return (seconds, clean rows, quarantined rows)."""
        t0 = time.time()
        parts = []
        for kind, op in ops.items():
            out = op(media.where(F.col("kind") == kind), errors=errors)
            sel = [
                F.col("doc_id"),
                (
                    F.col("err_class")
                    if errors == "quarantine"
                    else F.lit(None).cast("string").alias("err_class")
                ),
            ]
            parts.append(out.select(sel))
        u = parts[0]
        for p in parts[1:]:
            u = u.union(p)
        agg = u.agg(
            F.count("*").alias("total"),
            F.count("err_class").alias("bad"),
            F.count_distinct("doc_id").alias("ids"),
        ).collect()[0]
        dt = time.time() - t0
        assert agg["ids"] == agg["total"], "duplicate or lost doc ids"
        return dt, agg["total"] - agg["bad"], agg["bad"]

    # 1) poisoned corpus: the batch SURVIVES under quarantine and the
    #    damage is exactly the planted set
    media_bad = _synth_corpus(spark, n, poison_every)
    dt_bad, clean, bad = run_all(media_bad, "quarantine")
    want_bad = n // poison_every
    assert bad == want_bad, (bad, want_bad)
    assert clean == n - want_bad, (clean, n)
    # err_class is the named-contract ValueError (poisoned ids land
    # on i % 1000 == 999 -> the msg family in the 10-way rotation)
    classes = (
        msgsrc.msg_features(
            media_bad.where(F.col("kind") == "msg"),
            errors="quarantine",
        )
        .where(F.col("err_class").isNotNull())
        .select("err_class")
        .distinct()
        .collect()
    )
    assert [r["err_class"] for r in classes] == ["ValueError"], classes

    # 2) clean corpus: quarantine-mode overhead vs the raise default
    media_clean = _synth_corpus(spark, n, 0)
    dt_raise, clean_r, _ = run_all(media_clean, "raise")
    dt_quar, clean_q, bad_q = run_all(media_clean, "quarantine")
    assert clean_r == n and clean_q == n and bad_q == 0

    _emit(
        "quarantine",
        n=n,
        poisoned=want_bad,
        quarantined=bad,
        clean=clean,
        sec_poisoned_quarantine=round(dt_bad, 2),
        docs_per_sec_poisoned=round(n / dt_bad),
        sec_clean_raise=round(dt_raise, 2),
        sec_clean_quarantine=round(dt_quar, 2),
        docs_per_sec_clean_raise=round(n / dt_raise),
        docs_per_sec_clean_quarantine=round(n / dt_quar),
    )


def probe_lzfu(spark) -> None:
    import pandas as pd

    from timeseries_data_provider_spark.sources import msg as msgsrc

    n = int(os.environ.get("STRESS_LZFU_N", "20000"))

    def synth(batches):
        from timeseries_data_provider_spark.sources import msg as _m

        for b in batches:
            out = {"doc_id": [], "payload": []}
            for rid in b["id"]:
                i = int(rid)
                body = (
                    f"Paragraph one of memo {i}.\r\n"
                    f"Second line of {i} — naïve text."
                )
                out["doc_id"].append(i)
                out["payload"].append(
                    _m.encode_msg(f"S{i}", body, rtf_body=True)
                )
            yield pd.DataFrame(out)

    media = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(synth, "doc_id long, payload binary")
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    feats = msgsrc.msg_features(media)
    expect = F.concat(
        F.lit("Paragraph one of memo "),
        F.col("doc_id"),
        F.lit(".\nSecond line of "),
        F.col("doc_id"),
        F.lit(" — naïve text."),
    )
    agg = feats.agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(F.col("text") == expect, 0).otherwise(1)
        ).alias("bad_text"),
        F.sum(
            F.when(
                F.col("subject")
                == F.concat(F.lit("S"), F.col("doc_id")),
                0,
            ).otherwise(1)
        ).alias("bad_subj"),
    ).collect()[0]
    dt = time.time() - t0
    assert agg["total"] == n, agg
    assert agg["bad_text"] == 0 and agg["bad_subj"] == 0, agg
    _emit(
        "lzfu",
        n=n,
        sec=round(dt, 2),
        docs_per_sec=round(n / dt),
        mismatches=0,
    )


def probe_jbig2(spark) -> None:
    import pandas as pd

    from timeseries_data_provider_spark.operators import pdf as pdfmod

    n = int(os.environ.get("STRESS_JBIG2_N", "2000"))
    w, h = 128, 96  # 12.3 kpx/page

    def synth(batches):
        import numpy as np

        from timeseries_data_provider_spark.operators import (
            pdf as _pdf,
        )

        for b in batches:
            out = {"doc_id": [], "payload": []}
            for rid in b["id"]:
                i = int(rid)
                p = (i % 4) + 1
                row = np.where(
                    (np.arange(w) // p) % 2 == 0, 0, 255
                ).astype(np.uint8)
                page = np.tile(row, (h, 1))
                kind = ["jbig2", "jbig2-tpgdon", "jbig2-mmr",
                        "jbig2-text"][i % 4]
                out["doc_id"].append(i)
                out["payload"].append(
                    _pdf.encode_scan_pdf([(kind, page)])
                )
            yield pd.DataFrame(out)

    media = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(synth, "doc_id long, payload binary")
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    feats = pdfmod.pdf_image_features(media)
    # closed form: stripes of period p — pixel_milli =
    # (1000 * 255 * n_white) // (w*h), n_white = h * count of x with
    # (x//p)%2 == 1
    import numpy as np

    want = {}
    for p in (1, 2, 3, 4):
        n_white = int(
            ((np.arange(w) // p) % 2 == 1).sum()
        ) * h
        want[p] = (1000 * 255 * n_white) // (w * h)
    expect = F.element_at(
        F.array(*[F.lit(want[p]) for p in (1, 2, 3, 4)]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    agg = feats.agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(F.col("pixel_milli") == expect, 0).otherwise(1)
        ).alias("bad"),
    ).collect()[0]
    dt = time.time() - t0
    assert agg["total"] == n and agg["bad"] == 0, agg
    _emit(
        "jbig2",
        n=n,
        sec=round(dt, 2),
        pages_per_sec=round(n / dt),
        kpx_per_sec=round(n * w * h / dt / 1000),
        mismatches=0,
    )


def probe_offcrypto(spark) -> None:
    import pandas as pd

    from timeseries_data_provider_spark.sources import office

    n = int(os.environ.get("STRESS_OFFCRYPTO_N", "2000"))

    def synth(batches):
        from timeseries_data_provider_spark.sources import (
            offcrypto as _oc,
            office as _o,
        )

        for b in batches:
            out = {"doc_id": [], "payload": []}
            for rid in b["id"]:
                i = int(rid)
                plain = _o.encode_docx(
                    [f"Encrypted memo {i}.", f"Line two of {i}."],
                    title=f"T{i}",
                )
                scheme = "standard" if i % 2 == 0 else "agile"
                pw = "" if i % 4 < 2 else "VelvetSweatshop"
                out["doc_id"].append(i)
                out["payload"].append(
                    _oc.encrypt_ooxml(plain, pw, scheme)
                )
            yield pd.DataFrame(out)

    media = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(synth, "doc_id long, payload binary")
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    feats = office.office_features(media)
    expect = F.concat(
        F.lit("Encrypted memo "),
        F.col("doc_id"),
        F.lit(".\nLine two of "),
        F.col("doc_id"),
        F.lit("."),
    )
    agg = feats.agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(F.col("text") == expect, 0).otherwise(1)
        ).alias("bad"),
        F.sum(
            F.when(
                F.col("title")
                == F.concat(F.lit("T"), F.col("doc_id")),
                0,
            ).otherwise(1)
        ).alias("bad_title"),
    ).collect()[0]
    dt = time.time() - t0
    assert agg["total"] == n, agg
    assert agg["bad"] == 0 and agg["bad_title"] == 0, agg
    _emit(
        "offcrypto",
        n=n,
        sec=round(dt, 2),
        docs_per_sec=round(n / dt),
        mismatches=0,
    )


PROBES = {
    "quarantine": probe_quarantine,
    "lzfu": probe_lzfu,
    "jbig2": probe_jbig2,
    "offcrypto": probe_offcrypto,
}


def main() -> None:
    names = sys.argv[1:] or list(PROBES)
    spark = get_spark("stress-r12", cpus=32, shuffle_partitions=32)
    try:
        for name in names:
            PROBES[name](spark)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
