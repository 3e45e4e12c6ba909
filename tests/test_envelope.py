"""Tolerant extraction envelope (sources/envelope.py): the opt-in
``errors='quarantine'`` posture that keeps a 100 TB batch alive when
one file in it is damaged — the r11 VERDICT's top-next item. The
default posture stays loud (raise) everywhere; these tests pin both
sides plus the hostile-mix contract (1 poisoned row in 1,000: 999
extract, 1 quarantined, the task survives)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseries_data_provider_spark.sources import (
    cfb,
    envelope,
    office,
    rtf,
    warc,
)
from timeseries_data_provider_spark.operators import pdf


def _rtf_corpus(spark, n=1000, poison_at=417):
    good = rtf.encode_rtf(["clean paragraph"])
    rows = [
        (i, b"\x00garbage not rtf\xff" if i == poison_at else good)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_hostile_mix_one_in_thousand_survives(spark):
    df = _rtf_corpus(spark)
    out = rtf.rtf_features(df, errors="quarantine").cache()
    try:
        assert out.count() == 1000
        bad = out.where(F.col("err_class").isNotNull()).collect()
        assert len(bad) == 1
        assert bad[0]["doc_id"] == 417
        assert bad[0]["err_class"] == "ValueError"
        assert "rtf" in bad[0]["err_msg"]
        assert bad[0]["text"] is None  # features NULL on the side row
        clean = out.where(F.col("err_class").isNull())
        assert clean.count() == 999
        assert (
            clean.select("text").distinct().collect()[0]["text"]
            == "clean paragraph"
        )
    finally:
        out.unpersist()


def test_default_posture_still_raises(spark):
    df = _rtf_corpus(spark, n=10, poison_at=3)
    with pytest.raises(Exception, match="rtf"):
        rtf.rtf_features(df).collect()
    # and the schema carries NO err columns in raise mode
    assert "err_class" not in rtf.rtf_features(df).columns


def test_quarantine_split_sugar(spark):
    df = _rtf_corpus(spark, n=10, poison_at=3)
    clean, quarantined = envelope.quarantine_split(
        rtf.rtf_features(df, errors="quarantine")
    )
    assert clean.count() == 9
    assert "err_class" not in clean.columns
    q = quarantined.collect()
    assert [r["doc_id"] for r in q] == [3]


def test_unknown_errors_mode_is_loud(spark):
    df = _rtf_corpus(spark, n=2, poison_at=99)
    with pytest.raises(ValueError, match="errors="):
        rtf.rtf_features(df, errors="ignore")


def test_quarantine_across_extractor_families(spark):
    # one operator per named tier (warc/pdf/office/cfb): a poisoned
    # blob quarantines, the healthy sibling extracts
    cases = [
        (
            warc.warc_responses,
            warc.encode_warc(
                [
                    {
                        "type": "response",
                        "uri": "http://a.example/",
                        "date": "2024-01-01T00:00:00Z",
                        "body": warc.http_response_bytes(
                            b"<p>hi</p>", 200
                        ),
                    }
                ]
            ),
        ),
        (pdf.pdf_features, pdf.encode_pdf([["hello"]])),
        (office.office_features, office.encode_docx(["hello"])),
        (
            cfb.cfb_features,
            cfb.encode_cfb([("WordDocument", b"\x00" * 64)]),
        ),
    ]
    for op, good in cases:
        df = spark.createDataFrame(
            [(1, good), (2, b"\xde\xad poisoned \xbe\xef")],
            "doc_id long, payload binary",
        )
        out = op(df, errors="quarantine").collect()
        ids_bad = sorted(
            r["doc_id"] for r in out if r["err_class"] is not None
        )
        ids_ok = sorted(
            r["doc_id"] for r in out if r["err_class"] is None
        )
        assert ids_bad == [2], op.__name__
        assert 1 in ids_ok, op.__name__
        # default posture: the same damage is loud
        with pytest.raises(Exception):
            op(df).collect()


def test_multirow_operator_quarantines_whole_document(spark):
    # pdf_image_features is 1->N: a damaged document yields exactly
    # ONE side row (not N), healthy docs keep their full fan-out
    import numpy as np

    good = pdf.encode_scan_pdf(
        [("gray8", (np.arange(64, dtype=np.uint8).reshape(8, 8)))]
    )
    df = spark.createDataFrame(
        [(1, good), (2, b"%PDF-1.4 truncated junk")],
        "doc_id long, payload binary",
    )
    out = pdf.pdf_image_features(df, errors="quarantine").collect()
    bad = [r for r in out if r["err_class"] is not None]
    assert len(bad) == 1 and bad[0]["doc_id"] == 2
    ok = [r for r in out if r["err_class"] is None]
    assert len(ok) >= 1 and all(r["doc_id"] == 1 for r in ok)


def test_err_msg_is_truncated(spark):
    # bounded side-row width: a pathological error message caps at
    # the envelope's limit instead of ballooning the sink
    def exploder(blob):
        raise ValueError("x" * 10_000)

    df = spark.createDataFrame(
        [(1, b"anything")], "doc_id long, payload binary"
    )
    out = envelope.single_row_features(
        df,
        exploder,
        [("text", "string")],
        errors="quarantine",
    ).collect()
    assert len(out) == 1
    assert len(out[0]["err_msg"]) == 400
