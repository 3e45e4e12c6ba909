"""RTF text extraction (sources/rtf): control-word stream parsing
with the crawl-grade posture — skipped destinations, code pages,
Unicode escapes incl. surrogate pairs, named errors on hostility."""

import pytest

from timeseries_data_provider_spark.sources import rtf


def test_roundtrip_paragraphs_unicode_title():
    b = rtf.encode_rtf(
        ["Hello world.", "Tab\there.", "Naïve — café 𝔸"],
        title="Tïtle 𝕏",
    )
    m = rtf.rtf_text(b)
    assert m["text"] == "Hello world.\nTab\there.\nNaïve — café 𝔸"
    assert m["title"] == "Tïtle 𝕏"
    assert m["n_paragraphs"] == 3


def test_escaped_delimiters_and_fonttbl_skip():
    m = rtf.rtf_text(rtf.encode_rtf(["a{b}c\\d"]))
    assert m["text"] == "a{b}c\\d"
    # the fixture carries a fonttbl — its content must not leak
    assert "Times" not in m["text"]


def test_hand_built_real_world_shapes():
    # field with instruction skipped but result text kept; \uc0;
    # \line vs \par; hex escape through cp1252
    src = (
        rb"{\rtf1\ansi\uc0 "
        rb"{\field{\*\fldinst HYPERLINK http://x }{\fldrslt click}}"
        rb" here\line two\par caf\'e9\par}"
    )
    m = rtf.rtf_text(src)
    assert m["text"] == "click here\ntwo\ncafé"
    assert "HYPERLINK" not in m["text"]


def test_uc_fallback_skipping():
    # \uc1: one fallback byte after \uN must be consumed, not emitted
    src = rb"{\rtf1\ansi\uc1 a\u8212 ?b\par}"
    assert rtf.rtf_text(src)["text"] == "a—b"
    # \uc2 with a hex-escape fallback pair
    src = rb"{\rtf1\ansi\uc2 a\u8212 \'97\'97b\par}"
    assert rtf.rtf_text(src)["text"] == "a—b"


def test_bin_skips_raw_bytes_with_braces():
    src = rb"{\rtf1\ansi {\pict\bin6 }}}{{{ }visible\par}"
    assert rtf.rtf_text(src)["text"] == "visible"


def test_hostile_loud():
    with pytest.raises(ValueError, match="rtf"):
        rtf.rtf_text(b"not rtf at all")
    with pytest.raises(ValueError, match="nesting"):
        rtf.rtf_text(b"{\\rtf1" + b"{" * 300 + b"}")


def test_unknown_codepage_keeps_default():
    src = rb"{\rtf1\ansi\ansicpg99999 caf\'e9\par}"
    assert rtf.rtf_text(src)["text"] == "café"


def test_rtf_features_spark(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, None],
            "payload": [
                rtf.encode_rtf(["one"], title="t1"),
                rtf.encode_rtf(["two", "lines"]),
                None,
            ],
        }
    )
    out = (
        rtf.rtf_features(spark.createDataFrame(rows))
        .orderBy("doc_id")
        .collect()
    )
    assert len(out) == 2
    assert out[0]["text"] == "one" and out[0]["title"] == "t1"
    assert out[1]["text"] == "two\nlines" and out[1]["n_chars"] == 9


def test_starred_fldrslt_reenters_text():
    # \*\fldrslt inside a skipped \field must still emit its text
    # (review finding: the starred form inherited skipping=True)
    src = (
        rb"{\rtf1\ansi "
        rb"{\field{\*\fldinst HYPERLINK http://x }"
        rb"{\*\fldrslt starred}} tail\par}"
    )
    assert rtf.rtf_text(src)["text"] == "starred tail"


def test_fldrslt_inside_nontext_destination_stays_hidden():
    # r12 ADVICE: a field result nested inside a genuinely non-text
    # destination (\stylesheet, \pict) must NOT leak into the body —
    # \fldrslt may only clear a FIELD-induced skip
    blob = (
        rb"{\rtf1\ansi "
        rb"{\stylesheet{\s1 Normal{\field{\fldrslt leakA}}}}"
        rb"{\pict 0102{\*\fldrslt leakB}}"
        rb"body {\field{\*\fldinst REF x }{\fldrslt kept}} tail\par}"
    )
    m = rtf.rtf_text(blob)
    assert "leakA" not in m["text"] and "leakB" not in m["text"]
    assert "kept" in m["text"] and "body" in m["text"]
    assert "tail" in m["text"]
