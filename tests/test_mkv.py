"""Matroska/WebM EBML metadata walk (operators/mkv).

Covers: vint widths, skeleton roundtrip (sized + unknown-size
streaming Segment), track matrix (video dims, audio rate/channels),
duration math across timescales, hostile inputs (bad magic, oversized
child, unknown-size interior element, wide vint), every-offset
truncation fuzz, and the Spark per-track fan-out."""

import pandas as pd
import pytest

from timeseries_data_provider_spark.operators import mkv


def _skel(**kw):
    base = dict(
        doctype="matroska",
        duration_ticks=1234.0,
        tracks=[
            {
                "track_number": 1,
                "type_code": 1,
                "codec_id": "V_VP9",
                "width": 640,
                "height": 360,
            },
            {
                "track_number": 2,
                "type_code": 2,
                "codec_id": "A_OPUS",
                "sample_rate": 48000.0,
                "channels": 2,
            },
        ],
    )
    base.update(kw)
    return mkv.encode_mkv_skeleton(**base)


@pytest.mark.parametrize("unknown", [False, True])
def test_roundtrip(unknown):
    m = mkv.decode_mkv_meta(_skel(unknown_segment_size=unknown))
    assert m["doctype"] == "matroska"
    assert m["timescale_ns"] == 1_000_000
    assert m["duration_ms"] == 1234
    assert m["muxing_app"] == "tdps-synth"
    v, a = m["tracks"]
    assert (v["track_type"], v["codec_id"], v["width"], v["height"]) == (
        "video",
        "V_VP9",
        640,
        360,
    )
    assert (a["track_type"], a["codec_id"], a["channels"]) == (
        "audio",
        "A_OPUS",
        2,
    )
    assert a["sample_rate_milli"] == 48_000_000
    assert a["width"] is None and v["channels"] is None


def test_duration_scales_with_timescale():
    # 90 kHz-style scale: 11.111111 ms/tick at ns resolution
    blob = _skel(timescale_ns=2_000_000, duration_ticks=500.0)
    assert mkv.decode_mkv_meta(blob)["duration_ms"] == 1000
    blob = _skel(duration_ticks=None)
    assert mkv.decode_mkv_meta(blob)["duration_ms"] is None


def test_vint_widths():
    # sizes that force 1..4-byte size vints roundtrip
    for n in (5, 200, 20_000, 3_000_000):
        blob = _skel(
            tracks=[
                {
                    "track_number": 1,
                    "type_code": 1,
                    "codec_id": "x" * n,
                    "width": 1,
                    "height": 1,
                }
            ]
        )
        m = mkv.decode_mkv_meta(blob)
        assert m["tracks"][0]["codec_id"] == "x" * n


def test_subtitle_and_unknown_track_types():
    blob = _skel(
        tracks=[
            {"track_number": 1, "type_code": 17, "codec_id": "S_TEXT/UTF8"},
            {"track_number": 2, "type_code": 33, "codec_id": "X"},
        ]
    )
    t1, t2 = mkv.decode_mkv_meta(blob)["tracks"]
    assert t1["track_type"] == "subtitle"
    assert t2["track_type"] == "33"


def test_hostile_inputs():
    with pytest.raises(ValueError, match="truncated"):
        mkv.decode_mkv_meta(b"\x1a")
    # non-EBML bytes walk as garbage elements: any named ValueError
    # is acceptable; a silent empty result is not
    with pytest.raises(ValueError):
        mkv.decode_mkv_meta(b"RIFF0000WEBP" + b"\x00" * 20)
    # structurally valid EBML but no Matroska header/segment
    stray = mkv._el(mkv._DOCTYPE, b"zz")
    with pytest.raises(ValueError, match="not a Matroska"):
        mkv.decode_mkv_meta(stray)
    # child size exceeding its parent
    bad = mkv._el(mkv._EBML_HEADER, mkv._vint_id(mkv._DOCTYPE) + b"\x95")
    with pytest.raises(ValueError, match="exceeds parent"):
        mkv.decode_mkv_meta(bad + b"\x00" * 4)
    # unknown-size element that is not Segment
    body = mkv._vint_id(mkv._DOCTYPE) + b"\xff" + b"x"
    bad2 = mkv._el(mkv._EBML_HEADER, body)
    with pytest.raises(ValueError, match="outside Segment"):
        mkv.decode_mkv_meta(bad2)
    # 0x00 lead byte = vint wider than 8 bytes
    with pytest.raises(ValueError, match="8 bytes"):
        mkv.decode_mkv_meta(b"\x00\x01\x02\x03")


def test_truncation_fuzz():
    blob = _skel()
    for cut in range(len(blob)):
        try:
            mkv.decode_mkv_meta(blob[:cut])
        except ValueError:
            continue
        # a clean parse of a prefix can only happen once the full
        # metadata head is present (sized segment: never)
        assert cut == len(blob)


def test_spark_fanout(spark):
    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    rows = mkv.track_features(mkv.synth_mkv_media(ids)).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # evens have 2 tracks, odds 1
    assert all(
        len(v) == (2 if k % 2 == 0 else 1) for k, v in by_doc.items()
    )
    r0 = sorted(by_doc[12], key=lambda r: r["track_number"])
    assert r0[0]["doctype"] == "webm"
    assert r0[0]["duration_ms"] == 1000 + 7 * 12
    assert r0[0]["codec"] == "V_VP8" and r0[0]["width"] == 332
    assert r0[1]["codec"] == "A_OPUS"  # 12 % 4 == 0
    assert r0[1]["sample_rate_milli"] == 48_000_000
    assert r0[1]["channels"] == 2
    r6 = sorted(by_doc[6], key=lambda r: r["track_number"])
    assert r6[1]["codec"] == "A_VORBIS"
    assert r6[1]["sample_rate_milli"] == 44_100_000
    assert r6[1]["channels"] == 1
    assert by_doc[3][0]["doctype"] == "matroska"
