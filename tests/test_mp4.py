"""ISO-BMFF metadata parser (operators/mp4.py): skeleton round-trips,
version-1 / 64-bit box forms, malformed-input errors, and the Spark
per-track fan-out operator."""

from __future__ import annotations

import struct

import pytest

from timeseries_data_provider_spark.operators import mp4


def test_skeleton_roundtrip_closed_form():
    p = mp4.build_skeleton(4321, 320, 240)
    m = mp4.decode_video_meta(p)
    assert m["format"] == "mp4"
    assert m["major_brand"] == "isom"
    assert m["duration_ms"] == 4321 and m["timescale"] == 1000
    assert m["n_tracks"] == 2 and not m["fragmented"]
    v, a = m["tracks"]
    assert v == {
        "track_id": 1, "kind": "video", "codec": "mp4v",
        "width": 320, "height": 240, "duration_ms": 4321,
    }
    assert a["kind"] == "audio" and a["codec"] == "mp4a"
    assert a["width"] is None and a["height"] is None


def test_non_milli_timescale_converts():
    p = mp4.build_skeleton(2500, 64, 48, timescale=90_000)
    m = mp4.decode_video_meta(p)
    assert m["duration_ms"] == 2500
    assert m["timescale"] == 90_000
    assert m["tracks"][0]["duration_ms"] == 2500


def test_version1_and_64bit_boxes():
    # hand-built: 64-bit-size moov holding a version-1 mvhd
    mvhd_body = (
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)  # creation/modification (64-bit)
        + struct.pack(">IQ", 1000, 7500)  # timescale, duration
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 1)
    )
    mvhd = mp4._box(b"mvhd", mvhd_body)
    moov64 = (
        struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", 16 + len(mvhd))
        + mvhd
    )
    ftyp = mp4._box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42")
    m = mp4.decode_video_meta(ftyp + moov64)
    assert m["duration_ms"] == 7500 and m["major_brand"] == "mp42"
    assert m["n_tracks"] == 0


def test_fragmented_flag():
    p = mp4.build_skeleton(1000, 32, 32) + mp4._box(b"moof", b"")
    assert mp4.decode_video_meta(p)["fragmented"] is True


def test_malformed_inputs_raise_named_errors():
    with pytest.raises(ValueError, match="ftyp"):
        mp4.decode_video_meta(b"\x00" * 32)
    ftyp = mp4._box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    with pytest.raises(ValueError, match="moov"):
        mp4.decode_video_meta(ftyp)
    # box claiming to extend past its container
    bomb = ftyp + struct.pack(">I", 1 << 30) + b"moov"
    with pytest.raises(ValueError, match="beyond its container"):
        mp4.decode_video_meta(bomb)
    # truncated header
    with pytest.raises(ValueError, match="truncated"):
        mp4.decode_video_meta(ftyp + b"\x00\x00\x00")
    # mvhd timescale 0
    mvhd = mp4._box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 0, 5)
        + b"\x00" * 80,
    )
    with pytest.raises(ValueError, match="timescale"):
        mp4.decode_video_meta(ftyp + mp4._box(b"moov", mvhd))


def test_truncated_box_bodies_raise_valueerror_not_struct_error():
    # ADVICE r6: truncated mvhd/tkhd/mdhd/stsd bodies used to escape
    # as raw struct.error/IndexError; the triage contract (same as
    # decode_baseline_jpeg) classifies on ValueError.
    ftyp = mp4._box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    # mvhd with a 4-byte body: used to slice into neighbor bytes or
    # escape as struct.error
    short_mvhd = mp4._box(b"mvhd", b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        mp4.decode_video_meta(ftyp + mp4._box(b"moov", short_mvhd))
    # trak with a truncated tkhd body — mid-payload, so without the
    # explicit body-length check the parser would SILENTLY read the
    # following mdia box's bytes as track fields
    good = mp4.build_skeleton(1000, 32, 32)
    mvhd_ok = mp4._box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 1000, 5)
        + b"\x00" * 80,
    )
    short_tkhd = mp4._box(b"trak", mp4._box(b"tkhd", b"\x00" * 6)
                          + mp4._box(b"mdia", b""))
    with pytest.raises(ValueError, match="truncated"):
        mp4.decode_video_meta(
            ftyp + mp4._box(b"moov", mvhd_ok + short_tkhd)
        )
    # the well-formed skeleton still decodes after the wrap
    assert mp4.decode_video_meta(good)["n_tracks"] == 2


def test_video_meta_features_spark_fanout(spark):
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.operators import multimodal as mm

    ids = spark.range(20_000, 20_010).withColumnRenamed("id", "doc_id")
    rows = (
        mm.video_meta_features(mm.synth_mp4_media(ids))
        .orderBy("doc_id", "track_id")
        .collect()
    )
    assert len(rows) == 20  # one video + one audio row per doc
    for r in rows:
        i = r["doc_id"]
        assert r["n_tracks"] == 2 and r["major_brand"] == "isom"
        assert r["track_ms"] == 1000 + 100 * (i % 10)
        if r["track_id"] == 1:
            assert r["track_kind"] == "video" and r["codec"] == "mp4v"
            assert r["width"] == 320 + 16 * (i % 5)
            assert r["height"] == 240 + 16 * (i % 3)
        else:
            assert r["track_kind"] == "audio" and r["codec"] == "mp4a"
            assert r["width"] is None and r["height"] is None


# --- property tests (hypothesis) ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    ms=st.integers(0, 10**7),
    w=st.integers(1, 8192),
    h=st.integers(1, 8192),
    ts=st.sampled_from([1000, 90_000, 44_100, 600]),
)
def test_property_skeleton_roundtrip(ms, w, h, ts):
    m = mp4.decode_video_meta(
        mp4.build_skeleton(ms, w, h, timescale=ts)
    )
    # duration survives the timescale round trip to within 1 ms of the
    # builder's own integer quantization
    dur = (ms * ts) // 1000
    assert m["duration_ms"] == (dur * 1000) // ts
    v = m["tracks"][0]
    assert (v["width"], v["height"]) == (w, h)
    assert m["n_tracks"] == 2 and m["timescale"] == ts
