"""MP3 frame-header metadata (operators/mp3).

Covers: CBR/VBR walks across versions/layers/rates, exact duration
math, ID3v2 syncsafe skip (incl. footer flag), mono/stereo, the
tolerant-tail contract (truncated final frame, trailing tag bytes,
mid-stream rate change -> clean_eof=False, never a crash after one
clean frame), named hostile errors at the start, and the Spark
fan-out."""

import pytest

from timeseries_data_provider_spark.operators import mp3


def test_cbr_layer3_mpeg1():
    # idx 9 @ V1L3 = 128 kbps, rate 44100, frame 417 B, 1152 samples
    blob = mp3.encode_mp3_skeleton(n_frames=38, bitrate_idx=9, rate_idx=0)
    m = mp3.decode_mp3_meta(blob)
    assert m["version"] == "1" and m["layer"] == 3
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["n_frames"] == 38
    assert m["duration_ms"] == 38 * 1152 * 1000 // 44100
    assert m["bitrate_kbps"] == 128 and not m["vbr"]
    assert m["clean_eof"] and m["id3v2_bytes"] == 0


@pytest.mark.parametrize(
    "version,layer,rate_idx,expect_rate,expect_samples",
    [
        (3, 1, 1, 48000, 384),  # MPEG-1 Layer I
        (3, 2, 2, 32000, 1152),  # MPEG-1 Layer II
        (2, 3, 0, 22050, 576),  # MPEG-2 Layer III
        (0, 3, 2, 8000, 576),  # MPEG-2.5 Layer III
    ],
)
def test_version_layer_matrix(
    version, layer, rate_idx, expect_rate, expect_samples
):
    blob = mp3.encode_mp3_skeleton(
        n_frames=5, bitrate_idx=5, rate_idx=rate_idx,
        version=version, layer=layer,
    )
    m = mp3.decode_mp3_meta(blob)
    assert m["sample_rate"] == expect_rate
    assert m["duration_ms"] == 5 * expect_samples * 1000 // expect_rate


def test_vbr_byte_weighted_mean():
    blob = mp3.encode_mp3_skeleton(
        rate_idx=0, bitrate_indices=[5, 9, 13, 9]
    )
    m = mp3.decode_mp3_meta(blob)
    assert m["vbr"]
    # exact floored byte-weighted mean
    sizes = [144 * b * 1000 // 44100 for b in (64, 128, 256, 128)]
    expect = sum(sizes) * 8 * 44100 // (4 * 1152 * 1000)
    assert m["bitrate_kbps"] == expect


def test_id3v2_skip_and_footer():
    blob = mp3.encode_mp3_skeleton(n_frames=3, id3_size=200)
    m = mp3.decode_mp3_meta(blob)
    assert m["id3v2_bytes"] == 210 and m["n_frames"] == 3
    # syncsafe: size 300 spans two 7-bit digits
    blob = mp3.encode_mp3_skeleton(n_frames=2, id3_size=300)
    assert mp3.decode_mp3_meta(blob)["id3v2_bytes"] == 310


def test_mono_flag():
    blob = mp3.encode_mp3_skeleton(n_frames=2, mono=True)
    assert mp3.decode_mp3_meta(blob)["channels"] == 1


def test_tolerant_tail_contract():
    blob = mp3.encode_mp3_skeleton(n_frames=4)
    # truncated final frame
    m = mp3.decode_mp3_meta(blob[:-10])
    assert m["n_frames"] == 3 and not m["clean_eof"]
    # trailing ID3v1-style tag bytes
    m = mp3.decode_mp3_meta(blob + b"TAGxxxxxxxxx")
    assert m["n_frames"] == 4 and not m["clean_eof"]
    # clean file is clean
    assert mp3.decode_mp3_meta(blob)["clean_eof"]


def test_hostile_start_raises():
    with pytest.raises(ValueError, match="sync"):
        mp3.decode_mp3_meta(b"\x00\x00\x00\x00" * 4)
    with pytest.raises(ValueError, match="no room"):
        mp3.decode_mp3_meta(b"\xff")
    with pytest.raises(ValueError, match="ID3v2 size"):
        mp3.decode_mp3_meta(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f")
    # free format is supported since r11 via resync scan — but a
    # single-frame free stream has nothing to resync against
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) | (0 << 12)
    with pytest.raises(ValueError, match="undiscoverable"):
        mp3.decode_mp3_meta(h.to_bytes(4, "big") + b"\x00" * 100)


def test_id3_text_frames():
    blob = mp3.encode_mp3_skeleton(
        n_frames=2,
        tags={"title": "Ün Títle", "artist": "Someone", "album": "LP"},
    )
    m = mp3.decode_mp3_meta(blob)
    assert m["title"] == "Ün Títle"  # utf-8 path
    assert m["artist"] == "Someone" and m["album"] == "LP"
    # v2.3 plain-size + utf-16 BOM path, hand-built
    body = "\x01".encode("latin-1") + "Songé".encode("utf-16")
    fr = b"TIT2" + len(body).to_bytes(4, "big") + b"\x00\x00" + body
    tag = b"ID3\x03\x00\x00" + bytes(
        [0, 0, len(fr) >> 7, len(fr) & 0x7F]
    ) + fr
    audio = mp3.encode_mp3_skeleton(n_frames=1)
    assert mp3.id3_tags(tag + audio)["title"] == "Songé"
    # v2.2 3-byte frames
    b2 = b"\x00My Song"
    fr2 = b"TT2" + len(b2).to_bytes(3, "big") + b2
    tag2 = b"ID3\x02\x00\x00" + bytes([0, 0, 0, len(fr2)]) + fr2
    assert mp3.id3_tags(tag2)["title"] == "My Song"
    # tagless file: all None
    assert mp3.id3_tags(mp3.encode_mp3_skeleton(n_frames=1)) == {
        "title": None,
        "artist": None,
        "album": None,
    }


def test_truncation_fuzz():
    blob = mp3.encode_mp3_skeleton(n_frames=3, id3_size=20)
    full = mp3.decode_mp3_meta(blob)["n_frames"]
    for cut in range(len(blob)):
        try:
            m = mp3.decode_mp3_meta(blob[:cut])
        except (ValueError, NotImplementedError):
            continue
        assert m["n_frames"] <= full


def test_spark_fanout(spark):
    import pandas as pd

    blobs = [
        (1, mp3.encode_mp3_skeleton(n_frames=7)),
        (2, mp3.encode_mp3_skeleton(n_frames=3, mono=True, id3_size=64)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(blobs, columns=["doc_id", "payload"])
    )
    rows = {r["doc_id"]: r.asDict() for r in mp3.mp3_features(df).collect()}
    assert rows[1]["n_frames"] == 7 and rows[1]["channels"] == 2
    assert rows[2]["channels"] == 1 and rows[2]["id3v2_bytes"] == 74


def test_free_format_resync_walk():
    # r11: bitrate index 0 (free format) — the fixed frame size is
    # discovered by scanning to the next matching sync word
    blob = mp3.encode_mp3_skeleton(
        n_frames=8, rate_idx=0, free_size=417
    )
    m = mp3.decode_mp3_meta(blob)
    assert m["free_format"] is True
    assert m["n_frames"] == 8 and m["clean_eof"] is True
    assert m["duration_ms"] == 8 * 1152 * 1000 // 44100
    # derived nominal rate: 417 bytes * 8 * 44100 / 1152 samples
    assert m["bitrate_kbps"] == 417 * 8 * 44100 // (1152 * 1000)
    assert m["vbr"] is False
    # with an ID3 tag in front the scan still anchors correctly
    m2 = mp3.decode_mp3_meta(
        mp3.encode_mp3_skeleton(
            n_frames=4, rate_idx=0, free_size=300, id3_size=64
        )
    )
    assert m2["free_format"] and m2["n_frames"] == 4
    # declared streams still report free_format False
    cbr = mp3.decode_mp3_meta(mp3.encode_mp3_skeleton(n_frames=3))
    assert cbr["free_format"] is False
